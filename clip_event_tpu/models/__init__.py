from clip_event_tpu.models.clip import (  # noqa: F401
    CLIPConfig,
    VIT_B32,
    VIT_B16,
    VIT_L14,
    RN50,
    RN101,
    RN50X4,
    encode_image,
    encode_text,
    forward,
    init_params,
)
from clip_event_tpu.models.convert import (  # noqa: F401
    config_from_state_dict,
    params_from_state_dict,
    state_dict_from_params,
)
