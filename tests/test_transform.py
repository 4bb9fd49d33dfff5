"""Image-transform parity tests vs PIL/torchvision (the reference pipeline)."""

import numpy as np
import pytest

from clip_event_tpu.data.transform import (
    CLIP_MEAN,
    CLIP_STD,
    center_crop,
    normalize,
    preprocess_image,
    resize_bicubic_uint8,
    resize_matrix,
    resize_shortside,
)

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402

RNG = np.random.default_rng(0)


def _rand_img(h, w, c=3):
    return RNG.integers(0, 256, size=(h, w, c), dtype=np.uint8)


@pytest.mark.parametrize(
    "in_hw,out_hw",
    [
        ((480, 640), (224, 224)),
        ((640, 480), (224, 299)),
        ((100, 100), (224, 224)),  # upscale
        ((1024, 683), (224, 336)),
        ((224, 224), (224, 224)),
        ((37, 53), (7, 11)),
    ],
)
def test_resize_bitexact_vs_pil(in_hw, out_hw):
    img = _rand_img(*in_hw)
    ours = resize_bicubic_uint8(img, out_hw[0], out_hw[1])
    ref = np.asarray(
        Image.fromarray(img).resize((out_hw[1], out_hw[0]), Image.BICUBIC)
    )
    assert ours.shape == ref.shape
    np.testing.assert_array_equal(ours, ref)


def test_full_preprocess_vs_torchvision():
    pytest.importorskip("torch")
    tv = pytest.importorskip("torchvision")
    from torchvision.transforms import CenterCrop, Compose, Normalize, Resize, ToTensor

    ref_transform = Compose(
        [
            Resize(224, interpolation=Image.BICUBIC),
            CenterCrop(224),
            lambda image: image.convert("RGB"),
            ToTensor(),
            Normalize(tuple(CLIP_MEAN.tolist()), tuple(CLIP_STD.tolist())),
        ]
    )
    for shape in [(480, 640), (311, 475), (224, 224), (150, 90)]:
        img = Image.fromarray(_rand_img(*shape))
        ref = ref_transform(img).numpy().transpose(1, 2, 0)  # CHW → HWC
        ours = preprocess_image(img)
        assert ours.shape == (224, 224, 3)
        np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_shortside_semantics():
    assert resize_shortside(_rand_img(480, 640), 224).shape == (224, 298, 3)
    assert resize_shortside(_rand_img(640, 480), 224).shape == (298, 224, 3)
    assert resize_shortside(_rand_img(224, 500), 224).shape == (224, 500, 3)


def test_center_crop_pads_small_images():
    out = center_crop(_rand_img(100, 300), 224)
    assert out.shape == (224, 224, 3)


def test_normalize_range():
    x = normalize(_rand_img(8, 8))
    assert x.dtype == np.float32
    assert np.isfinite(x).all()


def test_resize_matrix_matches_float_filter():
    """Matmul path reproduces PIL up to intermediate-uint8 rounding effects.

    PIL quantizes (and clips bicubic overshoot) between the two passes; the
    float matmul path does not, so rare pixels differ by a few counts. Bound
    the bulk at the 1-count rounding level.
    """
    img = _rand_img(300, 400)
    m_v = resize_matrix(300, 224)
    m_h = resize_matrix(400, 224)
    tmp = np.einsum("oj,hjc->hoc", m_h, img.astype(np.float32))
    float_out = np.einsum("vh,hoc->voc", m_v, tmp)
    exact = resize_bicubic_uint8(img, 224, 224)
    diff = np.abs(float_out - exact)
    assert np.percentile(diff, 99) <= 1.0
    assert diff.max() <= 16.0


def test_device_pipeline_matches_host():
    jax = pytest.importorskip("jax")
    from clip_event_tpu.data.device_pipeline import preprocess_on_device

    imgs = np.stack([_rand_img(300, 400) for _ in range(3)])
    got = np.asarray(preprocess_on_device(imgs, 224))
    assert got.shape == (3, 224, 224, 3)
    for i in range(3):
        ref = preprocess_image(imgs[i], 224)
        diff = np.abs(got[i] - ref)
        # matches the host path up to PIL's intermediate uint8 rounding
        assert np.percentile(diff, 99) <= 1.5 / 255 / 0.26 + 1e-3
        assert diff.max() <= 20.0 / 255 / 0.26


def test_device_pipeline_upscales_small_images():
    jax = pytest.importorskip("jax")
    from clip_event_tpu.data.device_pipeline import preprocess_on_device

    out = preprocess_on_device(_rand_img(100, 150)[None], 224)
    assert out.shape == (1, 224, 224, 3)
