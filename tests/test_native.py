"""Native C++ preprocessing parity vs the pure-Python bit-exact path."""

import numpy as np
import pytest

from clip_event_tpu.data import native
from clip_event_tpu.data.transform import preprocess_image, resize_bicubic_uint8

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not buildable here"
)

RNG = np.random.default_rng(0)


@pytest.mark.parametrize(
    "in_hw,out_hw",
    [((480, 640), (224, 224)), ((100, 100), (224, 224)), ((97, 131), (33, 57))],
)
def test_native_resize_bitexact(in_hw, out_hw):
    img = RNG.integers(0, 256, size=in_hw + (3,), dtype=np.uint8)
    ours = native.resize_bicubic(img, *out_hw)
    ref = resize_bicubic_uint8(img, *out_hw)
    np.testing.assert_array_equal(ours, ref)


def test_native_preprocess_rgb_matches_python():
    for shape in [(480, 640), (311, 475), (224, 224), (150, 90)]:
        img = RNG.integers(0, 256, size=shape + (3,), dtype=np.uint8)
        ours = native.preprocess_rgb(img, 224)
        ref = preprocess_image(img, 224)
        np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_native_jpeg_path_matches_pil(tmp_path):
    from PIL import Image

    img = RNG.integers(0, 256, size=(240, 320, 3), dtype=np.uint8)
    path = str(tmp_path / "x.jpg")
    Image.fromarray(img).save(path, quality=95)

    ours = native.preprocess_jpeg_file(path, 224)
    assert ours is not None
    with Image.open(path) as pil_img:
        ref = preprocess_image(pil_img, 224)
    # libjpeg decode is shared with PIL → identical pixels → identical output
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_loader_uses_native_transparently(tmp_path):
    from PIL import Image

    from clip_event_tpu.data.common import load_image_file

    img = RNG.integers(0, 256, size=(120, 160, 3), dtype=np.uint8)
    path = str(tmp_path / "y.jpg")
    Image.fromarray(img).save(path, quality=92)
    out = load_image_file(path, 224)
    assert out.shape == (224, 224, 3)
    with Image.open(path) as pil_img:
        ref = preprocess_image(pil_img, 224)
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_native_rejects_bad_jpeg(tmp_path):
    path = str(tmp_path / "bad.jpg")
    with open(path, "wb") as fh:
        fh.write(b"not a jpeg at all")
    assert native.preprocess_jpeg_file(path, 224) is None
