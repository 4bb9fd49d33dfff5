"""ctypes bindings for the native host-preprocessing library.

`native/host_preprocess.cc` implements the input hot path in C++ (libjpeg
decode + PIL-exact fixed-point bicubic + crop + normalize). ctypes calls
release the GIL, so the loader's worker threads scale across cores — the
reference did all of this in Python inside the training process
(`dataset_voa.py:478-544`, `num_workers=0`).

The library auto-builds on first use (g++, `native/Makefile`); everything
degrades gracefully to the pure-Python path when unavailable.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading
from typing import Optional

import numpy as np

log = logging.getLogger(__name__)

# In a source checkout the C++ lives at <repo>/native; an installed package
# has no native dir next to site-packages, so deployments point
# CLIP_EVENT_NATIVE_DIR at a checkout of native/ (or pre-build the .so
# there); otherwise the loader falls back to the pure-Python path.
_NATIVE_DIR = os.environ.get(
    "CLIP_EVENT_NATIVE_DIR",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        "native",
    ),
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libclip_event_host.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR],
            check=True, capture_output=True, text=True, timeout=120,
        )
        return True
    except Exception as exc:  # missing toolchain / libjpeg-dev
        log.info("native preprocess build unavailable: %s", exc)
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable.

    A stale prebuilt .so (older checkout) may predate newer entry points —
    binding then raises AttributeError, which triggers one rebuild+reload
    before giving up.
    """
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH) and not _build():
            return None
        for attempt in (0, 1):
            try:
                lib = _bind(ctypes.CDLL(_LIB_PATH))
                break
            except OSError as exc:
                log.info("native preprocess load failed: %s", exc)
                return None
            except AttributeError as exc:
                if attempt or not _build():
                    log.info("native preprocess symbols missing: %s", exc)
                    return None
        _lib = lib
        return _lib


def _bind(lib: ctypes.CDLL) -> ctypes.CDLL:
    lib.ce_jpeg_dims.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    lib.ce_jpeg_dims.restype = ctypes.c_int
    lib.ce_preprocess_jpeg.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.ce_preprocess_jpeg.restype = ctypes.c_int
    lib.ce_preprocess_rgb.argtypes = [
        ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_float),
    ]
    lib.ce_preprocess_rgb.restype = ctypes.c_int
    lib.ce_resize_bicubic.argtypes = [
        ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_ubyte),
    ]
    lib.ce_resize_bicubic.restype = ctypes.c_int
    lib.ce_preprocess_jpeg_u8.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t, ctypes.c_int,
        ctypes.POINTER(ctypes.c_ubyte),
    ]
    lib.ce_preprocess_jpeg_u8.restype = ctypes.c_int
    lib.ce_preprocess_rgb_u8.argtypes = [
        ctypes.POINTER(ctypes.c_ubyte), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_ubyte),
    ]
    lib.ce_preprocess_rgb_u8.restype = ctypes.c_int
    return lib

def available() -> bool:
    return get_lib() is not None


def preprocess_jpeg_file(path: str, size: int = 224) -> Optional[np.ndarray]:
    """Full native path: JPEG file → float32 [size, size, 3]. None if the
    native library is unavailable or the file isn't a baseline-decodable
    JPEG (caller falls back to PIL)."""
    lib = get_lib()
    if lib is None:
        return None
    with open(path, "rb") as fh:
        data = fh.read()
    out = np.empty((size, size, 3), np.float32)
    rc = lib.ce_preprocess_jpeg(
        data, len(data), size, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float))
    )
    return out if rc == 0 else None


def preprocess_rgb(rgb: np.ndarray, size: int = 224) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    rgb = np.ascontiguousarray(rgb, dtype=np.uint8)
    out = np.empty((size, size, 3), np.float32)
    rc = lib.ce_preprocess_rgb(
        rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        rgb.shape[0], rgb.shape[1], size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
    )
    return out if rc == 0 else None


def preprocess_jpeg_file_u8(path: str, size: int = 224) -> Optional[np.ndarray]:
    """JPEG file → uint8 [size, size, 3] (resize + crop, pre-normalize).

    The bit-exact intermediate the image cache stores; `None` falls back to
    the pure-Python path (`transform.preprocess_image_u8`)."""
    lib = get_lib()
    if lib is None:
        return None
    with open(path, "rb") as fh:
        data = fh.read()
    out = np.empty((size, size, 3), np.uint8)
    rc = lib.ce_preprocess_jpeg_u8(
        data, len(data), size, out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte))
    )
    return out if rc == 0 else None


def preprocess_rgb_u8(rgb: np.ndarray, size: int = 224) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    rgb = np.ascontiguousarray(rgb, dtype=np.uint8)
    out = np.empty((size, size, 3), np.uint8)
    rc = lib.ce_preprocess_rgb_u8(
        rgb.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        rgb.shape[0], rgb.shape[1], size,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
    )
    return out if rc == 0 else None


def resize_bicubic(img: np.ndarray, out_h: int, out_w: int) -> Optional[np.ndarray]:
    lib = get_lib()
    if lib is None:
        return None
    img = np.ascontiguousarray(img, dtype=np.uint8)
    out = np.empty((out_h, out_w, 3), np.uint8)
    rc = lib.ce_resize_bicubic(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
        img.shape[0], img.shape[1], out_h, out_w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)),
    )
    return out if rc == 0 else None
