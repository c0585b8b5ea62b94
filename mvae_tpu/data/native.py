"""ctypes bindings for the native host-pipeline library (native/).

Builds lazily with g++ on first use (no pybind11 in this image — C ABI +
ctypes per the environment's binding guidance). Every native function has a
numpy fallback; `available()` gates usage."""

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_SO = os.path.join(_NATIVE_DIR, "libmvae_native.so")
_lib = None


def _build():
    if not os.path.isdir(_NATIVE_DIR):     # pip-installed (no checkout):
        raise FileNotFoundError(_NATIVE_DIR)   # quiet numpy-fallback path
    subprocess.run(["make", "-C", _NATIVE_DIR, "-s"], check=True)


def load():
    global _lib
    if _lib is not None:
        return _lib
    ABI = 4
    try:
        # make no-ops when the .so is current; this keeps a stale build from
        # an older source version out of the process (dlopen caches by path,
        # so rebuild must happen BEFORE the first CDLL)
        _build()
        lib = ctypes.CDLL(_SO)
    except (subprocess.CalledProcessError, FileNotFoundError, OSError):
        return None
    lib.mvae_native_abi_version.restype = ctypes.c_int
    assert lib.mvae_native_abi_version() == ABI
    for f in (lib.decode_jpeg_64, lib.decode_png_64):
        f.argtypes = [ctypes.c_char_p, ctypes.c_void_p]
        f.restype = ctypes.c_int
    lib.multimnist_generate.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_uint64, ctypes.c_void_p, ctypes.c_void_p]
    lib.multimnist_generate.restype = ctypes.c_int64
    for f in (lib.gather_rows_u8, lib.gather_rows_f32):
        f.argtypes = [ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
                      ctypes.c_int64, ctypes.c_int64]
    _lib = lib
    return lib


def available() -> bool:
    try:
        return load() is not None
    except Exception:
        return False


def multimnist_generate(digits: np.ndarray, labels: np.ndarray, n_out: int,
                        *, min_digits=0, max_digits=4, resize=True,
                        translate=True, seed=681307):
    """digits: (N, 28, 28) uint8; labels: (N,) int32.
    Returns (images (n_out, 50, 50) uint8, texts (n_out, 4) int32)."""
    lib = load()
    digits = np.ascontiguousarray(digits, np.uint8)
    labels = np.ascontiguousarray(labels, np.int32)
    images = np.empty((n_out, 50, 50), np.uint8)
    texts = np.empty((n_out, 4), np.int32)
    n_failed = lib.multimnist_generate(
        digits.ctypes.data, labels.ctypes.data,
        len(digits), n_out, min_digits, max_digits,
        int(resize), int(translate), seed,
        images.ctypes.data, texts.ctypes.data)
    if n_failed:
        raise RuntimeError(
            f"multimnist: {n_failed}/{n_out} canvases found no "
            "non-overlapping composition (digit pool too dense?)")
    return images, texts


def decode_image_64(path: str) -> np.ndarray:
    """JPEG/PNG file -> (64, 64, 3) uint8 with the CelebA preprocessing
    (Resize(64) + CenterCrop(64)) applied natively — libjpeg DCT-domain
    prescale + box/bilinear resample (native/image_decode.cc). Measured
    740 vs 424 images/sec PIL on this 1-core host (1.7x); pixel values
    differ from PIL's antialiased BILINEAR resampler by a few percent
    (documented divergence, tested in tests/test_native.py)."""
    lib = load()
    out = np.empty((64, 64, 3), np.uint8)
    low = path.lower()
    fn = (lib.decode_png_64 if low.endswith(".png")
          else lib.decode_jpeg_64)
    rc = fn(path.encode(), out.ctypes.data)
    if rc != 0:
        raise ValueError(f"native decode failed ({rc}): {path}")
    return out


def gather_rows(src: np.ndarray, idx: np.ndarray) -> np.ndarray:
    """Contiguous batch gather via native memcpy loop."""
    lib = load()
    src = np.ascontiguousarray(src)
    idx = np.ascontiguousarray(idx, np.int64)
    out = np.empty((len(idx),) + src.shape[1:], src.dtype)
    row = int(np.prod(src.shape[1:], dtype=np.int64))
    if src.dtype == np.uint8:
        lib.gather_rows_u8(src.ctypes.data, idx.ctypes.data,
                           out.ctypes.data, len(idx), row)
    elif src.dtype == np.float32:
        lib.gather_rows_f32(src.ctypes.data, idx.ctypes.data,
                            out.ctypes.data, len(idx), row)
    else:
        return src[idx]
    return out
