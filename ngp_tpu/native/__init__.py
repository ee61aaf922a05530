"""Native (C++) runtime components, loaded via ctypes.

The reference keeps its data path native (stb_image + a std::thread pool,
internal/dataset/); ours is `dataloader.cpp` (libpng + thread pool + sRGB->
linear premultiplied fp16). Built on first use with g++ (no pybind11 in this
environment — plain C ABI + ctypes); falls back to the pure-python path
gracefully when a toolchain is unavailable.
"""

import ctypes
import subprocess
import sys
import threading
from pathlib import Path

_HERE = Path(__file__).parent
_LOCK = threading.Lock()
_LIB = None
_TRIED = False


def _build() -> Path:
    src = _HERE / "dataloader.cpp"
    out = _HERE / "libngpdata.so"
    if out.exists() and out.stat().st_mtime >= src.stat().st_mtime:
        return out
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
        str(src), "-o", str(out), "-lpng", "-lz", "-pthread",
    ]
    subprocess.run(cmd, check=True, capture_output=True)
    return out


def load_native():
    """Returns the ctypes lib or None if the native build is unavailable."""
    global _LIB, _TRIED
    with _LOCK:
        if _LIB is not None or _TRIED:
            return _LIB
        _TRIED = True
        try:
            lib = ctypes.CDLL(str(_build()))
            lib.ngp_png_size.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int)]
            lib.ngp_png_size.restype = ctypes.c_int
            lib.ngp_load_images.argtypes = [
                ctypes.POINTER(ctypes.c_char_p),
                ctypes.c_int,
                ctypes.c_int,
                ctypes.c_int,
                ctypes.POINTER(ctypes.c_uint16),
                ctypes.c_int,
            ]
            lib.ngp_load_images.restype = ctypes.c_int
            _LIB = lib
        except Exception as e:  # toolchain/libpng missing: python fallback
            print(f"ngp_tpu.native: native dataloader unavailable ({e}); using python path", file=sys.stderr)
            _LIB = None
        return _LIB


def load_images_native(paths, width: int, height: int, n_threads: int = 0):
    """Decode PNGs -> (N, H, W, 4) float16 premultiplied linear, or None."""
    import numpy as np

    lib = load_native()
    if lib is None:
        return None
    n = len(paths)
    out = np.empty((n, height, width, 4), dtype=np.float16)
    arr = (ctypes.c_char_p * n)(*[str(p).encode() for p in paths])
    rc = lib.ngp_load_images(
        arr, n, width, height, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)), n_threads
    )
    if rc != 0:
        raise RuntimeError(f"native PNG decode failed for {paths[rc - 1]}")
    return out


def png_size_native(path):
    lib = load_native()
    if lib is None:
        return None
    w, h = ctypes.c_int(0), ctypes.c_int(0)
    if lib.ngp_png_size(str(path).encode(), ctypes.byref(w), ctypes.byref(h)) != 0:
        raise RuntimeError(f"cannot read PNG header: {path}")
    return w.value, h.value
