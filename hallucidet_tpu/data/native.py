"""ctypes bindings for the native host-pipeline library (native/loader.cc).

Threaded libjpeg decode + resize + float conversion with a pure-Python (PIL)
fallback when the .so has not been built. `load_batch` is the fast path the
DataLoader uses for fixed-shape datasets (LLVIP frames are all 1024x1280).
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Sequence

import numpy as np

_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
    "libhctpu_loader.so",
)

_lib = None


def _load_lib():
    global _lib
    if _lib is None and os.path.exists(_LIB_PATH):
        lib = ctypes.CDLL(_LIB_PATH)
        lib.hctpu_load_image_f32.argtypes = [
            ctypes.c_char_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ]
        lib.hctpu_load_image_f32.restype = ctypes.c_int
        lib.hctpu_load_batch_f32.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.c_int,
        ]
        lib.hctpu_load_batch_f32.restype = ctypes.c_int
        _lib = lib
    return _lib


def available() -> bool:
    return _load_lib() is not None


def build() -> bool:
    """Compile the library in place (g++ + libjpeg, no network)."""
    import subprocess

    script = os.path.join(os.path.dirname(_LIB_PATH), "build.sh")
    rc = subprocess.run(["sh", script], capture_output=True).returncode
    return rc == 0 and available()


def load_image(path: str, gray: bool, hw) -> Optional[np.ndarray]:
    lib = _load_lib()
    if lib is None:
        return None
    h, w = hw
    c = 1 if gray else 3
    out = np.empty((h, w, c), np.float32)
    rc = lib.hctpu_load_image_f32(
        path.encode(), int(gray),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), h, w,
    )
    return out if rc == 0 else None


def load_batch(
    paths: Sequence[str], gray: bool, hw, num_threads: int = 4
) -> Optional[np.ndarray]:
    """Decode `paths` into [N, h, w, c] float32 [0,1]; None on any failure
    (caller falls back to PIL)."""
    lib = _load_lib()
    if lib is None:
        return None
    h, w = hw
    c = 1 if gray else 3
    n = len(paths)
    out = np.empty((n, h, w, c), np.float32)
    arr = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    rc = lib.hctpu_load_batch_f32(
        arr, n, int(gray),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), h, w, num_threads,
    )
    return out if rc == 0 else None
