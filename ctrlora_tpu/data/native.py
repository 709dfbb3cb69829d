"""ctypes binding for the native (C++) image-prep kernels.

The loader's hot transform — crop + resize + normalize to float32 — runs in
the thread-pooled C++ library when built (`make -C native`), bypassing
python entirely. Falls back to cv2/numpy when the library is absent.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Sequence, Tuple

import numpy as np

_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
    "libctrlora_data.so",
)
_lib = None


def _load(build: bool = True):
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and build:
        try:
            subprocess.run(
                ["make", "-C", os.path.dirname(_LIB_PATH)],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            return None
    if not os.path.exists(_LIB_PATH):
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.ctrlora_resize_norm.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.c_float,
    ]
    lib.ctrlora_batch_resize_norm.argtypes = [
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_float)),
        ctypes.c_int, ctypes.c_int, ctypes.c_float, ctypes.c_float, ctypes.c_int,
    ]
    lib.ctrlora_native_version.restype = ctypes.c_int
    _lib = lib
    return lib


def available(build: bool = False) -> bool:
    return _load(build=build) is not None


def resize_norm(
    img: np.ndarray,  # uint8 HWC3
    crop: Tuple[int, int, int, int],  # (top, left, h, w)
    out_size: Tuple[int, int],  # (dh, dw)
    scale: float,
    shift: float,
) -> Optional[np.ndarray]:
    """C++ crop+resize+normalize; returns None if the library is missing."""
    lib = _load()
    if lib is None:
        return None
    img = np.ascontiguousarray(img, np.uint8)
    dh, dw = out_size
    out = np.empty((dh, dw, 3), np.float32)
    t, l, h, w = crop
    lib.ctrlora_resize_norm(
        img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        img.shape[0], img.shape[1], t, l, h, w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        dh, dw, ctypes.c_float(scale), ctypes.c_float(shift),
    )
    return out


def batch_resize_norm(
    imgs: Sequence[np.ndarray],
    crops: Sequence[Tuple[int, int, int, int]],
    out_size: Tuple[int, int],
    scale: float,
    shift: float,
) -> Optional[np.ndarray]:
    """Parallel batch variant using the C++ thread pool."""
    lib = _load()
    if lib is None:
        return None
    n = len(imgs)
    dh, dw = out_size
    imgs = [np.ascontiguousarray(im, np.uint8) for im in imgs]
    out = np.empty((n, dh, dw, 3), np.float32)
    SrcArr = ctypes.POINTER(ctypes.c_uint8) * n
    DstArr = ctypes.POINTER(ctypes.c_float) * n
    IntArr = ctypes.c_int * n
    srcs = SrcArr(*[im.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)) for im in imgs])
    dsts = DstArr(*[
        out[i].ctypes.data_as(ctypes.POINTER(ctypes.c_float)) for i in range(n)
    ])
    shs = IntArr(*[im.shape[0] for im in imgs])
    sws = IntArr(*[im.shape[1] for im in imgs])
    ct = IntArr(*[c[0] for c in crops])
    cl = IntArr(*[c[1] for c in crops])
    ch = IntArr(*[c[2] for c in crops])
    cw = IntArr(*[c[3] for c in crops])
    lib.ctrlora_batch_resize_norm(
        srcs, shs, sws, ct, cl, ch, cw, dsts, dh, dw,
        ctypes.c_float(scale), ctypes.c_float(shift), n,
    )
    return out
