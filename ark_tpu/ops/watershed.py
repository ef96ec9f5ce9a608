"""Watershed segmentation: native C++ priority-flood with numpy interface.

Used by the Mesmer deep-watershed postprocess and the classical fiber
pipeline (reference delegates to skimage's watershed;
`fiber_segmentation.py:324-356`)."""

from __future__ import annotations

import ctypes

import numpy as np


def watershed(image: np.ndarray, markers: np.ndarray,
              mask: np.ndarray = None) -> np.ndarray:
    """Marker-based watershed on `image` (flood ascending values), restricted
    to `mask`. 4-connected; returns int32 labels."""
    from ark_tpu import native
    lib = native.get_lib()
    image = np.ascontiguousarray(image, np.float32)
    markers = np.ascontiguousarray(markers, np.int32)
    if mask is None:
        mask = np.ones(image.shape, np.uint8)
    mask = np.ascontiguousarray(mask.astype(bool), np.uint8)
    h, w = image.shape
    out = np.zeros((h, w), np.int32)
    lib.watershed(
        image.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        markers.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        h, w, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    return out


def label_components(mask: np.ndarray) -> np.ndarray:
    """4-connected component labeling via the native kernel."""
    from ark_tpu import native
    lib = native.get_lib()
    mask = np.ascontiguousarray(mask.astype(bool), np.uint8)
    h, w = mask.shape
    out = np.zeros((h, w), np.int32)
    n = ctypes.c_int32(0)
    lib.label_components(
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), h, w,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), ctypes.byref(n))
    return out
