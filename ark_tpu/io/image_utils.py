"""Image save/load built on imageio (reference uses `alpineer.image_utils.save_image`
and tifffile; SURVEY.md §1 L0). Handles float32/int32/uint16/int8 TIFFs."""

from __future__ import annotations

import os

import numpy as np
import imageio.v3 as iio


def save_image(fname: str, data: np.ndarray, compression_level=None):
    """Save a 2-D (or HxWxC) image array to `fname` (TIFF/PNG by extension).

    int16 data is widened as needed; float data is saved float32.
    """
    data = np.asarray(data)
    if data.dtype == np.float64:
        data = data.astype(np.float32)
    if data.dtype == np.int64:
        data = data.astype(np.int32)
    if data.dtype == bool:
        data = data.astype(np.uint8)
    os.makedirs(os.path.dirname(os.path.abspath(fname)), exist_ok=True)
    iio.imwrite(fname, data)


def read_image(fname: str) -> np.ndarray:
    """Read an image file into a numpy array (dtype preserved for TIFF)."""
    return np.asarray(iio.imread(fname))
