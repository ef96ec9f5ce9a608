"""image_utils dtype/shape round-trip contracts (the L0 save/read surface
every stage funnels through; reference `alpineer.image_utils.save_image`)."""

import os

import numpy as np
import pytest

from ark_tpu.io.image_utils import read_image, save_image


@pytest.mark.parametrize("dtype,expected", [
    (np.float32, np.float32),
    (np.float64, np.float32),     # narrowed on save
    (np.int32, np.int32),
    (np.int64, np.int32),         # narrowed on save
    (np.uint16, np.uint16),
    (np.uint8, np.uint8),
])
def test_tiff_dtype_roundtrip(tmp_path, rng, dtype, expected):
    if np.issubdtype(dtype, np.floating):
        data = rng.random((9, 7)).astype(dtype)
    else:
        data = rng.integers(0, 1000, (9, 7)).astype(dtype)
    path = str(tmp_path / "img.tiff")
    save_image(path, data)
    back = read_image(path)
    assert back.dtype == expected
    np.testing.assert_allclose(back, data.astype(expected))


def test_bool_mask_saved_as_uint8(tmp_path, rng):
    mask = rng.random((6, 6)) < 0.5
    path = str(tmp_path / "mask.tiff")
    save_image(path, mask)
    back = read_image(path)
    assert back.dtype == np.uint8
    np.testing.assert_array_equal(back.astype(bool), mask)


def test_multichannel_and_multipage(tmp_path, rng):
    hwc = rng.random((5, 5, 3)).astype(np.float32)
    save_image(str(tmp_path / "hwc.tiff"), hwc)
    assert read_image(str(tmp_path / "hwc.tiff")).shape == (5, 5, 3)
    # channels-first stacks round-trip as pages
    chw = rng.random((3, 5, 5)).astype(np.float32)
    save_image(str(tmp_path / "chw.tiff"), chw)
    back = read_image(str(tmp_path / "chw.tiff"))
    assert back.shape == (3, 5, 5)
    np.testing.assert_allclose(back, chw)


def test_save_creates_parent_dirs(tmp_path, rng):
    path = str(tmp_path / "deep" / "nested" / "dir" / "x.tiff")
    save_image(path, np.zeros((3, 3), np.float32))
    assert os.path.exists(path)


def test_int32_label_values_preserved_exactly(tmp_path):
    # large label ids (beyond int16/uint16) survive the round trip
    labels = np.array([[0, 70000], [2**30, 123456]], np.int32)
    path = str(tmp_path / "labels.tiff")
    save_image(path, labels)
    np.testing.assert_array_equal(read_image(path), labels)
