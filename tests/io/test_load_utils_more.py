"""Loader edge-case tests (the alpineer L0 surface, SURVEY.md §1: the
reference leans on these in 11+12 call sites, so edge behavior — ragged
cohorts, channel subsets, missing tiles, dtype promotion — is contract)."""

import os

import numpy as np
import pytest

from ark_tpu.io import io_utils, load_utils
from ark_tpu.io.image_utils import read_image, save_image

from tests import test_utils


def _write_tree(base, fovs, channels, shape=(8, 8), sub="", dtype=np.float32,
                value=None):
    rng = np.random.default_rng(3)
    data = {}
    for fov in fovs:
        fdir = os.path.join(base, fov, sub) if sub else os.path.join(base, fov)
        os.makedirs(fdir, exist_ok=True)
        data[fov] = {}
        for ch in channels:
            img = (np.full(shape, value, dtype) if value is not None
                   else rng.random(shape).astype(dtype))
            save_image(os.path.join(fdir, f"{ch}.tiff"), img)
            data[fov][ch] = img
    return data


def test_tree_channel_subset_and_order(tmp_path):
    data = _write_tree(str(tmp_path), ["f0", "f1"], ["b", "a", "c"])
    out = load_utils.load_imgs_from_tree(str(tmp_path), channels=["c", "a"])
    assert list(out.coords["channels"]) == ["c", "a"]
    np.testing.assert_allclose(out.sel(fovs="f1", channels="c").values,
                               data["f1"]["c"])
    # extension-qualified channel names also resolve
    out2 = load_utils.load_imgs_from_tree(str(tmp_path),
                                          channels=["a.tiff"])
    assert list(out2.coords["channels"]) == ["a"]


def test_tree_missing_channel_raises(tmp_path):
    _write_tree(str(tmp_path), ["f0"], ["a"])
    with pytest.raises(ValueError, match="not found"):
        load_utils.load_imgs_from_tree(str(tmp_path), channels=["zz"])


def test_tree_ragged_fovs_padded_to_max(tmp_path):
    _write_tree(str(tmp_path), ["f0"], ["a"], shape=(8, 8))
    _write_tree(str(tmp_path), ["f1"], ["a"], shape=(12, 10))
    out = load_utils.load_imgs_from_tree(str(tmp_path))
    assert out.shape == (2, 12, 10, 1)
    # the smaller FOV is zero-padded bottom/right
    f0 = out.sel(fovs="f0").values[..., 0]
    assert (f0[8:, :] == 0).all() and (f0[:, 8:] == 0).all()
    assert (f0[:8, :8] != 0).any()
    # max_image_size overrides the cohort max
    out2 = load_utils.load_imgs_from_tree(str(tmp_path), fovs=["f0"],
                                          max_image_size=16)
    assert out2.shape == (1, 16, 16, 1)


def test_tree_img_sub_folder_and_fov_subset(tmp_path):
    data = _write_tree(str(tmp_path), ["f0", "f1", "f2"], ["a"], sub="TIFs")
    out = load_utils.load_imgs_from_tree(str(tmp_path),
                                         img_sub_folder="TIFs",
                                         fovs=["f2", "f0"])
    assert list(out.coords["fovs"]) == ["f2", "f0"]
    np.testing.assert_allclose(out.sel(fovs="f2").values[..., 0],
                               data["f2"]["a"])


def test_tree_dtype_promotion_and_override(tmp_path):
    _write_tree(str(tmp_path), ["f0"], ["a"], dtype=np.uint8, value=3)
    _write_tree(str(tmp_path), ["f0"], ["b"], dtype=np.float32, value=0.5)
    out = load_utils.load_imgs_from_tree(str(tmp_path))
    assert out.dtype == np.float32          # promoted, not truncated
    out16 = load_utils.load_imgs_from_tree(str(tmp_path), dtype=np.float64)
    assert out16.dtype == np.float64


def test_tree_empty_dir_raises(tmp_path):
    os.makedirs(tmp_path / "root_with_fov" / "fov0", exist_ok=True)
    with pytest.raises(ValueError, match="No channel images"):
        load_utils.load_imgs_from_tree(str(tmp_path / "root_with_fov"))
    os.makedirs(tmp_path / "no_fovs", exist_ok=True)
    with pytest.raises(ValueError, match="No FOV folders"):
        load_utils.load_imgs_from_tree(str(tmp_path / "no_fovs"))


def test_load_imgs_from_dir_suffix_trim_and_substring(tmp_path):
    rng = np.random.default_rng(0)
    for fov in ["f0", "f1"]:
        save_image(str(tmp_path / f"{fov}_whole_cell.tiff"),
                   rng.integers(0, 5, (6, 6)).astype(np.int32))
        save_image(str(tmp_path / f"{fov}_nuclear.tiff"),
                   rng.integers(0, 5, (6, 6)).astype(np.int32))
    out = load_utils.load_imgs_from_dir(
        str(tmp_path), match_substring="_whole_cell",
        trim_suffix="_whole_cell", xr_channel_names=["whole_cell"])
    assert list(out.coords["fovs"]) == ["f0", "f1"]
    assert out.shape == (2, 6, 6, 1)


def test_load_imgs_from_dir_mixed_shapes_raise(tmp_path):
    save_image(str(tmp_path / "a.tiff"), np.zeros((4, 4), np.float32))
    save_image(str(tmp_path / "b.tiff"), np.zeros((6, 6), np.float32))
    with pytest.raises(ValueError, match="Mixed image shapes"):
        load_utils.load_imgs_from_dir(str(tmp_path))


def test_load_imgs_from_dir_channels_first_multipage(tmp_path):
    # deepcell-input style: (2, H, W) multi-page file, channel names given
    img = np.stack([np.full((5, 5), 1.0), np.full((5, 5), 2.0)]).astype(
        np.float32)
    save_image(str(tmp_path / "fov0.tiff"), img)
    out = load_utils.load_imgs_from_dir(
        str(tmp_path), xr_channel_names=["nuc", "mem"])
    assert out.shape == (1, 5, 5, 2)
    assert float(out.sel(fovs="fov0", compartments="mem").values.mean()) == 2.0


def test_get_tiled_fov_names_multi_prefix_and_dims():
    flat, dims = load_utils.get_tiled_fov_names(
        ["t1_R1C1", "t1_R2C2", "t2_R1C2"], return_dims=True)
    assert ("t1", 2, 2) in dims and ("t2", 1, 2) in dims
    assert "t1_R1C2" in flat and "t1_R2C1" in flat    # grid completion
    assert "t2_R1C1" in flat
    with pytest.raises(ValueError, match="not RnCm-tiled"):
        load_utils.get_tiled_fov_names(["plainfov"])


def test_load_tiled_img_data_fills_missing_tiles(tmp_path):
    # only 3 of 4 tiles exist; the missing one must be zero-filled
    present = ["t_R1C1", "t_R1C2", "t_R2C1"]
    _write_tree(str(tmp_path), present, ["chan"], shape=(4, 4), value=1.0)
    expected = ["t_R1C1", "t_R1C2", "t_R2C1", "t_R2C2"]
    out = load_utils.load_tiled_img_data(str(tmp_path), present, expected,
                                         "chan")
    assert out.shape == (4, 4, 4, 1)
    assert float(out.sel(fovs="t_R2C2").values.sum()) == 0.0
    assert float(out.sel(fovs="t_R1C1").values.sum()) == 16.0
    # single_dir layout: `<fov>_<channel>.tiff` files in one folder
    sd = tmp_path / "single"
    os.makedirs(sd)
    for fov in present:
        save_image(str(sd / f"{fov}_chan.tiff"), np.ones((4, 4), np.float32))
    out2 = load_utils.load_tiled_img_data(str(sd), present, expected, "chan",
                                          single_dir=True)
    assert out2.shape == (4, 4, 4, 1)


def test_extract_delimited_names():
    assert io_utils.extract_delimited_names(
        ["fov1_slide2", "fov3_slide4"]) == ["fov1", "fov3"]
    assert io_utils.extract_delimited_names(["a-b"], delimiter="-") == ["a"]
    # names without the delimiter pass through unless required
    assert io_utils.extract_delimited_names(["plain"]) == ["plain"]
    with pytest.raises(ValueError, match="lacking delimiter"):
        io_utils.extract_delimited_names(["plain"],
                                         delimiter_optional=False)
    assert io_utils.extract_delimited_names(None) is None


def test_list_files_exact_match(tmp_path):
    for name in ["chan.tiff", "chan_2.tiff", "notchan.tiff"]:
        save_image(str(tmp_path / name), np.zeros((2, 2), np.float32))
    loose = io_utils.list_files(str(tmp_path), substrs="chan")
    assert set(loose) == {"chan.tiff", "chan_2.tiff", "notchan.tiff"}
    exact = io_utils.list_files(str(tmp_path), substrs="chan",
                                exact_match=True)
    assert exact == ["chan.tiff"]


def test_multipage_tiff_autodetects_channels_first(tmp_path):
    """A 3-page TIFF loaded WITHOUT channel names must come back as
    (1, H, W, 3) — not with pages as 'rows' and width as channels
    (alpineer's shape[0] == min(shape) auto-detection)."""
    stack = np.stack([np.full((8, 9), i, np.float32) for i in range(3)])
    save_image(str(tmp_path / "fovX.tiff"), stack)
    da = load_utils.load_imgs_from_dir(str(tmp_path))
    assert da.values.shape == (1, 8, 9, 3)
    for i in range(3):
        assert (da.values[0, :, :, i] == i).all()


def test_tiled_fov_names_rejects_suffixed_names(tmp_path):
    """'R1C1_acquisition' is NOT an RnCm name — the old unanchored match
    truncated the suffix and the tiled loader zero-filled every tile."""
    with pytest.raises(ValueError, match="not RnCm"):
        load_utils.get_tiled_fov_names(["R1C1_acquisition"])
    # real RnCm names (with optional run prefix) still parse
    names = load_utils.get_tiled_fov_names(["run1_R1C1", "run1_R2C2"])
    assert "run1_R2C1" in names


def test_integer_dtype_request_never_truncates_floats(tmp_path):
    (tmp_path / "fov0").mkdir()
    save_image(str(tmp_path / "fov0" / "chan0.tiff"),
               np.full((4, 4), 300.5, np.float32))
    with pytest.warns(UserWarning, match="non-float dtype"):
        da = load_utils.load_imgs_from_tree(str(tmp_path),
                                            img_sub_folder=None,
                                            dtype=np.int16)
    assert np.issubdtype(da.values.dtype, np.floating)
    assert da.values.max() == np.float32(300.5)


def test_remove_file_extensions_always_strips():
    got = io_utils.remove_file_extensions(
        ["marker.b-c", "chan.1", "data.backup", "img.tiff"])
    assert got == ["marker", "chan", "data", "img"]


def test_verify_in_list_rejects_empty_lists():
    from ark_tpu.io.misc_utils import verify_in_list
    with pytest.raises(ValueError, match="cannot be empty"):
        verify_in_list(provided_channels=[], accepted_channels=["a"])
    with pytest.raises(ValueError, match="cannot be empty"):
        verify_in_list(provided_channels=["a"], accepted_channels=[])
