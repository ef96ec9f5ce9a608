import os

import numpy as np
import pandas as pd
import pytest

from ark_tpu.io import feather_utils as feather
from ark_tpu.io.image_utils import read_image, save_image
from ark_tpu.phenotyping import pixel_cluster_utils


@pytest.fixture
def tiff_tree(rng, tmp_path):
    tiff_dir = tmp_path / "imgs"
    for fov in ["fov0", "fov1"]:
        d = tiff_dir / fov
        d.mkdir(parents=True)
        for chan in ["chan0", "chan1"]:
            save_image(str(d / f"{chan}.tiff"),
                       rng.random((32, 32)).astype(np.float32))
    return tiff_dir


def test_smooth_channels(tiff_tree):
    pixel_cluster_utils.smooth_channels(
        ["fov0", "fov1"], str(tiff_tree), None, ["chan0"], smooth_vals=3)
    for fov in ["fov0", "fov1"]:
        sm = read_image(str(tiff_tree / fov / "chan0_smoothed.tiff"))
        orig = read_image(str(tiff_tree / fov / "chan0.tiff"))
        assert sm.shape == orig.shape
        # smoothing shrinks local variation but preserves the mean
        assert sm.std() < orig.std()
        np.testing.assert_allclose(sm.mean(), orig.mean(), rtol=0.05)
    # no-op and validation paths
    pixel_cluster_utils.smooth_channels(["fov0"], str(tiff_tree), None, [], 3)
    with pytest.raises(ValueError):
        pixel_cluster_utils.smooth_channels(
            ["fov0"], str(tiff_tree), None, ["chan0", "chan1"],
            smooth_vals=[3])


def test_filter_with_nuclear_mask(tiff_tree, tmp_path):
    seg_dir = tmp_path / "seg"
    seg_dir.mkdir()
    nuc = np.zeros((32, 32), np.int32)
    nuc[4:12, 4:12] = 1
    for fov in ["fov0", "fov1"]:
        save_image(str(seg_dir / f"{fov}_nuclear.tiff"), nuc)

    pixel_cluster_utils.filter_with_nuclear_mask(
        ["fov0"], str(tiff_tree), str(seg_dir), "chan0", exclude=True)
    excl = read_image(str(tiff_tree / "fov0" / "chan0_nuc_exclude.tiff"))
    assert (excl[4:12, 4:12] == 0).all()      # nuclear signal zeroed
    assert excl[20:, 20:].any()               # non-nuclear kept

    pixel_cluster_utils.filter_with_nuclear_mask(
        ["fov0"], str(tiff_tree), str(seg_dir), "chan0", exclude=False)
    incl = read_image(str(tiff_tree / "fov0" / "chan0_nuc_include.tiff"))
    assert incl[4:12, 4:12].any()             # nuclear kept
    assert (incl[20:, 20:] == 0).all()        # non-nuclear zeroed

    # missing seg_dir is a no-op
    pixel_cluster_utils.filter_with_nuclear_mask(
        ["fov0"], str(tiff_tree), None, "chan0")


def test_find_fovs_missing_col(tmp_path):
    base = tmp_path
    data_dir = "pixel_mat_data"
    dpath = base / data_dir
    dpath.mkdir()
    for fov in ["fov0", "fov1", "fov2"]:
        feather.write_dataframe(pd.DataFrame({"chan0": [1.0, 2.0]}),
                                str(dpath / f"{fov}.feather"))

    # first call: no FOV has the column -> all missing, temp dir created
    missing = pixel_cluster_utils.find_fovs_missing_col(
        str(base), data_dir, "pixel_som_cluster")
    assert sorted(missing) == ["fov0", "fov1", "fov2"]
    assert (base / f"{data_dir}_temp").exists()

    # fov0 finished: written to temp -> only the others are missing
    feather.write_dataframe(
        pd.DataFrame({"chan0": [1.0], "pixel_som_cluster": [3]}),
        str(base / f"{data_dir}_temp" / "fov0.feather"))
    missing = pixel_cluster_utils.find_fovs_missing_col(
        str(base), data_dir, "pixel_som_cluster")
    assert sorted(missing) == ["fov1", "fov2"]

    # completed stage (no temp dir, column present) -> nothing missing
    import shutil
    shutil.rmtree(base / f"{data_dir}_temp")
    for fov in ["fov0", "fov1", "fov2"]:
        feather.write_dataframe(
            pd.DataFrame({"chan0": [1.0], "pixel_som_cluster": [3]}),
            str(dpath / f"{fov}.feather"))
    missing = pixel_cluster_utils.find_fovs_missing_col(
        str(base), data_dir, "pixel_som_cluster")
    assert missing == []
