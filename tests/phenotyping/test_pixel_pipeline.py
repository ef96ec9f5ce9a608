"""End-to-end pixel pipeline test: the notebook-2 equivalent
(templates/2_Pixie_Cluster_Pixels.ipynb) on a synthetic cohort."""

import os

import numpy as np
import pandas as pd
import pytest

from ark_tpu.io import feather_utils as feather
from ark_tpu.io import io_utils
from ark_tpu.phenotyping import (pixel_cluster_utils, pixel_meta_clustering,
                                 pixel_som_clustering, pixie_preprocessing)

from tests import test_utils

FOVS = ["fov0", "fov1", "fov2"]
CHANNELS = ["chan0", "chan1", "chan2", "chan3"]


@pytest.fixture(scope="module")
def cohort(tmp_path_factory):
    base = tmp_path_factory.mktemp("pixie")
    tiff_dir = base / "input_data"
    seg_dir = base / "deepcell_output"
    data = test_utils.create_image_cohort(str(tiff_dir), FOVS, CHANNELS,
                                          shape=(64, 64), n_cells=25)
    test_utils.save_label_dir(str(seg_dir), data)
    (base / "pixel_output_dir").mkdir()
    return base, str(tiff_dir), str(seg_dir), data


def test_full_pixel_pipeline(cohort):
    base, tiff_dir, seg_dir, _ = cohort
    base_dir = str(base)

    # --- preprocessing ---
    pixie_preprocessing.create_pixel_matrix(
        FOVS, list(CHANNELS), base_dir, tiff_dir, seg_dir,
        img_sub_folder=None, seg_suffix="_whole_cell.tiff",
        subset_proportion=0.5, seed=42)

    for fov in FOVS:
        df = feather.read_dataframe(
            os.path.join(base_dir, "pixel_mat_data", f"{fov}.feather"))
        assert set(CHANNELS).issubset(df.columns)
        assert {"fov", "row_index", "column_index", "label"}.issubset(df.columns)
        # rows are row-sum normalized
        np.testing.assert_allclose(df[CHANNELS].sum(axis=1), 1.0, rtol=1e-4)
        sub = feather.read_dataframe(
            os.path.join(base_dir, "pixel_mat_subsetted", f"{fov}.feather"))
        assert 0 < len(sub) < len(df)

    norm_post = feather.read_dataframe(
        os.path.join(base_dir, "channel_norm_post_rownorm.feather"))
    assert list(norm_post.columns) == CHANNELS
    assert (norm_post.values > 0).all()

    # resume: nothing left to do
    pixie_preprocessing.create_pixel_matrix(
        FOVS, list(CHANNELS), base_dir, tiff_dir, seg_dir,
        img_sub_folder=None, subset_proportion=0.5, seed=42)

    # --- SOM train + assign ---
    pysom = pixel_som_clustering.train_pixel_som(
        FOVS, list(CHANNELS), base_dir,
        norm_vals_name="channel_norm_post_rownorm.feather", seed=42)
    assert pysom.weights.shape == (100, len(CHANNELS))

    pixel_som_clustering.cluster_pixels(
        FOVS, base_dir, pysom, data_dir="pixel_mat_data")
    for fov in FOVS:
        df = feather.read_dataframe(
            os.path.join(base_dir, "pixel_mat_data", f"{fov}.feather"))
        assert df["pixel_som_cluster"].between(1, 100).all()
    assert not os.path.exists(os.path.join(base_dir, "pixel_mat_data_temp"))

    pixel_som_clustering.generate_som_avg_files(
        FOVS, list(CHANNELS), base_dir, pysom, data_dir="pixel_mat_data")
    som_avg = pd.read_csv(
        os.path.join(base_dir, "pixel_channel_avg_som_cluster.csv"))
    assert {"pixel_som_cluster", "count", *CHANNELS}.issubset(som_avg.columns)

    # --- consensus / meta ---
    pixel_cc = pixel_meta_clustering.pixel_consensus_cluster(
        FOVS, list(CHANNELS), base_dir, max_k=6, data_dir="pixel_mat_data")
    for fov in FOVS:
        df = feather.read_dataframe(
            os.path.join(base_dir, "pixel_mat_data", f"{fov}.feather"))
        assert df["pixel_meta_cluster"].between(1, 6).all()

    pixel_meta_clustering.generate_meta_avg_files(
        FOVS, list(CHANNELS), base_dir, pixel_cc, data_dir="pixel_mat_data")
    meta_avg = pd.read_csv(
        os.path.join(base_dir, "pixel_channel_avg_meta_cluster.csv"))
    assert meta_avg["pixel_meta_cluster"].between(1, 6).all()
    som_avg2 = pd.read_csv(
        os.path.join(base_dir, "pixel_channel_avg_som_cluster.csv"))
    assert "pixel_meta_cluster" in som_avg2.columns

    # --- GUI remap application ---
    remap = som_avg2[["pixel_som_cluster", "pixel_meta_cluster"]].copy()
    remap["pixel_meta_cluster"] = (remap["pixel_meta_cluster"] % 3) + 1
    remap["pixel_meta_cluster_rename"] = remap["pixel_meta_cluster"].map(
        lambda m: f"meta_{m}")
    remap.to_csv(os.path.join(base_dir, "pixel_remap.csv"), index=False)
    pixel_meta_clustering.apply_pixel_meta_cluster_remapping(
        FOVS, list(CHANNELS), base_dir, "pixel_mat_data", "pixel_remap.csv")
    for fov in FOVS:
        df = feather.read_dataframe(
            os.path.join(base_dir, "pixel_mat_data", f"{fov}.feather"))
        assert df["pixel_meta_cluster"].between(1, 3).all()
        assert df["pixel_meta_cluster_rename"].str.startswith("meta_").all()

    pixel_meta_clustering.generate_remap_avg_files(
        FOVS, list(CHANNELS), base_dir, "pixel_mat_data", "pixel_remap.csv",
        "pixel_channel_avg_som_cluster.csv",
        "pixel_channel_avg_meta_cluster.csv")
    meta_avg2 = pd.read_csv(
        os.path.join(base_dir, "pixel_channel_avg_meta_cluster.csv"))
    assert "pixel_meta_cluster_rename" in meta_avg2.columns


def test_planted_clusters_recovered(tmp_path):
    """Pixels were planted with channel profiles by cluster; the SOM-average
    table must reflect distinct dominant channels across SOM clusters."""
    base_dir = str(tmp_path)
    tiff_dir = os.path.join(base_dir, "input_data")
    data = test_utils.create_image_cohort(tiff_dir, FOVS, CHANNELS,
                                          shape=(64, 64), n_cells=30)
    os.makedirs(os.path.join(base_dir, "pixel_output_dir"))
    pixie_preprocessing.create_pixel_matrix(
        FOVS, list(CHANNELS), base_dir, tiff_dir, None,
        img_sub_folder=None, subset_proportion=0.5, seed=42)
    pysom = pixel_som_clustering.train_pixel_som(
        FOVS, list(CHANNELS), base_dir,
        norm_vals_name="channel_norm_post_rownorm.feather", seed=42)
    pixel_som_clustering.cluster_pixels(FOVS, base_dir, pysom,
                                        data_dir="pixel_mat_data")
    pixel_som_clustering.generate_som_avg_files(
        FOVS, list(CHANNELS), base_dir, pysom, data_dir="pixel_mat_data")
    som_avg = pd.read_csv(
        os.path.join(base_dir, "pixel_channel_avg_som_cluster.csv"))
    # the four planted channel profiles should appear as dominant channels
    dominant = som_avg[CHANNELS].idxmax(axis=1)
    weights = som_avg["count"] / som_avg["count"].sum()
    seen = set()
    for chan in CHANNELS:
        frac = weights[dominant == chan].sum()
        if frac > 0.1:
            seen.add(chan)
    assert len(seen) >= 3, f"expected >=3 planted profiles, got {seen}"


def test_corrupted_feather_is_skipped(cohort, tmp_path):
    """SURVEY §5 failure-recovery contract: a corrupted per-FOV feather is
    caught and skipped with a return code, never crashing the stage."""
    base, tiff_dir, seg_dir, _ = cohort
    base_dir = str(base)
    import shutil

    # self-sufficient: these stages are disk-state resumable, so they are
    # no-ops when the e2e test already ran in this session
    pixie_preprocessing.create_pixel_matrix(
        FOVS, list(CHANNELS), base_dir, tiff_dir, seg_dir,
        img_sub_folder=None, seg_suffix="_whole_cell.tiff",
        subset_proportion=0.5, seed=42)
    pysom = pixel_som_clustering.train_pixel_som(
        FOVS, list(CHANNELS), base_dir,
        norm_vals_name="channel_norm_post_rownorm.feather", seed=42)

    work = tmp_path / "corrupt"
    work.mkdir()
    data_dir = work / "pixel_mat_data"
    shutil.copytree(os.path.join(base_dir, "pixel_mat_data"), data_dir)
    # corrupt one FOV's feather
    with open(data_dir / "fov1.feather", "wb") as f:
        f.write(b"this is not a feather file")

    # direct per-FOV assignment reports the corruption as a status code
    fov, status = pixel_som_clustering.run_pixel_som_assignment(
        str(data_dir), pysom, False, 1_000_000, "fov1")
    assert (fov, status) == ("fov1", 1)
    # a healthy FOV still succeeds into the temp dir
    (data_dir.parent / "pixel_mat_data_temp").mkdir()
    fov, status = pixel_som_clustering.run_pixel_som_assignment(
        str(data_dir), pysom, False, 1_000_000, "fov0")
    assert (fov, status) == ("fov0", 0)
    assert (data_dir.parent / "pixel_mat_data_temp" / "fov0.feather").exists()
