"""Read-back parity for the arrow-Table per-FOV pixie passes (r4).

The SOM-assignment, consensus, and remap passes rewrite each ~70 MB
per-FOV feather to add/update one or two columns; they now run on arrow
Tables with the untouched columns passing buffer-to-buffer instead of
round-tripping through pandas (feather_utils.table_set_columns). These
tests pin the contract: a file written by the arrow path must read back
(via `feather.read_dataframe`) IDENTICALLY — values, dtypes, column
order — to one written by the DataFrame path it replaced (reimplemented
here as the oracle, matching reference `pixel_som_clustering.py:139-289`
/ `pixel_meta_clustering.py:333-446` semantics)."""

import numpy as np
import pandas as pd
import pytest
from pandas.testing import assert_frame_equal

from ark_tpu.io import feather_utils as feather
from ark_tpu.phenotyping import (cluster_helpers, pixel_cluster_utils,
                                 pixel_meta_clustering,
                                 pixel_som_clustering)

CHANNELS = ["chan0", "chan1", "chan2"]
FOVS = ["fov0", "fov1"]


@pytest.fixture()
def base(tmp_path, rng):
    (tmp_path / "pixel_mat_subsetted").mkdir()
    (tmp_path / "pixel_mat_data").mkdir()
    for fov in FOVS:
        df = pd.DataFrame(rng.random((120, 3)).astype(np.float32),
                          columns=CHANNELS)
        df["fov"] = fov
        df["row_index"] = rng.integers(0, 32, 120)
        df["column_index"] = rng.integers(0, 32, 120)
        df["label"] = rng.integers(1, 8, 120)
        feather.write_dataframe(
            df.sample(40, random_state=1),
            tmp_path / "pixel_mat_subsetted" / f"{fov}.feather")
        feather.write_dataframe(df,
                                tmp_path / "pixel_mat_data" / f"{fov}.feather")
    feather.write_dataframe(pd.DataFrame([[0.9] * 3], columns=CHANNELS),
                            tmp_path / "post_rowsum_chan_norm.feather")
    return tmp_path


def _pysom(base):
    return pixel_som_clustering.train_pixel_som(FOVS, CHANNELS, str(base))


def test_som_pass_parity(base):
    pysom = _pysom(base)
    data_path = str(base / "pixel_mat_data")
    fov_path = base / "pixel_mat_data" / "fov0.feather"

    # DataFrame-path oracle (the pre-r4 run_pixel_som_assignment body)
    fov_df = feather.read_dataframe(fov_path)
    oracle = pysom.assign_som_clusters(fov_df, normalize_data=True)
    feather.write_dataframe(oracle, base / "oracle_som.feather",
                            compression="uncompressed")

    (base / "pixel_mat_data_temp").mkdir()
    fov, status = pixel_som_clustering.run_pixel_som_assignment(
        data_path, pysom, False, 1_000_000, "fov0")
    assert status == 0
    got = feather.read_dataframe(base / "pixel_mat_data_temp"
                                 / "fov0.feather")
    want = feather.read_dataframe(base / "oracle_som.feather")
    assert_frame_equal(got, want)

    # overwrite semantics: drop + reassign WITHOUT renormalizing must also
    # match (the arrow path passes the already-normalized channels through)
    feather.write_dataframe(want, fov_path, compression="uncompressed")
    redo_df = feather.read_dataframe(fov_path).drop(
        columns="pixel_som_cluster", errors="ignore")
    oracle2 = pysom.assign_som_clusters(redo_df, normalize_data=False)
    fov, status = pixel_som_clustering.run_pixel_som_assignment(
        data_path, pysom, True, 1_000_000, "fov0")
    assert status == 0
    got2 = feather.read_dataframe(base / "pixel_mat_data_temp"
                                  / "fov0.feather")
    feather.write_dataframe(oracle2, base / "oracle_som2.feather",
                            compression="uncompressed")
    assert_frame_equal(got2,
                       feather.read_dataframe(base / "oracle_som2.feather"))


@pytest.fixture()
def consensus(base):
    pysom = _pysom(base)
    pixel_som_clustering.cluster_pixels(FOVS, str(base), pysom,
                                        data_dir="pixel_mat_data")
    pixel_som_clustering.generate_som_avg_files(
        FOVS, CHANNELS, str(base), pysom, data_dir="pixel_mat_data")
    pixel_cc = cluster_helpers.PixieConsensusCluster(
        "pixel", base / "pixel_channel_avg_som_cluster.csv", CHANNELS,
        max_k=4)
    pixel_cc.scale_data()
    np.random.seed(42)
    pixel_cc.run_consensus_clustering()
    pixel_cc.generate_som_to_meta_map()
    return base, pixel_cc


def test_consensus_pass_parity(consensus):
    base, pixel_cc = consensus
    fov_path = base / "pixel_mat_data" / "fov0.feather"

    oracle = pixel_cc.assign_consensus_labels(
        feather.read_dataframe(fov_path))
    feather.write_dataframe(oracle, base / "oracle_meta.feather",
                            compression="uncompressed")

    (base / "pixel_mat_data_temp").mkdir()
    fov, status = pixel_meta_clustering.run_pixel_consensus_assignment(
        str(base / "pixel_mat_data"), pixel_cc, "fov0")
    assert status == 0
    got = feather.read_dataframe(base / "pixel_mat_data_temp"
                                 / "fov0.feather")
    assert_frame_equal(got,
                       feather.read_dataframe(base / "oracle_meta.feather"))


def test_remap_pass_parity(consensus):
    base, pixel_cc = consensus
    fov_path = base / "pixel_mat_data" / "fov0.feather"
    # give the file a meta column first (remap replaces it in place)
    feather.write_dataframe(
        pixel_cc.assign_consensus_labels(feather.read_dataframe(fov_path)),
        fov_path, compression="uncompressed")

    remap = pixel_cc.mapping.copy()
    # nontrivial remap: shift meta ids and rename
    remap["pixel_meta_cluster"] = remap["pixel_meta_cluster"] % 2 + 1
    remap_dict = dict(
        remap[["pixel_som_cluster", "pixel_meta_cluster"]].values)
    rename_dict = {1: "alpha", 2: "beta"}

    # DataFrame-path oracle (the pre-r4 update_pixel_meta_labels body)
    df = feather.read_dataframe(fov_path)
    df["pixel_meta_cluster"] = df["pixel_som_cluster"].map(remap_dict)
    df["pixel_meta_cluster_rename"] = df["pixel_meta_cluster"].map(
        rename_dict)
    feather.write_dataframe(df, base / "oracle_remap.feather",
                            compression="uncompressed")

    (base / "pixel_mat_data_temp").mkdir()
    fov, status = pixel_meta_clustering.update_pixel_meta_labels(
        str(base / "pixel_mat_data"), remap_dict, rename_dict, "fov0")
    assert status == 0
    got = feather.read_dataframe(base / "pixel_mat_data_temp"
                                 / "fov0.feather")
    want = feather.read_dataframe(base / "oracle_remap.feather")
    assert_frame_equal(got, want)
    # the rename column must read back as strings either way
    assert got["pixel_meta_cluster_rename"].iloc[0] in ("alpha", "beta")


def test_remap_unknown_som_label_still_rejected(consensus):
    base, pixel_cc = consensus
    remap_dict = {999: 1}  # covers none of the FOV's SOM labels
    with pytest.raises(ValueError):
        pixel_meta_clustering.update_pixel_meta_labels(
            str(base / "pixel_mat_data"), remap_dict, {1: "x"}, "fov0")


def test_corrupted_file_still_skipped(base):
    pysom = _pysom(base)
    (base / "pixel_mat_data_temp").mkdir()
    bad = base / "pixel_mat_data" / "fov0.feather"
    bad.write_bytes(b"not a feather file")
    fov, status = pixel_som_clustering.run_pixel_som_assignment(
        str(base / "pixel_mat_data"), pysom, False, 1_000_000, "fov0")
    assert status == 1


def test_channel_avg_missing_cluster_col_raises(base):
    """The column-selected read must NOT reclassify a missing cluster
    column (a pipeline-order bug) as a corrupted file to skip."""
    with pytest.raises(KeyError, match="missing columns"):
        pixel_cluster_utils.compute_pixel_cluster_channel_avg(
            FOVS, CHANNELS, str(base), "pixel_som_cluster", None,
            "pixel_mat_data")
