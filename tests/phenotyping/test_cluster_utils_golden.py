"""Phenotyping utility goldens: percentile calculators vs NumPy oracles,
c2pc pivots vs explicit groupby, cluster-average tables, consensus label
joins, resolution remapping (reference `pixel_cluster_utils.py` /
`cell_cluster_utils.py` / `post_cluster_utils.py` behavior)."""

import os
import warnings

import numpy as np
import pandas as pd
import pytest

from ark_tpu.io import feather_utils as feather
from ark_tpu.io.image_utils import read_image, save_image
from ark_tpu.phenotyping import (cell_cluster_utils, pixel_cluster_utils,
                                 post_cluster_utils)

from tests import test_utils

CHANNELS = ["chan0", "chan1", "chan2"]


@pytest.fixture()
def tiff_cohort(tmp_path):
    data = test_utils.create_image_cohort(str(tmp_path / "tiffs"),
                                          ["fov0", "fov1"], CHANNELS,
                                          shape=(32, 32))
    return str(tmp_path / "tiffs"), data


def test_channel_percentiles_match_numpy(tiff_cohort):
    tiff_dir, data = tiff_cohort
    got = pixel_cluster_utils.calculate_channel_percentiles(
        tiff_dir, ["fov0", "fov1"], CHANNELS, None, percentile=0.9)
    # natural-sorted columns
    assert list(got.columns) == sorted(CHANNELS)
    for ci, ch in enumerate(CHANNELS):
        vals = []
        for fov in ("fov0", "fov1"):
            img = data[fov][1][..., ci]
            vals.append(np.quantile(img[img > 0], 0.9))
        assert got[ch].iloc[0] == pytest.approx(np.mean(vals), rel=1e-5)


def test_pixel_intensity_percentile_matches_numpy(tiff_cohort):
    tiff_dir, data = tiff_cohort
    norm = pixel_cluster_utils.calculate_channel_percentiles(
        tiff_dir, ["fov0", "fov1"], CHANNELS, None, percentile=0.9)
    # the helper divides by the norm frame's column order as passed
    got = pixel_cluster_utils.calculate_pixel_intensity_percentile(
        tiff_dir, ["fov0", "fov1"], list(norm.columns), None, norm,
        percentile=0.05)
    vals = []
    for fov in ("fov0", "fov1"):
        ordered = np.stack([data[fov][1][..., CHANNELS.index(c)]
                            for c in norm.columns], axis=-1)
        summed = (ordered / norm.iloc[0].values).sum(axis=-1)
        vals.append(np.quantile(summed, 0.05))
    assert got == pytest.approx(np.mean(vals), rel=1e-4)


def test_normalize_rows_golden(rng):
    df = pd.DataFrame(rng.random((10, 3)), columns=CHANNELS)
    df["fov"] = "f0"
    df["row_index"] = np.arange(10)
    df["column_index"] = np.arange(10)
    df["label"] = np.arange(1, 11)
    out = pixel_cluster_utils.normalize_rows(df, CHANNELS)
    np.testing.assert_allclose(out[CHANNELS].sum(axis=1), 1.0, rtol=1e-6)
    # proportions preserved
    np.testing.assert_allclose(
        out[CHANNELS].values,
        df[CHANNELS].values / df[CHANNELS].values.sum(1, keepdims=True),
        rtol=1e-6)
    assert "label" in out.columns
    out2 = pixel_cluster_utils.normalize_rows(df, CHANNELS,
                                              include_seg_label=False)
    assert "label" not in out2.columns


def test_check_for_modified_channels_warns(tiff_cohort):
    tiff_dir, data = tiff_cohort
    save_image(os.path.join(tiff_dir, "fov0", "chan0_smoothed.tiff"),
               data["fov0"][1][..., 0])
    with pytest.warns(UserWarning, match="modified channels"):
        pixel_cluster_utils.check_for_modified_channels(
            tiff_dir, "fov0", None, ["chan0"])
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        pixel_cluster_utils.check_for_modified_channels(
            tiff_dir, "fov0", None, ["chan1"])


def test_smooth_channels_arg_validation(tiff_cohort):
    tiff_dir, _ = tiff_cohort
    with pytest.raises(ValueError, match="same length"):
        pixel_cluster_utils.smooth_channels(["fov0"], tiff_dir, None,
                                            ["chan0", "chan1"], [2])
    with pytest.raises(ValueError, match="single integer or a list"):
        pixel_cluster_utils.smooth_channels(["fov0"], tiff_dir, None,
                                            ["chan0"], "two")
    # no-op on empty channels
    pixel_cluster_utils.smooth_channels(["fov0"], tiff_dir, None, [], 2)


def _write_pixel_feathers(base, fovs, n_pixels=60, n_clusters=4, seed=5):
    rng = np.random.default_rng(seed)
    pdir = os.path.join(base, "pixel_mat_data")
    os.makedirs(pdir, exist_ok=True)
    frames = {}
    for fov in fovs:
        df = pd.DataFrame(rng.random((n_pixels, len(CHANNELS))),
                          columns=CHANNELS)
        df["fov"] = fov
        df["label"] = rng.integers(1, 6, n_pixels)
        df["pixel_som_cluster"] = rng.integers(1, n_clusters + 1, n_pixels)
        df["pixel_meta_cluster_rename"] = df["pixel_som_cluster"].map(
            lambda c: f"mc{c}")
        feather.write_dataframe(df, os.path.join(pdir, fov + ".feather"))
        frames[fov] = df
    return pdir, frames


def test_compute_pixel_cluster_channel_avg_golden(tmp_path):
    pdir, frames = _write_pixel_feathers(str(tmp_path), ["fov0", "fov1"])
    got = pixel_cluster_utils.compute_pixel_cluster_channel_avg(
        ["fov0", "fov1"], CHANNELS, str(tmp_path), "pixel_som_cluster",
        num_pixel_clusters=None, num_fovs_subset=100, keep_count=True)
    allf = pd.concat(frames.values())
    for clust in sorted(allf["pixel_som_cluster"].unique()):
        sub = allf[allf["pixel_som_cluster"] == clust]
        row = got[got["pixel_som_cluster"] == clust]
        assert int(row["count"].iloc[0]) == len(sub)
        for ch in CHANNELS:
            assert row[ch].iloc[0] == pytest.approx(sub[ch].mean(), rel=1e-6)
    # validation branches
    with pytest.raises(ValueError, match="positive integer"):
        pixel_cluster_utils.compute_pixel_cluster_channel_avg(
            ["fov0"], CHANNELS, str(tmp_path), "pixel_som_cluster", -1)
    with pytest.raises(ValueError, match="clusters out of"):
        pixel_cluster_utils.compute_pixel_cluster_channel_avg(
            ["fov0"], CHANNELS, str(tmp_path), "pixel_som_cluster",
            num_pixel_clusters=50)
    with pytest.warns(UserWarning, match="subsetting"):
        pixel_cluster_utils.compute_pixel_cluster_channel_avg(
            ["fov0", "fov1"], CHANNELS, str(tmp_path), "pixel_som_cluster",
            None, num_fovs_subset=10)


def test_create_c2pc_data_matches_groupby_oracle(tmp_path):
    pdir, frames = _write_pixel_feathers(str(tmp_path), ["fov0", "fov1"])
    rows = []
    for fov, df in frames.items():
        for lab in sorted(df["label"].unique()):
            rows.append({"fov": fov, "label": int(lab), "cell_size": 25.0})
    ct_path = str(tmp_path / "ct.csv")
    pd.DataFrame(rows).to_csv(ct_path, index=False)

    counts, norm = cell_cluster_utils.create_c2pc_data(
        ["fov0", "fov1"], pdir, ct_path,
        pixel_cluster_col="pixel_meta_cluster_rename")
    # oracle: pandas groupby pivot
    for fov, df in frames.items():
        pivot = df.groupby(["label", "pixel_meta_cluster_rename"]
                           ).size().unstack(fill_value=0)
        for lab in pivot.index:
            got_row = counts[(counts["fov"] == fov)
                             & (counts["label"] == lab)]
            for mc in pivot.columns:
                col = f"pixel_meta_cluster_rename_{mc}"
                assert int(got_row[col].iloc[0]) == pivot.loc[lab, mc]
    # normalized = counts / cell_size
    count_cols = [c for c in counts.columns
                  if c.startswith("pixel_meta_cluster_rename_")]
    np.testing.assert_allclose(norm[count_cols].values,
                               counts[count_cols].values / 25.0, rtol=1e-6)


def test_add_consensus_labels_fills_unassigned(tmp_path):
    ct = pd.DataFrame({"fov": ["f0"] * 3, "label": [1, 2, 3],
                       "cell_size": [10.0, 20.0, 30.0]})
    ct_path = str(tmp_path / "cells.csv")
    ct.to_csv(ct_path, index=False)
    som_data = pd.DataFrame({"fov": ["f0", "f0"], "label": [1, 3],
                             "cell_meta_cluster_rename": ["tumor", "immune"]})
    cell_cluster_utils.add_consensus_labels_cell_table(str(tmp_path), ct_path,
                                                       som_data)
    out = pd.read_csv(str(tmp_path / "cells_cell_labels.csv"))
    assert list(out["cell_meta_cluster"]) == ["tumor", "Unassigned", "immune"]
    assert list(out.columns) == ["fov", "label", "cell_size",
                                 "cell_meta_cluster"]


def test_generate_new_cluster_resolution(tmp_path):
    ct = pd.DataFrame({"fov": ["f0"] * 4, "label": [1, 2, 3, 4],
                       "cell_meta_cluster": ["CD4T", "CD8T", "Bcell",
                                             "tumor"]})
    save = str(tmp_path / "coarse.csv")
    post_cluster_utils.generate_new_cluster_resolution(
        ct.copy(), cluster_col="cell_meta_cluster",
        new_cluster_col="broad",
        cluster_mapping={"Tcell": ["CD4T", "CD8T"], "Bcell": ["Bcell"],
                         "tumor": ["tumor"]},
        save_path=save)
    out = pd.read_csv(save)
    assert list(out["broad"]) == ["Tcell", "Tcell", "Bcell", "tumor"]
    # unmapped population raises; existing column raises; non-list raises
    with pytest.raises(ValueError):
        post_cluster_utils.generate_new_cluster_resolution(
            ct.copy(), "cell_meta_cluster", "broad",
            {"Tcell": ["CD4T", "CD8T"]}, save_path=save)
    with pytest.raises(ValueError, match="already exists"):
        post_cluster_utils.generate_new_cluster_resolution(
            out, "cell_meta_cluster", "broad",
            {"Tcell": ["CD4T", "CD8T"]}, save_path=save)
    with pytest.raises(ValueError, match="list"):
        post_cluster_utils.generate_new_cluster_resolution(
            ct.copy(), "cell_meta_cluster", "broad2",
            {"Tcell": "CD4T"}, save_path=save)


def test_find_fovs_missing_col_temp_dir_lifecycle(tmp_path):
    pdir, frames = _write_pixel_feathers(str(tmp_path), ["fov0", "fov1"])
    # all feathers have the column -> nothing missing, no temp dir
    missing = pixel_cluster_utils.find_fovs_missing_col(
        str(tmp_path), "pixel_mat_data", "pixel_som_cluster")
    assert missing == []
    # drop the column from one FOV and mark progress via the temp dir
    df = frames["fov1"].drop(columns=["pixel_som_cluster"])
    feather.write_dataframe(df, os.path.join(pdir, "fov1.feather"))
    temp = os.path.join(str(tmp_path), "pixel_mat_data_temp")
    os.makedirs(temp)
    feather.write_dataframe(frames["fov0"],
                            os.path.join(temp, "fov0.feather"))
    missing = pixel_cluster_utils.find_fovs_missing_col(
        str(tmp_path), "pixel_mat_data", "pixel_som_cluster")
    assert missing == ["fov1"]


def test_plot_hist_thresholds_builds_stacked_axes(rng):
    """plot_hist_thresholds (reference post_cluster_utils.py:17-60): one
    histogram panel per population, range capped at the first population's
    percentile, optional threshold line; invalid inputs rejected."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    table = pd.DataFrame({
        "cell_meta_cluster": rng.choice(["T", "B", "DC"], 300),
        "CD45": rng.gamma(2.0, 1.5, 300)})
    plt.close("all")
    post_cluster_utils.plot_hist_thresholds(
        table, populations=["T", "B"], marker="CD45", threshold=1.0)
    fig = plt.gcf()
    assert len(fig.axes) == 2
    assert fig.axes[0].get_title() == "Distribution of CD45 in T"
    # threshold line drawn on each panel
    assert any(line.get_xdata()[0] == 1.0 for line in fig.axes[0].lines)
    # x-range capped at the 99.9th percentile of the FIRST population
    cap = np.quantile(table.loc[table.cell_meta_cluster == "T",
                                "CD45"].values, 0.999)
    assert fig.axes[0].patches[-1].get_x() <= cap + 1e-9

    with pytest.raises(ValueError, match="Invalid population"):
        post_cluster_utils.plot_hist_thresholds(
            table, populations=["NK"], marker="CD45")
    with pytest.raises(ValueError, match="as a column"):
        post_cluster_utils.plot_hist_thresholds(
            table, populations=["T"], marker="CD3")
    plt.close("all")
