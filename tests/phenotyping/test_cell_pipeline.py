"""End-to-end cell clustering test: the notebook-3 equivalent
(templates/3_Pixie_Cluster_Cells.ipynb) on synthetic pixel data."""

import os

import numpy as np
import pandas as pd
import pytest

from ark_tpu.io import feather_utils as feather
from ark_tpu.phenotyping import (cell_cluster_utils, cell_meta_clustering,
                                 cell_som_clustering, weighted_channel_comp)

FOVS = ["fov0", "fov1"]
CHANNELS = ["chan0", "chan1", "chan2"]
N_PIXEL_CLUSTERS = 5


@pytest.fixture(scope="module")
def cell_setup(tmp_path_factory):
    """Synthetic per-FOV pixel feathers (with labels + pixel meta clusters)
    and a matching cell table CSV."""
    rng = np.random.default_rng(12345)
    base = tmp_path_factory.mktemp("cellpipe")
    pixel_dir = base / "pixel_mat_data"
    pixel_dir.mkdir()
    cell_rows = []
    for fov in FOVS:
        n_cells = 30
        n_pixels = 3000
        labels = rng.integers(0, n_cells + 1, n_pixels)  # 0 = background
        clusters = rng.integers(1, N_PIXEL_CLUSTERS + 1, n_pixels)
        df = pd.DataFrame(rng.random((n_pixels, len(CHANNELS))),
                          columns=CHANNELS)
        df["fov"] = fov
        df["row_index"] = rng.integers(0, 64, n_pixels)
        df["column_index"] = rng.integers(0, 64, n_pixels)
        df["label"] = labels
        df["pixel_som_cluster"] = rng.integers(1, 101, n_pixels)
        df["pixel_meta_cluster"] = clusters
        df["pixel_meta_cluster_rename"] = [f"pmc_{c}" for c in clusters]
        feather.write_dataframe(df, pixel_dir / f"{fov}.feather")
        for lab in range(1, n_cells + 1):
            size = max(int((labels == lab).sum()), 1)
            cell_rows.append({"fov": fov, "label": lab,
                              "cell_size": float(size)})
    cell_table = pd.DataFrame(cell_rows)
    # add marker columns so add_consensus_labels has realistic schema
    for ch in CHANNELS:
        cell_table[ch] = rng.random(len(cell_table))
    cell_table_path = base / "cell_table.csv"
    cell_table.to_csv(cell_table_path, index=False)
    return str(base), str(pixel_dir), str(cell_table_path)


def test_full_cell_pipeline(cell_setup):
    base_dir, pixel_dir, cell_table_path = cell_setup

    # --- c2pc counts ---
    counts, counts_norm = cell_cluster_utils.create_c2pc_data(
        FOVS, pixel_dir, cell_table_path,
        pixel_cluster_col="pixel_meta_cluster_rename")
    count_cols = [c for c in counts.columns
                  if c.startswith("pixel_meta_cluster_rename_")]
    assert len(count_cols) == N_PIXEL_CLUSTERS
    assert (counts[count_cols].sum(axis=1) > 0).all()
    # norm = counts / cell_size
    r = counts[count_cols].values / counts["cell_size"].values[:, None]
    np.testing.assert_allclose(counts_norm[count_cols].values, r, rtol=1e-6)

    # --- cell SOM ---
    pysom = cell_som_clustering.train_cell_som(
        FOVS, base_dir, cell_table_path, count_cols, counts_norm.copy(),
        seed=42)
    labeled = cell_som_clustering.cluster_cells(base_dir, pysom, count_cols)
    assert labeled["cell_som_cluster"].between(1, 100).all()

    cell_som_clustering.generate_som_avg_files(
        base_dir, labeled, count_cols, "cell_som_cluster_avg.csv")
    som_avg = pd.read_csv(os.path.join(base_dir, "cell_som_cluster_avg.csv"))
    assert {"cell_som_cluster", "count"}.issubset(som_avg.columns)

    # --- consensus ---
    cell_cc, labeled = cell_meta_clustering.cell_consensus_cluster(
        base_dir, count_cols, labeled, "cell_som_cluster_avg.csv", max_k=4)
    assert labeled["cell_meta_cluster"].between(1, 4).all()

    cell_meta_clustering.generate_meta_avg_files(
        base_dir, cell_cc, count_cols, labeled, "cell_som_cluster_avg.csv",
        "cell_meta_cluster_avg.csv")
    som_avg2 = pd.read_csv(os.path.join(base_dir, "cell_som_cluster_avg.csv"))
    assert "cell_meta_cluster" in som_avg2.columns

    # --- weighted channel expression ---
    pixel_channel_avg = pd.DataFrame(
        np.random.default_rng(0).random((N_PIXEL_CLUSTERS, len(CHANNELS))),
        columns=CHANNELS)
    pixel_channel_avg["pixel_meta_cluster_rename"] = [
        f"pmc_{c}" for c in range(1, N_PIXEL_CLUSTERS + 1)]
    weighted = weighted_channel_comp.compute_p2c_weighted_channel_avg(
        pixel_channel_avg, CHANNELS, counts.copy(), fovs=FOVS,
        pixel_cluster_col="pixel_meta_cluster_rename")
    assert set(CHANNELS).issubset(weighted.columns)
    # manual check for one cell
    cc = counts[count_cols].values
    avg_sorted = pixel_channel_avg.sort_values("pixel_meta_cluster_rename")
    expected = (cc @ avg_sorted[CHANNELS].values) / \
        counts["cell_size"].values[:, None]
    np.testing.assert_allclose(weighted[CHANNELS].values, expected, rtol=1e-4)

    feather.write_dataframe(weighted, os.path.join(
        base_dir, "weighted_cell_channel.feather"))
    weighted_channel_comp.generate_wc_avg_files(
        FOVS, CHANNELS, base_dir, cell_cc, labeled)
    wc_som = pd.read_csv(os.path.join(base_dir,
                                      "cell_som_cluster_channel_avg.csv"))
    assert "cell_meta_cluster" in wc_som.columns

    # --- remap ---
    remap = cell_cc.mapping.copy()
    remap["cell_meta_cluster"] = (remap["cell_meta_cluster"] % 2) + 1
    remap["cell_meta_cluster_rename"] = remap["cell_meta_cluster"].map(
        lambda m: f"ct_{m}")
    remap.to_csv(os.path.join(base_dir, "cell_remap.csv"), index=False)
    labeled = cell_meta_clustering.apply_cell_meta_cluster_remapping(
        base_dir, labeled, "cell_remap.csv")
    assert labeled["cell_meta_cluster"].between(1, 2).all()
    cell_meta_clustering.generate_remap_avg_count_files(
        base_dir, labeled, "cell_remap.csv", count_cols,
        "cell_som_cluster_avg.csv", "cell_meta_cluster_avg.csv")
    weighted_channel_comp.generate_remap_avg_wc_files(
        FOVS, CHANNELS, base_dir, labeled, "cell_remap.csv",
        "weighted_cell_channel.feather", "cell_som_cluster_channel_avg.csv",
        "cell_meta_cluster_channel_avg.csv")

    # --- consensus labels into the cohort cell table ---
    cell_cluster_utils.add_consensus_labels_cell_table(
        base_dir, cell_table_path, labeled)
    out = pd.read_csv(os.path.splitext(cell_table_path)[0] +
                      "_cell_labels.csv")
    assert "cell_meta_cluster" in out.columns
    assert out["cell_meta_cluster"].notna().all()
