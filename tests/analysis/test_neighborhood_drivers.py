"""Cohort-driver tests for cell_neighborhood_stats: the on-disk flows
(reference `cell_neighborhood_stats.py:86-115` diversity-analysis merge and
:162-245 distance-analysis driver) run against real dist-matrix files, with
naive per-cell NumPy loops as the oracle."""

import os

import numpy as np
import pandas as pd
import pytest

from ark_tpu import settings
from ark_tpu.analysis import cell_neighborhood_stats as cns
from ark_tpu.analysis import spatial_analysis_utils


@pytest.fixture
def cohort(tmp_path, rng):
    """Two FOVs with centroids + cell types, dist matrices saved to disk."""
    fovs, rows = ["fovA", "fovB"], []
    for fov in fovs:
        n = 40
        for lab in range(1, n + 1):
            rows.append({
                settings.FOV_ID: fov, settings.CELL_LABEL: lab,
                settings.CENTROID_0: float(rng.uniform(0, 200)),
                settings.CENTROID_1: float(rng.uniform(0, 200)),
                settings.CELL_TYPE: ["T", "B", "Myeloid"][lab % 3]})
    cell_table = pd.DataFrame(rows)
    dist_dir = tmp_path / "dist_mats"
    os.makedirs(dist_dir)
    spatial_analysis_utils.calc_dist_matrix(cell_table, str(dist_dir))
    return cell_table, str(dist_dir), tmp_path


def test_generate_cell_distance_analysis_matches_naive_loop(cohort):
    cell_table, dist_dir, tmp_path = cohort
    k = 3
    save_path = os.path.join(tmp_path, "cell_dists.csv")
    got = cns.generate_cell_distance_analysis(
        cell_table, dist_dir, save_path, k)

    assert os.path.exists(save_path)
    on_disk = pd.read_csv(save_path)
    assert len(on_disk) == len(cell_table)
    assert list(on_disk.columns[:3]) == [settings.FOV_ID,
                                         settings.CELL_LABEL,
                                         settings.CELL_TYPE]

    # oracle: per-cell python loop over the saved distance matrices
    for fov in ["fovA", "fovB"]:
        ft = cell_table[cell_table[settings.FOV_ID] == fov]
        dx = spatial_analysis_utils.load_dist_matrix(dist_dir, fov)
        sub = got[got[settings.FOV_ID] == fov]
        for ct in ["T", "B", "Myeloid"]:
            members = ft.loc[ft[settings.CELL_TYPE] == ct,
                             settings.CELL_LABEL].values
            cols = np.isin(np.asarray(dx.coords["dim_1"]), members)
            for i in range(len(ft)):
                # reference `dist_xr.where(dist_xr > 0)` (:148): a cell's
                # zero self-distance never counts among its k nearest
                row = dx.values[i, cols]
                want = np.mean(np.sort(row[row > 0])[:k])
                np.testing.assert_allclose(
                    sub.iloc[i][ct], want, rtol=1e-5,
                    err_msg=f"{fov} row {i} type {ct}")


def test_distance_analysis_nan_when_too_few_cells(cohort):
    cell_table, dist_dir, tmp_path = cohort
    # demand more neighbors than any type has members in a FOV
    got = cns.generate_cell_distance_analysis(
        cell_table, dist_dir, os.path.join(tmp_path, "d.csv"), k=50)
    assert got[["T", "B", "Myeloid"]].isna().all().all()


def test_generate_neighborhood_diversity_analysis_merges_resolutions(
        cohort, rng):
    cell_table, _, tmp_path = cohort
    radius = 50
    neigh_dir = tmp_path / "neighbors"
    os.makedirs(neigh_dir)
    # two cluster resolutions, each with its own frequency matrix on disk
    for col, types in [(settings.CELL_TYPE, ["T", "B", "Myeloid"]),
                       ("cell_meta_cluster_rename", ["immune", "tumor"])]:
        freqs = cell_table[[settings.FOV_ID, settings.CELL_LABEL]].copy()
        freqs[col] = rng.choice(types, len(freqs))
        raw = rng.random((len(freqs), len(types)))
        freqs[types] = raw / raw.sum(axis=1, keepdims=True)
        freqs.to_csv(neigh_dir /
                     f"neighborhood_freqs-{col}_radius{radius}.csv",
                     index=False)

    merged = cns.generate_neighborhood_diversity_analysis(
        str(neigh_dir), radius,
        [settings.CELL_TYPE, "cell_meta_cluster_rename"])
    assert len(merged) == len(cell_table)
    assert f"diversity_{settings.CELL_TYPE}" in merged.columns
    assert "diversity_cell_meta_cluster_rename" in merged.columns
    # both resolutions keyed to the same cells
    assert (merged[settings.CELL_LABEL].values ==
            cell_table[settings.CELL_LABEL].values).all()


def test_diversity_analysis_missing_file_raises(cohort):
    _, _, tmp_path = cohort
    with pytest.raises(Exception):
        cns.generate_neighborhood_diversity_analysis(
            str(tmp_path), 50, [settings.CELL_TYPE])


def test_compute_diversity_rejects_count_matrices(cohort, rng):
    cell_table, _, _ = cohort
    counts = cell_table[[settings.FOV_ID, settings.CELL_LABEL,
                         settings.CELL_TYPE]].copy()
    counts[["T", "B"]] = rng.integers(0, 9, (len(counts), 2)).astype(float)
    counts.loc[0, "T"] = 5.0          # counts, not frequencies
    with pytest.raises(ValueError, match="frequency"):
        cns.compute_neighborhood_diversity(counts, settings.CELL_TYPE)
