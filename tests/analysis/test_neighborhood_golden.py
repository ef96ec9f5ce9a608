"""Neighborhood analysis goldens: cluster pivots vs pandas oracles, planted
neighborhood k-means recovery, cell ratios/mixing formulas, and diversity
index values (reference `neighborhood_analysis.py:16-524`,
`cell_neighborhood_stats.py:13-115`)."""

import matplotlib
matplotlib.use("Agg")

import numpy as np
import pandas as pd
import pytest

from ark_tpu import settings
from ark_tpu.analysis import (cell_neighborhood_stats, neighborhood_analysis,
                              spatial_analysis_utils)


def _planted_env_table(rng, n_per_fov=120, fovs=("fov0", "fov1")):
    """Two spatial environments per FOV: left half A/B cells, right C/D."""
    rows = []
    markers = ["m_a", "m_c"]
    for fov in fovs:
        for i in range(1, n_per_fov + 1):
            x = rng.uniform(0, 512)
            left = x < 256
            ct = rng.choice(["A", "B"]) if left else rng.choice(["C", "D"])
            rows.append({settings.FOV_ID: fov, settings.CELL_LABEL: i,
                         settings.CELL_SIZE: 50.0,
                         "m_a": (0.9 if left else 0.1) + rng.normal(0, 0.02),
                         "m_c": (0.1 if left else 0.8) + rng.normal(0, 0.02),
                         settings.CELL_LABEL + "_dummy": 0,
                         settings.CELL_TYPE: ct,
                         settings.CENTROID_0: x,
                         settings.CENTROID_1: rng.uniform(0, 512)})
    df = pd.DataFrame(rows)
    # schema: channel block delimited by cell_size ... label
    cols = ([settings.CELL_SIZE] + markers + [settings.CELL_LABEL]
            + [settings.FOV_ID, settings.CELL_TYPE, settings.CENTROID_0,
               settings.CENTROID_1])
    return df[cols]


@pytest.fixture(scope="module")
def planted(tmp_path_factory):
    rng = np.random.default_rng(12345)
    base = tmp_path_factory.mktemp("nh")
    table = _planted_env_table(rng)
    dist_dir = base / "dists"
    dist_dir.mkdir()
    spatial_analysis_utils.calc_dist_matrix(table, str(dist_dir))
    counts, freqs = neighborhood_analysis.create_neighborhood_matrix(
        table, str(dist_dir), distlim=80)
    return table, counts, freqs


def test_neighbor_freqs_are_count_fractions(planted):
    _, counts, freqs = planted
    ct_cols = ["A", "B", "C", "D"]
    totals = counts[ct_cols].sum(axis=1).values
    np.testing.assert_allclose(freqs[ct_cols].values,
                               counts[ct_cols].values
                               / np.maximum(totals[:, None], 1), rtol=1e-6)


def test_cluster_matrix_results_recover_planted_environments(planted):
    table, counts, _ = planted
    all_clustered, ct_pivot, marker_means = \
        neighborhood_analysis.generate_cluster_matrix_results(
            table, counts, cluster_num=2)
    # the two k-means neighborhoods split along the planted halves
    left = all_clustered[settings.CENTROID_0] < 256
    k_left = all_clustered.loc[left, settings.KMEANS_CLUSTER].mode()[0]
    k_right = all_clustered.loc[~left, settings.KMEANS_CLUSTER].mode()[0]
    assert k_left != k_right
    purity = ((all_clustered.loc[left, settings.KMEANS_CLUSTER] == k_left)
              .mean())
    assert purity > 0.9

    # pivot golden vs pandas groupby
    want = all_clustered.groupby(
        [settings.KMEANS_CLUSTER, settings.CELL_TYPE]).size()
    for (k, ct), n in want.items():
        assert ct_pivot.loc[f"Cluster{k}", ct] == n
    # marker means: the left cluster is m_a-high, right is m_c-high
    assert marker_means.loc[f"Cluster{k_left}", "m_a"] > \
        marker_means.loc[f"Cluster{k_left}", "m_c"]
    assert marker_means.loc[f"Cluster{k_right}", "m_c"] > \
        marker_means.loc[f"Cluster{k_right}", "m_a"]
    # excluded_channels drops marker columns
    _, _, mm2 = neighborhood_analysis.generate_cluster_matrix_results(
        table, counts, cluster_num=2, excluded_channels=["m_c"])
    assert "m_c" not in mm2.columns
    with pytest.raises(ValueError, match="Invalid k"):
        neighborhood_analysis.generate_cluster_matrix_results(
            table, counts, cluster_num=1)


def test_compute_cell_ratios_golden(planted):
    import matplotlib.pyplot as plt
    table, counts, _ = planted
    ratios = neighborhood_analysis.compute_cell_ratios(
        counts, ["A"], ["B"], sorted(counts[settings.FOV_ID].unique()))
    plt.close("all")
    for _, row in ratios.iterrows():
        sub = counts[counts[settings.FOV_ID] == row["fov"]]
        n_a = (sub[settings.CELL_TYPE] == "A").sum()
        n_b = (sub[settings.CELL_TYPE] == "B").sum()
        assert row["cell_ratio"] == pytest.approx(n_a / n_b)
    # empty target population -> NaN ratio
    ratios2 = neighborhood_analysis.compute_cell_ratios(
        counts, ["NOPE"], ["B"], sorted(counts[settings.FOV_ID].unique()))
    assert ratios2["cell_ratio"].isna().all()
    plt.close("all")


def test_mixing_score_cold_image_thresholds(planted):
    table, counts, _ = planted
    fov_counts = counts[counts[settings.FOV_ID] == "fov0"]
    # high cell_count_thresh: cold image -> NaN
    score, total = neighborhood_analysis.compute_mixing_score(
        fov_counts.copy(), ["A"], ["C"], "percent",
        cell_count_thresh=10**6)
    assert np.isnan(score)
    # ratio_threshold=0 forces the ratio guard -> NaN
    score2, _ = neighborhood_analysis.compute_mixing_score(
        fov_counts.copy(), ["A"], ["C"], "percent", ratio_threshold=0,
        cell_count_thresh=1)
    assert np.isnan(score2)
    # planted geometry: A mixes with B (same half), not with C
    s_ab, _ = neighborhood_analysis.compute_mixing_score(
        fov_counts.copy(), ["A"], ["B"], "percent", cell_count_thresh=1)
    s_ac, _ = neighborhood_analysis.compute_mixing_score(
        fov_counts.copy(), ["A"], ["C"], "percent", cell_count_thresh=1)
    assert s_ab > s_ac


def test_shannon_diversity_golden():
    assert cell_neighborhood_stats.shannon_diversity([1.0]) == 0.0
    # uniform over 4 categories: log2(4) = 2 bits
    assert cell_neighborhood_stats.shannon_diversity(
        [0.25, 0.25, 0.25, 0.25]) == pytest.approx(2.0)
    # zeros are ignored
    assert cell_neighborhood_stats.shannon_diversity(
        [0.5, 0.5, 0.0]) == pytest.approx(1.0)


def test_neighborhood_diversity_planted(planted):
    _, _, freqs = planted
    div = cell_neighborhood_stats.compute_neighborhood_diversity(
        freqs, settings.CELL_TYPE)
    assert f"diversity_{settings.CELL_TYPE}" in div.columns
    vals = div[f"diversity_{settings.CELL_TYPE}"]
    assert (vals >= 0).all()
    assert vals.max() <= np.log2(4) + 1e-9   # 4 cell types max


def test_neighbor_counts_match_pair_loop_oracle(rng):
    from ark_tpu.utils.labeled_array import DataArray
    """Independent per-pair distance loop binding compute_neighbor_counts
    (previously the freqs test only re-derived the function's own
    counts/rowsum division — any counts bug passed)."""
    n = 30
    coords = rng.uniform(0, 100, (n, 2))
    phenos = rng.choice(["A", "B", "C"], n)
    table = pd.DataFrame({
        settings.CELL_LABEL: np.arange(1, n + 1),
        settings.CELL_TYPE: phenos})
    d = np.sqrt(((coords[:, None] - coords[None]) ** 2).sum(-1)).astype(
        np.float32)
    dm = DataArray(d, coords={"dim_0": np.arange(1, n + 1),
                              "dim_1": np.arange(1, n + 1)})
    distlim = 30.0
    counts, freqs = spatial_analysis_utils.compute_neighbor_counts(
        table, dm, distlim)
    # brute force: strict < distlim, self excluded
    for i in range(n):
        for p in ("A", "B", "C"):
            want = sum(1 for j in range(n)
                       if j != i and d[i, j] < distlim and phenos[j] == p)
            assert counts.iloc[i][p] == want, (i, p)
        tot = sum(1 for j in range(n) if j != i and d[i, j] < distlim)
        if tot:
            np.testing.assert_allclose(
                freqs.iloc[i][["A", "B", "C"]].astype(float).sum(), 1.0,
                rtol=1e-6)
    # self_neighbor=True includes the cell itself
    counts_self, _ = spatial_analysis_utils.compute_neighbor_counts(
        table, dm, distlim, self_neighbor=True)
    for i in range(n):
        assert counts_self.iloc[i][phenos[i]] == counts.iloc[i][phenos[i]] + 1


def test_mixing_score_values_match_hand_computation():
    """Pin the percent/homogeneous formulas to hand-computed values (the
    planted-direction assertion alone passes under role transpositions)."""
    mat = pd.DataFrame({
        settings.FOV_ID: ["f"] * 4,
        settings.CELL_LABEL: [1, 2, 3, 4],
        settings.CELL_TYPE: ["A", "A", "B", "B"],
        "A": [1.0, 1.0, 2.0, 0.0],
        "B": [3.0, 0.0, 1.0, 1.0]})
    # target rows (A): reference_target = 3+0 = 3, target_target = 1+1 = 2
    # reference rows (B): reference_reference = 1+1 = 2
    score, total = neighborhood_analysis.compute_mixing_score(
        mat, target_cells=["A"], reference_cells=["B"],
        mixing_type="percent", cell_count_thresh=0)
    assert total == 4
    assert score == pytest.approx(3.0 / (3.0 + 2.0))
    score_h, _ = neighborhood_analysis.compute_mixing_score(
        mat, target_cells=["A"], reference_cells=["B"],
        mixing_type="homogeneous", cell_count_thresh=0)
    assert score_h == pytest.approx(3.0 / (2.0 + 2.0))
