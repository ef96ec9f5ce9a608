"""Statistical validation of the permutation enrichment engine on planted
spatial structure.

Extends the basic planted-proximity check with the full planted-signal
philosophy of the reference's `tests/synthetic_spatial_datagen.py:8-86`:
attraction AND avoidance must be detected with the right sign, and a null
(uniform) configuration must be calibrated — no excess false positives after
BH adjustment.
"""

import numpy as np
import pandas as pd
import pytest

from ark_tpu import settings
from ark_tpu.analysis import spatial_analysis_utils, spatial_enrichment
from ark_tpu.utils.labeled_array import DataArray


def _dist_mat_from_centroids(centroids):
    from ark_tpu.ops import distances
    d = distances.cdist(np.asarray(centroids, np.float32))
    n = len(d)
    labels = np.arange(1, n + 1)
    return DataArray(d, coords={"dim_0": labels, "dim_1": labels})


def _cell_table(centroids, pops, fov="fov0"):
    rows = []
    for i, (c, p) in enumerate(zip(centroids, pops), start=1):
        rows.append({settings.FOV_ID: fov, settings.CELL_LABEL: i,
                     settings.CELL_TYPE: p,
                     settings.CENTROID_0: c[0], settings.CENTROID_1: c[1]})
    return pd.DataFrame(rows)


def test_enrichment_detects_avoidance(rng):
    """A confined to the left strip, B to the right: z(A,B) must be strongly
    negative and p_neg significant (depletion detection)."""
    n = 40
    a = np.stack([rng.uniform(0, 800, n), rng.uniform(0, 80, n)], axis=1)
    b = np.stack([rng.uniform(0, 800, n), rng.uniform(720, 800, n)], axis=1)
    bg = rng.uniform(0, 800, size=(80, 2))
    centroids = np.concatenate([a, b, bg])
    pops = np.array(["A"] * n + ["B"] * n + ["BG"] * 80)
    table = _cell_table(centroids, pops)
    dist = _dist_mat_from_centroids(centroids)

    names, res = spatial_enrichment.calculate_cluster_spatial_enrichment(
        "fov0", table, dist, dist_lim=100, bootstrap_num=200, seed=1)
    ia, ib = names.index("A"), names.index("B")
    assert res["z"][ia, ib] < -2.0
    assert res["p_neg"][ia, ib] < 0.05
    assert res["close_num"][ia, ib] == 0      # strips are >100 px apart
    # self-enrichment of the confined populations must be positive
    assert res["z"][ia, ia] > 2.0 and res["z"][ib, ib] > 2.0


def test_enrichment_null_is_calibrated(rng):
    """Uniform random phenotypes: after BH adjustment no pair should be
    'significant' in the large majority of cases, and raw z must be centered."""
    centroids = rng.uniform(0, 1000, size=(150, 2))
    pops = rng.choice(["A", "B", "C"], size=150)
    table = _cell_table(centroids, pops)
    dist = _dist_mat_from_centroids(centroids)
    names, res = spatial_enrichment.calculate_cluster_spatial_enrichment(
        "fov0", table, dist, dist_lim=120, bootstrap_num=400, seed=2)
    # z across the 9 pairs: none should be extreme under the null
    assert np.abs(res["z"]).max() < 3.5
    assert np.abs(res["z"]).mean() < 1.5
    # BH-adjusted p-values: nothing significant at 5%
    assert (res["p_adj"] > 0.05).all()


def test_enrichment_symmetry_and_null_moments(rng):
    centroids = rng.uniform(0, 500, size=(100, 2))
    pops = rng.choice(["A", "B"], size=100)
    table = _cell_table(centroids, pops)
    dist = _dist_mat_from_centroids(centroids)
    names, res = spatial_enrichment.calculate_cluster_spatial_enrichment(
        "fov0", table, dist, dist_lim=80, bootstrap_num=100, seed=3)
    # close counts and the permutation null are symmetric marker matrices
    np.testing.assert_array_equal(res["close_num"], res["close_num"].T)
    np.testing.assert_allclose(res["muhat"], res["muhat"].T, rtol=1e-6)
    np.testing.assert_allclose(res["z"], res["z"].T, rtol=1e-5, atol=1e-5)
    # each permutation preserves per-marker positive counts, so every null
    # draw's diagonal close-count cannot exceed n_pos*(n_pos-1) pair bound
    n_a = (pops == "A").sum()
    assert res["close_num_rand"][:, 0, 0].max() <= n_a * (n_a - 1)


def test_channel_enrichment_detects_planted_marker_pairs(rng):
    """Channel-threshold path: high marker1 and marker2 planted on paired
    close cells -> marker1×marker2 enrichment (reference channel analysis,
    `spatial_analysis_utils.py:119-171`)."""
    from tests import test_utils
    centroids, pops = test_utils.make_planted_proximity_centroids(
        rng, n_a=30, n_b=30, n_bg=60, img_size=900, pair_dist=8)
    table = _cell_table(centroids, pops)
    # markers: m1 high on A cells, m2 high on B cells, noise elsewhere
    table["m1"] = np.where(pops == "A", 0.9, 0.05) + rng.normal(0, 0.01, len(pops))
    table["m2"] = np.where(pops == "B", 0.8, 0.04) + rng.normal(0, 0.01, len(pops))
    dist = _dist_mat_from_centroids(centroids)
    names, res = spatial_enrichment.calculate_channel_spatial_enrichment(
        "fov0", table, dist, ["m1", "m2"], thresh_vec=[0.5, 0.5],
        dist_lim=20, bootstrap_num=200, seed=4)
    i1, i2 = names.index("m1"), names.index("m2")
    assert res["z"][i1, i2] > 3.0
    assert res["p_pos"][i1, i2] < 0.01


def test_append_distance_features_adds_pseudo_cells(rng):
    """Distance-feature append: a per-cell distance column becomes a
    pseudo-cell row/col in the distance matrix (reference
    `spatial_analysis_utils.py:67-116`)."""
    centroids = rng.uniform(0, 300, size=(20, 2))
    pops = rng.choice(["A", "B"], size=20)
    table = _cell_table(centroids, pops)
    # per-cell distance to a planted structure at (150, 150)
    feat = np.linalg.norm(centroids - np.array([150.0, 150.0]), axis=1)
    table["dist_to_vessel"] = feat.astype(np.float32)
    dist = _dist_mat_from_centroids(centroids)

    new_table, new_dist = \
        spatial_analysis_utils.append_distance_features_to_dataset(
            "fov0", dist, table, ["dist_to_vessel"])
    assert len(new_table) == 21
    assert new_dist.shape == (21, 21)
    labs = list(new_dist.coords["dim_0"])
    new_id = max(np.arange(1, 21)) + 1
    assert labs[-1] == new_id
    # the pseudo-cell row holds the feature values symmetrically
    np.testing.assert_allclose(np.asarray(new_dist.values)[20, :20], feat,
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(new_dist.values)[:20, 20], feat,
                               rtol=1e-5)
    # and the appended cell-table row is typed by the feature name
    appended = new_table[new_table[settings.CELL_LABEL] == 21]
    assert list(appended[settings.CELL_TYPE]) == ["dist_to_vessel"]


def test_bootstrap_num_controls_pvalue_resolution(rng):
    """Permutation p-values use add-one smoothing: the minimum achievable
    p is 1/(B+1)."""
    from tests import test_utils
    centroids, pops = test_utils.make_planted_proximity_centroids(
        rng, n_a=20, n_b=20, n_bg=20, img_size=600, pair_dist=5)
    table = _cell_table(centroids, pops)
    dist = _dist_mat_from_centroids(centroids)
    for b in (50, 200):
        names, res = spatial_enrichment.calculate_cluster_spatial_enrichment(
            "fov0", table, dist, dist_lim=15, bootstrap_num=b, seed=5)
        ia, ib = names.index("A"), names.index("B")
        assert res["p_pos"][ia, ib] == pytest.approx(1.0 / (b + 1))


def test_close_counts_do_not_wrap_on_dense_fovs(rng):
    """A dense phenotype exceeds 65535 close pairs on the diagonal — the
    old uint16 cast silently wrapped the saved counts while z/muhat kept
    the true values (self-inconsistent stats table)."""
    n = 600
    coords = rng.uniform(0, 50, size=(n, 2)).astype(np.float32)  # packed
    d = np.sqrt(((coords[:, None] - coords[None]) ** 2).sum(-1))
    pos = np.ones((1, n), np.float32)
    dm = DataArray(d.astype(np.float32),
                   coords={"dim_0": np.arange(1, n + 1),
                           "dim_1": np.arange(1, n + 1)})
    res = spatial_enrichment.calculate_enrichment(
        dm, pos, dist_lim=100, bootstrap_num=10, seed=1)
    true_pairs = int((d > 0).sum())          # everything is within 100
    assert true_pairs > 65535
    assert res["close_num"][0, 0] == true_pairs
    assert res["close_num"].dtype == np.int64


def test_cohort_phenotype_list_tolerates_missing_types(rng):
    """A cohort-wide included_cell_types list must not crash on a FOV
    lacking one type — it warns and emits zero rows for it."""
    import warnings as _warnings
    n = 40
    table = pd.DataFrame({
        "fov": ["f0"] * n,
        "label": np.arange(1, n + 1),
        "cell_meta_cluster": ["A"] * 20 + ["B"] * 20})
    coords = rng.uniform(0, 200, (n, 2))
    d = np.sqrt(((coords[:, None] - coords[None]) ** 2).sum(-1))
    dm = DataArray(d.astype(np.float32),
                   coords={"dim_0": np.arange(1, n + 1),
                           "dim_1": np.arange(1, n + 1)})
    with _warnings.catch_warnings(record=True) as w:
        _warnings.simplefilter("always")
        names, res = spatial_enrichment.calculate_cluster_spatial_enrichment(
            "f0", table, dm, included_cell_types=["A", "B", "Missing"],
            dist_lim=50, bootstrap_num=10)
    assert any("Missing" in str(x.message) for x in w)
    assert list(names) == ["A", "B", "Missing"]
    assert res["close_num"][2].sum() == 0       # zero row, not a crash
    assert np.isfinite(res["z"]).all()
