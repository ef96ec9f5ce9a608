"""spLDA featurization goldens: every neighborhood reducer vs per-anchor
NumPy loops, MST difference-matrix structure, and the 4 featurization modes
through `featurize_cell_table` (reference delegates to the spatial_lda
package, `spLDA/processing.py:76-144`; this build implements them)."""

import numpy as np
import pandas as pd
import pytest

from ark_tpu.spLDA import featurization as ft
from ark_tpu.spLDA import processing as pros

from tests import test_utils


@pytest.fixture()
def fov_df(rng):
    n = 40
    df = pd.DataFrame({
        "x": rng.uniform(0, 300, n), "y": rng.uniform(0, 300, n),
        "cluster": rng.choice(["A", "B", "C"], n),
        "m1": rng.random(n), "m2": rng.random(n),
        "is_index": rng.random(n) < 0.5,
    })
    df.loc[0, "is_index"] = True   # at least one anchor
    return df


def _neighbors(df, i, radius):
    d = np.hypot(df["x"].values - df["x"].values[i],
                 df["y"].values - df["y"].values[i])
    return d <= radius


def test_neighborhood_to_cluster_matches_loop(fov_df):
    out = ft.neighborhood_to_cluster(fov_df, radius=60)
    anchors = np.flatnonzero(fov_df["is_index"].values)
    assert list(out.index) == list(anchors)
    for i in anchors:
        nb = _neighbors(fov_df, i, 60)
        for cl in ("A", "B", "C"):
            want = ((fov_df["cluster"].values == cl) & nb).sum()
            assert out.loc[i, cl] == pytest.approx(want)


def test_neighborhood_to_marker_matches_loop(fov_df):
    out = ft.neighborhood_to_marker(fov_df, radius=50, markers=["m1", "m2"])
    for i in out.index:
        nb = _neighbors(fov_df, i, 50)
        for m in ("m1", "m2"):
            want = ((fov_df[m].values > 0.5) & nb).sum()
            assert out.loc[i, m] == pytest.approx(want)


def test_neighborhood_to_avg_marker_matches_loop(fov_df):
    out = ft.neighborhood_to_avg_marker(fov_df, radius=50,
                                        markers=["m1", "m2"])
    for i in out.index:
        nb = _neighbors(fov_df, i, 50)
        for m in ("m1", "m2"):
            want = fov_df[m].values[nb].mean()   # anchor always included
            assert out.loc[i, m] == pytest.approx(want, rel=1e-5)


def test_neighborhood_to_count_matches_loop(fov_df):
    out = ft.neighborhood_to_count(fov_df, radius=40)
    for i in out.index:
        assert out.loc[i, "count"] == _neighbors(fov_df, i, 40).sum()


def test_mst_edges_structure(rng):
    coords = rng.uniform(0, 100, size=(15, 2))
    edges = ft._mst_edges(coords)
    assert edges.shape == (14, 2)           # spanning tree: n-1 edges
    # connected: union-find over the edges reaches every node
    parent = list(range(15))

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for a, b in edges:
        parent[find(int(a))] = find(int(b))
    assert len({find(i) for i in range(15)}) == 1
    # degenerate sizes
    assert ft._mst_edges(coords[:1]).shape == (0, 2)
    np.testing.assert_array_equal(ft._mst_edges(coords[:2]), [[0, 1]])
    # collinear points: complete-graph fallback still yields a tree
    line = np.stack([np.arange(5, dtype=float), np.zeros(5)], axis=1)
    assert ft._mst_edges(line).shape == (4, 2)


def test_difference_matrices_rows_are_signed_edges(fov_df):
    feats = ft.featurize_samples({"fov0": fov_df},
                                 ft.neighborhood_to_cluster, 60,
                                 "is_index", "x", "y")
    diffs = ft.make_merged_difference_matrices(feats, {"fov0": fov_df})
    d = diffs["fov0"]
    n_anchor = int(fov_df["is_index"].sum())
    assert d.shape == (n_anchor - 1, n_anchor)
    # each row: exactly one +1 and one -1
    assert ((d == 1).sum(axis=1) == 1).all()
    assert ((d == -1).sum(axis=1) == 1).all()
    assert (np.abs(d).sum(axis=1) == 2).all()


@pytest.mark.parametrize("mode", ["cluster", "marker", "avg_marker", "count"])
def test_featurize_cell_table_all_modes(rng, mode):
    ct = test_utils.make_cell_table(n_cells=120, fovs=["fov0", "fov1"])
    fmt = pros.format_cell_table(ct, markers=["marker0", "marker1"],
                                 clusters=["A", "B", "C"])
    features = pros.featurize_cell_table(fmt, featurization=mode,
                                         radius=100, cell_index="is_index")
    train = features["train_features"]
    assert isinstance(train.index, pd.MultiIndex)
    if mode == "cluster":
        assert set(train.columns) <= {"A", "B", "C"}
    elif mode == "count":
        assert list(train.columns) == ["count"]
    else:
        assert set(train.columns) == {"marker0", "marker1"}
    # featurized_fovs covers all anchors; train split is a subset
    assert len(features["featurized_fovs"]) >= len(train)
