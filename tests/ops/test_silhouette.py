"""Device silhouette (`ops/distances.silhouette_score`) vs the sklearn
oracle (VERDICT r3 weak #4: the topic-EDA silhouette moves onto the
blocked device distance kernels)."""

import numpy as np
import pytest
from sklearn.metrics import silhouette_score as sk_silhouette

from ark_tpu.ops.distances import silhouette_score


def test_matches_sklearn_on_blobs(rng):
    centers = rng.normal(size=(4, 6)) * 5
    data = np.concatenate([
        centers[i] + rng.normal(size=(40, 6)) for i in range(4)
    ]).astype(np.float32)
    labels = np.repeat(np.arange(4), 40)
    got = silhouette_score(data, labels)
    want = sk_silhouette(data, labels, metric="euclidean")
    assert got == pytest.approx(want, abs=1e-5)


def test_matches_sklearn_on_random_labels(rng):
    """Near-zero scores exercise the sign/normalization conventions."""
    data = rng.random((150, 3)).astype(np.float32)
    labels = rng.integers(0, 5, 150)
    got = silhouette_score(data, labels)
    want = sk_silhouette(data, labels, metric="euclidean")
    assert got == pytest.approx(want, abs=1e-5)


def test_blocked_path_matches_unblocked(rng):
    data = rng.random((300, 4)).astype(np.float32)
    labels = rng.integers(0, 3, 300)
    full = silhouette_score(data, labels, block_rows=4096)
    blocked = silhouette_score(data, labels, block_rows=64)
    assert blocked == pytest.approx(full, abs=1e-6)


def test_noncontiguous_labels_and_singletons(rng):
    """Labels need not be 0..K-1; singleton clusters score 0 (sklearn
    convention) — verified against sklearn itself."""
    data = rng.random((50, 3)).astype(np.float32)
    labels = np.full(50, 7)
    labels[:20] = 3
    labels[20] = 11          # singleton cluster
    got = silhouette_score(data, labels)
    want = sk_silhouette(data, labels, metric="euclidean")
    assert got == pytest.approx(want, abs=1e-5)


def test_rejects_degenerate_label_counts(rng):
    data = rng.random((10, 2)).astype(np.float32)
    with pytest.raises(ValueError, match="Number of labels"):
        silhouette_score(data, np.zeros(10, int))
    with pytest.raises(ValueError, match="Number of labels"):
        silhouette_score(data, np.arange(10))


def test_stratified_split_keeps_every_stratum(rng):
    import pandas as pd

    from ark_tpu.spLDA.processing import _stratified_train_split

    n = {"f0": 40, "f1": 9, "f2": 1}
    df = pd.DataFrame({"v": np.arange(50)},
                      index=pd.MultiIndex.from_tuples(
                          [(f, i) for f, c in n.items() for i in range(c)]))
    strata = df.index.map(lambda x: x[0])
    out = _stratified_train_split(df, 0.75, strata, seed=42)
    per = out.index.map(lambda x: x[0]).value_counts()
    assert per["f0"] == 30          # round(0.75 * 40)
    assert per["f1"] == 7           # round(0.75 * 9)
    assert per["f2"] == 1           # at-least-one floor
    # deterministic
    again = _stratified_train_split(df, 0.75, strata, seed=42)
    assert list(out.index) == list(again.index)
