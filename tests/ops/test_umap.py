import matplotlib
matplotlib.use("Agg")

import numpy as np
import pandas as pd

from ark_tpu.ops import umap as umap_ops
from ark_tpu.analysis import dimensionality_reduction as dr


def _blobs(rng, n_per=60, d=8):
    centers = np.array([[0] * d, [8] * d, [-8] * d], float)
    data = np.concatenate([
        c + rng.normal(0, 0.5, (n_per, d)) for c in centers]).astype(np.float32)
    labels = np.repeat(np.arange(3), n_per)
    return data, labels


def _separation(emb, labels):
    """Ratio of mean inter-cluster to mean intra-cluster distance."""
    intra, inter = [], []
    cents = np.stack([emb[labels == i].mean(0) for i in range(3)])
    for i in range(3):
        intra.append(np.linalg.norm(emb[labels == i] - cents[i], axis=1).mean())
    for i in range(3):
        for j in range(i + 1, 3):
            inter.append(np.linalg.norm(cents[i] - cents[j]))
    return np.mean(inter) / np.mean(intra)


def test_umap_separates_blobs(rng):
    data, labels = _blobs(rng)
    emb = umap_ops.UMAP(n_epochs=100, random_state=42).fit_transform(data)
    assert emb.shape == (180, 2)
    assert np.isfinite(emb).all()
    assert _separation(emb, labels) > 3.0


def test_pca_transform(rng):
    data, labels = _blobs(rng)
    emb = umap_ops.pca_transform(data)
    assert emb.shape == (180, 2)
    assert _separation(emb, labels) > 3.0


def test_visualize_dimensionality_reduction(rng, tmp_path):
    data, labels = _blobs(rng, n_per=30)
    df = pd.DataFrame(data, columns=[f"m{i}" for i in range(8)])
    df["pop"] = [f"p{i}" for i in labels]
    for algo in ["PCA", "UMAP"]:
        dr.visualize_dimensionality_reduction(
            df, [f"m{i}" for i in range(8)], "pop", algorithm=algo,
            save_dir=str(tmp_path))
    assert (tmp_path / "PCAVisualization.png").exists()
    assert (tmp_path / "UMAPVisualization.png").exists()


def test_knn_blocked_matches_bruteforce(rng):
    """Exact-recall assertion: the blocked top-k merge must equal brute
    force (indices up to distance ties, distances exactly)."""
    data = rng.random((517, 9)).astype(np.float32)  # odd N, forces padding
    idx, d = umap_ops._knn(data, k=10, block_rows=128, block_cols=64)
    idx, d = np.asarray(idx), np.asarray(d)
    full = np.sqrt(((data[:, None] - data[None]) ** 2).sum(-1))
    np.fill_diagonal(full, np.inf)
    ref_idx = np.argsort(full, axis=1)[:, :10]
    ref_d = np.take_along_axis(full, ref_idx, 1)
    np.testing.assert_allclose(np.sort(d, 1), np.sort(ref_d, 1),
                               rtol=1e-3, atol=1e-3)
    recall = np.mean([len(set(idx[i]) & set(ref_idx[i])) / 10
                      for i in range(len(data))])
    assert recall > 0.999


def test_knn_blocked_scales_past_n_squared(rng):
    """100k x 16 kNN runs without materializing N^2 (a dense matrix would
    be 40 GB; cohort-scale 200k was timed at ~3 min CPU, same code path)."""
    data = rng.random((100_000, 16)).astype(np.float32)
    idx, d = umap_ops._knn(data, k=15)
    assert idx.shape == (100_000, 15)
    assert np.asarray(d[:1000]).min() >= 0
    assert (np.asarray(idx) >= 0).all()


def test_umap_self_excluded_and_small_n(rng):
    data = rng.random((7, 3)).astype(np.float32)
    idx, d = umap_ops._knn(data, k=10)  # k > n-1 clamps
    assert idx.shape == (7, 6)
    for i in range(7):
        assert i not in np.asarray(idx[i])
    emb = umap_ops.UMAP(n_epochs=20).fit_transform(data)
    assert emb.shape == (7, 2) and np.isfinite(emb).all()


def test_optimize_segsum_matches_scatter_engine(rng):
    """The r4 sorted-segment_sum accumulation must reproduce the scatter
    engine exactly (up to summation-order float noise). With zero negative
    samples the two engines compute identical per-edge updates, so any
    difference is the accumulation machinery itself. Per-epoch reorder
    noise (~1e-7) compounds through 10 epochs of the nonlinear dynamics to
    ~1e-4 absolute — the tolerance reflects that, not a semantic gap."""
    import jax
    import jax.numpy as jnp

    data, _ = _blobs(rng, n_per=30, d=6)
    data = jnp.asarray(data)
    k = 8
    idx, dists = umap_ops._knn(data, k)
    rho, sigma = umap_ops._smooth_knn(dists)
    w = jnp.exp(-jnp.maximum(dists - rho[:, None], 0.0) / sigma[:, None])
    n = data.shape[0]
    heads = jnp.repeat(jnp.arange(n), k)
    tails = idx.reshape(-1)
    wflat = w.reshape(-1)
    emb0 = umap_ops._pca(data, 2)
    key = jax.random.PRNGKey(3)

    a = np.asarray(umap_ops._optimize(
        emb0, heads, tails, wflat, key, n_epochs=10,
        negative_sample_rate=0))
    b = np.asarray(umap_ops._optimize_scatter(
        emb0, heads, tails, wflat, key, n_epochs=10,
        negative_sample_rate=0))
    np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-3)

    # with negatives the sample schedules differ by design; both must
    # still produce finite, non-degenerate embeddings from the same key
    a5 = np.asarray(umap_ops._optimize(
        emb0, heads, tails, wflat, key, n_epochs=10))
    b5 = np.asarray(umap_ops._optimize_scatter(
        emb0, heads, tails, wflat, key, n_epochs=10))
    for e in (a5, b5):
        assert np.isfinite(e).all()
        assert e.std(0).min() > 0
