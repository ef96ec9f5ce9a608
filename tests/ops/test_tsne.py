"""Device t-SNE quality tests (independent oracles: planted structure +
sklearn's trustworthiness metric + a same-protocol sklearn baseline).

Reference parity target: `sklearn.manifold.TSNE().fit_transform` as called
by `src/ark/analysis/dimensionality_reduction.py:85` — parity here is
distribution/neighborhood-level (stochastic embeddings are never bitwise
comparable), the same standard the SOM holds to pyFlowSOM (SURVEY.md §7b).
"""

import numpy as np
import pytest

from ark_tpu.ops import tsne as tsne_ops


def _blobs(rng, n_per=60, n_blobs=4, d=10, sep=8.0):
    centers = rng.normal(size=(n_blobs, d)) * sep
    x = np.concatenate([
        centers[i] + rng.normal(size=(n_per, d)) for i in range(n_blobs)])
    labels = np.repeat(np.arange(n_blobs), n_per)
    return x.astype(np.float32), labels


def _knn_label_purity(emb, labels, k=10):
    """Fraction of k-nearest embedding neighbors sharing the point's label
    (plain numpy; no library formula to self-confirm against)."""
    d2 = ((emb[:, None, :] - emb[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    nn = np.argsort(d2, axis=1)[:, :k]
    return float((labels[nn] == labels[:, None]).mean())


def test_planted_blobs_separate(rng):
    x, labels = _blobs(rng)
    emb = tsne_ops.tsne(x, n_iter=500, seed=0)
    assert emb.shape == (len(x), 2)
    assert np.isfinite(emb).all()
    purity = _knn_label_purity(emb, labels)
    assert purity > 0.95, f"kNN label purity {purity:.3f}"


def test_trustworthiness_matches_sklearn_tsne(rng):
    """Neighborhood preservation within a few points of sklearn's own
    t-SNE on the same data (sklearn's trustworthiness is the shared,
    implementation-independent metric)."""
    from sklearn.manifold import TSNE as SkTSNE
    from sklearn.manifold import trustworthiness

    x, _ = _blobs(rng, n_per=40, n_blobs=3)
    ours = tsne_ops.tsne(x, n_iter=500, seed=0)
    theirs = SkTSNE(n_components=2, init="random", random_state=0,
                    perplexity=30).fit_transform(x)
    t_ours = trustworthiness(x, ours, n_neighbors=10)
    t_theirs = trustworthiness(x, theirs, n_neighbors=10)
    assert t_ours > 0.9
    assert t_ours > t_theirs - 0.05, (t_ours, t_theirs)


def test_within_cluster_structure_not_collapsed(rng):
    """Binds the t-SNE machinery the coarse blob-separation tests can't
    (oracle-audit finding): an attraction-only gradient or broken Student-t
    Q still separates well-separated blobs (each connected component just
    collapses to a clump), scoring high purity/trustworthiness. Real t-SNE
    repulsion keeps within-cluster spread non-degenerate, and the embedding
    preserves within-cluster distance ORDER, not just membership. Healthy
    measurements on this fixture: within/between ≈ 0.038, Spearman ≈
    0.72-0.79 — thresholds sit far below those but far above the failure
    modes (collapse → ratio ~1e-6; clumping → correlation ~0)."""
    from scipy.spatial.distance import cdist
    from scipy.stats import spearmanr

    x, labels = _blobs(rng, n_per=40, n_blobs=3)
    emb = tsne_ops.tsne(x, n_iter=500, seed=0)
    cent = np.stack([emb[labels == k].mean(0) for k in range(3)])
    between = cdist(cent, cent)
    between = between[between > 0].mean()
    iu = np.triu_indices(40, 1)
    for k in range(3):
        e, xk = emb[labels == k], x[labels == k]
        within = cdist(e, e)[iu]
        spread = within.mean() / between
        assert spread > 0.01, f"blob {k} collapsed: within/between {spread:.2e}"
        rho = spearmanr(within, cdist(xk, xk)[iu]).statistic
        assert rho > 0.4, f"blob {k} distance order lost: spearman {rho:.3f}"


def test_deterministic_per_seed(rng):
    x, _ = _blobs(rng, n_per=20, n_blobs=2)
    a = tsne_ops.tsne(x, n_iter=100, seed=7)
    b = tsne_ops.tsne(x, n_iter=100, seed=7)
    c = tsne_ops.tsne(x, n_iter=100, seed=8)
    np.testing.assert_array_equal(a, b)
    assert np.abs(a - c).max() > 0

def test_perplexity_bisection_hits_target(rng):
    """The sigma search must produce rows whose perplexity (2^H) equals
    the request — checked directly against the definition."""
    import jax.numpy as jnp

    x = rng.normal(size=(200, 5)).astype(np.float32)
    d2 = np.asarray(tsne_ops._squared_dists(jnp.asarray(x)))
    p = np.asarray(tsne_ops._conditional_affinities(jnp.asarray(d2), 25.0))
    np.testing.assert_allclose(p.sum(axis=1), 1.0, atol=1e-4)
    h = -(np.where(p > 0, p * np.log(p), 0.0)).sum(axis=1)
    np.testing.assert_allclose(np.exp(h), 25.0, rtol=1e-3)


def test_facade_and_validation(rng):
    x, _ = _blobs(rng, n_per=20, n_blobs=2)
    model = tsne_ops.TSNE(n_iter=100, random_state=1)
    emb = model.fit_transform(x)
    assert emb.shape == (40, 2)
    np.testing.assert_array_equal(model.embedding_, emb)
    with pytest.raises(ValueError):
        tsne_ops.tsne(x[:3])
