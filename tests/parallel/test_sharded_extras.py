"""Sharded-execution parity for the VERDICT-r3 weak-#7 stages: the fused
fiber device program FOV-sharded, one cell-sharded spatial-LDA EM step,
and one edge-sharded UMAP epoch — each checked against an UNSHARDED
computation of the same math on the 8-virtual-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from ark_tpu.ops import classical, umap as umap_ops
from ark_tpu.parallel import cohort, mesh as mesh_utils
from ark_tpu.spLDA import model as lda_model


def test_run_fiber_cohort_matches_single_fov(rng):
    """FOV-sharded fused fiber program == the per-FOV program, including
    the non-divisible-batch padding path."""
    from ark_tpu.segmentation.fiber_segmentation import _fiber_device_program

    mesh = mesh_utils.get_mesh()
    imgs = rng.random((5, 24, 24)).astype(np.float32)  # 5 % 8 != 0
    out = cohort.run_fiber_cohort(imgs, fiber_widths=(1, 2), mesh=mesh)
    assert out["distance_transformed"].shape == (5, 24, 24)

    th, tw, n_tr, n_tc = classical._clahe_geometry(24, 24, 24 / 128)
    for i in range(5):
        single = _fiber_device_program(
            jnp.asarray(imgs[i]), jnp.float32(0.1), blur=2, th=th, tw=tw,
            n_tr=n_tr, n_tc=n_tc, fiber_widths=(1, 2), sobel_blur=1)
        np.testing.assert_allclose(out["elevation_map"][i],
                                   np.asarray(single["elevation_map"]),
                                   atol=1e-5)
        np.testing.assert_allclose(out["distance_transformed"][i],
                                   np.asarray(
                                       single["distance_transformed"]),
                                   atol=1e-5)


def _em_outer_unsharded(X, lam, gamma, L, alpha, eta, penalty, e_steps):
    """The `_lda_em` outer-iteration body, inlined as the oracle."""
    digamma = jax.scipy.special.digamma
    X, lam, gamma, L = (jnp.asarray(a, jnp.float32)
                        for a in (X, lam, gamma, L))
    elog_beta = digamma(lam) - digamma(lam.sum(1, keepdims=True))
    eb = jnp.exp(elog_beta)
    for _ in range(e_steps):
        elog_theta = digamma(gamma) - digamma(gamma.sum(1, keepdims=True))
        et = jnp.exp(elog_theta)
        gamma = alpha + et * ((X / (et @ eb + 1e-100)) @ eb.T)
    elog_theta = digamma(gamma) - digamma(gamma.sum(1, keepdims=True))
    et = jnp.exp(elog_theta)
    sstats = eb * (et.T @ (X / (et @ eb + 1e-100)))
    lam_new = eta + sstats
    gsum = gamma.sum(1, keepdims=True)
    theta = gamma / gsum
    theta = theta - penalty * (L @ theta)
    theta = jnp.maximum(theta, 1e-8)
    theta = theta / theta.sum(1, keepdims=True)
    return np.asarray(lam_new), np.asarray(theta * gsum)


def test_lda_em_step_sharded_matches_unsharded(rng):
    """Cell-sharded EM step (psum sstats + all_gather smoothing) must
    reproduce the single-device outer-iteration math, with a chain
    Laplacian whose rows couple cells in DIFFERENT shards."""
    mesh = mesh_utils.get_mesh()
    n, v, k = 24, 6, 3  # 24 cells over 8 devices = 3 per shard
    X = rng.integers(0, 5, (n, v)).astype(np.float32)
    lam0 = rng.random((k, v)).astype(np.float32) + 0.5
    gamma0 = np.ones((n, k), np.float32)
    L = (np.eye(n) * 2 - np.eye(n, k=1) - np.eye(n, k=-1)).astype(
        np.float32) / 4

    lam1, gamma1 = lda_model.em_step_sharded(
        X, lam0, gamma0, L, mesh, alpha=1 / k, eta=1 / k, penalty=0.1,
        e_steps=5)
    want_lam, want_gamma = _em_outer_unsharded(
        X, lam0, gamma0, L, 1 / k, 1 / k, 0.1, 5)
    np.testing.assert_allclose(np.asarray(lam1), want_lam, rtol=2e-4)
    np.testing.assert_allclose(np.asarray(gamma1), want_gamma, rtol=2e-4)


def test_umap_epoch_sharded_attract_matches_oracle(rng):
    """With negative_sample_rate=0 the sharded epoch is deterministic:
    the psum'd delta must equal a numpy scatter of the attract gradients,
    and zero-weight padding edges must contribute nothing."""
    mesh = mesh_utils.get_mesh()
    n_pts, n_edges = 12, 16  # 16 edges over 8 devices = 2 per shard
    emb = rng.random((n_pts, 2)).astype(np.float32)
    heads = rng.integers(0, n_pts, n_edges).astype(np.int32)
    tails = rng.integers(0, n_pts, n_edges).astype(np.int32)
    w = rng.random(n_edges).astype(np.float32)
    w[-3:] = 0.0  # padding-style edges
    lr = 0.7

    got = np.asarray(umap_ops.umap_epoch_sharded(
        emb, heads, tails, w, jax.random.PRNGKey(0), mesh, lr=lr,
        negative_sample_rate=0))

    a, b = umap_ops._A, umap_ops._B
    delta = np.zeros_like(emb)
    for h, t, wi in zip(heads, tails, w):
        diff = emb[h] - emb[t]
        d2 = float((diff ** 2).sum())
        if d2 > 0:
            d2s = max(d2, 1e-8)
            coef = -2.0 * a * b * d2s ** (b - 1.0) / (1.0 + a * d2s ** b)
        else:
            coef = 0.0
        g = np.clip(coef * diff, -4.0, 4.0) * wi
        delta[h] += lr * g
        delta[t] -= lr * g
    np.testing.assert_allclose(got, emb + delta, rtol=1e-4, atol=1e-6)


def test_umap_epoch_sharded_with_negatives_is_finite_and_moves(rng):
    mesh = mesh_utils.get_mesh()
    n_pts, n_edges = 12, 16
    emb = rng.random((n_pts, 2)).astype(np.float32)
    got = np.asarray(umap_ops.umap_epoch_sharded(
        emb, rng.integers(0, n_pts, n_edges),
        rng.integers(0, n_pts, n_edges),
        rng.random(n_edges).astype(np.float32) + 0.1,
        jax.random.PRNGKey(1), mesh, lr=1.0, negative_sample_rate=3))
    assert np.isfinite(got).all()
    assert np.abs(got - emb).sum() > 0
