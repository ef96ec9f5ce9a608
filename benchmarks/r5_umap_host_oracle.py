"""Stage-matched host oracle for the JAX UMAP (VERDICT-r4 weak #4).

umap-learn is not installed in this environment (it is the reference's
engine), so — exactly like the r4 fiber benchmark — the anchor is a
from-scratch numpy implementation of the SAME pipeline stages the device
engine runs: exact brute-force kNN (blocked Gram-matrix distances), the
smooth-kNN (rho, sigma) bisection, the fuzzy-simplicial-set edge weights
with the kNN-lookup symmetrization, and the same all-edges-per-epoch SGD
schedule (one attractive phase + `negative_sample_rate` negatives drawn
per epoch at the epoch-start embedding, linear LR decay). Both engines
must pass the same embedding-quality gate (planted-blob intra/inter
separation, as in tests/ops/test_umap_quality.py) — the comparison is
quality-gated, not bitwise, because the negative-sample RNG streams
necessarily differ (numpy vs jax PRNG).

Caveat stated up front: a hand-written single-threaded numpy pipeline is
a WEAKER baseline than umap-learn's numba-compiled kernels; the measured
ratio is an upper bound on the win vs numpy, not vs umap-learn.

Usage: python benchmarks/r5_umap_host_oracle.py [--n 50000] [--d 16]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
from r4_kernel_bench import _setup_cache  # noqa: E402


def host_knn(data, k, block=2048):
    """Exact kNN (excluding self) via blocked ||a-b||² = |a|²+|b|²-2ab."""
    n = data.shape[0]
    sq = np.einsum("ij,ij->i", data, data)
    idx = np.empty((n, k), np.int64)
    dists = np.empty((n, k), np.float32)
    for s in range(0, n, block):
        e = min(s + block, n)
        d2 = sq[s:e, None] + sq[None, :] - 2.0 * (data[s:e] @ data.T)
        np.maximum(d2, 0.0, out=d2)
        d2[np.arange(s, e) - s, np.arange(s, e)] = np.inf  # exclude self
        part = np.argpartition(d2, k, axis=1)[:, :k]
        pd = np.take_along_axis(d2, part, axis=1)
        order = np.argsort(pd, axis=1)
        idx[s:e] = np.take_along_axis(part, order, axis=1)
        dists[s:e] = np.sqrt(np.take_along_axis(pd, order, axis=1))
    return idx, dists


def host_smooth_knn(dists, n_iter=64):
    """(rho, sigma) by the same bisection as ops/umap._smooth_knn."""
    k = dists.shape[1]
    target = np.log2(float(k))
    rho = dists[:, 0]
    shifted = np.maximum(dists - rho[:, None], 0.0)
    lo = np.full(dists.shape[0], 1e-6)
    hi = np.full(dists.shape[0], 1e3)
    for _ in range(n_iter):
        mid = (lo + hi) / 2.0
        val = np.sum(np.exp(-shifted / mid[:, None]), axis=1)
        big = val > target
        lo = np.where(big, lo, mid)
        hi = np.where(big, mid, hi)
    return rho, (lo + hi) / 2.0


def host_fuzzy_edges(idx, dists, rho, sigma):
    """Edge list + symmetrized weights (same kNN-lookup symmetrization as
    UMAP.fit_transform's O(N·k²) gathered compare)."""
    n, k = idx.shape
    w = np.exp(-np.maximum(dists - rho[:, None], 0.0) / sigma[:, None])
    heads = np.repeat(np.arange(n), k)
    tails = idx.reshape(-1)
    wflat = w.reshape(-1)
    w_rev = np.sum(w[tails] * (idx[tails] == heads[:, None]), axis=1)
    return heads, tails, wflat + w_rev - wflat * w_rev


def host_optimize(emb0, heads, tails, weights, n, n_epochs=200,
                  negative_sample_rate=5, initial_lr=1.0,
                  a=1.576943, b=0.8950608, seed=42):
    """Same SGD schedule as ops/umap._optimize, in numpy."""
    rng = np.random.default_rng(seed)
    emb = emb0.copy()
    n_edges = heads.shape[0]
    for t in range(n_epochs):
        lr = initial_lr * (1.0 - t / n_epochs)
        he, ta = emb[heads], emb[tails]
        diff = he - ta
        d2 = np.sum(diff * diff, axis=1)
        d2s = np.maximum(d2, 1e-8)
        coef = np.where(d2 > 0.0,
                        -2.0 * a * b * d2s ** (b - 1.0)
                        / (1.0 + a * d2s ** b), 0.0)
        attract = np.clip(coef[:, None] * diff, -4.0, 4.0) * weights[:, None]
        repel = np.zeros_like(attract)
        for _ in range(negative_sample_rate):
            negs = rng.integers(0, n, n_edges)
            ndiff = he - emb[negs]
            nd2 = np.sum(ndiff * ndiff, axis=1)
            ncoef = 2.0 * b / ((0.001 + nd2) * (1.0 + a * nd2 ** b))
            repel += np.clip(ncoef[:, None] * ndiff, -4.0, 4.0) \
                * weights[:, None]
        upd = lr * (attract + repel)
        np.add.at(emb, heads, upd)
        np.add.at(emb, tails, -lr * attract)
    return emb


def host_umap(data, n_neighbors=15, n_epochs=200, seed=42, timings=None):
    t = {}
    t0 = time.perf_counter()
    idx, dists = host_knn(data, n_neighbors)
    t["knn_s"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    rho, sigma = host_smooth_knn(dists)
    heads, tails, w = host_fuzzy_edges(idx, dists, rho, sigma)
    t["fuzzy_s"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    x = data - data.mean(0, keepdims=True)
    vals, vecs = np.linalg.eigh((x.T @ x) / x.shape[0])
    emb0 = x @ vecs[:, ::-1][:, :2]
    emb0 = emb0 / (np.abs(emb0).max() + 1e-12) * 10.0
    emb = host_optimize(emb0.astype(np.float32), heads, tails,
                        w.astype(np.float32), data.shape[0],
                        n_epochs=n_epochs, seed=seed)
    t["sgd_s"] = time.perf_counter() - t0
    if timings is not None:
        timings.update(t)
    return emb


def blob_quality(emb, labels):
    """Planted-blob separation: mean intra-cluster / inter-cluster
    embedding distance (lower is better; same gate family as
    tests/ops/test_umap_quality.py)."""
    intra, inter = [], []
    for c in np.unique(labels):
        pts = emb[labels == c][:200]
        others = emb[labels != c][:200]
        intra.append(np.linalg.norm(
            pts[:, None, :] - pts[None, :, :], axis=-1).mean())
        inter.append(np.linalg.norm(
            pts[:, None, :] - others[None, :, :], axis=-1).mean())
    return float(np.mean(intra) / np.mean(inter))


def main(n=50_000, d=16, k_clusters=6, n_epochs=200):
    _setup_cache()
    from ark_tpu.ops.umap import UMAP

    rng = np.random.default_rng(12345)
    centers = rng.normal(size=(k_clusters, d)) * 6.0
    labels = rng.integers(0, k_clusters, n)
    data = (centers[labels] + rng.normal(size=(n, d))).astype(np.float32)

    out = {"n": n, "d": d, "epochs": n_epochs}

    # device engine (honest wall: fit_transform materializes to numpy).
    # The warmup runs on a PERTURBED copy: the relay replays cached
    # (executable, args) executions (CLAUDE.md trap #2), so timing a
    # second call with bit-identical inputs could measure a cache hit
    # instead of device work. The perturbation changes arg bytes only —
    # shapes match, so the timed run still pays zero compiles.
    um = UMAP(n_epochs=n_epochs, random_state=42)
    um.fit_transform(data * np.float32(1.0 + 1e-4))   # compile warmup
    t0 = time.perf_counter()
    emb_dev = um.fit_transform(data)
    out["device_total_s"] = round(time.perf_counter() - t0, 2)
    out["device_quality"] = round(blob_quality(emb_dev, labels), 3)

    host_t = {}
    t0 = time.perf_counter()
    emb_host = host_umap(data, n_epochs=n_epochs, timings=host_t)
    out["host_total_s"] = round(time.perf_counter() - t0, 2)
    out.update({k: round(v, 2) for k, v in host_t.items()})
    out["host_quality"] = round(blob_quality(emb_host, labels), 3)
    out["speedup"] = round(out["host_total_s"] / out["device_total_s"], 1)
    # quality gate: both engines must separate the planted blobs
    out["quality_ok"] = bool(out["device_quality"] < 0.5
                             and out["host_quality"] < 0.5)
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=50_000)
    p.add_argument("--d", type=int, default=16)
    p.add_argument("--epochs", type=int, default=200)
    a = p.parse_args()
    main(n=a.n, d=a.d, n_epochs=a.epochs)
