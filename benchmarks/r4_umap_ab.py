"""Same-process A/B: UMAP optimize-loop engines on the attach.

Engines (ark_tpu/ops/umap.py):
- `_optimize` (r4 default): per-epoch updates accumulated by two SORTED
  `segment_sum`s (heads/tails argsorted once, hoisted out of the scan) and
  all negative samples drawn+applied in one phase — 2 segmented reductions
  per epoch.
- `_optimize_scatter` (pre-r4): 6 duplicate-index scatter-adds per epoch,
  negative samples in 5 sequential phases.

The graph-construction stages (kNN, smooth-kNN, symmetrization, PCA init)
are shared and excluded — this isolates the optimizer, which dominated the
r4 kernel bench (20.3 s of the 50k-cell embed).

Protocol (CLAUDE.md): one process, warmed repo compile cache, best-of-3
with anti-replay variants routed through emb0 (the smallest operand that
changes every output), full-output np.asarray readback as the barrier,
variants materialized on device before the timed window.

Usage: python benchmarks/r4_umap_ab.py [--n 50000] [--epochs 200]
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


def main(n=50_000, d=16, k=15, n_epochs=200):
    _setup_cache()
    import jax
    import jax.numpy as jnp

    from ark_tpu.ops import umap as umap_ops

    rng = np.random.default_rng(0)
    centers = rng.normal(size=(20, d)).astype(np.float32) * 4
    data = jnp.asarray(centers[rng.integers(0, 20, n)]
                       + rng.normal(size=(n, d)).astype(np.float32))

    # shared graph construction (excluded from the A/B)
    idx, dists = umap_ops._knn(data, k)
    rho, sigma = umap_ops._smooth_knn(dists)
    w = jnp.exp(-jnp.maximum(dists - rho[:, None], 0.0) / sigma[:, None])
    heads = jnp.repeat(jnp.arange(n), k)
    tails = idx.reshape(-1)
    wflat = w.reshape(-1)
    w_rev = jnp.sum(jnp.take(w, tails, axis=0)
                    * (jnp.take(idx, tails, axis=0) == heads[:, None]),
                    axis=1)
    w_edges = wflat + w_rev - wflat * w_rev
    emb0 = umap_ops._pca(data, 2)
    emb0 = emb0 / (jnp.abs(emb0).max() + 1e-12) * 10.0
    key = jax.random.PRNGKey(42)
    # materialize anti-replay variants on device before timing
    variants = [jnp.asarray(np.asarray(emb0) * (1.0 + 1e-4 * (t + 1)))
                for t in range(3)]
    float(variants[-1].sum())  # force

    out = {"n": n, "k": k, "n_epochs": n_epochs}
    for name, fn in [("segsum", umap_ops._optimize),
                     ("scatter", umap_ops._optimize_scatter)]:
        np.asarray(fn(emb0, heads, tails, w_edges, key,
                      n_epochs=n_epochs))  # warm (compile excluded)
        best = float("inf")
        for v in variants:
            t0 = time.perf_counter()
            e = np.asarray(fn(v, heads, tails, w_edges, key,
                              n_epochs=n_epochs))
            best = min(best, time.perf_counter() - t0)
        assert np.isfinite(e).all()
        out[f"{name}_seconds"] = round(best, 3)
    out["speedup"] = round(out["scatter_seconds"] / out["segsum_seconds"], 2)
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=50_000)
    p.add_argument("--epochs", type=int, default=200)
    a = p.parse_args()
    main(n=a.n, n_epochs=a.epochs)
