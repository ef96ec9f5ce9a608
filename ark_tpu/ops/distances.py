"""Pairwise-distance kernels (reference: per-FOV `scipy.cdist`,
`spatial_analysis_utils.py:55`). One fused XLA matmul-based kernel; for very
large FOVs the matrix is computed in row blocks to bound memory."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("zero_diagonal",))
def pairwise_distances(a: jax.Array, b: jax.Array,
                       zero_diagonal: bool = False) -> jax.Array:
    """Euclidean distances between rows of a (N,D) and b (M,D); (N, M).

    Uses the ||a||²−2ab+||b||² decomposition (MXU matmul), floored at 0.
    Pass `zero_diagonal=True` for self-distance matrices (a vs a): the MXU's
    accumulation makes d_ii a small POSITIVE value on TPU (not exactly 0),
    which would let `dist > 0` self-exclusion masks count a cell as its own
    nearest neighbor — the diagonal is forced to exact 0.
    """
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    a2 = jnp.sum(a * a, axis=1)[:, None]
    b2 = jnp.sum(b * b, axis=1)[None, :]
    # HIGHEST: TPU's default bf16 matmul would round the coordinates
    # (~0.4% relative) while the CPU suite validates true-f32 numerics
    d2 = a2 + b2 - 2.0 * jnp.dot(a, b.T,
                                 precision=jax.lax.Precision.HIGHEST)
    d = jnp.sqrt(jnp.maximum(d2, 0.0))
    if zero_diagonal:
        n, m = d.shape
        eye = jnp.arange(n)[:, None] == jnp.arange(m)[None, :]
        d = jnp.where(eye, 0.0, d)
    return d


def cdist(a, b=None, block_rows: int = 8192) -> np.ndarray:
    """scipy.spatial.distance.cdist equivalent on device; returns numpy.

    Splits rows into blocks when N is large so the (N, M) output is the only
    full-size buffer.
    """
    a = np.asarray(a, np.float32)
    self_dist = b is None
    b = a if self_dist else np.asarray(b, np.float32)
    n = a.shape[0]
    # exact-zero self distances when b is None: downstream `dist > 0` masks
    # depend on it, and the TPU MXU leaves small positive diagonal values
    if n <= block_rows:
        return np.asarray(pairwise_distances(
            jnp.asarray(a), jnp.asarray(b), zero_diagonal=self_dist))
    out = np.empty((n, b.shape[0]), np.float32)
    bj = jnp.asarray(b)
    for i in range(0, n, block_rows):
        out[i:i + block_rows] = np.asarray(
            pairwise_distances(jnp.asarray(a[i:i + block_rows]), bj))
    if self_dist:
        np.fill_diagonal(out, 0.0)
    return out


@functools.partial(jax.jit, static_argnames=("k",))
def knn_mean_distance(dist_cols: jax.Array, k: int) -> jax.Array:
    """Mean of the k smallest positive entries per row of (N, M) distances
    (used by cell_neighborhood_stats; reference sorts full columns)."""
    masked = jnp.where(dist_cols > 0, dist_cols, jnp.inf)
    neg_topk, _ = jax.lax.top_k(-masked, k)
    return jnp.mean(-neg_topk, axis=1)
