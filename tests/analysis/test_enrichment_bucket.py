"""Shape-bucketing invariants of the enrichment permutation null.

`calculate_enrichment` zero-pads the cell axis to power-of-two buckets so a
100-FOV cohort reuses one executable instead of compiling ~100
(ops/distances.shape_bucket; reference computes per-FOV unpadded,
spatial_analysis_utils.py:17-64). The marker axis is NOT padded — the
phenotype list is cohort-level, so M is constant across a run and padding
it only inflates the dominant M·N² einsum. The correctness claim is sharp: padding
columns must stay OUT of the first n_real permutation slots (a real column
landing in a padding slot would multiply an all-zero distance row and
silently lose its contribution). These tests pin that end-to-end against
an independent numpy oracle that replays the exact PRNG draw.
"""

import jax
import numpy as np
import pytest

from ark_tpu.analysis.spatial_enrichment import calculate_enrichment
from ark_tpu.ops.distances import shape_bucket


@pytest.fixture
def planted(rng):
    n, m = 37, 5                       # buckets: n -> 128, m -> 8
    dist = rng.uniform(0, 100, (n, n))
    dist = (dist + dist.T) / 2
    np.fill_diagonal(dist, 0.0)
    pos = (rng.uniform(size=(m, n)) < 0.3).astype(np.float32)
    return dist, pos


def test_observed_counts_match_unpadded_numpy(planted):
    dist, pos = planted
    res = calculate_enrichment(dist, pos, dist_lim=30, bootstrap_num=4,
                               seed=7)
    d_bin = ((dist < 30) & (dist > 0)).astype(np.float64)
    expected = pos.astype(np.float64) @ d_bin @ pos.astype(np.float64).T
    np.testing.assert_array_equal(res["close_num"],
                                  np.round(expected).astype(np.int64))


def test_null_matches_numpy_oracle_replaying_the_draw(planted):
    """Each bootstrap's (M, M) null counts must equal an unpadded numpy
    P[:, q] · D · P[:, q]ᵀ where q is the real-column subsequence of the
    same full-bucket `jax.random.permutation` draw (stable partition:
    reals keep the relative order the full permutation induces, padding
    columns land past slot n_real and stay inert)."""
    dist, pos = planted
    n = dist.shape[0]
    B, seed, dist_lim = 16, 7, 30
    res = calculate_enrichment(dist, pos, dist_lim=dist_lim,
                               bootstrap_num=B, seed=seed)

    nb = shape_bucket(n)
    assert nb > n                      # the test exercises genuine padding
    d_bin = ((dist < dist_lim) & (dist > 0)).astype(np.float64)
    p64 = pos.astype(np.float64)
    keys = jax.random.split(jax.random.PRNGKey(seed), B)
    for b in range(B):
        # same shape as the kernel's draw — the stream depends on the
        # full (nb,) bucket, not just the first n slots
        perm_all = np.asarray(jax.random.permutation(keys[b], nb))
        q = perm_all[perm_all < n]     # stable partition, reals only
        null_b = p64[:, q] @ d_bin @ p64[:, q].T
        np.testing.assert_array_equal(res["close_num_rand"][b], null_b)


def test_marker_axis_padding_is_inert(planted):
    """Appending all-zero marker rows must leave every real marker's
    counts and null untouched (marker rows are independent)."""
    dist, pos = planted
    a = calculate_enrichment(dist, pos, dist_lim=30, bootstrap_num=8,
                             seed=11)
    pos_extra = np.vstack([pos, np.zeros((2, pos.shape[1]), np.float32)])
    b = calculate_enrichment(dist, pos_extra, dist_lim=30, bootstrap_num=8,
                             seed=11)
    m = pos.shape[0]
    np.testing.assert_array_equal(a["close_num"], b["close_num"][:m, :m])
    np.testing.assert_array_equal(a["close_num_rand"],
                                  b["close_num_rand"][:, :m, :m])
