"""Quantile reductions with numpy-linear-interpolation semantics on device.

The reference's normalization contract is built on `np.quantile` /
`pandas.DataFrame.quantile` (linear interpolation) — channel 99th percentiles
of nonzero pixels (`pixel_cluster_utils.py:44-52`), 99.9% quantiles ignoring
zeros (`pixie_preprocessing.py:407`, `cluster_helpers.py:366`), and the 5%
pixel-intensity threshold (`pixel_cluster_utils.py:104`). jnp.quantile uses
the same 'linear' method, so these helpers are bit-compatible with numpy up to
float32 rounding (SURVEY.md §7 hard part a)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _use_bisect() -> bool:
    """TPU: the 32-pass counting bisection beats the XLA sort ~6x on FOV-
    scale columns (measured 30 -> 5 ms for 1M x 16 at q=0.999, host-chained
    anti-replay protocol); CPU keeps the sort path. Both are exact and
    bit-identical (trace-time decision)."""
    return jax.default_backend() == "tpu"


@functools.partial(jax.jit, static_argnames=("q",))
def quantile(x: jax.Array, q: float) -> jax.Array:
    """np.quantile(x, q) with linear interpolation, on device."""
    flat = x.reshape(-1).astype(jnp.float32)
    if _use_bisect():
        out = _masked_quantile_flat(flat, jnp.ones_like(flat, bool), q)
        # np.quantile propagates NaN; the bit-key bisection would instead
        # order NaN as an extreme value, silently diverging from the CPU
        # sort path on the same data
        return jnp.where(jnp.any(jnp.isnan(flat)), jnp.nan, out)
    return jnp.quantile(flat, q)


@functools.partial(jax.jit, static_argnames=("q",))
def nonzero_quantile(x: jax.Array, q: float) -> jax.Array:
    """Quantile of the positive entries of x (reference pattern
    `img[img > 0]` then np.quantile). NaN if no positive entries."""
    x = x.reshape(-1).astype(jnp.float32)
    if _use_bisect():
        return _masked_quantile_flat(x, x > 0, q)
    masked = jnp.where(x > 0, x, jnp.nan)
    return jnp.nanquantile(masked, q)


@functools.partial(jax.jit, static_argnames=("q",))
def nonzero_quantile_per_column(x: jax.Array, q: float) -> jax.Array:
    """Per-column q-quantile ignoring zeros (pandas
    `.replace(0, np.nan).quantile(q)` semantics). x: (N, C) -> (C,)."""
    if _use_bisect():
        return nonzero_quantile_per_column_bisect(x, q)
    x = x.astype(jnp.float32)
    masked = jnp.where(x == 0, jnp.nan, x)
    return jnp.nanquantile(masked, q, axis=0)


@functools.partial(jax.jit, static_argnames=("q",))
def masked_quantile_per_column(x: jax.Array, valid: jax.Array, q: float) -> jax.Array:
    """Per-column quantile over rows where `valid` is True, ignoring zeros.

    Used to compute per-FOV post-rownorm 99.9% values without compacting the
    dense (H*W, C) device matrix (invalid rows stay padded).
    """
    if _use_bisect():
        return masked_quantile_per_column_bisect(x, valid, q)
    x = x.astype(jnp.float32)
    bad = (~valid[:, None]) | (x == 0)
    return jnp.nanquantile(jnp.where(bad, jnp.nan, x), q, axis=0)


# ---------------------------------------------------------------------------
# Sort-free exact quantiles: 32-step bisection on the order-preserving
# uint32 keys of the float bits, counting `key <= mid` per step. A full
# XLA sort of a 1M-row FOV column costs ~10x these counting passes on TPU
# (the same trick Mesmer preprocessing uses, `mesmer._order_stats_bisect`;
# results are exact f32 order statistics, then linearly interpolated).
# ---------------------------------------------------------------------------

def _float_keys(x: jax.Array) -> jax.Array:
    """IEEE754 f32 -> order-preserving uint32 key (negatives flipped)."""
    bits = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint32)
    return jnp.where(bits >> 31 == 1, ~bits, bits ^ jnp.uint32(0x80000000))


def _keys_to_float(keys: jax.Array) -> jax.Array:
    fbits = jnp.where(keys >> 31 == 1, keys ^ jnp.uint32(0x80000000), ~keys)
    return jax.lax.bitcast_convert_type(fbits, jnp.float32)


def masked_order_stats(x: jax.Array, valid: jax.Array,
                       ranks: jax.Array) -> jax.Array:
    """Exact order statistics of the VALID entries per column, without
    sorting. x: (N, C); valid: (N, C) bool; ranks: (C, M) int (may be
    traced/dynamic). Returns (C, M) f32 — the rank[c, m]-th smallest valid
    value of column c (garbage where a column has no valid entries)."""
    key = jnp.where(valid, _float_keys(x), jnp.uint32(0xFFFFFFFF))
    k = ranks.astype(jnp.uint32)
    # derive the loop carries from BOTH `ranks` and the data (not fresh
    # constants) so they inherit any shard_map manual-axis varying-ness —
    # the loop body's counts depend on `x`, and a carry init with weaker
    # varying-ness than the body output fails the fori_loop carry-type
    # check inside shard_map bodies (either operand alone can be an
    # unvarying constant, e.g. a `jnp.ones` mask built inside the shard)
    zero = (k * jnp.uint32(0)) + (key.ravel()[0] * jnp.uint32(0))
    lo = zero
    hi = zero + jnp.uint32(0xFFFFFFFE)

    def body(_, lh):
        lo, hi = lh
        mid = lo + (hi - lo) // 2
        # cnt[c, m] = #{n : key[n, c] <= mid[c, m]}
        cnt = jnp.sum((key[:, :, None] <= mid[None, :, :])
                      .astype(jnp.uint32), axis=0)
        take_hi = cnt > k
        hi = jnp.where(take_hi, mid, hi)
        lo = jnp.where(take_hi, lo, mid + 1)
        return lo, hi

    lo, hi = jax.lax.fori_loop(0, 32, body, (lo, hi))
    return _keys_to_float(lo)


def _masked_quantile_flat(flat: jax.Array, valid: jax.Array,
                          q: float) -> jax.Array:
    """Linear-interpolated quantile of the valid entries of a 1-D array via
    counting bisection; NaN when nothing is valid. The count is a plain
    full-array reduction per step (natural TPU layout; the (N, 1)-column
    path would waste 127/128 lanes)."""
    key = jnp.where(valid, _float_keys(flat), jnp.uint32(0xFFFFFFFF))
    n_valid = jnp.sum(valid)
    pos = q * jnp.maximum(n_valid - 1, 0).astype(jnp.float32)
    i0 = jnp.floor(pos).astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, jnp.maximum(n_valid - 1, 0)).astype(jnp.int32)
    frac = pos - i0.astype(jnp.float32)
    k = jnp.stack([i0, i1]).astype(jnp.uint32)           # (2,)
    lo = jnp.zeros((2,), jnp.uint32)
    hi = jnp.full((2,), 0xFFFFFFFE, jnp.uint32)

    def body(_, lh):
        lo, hi = lh
        mid = lo + (hi - lo) // 2
        cnt = jnp.sum((key[:, None] <= mid[None, :]).astype(jnp.uint32),
                      axis=0)
        take_hi = cnt > k
        hi = jnp.where(take_hi, mid, hi)
        lo = jnp.where(take_hi, lo, mid + 1)
        return lo, hi

    lo, hi = jax.lax.fori_loop(0, 32, body, (lo, hi))
    stats = _keys_to_float(lo)
    out = stats[0] * (1.0 - frac) + stats[1] * frac
    return jnp.where(n_valid > 0, out, jnp.nan)


@functools.partial(jax.jit, static_argnames=("q",))
def nonzero_quantile_per_column_bisect(x: jax.Array, q: float) -> jax.Array:
    """`nonzero_quantile_per_column` semantics (pandas `.replace(0, nan)
    .quantile(q)`, linear interpolation) via counting bisection instead of a
    sort. x: (N, C) -> (C,); NaN for all-zero columns."""
    x = x.astype(jnp.float32)
    # NaN entries are ignored, matching the pandas/nanquantile sort path
    # (NaN != 0 is True, so a bare `x != 0` would count them as valid and
    # the bit-key ordering would place them past +inf)
    valid = (x != 0) & ~jnp.isnan(x)
    n_valid = jnp.sum(valid, axis=0)                       # (C,)
    pos = q * jnp.maximum(n_valid - 1, 0).astype(jnp.float32)
    i0 = jnp.floor(pos).astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, jnp.maximum(n_valid - 1, 0)).astype(jnp.int32)
    frac = pos - i0.astype(jnp.float32)
    stats = masked_order_stats(x, valid, jnp.stack([i0, i1], axis=1))
    out = stats[:, 0] * (1.0 - frac) + stats[:, 1] * frac
    return jnp.where(n_valid > 0, out, jnp.nan)


@functools.partial(jax.jit, static_argnames=("q",))
def masked_quantile_per_column_bisect(x: jax.Array, valid: jax.Array,
                                      q: float) -> jax.Array:
    """`masked_quantile_per_column` semantics via counting bisection."""
    x = x.astype(jnp.float32)
    ok = valid[:, None] & (x != 0) & ~jnp.isnan(x)
    n_valid = jnp.sum(ok, axis=0)
    pos = q * jnp.maximum(n_valid - 1, 0).astype(jnp.float32)
    i0 = jnp.floor(pos).astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, jnp.maximum(n_valid - 1, 0)).astype(jnp.int32)
    frac = pos - i0.astype(jnp.float32)
    stats = masked_order_stats(x, ok, jnp.stack([i0, i1], axis=1))
    out = stats[:, 0] * (1.0 - frac) + stats[:, 1] * frac
    return jnp.where(n_valid > 0, out, jnp.nan)
