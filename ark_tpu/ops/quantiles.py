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


@functools.partial(jax.jit, static_argnames=("q",))
def quantile(x: jax.Array, q: float) -> jax.Array:
    """np.quantile(x, q) with linear interpolation, on device."""
    return jnp.quantile(x.reshape(-1).astype(jnp.float32), q)


@functools.partial(jax.jit, static_argnames=("q",))
def nonzero_quantile(x: jax.Array, q: float) -> jax.Array:
    """Quantile of the positive entries of x (reference pattern
    `img[img > 0]` then np.quantile). NaN if no positive entries."""
    x = x.reshape(-1).astype(jnp.float32)
    masked = jnp.where(x > 0, x, jnp.nan)
    return jnp.nanquantile(masked, q)


@functools.partial(jax.jit, static_argnames=("q",))
def nonzero_quantile_per_column(x: jax.Array, q: float) -> jax.Array:
    """Per-column q-quantile ignoring zeros (pandas
    `.replace(0, np.nan).quantile(q)` semantics). x: (N, C) -> (C,)."""
    x = x.astype(jnp.float32)
    masked = jnp.where(x == 0, jnp.nan, x)
    return jnp.nanquantile(masked, q, axis=0)


@functools.partial(jax.jit, static_argnames=("q",))
def masked_quantile_per_column(x: jax.Array, valid: jax.Array, q: float) -> jax.Array:
    """Per-column quantile over rows where `valid` is True, ignoring zeros.

    Used to compute per-FOV post-rownorm 99.9% values without compacting the
    dense (H*W, C) device matrix (invalid rows stay padded).
    """
    x = x.astype(jnp.float32)
    bad = (~valid[:, None]) | (x == 0)
    return jnp.nanquantile(jnp.where(bad, jnp.nan, x), q, axis=0)
