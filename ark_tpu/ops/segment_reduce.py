"""Segment reductions over label images: the TPU replacement for regionprops.

The reference's cell-table engine loops over cells in Python, gathering each
cell's pixel coordinates and calling per-cell reducers
(`marker_quantification.py:316-348` hot loop; skimage `regionprops_table` for
base morphology). Here every per-cell quantity is a *segment reduction* over
the dense (H·W)-pixel arrays — `jax.ops.segment_sum` scatter-adds keyed by the
label image — so one FOV's full feature set is a handful of fused device
passes regardless of cell count:

  * cell sizes                      -> segment_sum of 1
  * channel sums / positive pixels  -> segment_sum of (values | values>t)
  * centroids, second moments       -> segment_sum of coordinate monomials
  * ellipse features                -> closed-form from central moments
  * perimeter                       -> 4-direction Cauchy–Crofton boundary
                                       crossing counts (exact for disks, ~5%
                                       low for squares; the reference's
                                       chain-code measure differs by a few %)
  * center-weighted sums            -> two passes: centroid + inf-norm weights
  * euler number                    -> Gray bit-quad counts per label

All functions take `num_segments` = max label + 1 (static for jit); label 0 is
background and returned at index 0 so callers slice [1:].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_SQRT2 = 1.4142135623730951


def _flat(labels):
    return labels.reshape(-1).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("num_segments",))
def cell_sizes(labels: jax.Array, num_segments: int) -> jax.Array:
    """Pixel count per label; (num_segments,)."""
    return jax.ops.segment_sum(jnp.ones(labels.size, jnp.float32),
                               _flat(labels), num_segments=num_segments)


@functools.partial(jax.jit, static_argnames=("num_segments",))
def channel_sums(images: jax.Array, labels: jax.Array,
                 num_segments: int) -> jax.Array:
    """Total intensity per (label, channel); (num_segments, C)."""
    h, w, c = images.shape
    return jax.ops.segment_sum(images.reshape(-1, c).astype(jnp.float32),
                               _flat(labels), num_segments=num_segments)


@functools.partial(jax.jit, static_argnames=("num_segments",))
def positive_pixel_counts(images: jax.Array, labels: jax.Array,
                          num_segments: int, threshold: float = 0.0) -> jax.Array:
    """Count of pixels with value > threshold per (label, channel)."""
    h, w, c = images.shape
    pos = (images.reshape(-1, c) > threshold).astype(jnp.float32)
    return jax.ops.segment_sum(pos, _flat(labels), num_segments=num_segments)


@functools.partial(jax.jit, static_argnames=("num_segments",))
def centroids(labels: jax.Array, num_segments: int) -> jax.Array:
    """(num_segments, 2) centroid (row, col) per label; NaN for empty."""
    h, w = labels.shape
    rr = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0).reshape(-1)
    cc = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1).reshape(-1)
    seg = _flat(labels)
    # one fused (N, 3) scatter (see moment_features: scatter cost is per-pass)
    sums = jax.ops.segment_sum(
        jnp.stack([jnp.ones_like(rr), rr, cc], axis=1), seg,
        num_segments=num_segments)
    return sums[:, 1:] / sums[:, :1]


@functools.partial(jax.jit, static_argnames=("num_segments",))
def center_weighted_sums(images: jax.Array, labels: jax.Array,
                         num_segments: int) -> jax.Array:
    """Center-weighted intensity per (label, channel).

    Weight per pixel = 1 − d∞(pixel, cell centroid) / (max-in-cell d∞ + 1) —
    the reference's `center_weighting_extraction`
    (`signal_extraction.py:29-56`) as two device passes: centroid + max-dist
    segment reductions, then a weighted segment_sum.
    """
    h, w, c = images.shape
    seg = _flat(labels)
    cent = centroids(labels, num_segments)                        # (S, 2)
    rr = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0).reshape(-1)
    cc = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1).reshape(-1)
    own = jnp.take(cent, seg, axis=0)                             # (N, 2)
    dist = jnp.maximum(jnp.abs(rr - own[:, 0]), jnp.abs(cc - own[:, 1]))
    dmax = jax.ops.segment_max(dist, seg, num_segments=num_segments)
    weights = 1.0 - dist / (jnp.take(dmax, seg) + 1.0)
    vals = images.reshape(-1, c).astype(jnp.float32) * weights[:, None]
    return jax.ops.segment_sum(vals, seg, num_segments=num_segments)


def _perimeter_contributions(labels: jax.Array) -> jax.Array:
    """Per-pixel Cauchy–Crofton boundary contribution, (H, W) f32.

    Each label-boundary crossing along rows/columns/diagonals is credited to
    both endpoint labels; attributing every pixel's 8 neighbor mismatches to
    the pixel's OWN label is the same total per label, but turns the
    reduction into ONE scatter keyed by the label image instead of 8 scatters
    keyed by shifted copies (a ~6x win on TPU, where scatter cost is
    per-pass, not per-element). Image border counts as background.
    """
    labels = labels.astype(jnp.int32)
    h, w = labels.shape
    lab = jnp.pad(labels, 1, constant_values=0)

    def neq(dy, dx):
        return (labels != lab[1 + dy:h + 1 + dy,
                              1 + dx:w + 1 + dx]).astype(jnp.float32)

    straight = neq(0, 1) + neq(0, -1) + neq(1, 0) + neq(-1, 0)
    diag = neq(1, 1) + neq(1, -1) + neq(-1, 1) + neq(-1, -1)
    return (jnp.pi / 8.0) * (straight + diag / _SQRT2)


@functools.partial(jax.jit, static_argnames=("num_segments",))
def crofton_perimeter(labels: jax.Array, num_segments: int) -> jax.Array:
    """Per-label perimeter by the 4-direction Cauchy–Crofton estimator:
    P = (π/8)(n_h + n_v + (n_d1+n_d2)/√2) over boundary crossings, as a
    single scatter of per-pixel contributions."""
    per = jax.ops.segment_sum(_perimeter_contributions(labels).reshape(-1),
                              _flat(labels), num_segments=num_segments)
    return per.at[0].set(0.0)


@functools.partial(jax.jit, static_argnames=("num_segments",))
def euler_numbers(labels: jax.Array, num_segments: int) -> jax.Array:
    """Per-label Euler number (objects − holes), 8-connectivity, via Gray
    bit-quad counts: E = (Q1 − Q3 − 2·Qd) / 4 computed per label."""
    h, w = labels.shape
    lab = jnp.pad(labels.astype(jnp.int32), 1, constant_values=0)
    a, b = lab[:-1, :-1], lab[:-1, 1:]
    c, d = lab[1:, :-1], lab[1:, 1:]
    quads = [a, b, c, d]
    # route every quad slot's contribution through ONE per-pixel value image
    # (indexed by the pixel's own label) so the reduction is a single scatter
    # instead of 4 scatters keyed by shifted label copies.
    val = jnp.zeros((h, w), jnp.float32)
    for slot in range(4):
        cand = quads[slot]
        # count candidate once per quad: only from its first occurrence slot
        first = jnp.ones_like(cand, dtype=bool)
        for prev in range(slot):
            first &= quads[prev] != cand
        i0, i1 = (a == cand), (b == cand)
        i2, i3 = (c == cand), (d == cand)
        n_in = (i0.astype(jnp.int32) + i1.astype(jnp.int32)
                + i2.astype(jnp.int32) + i3.astype(jnp.int32))
        diag = (i0 & i3 & ~i1 & ~i2) | (i1 & i2 & ~i0 & ~i3)
        q1 = (n_in == 1).astype(jnp.float32)
        q3 = (n_in == 3).astype(jnp.float32)
        qd = diag.astype(jnp.float32)
        contrib = jnp.where(first, (q1 - q3 - 2.0 * qd) / 4.0, 0.0)
        # pixel (y, x) — padded coords (y+1, x+1) — is slot a of quad
        # (y+1, x+1), b of (y+1, x), c of (y, x+1), d of (y, x)
        oy, ox = {0: (1, 1), 1: (1, 0), 2: (0, 1), 3: (0, 0)}[slot]
        padc = jnp.pad(contrib, ((0, 1), (0, 1)))
        val = val + jax.lax.dynamic_slice(padc, (oy, ox), (h, w))
    out = jax.ops.segment_sum(val.reshape(-1), _flat(labels),
                              num_segments=num_segments)
    return out.at[0].set(0.0)


def _features_from_central(m00, cy, cx, mu20, mu02, mu11, perimeter) -> dict:
    """Morphology dict from per-label CENTRAL second moments (already
    divided by area)."""
    common = jnp.sqrt(jnp.maximum(4.0 * mu11 ** 2 + (mu20 - mu02) ** 2, 0.0))
    l1 = (mu20 + mu02 + common) / 2.0
    l2 = (mu20 + mu02 - common) / 2.0
    l2 = jnp.maximum(l2, 0.0)
    major = 4.0 * jnp.sqrt(jnp.maximum(l1, 0.0))
    minor = 4.0 * jnp.sqrt(l2)
    # skimage returns 0 for the degenerate l1 == 0 case (single pixel) —
    # the limit of the ratio would otherwise misreport it as maximally
    # eccentric
    ecc = jnp.where(
        l1 > 0.0,
        jnp.sqrt(jnp.maximum(1.0 - l2 / jnp.maximum(l1, 1e-12), 0.0)),
        0.0)
    eq_diam = jnp.sqrt(4.0 * m00 / jnp.pi)
    # skimage convention: angle between the row (0th) axis and the major
    # axis, range (-pi/2, pi/2] — equals 0.5*atan2(2*mu11, mu20-mu02) in
    # (row, col) central moments (verified against planted-angle ellipses)
    orientation = 0.5 * jnp.arctan2(2.0 * mu11, mu20 - mu02)

    return {
        "area": m00,
        "centroid-0": cy,
        "centroid-1": cx,
        "major_axis_length": major,
        "minor_axis_length": minor,
        "eccentricity": ecc,
        "equivalent_diameter": eq_diam,
        "orientation": orientation,
        "perimeter": perimeter,
    }


def _pixel_coords(labels: jax.Array):
    h, w = labels.shape
    rr = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0).reshape(-1)
    cc = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1).reshape(-1)
    return rr, cc


def _central_moment_sums(labels: jax.Array, num_segments: int,
                         extra_cols: jax.Array = None):
    """Two-pass central moments: pass 1 sums [1, r, c] for exact
    centroids; pass 2 sums the CENTERED monomials (plus perimeter and any
    `extra_cols`). Raw second moments about the origin cancel
    catastrophically in f32 — mu20 = m20/m00 − cy² subtracts two ~cy²-sized
    terms, so a cell's measured shape would depend on where it sits in the
    FOV (37% eccentricity error at the far corner of 4096²).

    Returns (m00, cy, cx, mu20, mu02, mu11, perimeter, extra_sums).
    """
    flat = _flat(labels)
    rr, cc = _pixel_coords(labels)
    first = jax.ops.segment_sum(
        jnp.stack([jnp.ones_like(rr), rr, cc], axis=1), flat,
        num_segments=num_segments)
    m00 = first[:, 0]
    safe = jnp.maximum(m00, 1.0)
    cy, cx = first[:, 1] / safe, first[:, 2] / safe
    # one (N, 2) gather for both centroid components
    cent = jnp.take(first[:, 1:3] / safe[:, None], flat, axis=0)
    dy = rr - cent[:, 0]
    dx = cc - cent[:, 1]
    cols = [dy * dy, dx * dx, dy * dx,
            _perimeter_contributions(labels).reshape(-1)]
    second_in = jnp.stack(cols, axis=1)
    if extra_cols is not None:
        second_in = jnp.concatenate([second_in, extra_cols], axis=1)
    second = jax.ops.segment_sum(second_in, flat,
                                 num_segments=num_segments)
    mu20 = second[:, 0] / safe
    mu02 = second[:, 1] / safe
    mu11 = second[:, 2] / safe
    perimeter = second[:, 3].at[0].set(0.0)
    extra = second[:, 4:] if extra_cols is not None else None
    return m00, cy, cx, mu20, mu02, mu11, perimeter, extra


@functools.partial(jax.jit, static_argnames=("num_segments",))
def moment_features(labels: jax.Array, num_segments: int) -> dict:
    """Moments-based morphology per label (skimage regionprops semantics).

    Returns dict of (num_segments,) arrays: area, centroid-0, centroid-1,
    major_axis_length, minor_axis_length, eccentricity, equivalent_diameter,
    orientation, perimeter.

    TWO fused scatters (centroids, then centered monomials + perimeter):
    scatter cost on TPU is per-pass, not per-element — the old design ran
    7 separate segment_sums over the same index array and measured ~10x
    slower (99 -> 8.7 ms for a 1024² FOV with 5k cells on v5e); the second
    pass buys origin-independent f32 central moments.
    """
    m00, cy, cx, mu20, mu02, mu11, perim, _ = _central_moment_sums(
        labels, num_segments)
    return _features_from_central(m00, cy, cx, mu20, mu02, mu11, perim)


@functools.partial(jax.jit, static_argnames=("num_segments",))
def moment_and_channel_features(images: jax.Array, labels: jax.Array,
                                num_segments: int):
    """(morphology dict, (S, C) channel sums) in TWO fused scatters — the
    default marker-quantification path (`total_intensity` extraction +
    regionprops base props). The channel sums ride the second (centered-
    moment) scatter, so the extra pass over the index array buys exact
    central moments (see _central_moment_sums) at ~1.5x one pass, not 2x
    the old fused single pass."""
    h, w, c = images.shape
    m00, cy, cx, mu20, mu02, mu11, perim, chan = _central_moment_sums(
        labels, num_segments,
        extra_cols=images.reshape(-1, c).astype(jnp.float32))
    return _features_from_central(m00, cy, cx, mu20, mu02, mu11,
                                  perim), chan
