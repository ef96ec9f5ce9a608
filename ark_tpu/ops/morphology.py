"""Small morphology ops: boundaries, erosion, small-object removal.

Device (XLA) implementations of the skimage morphology bits the reference
uses: `find_boundaries` (`segmentation_utils.py:218`, `data_utils.py:70-84`),
binary erosion, and `remove_small_objects` (`segmentation_utils.py:88`)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.partial(jax.jit, static_argnames=("mode", "connectivity"))
def find_boundaries(labels: jax.Array, connectivity: int = 1,
                    mode: str = "inner") -> jax.Array:
    """Boundary-pixel mask of a label image (skimage semantics).

    mode='inner': pixels of an object adjacent to a different label;
    mode='outer': background/object pixels adjacent to a different value;
    mode='thick': union of both sides.
    """
    lab = labels.astype(jnp.int32)
    h, w = lab.shape
    pad = jnp.pad(lab, 1, mode="edge")
    shifts = [pad[:-2, 1:-1], pad[2:, 1:-1], pad[1:-1, :-2], pad[1:-1, 2:]]
    if connectivity == 2:
        shifts += [pad[:-2, :-2], pad[:-2, 2:], pad[2:, :-2], pad[2:, 2:]]
    differs = jnp.zeros((h, w), bool)
    for s in shifts:
        differs |= s != lab
    if mode == "inner":
        return differs & (lab > 0)
    if mode == "outer":
        # skimage outer: background pixels at object boundaries, PLUS — for
        # touching objects, where no background separates them — the
        # higher-label side of the interface ('when two objects touch,
        # their boundary is also marked'). skimage gets the latter by
        # setting background to int-max and grey-eroding: an object pixel
        # whose smallest (inverted) neighbor differs from itself borders a
        # smaller label.
        inv = jnp.where(lab == 0, jnp.iinfo(jnp.int32).max, lab)
        pad_inv = jnp.pad(inv, 1, mode="edge")
        eroded = inv
        offs = [(0, 1), (2, 1), (1, 0), (1, 2)]
        if connectivity == 2:
            offs += [(0, 0), (0, 2), (2, 0), (2, 2)]
        for dy, dx in offs:
            eroded = jnp.minimum(eroded, pad_inv[dy:dy + h, dx:dx + w])
        return differs & ((lab == 0) | (eroded != inv))
    return differs  # thick


@functools.partial(jax.jit, static_argnames=("iterations",))
def binary_erosion(mask: jax.Array, iterations: int = 1) -> jax.Array:
    """4-connected binary erosion (cross structuring element)."""
    m = mask.astype(bool)
    for _ in range(iterations):
        pad = jnp.pad(m, 1, constant_values=False)
        m = (pad[1:-1, 1:-1] & pad[:-2, 1:-1] & pad[2:, 1:-1]
             & pad[1:-1, :-2] & pad[1:-1, 2:])
    return m


def remove_small_objects(labels: np.ndarray, min_size: int = 5) -> np.ndarray:
    """Zero out labels with fewer than min_size pixels (host, bincount)."""
    labels = np.asarray(labels)
    counts = np.bincount(labels.reshape(-1))
    small = np.flatnonzero(counts < min_size)
    out = labels.copy()
    out[np.isin(out, small)] = 0
    return out


def area_filter_np(labels: np.ndarray, min_area: int = 0,
                   max_area: int = 2 ** 31 - 1) -> np.ndarray:
    """Zero out labels whose pixel count falls outside [min_area,
    max_area]; surviving labels keep their ids (host bincount LUT — the
    numpy twin of `ops.cc.area_filter` for host-resident label images,
    where a device round trip costs more than the filter)."""
    labels = np.asarray(labels)
    counts = np.bincount(labels.reshape(-1))
    ids = np.arange(counts.size)
    keep = (counts >= min_area) & (counts <= max_area) & (ids > 0)
    lut = np.where(keep, ids, 0)
    return lut[labels]


def remove_small_holes(mask: np.ndarray, area_threshold: int = 64) -> np.ndarray:
    """Fill background components of area <= area_threshold (numpy in/out,
    scipy labeling). skimage semantics: the op is remove_small_objects on
    the COMPLEMENT — border-touching holes fill like any other, and the
    threshold is inclusive (a previous border exclusion + strict < made
    ez_seg masks at FOV edges differ in area from the reference). The
    test oracle is an independent in-test scipy labeling
    (tests/ops/test_cc.py), not this function.

    Host scipy, not the device CC kernel: a single host-resident mask
    round-tripped through `ops.cc` measured 0.27 s at 1024² on the attach
    vs 5 ms for scipy (PERF.md r3 corrections) — the device kernels are
    for batched/fused/device-resident contexts."""
    import scipy.ndimage as ndi

    fg = np.asarray(mask).astype(bool)
    bg_labels, _ = ndi.label(~fg)
    return fg | (area_filter_np(bg_labels,
                                max_area=area_threshold) > 0)


def erode_mask(mask: np.ndarray, connectivity: int = 2) -> np.ndarray:
    """Erode each labeled object by its boundary (reference
    `data_utils.py:70-84`: label image minus its inner boundaries)."""
    import jax.numpy as jnp
    boundaries = np.asarray(find_boundaries(jnp.asarray(mask),
                                            connectivity=connectivity,
                                            mode="inner"))
    out = np.asarray(mask).copy()
    out[boundaries] = 0
    return out
