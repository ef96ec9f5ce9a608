"""Label-image relabeling as a LUT gather.

Replaces the reference's `@nb.njit(parallel=True)` numba kernel
(`data_utils.py:308-335`: per-pixel typed-dict lookups) with a dense
lookup-table gather — build a (max_label+1,) LUT once, then `take` over the
flattened image. One fused XLA gather on device; the numpy path is equally
vectorized for host callers."""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


def build_lut(mapping: Dict[int, float], max_label: int, unassigned_id,
              dtype=np.float64) -> np.ndarray:
    """Dense (max_label+1,) lookup table from a {label: value} dict; labels
    absent from the mapping get `unassigned_id`."""
    lut = np.full(max_label + 1, unassigned_id, dtype=dtype)
    if mapping:
        keys = np.fromiter(mapping.keys(), dtype=np.int64, count=len(mapping))
        vals = np.fromiter(mapping.values(), dtype=dtype, count=len(mapping))
        in_range = (keys >= 0) & (keys <= max_label)
        lut[keys[in_range]] = vals[in_range]
    return lut


@jax.jit
def _gather_lut(labeled_image: jax.Array, lut: jax.Array) -> jax.Array:
    idx = jnp.clip(labeled_image.astype(jnp.int32), 0, lut.shape[0] - 1)
    return jnp.take(lut, idx)


def relabel_segmentation(mapping: Dict, unassigned_id,
                         labeled_image: np.ndarray,
                         _dtype=np.float64, use_device: bool = None) -> np.ndarray:
    """Map every pixel of a label image through `mapping` (missing labels →
    `unassigned_id`). API-parity with reference `relabel_segmentation`."""
    labeled_image = np.asarray(labeled_image)
    max_label = int(labeled_image.max()) if labeled_image.size else 0
    lut = build_lut(mapping, max_label, unassigned_id, dtype=_dtype)
    if use_device is None:
        use_device = labeled_image.size >= 1 << 20
    if use_device:
        # jax runs without x64: a float64 LUT would silently downcast to
        # f32 on device, making output dtype/values depend on IMAGE SIZE
        # (the use_device heuristic). Keep f64 LUTs on the host gather.
        if lut.dtype == np.float64 or lut.dtype == np.int64:
            return lut[labeled_image]
        return np.asarray(_gather_lut(jnp.asarray(labeled_image),
                                      jnp.asarray(lut)))
    return lut[labeled_image]
