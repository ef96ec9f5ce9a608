"""FOV-sharded cohort execution: run jitted per-FOV pipelines over a mesh.

This is the TPU-native replacement for the reference's multiprocessing
spawn-Pool FOV fan-out (`pixie_preprocessing.py:391-439` etc.): FOV batches
are stacked into (B, H, W, C) blocks, the leading axis is sharded over the
'fov' mesh axis, and one jitted program runs the whole batch; small cohort
statistics reduce over ICI with psum."""

from __future__ import annotations

import functools
from typing import Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np
from ark_tpu.ops import image_filters, som as som_ops
from ark_tpu.parallel import mesh as mesh_utils


def map_over_fovs(fn: Callable, fov_batch: np.ndarray, mesh,
                  axis_name: str = mesh_utils.FOV_AXIS):
    """Apply a jitted per-FOV function over a (B, ...) batch sharded across
    the mesh; B is padded to a multiple of the mesh size (padding dropped)."""
    n = fov_batch.shape[0]
    n_dev = mesh.devices.size
    n_pad = mesh_utils.pad_to_multiple(n, n_dev)
    if n_pad != n:
        pad = np.zeros((n_pad - n,) + fov_batch.shape[1:], fov_batch.dtype)
        fov_batch = np.concatenate([fov_batch, pad])
    sharding = mesh_utils.fov_sharding(mesh, axis_name)
    batch = jax.device_put(jnp.asarray(fov_batch), sharding)
    out = jax.jit(jax.vmap(fn))(batch)
    return jax.tree.map(lambda x: np.asarray(x)[:n], out)


@functools.partial(jax.jit, static_argnames=("blur_factor",),
                   donate_argnums=())
def _pixel_stage(imgs, channel_norms, pixel_thresh, som_weights_packed,
                 wbig, w2_p, blur_factor: int = 2):
    """One fused device program for a FOV batch of the Pixie pixel pipeline:
    channel-norm divide → Gaussian blur → threshold mask → rownorm →
    packed-BMU SOM assignment. imgs: (B, H, W, C)."""
    b, h, w, c = imgs.shape
    x = imgs.astype(jnp.float32) / channel_norms
    x = image_filters.gaussian_blur_batch(x, sigma=blur_factor)
    mat = x.reshape(b, h * w, c)
    rowsums = jnp.sum(mat, axis=2)
    valid = (rowsums > pixel_thresh) & jnp.any(mat != 0, axis=2)
    norm = mat / jnp.where(rowsums == 0, 1.0, rowsums)[..., None]
    norm = norm / som_weights_packed  # post-rownorm 99.9% channel norms
    # BMU assign whole batch (XLA path; pallas variant used at FOV scale)
    idx, _ = som_ops.bmu_xla(
        wbig, norm.reshape(b * h * w, c))
    clusters = (idx + 1).reshape(b, h * w)
    return norm, valid, jnp.where(valid, clusters, 0)


def run_pixel_cohort(fov_batches, channel_norms, pixel_thresh,
                     post_norms, som_weights, mesh=None,
                     blur_factor: int = 2) -> Dict[str, np.ndarray]:
    """Run the full pixel pipeline (preprocess + SOM assignment) over a
    cohort batch, FOV-sharded across the mesh.

    Args:
        fov_batches: (B, H, W, C) image block.
        channel_norms: (C,) pre-rownorm channel percentile norms.
        pixel_thresh: scalar total-signal threshold.
        post_norms: (C,) post-rownorm 99.9% channel norms.
        som_weights: (K, C) trained SOM weights.
        mesh: device mesh (default: all local devices).

    Returns dict with 'pixel_mat' (B, H·W, C), 'valid' (B, H·W) bool,
    'som_clusters' (B, H·W) int32 (0 = filtered out).
    """
    mesh = mesh or mesh_utils.get_mesh()

    def per_fov(img):
        x = img.astype(jnp.float32) / jnp.asarray(channel_norms, jnp.float32)
        x = image_filters.gaussian_blur(x, sigma=blur_factor)
        h, w, c = x.shape
        mat = x.reshape(h * w, c)
        rowsums = jnp.sum(mat, axis=1)
        valid = (rowsums > pixel_thresh) & jnp.any(mat != 0, axis=1)
        norm = mat / jnp.where(rowsums == 0, 1.0, rowsums)[:, None]
        norm = norm / jnp.asarray(post_norms, jnp.float32)
        idx, _ = som_ops.bmu_xla(jnp.asarray(som_weights, jnp.float32), norm)
        clusters = jnp.where(valid, idx + 1, 0).astype(jnp.int32)
        return {"pixel_mat": norm, "valid": valid, "som_clusters": clusters}

    return map_over_fovs(per_fov, np.asarray(fov_batches), mesh)


def cohort_channel_percentiles(fov_batches: np.ndarray, q: float,
                               mesh=None) -> np.ndarray:
    """Mean over FOVs of per-FOV nonzero channel percentiles, computed
    sharded (the cohort normalization statistic of
    `pixel_cluster_utils.py:16-60`)."""
    mesh = mesh or mesh_utils.get_mesh()

    def per_fov(img):
        c = img.shape[-1]
        flat = img.reshape(-1, c).astype(jnp.float32)
        masked = jnp.where(flat > 0, flat, jnp.nan)
        return jnp.nanquantile(masked, q, axis=0)

    per_fov_vals = map_over_fovs(per_fov, np.asarray(fov_batches), mesh)
    return np.nanmean(per_fov_vals, axis=0)
