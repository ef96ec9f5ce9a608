"""FOV-sharded device watershed: the flood is per-image elementwise +
per-image segment tables, so sharding the batch axis over the mesh needs
no collectives — each shard runs its own level scan with its own
early-outs (per-shard convergence is strictly better than the joint flag:
a converged shard stops paying rounds). This certifies the new kernel
composes with the `parallel/` FOV-sharding story (SURVEY.md §2.5 (a))."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh, PartitionSpec as P  # noqa: E402
from jax.experimental.shard_map import shard_map  # noqa: E402

from ark_tpu.ops import watershed as W  # noqa: E402


@pytest.fixture()
def rng():
    return np.random.default_rng(12345)


def test_flood_shards_over_fov_axis(rng):
    import scipy.ndimage as ndi

    devices = np.array(jax.devices()[:8])
    if devices.size < 8:
        pytest.skip("needs 8 virtual devices")
    b, hw = 8, 32
    elev = np.stack([ndi.gaussian_filter(rng.random((hw, hw)), 2)
                     for _ in range(b)]).astype(np.float32)
    mask = elev < np.quantile(elev, 0.75, axis=(1, 2), keepdims=True)
    markers = np.zeros_like(elev, np.int32)
    for i in range(b):
        ys, xs = np.where(mask[i])
        for j, k in enumerate(rng.choice(ys.size, 4, replace=False)):
            markers[i, ys[k], xs[k]] = j + 1

    mesh = Mesh(devices, ("fov",))

    def per_shard(e, m, f):
        lab, done = W._quantize_and_flood(e, m, f, 64, 8)
        return lab, done[None].astype(jnp.int32)

    sharded = shard_map(
        per_shard, mesh=mesh,
        in_specs=(P("fov"), P("fov"), P("fov")),
        out_specs=(P("fov"), P("fov")))
    lab_s, dones = sharded(jnp.asarray(elev), jnp.asarray(markers),
                           jnp.asarray(mask))
    assert bool(jnp.all(dones > 0))

    lab_u, done_u = W._quantize_and_flood(
        jnp.asarray(elev), jnp.asarray(markers), jnp.asarray(mask), 64, 8)
    assert bool(done_u)
    # per-image quantization + per-image flood: sharding must be exact
    np.testing.assert_array_equal(np.asarray(lab_s), np.asarray(lab_u))
