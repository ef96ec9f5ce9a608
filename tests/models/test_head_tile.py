"""The tiled semantic-head evaluation (benchmarks/head_tile_ab.py) must be
numerically equal to the standard head — it is a perf experiment for the
1024² working-set frontier (PERF.md), and an inexact tiling would invalidate
any A/B it wins. Exactness hinges on per-tile interpolation matrices
evaluating the GLOBAL half-pixel resize coordinates and on VALID convs over
haloed slices reproducing SAME's zero borders."""

import numpy as np
import pytest


@pytest.mark.parametrize("size,tiles", [(64, 2), (128, 4)])
def test_tiled_head_matches_standard_forward(size, tiles):
    import jax.numpy as jnp

    from ark_tpu.models import unet
    from benchmarks.head_tile_ab import _forward_tiled

    model, variables = unet.init_mesmer_mini(
        input_shape=(1, size, size, 2), dtype=jnp.float32)
    x = jnp.asarray(np.random.default_rng(3).random(
        (2, size, size, 2)), jnp.float32)
    want = model.apply(variables, x, train=False)
    got = _forward_tiled(model, variables, x, tiles)
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_allclose(np.asarray(got[k], np.float32),
                                   np.asarray(want[k], np.float32),
                                   atol=1e-5)


def test_return_p3_shape():
    import jax.numpy as jnp

    from ark_tpu.models import unet

    model, variables = unet.init_mesmer_mini(input_shape=(1, 64, 64, 2),
                                             dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 2), jnp.float32)
    p3 = model.apply(variables, x, train=False, return_p3=True)
    assert p3.shape == (1, 8, 8, 64)  # stride 8, mini fpn_channels=64
