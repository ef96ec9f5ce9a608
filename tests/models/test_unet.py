import numpy as np
import jax
import jax.numpy as jnp

from ark_tpu.models import unet


def test_init_mesmer_heads_and_params(tmp_path):
    model, variables = unet.init_mesmer(seed=0, dtype=jnp.float32)
    x = jnp.zeros((1, 64, 64, 2), jnp.float32)
    out = model.apply(variables, x, train=False)
    assert set(out) == {"whole_cell_inner_distance", "whole_cell_pixelwise",
                        "nuclear_inner_distance", "nuclear_pixelwise"}
    assert out["whole_cell_inner_distance"].shape == (1, 64, 64, 1)
    assert out["whole_cell_pixelwise"].shape == (1, 64, 64, 3)
    # pixelwise heads are softmax distributions
    np.testing.assert_allclose(
        np.asarray(out["whole_cell_pixelwise"]).sum(-1), 1.0, atol=1e-4)
    n_params = sum(p.size for p in jax.tree_util.tree_leaves(
        variables["params"]))
    assert n_params > 20_000_000   # full ResNet50+FPN PanopticNet


def test_params_npz_roundtrip(tmp_path):
    model, variables = unet.init_mesmer(seed=0, dtype=jnp.float32)
    path = str(tmp_path / "w.npz")
    unet.save_params_npz(path, variables)
    loaded = unet.load_params_npz(path)
    x = jnp.ones((1, 64, 64, 2), jnp.float32) * 0.5
    a = model.apply(variables, x, train=False)["whole_cell_inner_distance"]
    b = model.apply(loaded, x, train=False)["whole_cell_inner_distance"]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
