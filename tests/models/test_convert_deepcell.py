"""Converter mechanics test: a synthetic Keras-layout HDF5 built by the
inverse of the documented layer-name map must convert onto the flax tree
exactly (kernels copied, BN folded), and failures must be loud.

The real deepcell-tf checkpoint cannot be fetched in this build; this
validates the mapping code against the documented contract
(`ark_tpu/models/convert_deepcell.py` module docstring).
"""

import numpy as np
import pytest

from ark_tpu.models import convert_deepcell as cd
from ark_tpu.models import unet

MINI_STAGES = (1, 1, 1, 1)


def _mini_variables():
    _, variables = unet.init_mesmer_mini(seed=0, input_shape=(1, 32, 32, 2))
    import jax
    return jax.device_get(jax.tree.map(np.asarray, variables))


def _keras_layers_from_flax(variables, rng):
    """Inverse of the converter's name map: synthesize keras layer dicts
    with fresh random values shaped like the flax tree."""
    params, batch_stats = variables["params"], variables["batch_stats"]
    layers = {}

    def conv_bn(scope, conv, bn, kconv, kbn):
        kern = params
        for p in scope:
            kern = kern[p]
        shape = np.asarray(kern[conv]["kernel"]).shape
        layers[kconv] = {
            "kernel": rng.normal(size=shape).astype(np.float32),
            "bias": rng.normal(size=shape[-1]).astype(np.float32),
        }
        layers[kbn] = {
            "gamma": rng.normal(size=shape[-1]).astype(np.float32),
            "beta": rng.normal(size=shape[-1]).astype(np.float32),
            "moving_mean": rng.normal(size=shape[-1]).astype(np.float32),
            "moving_variance":
                np.abs(rng.normal(size=shape[-1])).astype(np.float32) + 0.5,
        }

    def conv(scope, name, kname):
        tree = params
        for p in scope:
            tree = tree[p]
        shape = np.asarray(tree[name]["kernel"]).shape
        layers[kname] = {
            "kernel": rng.normal(size=shape).astype(np.float32),
            "bias": rng.normal(size=shape[-1]).astype(np.float32),
        }

    bb = ["ResNet50Backbone_0"]
    conv_bn(bb, "Conv_0", "BatchNorm_0", "conv1_conv", "conv1_bn")
    for prefix, block in cd._backbone_block_names(MINI_STAGES):
        scope = bb + [block]
        for k in (1, 2, 3):
            conv_bn(scope, f"Conv_{k-1}", f"BatchNorm_{k-1}",
                    f"{prefix}_{k}_conv", f"{prefix}_{k}_bn")
        if "Conv_3" in _get(params, scope):
            conv_bn(scope, "Conv_3", "BatchNorm_3",
                    f"{prefix}_0_conv", f"{prefix}_0_bn")
    for li, level in enumerate(range(2, 6)):
        conv(["FPN_0"], f"Conv_{li}", f"C{level}_reduced")
        conv(["FPN_0"], f"Conv_{li + 4}", f"P{level}")
    for n, head in enumerate(cd.SEMANTIC_HEADS):
        for ci in range(len(params[head])):
            conv([head], f"Conv_{ci}", f"semantic_{n}_conv{ci}")
    return layers


def _get(tree, path):
    for p in path:
        tree = tree[p]
    return tree


def test_convert_round_trip_through_h5(rng, tmp_path):
    import h5py

    variables = _mini_variables()
    layers = _keras_layers_from_flax(variables, rng)

    path = tmp_path / "fake_mesmer.h5"
    with h5py.File(path, "w") as f:
        g = f.create_group("model_weights")
        for lname, weights in layers.items():
            lg = g.create_group(lname).create_group(lname)
            for wname, arr in weights.items():
                lg.create_dataset(f"{wname}:0", data=arr)

    read_back = cd.read_keras_h5(str(path))
    assert set(read_back) == set(layers)
    converted = cd.convert(read_back, variables, stages=MINI_STAGES)

    # spot-check kernels across every region of the map
    np.testing.assert_array_equal(
        converted["params"]["ResNet50Backbone_0"]["Conv_0"]["kernel"],
        layers["conv1_conv"]["kernel"])
    np.testing.assert_array_equal(
        converted["params"]["ResNet50Backbone_0"]["BottleneckBlock_2"]
                 ["Conv_1"]["kernel"],
        layers["conv4_block1_2_conv"]["kernel"])
    np.testing.assert_array_equal(
        converted["params"]["FPN_0"]["Conv_2"]["kernel"],
        layers["C4_reduced"]["kernel"])
    np.testing.assert_array_equal(
        converted["params"]["FPN_0"]["Conv_5"]["kernel"],
        layers["P3"]["kernel"])
    np.testing.assert_array_equal(
        converted["params"]["nuclear_pixelwise"]["Conv_3"]["kernel"],
        layers["semantic_3_conv3"]["kernel"])
    np.testing.assert_array_equal(
        converted["params"]["nuclear_pixelwise"]["Conv_3"]["bias"],
        layers["semantic_3_conv3"]["bias"])

    # conv bias folded into the following BN's moving mean
    np.testing.assert_allclose(
        converted["batch_stats"]["ResNet50Backbone_0"]["BatchNorm_0"]["mean"],
        layers["conv1_bn"]["moving_mean"] - layers["conv1_conv"]["bias"],
        rtol=1e-6)
    np.testing.assert_array_equal(
        converted["params"]["ResNet50Backbone_0"]["BatchNorm_0"]["scale"],
        layers["conv1_bn"]["gamma"])

    # converted variables drive the model (structure intact)
    import jax.numpy as jnp
    model = unet.PanopticNet(dtype=jnp.float32, stage_sizes=MINI_STAGES,
                             base_width=16, fpn_channels=64)
    out = model.apply(
        {"params": converted["params"],
         "batch_stats": converted["batch_stats"]},
        jnp.ones((1, 32, 32, 2)), train=False)
    assert out["whole_cell_pixelwise"].shape == (1, 32, 32, 3)


def test_convert_fails_loudly_on_missing_layer(rng):
    variables = _mini_variables()
    layers = _keras_layers_from_flax(variables, rng)
    del layers["conv3_block1_2_conv"]
    with pytest.raises(ValueError, match="conv3_block1_2_conv"):
        cd.convert(layers, variables, stages=MINI_STAGES)


def test_convert_fails_loudly_on_shape_mismatch(rng):
    variables = _mini_variables()
    layers = _keras_layers_from_flax(variables, rng)
    layers["P2"]["kernel"] = layers["P2"]["kernel"][:1]
    with pytest.raises(ValueError, match="P2"):
        cd.convert(layers, variables, stages=MINI_STAGES)


def test_convert_flags_leftover_layers(rng):
    variables = _mini_variables()
    layers = _keras_layers_from_flax(variables, rng)
    layers["some_extra_conv"] = {
        "kernel": np.zeros((1, 1, 4, 4), np.float32)}
    with pytest.raises(ValueError, match="some_extra_conv"):
        cd.convert(layers, variables, stages=MINI_STAGES)


def test_convert_flags_head_architecture_mismatch(rng):
    variables = _mini_variables()
    layers = _keras_layers_from_flax(variables, rng)
    # an extra semantic-head conv that has no flax counterpart
    layers["semantic_0_conv9"] = {
        "kernel": np.zeros((3, 3, 8, 8), np.float32),
        "bias": np.zeros(8, np.float32)}
    with pytest.raises(ValueError, match="architecture mismatch"):
        cd.convert(layers, variables, stages=MINI_STAGES)
