"""Manifest-driven deepcell converter test (de-circularized, VERDICT r2 #1).

The synthetic Keras HDF5 here is built from
`tests/models/deepcell_layer_manifest.json` — a frozen transcription of
deepcell-tf's real Mesmer layer names/shapes (provenance:
`scripts/make_deepcell_manifest.py`) — and NEVER from
`convert_deepcell.py`'s own name map. If the converter misreads
deepcell-tf's naming or ordering, conversion of this manifest-shaped file
fails; previously the test synthesized names from the converter's inverse,
so any systematic misreading passed.

The real checkpoint cannot be fetched in this zero-egress build; given the
genuine `MultiplexSegmentation.h5`, `convert_file` is the documented
one-command path and any manifest/reality divergence comes back as a loud
per-layer error list.
"""

import json
import os

import numpy as np
import pytest

from ark_tpu.models import convert_deepcell as cd
from ark_tpu.models import unet

MANIFEST = os.path.join(os.path.dirname(__file__),
                        "deepcell_layer_manifest.json")


def _load_manifest():
    with open(MANIFEST) as f:
        return json.load(f)["layers"]


def _layers_from_manifest(rng):
    """Random-valued keras layer dicts shaped exactly per the manifest."""
    layers = {}
    for name, weights in _load_manifest().items():
        layers[name] = {
            w: rng.normal(size=shape).astype(np.float32)
            if w != "moving_variance"
            else np.abs(rng.normal(size=shape)).astype(np.float32) + 0.5
            for w, shape in weights.items()}
    return layers


@pytest.fixture(scope="module")
def full_variables():
    """Full-size Mesmer variables (module-scoped: the jitted ResNet50 init
    compile is the expensive part; 64x64 input keeps it tractable while
    producing identical parameter shapes)."""
    import jax
    _, variables = unet.init_mesmer(seed=0, input_shape=(1, 64, 64, 2),
                                    dtype=np.float32)
    return jax.device_get(jax.tree.map(np.asarray, variables))


def test_manifest_covers_known_totals():
    """Sanity-pin the manifest itself: ResNet50 has 53 conv + 53 BN layers,
    the FPN 8 convs, each of 4 heads 3+2 weighted layers + 1 BN, plus the
    input tensor_product."""
    layers = _load_manifest()
    convs = [n for n in layers if n.endswith("_conv") or n == "conv1_conv"]
    bns = [n for n in layers if n.endswith("_bn")]
    assert len(convs) == 53
    assert len(bns) == 53
    assert {f"C{l}_reduced" for l in (3, 4, 5)} <= set(layers)
    assert {f"P{l}" for l in (3, 4, 5, 6, 7)} <= set(layers)
    for sid in range(4):
        assert f"conv_2_semantic_upsample_{sid}" in layers
        assert f"batch_normalization_0_semantic_{sid}" in layers
    assert layers["tensor_product"]["kernel"] == [4, 3]
    # head output widths are Mesmer's [1, 3, 1, 3]
    assert [layers[f"tensor_product_1_semantic_{i}"]["kernel"][1]
            for i in range(4)] == [1, 3, 1, 3]


def test_convert_full_model_from_manifest(rng, tmp_path, full_variables):
    """A manifest-shaped HDF5 must convert onto the full flax tree with
    zero errors — names AND shapes agree end to end — and values must land
    in the documented leaves."""
    import h5py

    layers = _layers_from_manifest(rng)
    path = tmp_path / "manifest_mesmer.h5"
    with h5py.File(path, "w") as f:
        g = f.create_group("model_weights")
        for lname, weights in layers.items():
            lg = g.create_group(lname).create_group(lname)
            for wname, arr in weights.items():
                lg.create_dataset(f"{wname}:0", data=arr)

    read_back = cd.read_keras_h5(str(path))
    assert set(read_back) == set(layers)
    converted = cd.convert(read_back, full_variables)

    p = converted["params"]
    np.testing.assert_array_equal(p["tensor_product"]["kernel"],
                                  layers["tensor_product"]["kernel"])
    np.testing.assert_array_equal(
        p["ResNet50Backbone_0"]["Conv_0"]["kernel"],
        layers["conv1_conv"]["kernel"])
    # conv4_block1 is the 8th bottleneck block (3 + 4 + 1) -> index 7
    np.testing.assert_array_equal(
        p["ResNet50Backbone_0"]["BottleneckBlock_7"]["Conv_1"]["kernel"],
        layers["conv4_block1_2_conv"]["kernel"])
    np.testing.assert_array_equal(
        p["ResNet50Backbone_0"]["BottleneckBlock_7"]["Conv_3"]["kernel"],
        layers["conv4_block1_0_conv"]["kernel"])
    np.testing.assert_array_equal(p["FPN_0"]["C4_reduced"]["kernel"],
                                  layers["C4_reduced"]["kernel"])
    np.testing.assert_array_equal(p["FPN_0"]["P6"]["kernel"],
                                  layers["P6"]["kernel"])
    np.testing.assert_array_equal(
        p["nuclear_pixelwise"]["upsample_conv_1"]["kernel"],
        layers["conv_1_semantic_upsample_3"]["kernel"])
    np.testing.assert_array_equal(
        p["whole_cell_inner"]["dense_1"]["kernel"],
        layers["tensor_product_1_semantic_0"]["kernel"])
    np.testing.assert_array_equal(
        p["whole_cell_pixelwise"]["bn_0"]["scale"],
        layers["batch_normalization_0_semantic_1"]["gamma"])
    # head BN stats land in batch_stats (no conv-bias folding on heads)
    np.testing.assert_array_equal(
        converted["batch_stats"]["nuclear_inner"]["bn_0"]["mean"],
        layers["batch_normalization_0_semantic_2"]["moving_mean"])
    # backbone conv bias folded into the following BN's moving mean
    np.testing.assert_allclose(
        converted["batch_stats"]["ResNet50Backbone_0"]["BatchNorm_0"]["mean"],
        layers["conv1_bn"]["moving_mean"] - layers["conv1_conv"]["bias"],
        rtol=1e-6)

    # converted variables drive the full model end to end
    import jax
    import jax.numpy as jnp
    model, _ = unet.init_mesmer(seed=0, input_shape=(1, 64, 64, 2),
                                dtype=np.float32)
    out = jax.jit(lambda v, x: model.apply(v, x, train=False))(
        {"params": jax.tree.map(jnp.asarray, converted["params"]),
         "batch_stats": jax.tree.map(jnp.asarray,
                                     converted["batch_stats"])},
        jnp.ones((1, 64, 64, 2), jnp.float32))
    assert out["whole_cell_pixelwise"].shape == (1, 64, 64, 3)
    assert out["nuclear_inner_distance"].shape == (1, 64, 64, 1)


def test_convert_fails_loudly_on_renamed_head_layer(rng, full_variables):
    """Simulated misreading of deepcell-tf head naming: the converter must
    name the missing layer AND flag the stray one — not silently skip."""
    layers = _layers_from_manifest(rng)
    layers["conv_1_semantic_upsample_0_v2"] = layers.pop(
        "conv_1_semantic_upsample_0")
    with pytest.raises(ValueError) as exc:
        cd.convert(layers, full_variables)
    assert "conv_1_semantic_upsample_0" in str(exc.value)
    assert "unmapped" in str(exc.value)


def test_convert_fails_loudly_on_missing_layer(rng, full_variables):
    layers = _layers_from_manifest(rng)
    del layers["conv3_block1_2_conv"], layers["conv3_block1_2_bn"]
    with pytest.raises(ValueError, match="conv3_block1_2_conv"):
        cd.convert(layers, full_variables)


def test_convert_fails_loudly_on_shape_mismatch(rng, full_variables):
    layers = _layers_from_manifest(rng)
    layers["P3"]["kernel"] = layers["P3"]["kernel"][:1]
    with pytest.raises(ValueError, match="P3"):
        cd.convert(layers, full_variables)


def test_convert_flags_leftover_layers(rng, full_variables):
    layers = _layers_from_manifest(rng)
    layers["some_extra_conv"] = {
        "kernel": np.zeros((1, 1, 4, 4), np.float32)}
    with pytest.raises(ValueError, match="some_extra_conv"):
        cd.convert(layers, full_variables)


def test_manifest_regenerates_identically(tmp_path):
    """The committed fixture must match its generator (provenance intact).

    The generator writes to a TMP path — regenerating the committed fixture
    in place would let a generator/manifest drift fail once, rewrite the
    pin, and self-heal on the retry."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "make_manifest", os.path.join(os.path.dirname(__file__), "..", "..",
                                      "scripts", "make_deepcell_manifest.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    regen = tmp_path / "manifest.json"
    mod.main(out_path=str(regen))
    assert open(MANIFEST).read() == regen.read_text()
