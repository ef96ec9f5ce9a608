"""Convert published deepcell-tf Mesmer weights (Keras HDF5) to flax `.npz`.

The reference obtains trained Mesmer predictions from the hosted DeepCell
service (`src/ark/utils/deepcell_service_utils.py:214-343` — zip upload →
remote GPU predict → download); this build runs the PanopticNet in-process
(`ark_tpu/models/unet.py`), so published weights must be converted once:

    python -m ark_tpu.models.convert_deepcell MultiplexSegmentation.h5 out.npz
    # then: Mesmer(weights_path="out.npz")

Layer-name map (Keras → flax param tree)
-----------------------------------------
Backbone — tf.keras.applications.ResNet50 names:

  conv1_conv / conv1_bn                 → ResNet50Backbone_0/{Conv_0, BatchNorm_0}
  conv{s}_block{b}_{k}_conv/_bn, k=1..3 → BottleneckBlock_i/{Conv_{k-1}, BatchNorm_{k-1}}
  conv{s}_block1_0_conv/_0_bn (shortcut)→ BottleneckBlock_i/{Conv_3, BatchNorm_3}

  where i enumerates blocks in stage-major order: stage s∈{2..5} with
  (3,4,6,3) blocks → i = sum(blocks before stage) + (b-1).

FPN — deepcell-tf `fpn.__create_pyramid_features` names:

  C{l}_reduced (1×1 lateral), l=2..5    → FPN_0/Conv_{l-2}
  P{l} (3×3 smoothing)                  → FPN_0/Conv_{l+2}

Semantic heads — deepcell-tf `fpn.__create_semantic_head` convs for
semantic id n (PanopticNet num_semantic_classes=[1, 3, 1, 3] in Mesmer's
order: 0=whole-cell inner-distance, 1=whole-cell pixelwise, 2=nuclear
inner-distance, 3=nuclear pixelwise):

  layers matching *semantic*{n}* in file order → {comp}_{head}/Conv_0..3

Weight tensors: Keras Conv2D kernels are (H, W, in, out) — identical to
flax, no transpose. BatchNorm gamma/beta/moving_mean/moving_variance →
scale/bias/mean/var (scale+bias in `params`, mean+var in `batch_stats`).
Keras ResNet convs carry a bias even though BN follows; flax convs here are
bias-free, so the bias is folded into the following BN's moving mean
(BN(Wx + b) ≡ BN'(Wx) with mean' = mean − b).

Every assignment is shape-checked; conversion fails loudly listing any
unmapped Keras weights or unfilled flax leaves — a head-architecture
mismatch is detected, never silently mis-assigned.
"""

from __future__ import annotations

import re
import sys
from typing import Dict, List, Tuple

import numpy as np

RESNET50_STAGES = (3, 4, 6, 3)
# Mesmer semantic-head order (deepcell-tf PanopticNet created with
# num_semantic_classes=[1, 3, 1, 3])
SEMANTIC_HEADS = ("whole_cell_inner", "whole_cell_pixelwise",
                  "nuclear_inner", "nuclear_pixelwise")


def read_keras_h5(path: str) -> "Dict[str, Dict[str, np.ndarray]]":
    """Read a Keras `save_weights` HDF5 file → {layer: {weight: array}}.

    Handles both the classic layout (root attrs `layer_names`, per-layer
    attrs `weight_names`) and a flat group walk for files saved by
    `model.save` (weights under `model_weights/`).
    """
    import h5py

    out: Dict[str, Dict[str, np.ndarray]] = {}
    with h5py.File(path, "r") as f:
        root = f["model_weights"] if "model_weights" in f else f

        def visit(name, obj):
            if isinstance(obj, h5py.Dataset):
                parts = [p for p in name.split("/") if p]
                # .../<layer>/<weight>:0 ; layer group may be nested
                weight = parts[-1].split(":")[0]
                layer = parts[-2] if len(parts) >= 2 else parts[0]
                out.setdefault(layer, {})[weight] = np.asarray(obj)

        root.visititems(visit)
    return out


def _backbone_block_names(stages=RESNET50_STAGES) -> List[Tuple[str, str]]:
    """[(keras block prefix, flax module name)] in flax creation order."""
    pairs = []
    i = 0
    for si, n_blocks in enumerate(stages):
        stage = si + 2
        for b in range(1, n_blocks + 1):
            pairs.append((f"conv{stage}_block{b}", f"BottleneckBlock_{i}"))
            i += 1
    return pairs


def _assign_conv_bn(params, batch_stats, scope: List[str], conv_name: str,
                    bn_name: str, layers, keras_conv: str, keras_bn: str,
                    errors: List[str]):
    """Assign one keras conv(+bias-fold)+bn pair into the flax tree."""
    def node(tree, path):
        for p in path:
            tree = tree[p]
        return tree

    conv_src = layers.get(keras_conv)
    if conv_src is None:
        errors.append(f"missing keras layer {keras_conv}")
        return
    kern = conv_src.get("kernel")
    tgt = node(params, scope)[conv_name]
    if kern.shape != tuple(tgt["kernel"].shape):
        errors.append(f"{keras_conv}: kernel {kern.shape} != flax "
                      f"{tuple(tgt['kernel'].shape)}")
        return
    tgt["kernel"] = kern.astype(np.float32)

    bias = conv_src.get("bias")
    bn_src = layers.get(keras_bn)
    if bn_src is None:
        errors.append(f"missing keras layer {keras_bn}")
        return
    p_bn = node(params, scope)[bn_name]
    s_bn = node(batch_stats, scope)[bn_name]
    p_bn["scale"] = bn_src["gamma"].astype(np.float32)
    p_bn["bias"] = bn_src["beta"].astype(np.float32)
    mean = bn_src["moving_mean"].astype(np.float32)
    if bias is not None:
        mean = mean - bias.astype(np.float32)   # fold conv bias into BN mean
    s_bn["mean"] = mean
    s_bn["var"] = bn_src["moving_variance"].astype(np.float32)


def _assign_conv(params, scope: List[str], conv_name: str, layers,
                 keras_layer: str, errors: List[str]):
    src = layers.get(keras_layer)
    if src is None:
        errors.append(f"missing keras layer {keras_layer}")
        return
    tree = params
    for p in scope:
        tree = tree[p]
    tgt = tree[conv_name]
    kern = src["kernel"]
    if kern.shape != tuple(tgt["kernel"].shape):
        errors.append(f"{keras_layer}: kernel {kern.shape} != flax "
                      f"{tuple(tgt['kernel'].shape)}")
        return
    tgt["kernel"] = kern.astype(np.float32)
    if "bias" in src and "bias" in tgt:
        tgt["bias"] = src["bias"].astype(np.float32)
    elif "bias" in src:
        errors.append(f"{keras_layer}: keras bias present but flax conv "
                      f"is bias-free (no following BN to fold into)")


def convert(layers: "Dict[str, Dict[str, np.ndarray]]",
            variables, stages=RESNET50_STAGES) -> Dict:
    """Map keras layer dict onto a `unet.init_mesmer()` variables pytree.

    Returns a new variables dict; raises ValueError listing every mapping
    failure (missing layer, shape mismatch, leftover weights). `stages`
    must match the variables' backbone depth (default: full ResNet50).
    """
    import jax

    params = jax.tree.map(np.asarray, variables["params"])
    batch_stats = jax.tree.map(np.asarray, variables["batch_stats"])
    params = jax.device_get(params)
    batch_stats = jax.device_get(batch_stats)
    errors: List[str] = []
    used = set()

    def mark(*names):
        used.update(n for n in names if n in layers)

    # stem
    bb = ["ResNet50Backbone_0"]
    _assign_conv_bn(params, batch_stats, bb, "Conv_0", "BatchNorm_0",
                    layers, "conv1_conv", "conv1_bn", errors)
    mark("conv1_conv", "conv1_bn")
    # stages
    for keras_prefix, flax_block in _backbone_block_names(stages):
        scope = bb + [flax_block]
        for k in (1, 2, 3):
            _assign_conv_bn(params, batch_stats, scope, f"Conv_{k-1}",
                            f"BatchNorm_{k-1}", layers,
                            f"{keras_prefix}_{k}_conv",
                            f"{keras_prefix}_{k}_bn", errors)
            mark(f"{keras_prefix}_{k}_conv", f"{keras_prefix}_{k}_bn")
        if f"{keras_prefix}_0_conv" in layers:   # projection shortcut
            _assign_conv_bn(params, batch_stats, scope, "Conv_3",
                            "BatchNorm_3", layers,
                            f"{keras_prefix}_0_conv",
                            f"{keras_prefix}_0_bn", errors)
            mark(f"{keras_prefix}_0_conv", f"{keras_prefix}_0_bn")

    # FPN laterals + smoothing
    for li, level in enumerate(range(2, 6)):
        _assign_conv(params, ["FPN_0"], f"Conv_{li}", layers,
                     f"C{level}_reduced", errors)
        _assign_conv(params, ["FPN_0"], f"Conv_{li + 4}", layers,
                     f"P{level}", errors)
        mark(f"C{level}_reduced", f"P{level}")

    # semantic heads: keras layers matching *semantic_{n}* in file order
    for n, flax_head in enumerate(SEMANTIC_HEADS):
        pat = re.compile(rf"semantic[_-]?{n}(\D|$)")
        head_layers = [name for name in layers
                       if pat.search(name) and "kernel" in layers[name]]
        flax_convs = sorted(params[flax_head],
                            key=lambda s: int(s.split("_")[-1]))
        if len(head_layers) != len(flax_convs):
            errors.append(
                f"head {flax_head}: {len(head_layers)} keras conv layers "
                f"match 'semantic_{n}' but flax head has {len(flax_convs)} "
                f"(architecture mismatch — adjust SemanticHead or map "
                f"manually)")
            continue
        for keras_layer, conv_name in zip(head_layers, flax_convs):
            _assign_conv(params, [flax_head], conv_name, layers,
                         keras_layer, errors)
            mark(keras_layer)

    leftovers = [n for n in layers if n not in used
                 and any(k in ("kernel", "gamma") for k in layers[n])]
    if leftovers:
        errors.append(f"unmapped keras layers with weights: {leftovers}")
    if errors:
        raise ValueError("deepcell conversion failed:\n  " +
                         "\n  ".join(errors))
    return {"params": params, "batch_stats": batch_stats}


def convert_file(h5_path: str, npz_path: str) -> None:
    from ark_tpu.models import unet

    _, variables = unet.init_mesmer(dtype=np.float32)
    converted = convert(read_keras_h5(h5_path), variables)
    unet.save_params_npz(npz_path, converted)


if __name__ == "__main__":
    if len(sys.argv) != 3:
        sys.exit("usage: python -m ark_tpu.models.convert_deepcell "
                 "<MultiplexSegmentation.h5> <out.npz>")
    convert_file(sys.argv[1], sys.argv[2])
    print(f"wrote {sys.argv[2]}")
