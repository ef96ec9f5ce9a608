"""Emit tests/models/deepcell_layer_manifest.json — the frozen transcription
of deepcell-tf's Mesmer (MultiplexSegmentation) weighted-layer names/shapes.

The manifest is the anti-circularity fixture VERDICT r2 asked for: the
converter test builds its synthetic Keras HDF5 from THIS file, which is
derived from the public deepcell-tf / keras-applications sources — never
from `convert_deepcell.py`'s own name map. Shape math below encodes the
architecture definitions directly:

- Backbone: tf.keras.applications.ResNet50 (keras resnet.py): stem
  `conv1_conv` 7×7/2 + `conv1_bn`; stacks `conv{2..5}_block{b}` with
  filters (64, 128, 256, 512) and block counts (3, 4, 6, 3); per block
  `_1_conv` 1×1 (stride on block1), `_2_conv` 3×3, `_3_conv` 1×1×4f,
  projection `_0_conv`/`_0_bn` on block1. All convs use_bias=True.
  [certainty: exact — keras-applications names are stable public API]
- Input fixers: PanopticNet(location=True) concatenates Location2D (2
  coordinate channels) to the 2-channel input, then a TensorProduct maps
  to the backbone's required 3 channels ('tensor_product', kernel (4, 3)).
  [certainty: high for the structure; the auto-assigned layer name
  'tensor_product' is keras' default for the first unnamed instance]
- FPN: deepcell-tf fpn.__create_pyramid_features over backbone_levels
  C3–C5: `C{l}_reduced` 1×1×256 laterals, `P{l}` 3×3×256 smoothing,
  plus `P6` = 3×3/2 conv on C5 and `P7` = 3×3/2 conv on relu(P6).
  [certainty: high — names are explicit string formats in fpn.py]
- Semantic heads (ids 0..3 = whole-cell inner-distance (1 class),
  whole-cell pixelwise (3), nuclear inner-distance (1), nuclear pixelwise
  (3)): fpn.__create_semantic_head from P3 — semantic_upsample's three
  `conv_{i}_semantic_upsample_{id}` 3×3×64 convs, then
  `tensor_product_0_semantic_{id}` (dense 256→... 64→128),
  `batch_normalization_0_semantic_{id}`, and
  `tensor_product_1_semantic_{id}` (128→n_classes).
  [certainty: medium-high — the `*_semantic_{id}` name formats are from
  fpn.py; filter widths (64 upsample, 128 dense) are the deepcell
  defaults n_filters=64 / n_dense=128]

If a real MultiplexSegmentation.h5 disagrees with any entry, the converter
fails loudly listing exactly which names/shapes mismatched — that error
message is the update instruction for this manifest.
"""

import json
import os

STAGE_FILTERS = (64, 128, 256, 512)
STAGE_BLOCKS = (3, 4, 6, 3)
FEATURE_SIZE = 256
HEAD_UPSAMPLE_FILTERS = 64
HEAD_DENSE = 128
HEAD_CLASSES = (1, 3, 1, 3)
IN_CHANNELS = 2            # (nuclear, membrane)
REQUIRED_CHANNELS = 3      # imagenet backbone input


def conv(shape):
    return {"kernel": list(shape), "bias": [shape[-1]]}


def bn(ch):
    return {"gamma": [ch], "beta": [ch],
            "moving_mean": [ch], "moving_variance": [ch]}


def dense(n_in, n_out):
    return {"kernel": [n_in, n_out], "bias": [n_out]}


def main(out_path=None):
    """Write the manifest; `out_path=None` targets the committed fixture."""
    layers = {}

    # input fixer: concat(input, Location2D) -> TensorProduct(3)
    layers["tensor_product"] = dense(IN_CHANNELS + 2, REQUIRED_CHANNELS)

    # ResNet50 stem
    layers["conv1_conv"] = conv((7, 7, REQUIRED_CHANNELS, 64))
    layers["conv1_bn"] = bn(64)

    in_ch = 64
    for si, (f, n_blocks) in enumerate(zip(STAGE_FILTERS, STAGE_BLOCKS)):
        stage = si + 2
        for b in range(1, n_blocks + 1):
            p = f"conv{stage}_block{b}"
            layers[f"{p}_1_conv"] = conv((1, 1, in_ch, f))
            layers[f"{p}_1_bn"] = bn(f)
            layers[f"{p}_2_conv"] = conv((3, 3, f, f))
            layers[f"{p}_2_bn"] = bn(f)
            layers[f"{p}_3_conv"] = conv((1, 1, f, 4 * f))
            layers[f"{p}_3_bn"] = bn(4 * f)
            if b == 1:  # projection shortcut
                layers[f"{p}_0_conv"] = conv((1, 1, in_ch, 4 * f))
                layers[f"{p}_0_bn"] = bn(4 * f)
            in_ch = 4 * f

    # FPN over C3 (512ch), C4 (1024ch), C5 (2048ch)
    c_channels = {3: 512, 4: 1024, 5: 2048}
    for level in (3, 4, 5):
        layers[f"C{level}_reduced"] = conv(
            (1, 1, c_channels[level], FEATURE_SIZE))
        layers[f"P{level}"] = conv((3, 3, FEATURE_SIZE, FEATURE_SIZE))
    layers["P6"] = conv((3, 3, c_channels[5], FEATURE_SIZE))
    layers["P7"] = conv((3, 3, FEATURE_SIZE, FEATURE_SIZE))

    # semantic heads from P3
    for sid, n_classes in enumerate(HEAD_CLASSES):
        ch = FEATURE_SIZE
        for i in range(3):
            layers[f"conv_{i}_semantic_upsample_{sid}"] = conv(
                (3, 3, ch, HEAD_UPSAMPLE_FILTERS))
            ch = HEAD_UPSAMPLE_FILTERS
        layers[f"tensor_product_0_semantic_{sid}"] = dense(ch, HEAD_DENSE)
        layers[f"batch_normalization_0_semantic_{sid}"] = bn(HEAD_DENSE)
        layers[f"tensor_product_1_semantic_{sid}"] = dense(HEAD_DENSE,
                                                           n_classes)

    manifest = {
        "_source": ("transcribed from public deepcell-tf (model_zoo/"
                    "panopticnet.py, utils/backbone_utils.py, layers/"
                    "location.py, model_zoo/fpn.py) and tf.keras."
                    "applications resnet.py; see "
                    "scripts/make_deepcell_manifest.py for the per-section "
                    "certainty notes"),
        "_model": ("MultiplexSegmentation (Mesmer): PanopticNet resnet50, "
                   "input (H, W, 2), location=True, "
                   "num_semantic_classes=[1, 3, 1, 3]"),
        "layers": layers,
    }
    out = out_path if out_path is not None else os.path.join(
        os.path.dirname(__file__), "..", "tests", "models",
        "deepcell_layer_manifest.json")
    with open(out, "w") as fh:
        json.dump(manifest, fh, indent=1, sort_keys=True)
    n_weights = sum(len(w) for w in layers.values())
    print(f"wrote {out}: {len(layers)} layers, {n_weights} weight tensors")


if __name__ == "__main__":
    main()
