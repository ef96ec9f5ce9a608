"""Mesmer-style segmentation network: ResNet50 + FPN + semantic heads, in flax.

Replaces the reference's remote DeepCell/Mesmer REST service
(`src/ark/utils/deepcell_service_utils.py:95-343` — zip upload → GPU predict →
poll → download) with an in-process JAX model so FOV batches run on TPU.

Architecture follows the published Mesmer configuration (deepcell-tf
PanopticNet topology, transcribed in tests/models/deepcell_layer_manifest.json):
input → Location2D coordinate-channel concat → channel-fixing dense
(TensorProduct to the backbone's 3 channels) → ResNet50 encoder → feature
pyramid over C3–C5 with retinanet-style P6/P7 extras → four semantic heads
fed from P3 — for each compartment (whole-cell, nuclear) an inner-distance
regression head (1 channel, ReLU) and a pixelwise classification head
(3 classes: interior / border / background, softmax). Input is a 2-channel
(nuclear, membrane) image batch in NHWC. Weights are random-initialized unless
loaded from an `.npz` (the zero-egress build cannot fetch published weights;
`load_params_npz` accepts a checkpoint converted by
`ark_tpu.models.convert_deepcell`, whose layer-name map targets the same
manifest).

TPU notes: all convs run in bfloat16 by default with float32 params/outputs
(MXU-friendly); shapes are static; the whole forward jits into one program.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


# benchmarking/debug switch (benchmarks/head_fold_ab.py A/Bs it
# in-process): True reproduces the old behavior of upcasting every
# pyramid/head resize to float32. XLA lowers bilinear resize to dense
# interpolation-matrix matmuls; in f32 those run at 1/8 MXU rate, and the
# result is immediately rounded back to bf16 anyway — resizing in the
# model dtype keeps the matmuls on the fast path (the 2× weights 0.25/0.75
# are exact in bf16 and the MXU accumulates in f32). An elementwise
# shifted-lerp formulation was tried and LOST 1.7× to the matmul lowering
# (interleave relayouts; same lesson as the BMU argmin — see
# benchmarks/head_fold_ab.py history and PERF.md).
RESIZE_IN_F32 = False

# keras/TF forward-semantics constants the converter contract depends on
# (pinned by tests/models/test_keras_semantics.py — a genuine
# MultiplexSegmentation.h5 converts AND computes correctly only if these
# match what the weights were trained under):
# - keras.applications resnet.py builds every backbone BatchNormalization
#   with epsilon=1.001e-5 (NOT keras' 1e-3 default, NOT flax's 1e-5)
# - deepcell-tf's semantic head uses a default-epsilon keras
#   BatchNormalization (1e-3)
BACKBONE_BN_EPSILON = 1.001e-5
HEAD_BN_EPSILON = 1e-3


def location2d_grid(h: int, w: int) -> jax.Array:
    """deepcell-tf `Location2D` coordinate channels (layers/location.py):
    row/col index grids each normalized to [0, 1] by their MAX INDEX
    (divide by h-1 / w-1, not h / w), stacked channel-last in (y, x)
    order — channel 0 varies down rows, channel 1 across columns.
    Returns (h, w, 2) float32."""
    ys = jnp.arange(h, dtype=jnp.float32) / max(h - 1, 1)
    xs = jnp.arange(w, dtype=jnp.float32) / max(w - 1, 1)
    return jnp.stack(jnp.meshgrid(ys, xs, indexing="ij"), axis=-1)


def _bilinear_resize(x: jax.Array, th: int, tw: int,
                     dtype=None) -> jax.Array:
    """Bilinear resize of NHWC `x` to (th, tw) via `jax.image.resize`, in
    the model dtype (f32 when RESIZE_IN_F32 — see note above)."""
    out_dtype = dtype if dtype is not None else x.dtype
    if RESIZE_IN_F32:
        x = x.astype(jnp.float32)
    b, h, w, c = x.shape
    if (h, w) != (th, tw):
        x = jax.image.resize(x, (b, th, tw, c), "bilinear")
    return x.astype(out_dtype)


class BottleneckBlock(nn.Module):
    features: int
    strides: Tuple[int, int] = (1, 1)
    projection: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = functools.partial(nn.BatchNorm, use_running_average=not train,
                                 momentum=0.9, epsilon=BACKBONE_BN_EPSILON,
                                 dtype=self.dtype)
        residual = x
        y = nn.Conv(self.features, (1, 1), strides=self.strides,
                    use_bias=False, dtype=self.dtype)(x)
        y = norm()(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding="SAME", use_bias=False,
                    dtype=self.dtype)(y)
        y = norm()(y)
        y = nn.relu(y)
        y = nn.Conv(self.features * 4, (1, 1), use_bias=False,
                    dtype=self.dtype)(y)
        y = norm(scale_init=nn.initializers.zeros)(y)
        if self.projection or residual.shape[-1] != self.features * 4:
            residual = nn.Conv(self.features * 4, (1, 1),
                               strides=self.strides, use_bias=False,
                               dtype=self.dtype)(residual)
            residual = norm()(residual)
        return nn.relu(y + residual)


class ResNet50Backbone(nn.Module):
    """Standard ResNet50 stages; returns C2..C5 feature maps (strides 4..32).

    `stage_sizes`/`base_width` shrink the backbone for the mini configuration
    (tests, synthetic training demos); defaults are exact ResNet50."""
    dtype: Any = jnp.bfloat16
    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    base_width: int = 64

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = functools.partial(nn.BatchNorm, use_running_average=not train,
                                 momentum=0.9, epsilon=BACKBONE_BN_EPSILON,
                                 dtype=self.dtype)
        # keras ResNet50 stem: ZeroPadding2D(3) + 7x7/2 VALID conv — an
        # explicit (3, 3) pad, NOT 'SAME' (SAME on an even input pads
        # (2, 3): one row/col shifted vs the published weights)
        x = nn.Conv(self.base_width, (7, 7), strides=(2, 2),
                    padding=[(3, 3), (3, 3)], use_bias=False,
                    dtype=self.dtype)(x)
        x = norm()(x)
        x = nn.relu(x)
        # keras pool1: ZeroPadding2D(1) + 3x3/2 VALID maxpool. flax pads
        # with -inf where keras pads with ZEROS — identical here because
        # the input is post-relu (>= 0, so real values always dominate a
        # zero pad); pinned by tests/models/test_keras_semantics.py
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        feats = []
        for i, n_blocks in enumerate(self.stage_sizes):
            features = self.base_width * (2 ** i)
            strides = (1, 1) if i == 0 else (2, 2)
            x = BottleneckBlock(features, strides=strides, projection=True,
                                dtype=self.dtype)(x, train)
            for _ in range(n_blocks - 1):
                x = BottleneckBlock(features, dtype=self.dtype)(x, train)
            feats.append(x)
        return feats  # [C2, C3, C4, C5]


class FPN(nn.Module):
    """deepcell-tf `fpn.__create_pyramid_features` topology over C3–C5:
    1×1 laterals (`C{l}_reduced`), bilinear top-down adds, 3×3 smoothing
    (`P{l}`), plus the retinanet-style extras P6 = stride-2 3×3 on C5 and
    P7 = stride-2 3×3 on relu(P6). P6/P7 exist in the published weights
    even though the semantic heads consume only P3 — they are created here
    too (XLA dead-code-eliminates their compute when unused) so a converted
    checkpoint maps 1:1 with no leftover layers."""
    channels: int = 256
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, feats):
        levels = (3, 4, 5)                       # feats = [C3, C4, C5]
        laterals = [nn.Conv(self.channels, (1, 1), dtype=self.dtype,
                            name=f"C{l}_reduced")(f)
                    for l, f in zip(levels, feats)]
        tops = [laterals[-1]]
        for lat in laterals[-2::-1]:
            b, h, w, c = lat.shape
            tops.append(lat + _bilinear_resize(tops[-1], h, w,
                                               dtype=self.dtype))
        tops = tops[::-1]
        pyr = [nn.Conv(self.channels, (3, 3), padding="SAME",
                       dtype=self.dtype, name=f"P{l}")(t)
               for l, t in zip(levels, tops)]
        p6 = nn.Conv(self.channels, (3, 3), strides=(2, 2), padding="SAME",
                     dtype=self.dtype, name="P6")(feats[-1])
        p7 = nn.Conv(self.channels, (3, 3), strides=(2, 2), padding="SAME",
                     dtype=self.dtype, name="P7")(nn.relu(p6))
        return pyr + [p6, p7]                    # [P3, P4, P5, P6, P7]


class SemanticHead(nn.Module):
    """deepcell-tf `fpn.__create_semantic_head` topology: from the finest
    pyramid level (P3, stride 8), three rounds of 3×3 conv + relu + 2×
    bilinear upsample back to input resolution (`semantic_upsample`,
    conv_{i}_semantic_upsample_{id}), then a channel-dense (TensorProduct)
    to `dense_features` + BatchNorm + relu, then a channel-dense to
    n_classes. Module/leaf names are the converter's targets.

    Perf note: applying dense_0+bn_0 below the final upsample (an exact
    reordering — both are per-pixel affine maps and bilinear weights sum
    to 1) was measured SLOWER on TPU: the resize is the dominant cost of
    this head at large sizes and the fold doubles its channel count
    (benchmarks/head_fold_ab.py: 11.7→13.5 ms at 1024²/b2). The published
    order is kept; the resize runs in the model dtype instead (1.47×)."""
    n_classes: int
    upsample_filters: int = 64
    dense_features: int = 128
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, p3, out_hw, train: bool = False):
        x = p3
        for i in range(3):
            x = nn.Conv(self.upsample_filters, (3, 3), padding="SAME",
                        dtype=self.dtype, name=f"upsample_conv_{i}")(x)
            x = nn.relu(x)
            b, h, w, c = x.shape
            # the last step is an UpsampleLike straight to the input size
            th, tw = (out_hw if i == 2 else (h * 2, w * 2))
            x = _bilinear_resize(x, th, tw, dtype=self.dtype)
        x = nn.Dense(self.dense_features, dtype=self.dtype, name="dense_0")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=HEAD_BN_EPSILON, dtype=self.dtype,
                         name="bn_0")(x)
        x = nn.relu(x)
        return nn.Dense(self.n_classes, dtype=jnp.float32, name="dense_1")(x)


class PanopticNet(nn.Module):
    """Mesmer-configuration segmentation net.

    Output dict per compartment c in {'whole_cell', 'nuclear'}:
      `<c>_inner_distance`: (B, H, W, 1) ReLU regression of cell-center distance
      `<c>_pixelwise`: (B, H, W, 3) softmax over interior/border/background

    Defaults are the published Mesmer configuration (ResNet50 backbone,
    256-channel FPN). `stage_sizes`/`base_width`/`fpn_channels` define the
    mini configuration (`init_mesmer_mini`) used for fast synthetic training
    and tests — same code path, fewer/narrower blocks.
    """
    compartments: Sequence[str] = ("whole_cell", "nuclear")
    dtype: Any = jnp.bfloat16
    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    base_width: int = 64
    fpn_channels: int = 256
    head_upsample_filters: int = 64
    head_dense_features: int = 128
    # deepcell PanopticNet(location=True): concatenate normalized (y, x)
    # coordinate channels, then a channel-dense maps to the backbone's
    # required 3 channels ('tensor_product' in the published weights)
    location: bool = True
    # published Mesmer uses relu on the inner-distance head; training from
    # scratch with MSE kills saturating heads on mostly-zero targets (relu:
    # all pre-activations go negative -> zero grad; softplus: driven to -inf
    # until exp underflows — both observed on synthetic training), so
    # trained-from-scratch configs use a linear head (MSE optimum is the
    # conditional mean, no saturation; the deep-watershed postprocess
    # thresholds at 0.1 so small negative background is harmless)
    inner_activation: str = "relu"

    @nn.compact
    def __call__(self, x, train: bool = False,
                 return_p3: bool = False) -> Dict[str, jax.Array]:
        """return_p3=True: stop after the FPN and return the P3 feature map
        (for head experiments, e.g. benchmarks/head_tile_ab.py) — the
        semantic heads are neither created nor applied, so this is only
        valid on variables initialized by a normal forward."""
        out_hw = x.shape[1:3]
        x = x.astype(self.dtype)
        if self.location:
            b, h, w, _ = x.shape
            loc = jnp.broadcast_to(location2d_grid(h, w)[None], (b, h, w, 2))
            x = jnp.concatenate([x, loc.astype(self.dtype)], axis=-1)
        x = nn.Dense(3, dtype=self.dtype, name="tensor_product")(x)
        feats = ResNet50Backbone(dtype=self.dtype,
                                 stage_sizes=tuple(self.stage_sizes),
                                 base_width=self.base_width)(x, train)
        pyramid = FPN(channels=self.fpn_channels,
                      dtype=self.dtype)(feats[1:])   # C3, C4, C5
        p3 = pyramid[0]
        if return_p3:
            return p3
        out = {}
        for comp in self.compartments:
            inner = SemanticHead(
                1, upsample_filters=self.head_upsample_filters,
                dense_features=self.head_dense_features, dtype=self.dtype,
                name=f"{comp}_inner")(p3, out_hw, train)
            pixelwise = SemanticHead(
                3, upsample_filters=self.head_upsample_filters,
                dense_features=self.head_dense_features, dtype=self.dtype,
                name=f"{comp}_pixelwise")(p3, out_hw, train)
            act = {"relu": nn.relu, "softplus": nn.softplus,
                   "linear": lambda y: y}[self.inner_activation]
            out[f"{comp}_inner_distance"] = act(inner)
            out[f"{comp}_pixelwise"] = jax.nn.softmax(pixelwise, axis=-1)
        return out


# maxsize=2 bounds retained memory: a full Mesmer variables pytree is
# ~100 MB f32, and real sessions touch at most two configs (full + mini);
# 8 slots could pin close to a GB for the process lifetime
@functools.lru_cache(maxsize=2)
def _init_cached(seed, input_shape, dtype, config_items):
    model = PanopticNet(dtype=dtype, **dict(config_items))
    variables = jax.jit(functools.partial(model.init, train=False))(
        jax.random.PRNGKey(seed), jnp.zeros(input_shape, jnp.float32))
    return model, variables


def init_mesmer(seed: int = 0, input_shape=(1, 256, 256, 2),
                dtype=jnp.bfloat16, **config):
    """Initialize a Mesmer PanopticNet; returns (model, variables).

    Init runs under jit — eager flax init of the full ResNet50 evaluates
    ~160 convs op-by-op (98 s on this host); jitted it is one compile.
    Results are memoized per (seed, shape, dtype, config): repeated inits
    (common in tests) return the same model and variables pytree — treat
    the variables as immutable (all jax ops copy; never mutate in place)."""
    config_items = tuple(sorted(
        (k, tuple(v) if isinstance(v, (list, tuple)) else v)
        for k, v in config.items()))
    return _init_cached(seed, tuple(input_shape), dtype, config_items)


def init_mesmer_mini(seed: int = 0, input_shape=(1, 64, 64, 2),
                     dtype=jnp.float32):
    """A small PanopticNet: 1-block stages, width 16, 64-channel FPN,
    narrow heads, linear inner-distance head (trained from scratch).
    Same code path as the full Mesmer configuration; used for
    synthetic-data training demos and the planted-instance e2e tests."""
    return init_mesmer(seed=seed, input_shape=input_shape, dtype=dtype,
                       stage_sizes=(1, 1, 1, 1), base_width=16,
                       fpn_channels=64, head_upsample_filters=32,
                       head_dense_features=64, inner_activation="linear")


def load_params_npz(path: str, return_config: bool = False):
    """Load a flattened param dict ('a/b/c' keys) from .npz into a pytree.

    Checkpoints written by `save_params_npz` embed the PanopticNet
    architecture config under '__config__'; pass return_config=True to get
    (variables, config_dict_or_None)."""
    import json

    flat = dict(np.load(path))
    config = None
    raw = flat.pop("__config__", None)
    if raw is not None:
        config = json.loads(str(raw.item() if raw.ndim == 0 else raw[0]))
    tree: Dict = {}
    for key, val in flat.items():
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(val)
    return (tree, config) if return_config else tree


def save_params_npz(path: str, variables: Dict, config: Dict = None):
    """Save a variables pytree as a flattened compressed .npz; `config`
    (PanopticNet kwargs, e.g. {'stage_sizes': [1,1,1,1], 'base_width': 16})
    is embedded as JSON so loaders can rebuild the architecture."""
    import json

    flat = {}

    def rec(node, prefix):
        if isinstance(node, dict):
            for k, v in node.items():
                rec(v, f"{prefix}/{k}" if prefix else k)
        else:
            flat[prefix] = np.asarray(node)

    rec(variables, "")
    if config is not None:
        flat["__config__"] = np.array(json.dumps(config))
    np.savez_compressed(path, **flat)
