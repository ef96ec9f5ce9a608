"""Mesmer-style segmentation network: ResNet50 + FPN + semantic heads, in flax.

Replaces the reference's remote DeepCell/Mesmer REST service
(`src/ark/utils/deepcell_service_utils.py:95-343` — zip upload → GPU predict →
poll → download) with an in-process JAX model so FOV batches run on TPU.

Architecture follows the published Mesmer configuration (deepcell-tf
PanopticNet): a ResNet50 encoder, a feature-pyramid decoder, and four semantic
heads — for each compartment (whole-cell, nuclear) an inner-distance
regression head (1 channel, ReLU) and a pixelwise classification head
(3 classes: interior / border / background, softmax). Input is a 2-channel
(nuclear, membrane) image batch in NHWC. Weights are random-initialized unless
loaded from an `.npz` (the zero-egress build cannot fetch published weights;
`load_params_npz` accepts a converted checkpoint).

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


class BottleneckBlock(nn.Module):
    features: int
    strides: Tuple[int, int] = (1, 1)
    projection: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        norm = functools.partial(nn.BatchNorm, use_running_average=not train,
                                 momentum=0.9, epsilon=1e-5, dtype=self.dtype)
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
                                 momentum=0.9, epsilon=1e-5, dtype=self.dtype)
        x = nn.Conv(self.base_width, (7, 7), strides=(2, 2),
                    padding=[(3, 3), (3, 3)], use_bias=False,
                    dtype=self.dtype)(x)
        x = norm()(x)
        x = nn.relu(x)
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


def _upsample(x, factor: int):
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, h * factor, w * factor, c), "nearest")


class FPN(nn.Module):
    """Top-down feature pyramid: laterals + upsample-add, 256 channels."""
    channels: int = 256
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, feats):
        laterals = [nn.Conv(self.channels, (1, 1), dtype=self.dtype)(f)
                    for f in feats]
        out = [laterals[-1]]
        for lat in laterals[-2::-1]:
            out.append(lat + _upsample(out[-1], 2))
        out = out[::-1]  # [P2, P3, P4, P5]
        return [nn.Conv(self.channels, (3, 3), padding="SAME",
                        dtype=self.dtype)(p) for p in out]


class SemanticHead(nn.Module):
    """Upsample P2 to input resolution, then predict n_classes maps."""
    n_classes: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, p2, out_hw):
        x = p2
        # 2 conv+upsample steps: stride 4 -> 1
        for _ in range(2):
            x = nn.Conv(128, (3, 3), padding="SAME", dtype=self.dtype)(x)
            x = nn.relu(x)
            x = _upsample(x, 2)
        x = nn.Conv(64, (3, 3), padding="SAME", dtype=self.dtype)(x)
        x = nn.relu(x)
        return nn.Conv(self.n_classes, (1, 1), dtype=jnp.float32)(x)


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
    # published Mesmer uses relu on the inner-distance head; training from
    # scratch with MSE kills saturating heads on mostly-zero targets (relu:
    # all pre-activations go negative -> zero grad; softplus: driven to -inf
    # until exp underflows — both observed on synthetic training), so
    # trained-from-scratch configs use a linear head (MSE optimum is the
    # conditional mean, no saturation; the deep-watershed postprocess
    # thresholds at 0.1 so small negative background is harmless)
    inner_activation: str = "relu"

    @nn.compact
    def __call__(self, x, train: bool = False) -> Dict[str, jax.Array]:
        x = x.astype(self.dtype)
        feats = ResNet50Backbone(dtype=self.dtype,
                                 stage_sizes=tuple(self.stage_sizes),
                                 base_width=self.base_width)(x, train)
        pyramid = FPN(channels=self.fpn_channels, dtype=self.dtype)(feats)
        p2 = pyramid[0]
        out = {}
        for comp in self.compartments:
            inner = SemanticHead(1, dtype=self.dtype, name=f"{comp}_inner")(
                p2, x.shape[1:3])
            pixelwise = SemanticHead(3, dtype=self.dtype,
                                     name=f"{comp}_pixelwise")(p2, x.shape[1:3])
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
    """A small PanopticNet (~0.46M params): 1-block stages, width 16,
    64-channel FPN, linear inner-distance head (trained from scratch).
    Same code path as the full Mesmer configuration; used for
    synthetic-data training demos and the planted-instance e2e tests."""
    return init_mesmer(seed=seed, input_shape=input_shape, dtype=dtype,
                       stage_sizes=(1, 1, 1, 1), base_width=16,
                       fpn_channels=64, inner_activation="linear")


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
