"""Isolated flood A/B (no forward pass): minimax vs level-scan engine on
REAL trained-checkpoint relief, plus the host C++ flood on the same
arrays. Same process; value-readback barrier (scalar sum of labels);
anti-replay via relief variants materialized outside the window.

Usage: python benchmarks/r4_flood_isolated.py [--size 1024] [--fovs 4]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def main(size=1024, n_fovs=4):
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                     ".xla_cache"))
    from ark_tpu.ops import cc, watershed as W
    from ark_tpu.segmentation import mesmer, synthetic

    ckpt = os.path.join(os.path.dirname(mesmer.__file__), "..", "models",
                        "checkpoints", "mesmer_mini_synthetic.npz")
    rng = np.random.default_rng(0)
    fovs, _, _ = synthetic.synthetic_cells(
        rng, n_fovs, hw=size, n_cells=(250, 300), crowding=0.35)
    app = mesmer.Mesmer(weights_path=ckpt)

    # one forward to get the REAL relief the production flood sees
    inner_list, fg_list, mk_list = [], [], []
    for i in range(0, n_fovs, 2):
        raw = app._segment_device(app.variables,
                                  jnp.asarray(fovs[i:i + 2], jnp.float32),
                                  jnp.float32(0.1))
        inner_list.append(np.asarray(raw["whole_cell"]["inner"]))
        fg_list.append(np.asarray(raw["whole_cell"]["foreground"]) > 0.3)
        mk_list.append(np.asarray(raw["whole_cell"]["maxima"]))
    inner = np.concatenate(inner_list)
    fg = np.concatenate(fg_list)
    maxima = np.concatenate(mk_list)
    markers = np.stack([np.asarray(
        cc.label_batched_small(jnp.asarray(m[None]))[0])[0]
        for m in maxima])
    n_mark = int(np.mean([m.max() for m in markers]))

    def sync(x):
        return float(jnp.sum(x[0].astype(jnp.float32)))

    res = {"fov": size, "n_fovs": n_fovs, "markers_per_fov": n_mark}
    relief = jnp.asarray(-inner, jnp.float32)
    mkj = jnp.asarray(markers)
    fgj = jnp.asarray(fg)
    variants = [jax.block_until_ready(relief * (1.0 + 1e-4 * t))
                for t in range(1, 4)]

    for engine in ("levels", "minimax"):
        W._ENGINE = engine
        jax.clear_caches()
        sync(W._quantize_and_flood(relief, mkj, fgj, 256, 32))  # warm
        best = float("inf")
        for v in variants:
            t0 = time.perf_counter()
            sync(W._quantize_and_flood(v, mkj, fgj, 256, 32))
            best = min(best, time.perf_counter() - t0)
        res[f"flood_{engine}_s"] = round(best, 4)

    # host C++ flood on identical arrays (thread-free: 1-core host)
    relief_np = np.asarray(relief)
    t0 = time.perf_counter()
    for i in range(n_fovs):
        W.watershed(relief_np[i], markers[i], fg[i])
    res["flood_host_s"] = round(time.perf_counter() - t0, 4)
    res["minimax_vs_levels"] = round(
        res["flood_levels_s"] / res["flood_minimax_s"], 2)
    res["minimax_vs_host"] = round(
        res["flood_host_s"] / res["flood_minimax_s"], 2)
    print(json.dumps(res))


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=1024)
    p.add_argument("--fovs", type=int, default=4)
    a = p.parse_args()
    main(a.size, a.fovs)
