"""Same-process A/B: minimax-relaxation flood (r4 engine) vs the r3
level-scan engine vs the host C++ priority flood, on the full Mesmer
segmentation stage (trained-checkpoint relief, dense planted cohort) —
VERDICT r3 weak #1 (the flood's area scaling).

Protocol: one process (pool variance), engines toggled via
`watershed._ENGINE` with `jax.clear_caches()` + re-warm between phases
(the flood is traced inside the fused postprocess program, so the module
flag is baked at trace time), best-of-2 per phase, value readbacks inside
`mesmer.predict` (returns numpy).

Usage: python benchmarks/r4_flood_ab.py [--size 512] [--fovs 8]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


def best_of(n, fn):
    t = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        t = min(t, time.perf_counter() - t0)
    return t


def main(size=512, n_fovs=8):
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                     ".xla_cache"))
    from ark_tpu.ops import watershed as W
    from ark_tpu.segmentation import mesmer, synthetic

    ckpt = os.path.join(os.path.dirname(mesmer.__file__), "..", "models",
                        "checkpoints", "mesmer_mini_synthetic.npz")
    rng = np.random.default_rng(0)
    fovs, truth, _ = synthetic.synthetic_cells(
        rng, n_fovs, hw=size, n_cells=(250, 300), crowding=0.35)
    app = mesmer.Mesmer(weights_path=ckpt)

    def run(post):
        out = []
        for i in range(0, n_fovs, 2):
            out.append(app.predict(fovs[i:i + 2], postprocess=post))
        return out

    res = {"fov": size, "n_fovs": n_fovs}
    run("host")
    res["host_s"] = round(best_of(2, lambda: run("host")), 3)
    h = run("host")

    for engine in ("levels", "minimax"):
        W._ENGINE = engine
        jax.clear_caches()
        run("device")  # warm/compile
        res[f"device_{engine}_s"] = round(best_of(2, lambda: run("device")),
                                          3)
        d = run("device")
        agree = np.mean([
            float((hb["whole_cell"] == db["whole_cell"])
                  [hb["whole_cell"] > 0].mean())
            for hb, db in zip(h, d)])
        res[f"device_{engine}_agree"] = round(float(agree), 4)
    res["minimax_vs_levels"] = round(
        res["device_levels_s"] / res["device_minimax_s"], 2)
    res["minimax_vs_host"] = round(
        res["host_s"] / res["device_minimax_s"], 2)
    print(json.dumps(res))


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--fovs", type=int, default=8)
    a = p.parse_args()
    main(a.size, a.fovs)
