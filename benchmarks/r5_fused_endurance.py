"""At-scale measurement of the fused single-sweep pixel stage (r5,
VERDICT-r4 weak #1 "done" criterion): 100 FOVs of 1024^2 x 16 channels,
the shape the r4 endurance run measured the multi-pass stage at
(ENDURANCE_r04.json: pixel_stage_s=3577, ~35.8 s/FOV).

This runs ONLY the pixel stage (the other endurance stages are unchanged
since r4) through `pixie_fused.run_pixel_clustering` on a freshly built
synthetic cohort of the same shape, and reports the fused wall next to
the recorded r4 multi-pass number. The comparison is cross-run (different
day, different pool window) — the honest guard is that the multi-pass
number was itself measured cold at this exact shape, host IO dominates
both paths (CLAUDE.md trap #0 doesn't apply: every FOV's result is
forced to disk/feather before the clock stops), and the small-cohort
controlled ABBA (benchmarks/r5_fused_ab.py, 1.77x) rules out a
pool-window artifact for the mechanism.

A 1-FOV warmup in a separate dir populates the persistent XLA cache so
the timed run pays no remote compiles (same protocol as r5_fused_ab).

Usage: python benchmarks/r5_fused_endurance.py [--fovs 100] [--size 1024]
       [--out ENDURANCE_r05_pixel.json]
"""

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from r4_kernel_bench import _setup_cache  # noqa: E402
from r4_pixel_stage_profile import CHANNELS, build_cohort  # noqa: E402
from r5_fused_ab import _run_fused  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fovs", type=int, default=100)
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--base", default=None,
                    help="cohort dir (kept if given; default: tmp, removed)")
    ap.add_argument("--out", default=os.path.join(REPO,
                                                  "ENDURANCE_r05_pixel.json"))
    args = ap.parse_args()

    _setup_cache()
    from bench import _probe_attach
    err = _probe_attach()
    if err:
        print(json.dumps({"error": err}))
        return 1

    res = {"n_fovs": args.fovs, "size": args.size,
           "date": time.strftime("%Y-%m-%d %H:%M")}

    # warmup: compile-cache population on a 1-FOV throwaway cohort
    warm = tempfile.mkdtemp(prefix="fused_end_warm_")
    try:
        build_cohort(warm, ["fov0"], args.size, np.random.default_rng(7))
        os.makedirs(os.path.join(warm, "pixel_output_dir"), exist_ok=True)
        t0 = time.perf_counter()
        _run_fused(warm, ["fov0"])
        res["warmup_s"] = round(time.perf_counter() - t0, 1)
    finally:
        shutil.rmtree(warm, ignore_errors=True)

    base = args.base or tempfile.mkdtemp(prefix="fused_end_")
    fovs = [f"fov{i}" for i in range(args.fovs)]
    try:
        img_dir = os.path.join(base, "image_data")
        have_all = all(os.path.isdir(os.path.join(img_dir, f))
                       for f in fovs)
        if have_all:
            res["cohort_build_s"] = 0.0  # reusing a pre-built cohort
        else:
            t0 = time.perf_counter()
            build_cohort(base, fovs, args.size, np.random.default_rng(0))
            res["cohort_build_s"] = round(time.perf_counter() - t0, 1)
        # the fused driver resumes from existing artifacts — clear any
        # partial stage outputs so the timed run does the full work
        for sub in ("pixel_output_dir", "pixel_mat_data",
                    "pixel_mat_subsetted"):
            shutil.rmtree(os.path.join(base, sub), ignore_errors=True)
        os.makedirs(os.path.join(base, "pixel_output_dir"), exist_ok=True)

        timings = {}
        t0 = time.perf_counter()
        _run_fused(base, fovs, timings=timings)
        res["fused_pixel_stage_s"] = round(time.perf_counter() - t0, 1)
        res["fused_s_per_fov"] = round(
            res["fused_pixel_stage_s"] / args.fovs, 2)
        res["phase_timings_s"] = {k: round(v, 1)
                                  for k, v in sorted(timings.items())}
    finally:
        if args.base is None:
            shutil.rmtree(base, ignore_errors=True)

    r4_path = os.path.join(REPO, "ENDURANCE_r04.json")
    if os.path.exists(r4_path):
        with open(r4_path) as f:
            r4 = json.load(f)
        ref = r4.get("pixel_stage_s")
        if ref and r4.get("n_fovs") == args.fovs:
            res["r4_multipass_pixel_stage_s"] = ref
            res["speedup_vs_r4_multipass"] = round(
                ref / res["fused_pixel_stage_s"], 2)

    print(json.dumps(res))
    with open(args.out, "w") as f:
        json.dump(res, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
