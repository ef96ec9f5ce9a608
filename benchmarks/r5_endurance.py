"""Round-5 full-pipeline endurance run: the r4 protocol (100×1024²×16
through segment → pixel → cell → spatial on the real chip, mid-run
SIGKILL + resume) rerun with this round's engines picked up through the
SAME template entry points — fused single-sweep pixel stage (template-2
default), shape-bucketed + pipelined spatial stage, and per-FOV
cell-table checkpointing (templates/1_segment_image_data.py:50-58).

Two additions over benchmarks/r4_endurance.py (which this wraps):

1. After the pipeline completes, template 1 is rerun in a fresh
   subprocess and timed. In r4 this rerun redid the entire cell-table
   quantification (~716 s at 100 FOVs — VERDICT-r4 weak #3); with the
   per-FOV parts checkpoint it must now only re-read parts + concat
   (the "redoes ~0 s" done-criterion, recorded as `quant_rerun_s`).
2. The r4 stage walls are recorded alongside for the round-over-round
   comparison (cross-run caveat as in r5_fused_endurance.py: host IO
   dominates every stage being compared, and the fused-pixel mechanism
   is separately certified by a controlled ABBA).

Usage: python benchmarks/r5_endurance.py [--fovs 100] [--size 1024]
       [--out ENDURANCE_r05.json]
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import r4_endurance  # noqa: E402

R4 = {"cohort_build_s": 292.7, "segment_wall_s": 1331.1,
      "pixel_stage_s": 3577.0, "cell_stage_s": 39.8,
      "spatial_stage_s": 444.9, "total_pipeline_s": 5392.8}


def rerun_template1(base):
    """Template 1 again, everything already on disk: segmentation masks
    detected per FOV, cell-table parts all checkpointed. Wall time is the
    resume bill a crashed-after-completion rerun pays."""
    code = (
        "import sys; sys.path[:0] = [{repo!r}, {tpl!r}];\n"
        "mod = __import__('1_segment_image_data');\n"
        "mod.main({base!r}, {nuc!r}, {mem!r}, weights_path={ckpt!r})\n"
    ).format(repo=REPO, tpl=os.path.join(REPO, "templates"), base=base,
             nuc=r4_endurance.NUC, mem=r4_endurance.MEM,
             ckpt=r4_endurance.CKPT)
    t0 = time.perf_counter()
    r = subprocess.run([sys.executable, "-c", code])
    wall = time.perf_counter() - t0
    assert r.returncode == 0, "template-1 rerun failed"
    return round(wall, 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fovs", type=int, default=100)
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--base", default="/tmp/ark_endurance_r5")
    ap.add_argument("--keep", action="store_true")
    ap.add_argument("--kill_after", type=int, default=600)
    ap.add_argument("--out", default=os.path.join(REPO,
                                                  "ENDURANCE_r05.json"))
    a = ap.parse_args()

    res = r4_endurance.main(a.fovs, a.size, a.base, fresh=not a.keep,
                            kill_after=a.kill_after)
    res["quant_rerun_s"] = rerun_template1(a.base)
    res["r4_reference"] = R4
    if a.fovs == 100 and a.size == 1024:
        res["speedup_vs_r4_total"] = round(
            R4["total_pipeline_s"] / res["total_pipeline_s"], 2)
    res["date"] = time.strftime("%Y-%m-%d %H:%M")
    with open(a.out, "w") as f:
        json.dump(res, f, indent=1)
    print(json.dumps(res))
    return 0


if __name__ == "__main__":
    sys.exit(main())
