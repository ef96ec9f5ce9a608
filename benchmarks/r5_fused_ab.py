"""A/B: fused single-sweep pixel stage vs the multi-pass pipeline (r5).

Same synthetic cohort content (identical rng stream) in two separate base
dirs; each path runs its full template-2 stage (preprocess → SOM train →
assign → som avgs → consensus → meta avgs) end to end, wall-clocked with
``time.perf_counter``. Wall clock is the honest metric here — the stage is
host-IO + transfer dominated, and every device result is materialized to
disk before the clock stops, so no attach-barrier subtleties apply
(CLAUDE.md trap #0 concerns in-flight device work, which file writes
force to completion via readback).

A 1-FOV warmup run of BOTH paths (separate dirs) populates the XLA
compile cache first so neither timed run pays remote compiles.

Usage: python benchmarks/r5_fused_ab.py [--n 4] [--size 1024]
"""

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
from r4_kernel_bench import _setup_cache  # noqa: E402
from r4_pixel_stage_profile import CHANNELS, build_cohort  # noqa: E402


def _run_multipass(base, fovs, timings=None):
    from ark_tpu.phenotyping import (pixel_meta_clustering,
                                     pixel_som_clustering,
                                     pixie_preprocessing)
    if timings is None:
        timings = {}
    seg_dir = os.path.join(base, "segmentation", "deepcell_output")
    t0 = time.perf_counter()
    pixie_preprocessing.create_pixel_matrix(
        fovs, CHANNELS, base, os.path.join(base, "image_data"), seg_dir,
        img_sub_folder=None, seg_suffix="_whole_cell.tiff",
        pixel_output_dir="pixel_output_dir", blur_factor=2,
        subset_proportion=0.1, seed=42)
    timings["preprocess_s"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    pysom = pixel_som_clustering.train_pixel_som(
        fovs, CHANNELS, base,
        norm_vals_name="channel_norm_post_rownorm.feather", seed=42)
    timings["som_train_s"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    pixel_som_clustering.cluster_pixels(fovs, base, pysom)
    timings["som_assign_s"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    pixel_som_clustering.generate_som_avg_files(
        fovs, CHANNELS, base, pysom, data_dir="pixel_mat_data")
    pixel_cc = pixel_meta_clustering.pixel_consensus_cluster(
        fovs, CHANNELS, base, max_k=8, seed=42)
    pixel_meta_clustering.generate_meta_avg_files(
        fovs, CHANNELS, base, pixel_cc, data_dir="pixel_mat_data")
    timings["avg_consensus_meta_s"] = round(time.perf_counter() - t0, 2)


def _run_fused(base, fovs, timings=None):
    from ark_tpu.phenotyping import pixie_fused
    seg_dir = os.path.join(base, "segmentation", "deepcell_output")
    pixie_fused.run_pixel_clustering(
        fovs, CHANNELS, base, os.path.join(base, "image_data"),
        seg_dir=seg_dir, img_sub_folder=None,
        seg_suffix="_whole_cell.tiff", blur_factor=2,
        subset_proportion=0.1, seed=42, max_k=8, timings=timings)


def _prep_base(size, fovs, tag):
    rng = np.random.default_rng(0)  # same stream -> same cohort content
    base = tempfile.mkdtemp(prefix=f"fused_ab_{tag}_")
    build_cohort(base, fovs, size, rng)
    os.makedirs(os.path.join(base, "pixel_output_dir"), exist_ok=True)
    return base


def main(n_fovs=4, size=1024, order="abba"):
    _setup_cache()
    out = {"n_fovs": n_fovs, "size": size, "order": order}
    fovs = [f"fov{i}" for i in range(n_fovs)]

    # compile warmup, both paths, 1 tiny-cohort FOV each at the timed size
    for tag, runner in (("wm", _run_multipass), ("wf", _run_fused)):
        base = _prep_base(size, ["fov0"], tag)
        try:
            runner(base, ["fov0"])
        finally:
            shutil.rmtree(base, ignore_errors=True)

    # ABBA arm order: each arm gets one early and one late slot, so slow
    # window drift on the relay attach (3-6x pool variance, CLAUDE.md) hits
    # both arms symmetrically; per-arm BEST is the compared statistic.
    results = {"multipass": [], "fused": []}
    arms = {"multipass": _run_multipass, "fused": _run_fused}
    plan = {"abba": ["multipass", "fused", "fused", "multipass"],
            "ab": ["multipass", "fused"],     # one pair (at-scale runs)
            "ba": ["fused", "multipass"]}[order]
    for rep, tag in enumerate(plan):
        runner = arms[tag]
        base = _prep_base(size, fovs, f"{tag}{rep}")
        phase = {}
        try:
            t0 = time.perf_counter()
            runner(base, fovs, timings=phase)
            results[tag].append(time.perf_counter() - t0)
        finally:
            shutil.rmtree(base, ignore_errors=True)
        out[f"{tag}_phases_{rep}"] = phase
    mp = min(results["multipass"])
    fu = min(results["fused"])
    out["multipass_runs_s"] = [round(v, 1) for v in results["multipass"]]
    out["fused_runs_s"] = [round(v, 1) for v in results["fused"]]
    out["multipass_s"] = round(mp, 1)
    out["fused_s"] = round(fu, 1)
    out["multipass_s_per_fov"] = round(mp / n_fovs, 2)
    out["fused_s_per_fov"] = round(fu / n_fovs, 2)
    out["speedup"] = round(mp / fu, 2)
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=4)
    p.add_argument("--size", type=int, default=1024)
    p.add_argument("--order", choices=("abba", "ab", "ba"), default="abba")
    a = p.parse_args()
    main(n_fovs=a.n, size=a.size, order=a.order)
