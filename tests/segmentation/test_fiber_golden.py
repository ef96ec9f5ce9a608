"""Planted-signal goldens for the fiber pipeline's statistics (reference
`fiber_segmentation.py:197-573`): aligned planted fibers must score better
(lower) than randomly oriented ones, densities must match hand counts, and
tile statistics must localize the planted structures."""

import numpy as np
import pandas as pd
import pytest

from ark_tpu.segmentation import fiber_segmentation as fs


def _fiber_table(fov, centroids, orientations, major=20.0, minor=2.0):
    rows = []
    for i, (c, o) in enumerate(zip(centroids, orientations), start=1):
        rows.append({"fov": fov, "label": i, "centroid-0": float(c[0]),
                     "centroid-1": float(c[1]), "orientation": float(o),
                     "major_axis_length": major, "minor_axis_length": minor,
                     "area": major * minor, "eccentricity": 0.99,
                     "euler_number": 1})
    return pd.DataFrame(rows)


def test_alignment_score_detects_planted_alignment(rng):
    """Parallel planted fibers -> near-zero alignment score; random
    orientations -> larger (the score is an RMS angular deviation)."""
    centroids = rng.uniform(0, 200, size=(30, 2))
    aligned = _fiber_table("fovA", centroids, np.full(30, 0.7))
    chaotic = _fiber_table("fovB", centroids,
                           rng.uniform(-np.pi / 2, np.pi / 2, 30))
    table = pd.concat([aligned, chaotic], ignore_index=True)
    out = fs.calculate_fiber_alignment(table, k=4)
    a = out[out.fov == "fovA"]["alignment_score"]
    b = out[out.fov == "fovB"]["alignment_score"]
    assert a.max() < 1e-9                 # identical orientations
    assert b.mean() > 0.1                 # chaotic scores are clearly larger


def test_alignment_axis_threshold_filters_round_objects(rng):
    centroids = rng.uniform(0, 100, size=(10, 2))
    table = _fiber_table("f", centroids, np.zeros(10))
    table.loc[:4, "minor_axis_length"] = 15.0   # not elongated (ratio < 2)
    out = fs.calculate_fiber_alignment(table, k=3, axis_thresh=2)
    assert out.loc[:4, "alignment_score"].isna().all()
    assert out.loc[5:, "alignment_score"].notna().all()


def test_alignment_no_elongated_fibers_all_nan(rng):
    table = _fiber_table("f", rng.uniform(0, 50, (5, 2)), np.zeros(5),
                         major=4.0, minor=3.0)
    out = fs.calculate_fiber_alignment(table, axis_thresh=2)
    assert out["alignment_score"].isna().all()


def test_calculate_density_golden():
    table = _fiber_table("f", [(5, 5), (20, 20), (40, 40)], [0, 0, 0],
                         major=10, minor=2)
    pixel_density, fiber_density = fs.calculate_density(table,
                                                        total_pixels=10000)
    assert fiber_density == pytest.approx(3 / 10000 * 100)
    assert pixel_density == pytest.approx(3 * 20 / 10000 * 100)


def test_generate_tile_stats_localizes_planted_fibers(tmp_path, rng):
    """Fibers planted only in the top-left tile: that tile gets finite
    density/alignment, the others NaN."""
    n = 8
    centroids = rng.uniform(5, 30, size=(n, 2))     # all within tile (0, 0)
    table = _fiber_table("fovT", centroids, np.full(n, 0.3))
    table = fs.calculate_fiber_alignment(table, k=3)
    img = np.zeros((64, 64), np.int32)
    img[5:30, 5:30] = 1
    stats = fs.generate_tile_stats(table, img, fov_length=64, tile_length=32,
                                   min_fiber_num=5,
                                   save_dir=str(tmp_path), save_tiles=True)
    assert len(stats) == 4
    tl = stats[(stats.tile_y == 0) & (stats.tile_x == 0)].iloc[0]
    assert np.isfinite(tl["pixel_density"]) and tl["fiber_density"] > 0
    assert tl["avg_alignment_score"] == pytest.approx(0.0, abs=1e-9)
    assert tl["avg_major_axis_length"] == pytest.approx(20.0)
    others = stats[(stats.tile_y != 0) | (stats.tile_x != 0)]
    assert others["pixel_density"].isna().all()
    # tile images written
    import os
    assert os.path.exists(tmp_path / "fovT" / "tile_0,0.tiff")


def test_generate_summary_stats_files(tmp_path, rng):
    import os

    from ark_tpu.io.image_utils import save_image

    centroids = rng.uniform(0, 60, size=(12, 2))
    table = _fiber_table("fovS", centroids,
                         rng.uniform(-1, 1, 12))
    table = fs.calculate_fiber_alignment(table, k=3)
    labels = np.zeros((64, 64), np.int32)
    labels[10:20, 10:40] = 1
    save_image(str(tmp_path / "fovS_fiber_labels.tiff"), labels)

    fov_stats, tile_stats = fs.generate_summary_stats(
        table, str(tmp_path), tile_length=32, min_fiber_num=2)
    assert os.path.exists(tmp_path / "fiber_stats_table.csv")
    assert os.path.exists(tmp_path / "tile_stats_32"
                          / "fiber_stats_table-tile_32.csv")
    fov_row = fov_stats.iloc[0]
    assert np.isfinite(fov_row["pixel_density"])
    # fov density golden: 12 fibers x 20 px over 64^2
    assert fov_row["fiber_density"] == pytest.approx(12 / 64 ** 2 * 100)
    assert len(tile_stats) == 4
    # tile_length must divide 1024
    with pytest.raises(ValueError, match="factor"):
        fs.generate_summary_stats(table, str(tmp_path), tile_length=33)
