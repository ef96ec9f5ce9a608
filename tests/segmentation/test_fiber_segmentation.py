import os

import numpy as np
import pandas as pd
import pytest

from ark_tpu.io.image_utils import save_image
from ark_tpu.ops import classical
from ark_tpu.segmentation import fiber_segmentation


def _fiber_image(rng, shape=(128, 128), n_fibers=6):
    """Synthetic image with bright elongated fibers at random angles."""
    img = rng.uniform(0, 0.05, shape).astype(np.float32)
    yy, xx = np.mgrid[:shape[0], :shape[1]]
    for _ in range(n_fibers):
        cy, cx = rng.uniform(20, shape[0] - 20, 2)
        theta = rng.uniform(0, np.pi)
        d = np.abs((yy - cy) * np.cos(theta) - (xx - cx) * np.sin(theta))
        along = np.abs((yy - cy) * np.sin(theta) + (xx - cx) * np.cos(theta))
        img[(d < 1.5) & (along < 25)] += 1.0
    return img


def test_multi_otsu_separates_modes(rng):
    data = np.concatenate([rng.normal(0, .5, 4000),
                           rng.normal(5, .5, 4000),
                           rng.normal(10, .5, 4000)])
    t = classical.multi_otsu(data, classes=3)
    assert len(t) == 2
    assert 0.5 < t[0] < 4.5
    assert 5.5 < t[1] < 9.5


def test_equalize_adapthist_properties(rng):
    img = rng.random((64, 64)) ** 3   # skewed histogram
    out = classical.equalize_adapthist(img, kernel_size=16)
    assert out.shape == img.shape
    assert 0 <= out.min() and out.max() <= 1
    # output should be closer to uniform: higher entropy of histogram
    h_in, _ = np.histogram(img, bins=32, range=(0, 1), density=True)
    h_out, _ = np.histogram(out, bins=32, range=(0, 1), density=True)

    def ent(h):
        p = h / h.sum()
        p = p[p > 0]
        return -(p * np.log(p)).sum()
    assert ent(h_out) > ent(h_in)


def test_frangi_highlights_ridges(rng):
    img = _fiber_image(rng, n_fibers=3)
    resp = classical.frangi(img, sigmas=[1, 2, 3], gamma=0.5)
    fiber_mask = img > 0.5
    bg_mask = img < 0.1
    assert resp[fiber_mask].mean() > 5 * max(resp[bg_mask].mean(), 1e-9)


def test_sobel_edges(rng):
    img = np.zeros((32, 32), np.float32)
    img[:, 16:] = 1.0
    grad = np.asarray(classical.sobel(img))
    assert grad[:, 15:17].mean() > 10 * grad[:, 5].mean()


def test_segment_fibers_end_to_end(rng, tmp_path):
    fovs = ["fov0", "fov1"]
    data_dir = tmp_path / "imgs"
    out_dir = tmp_path / "fiberseg"
    out_dir.mkdir()
    for fov in fovs:
        fdir = data_dir / fov
        fdir.mkdir(parents=True)
        save_image(str(fdir / "Collagen1.tiff"), _fiber_image(rng))
    # contrast_scaling_divisor=16 keeps CLAHE tiles 8px on 128px test images
    # (the 128 default targets 1024px cohort FOVs)
    table = fiber_segmentation.run_fiber_segmentation(
        str(data_dir), "Collagen1", str(out_dir),
        contrast_scaling_divisor=16)
    assert len(table) > 0
    assert {"fov", "label", "centroid-0", "centroid-1", "major_axis_length",
            "alignment_score", "area", "eccentricity",
            "euler_number"}.issubset(table.columns)
    # fibers should be elongated on average
    ratios = table["major_axis_length"] / np.maximum(
        table["minor_axis_length"], 1e-9)
    assert ratios.median() > 1.5
    for fov in fovs:
        assert os.path.exists(str(out_dir / f"{fov}_fiber_labels.tiff"))

    # summary stats
    fov_stats, tile_stats = fiber_segmentation.generate_summary_stats(
        table, str(out_dir), tile_length=64, min_fiber_num=1)
    assert len(fov_stats) == 2
    assert {"pixel_density", "fiber_density"}.issubset(fov_stats.columns)
    assert len(tile_stats) == 2 * 4  # 128/64 = 2x2 tiles per fov


def test_all_foreground_ridge_mask_warns_and_returns_empty(rng):
    """A FOV whose frangi response exceeds ridge_cutoff everywhere has no
    fiber/background boundaries: the step chain must warn and return an
    empty segmentation, not propagate inf thresholds silently."""
    img = rng.random((64, 64)).astype(np.float32) + 1.0
    with pytest.warns(UserWarning, match="covers the entire FOV"):
        steps = fiber_segmentation._fiber_steps(
            img, 64, blur=2, contrast_scaling_divisor=128,
            fiber_widths=range(1, 10, 2), ridge_cutoff=-1.0, sobel_blur=1,
            min_fiber_size=15)
    assert np.isfinite(steps["distance_transformed"]).all()
    assert (steps["labeled_filtered"] == 0).all()


def test_plot_fiber_segmentation_steps(rng, tmp_path):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fdir = tmp_path / "imgs" / "fov0"
    fdir.mkdir(parents=True)
    save_image(str(fdir / "Collagen1.tiff"), _fiber_image(rng))
    fiber_segmentation.plot_fiber_segmentation_steps(
        str(tmp_path / "imgs"), "fov0", "Collagen1",
        contrast_scaling_divisor=16)
    assert len(plt.get_fignums()) >= 1
    plt.close("all")
