"""Synthetic data generators for the test suite.

Follows the reference's test strategy (SURVEY.md §4): tests run against small
synthetic cohorts with *planted signal* so statistical outputs are assertable —
e.g. two cell populations placed closer together than background so enrichment
must detect it, and channel blobs aligned with cluster structure.
"""

from __future__ import annotations

import os
from typing import List, Optional, Tuple

import numpy as np
import pandas as pd

from ark_tpu import settings
from ark_tpu.io.image_utils import save_image

DEFAULT_CHANNELS = ["chan0", "chan1", "chan2", "chan3", "chan4", "chan5"]


def make_fov_names(n: int, prefix: str = "fov") -> List[str]:
    return [f"{prefix}{i}" for i in range(n)]


def make_labels_image(rng, shape=(64, 64), n_cells: int = 20,
                      radius: int = 4) -> np.ndarray:
    """Random disk-shaped cell label mask, labels 1..n_cells (0 background).

    Mirrors the reference's skimage.draw.disk synthetic label maps
    (tests/synthetic_spatial_datagen.py:89+) without skimage: disks are drawn
    with a vectorized circle mask; later disks overwrite earlier ones.
    """
    h, w = shape
    labels = np.zeros(shape, dtype=np.int32)
    yy, xx = np.mgrid[:h, :w]
    centers = np.stack([rng.integers(radius, h - radius, n_cells),
                        rng.integers(radius, w - radius, n_cells)], axis=1)
    for i, (cy, cx) in enumerate(centers, start=1):
        mask = (yy - cy) ** 2 + (xx - cx) ** 2 <= radius ** 2
        labels[mask] = i
    return labels


def make_channel_images(rng, labels: np.ndarray, channels: List[str],
                        cluster_of_cell: Optional[np.ndarray] = None,
                        noise: float = 0.05) -> np.ndarray:
    """(H, W, C) float32 channel stack where each cell's signal depends on its
    (optionally planted) cluster so clustering results are assertable."""
    h, w = labels.shape
    n_cells = labels.max()
    c = len(channels)
    if cluster_of_cell is None:
        cluster_of_cell = rng.integers(0, c, size=n_cells + 1)
    profile = np.eye(c, dtype=np.float32) * 1.0 + 0.1
    imgs = rng.uniform(0, noise, size=(h, w, c)).astype(np.float32)
    for cell in range(1, n_cells + 1):
        mask = labels == cell
        imgs[mask] += profile[cluster_of_cell[cell] % c]
    return imgs.astype(np.float32)


def create_image_cohort(base_dir: str, fovs: List[str], channels: List[str],
                        shape=(64, 64), sub_folder: str = "", seed: int = 12345,
                        n_cells: int = 20) -> dict:
    """Write a TIFF channel tree `base_dir/<fov>/<sub>/<chan>.tiff` plus
    per-FOV label masks; returns {fov: (labels, imgs)}."""
    rng = np.random.default_rng(seed)
    out = {}
    for fov in fovs:
        labels = make_labels_image(rng, shape=shape, n_cells=n_cells)
        imgs = make_channel_images(rng, labels, channels)
        fdir = os.path.join(base_dir, fov, sub_folder) if sub_folder else \
            os.path.join(base_dir, fov)
        os.makedirs(fdir, exist_ok=True)
        for ci, chan in enumerate(channels):
            save_image(os.path.join(fdir, f"{chan}.tiff"), imgs[..., ci])
        out[fov] = (labels, imgs)
    return out


def save_label_dir(base_dir: str, fov_data: dict, suffix: str = "_whole_cell"):
    """Write per-FOV label masks as `<fov><suffix>.tiff` into base_dir."""
    os.makedirs(base_dir, exist_ok=True)
    for fov, (labels, _) in fov_data.items():
        save_image(os.path.join(base_dir, f"{fov}{suffix}.tiff"),
                   labels.astype(np.int32))


def make_cell_table(n_cells: int = 300, n_markers: int = 5,
                    fovs: Optional[List[str]] = None, seed: int = 12345,
                    img_shape=(1024, 1024)) -> pd.DataFrame:
    """Synthetic cohort cell table with the reference schema
    (settings.py column contract; reference tests/test_utils.py:22-98)."""
    rng = np.random.default_rng(seed)
    fovs = fovs or make_fov_names(3)
    markers = [f"marker{i}" for i in range(n_markers)]
    fov_col = rng.choice(fovs, n_cells)
    df = pd.DataFrame({
        settings.CELL_SIZE: rng.integers(20, 200, n_cells).astype(float),
    })
    for m in markers:
        df[m] = rng.random(n_cells)
    df[settings.CELL_LABEL] = 0
    for fov in fovs:
        sel = fov_col == fov
        df.loc[sel, settings.CELL_LABEL] = np.arange(1, sel.sum() + 1)
    df[settings.FOV_ID] = fov_col
    df[settings.PATIENT_ID] = rng.integers(0, 3, n_cells)
    df[settings.CELL_TYPE] = rng.choice(["A", "B", "C"], n_cells)
    df[settings.CENTROID_0] = rng.uniform(0, img_shape[0], n_cells)
    df[settings.CENTROID_1] = rng.uniform(0, img_shape[1], n_cells)
    return df


def make_planted_proximity_centroids(rng, n_a: int = 20, n_b: int = 20,
                                     n_bg: int = 60, img_size: int = 1024,
                                     pair_dist: float = 10.0) -> Tuple[np.ndarray, np.ndarray]:
    """Centroids where population A and B are planted in close pairs while a
    background population is uniform — spatial enrichment must detect A<->B
    (pattern of reference tests/synthetic_spatial_datagen.py:8-86)."""
    n_pairs = min(n_a, n_b)
    anchors = rng.uniform(50, img_size - 50, size=(n_pairs, 2))
    a_pts = anchors
    theta = rng.uniform(0, 2 * np.pi, n_pairs)
    b_pts = anchors + pair_dist * np.stack([np.cos(theta), np.sin(theta)], axis=1)
    bg_pts = rng.uniform(0, img_size, size=(n_bg, 2))
    centroids = np.concatenate([a_pts, b_pts, bg_pts], axis=0)
    pops = np.array(["A"] * n_pairs + ["B"] * n_pairs + ["BG"] * n_bg)
    return centroids, pops
