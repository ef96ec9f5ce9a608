"""Batched device convex-hull rasterizer: exact parity with the host
scipy path (reference semantics: skimage convex_image,
`regionprops_extraction.py:60-143`), plus the batched concavity counter."""

import numpy as np
import pytest

from ark_tpu.ops import convex
from ark_tpu.segmentation import synthetic


def _cell_grid(rng, n_tiles=64, tile_hw=64, grid=8):
    """Label image with planted elliptical cells in a tile grid."""
    lab = np.zeros((grid * tile_hw, grid * tile_hw), np.int32)
    nxt = 0
    for t in range(n_tiles):
        r, c = divmod(t, grid)
        _, cl, _ = synthetic.synthetic_cells(rng, 1, hw=tile_hw)
        m = cl[0] > 0
        lab[r * tile_hw:(r + 1) * tile_hw,
            c * tile_hw:(c + 1) * tile_hw][m] = cl[0][m] + nxt
        nxt += int(cl[0].max())
    ids = np.unique(lab)
    return lab, ids[ids > 0]


def test_device_hull_matches_host_scipy(rng):
    lab, ids = _cell_grid(rng)
    host = convex.convex_features(lab, ids, impl="host")
    dev = convex.convex_features(lab, ids)
    np.testing.assert_array_equal(host["convex_area"], dev["convex_area"])
    np.testing.assert_allclose(host["convex_centroid"],
                               dev["convex_centroid"], rtol=1e-5)
    for hm, dm in zip(host["masks"], dev["masks"]):
        np.testing.assert_array_equal(hm[0], dm[0])   # mask crop
        np.testing.assert_array_equal(hm[1], dm[1])   # hull raster
        assert hm[2] == dm[2]                          # origin


def test_device_hull_without_masks(rng):
    lab, ids = _cell_grid(rng, n_tiles=16, grid=4)
    full = convex.convex_features(lab, ids)
    nm = convex.convex_features(lab, ids, with_masks=False)
    np.testing.assert_array_equal(full["convex_area"], nm["convex_area"])
    np.testing.assert_array_equal(full["convex_centroid"],
                                  nm["convex_centroid"])
    assert all(m is None for m in nm["masks"])


def test_device_hull_absent_and_subset_ids(rng):
    lab, ids = _cell_grid(rng, n_tiles=4, grid=2)
    subset = np.concatenate([ids[:3], [99999], ids[5:8]])
    dev = convex.convex_features(lab, subset)
    host = convex.convex_features(lab, subset, impl="host")
    np.testing.assert_array_equal(host["convex_area"], dev["convex_area"])
    assert dev["convex_area"][3] == 0.0 and dev["masks"][3] is None


def test_device_hull_degenerate_cells():
    lab = np.zeros((8, 8), np.int32)
    lab[2, 2] = 1                       # single pixel
    lab[4, 1:4] = 2                     # horizontal line
    lab[1:4, 6] = 3                     # vertical line
    dev = convex.convex_features(lab, np.array([1, 2, 3]))
    host = convex.convex_features(lab, np.array([1, 2, 3]), impl="host")
    np.testing.assert_array_equal(host["convex_area"], dev["convex_area"])
    assert dev["convex_area"].tolist() == [1.0, 3.0, 3.0]


def test_count_concavities_batch_matches_per_cell(rng):
    # crescents and L-shapes: cells WITH concavities
    lab = np.zeros((256, 256), np.int32)
    yy, xx = np.mgrid[0:40, 0:40]
    nid = 0
    for gy in range(6):
        for gx in range(6):
            r = rng.uniform(10, 16)
            d = np.sqrt((yy - 20) ** 2 + (xx - 20) ** 2)
            cell = d <= r
            if rng.random() < 0.5:
                d2 = np.sqrt((yy - 20 - rng.uniform(3, 8)) ** 2
                             + (xx - 20 - rng.uniform(0, 6)) ** 2)
                cell &= d2 > r * 0.75
            else:
                cell &= ~((yy > 20) & (xx > 20))
            if cell.sum() < 20:
                continue
            nid += 1
            lab[gy * 42:gy * 42 + 40, gx * 42:gx * 42 + 40][cell] = nid
    ids = np.arange(1, nid + 1)
    feats = convex.convex_features(lab, ids)
    batch = convex.count_concavities_batch(feats["masks"])
    per_cell = np.array([convex.count_concavities(m[0], m[1]) if m else 0
                         for m in feats["masks"]])
    np.testing.assert_array_equal(batch, per_cell)
    assert batch.sum() > 0


def test_count_concavities_batch_empty():
    assert convex.count_concavities_batch([None, None]).tolist() == [0, 0]
    # convex cells -> no concavities
    lab = np.zeros((16, 16), np.int32)
    lab[2:8, 2:8] = 1
    feats = convex.convex_features(lab, np.array([1]))
    assert convex.count_concavities_batch(feats["masks"]).tolist() == [0.0]
