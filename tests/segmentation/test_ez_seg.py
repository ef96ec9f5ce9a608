import os

import numpy as np
import pandas as pd
import pytest

from ark_tpu.io.image_utils import read_image, save_image
from ark_tpu.ops import morphology
from ark_tpu.segmentation.ez_seg import (composites, ez_object_segmentation,
                                         ez_seg_utils, merge_masks)

from tests import test_utils


def test_remove_small_holes():
    mask = np.ones((20, 20), bool)
    mask[5:7, 5:7] = False     # small hole (4 px)
    mask[10:16, 10:16] = False  # big hole (36 px)
    out = morphology.remove_small_holes(mask, area_threshold=10)
    assert out[5:7, 5:7].all()
    assert not out[10:16, 10:16].any()


def test_composite_builder(rng, tmp_path):
    fovs = ["fov0"]
    chans = ["a", "b", "c"]
    data_dir = tmp_path / "imgs"
    data = test_utils.create_image_cohort(str(data_dir), fovs, chans,
                                          shape=(32, 32))
    out = composites.composite_builder(
        str(data_dir), None, fovs, images_to_add=["a", "b"],
        images_to_subtract=["c"], image_type="signal",
        composite_method="total")
    imgs = data["fov0"][1]
    expected = np.clip(imgs[..., 0] + imgs[..., 1] - imgs[..., 2], 0, None)
    np.testing.assert_allclose(out["fov0"], expected, rtol=1e-5)
    # save path + log variant
    comp_dir = tmp_path / "composites"
    comp_dir.mkdir()
    log_dir = tmp_path / "logs"
    log_dir.mkdir()
    composites.composite_builder(
        str(data_dir), None, fovs, ["a"], [], "signal", "binary",
        composite_directory=str(comp_dir), composite_name="comp1",
        log_dir=str(log_dir))
    assert os.path.exists(str(comp_dir / "fov0" / "comp1.tiff"))
    assert os.path.exists(str(log_dir / "comp1_composite_log.txt"))


def test_create_object_masks(rng, tmp_path):
    # image with two bright blobs
    img = rng.uniform(0, 0.05, (64, 64)).astype(np.float32)
    yy, xx = np.mgrid[:64, :64]
    img[(yy - 20) ** 2 + (xx - 20) ** 2 <= 64] += 5.0
    img[(yy - 45) ** 2 + (xx - 45) ** 2 <= 100] += 5.0
    fdir = tmp_path / "imgs" / "fov0"
    fdir.mkdir(parents=True)
    save_image(str(fdir / "plaque.tiff"), img)
    masks_dir = tmp_path / "masks"
    masks_dir.mkdir()
    log_dir = tmp_path / "logs"
    log_dir.mkdir()
    ez_object_segmentation.create_object_masks(
        str(tmp_path / "imgs"), None, ["fov0"], "plaque_mask", "plaque",
        str(masks_dir), str(log_dir), object_shape_type="blob", sigma=1,
        thresh=90, hole_size=None, min_object_area=50, max_object_area=5000)
    mask = read_image(str(masks_dir / "fov0_plaque_mask.tiff"))
    ids = np.unique(mask)
    assert len(ids[ids > 0]) == 2
    assert mask[20, 20] > 0 and mask[45, 45] > 0
    assert os.path.exists(str(log_dir / "plaque_mask_segmentation_log.txt"))


def test_merge_masks_single(tmp_path):
    # object overlapping one cell heavily, another slightly
    object_mask = np.zeros((40, 40), np.int32)
    object_mask[10:20, 10:20] = 1
    cell_mask = np.zeros((40, 40), np.int32)
    cell_mask[12:18, 12:18] = 1    # fully inside object
    cell_mask[19:25, 19:25] = 2    # 1px overlap corner
    cell_mask[30:36, 30:36] = 3    # no overlap
    out = merge_masks.merge_masks_single(
        object_mask, cell_mask, overlap_thresh=50, object_name="obj.tiff",
        mask_save_path=str(tmp_path), expansion_factor=10)
    merged = read_image(str(tmp_path / "obj_merged.tiff"))
    # the fully-contained cell is merged into the object
    assert merged[14, 14] == merged[12, 12] > 0
    # remaining cells keep the non-merged ones only
    assert (out[12:18, 12:18] == 0).all()
    assert out[32, 32] > 0


def test_renumber_masks(tmp_path):
    m1 = np.zeros((10, 10), np.int32)
    m1[2:4, 2:4] = 1
    m2 = np.zeros((10, 10), np.int32)
    m2[5:7, 5:7] = 1
    save_image(str(tmp_path / "a.tiff"), m1)
    save_image(str(tmp_path / "b.tiff"), m2)
    ez_seg_utils.renumber_masks(str(tmp_path))
    a = read_image(str(tmp_path / "a.tiff"))
    b = read_image(str(tmp_path / "b.tiff"))
    la, lb = a.max(), b.max()
    assert la != lb and la > 1 and lb > 1


def test_filter_csvs_by_mask(tmp_path):
    df = pd.DataFrame({"x": [1, 2, 3, 4],
                       "mask_type": ["whole_cell", "plaque", "whole_cell",
                                     "plaque"]})
    df.to_csv(tmp_path / "table_size_normalized.csv", index=False)
    ez_seg_utils.filter_csvs_by_mask(str(tmp_path), "table")
    out = pd.read_csv(tmp_path / "filtered_plaque_size_normalized.csv")
    assert (out["mask_type"] == "plaque").all()


def test_ez_seg_display(rng, tmp_path):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from ark_tpu.segmentation.ez_seg import ez_seg_display

    fov = "fov0"
    img_dir = tmp_path / "imgs"
    (img_dir / fov).mkdir(parents=True)
    save_image(str(img_dir / fov / "chan.tiff"),
               (rng.random((32, 32)) * 255).astype(np.float32))

    obj_dir = tmp_path / "objs"
    cell_dir = tmp_path / "cells"
    merged_dir = tmp_path / "merged"
    for d in (obj_dir, cell_dir, merged_dir):
        d.mkdir()
    obj = np.zeros((32, 32), np.int32)
    obj[4:12, 4:12] = 1
    cell = np.zeros((32, 32), np.int32)
    cell[18:26, 18:26] = 1
    merged = obj + 2 * cell
    save_image(str(obj_dir / f"{fov}_plaque.tiff"), obj)
    save_image(str(cell_dir / f"{fov}_whole_cell.tiff"), cell)
    save_image(str(merged_dir / f"{fov}_plaque_merged.tiff"), merged)

    ez_seg_display.display_channel_image(str(img_dir), None, fov, "chan")
    ez_seg_display.overlay_mask_outlines(
        fov, "chan", str(img_dir), None, "plaque", str(obj_dir))
    visual = ez_seg_display.create_overlap_and_merge_visual(
        fov, "plaque", str(obj_dir), str(cell_dir), "whole_cell",
        str(merged_dir))
    assert visual.shape == (32, 32, 3)
    assert (visual[6, 6] == (225, 0, 0)).all()     # object interior red
    assert (visual[22, 22, 2] == 255)              # cell interior blue
    assert (visual[..., 1] == 255).any()           # merged edges green
    ez_seg_display.multiple_mask_display(
        fov, "plaque", str(obj_dir), str(cell_dir), "whole_cell",
        str(merged_dir))
    plt.close("all")


def test_renumber_masks_with_noncontiguous_labels(tmp_path):
    """Non-contiguous ids (the ez_seg norm after area filtering/merging):
    a new id equal to a still-pending original label must NOT merge two
    objects (the reference's in-place relabel does exactly that)."""
    from ark_tpu.io.image_utils import read_image, save_image
    mdir = tmp_path / "masks"
    mdir.mkdir()
    img = np.zeros((10, 10), np.int32)
    img[0:2, 0:2] = 1
    img[0:2, 5:7] = 2
    img[5:7, 0:2] = 3
    img[5:7, 5:7] = 7          # gap: label value exceeds the label count
    save_image(str(mdir / "fovA_obj.tiff"), img)
    ez_seg_utils.renumber_masks(str(mdir))
    out = read_image(str(mdir / "fovA_obj.tiff"))
    labels = sorted(np.unique(out[out > 0]))
    assert len(labels) == 4, f"objects merged: {labels}"
    # each original object kept its own (unique) new id
    for sl in [(slice(0, 2), slice(0, 2)), (slice(0, 2), slice(5, 7)),
               (slice(5, 7), slice(0, 2)), (slice(5, 7), slice(5, 7))]:
        vals = np.unique(out[sl])
        assert len(vals) == 1 and vals[0] > 0
