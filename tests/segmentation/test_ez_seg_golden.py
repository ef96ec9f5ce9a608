"""ez_seg detail goldens: composite add/subtract mode semantics, merge
overlap thresholds, bbox filtering, Mantis assembly, logs, stack splitting
(reference `composites.py:9-181`, `merge_masks.py:14-226`,
`ez_seg_utils.py:21-184`)."""

import os

import numpy as np
import pandas as pd
import pytest

from ark_tpu.io.image_utils import read_image, save_image
from ark_tpu.segmentation.ez_seg import (composites, ez_seg_utils,
                                         merge_masks)
from ark_tpu.utils import data_utils


def _tree(tmp_path, fov="fov0", chans=None):
    chans = chans or {}
    fdir = tmp_path / "images" / fov
    fdir.mkdir(parents=True, exist_ok=True)
    for name, arr in chans.items():
        save_image(str(fdir / f"{name}.tiff"), arr.astype(np.float32))
    return str(tmp_path / "images")


def test_composite_modes_golden(tmp_path):
    a = np.array([[0.0, 1.0], [2.0, 3.0]], np.float32)
    b = np.array([[1.0, 0.0], [1.0, 1.0]], np.float32)
    s = np.array([[0.0, 5.0], [1.0, 0.0]], np.float32)
    img_dir = _tree(tmp_path, chans={"a": a, "b": b, "s": s})

    # total/total: plain sum then clipped subtraction
    out = composites.composite_builder(
        img_dir, None, ["fov0"], ["a", "b"], ["s"], "signal", "total")
    np.testing.assert_allclose(out["fov0"],
                               np.clip(a + b - s, 0, None))
    # binary signal: clip sum to 1, subtracted pixels zeroed entirely
    out2 = composites.composite_builder(
        img_dir, None, ["fov0"], ["a", "b"], ["s"], "signal", "binary")
    want = np.clip(a + b, None, 1)
    want[s > 0] = 0
    np.testing.assert_allclose(out2["fov0"], want)
    # pixel_cluster type clips to 1 regardless of method
    out3 = composites.composite_builder(
        img_dir, None, ["fov0"], ["a", "b"], [], "pixel_cluster", "total")
    assert out3["fov0"].max() <= 1.0
    # unknown channel / method raise
    with pytest.raises(ValueError):
        composites.composite_builder(img_dir, None, ["fov0"], ["zz"], [],
                                     "signal", "total")
    with pytest.raises(ValueError):
        composites.composite_builder(img_dir, None, ["fov0"], ["a"], [],
                                     "signal", "maximal")


def test_composite_builder_saves_and_logs(tmp_path):
    a = np.ones((4, 4), np.float32)
    img_dir = _tree(tmp_path, chans={"a": a})
    comp_dir = tmp_path / "comps"
    log_dir = tmp_path / "logs"
    comp_dir.mkdir()
    log_dir.mkdir()
    ret = composites.composite_builder(
        img_dir, None, ["fov0"], ["a"], [], "signal", "total",
        composite_directory=str(comp_dir), composite_name="comp",
        log_dir=str(log_dir))
    assert ret is None   # log mode prints instead of returning
    assert (comp_dir / "fov0" / "comp.tiff").exists()
    log = (log_dir / "comp_composite_log.txt").read_text()
    assert "images_to_add" in log and "fov0" in log


def test_merge_masks_single_threshold_boundary(tmp_path):
    """A cell merges only when overlap/cell_area exceeds the threshold."""
    obj = np.zeros((20, 20), np.uint8)
    obj[0:10, 0:10] = 1                    # one object
    cell = np.zeros((20, 20), np.uint8)
    cell[8:12, 0:4] = 1                    # cell A: 16 px, 8 px overlap (50%)
    cell[14:18, 14:18] = 1                 # cell B: no overlap
    out_dir = tmp_path / "m"
    out_dir.mkdir()

    # threshold 60%: 50% overlap does NOT merge
    rem60 = merge_masks.merge_masks_single(obj, cell.copy(), 60, "obj60",
                                           str(out_dir), expansion_factor=0)
    assert (rem60 > 0).sum() == 32          # both cells remain
    # threshold 30%: cell A merges into the object, B remains
    rem30 = merge_masks.merge_masks_single(obj, cell.copy(), 30, "obj30",
                                           str(out_dir), expansion_factor=0)
    assert (rem30 > 0).sum() == 16
    merged = read_image(str(out_dir / "obj30_merged.tiff"))
    # merged object now includes the cell's pixels
    assert merged[9, 2] == merged[5, 5] != 0
    assert merged[15, 15] == 0
    with pytest.raises(ValueError, match="same shape"):
        merge_masks.merge_masks_single(obj, cell[:10], 30, "x",
                                       str(out_dir), 0)


def test_bounding_boxes_and_filtering():
    labels = np.zeros((30, 30), np.int32)
    labels[5:10, 5:8] = 1
    labels[20:25, 20:29] = 2
    boxes = merge_masks.get_bounding_boxes(labels)
    assert boxes[1] == ((5, 5), (9, 7))
    assert boxes[2] == ((20, 20), (24, 28))

    props = pd.DataFrame({"label": [10, 11, 12],
                          "centroid-0": [6.0, 12.0, 3.0],
                          "centroid-1": [6.0, 6.0, 3.0]})
    inside = merge_masks.filter_labels_in_bbox(boxes[1], props,
                                               expansion_factor=0)
    assert inside == [10]
    expanded = merge_masks.filter_labels_in_bbox(boxes[1], props,
                                                 expansion_factor=3)
    assert set(expanded) == {10, 11, 12}


def test_find_and_copy_files(tmp_path):
    src = tmp_path / "src"
    dst = tmp_path / "dst"
    src.mkdir()
    dst.mkdir()
    for name in ["fov0_plaques.tiff", "fov0_fibers.tiff", "fov0_other.tiff"]:
        save_image(str(src / name), np.zeros((3, 3), np.float32))
    ez_seg_utils.find_and_copy_files(["plaques", "fibers"], str(src),
                                     str(dst))
    copied = sorted(os.listdir(dst))
    assert copied == ["fov0_fibers.tiff", "fov0_plaques.tiff"]


def test_ez_create_mantis_project(tmp_path):
    img_dir = tmp_path / "images"
    (img_dir / "fov0").mkdir(parents=True)
    save_image(str(img_dir / "fov0" / "chanA.tiff"),
               np.ones((4, 4), np.float32))
    seg_dir = tmp_path / "seg"
    (seg_dir / "masks_type1").mkdir(parents=True)
    save_image(str(seg_dir / "masks_type1" / "fov0_objects.tiff"),
               np.ones((4, 4), np.float32))
    mantis = tmp_path / "mantis"
    ez_seg_utils.create_mantis_project(["fov0"], str(img_dir), str(seg_dir),
                                       str(mantis))
    files = sorted(os.listdir(mantis / "fov0"))
    assert "chanA.tiff" in files
    assert "fov0_objects.tiff" in files


def test_log_creator(tmp_path):
    ez_seg_utils.log_creator({"radius": 5, "mode": "blob"}, str(tmp_path),
                             "run_log.txt")
    text = (tmp_path / "run_log.txt").read_text()
    assert "radius: 5" in text and "mode: blob" in text


def test_split_img_stack(tmp_path):
    stack_dir = tmp_path / "stacks"
    stack_dir.mkdir()
    stack = np.stack([np.full((6, 6), i, np.float32) for i in range(3)])
    save_image(str(stack_dir / "fovA.tiff"), stack)
    out_dir = tmp_path / "split"
    out_dir.mkdir()
    data_utils.split_img_stack(str(stack_dir), str(out_dir), ["fovA.tiff"],
                               [0, 2], ["c0.tiff", "c2.tiff"],
                               channels_first=True)
    c0 = read_image(str(out_dir / "fovA" / "c0.tiff"))
    c2 = read_image(str(out_dir / "fovA" / "c2.tiff"))
    assert (c0 == 0).all() and (c2 == 2).all()


def test_stitch_images_golden(rng):
    from ark_tpu.utils.labeled_array import DataArray
    tiles = rng.random((4, 5, 5, 1)).astype(np.float32)
    da = DataArray(tiles, coords={"fovs": ["t_R1C1", "t_R1C2", "t_R2C1",
                                           "t_R2C2"],
                                  "rows": np.arange(5), "cols": np.arange(5),
                                  "channels": ["c"]})
    stitched = data_utils.stitch_images(da, num_cols=2)
    assert stitched.shape == (1, 10, 10, 1)
    np.testing.assert_allclose(stitched.values[0, :5, :5, 0],
                               tiles[0, ..., 0])
    np.testing.assert_allclose(stitched.values[0, :5, 5:, 0],
                               tiles[1, ..., 0])
    np.testing.assert_allclose(stitched.values[0, 5:, :5, 0],
                               tiles[2, ..., 0])


def test_erode_mask_and_save_fov_mask(tmp_path):
    labels = np.zeros((10, 10), np.int32)
    labels[2:8, 2:8] = 1
    eroded = data_utils.erode_mask(labels.copy())
    assert eroded.sum() < labels.sum()
    assert eroded[5, 5] == 1 and eroded[2, 2] == 0   # boundary removed
    data_utils.save_fov_mask("fov0", str(tmp_path), eroded,
                             sub_dir="masks", name_suffix="_er")
    saved = read_image(str(tmp_path / "masks" / "fov0_er.tiff"))
    np.testing.assert_array_equal(saved, eroded)
