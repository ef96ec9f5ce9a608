import os

import numpy as np
import pandas as pd
import pytest

from ark_tpu.io.image_utils import read_image, save_image
from ark_tpu.segmentation import segmentation_utils


def _nested_masks():
    """Cell mask with two cells; nucleus 1 inside cell 1, nucleus 2 spanning
    cell 2 and background."""
    cell = np.zeros((40, 40), np.int32)
    cell[5:15, 5:15] = 1
    cell[20:30, 20:30] = 2
    nuc = np.zeros((40, 40), np.int32)
    nuc[8:12, 8:12] = 1            # fully inside cell 1
    nuc[25:35, 25:35] = 2          # half inside cell 2, half outside
    return cell, nuc


def test_find_nuclear_label_id():
    cell, nuc = _nested_masks()
    coords = np.argwhere(cell == 1)
    assert segmentation_utils.find_nuclear_label_id(nuc, coords) == 1
    # a cell with no nucleus overlap
    empty_coords = np.argwhere(np.zeros_like(cell) == 0)[:1]
    assert segmentation_utils.find_nuclear_label_id(
        nuc, np.array([[0, 0]])) is None


def test_match_nuclei_to_cells():
    cell, nuc = _nested_masks()
    mapping = segmentation_utils.match_nuclei_to_cells(cell, nuc)
    assert mapping == {1: 1, 2: 2}
    assert segmentation_utils.match_nuclei_to_cells(
        np.zeros_like(cell), nuc) == {}


def test_split_large_nuclei():
    cell, nuc = _nested_masks()
    out = segmentation_utils.split_large_nuclei(cell, nuc,
                                                cell_ids=np.array([1, 2]))
    # nucleus 1 entirely inside its cell: untouched
    assert (out[8:12, 8:12] == 1).all()
    # nucleus 2 extends >15px beyond cell 2: the in-cell part gets a new id
    in_cell = out[25:30, 25:30]
    out_cell = out[31:35, 31:35]
    assert in_cell.max() > 2
    assert (out_cell[out_cell > 0] == 2).all()
    assert in_cell.max() not in out_cell


def test_concatenate_csv(tmp_path):
    for i in range(3):
        pd.DataFrame({"x": [i, i + 1]}).to_csv(
            tmp_path / f"fov{i}_table.csv", index=False)
    files = [f"fov{i}_table.csv" for i in range(3)]
    segmentation_utils.concatenate_csv(str(tmp_path), files)
    combined = pd.read_csv(tmp_path / "combined_data.csv")
    assert len(combined) == 6
    assert set(combined["fov"]) == {f"fov{i}_table" for i in range(3)}
    with pytest.raises(ValueError):
        segmentation_utils.concatenate_csv(str(tmp_path), files,
                                           column_values=["only_one"])


def test_save_segmentation_labels(rng, tmp_path):
    seg_dir = tmp_path / "seg"
    data_dir = tmp_path / "data"
    out_dir = tmp_path / "out"
    for d in (seg_dir, data_dir, out_dir):
        d.mkdir()
    labels = np.zeros((32, 32), np.int32)
    labels[4:12, 4:12] = 1
    labels[18:28, 18:28] = 2
    save_image(str(seg_dir / "fov0_whole_cell.tiff"), labels)
    nuc = np.zeros((32, 32), np.int32)
    nuc[6:10, 6:10] = 1
    nuc[21:25, 21:25] = 2
    save_image(str(seg_dir / "fov0_nuclear.tiff"), nuc)
    # 2-channel channels-first deepcell-style input image
    img = rng.random((2, 32, 32)).astype(np.float32)
    save_image(str(data_dir / "fov0.tiff"), img)

    segmentation_utils.save_segmentation_labels(
        str(seg_dir), str(data_dir), str(out_dir), fovs=["fov0"],
        channels=["nuclear_channel", "membrane_channel"])

    borders = read_image(str(out_dir / "fov0_segmentation_borders.tiff"))
    assert set(np.unique(borders)) == {0, 255}
    assert borders[4, 4] == 255        # cell boundary pixel
    assert borders[8, 8] == 0          # cell interior
    overlay_path = (out_dir /
                    "fov0_nuclear_channel_membrane_channel_overlay.tiff")
    assert overlay_path.exists()
    overlay = read_image(str(overlay_path))
    assert overlay.ndim == 3
