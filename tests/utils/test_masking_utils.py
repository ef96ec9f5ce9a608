import os

import numpy as np
import pandas as pd

from ark_tpu.io.image_utils import read_image, save_image
from ark_tpu.utils import masking_utils


def test_generate_signal_masks(rng, tmp_path):
    img_dir = tmp_path / "imgs"
    mask_dir = tmp_path / "masks"
    for fov in ["fov0", "fov1"]:
        d = img_dir / fov
        d.mkdir(parents=True)
        img = rng.uniform(0, 0.05, (64, 64)).astype(np.float32)
        img[16:48, 16:48] += 5.0     # strong signal blob
        save_image(str(d / "chan0.tiff"), img)
        save_image(str(d / "chan1.tiff"), img * 0.5)
    masking_utils.generate_signal_masks(
        str(img_dir), str(mask_dir), ["chan0", "chan1"], "total_mask",
        intensity_thresh_perc=50, sigma=1, min_object_area=50,
        max_hole_area=10)
    for fov in ["fov0", "fov1"]:
        mask = read_image(str(mask_dir / fov / "total_mask.tiff"))
        assert mask[32, 32] > 0      # signal region masked
        assert mask[4, 4] == 0       # background not


def test_create_and_generate_cell_masks(rng, tmp_path):
    seg = np.zeros((64, 64), np.int32)
    seg[4:20, 4:20] = 1
    seg[30:46, 30:46] = 2
    seg[50:60, 50:60] = 3
    cell_table = pd.DataFrame({
        "fov": ["fov0"] * 3,
        "label": [1, 2, 3],
        "cell_meta_cluster": ["tumor", "stroma", "tumor"],
    })
    mask = masking_utils.create_cell_mask(
        seg, cell_table, "fov0", ["tumor"], sigma=1, max_hole_area=10)
    assert mask[10, 10] == 1         # tumor cell 1
    assert mask[55, 55] == 1         # tumor cell 3
    assert mask[38, 38] == 0         # stroma cell excluded

    seg_dir = tmp_path / "seg"
    seg_dir.mkdir()
    save_image(str(seg_dir / "fov0_whole_cell.tiff"), seg)
    mask_dir = tmp_path / "masks"
    masking_utils.generate_cell_masks(
        str(seg_dir), str(mask_dir), cell_table, ["stroma"], "stroma_mask",
        sigma=1, max_hole_area=10)
    out = read_image(str(mask_dir / "fov0" / "stroma_mask.tiff"))
    assert out[38, 38] == 1
    assert out[10, 10] == 0
