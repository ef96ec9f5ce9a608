"""Pipeline template: signal/cell-type mask generation (equivalent of
`templates/mask_generation.ipynb` / `Generalized_Masking.ipynb`)."""

import argparse
import os

import pandas as pd

from ark_tpu.utils import masking_utils


def main(base_dir, cell_table_path, signal_channels, cell_types,
         signal_mask_name="signal_mask", cell_mask_name="cell_mask"):
    img_dir = os.path.join(base_dir, "image_data")
    seg_dir = os.path.join(base_dir, "segmentation", "deepcell_output")
    mask_dir = os.path.join(base_dir, "masks")
    os.makedirs(mask_dir, exist_ok=True)
    cell_table = pd.read_csv(cell_table_path)

    masking_utils.generate_signal_masks(
        img_dir, mask_dir, signal_channels, signal_mask_name)
    masking_utils.generate_cell_masks(
        seg_dir, mask_dir, cell_table, cell_types, cell_mask_name)
    print("masks saved")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--base_dir", required=True)
    p.add_argument("--cell_table_path", required=True)
    p.add_argument("--signal_channels", nargs="+", required=True)
    p.add_argument("--cell_types", nargs="+", required=True)
    a = p.parse_args()
    main(a.base_dir, a.cell_table_path, a.signal_channels, a.cell_types)
