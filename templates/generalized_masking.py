"""Pipeline template: generalized masking (equivalent of the reference's
`templates/Generalized_Masking.ipynb`).

Two independent masking flows with the notebook's full parameter surface:

1. **Signal masking** — composite the given channels, blur (sigma), auto or
   percentile intensity threshold, fill holes up to `max_hole_area`, keep
   objects above `min_object_area` (`masking_utils.generate_signal_masks`).
2. **Cell masking** — binarize the segmentation to the requested cell types
   from the cell table's `cluster_col`, blur + re-binarize, fill holes
   (`masking_utils.generate_cell_masks`).

Masks land in `mask_dir/<fov>/<mask_name>.tiff`, the layout consumed by
`ez_seg_utils.renumber_masks` and the Mantis writers.
"""

import argparse
import os

import pandas as pd

from ark_tpu import settings
from ark_tpu.utils import masking_utils


def main(base_dir, cell_table_path=None,
         # signal masking ------------------------------------------------
         signal_channels=None, signal_mask_name="signal_mask",
         intensity_thresh_perc="auto", signal_sigma=10,
         min_object_area=3500, max_hole_area=1000,
         # cell masking --------------------------------------------------
         cell_types=None, cell_mask_name="cell_mask",
         cluster_col=settings.CELL_TYPE, cell_sigma=10,
         img_dir=None, seg_dir=None, mask_dir=None):
    img_dir = img_dir or os.path.join(base_dir, "image_data")
    seg_dir = seg_dir or os.path.join(base_dir, "segmentation",
                                      "deepcell_output")
    mask_dir = mask_dir or os.path.join(base_dir, "mask_dir")
    os.makedirs(mask_dir, exist_ok=True)

    if signal_channels:
        masking_utils.generate_signal_masks(
            img_dir, mask_dir, list(signal_channels), signal_mask_name,
            intensity_thresh_perc=intensity_thresh_perc, sigma=signal_sigma,
            min_object_area=min_object_area, max_hole_area=max_hole_area)
        print(f"signal masks '{signal_mask_name}' saved to {mask_dir}")

    if cell_types:
        if cell_table_path is None:
            raise ValueError("cell masking requires cell_table_path")
        cell_table = pd.read_csv(cell_table_path)
        masking_utils.generate_cell_masks(
            seg_dir, mask_dir, cell_table, list(cell_types), cell_mask_name,
            cluster_col=cluster_col, sigma=cell_sigma,
            max_hole_area=max_hole_area)
        print(f"cell masks '{cell_mask_name}' saved to {mask_dir}")


if __name__ == "__main__":
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--base_dir", required=True)
    p.add_argument("--cell_table_path")
    p.add_argument("--signal_channels", nargs="*", default=None)
    p.add_argument("--signal_mask_name", default="signal_mask")
    p.add_argument("--signal_sigma", type=float, default=10)
    p.add_argument("--min_object_area", type=int, default=3500)
    p.add_argument("--max_hole_area", type=int, default=1000)
    p.add_argument("--cell_types", nargs="*", default=None)
    p.add_argument("--cell_mask_name", default="cell_mask")
    p.add_argument("--cluster_col", default=settings.CELL_TYPE)
    p.add_argument("--cell_sigma", type=float, default=10)
    a = p.parse_args()
    main(a.base_dir, a.cell_table_path,
         signal_channels=a.signal_channels,
         signal_mask_name=a.signal_mask_name,
         signal_sigma=a.signal_sigma, min_object_area=a.min_object_area,
         max_hole_area=a.max_hole_area, cell_types=a.cell_types,
         cell_mask_name=a.cell_mask_name, cluster_col=a.cluster_col,
         cell_sigma=a.cell_sigma)
