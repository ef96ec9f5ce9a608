"""Pipeline template: ez_seg (equivalent of `templates/ez_segmenter.ipynb`):
composites → object masks → merge with cell masks → cohort renumber →
cell-table generation over merged masks."""

import argparse
import os

from ark_tpu.io import io_utils
from ark_tpu.segmentation import marker_quantification
from ark_tpu.segmentation.ez_seg import (composites, ez_object_segmentation,
                                         ez_seg_utils, merge_masks)


def main(base_dir, channel_to_segment, composite_channels=None,
         mask_name="ez_objects", img_sub_folder=None):
    image_dir = os.path.join(base_dir, "image_data")
    masks_dir = os.path.join(base_dir, "ez_masks")
    merged_dir = os.path.join(base_dir, "merged_masks")
    log_dir = os.path.join(base_dir, "ez_logs")
    cell_mask_dir = os.path.join(base_dir, "segmentation", "deepcell_output")
    for d in [masks_dir, merged_dir, log_dir]:
        os.makedirs(d, exist_ok=True)
    fovs = io_utils.list_folders(image_dir)

    # optional composites
    if composite_channels:
        composites.composite_builder(
            image_dir, img_sub_folder, fovs, composite_channels, [],
            "signal", "total", composite_directory=image_dir,
            composite_name="composite", log_dir=log_dir)
        channel_to_segment = "composite"

    # object masks
    ez_object_segmentation.create_object_masks(
        image_dir, img_sub_folder, fovs, mask_name, channel_to_segment,
        masks_dir, log_dir, object_shape_type="blob", thresh="auto")

    # merge with cell masks
    merge_masks.merge_masks_seq(
        fovs, [mask_name], masks_dir, cell_mask_dir, "whole_cell",
        overlap_percent_threshold=30, expansion_factor=10,
        save_path=merged_dir, log_dir=log_dir)

    # globally unique labels + cell table over the merged masks
    ez_seg_utils.renumber_masks(merged_dir)
    norm, arcsinh = marker_quantification.generate_cell_table(
        segmentation_dir=merged_dir, tiff_dir=image_dir,
        img_sub_folder=img_sub_folder, fovs=fovs,
        mask_types=[f"{mask_name}_merged",
                    "final_whole_cell_remaining"])
    norm.to_csv(os.path.join(base_dir, "ez_cell_table_size_normalized.csv"),
                index=False)
    print("ez_seg complete")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--base_dir", required=True)
    p.add_argument("--channel_to_segment", required=True)
    a = p.parse_args()
    main(a.base_dir, a.channel_to_segment)
