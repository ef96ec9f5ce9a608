"""Pipeline template: fiber segmentation (equivalent of the fiber workflow
driven from the reference's notebooks)."""

import argparse
import os

from ark_tpu.segmentation import fiber_segmentation


def main(base_dir, fiber_channel, img_sub_folder=None, tile_length=512):
    data_dir = os.path.join(base_dir, "image_data")
    out_dir = os.path.join(base_dir, "fiber_segmentation")
    os.makedirs(out_dir, exist_ok=True)
    table = fiber_segmentation.run_fiber_segmentation(
        data_dir, fiber_channel, out_dir, img_sub_folder=img_sub_folder)
    fiber_segmentation.generate_summary_stats(table, out_dir,
                                              tile_length=tile_length)
    print(f"fiber segmentation complete: {len(table)} fibers")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--base_dir", required=True)
    p.add_argument("--fiber_channel", default="Collagen1")
    a = p.parse_args()
    main(a.base_dir, a.fiber_channel)
