"""Pipeline template: RnCm tiled image stitching (equivalent of
`templates/Image_Stitching.ipynb`)."""

import argparse
import os

from ark_tpu.utils import data_utils


def main(base_dir, img_sub_folder=None, channels=None):
    data_dir = os.path.join(base_dir, "image_data")
    stitched_dir = os.path.join(base_dir, "stitched_images")
    data_utils.stitch_images_by_shape(
        data_dir, stitched_dir, img_sub_folder=img_sub_folder,
        channels=channels)
    print(f"stitched images saved to {stitched_dir}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--base_dir", required=True)
    p.add_argument("--channels", nargs="*", default=None)
    a = p.parse_args()
    main(a.base_dir, channels=a.channels)
