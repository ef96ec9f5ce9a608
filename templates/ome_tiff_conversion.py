"""Pipeline template: OME-TIFF conversion (equivalent of
`templates/OME-TIFF_Conversion.ipynb`)."""

import argparse
import os

from ark_tpu.io import io_utils, ome_utils


def main(base_dir, direction="fov_to_ome", img_sub_folder=None):
    image_dir = os.path.join(base_dir, "image_data")
    ome_dir = os.path.join(base_dir, "ome_tiff")
    if direction == "fov_to_ome":
        os.makedirs(ome_dir, exist_ok=True)
        for fov in io_utils.list_folders(image_dir):
            out = ome_utils.fov_to_ome(os.path.join(image_dir, fov), ome_dir,
                                       img_sub_folder=img_sub_folder)
            print("wrote", out)
    else:
        for f in io_utils.list_files(ome_dir, substrs=".ome.tif"):
            if not f.endswith((".ome.tif", ".ome.tiff")):
                continue  # skip channel-name sidecars etc.
            out = ome_utils.ome_to_fov(os.path.join(ome_dir, f), image_dir,
                                       img_sub_folder=img_sub_folder)
            print("wrote", out)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--base_dir", required=True)
    p.add_argument("--direction", default="fov_to_ome",
                   choices=["fov_to_ome", "ome_to_fov"])
    a = p.parse_args()
    main(a.base_dir, a.direction)
