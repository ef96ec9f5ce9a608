"""Mesmer segmentation driver with the reference's DeepCell-service API.

Capability parity with reference `src/ark/utils/deepcell_service_utils.py`:
`generate_deepcell_input` (:347-408, identical 2-channel TIFF contract) and
`create_deepcell_output` (:95-211) — but the network round trip (zip upload →
remote GPU → redis poll → zip download) is replaced by in-process TPU
inference via `ark_tpu.segmentation.mesmer`. File contract preserved:
`<fov>_whole_cell.tiff` / `<fov>_nuclear.tiff` int32 masks in
`deepcell_output_dir`. The `host`/`job_type`/`timeout` arguments are accepted
for compatibility and ignored; `zip_size` becomes the device batch size."""

from __future__ import annotations

import os
from typing import Optional

import numpy as np

from ark_tpu.io import io_utils, load_utils
from ark_tpu.io.image_utils import read_image, save_image
from ark_tpu.io.misc_utils import verify_in_list


def generate_deepcell_input(data_dir, tiff_dir, nuc_channels, mem_channels,
                            fovs, is_mibitiff=False, img_sub_folder="TIFs",
                            dtype="int16"):
    """Sum nuclear/membrane channels into channels-first 2-channel TIFFs."""
    if not nuc_channels and not mem_channels:
        raise ValueError("Either nuc_channels or mem_channels should be "
                         "non-empty.")
    channels = (nuc_channels or []) + (mem_channels or [])
    channels = [c for c in channels if c is not None]
    for fov in fovs:
        data_xr = load_utils.load_imgs_from_tree(
            tiff_dir, img_sub_folder=img_sub_folder, fovs=[fov],
            channels=channels)
        fov_name = list(data_xr.coords["fovs"])[0]
        out = np.zeros((2, data_xr.shape[1], data_xr.shape[2]),
                       dtype=data_xr.values.dtype)
        if nuc_channels:
            out[0] = np.sum(data_xr.sel(
                fovs=fov_name, channels=list(nuc_channels)).values, axis=-1)
        if mem_channels:
            out[1] = np.sum(data_xr.sel(
                fovs=fov_name, channels=list(mem_channels)).values, axis=-1)
        save_image(os.path.join(data_dir, f"{fov_name}.tiff"), out)


def create_deepcell_output(deepcell_input_dir, deepcell_output_dir, fovs=None,
                           wc_suffix="_whole_cell", nuc_suffix="_nuclear",
                           host=None, job_type="mesmer", scale=1.0,
                           timeout=300, zip_size=5,
                           weights_path: Optional[str] = None,
                           **predict_kwargs):
    """Segment every `<fov>.tiff` 2-channel input with the in-process Mesmer
    model; save `<fov><wc_suffix>.tiff` / `<fov><nuc_suffix>.tiff` int32
    masks. Previously produced masks are skipped (resume semantics)."""
    from ark_tpu.segmentation.mesmer import Mesmer

    try:
        scale = float(scale)
    except ValueError:
        raise ValueError("Scale argument must be a number")

    input_files = io_utils.list_files(deepcell_input_dir, substrs=[".tiff"])
    if fovs is None:
        fovs = input_files
    fovs = io_utils.remove_file_extensions(fovs)
    verify_in_list(fovs=fovs,
                   deepcell_input_files=io_utils.remove_file_extensions(
                       input_files))
    os.makedirs(deepcell_output_dir, exist_ok=True)

    todo = [fov for fov in fovs if not (
        os.path.exists(os.path.join(deepcell_output_dir,
                                    fov + wc_suffix + ".tiff"))
        and os.path.exists(os.path.join(deepcell_output_dir,
                                        fov + nuc_suffix + ".tiff")))]
    if not todo:
        print("All FOVs already segmented, skipping")
        return
    skipped = len(fovs) - len(todo)
    if skipped:
        print(f"Skipping {skipped} previously processed FOVs.")

    app = Mesmer(weights_path=weights_path)
    batch = max(int(zip_size), 1)
    groups = [todo[i:i + batch] for i in range(0, len(todo), batch)]
    print(f"Processing tiffs in {len(groups)} batches...")
    for fov_group in groups:
        imgs = []
        for fov in fov_group:
            img = read_image(os.path.join(deepcell_input_dir, fov + ".tiff"))
            if img.ndim == 3 and img.shape[0] == 2:   # channels-first input
                img = np.moveaxis(img, 0, -1)
            imgs.append(img.astype(np.float32) * scale)
        stack = np.stack(imgs)
        out = app.predict(stack, **predict_kwargs)
        for i, fov in enumerate(fov_group):
            save_image(os.path.join(deepcell_output_dir,
                                    fov + wc_suffix + ".tiff"),
                       out["whole_cell"][i].astype(np.int32))
            save_image(os.path.join(deepcell_output_dir,
                                    fov + nuc_suffix + ".tiff"),
                       out["nuclear"][i].astype(np.int32))
