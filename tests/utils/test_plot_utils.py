import os

import matplotlib
matplotlib.use("Agg")

import numpy as np
import pandas as pd
import pytest

from ark_tpu.io.image_utils import read_image, save_image
from ark_tpu.utils import data_utils, masking_utils, plot_utils
from ark_tpu.phenotyping import post_cluster_utils

from tests import test_utils


@pytest.fixture
def cohort(tmp_path, rng):
    fovs = ["fov0", "fov1"]
    img_dir = tmp_path / "imgs"
    seg_dir = tmp_path / "segs"
    data = test_utils.create_image_cohort(str(img_dir), fovs, ["chan0", "chan1"],
                                          shape=(32, 32), n_cells=8)
    test_utils.save_label_dir(str(seg_dir), data)
    rows = []
    for fov in fovs:
        for lab in np.unique(data[fov][0])[1:]:
            rows.append({"fov": fov, "label": int(lab),
                         "cell_meta_cluster": f"ct{lab % 3}",
                         "area": float(lab) * 2})
    return fovs, str(img_dir), str(seg_dir), pd.DataFrame(rows), data


def test_create_cmap():
    cmap, norm = plot_utils.create_cmap("viridis", 5)
    assert cmap.N == 7  # background + 5 + unassigned
    assert norm(0) == 0


def test_metacluster_colormap(tmp_path):
    df = pd.DataFrame({
        "pixel_som_cluster": [1, 2, 3],
        "pixel_meta_cluster": [1, 1, 2],
        "pixel_meta_cluster_rename": ["a", "a", "b"],
        "cluster_id": [1, 1, 2],
    })
    path = tmp_path / "map.csv"
    df.to_csv(path, index=False)
    mcc = plot_utils.MetaclusterColormap(
        cluster_type="pixel", cluster_id_to_name_path=str(path),
        metacluster_colors={1: (1, 0, 0, 1), 2: (0, 1, 0, 1)})
    # rows: Empty(0), a(1), b(2), Unassigned(3)
    assert len(mcc.mc_colors) == 4
    names = mcc.metacluster_id_to_name["pixel_meta_cluster_rename"].tolist()
    assert names[0] == "Empty" and names[-1] == "Unassigned"


def test_cohort_cluster_plot(cohort, tmp_path):
    fovs, img_dir, seg_dir, cell_data, _ = cohort
    save_dir = tmp_path / "plots"
    plot_utils.cohort_cluster_plot(
        fovs=fovs, seg_dir=seg_dir, save_dir=str(save_dir),
        cell_data=cell_data, cmap="tab20")
    for fov in fovs:
        assert (save_dir / "cluster_masks" / f"{fov}.tiff").exists()
        assert (save_dir / "cluster_masks_colored" / f"{fov}.tiff").exists()
        assert (save_dir / "cluster_plots" / f"{fov}.png").exists()


def test_create_overlay(cohort, tmp_path):
    fovs, img_dir, seg_dir, cell_data, data = cohort
    # deepcell-input style file: 2-channel (nuc, mem)
    dc_input = tmp_path / "dc_input"
    dc_input.mkdir()
    for fov in fovs:
        stack = np.stack([data[fov][1][..., 0], data[fov][1][..., 1]])
        save_image(str(dc_input / f"{fov}.tiff"), stack)
        # nuclear masks too
        save_image(str(tmp_path / "segs" / f"{fov}_nuclear.tiff"),
                   data[fov][0].astype(np.int32))
    overlay = plot_utils.create_overlay(
        "fov0", seg_dir, str(dc_input),
        img_overlay_chans=["nuclear_channel", "membrane_channel"],
        seg_overlay_comp="whole_cell")
    assert overlay.shape == (32, 32, 3)
    assert overlay.dtype == np.uint8
    assert overlay.max() == 255  # boundaries drawn


def test_color_segmentation_by_stat(cohort, tmp_path):
    fovs, img_dir, seg_dir, cell_data, _ = cohort
    save_dir = tmp_path / "statplots"
    plot_utils.color_segmentation_by_stat(
        fovs=fovs, data_table=cell_data, seg_dir=seg_dir,
        save_dir=str(save_dir), stat_name="area")
    for fov in fovs:
        assert (save_dir / "continuous_plots" / f"{fov}.png").exists()
        assert (save_dir / "colored" / f"{fov}.tiff").exists()


def test_create_mantis_dir(cohort, tmp_path):
    fovs, img_dir, seg_dir, cell_data, _ = cohort
    mask_dir = tmp_path / "mantis_masks"
    mask_dir.mkdir()
    # make simple cluster masks + mapping
    for fov in fovs:
        m = np.zeros((32, 32), np.int16)
        m[:8, :8] = 1
        save_image(str(mask_dir / f"{fov}_cell_mask.tiff"), m)
    mapping = pd.DataFrame({"cluster_id": [1, 2],
                            "cell_meta_cluster_rename": ["a", "b"]})
    mantis_dir = tmp_path / "mantis"
    plot_utils.create_mantis_dir(
        fovs=fovs, mantis_project_path=str(mantis_dir),
        img_data_path=img_dir, mask_output_dir=str(mask_dir),
        mapping=mapping, seg_dir=seg_dir, cluster_type="cell",
        mask_suffix="_cell_mask")
    for fov in fovs:
        assert (mantis_dir / fov / "population_cell_mask.tiff").exists()
        assert (mantis_dir / fov / "population_cell_mask.csv").exists()
        assert (mantis_dir / fov / "cell_segmentation.tiff").exists()
        assert (mantis_dir / fov / "chan0.tiff").exists()


def test_post_cluster_mantis_and_resolution(cohort, tmp_path):
    fovs, img_dir, seg_dir, cell_data, _ = cohort
    mask_dir = tmp_path / "pc_masks"
    mantis_dir = tmp_path / "pc_mantis"
    post_cluster_utils.create_mantis_project(
        cell_table=cell_data, fovs=fovs, seg_dir=seg_dir,
        mask_dir=str(mask_dir), image_dir=img_dir,
        mantis_dir=str(mantis_dir))
    for fov in fovs:
        assert (mantis_dir / fov).exists()
    # new cluster resolution
    mapping = {"broad": ["ct0", "ct1", "ct2"]}
    out_path = tmp_path / "ct_new.csv"
    post_cluster_utils.generate_new_cluster_resolution(
        cell_data.copy(), "cell_meta_cluster", "broad_cluster", mapping,
        str(out_path))
    out = pd.read_csv(out_path)
    assert (out["broad_cluster"] == "broad").all()


def test_generate_signal_and_cell_masks(cohort, tmp_path):
    fovs, img_dir, seg_dir, cell_data, _ = cohort
    mask_dir = tmp_path / "sig_masks"
    masking_utils.generate_signal_masks(
        img_dir, str(mask_dir), ["chan0", "chan1"], "sig_mask",
        intensity_thresh_perc=50, sigma=1, min_object_area=5,
        max_hole_area=10)
    assert (mask_dir / "fov0" / "sig_mask.tiff").exists()
    cell_mask_dir = tmp_path / "cell_masks"
    masking_utils.generate_cell_masks(
        seg_dir, str(cell_mask_dir), cell_data, ["ct0"], "ct0_mask",
        sigma=1)
    m = read_image(str(cell_mask_dir / "fov0" / "ct0_mask.tiff"))
    assert set(np.unique(m)) <= {0, 1}
