"""data_utils round-2 coverage: ClusterMaskData semantics, neighborhood
cluster masks, the weighted-channel heatmap, and OME channel-name recovery
(reference `data_utils.py:87-715`, `weighted_channel_comp.py:414-498`)."""

import matplotlib
matplotlib.use("Agg")

import os

import matplotlib.pyplot as plt
import numpy as np
import pandas as pd
import pytest

from ark_tpu import settings
from ark_tpu.io.image_utils import read_image, save_image
from ark_tpu.utils import data_utils

from tests import test_utils


def test_cluster_mask_data_string_clusters_stable_ids():
    df = pd.DataFrame({
        "fov": ["f0", "f0", "f1", "f1"],
        "label": [1, 2, 1, 2],
        "cell_meta_cluster": ["zeta", "alpha", "zeta", "mid"],
    })
    cmd = data_utils.ClusterMaskData(df, "fov", "label", "cell_meta_cluster")
    # ids assigned by sorted cluster name, starting at 1
    name_id = cmd.cluster_name_id.set_index("cell_meta_cluster")["cluster_id"]
    assert name_id["alpha"] == 1
    assert name_id["mid"] == 2
    assert name_id["zeta"] == 3
    assert cmd.unassigned_id == 4
    assert cmd.unique_fovs == ["f0", "f1"]
    # per-FOV mapping: cells present map to their ids, absent -> unassigned
    mapping = cmd.fov_mapping("f1")
    got = dict(zip(mapping["label"], mapping["cluster_id"]))
    assert got[1] == 3 and got[2] == 2


def test_cluster_mask_data_numeric_clusters():
    df = pd.DataFrame({"fov": ["f0"] * 3, "label": [1, 2, 3],
                       "kmeans_neighborhood": [5, 2, 5]})
    cmd = data_utils.ClusterMaskData(df, "fov", "label",
                                     "kmeans_neighborhood")
    mapping = cmd.fov_mapping("f0")
    got = dict(zip(mapping["label"], mapping["cluster_id"]))
    # ids from sorted unique values: 2 -> 1, 5 -> 2 (plus background 0)
    assert got == {0: 0, 1: 2, 2: 1, 3: 2}


def test_generate_and_save_neighborhood_cluster_masks(tmp_path, rng):
    fovs = ["fov0", "fov1"]
    data = test_utils.create_image_cohort(str(tmp_path / "imgs"), fovs,
                                          ["c0"], shape=(32, 32), n_cells=8)
    seg_dir = tmp_path / "seg"
    test_utils.save_label_dir(str(seg_dir), data)
    rows = []
    for fov in fovs:
        labels = data[fov][0]
        for lab in np.unique(labels)[1:]:
            rows.append({settings.FOV_ID: fov,
                         settings.CELL_LABEL: int(lab),
                         settings.KMEANS_CLUSTER: int(lab) % 3 + 1})
    nd = pd.DataFrame(rows)
    save_dir = tmp_path / "masks"
    save_dir.mkdir()
    data_utils.generate_and_save_neighborhood_cluster_masks(
        fovs, str(save_dir), str(seg_dir), nd, sub_dir="nh",
        name_suffix="_nh_mask")
    for fov in fovs:
        mask = read_image(str(save_dir / "nh" / f"{fov}_nh_mask.tiff"))
        labels = data[fov][0]
        # every labeled cell is recolored by its planted cluster id; the
        # ClusterMaskData ids follow sorted cluster values (1,2,3 here)
        for lab in np.unique(labels)[1:]:
            want = int(lab) % 3 + 1
            got = set(np.unique(mask[labels == lab]).tolist())
            # boundary erosion may zero the cell rim; interior keeps the id
            assert got <= {0, want} and want in got
        assert (mask[labels == 0] == 0).all()


def test_generate_cluster_mask_unassigned_cells(tmp_path, rng):
    labels = test_utils.make_labels_image(rng, shape=(24, 24), n_cells=6)
    seg_dir = tmp_path / "seg"
    seg_dir.mkdir()
    save_image(str(seg_dir / "fovU_whole_cell.tiff"), labels)
    # table covers only labels 1..3: the rest must become unassigned_id
    present = [1, 2, 3]
    df = pd.DataFrame({settings.FOV_ID: ["fovU"] * 3,
                       settings.CELL_LABEL: present,
                       settings.CELL_TYPE: ["A", "B", "A"]})
    cmd = data_utils.ClusterMaskData(df, settings.FOV_ID,
                                     settings.CELL_LABEL, settings.CELL_TYPE)
    mask = data_utils.generate_cluster_mask(
        "fovU", str(seg_dir), cmd, seg_suffix="_whole_cell.tiff")
    for lab in np.unique(labels)[1:]:
        vals = set(np.unique(mask[labels == lab]).tolist())  # 0 = eroded rim
        if lab in present:
            assert vals <= {0, 1, 2}
        else:
            assert vals <= {0, int(cmd.unassigned_id)}
            assert int(cmd.unassigned_id) in vals


def test_weighted_channel_avg_heatmap(tmp_path, rng):
    from ark_tpu.phenotyping import weighted_channel_comp as wcc

    chans = ["c0", "c1", "c2"]
    df = pd.DataFrame(rng.random((4, 3)), columns=chans)
    df["cell_som_cluster"] = [1, 2, 3, 4]
    df["cell_meta_cluster_rename"] = ["tumor", "immune", "tumor", "stroma"]
    path = tmp_path / "wc_avg.csv"
    df.to_csv(path, index=False)
    raw_cmap = {"tumor": (1, 0, 0, 1), "immune": (0, 1, 0, 1),
                "stroma": (0, 0, 1, 1)}
    wcc.generate_weighted_channel_avg_heatmap(
        str(path), "cell_som_cluster", chans, raw_cmap, raw_cmap)
    plt.close("all")
    with pytest.raises(ValueError):
        wcc.generate_weighted_channel_avg_heatmap(
            str(path), "bad_col", chans, raw_cmap, raw_cmap)
    with pytest.raises(ValueError):
        wcc.generate_weighted_channel_avg_heatmap(
            str(path), "cell_som_cluster", ["nope"], raw_cmap, raw_cmap)


def test_ome_channel_names_without_sidecar(tmp_path):
    """Channel names come from the embedded OME-XML when the sidecar is
    removed; generated names when neither exists."""
    from ark_tpu.io import ome_utils

    test_utils.create_image_cohort(str(tmp_path / "tree"), ["fovZ"],
                                   ["alpha", "beta"], shape=(16, 16))
    ome = ome_utils.fov_to_ome(str(tmp_path / "tree" / "fovZ"),
                               str(tmp_path / "ome"))
    os.remove(ome + ".channels.txt")
    names = ome_utils._read_channel_names(ome, 2)
    assert names in (["alpha", "beta"], ["channel_0", "channel_1"])
    out_dir = ome_utils.ome_to_fov(ome, str(tmp_path / "back"))
    files = sorted(os.listdir(out_dir))
    assert len(files) == 2
