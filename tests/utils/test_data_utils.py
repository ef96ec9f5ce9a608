import os

import numpy as np
import pandas as pd
import pytest

from ark_tpu import settings
from ark_tpu.io import feather_utils as feather
from ark_tpu.io.image_utils import read_image, save_image
from ark_tpu.ops import relabel
from ark_tpu.utils import data_utils

from tests import test_utils


def test_relabel_segmentation(rng):
    labels = rng.integers(0, 10, (32, 32)).astype(np.int32)
    mapping = {i: i * 10 for i in range(5)}  # labels 5..9 unmapped
    out = relabel.relabel_segmentation(mapping, unassigned_id=-1,
                                       labeled_image=labels, _dtype=np.int32)
    assert out[labels == 3].max() == 30
    assert (out[labels == 7] == -1).all()
    # device path equals host path
    out_dev = relabel.relabel_segmentation(mapping, -1, labels,
                                           _dtype=np.int32, use_device=True)
    np.testing.assert_array_equal(out, out_dev)


def test_cluster_mask_data():
    df = pd.DataFrame({
        "fov": ["fov0"] * 3 + ["fov1"] * 2,
        "label": [1, 2, 3, 1, 2],
        "cell_meta_cluster": ["B", "A", "B", "A", "C"],
    })
    cmd = data_utils.ClusterMaskData(df, "fov", "label", "cell_meta_cluster")
    assert cmd.cluster_names == ["A", "B", "C"]
    assert cmd.n_clusters == 3
    assert cmd.unassigned_id == 4
    m = cmd.fov_mapping("fov0")
    # background row added
    assert (m["label"] == 0).sum() == 1
    a_id = cmd.cluster_name_id.set_index("cell_meta_cluster")["cluster_id"]["A"]
    assert m[m["label"] == 2]["cluster_id"].iloc[0] == a_id


def test_label_cells_by_cluster(rng):
    labels = test_utils.make_labels_image(rng, shape=(48, 48), n_cells=10)
    present = np.unique(labels)[1:]
    df = pd.DataFrame({
        "fov": ["fov0"] * (len(present) - 1),
        "label": present[:-1],   # last cell left unassigned
        "cell_meta_cluster": ["A" if i % 2 == 0 else "B"
                              for i in range(len(present) - 1)],
    })
    cmd = data_utils.ClusterMaskData(df, "fov", "label", "cell_meta_cluster")
    out = data_utils.label_cells_by_cluster("fov0", cmd, labels)
    assert out.dtype == np.int16
    assert out[labels == 0].max() == 0
    assert (out[labels == present[-1]] == cmd.unassigned_id).all()
    assert set(np.unique(out)) <= {0, 1, 2, cmd.unassigned_id}


def test_map_segmentation_labels(rng):
    labels = test_utils.make_labels_image(rng, shape=(32, 32), n_cells=5)
    present = np.unique(labels)[1:]
    values = np.arange(len(present), dtype=float) + 0.5
    values[0] = np.nan  # NaN -> 0
    out = data_utils.map_segmentation_labels(present, values, labels)
    assert (out[labels == present[0]] == 0).all()
    if len(present) > 1:
        assert np.allclose(out[labels == present[1]], values[1])


def test_generate_and_save_cell_cluster_masks(rng, tmp_path):
    fovs = ["fov0", "fov1"]
    seg_dir = tmp_path / "segs"
    save_dir = tmp_path / "masks"
    save_dir.mkdir()
    data = test_utils.create_image_cohort(str(tmp_path / "imgs"), fovs,
                                          ["chan0"], shape=(32, 32),
                                          n_cells=8)
    test_utils.save_label_dir(str(seg_dir), data)
    rows = []
    for fov in fovs:
        for lab in np.unique(data[fov][0])[1:]:
            rows.append({"fov": fov, "label": lab,
                         "cell_meta_cluster": f"c{lab % 3}"})
    cell_data = pd.DataFrame(rows)
    id_map_path = tmp_path / "id_map.csv"
    pd.DataFrame({"cell_meta_cluster": ["c0", "c1", "c2"],
                  "cluster_id": [0, 0, 0]}).to_csv(id_map_path, index=False)
    data_utils.generate_and_save_cell_cluster_masks(
        fovs, str(save_dir), str(seg_dir), cell_data, str(id_map_path),
        name_suffix="_cell_mask")
    for fov in fovs:
        mask = read_image(str(save_dir / f"{fov}_cell_mask.tiff"))
        assert mask.max() <= 4
    updated = pd.read_csv(id_map_path)
    assert "cluster_id" in updated.columns


def test_generate_pixel_cluster_mask(rng, tmp_path):
    fov = "fov0"
    tiff_dir = tmp_path / "imgs"
    data = test_utils.create_image_cohort(str(tiff_dir), [fov], ["chan0"],
                                          shape=(32, 32))
    pixel_dir = tmp_path / "pixel_mat_data"
    pixel_dir.mkdir()
    n = 200
    df = pd.DataFrame({
        "row_index": rng.integers(0, 32, n),
        "column_index": rng.integers(0, 32, n),
        "pixel_meta_cluster": rng.integers(1, 5, n),
    })
    feather.write_dataframe(df, pixel_dir / f"{fov}.feather")
    mapping = pd.DataFrame({"pixel_meta_cluster": [1, 2, 3, 4],
                            "cluster_id": [1, 2, 3, 4]})
    mask = data_utils.generate_pixel_cluster_mask(
        fov, str(tmp_path), str(tiff_dir), os.path.join(fov, "chan0.tiff"),
        "pixel_mat_data", mapping)
    assert mask.shape == (32, 32)
    assert mask.max() <= 4
    # scatter correctness for one pixel
    r, c, cl = df.iloc[0]
    assert mask[r, c] in range(1, 5)


def test_stitch_images_by_shape(rng, tmp_path):
    fovs = ["tile_R1C1", "tile_R1C2", "tile_R2C1", "tile_R2C2"]
    data_dir = tmp_path / "imgs"
    test_utils.create_image_cohort(str(data_dir), fovs, ["chan0"],
                                   shape=(16, 16))
    stitched_dir = tmp_path / "stitched"
    data_utils.stitch_images_by_shape(str(data_dir), str(stitched_dir))
    out = read_image(str(stitched_dir / "tile" / "chan0_stitched.tiff"))
    assert out.shape == (32, 32)


def test_convert_to_anndata(tmp_path):
    ct = test_utils.make_cell_table(n_cells=60, fovs=["fov0", "fov1"])
    # reorder columns to match schema: cell_size, markers..., label, rest
    cols = ([settings.CELL_SIZE]
            + [c for c in ct.columns if c.startswith("marker")]
            + [settings.CELL_LABEL, settings.FOV_ID, settings.PATIENT_ID,
               settings.CELL_TYPE, settings.CENTROID_0, settings.CENTROID_1])
    ct = ct[cols]
    path = tmp_path / "cell_table.csv"
    ct.to_csv(path, index=False)
    conv = data_utils.ConvertToAnnData(str(path))
    result = conv.convert_to_adata(str(tmp_path / "adata"))
    assert set(result.keys()) == {"fov0", "fov1"}
    adatas = data_utils.load_anndatas(str(tmp_path / "adata"))
    a = adatas["fov0"]
    assert a.X.shape[1] == 5
    assert "spatial" in a.obsm
    assert a.obsm["spatial"].shape[1] == 2
    assert "area" in a.obs.columns


def test_stage_timer(tmp_path):
    from ark_tpu.utils.profiling import StageTimer
    timer = StageTimer(verbose=False, log_path=str(tmp_path / "log.jsonl"))
    with timer.stage("blur", items=1000, unit="pixels"):
        sum(range(1000))
    with timer.stage("som"):
        pass
    report = timer.report()
    assert report[0]["stage"] == "blur"
    assert report[0]["per_second"] > 0
    assert timer.total_seconds > 0
    import json
    lines = open(tmp_path / "log.jsonl").read().splitlines()
    assert len(lines) == 2 and json.loads(lines[0])["unit"] == "pixels"
