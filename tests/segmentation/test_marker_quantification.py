import os

import numpy as np
import pandas as pd
import pytest

from ark_tpu import settings
from ark_tpu.io.image_utils import save_image
from ark_tpu.segmentation import marker_quantification, segmentation_utils
from ark_tpu.utils.labeled_array import DataArray

from tests import test_utils

CHANNELS = ["chan0", "chan1", "chan2"]


def _fov_arrays(rng, shape=(64, 64), n_cells=15):
    labels = test_utils.make_labels_image(rng, shape=shape, n_cells=n_cells)
    imgs = test_utils.make_channel_images(rng, labels, CHANNELS)
    input_images = DataArray(imgs, coords={"rows": np.arange(shape[0]),
                                           "cols": np.arange(shape[1]),
                                           "channels": CHANNELS})
    seg = DataArray(labels[..., None],
                    coords={"rows": np.arange(shape[0]),
                            "cols": np.arange(shape[1]),
                            "compartments": ["whole_cell"]})
    return labels, imgs, input_images, seg


def test_compute_marker_counts_total_intensity(rng):
    labels, imgs, input_images, seg = _fov_arrays(rng)
    mc = marker_quantification.compute_marker_counts(input_images, seg)
    feats = list(mc.coords["features"])
    # schema: cell_size, channels, then label first of regionprops
    assert feats[0] == settings.CELL_SIZE
    assert feats[1:4] == CHANNELS
    assert feats[4] == settings.CELL_LABEL
    for name in settings.REGIONPROPS_SINGLE_COMP:
        assert name in feats
    assert "centroid-0" in feats and "centroid-1" in feats

    ids = list(mc.coords["cell_id"])
    for cid in ids[:5]:
        mask = labels == cid
        row = mc.sel(compartments="whole_cell", cell_id=cid)
        assert float(row.sel(features=settings.CELL_SIZE).values) == mask.sum()
        for ci, ch in enumerate(CHANNELS):
            np.testing.assert_allclose(
                float(row.sel(features=ch).values),
                imgs[..., ci][mask].sum(), rtol=1e-3)
        # centroid
        coords = np.argwhere(mask)
        np.testing.assert_allclose(
            [float(row.sel(features="centroid-0").values),
             float(row.sel(features="centroid-1").values)],
            coords.mean(0), atol=0.01)
        # convex area >= area for disks
        assert float(row.sel(features="convex_area").values) >= mask.sum() - 1


def test_compute_marker_counts_extractions(rng):
    labels, imgs, input_images, seg = _fov_arrays(rng)
    mc_pos = marker_quantification.compute_marker_counts(
        input_images, seg, extraction="positive_pixel")
    cid = int(list(mc_pos.coords["cell_id"])[0])
    mask = labels == cid
    np.testing.assert_allclose(
        float(mc_pos.sel(compartments="whole_cell", cell_id=cid,
                         features="chan0").values),
        (imgs[..., 0][mask] > 0).sum(), rtol=1e-5)
    mc_cw = marker_quantification.compute_marker_counts(
        input_images, seg, extraction="center_weighting")
    v = float(mc_cw.sel(compartments="whole_cell", cell_id=cid,
                        features="chan0").values)
    total = imgs[..., 0][mask].sum()
    assert 0 < v < total  # weighted sum strictly below plain sum


def test_fast_extraction(rng):
    labels, imgs, input_images, seg = _fov_arrays(rng)
    mc = marker_quantification.compute_marker_counts(input_images, seg,
                                                     fast_extraction=True)
    feats = list(mc.coords["features"])
    assert "convex_area" not in feats
    assert "num_concavities" not in feats
    assert "centroid-0" in feats


def test_nuclear_counts(rng):
    labels, imgs, input_images, _ = _fov_arrays(rng)
    # nuclear mask: erode cells -> same ids serve as nuclei
    from ark_tpu.ops import morphology
    nuc = np.asarray(morphology.erode_mask(labels))
    seg = DataArray(np.stack([labels, nuc], axis=-1),
                    coords={"rows": np.arange(64), "cols": np.arange(64),
                            "compartments": ["whole_cell", "nuclear"]})
    mc = marker_quantification.compute_marker_counts(input_images, seg,
                                                     nuclear_counts=True)
    assert "nc_ratio" in list(mc.coords["features"])
    ratios = mc.sel(compartments="nuclear", features="nc_ratio").values
    valid = ratios[ratios > 0]
    assert len(valid) > 0
    assert (valid <= 1.0 + 1e-6).all()


def test_create_marker_count_matrices(rng):
    labels, imgs, input_images, seg = _fov_arrays(rng)
    seg_fov = DataArray(seg.values[None],
                        coords={"fovs": ["fov0"], "rows": np.arange(64),
                                "cols": np.arange(64),
                                "compartments": ["whole_cell"]})
    img_fov = DataArray(imgs[None],
                        coords={"fovs": ["fov0"], "rows": np.arange(64),
                                "cols": np.arange(64), "channels": CHANNELS})
    norm, arcsinh = marker_quantification.create_marker_count_matrices(
        seg_fov, img_fov)
    assert (norm["fov"] == "fov0").all()
    # size-norm: channel / cell_size
    cid = norm[settings.CELL_LABEL].iloc[0]
    mask = labels == cid
    expected = imgs[..., 0][mask].sum() / mask.sum()
    np.testing.assert_allclose(norm["chan0"].iloc[0], expected, rtol=1e-3)
    np.testing.assert_allclose(arcsinh["chan0"].iloc[0],
                               np.arcsinh(expected * 100), rtol=1e-3)


def test_generate_cell_table(rng, tmp_path):
    fovs = ["fov0", "fov1"]
    tiff_dir = str(tmp_path / "imgs")
    seg_dir = str(tmp_path / "segs")
    data = test_utils.create_image_cohort(tiff_dir, fovs, CHANNELS,
                                          shape=(48, 48), n_cells=10)
    test_utils.save_label_dir(seg_dir, data)
    norm, arcsinh = marker_quantification.generate_cell_table(
        segmentation_dir=seg_dir, tiff_dir=tiff_dir, img_sub_folder=None,
        fovs=fovs)
    assert set(norm["fov"].unique()) == set(fovs)
    assert (norm["mask_type"] == "whole_cell").all()
    assert settings.CELL_SIZE in norm.columns
    assert len(norm) == len(arcsinh) > 0


def test_transform_expression_matrix_noop_columns(rng):
    # non-channel columns (cell_size, label, regionprops) must be unchanged
    labels, imgs, input_images, seg = _fov_arrays(rng)
    mc = marker_quantification.compute_marker_counts(input_images, seg)
    norm = segmentation_utils.transform_expression_matrix(mc, "size_norm")
    np.testing.assert_array_equal(
        norm.sel(features=settings.CELL_SIZE).values,
        mc.sel(features=settings.CELL_SIZE).values)
    np.testing.assert_array_equal(
        norm.sel(features="area").values, mc.sel(features="area").values)


def test_split_large_nuclei(rng):
    cells = np.zeros((40, 40), np.int32)
    cells[5:20, 5:20] = 1
    nucs = np.zeros((40, 40), np.int32)
    nucs[10:30, 10:15] = 1  # nucleus extends well below cell 1
    out = segmentation_utils.split_large_nuclei(cells, nucs, np.array([1]))
    in_cell_ids = np.unique(out[(cells == 1) & (out > 0)])
    out_cell_ids = np.unique(out[(cells == 0) & (out > 0)])
    assert len(in_cell_ids) == 1 and len(out_cell_ids) == 1
    assert in_cell_ids[0] != out_cell_ids[0]


def test_get_single_compartment_props(rng):
    labels, imgs, input_images, seg = _fov_arrays(rng)
    props = marker_quantification.get_single_compartment_props(labels)
    n_cells = len(np.unique(labels)) - 1
    assert len(props) == n_cells
    assert "centroid-0" in props.columns and "area" in props.columns
    for name in settings.REGIONPROPS_SINGLE_COMP:
        assert name in props.columns
    # areas match the label image
    ids = np.unique(labels)
    ids = ids[ids != 0]
    for i, cid in enumerate(ids[:5]):
        assert props["area"].iloc[i] == (labels == cid).sum()
    with pytest.raises(ValueError):
        marker_quantification.get_single_compartment_props(
            labels, regionprops_single_comp=["not_a_prop"])


def test_assign_compartment_features_matches_compute(rng):
    """The public assign_* wrappers reproduce compute_marker_counts' planes."""
    labels, imgs, input_images, seg = _fov_arrays(rng)
    mc_ref = marker_quantification.compute_marker_counts(input_images, seg)
    feats = list(mc_ref.coords["features"])
    regionprops_names = feats[feats.index(settings.CELL_LABEL):]

    mc = DataArray(np.zeros(mc_ref.values.shape),
                   coords={"compartments": ["whole_cell"],
                           "cell_id": list(mc_ref.coords["cell_id"]),
                           "features": feats})
    mc = marker_quantification.assign_single_compartment_features(
        mc, "whole_cell", labels, imgs, regionprops_names,
        settings.REGIONPROPS_SINGLE_COMP)
    np.testing.assert_allclose(mc.values, mc_ref.values, rtol=1e-5)
    # multi-comp no-op and validation paths
    out = marker_quantification.assign_multi_compartment_features(mc, [])
    assert out is mc
    with pytest.raises(ValueError):
        marker_quantification.assign_multi_compartment_features(
            mc, ["not_a_prop"])


def test_get_existing_mask_types_exact_prefix_binding():
    """Each mask binds to its LONGEST matching FOV prefix — the old
    token-subset test let 'TMA_R1C1_whole_cell' match fov 'R1C1' and the
    positional slice produced garbage types."""
    got = marker_quantification.get_existing_mask_types(
        ["R1C1", "TMA_R1C1"],
        ["R1C1_whole_cell.tiff", "TMA_R1C1_whole_cell.tiff",
         "TMA_R1C1_nuclear.tiff"])
    assert got == ["nuclear", "whole_cell"]


def test_arcsinh_table_uses_whole_cell_regardless_of_compartment_order(rng):
    """Compartments ordered ['nuclear', 'whole_cell']: the arcsinh table
    must still carry whole-cell rows (a positional [0] silently swapped in
    nuclear data under whole-cell column names)."""
    labels = np.zeros((32, 32), np.int32)
    labels[4:14, 4:14] = 1          # 100-px cell
    nuc = np.zeros((32, 32), np.int32)
    nuc[6:10, 6:10] = 1             # 16-px nucleus inside it
    seg = DataArray(
        np.stack([nuc, labels], axis=-1)[None],
        coords={"fovs": ["fovA"], "rows": np.arange(32),
                "cols": np.arange(32),
                "compartments": ["nuclear", "whole_cell"]})
    imgs = DataArray(
        rng.random((1, 32, 32, 2)).astype(np.float32),
        coords={"fovs": ["fovA"], "rows": np.arange(32),
                "cols": np.arange(32), "channels": ["c0", "c1"]})
    normalized, arcsinh = marker_quantification.create_marker_count_matrices(
        seg, imgs, nuclear_counts=True)
    assert normalized["area"].iloc[0] == 100           # whole cell
    # arcsinh applies after size_norm: area column passes through
    assert arcsinh["area"].iloc[0] == 100
    assert normalized["area_nuclear"].iloc[0] == 16


def test_generate_cell_table_nuclear_counts_with_extra_mask_types(tmp_path,
                                                                  rng):
    """nuclear_counts=True plus a non-whole_cell mask type must not crash
    (the nuclear compartment only exists for whole_cell)."""
    from ark_tpu.io.image_utils import save_image
    seg_dir = tmp_path / "seg"
    tiff_dir = tmp_path / "tiffs"
    seg_dir.mkdir()
    (tiff_dir / "fov0").mkdir(parents=True)
    labels = np.zeros((24, 24), np.int32)
    labels[2:10, 2:10] = 1
    labels[14:22, 14:22] = 2
    nuc = np.zeros((24, 24), np.int32)
    nuc[4:8, 4:8] = 1
    nuc[16:20, 16:20] = 2
    save_image(str(seg_dir / "fov0_whole_cell.tiff"), labels)
    save_image(str(seg_dir / "fov0_nuclear.tiff"), nuc)
    save_image(str(seg_dir / "fov0_custom.tiff"), labels)
    for chan in ("c0", "c1"):
        save_image(str(tiff_dir / "fov0" / f"{chan}.tiff"),
                   rng.random((24, 24)).astype(np.float32))
    normalized, arcsinh = marker_quantification.generate_cell_table(
        segmentation_dir=str(seg_dir), tiff_dir=str(tiff_dir),
        img_sub_folder=None, fovs=["fov0"], nuclear_counts=True,
        mask_types=["whole_cell", "custom"])
    by_type = dict(tuple(normalized.groupby("mask_type")))
    assert "area_nuclear" in by_type["whole_cell"].columns
    assert len(by_type["custom"]) == 2      # ran without nuclear, no crash
