"""Round-2 plot_utils coverage: cluster plotting, colormap machinery,
overlay preprocessing, colored mask savers (reference `plot_utils.py`
surface not covered by the round-1 tests)."""

import matplotlib
matplotlib.use("Agg")

import os

import matplotlib.pyplot as plt
import numpy as np
import pandas as pd
import pytest

from ark_tpu.io.image_utils import read_image, save_image
from ark_tpu.utils import plot_utils
from ark_tpu.utils.labeled_array import DataArray


@pytest.fixture()
def remap_csv(tmp_path):
    """SOM->meta mapping CSV with GUI renames + stable mask cluster_ids."""
    df = pd.DataFrame({
        "pixel_som_cluster": [1, 2, 3, 4],
        "pixel_meta_cluster": [1, 1, 2, 3],
        "pixel_meta_cluster_rename": ["immune", "immune", "tumor", "stroma"],
        "cluster_id": [1, 1, 2, 3],
    })
    path = tmp_path / "remap.csv"
    df.to_csv(path, index=False)
    colors_map = {1: (1.0, 0.0, 0.0, 1.0), 2: (0.0, 1.0, 0.0, 1.0),
                  3: (0.0, 0.0, 1.0, 1.0)}
    return str(path), colors_map


def test_metacluster_colormap_ordering_and_sentinels(remap_csv):
    path, colors_map = remap_csv
    mcc = plot_utils.MetaclusterColormap(
        cluster_type="pixel", cluster_id_to_name_path=path,
        metacluster_colors=dict(colors_map))
    # row 0 = background black, last = unassigned light gray
    np.testing.assert_allclose(mcc.mc_colors[0], (0, 0, 0, 1))
    np.testing.assert_allclose(mcc.mc_colors[-1], (0.9, 0.9, 0.9, 1.0))
    assert mcc.unassigned_id == 4
    names = list(mcc.metacluster_id_to_name["pixel_meta_cluster_rename"])
    assert names[0] == "Empty" and names[-1] == "Unassigned"
    # colors land at their cluster_id positions
    np.testing.assert_allclose(mcc.mc_colors[1], colors_map[1])
    np.testing.assert_allclose(mcc.mc_colors[3], colors_map[3])


def test_metacluster_colormap_mismatched_colors_raise(remap_csv):
    path, colors_map = remap_csv
    bad = dict(colors_map)
    bad.pop(3)
    with pytest.raises(ValueError):
        plot_utils.MetaclusterColormap(cluster_type="pixel",
                                       cluster_id_to_name_path=path,
                                       metacluster_colors=bad)


def test_create_cmap_variants_and_errors():
    arr = np.array([[1.0, 0, 0, 1], [0, 1.0, 0, 1]])
    cmap, norm = plot_utils.create_cmap(arr, n_clusters=2)
    assert cmap.N == 4  # background + 2 + unassigned
    assert norm(0) == 0 and norm(3) == 3
    cmap2, _ = plot_utils.create_cmap(["red", "blue"], n_clusters=2)
    assert cmap2.N == 4
    cmap3, _ = plot_utils.create_cmap("viridis", n_clusters=5)
    assert cmap3.N == 7
    with pytest.raises(ValueError, match="2D array"):
        plot_utils.create_cmap(np.zeros(3), n_clusters=3)
    with pytest.raises(ValueError, match="colors"):
        plot_utils.create_cmap(arr, n_clusters=5)
    with pytest.raises(KeyError, match="not found"):
        plot_utils.create_cmap("no_such_map", n_clusters=2)
    with pytest.raises(ValueError, match="ndarray, list, or str"):
        plot_utils.create_cmap(42, n_clusters=2)


def test_plot_neighborhood_cluster_result_saves(tmp_path, rng):
    imgs = rng.integers(0, 4, size=(2, 16, 16, 1))
    da = DataArray(imgs, coords={"fovs": ["f0", "f1"],
                                 "rows": np.arange(16),
                                 "cols": np.arange(16),
                                 "channels": ["seg"]})
    plot_utils.plot_neighborhood_cluster_result(
        da, fovs=["f0", "f1"], k=3, save_dir=str(tmp_path), dpi=50,
        figsize=(2, 2))
    assert os.path.exists(tmp_path / "f0.png")
    assert os.path.exists(tmp_path / "f1.png")
    plt.close("all")


def test_plot_pixel_cell_cluster_saves(tmp_path, rng, remap_csv):
    path, colors_map = remap_csv
    imgs = rng.integers(0, 4, size=(1, 16, 16, 1))
    da = DataArray(imgs, coords={"fovs": ["f0"], "rows": np.arange(16),
                                 "cols": np.arange(16), "channels": ["m"]})
    plot_utils.plot_pixel_cell_cluster(
        da, ["f0"], path, dict(colors_map), cluster_type="pixel",
        save_dir=str(tmp_path), dpi=50, figsize=(2, 2), erode=True)
    assert os.path.exists(tmp_path / "f0.png")
    plt.close("all")
    with pytest.raises(ValueError):
        plot_utils.plot_pixel_cell_cluster(
            da, ["f0"], path, dict(colors_map), cluster_type="banana")


def test_tif_overlay_preprocess():
    seg = np.zeros((8, 8), np.int32)
    gray = np.arange(64, dtype=np.float32).reshape(8, 8)
    out = plot_utils.tif_overlay_preprocess(seg, gray)
    assert out.shape == (8, 8, 3)
    np.testing.assert_array_equal(out[..., 2], gray)  # 2D -> blue channel
    assert (out[..., :2] == 0).all()

    two_ch = np.stack([gray, gray * 2], axis=-1)
    out3 = plot_utils.tif_overlay_preprocess(seg, two_ch)
    assert out3.shape == (8, 8, 3)
    np.testing.assert_array_equal(out3[..., 2], gray)      # flipped order
    np.testing.assert_array_equal(out3[..., 1], gray * 2)

    with pytest.raises(ValueError, match="dimensions not equal"):
        plot_utils.tif_overlay_preprocess(np.zeros((4, 4)), gray)
    with pytest.raises(ValueError, match="max 3 channels"):
        plot_utils.tif_overlay_preprocess(
            seg, np.zeros((8, 8, 4), np.float32))
    with pytest.raises(ValueError, match="2D or 3D"):
        plot_utils.tif_overlay_preprocess(seg, np.zeros(8, np.float32))


def test_set_minimum_color_for_colormap():
    base = matplotlib.colormaps["viridis"]
    fixed = plot_utils.set_minimum_color_for_colormap(base,
                                                      default=(1, 0, 0, 1))
    np.testing.assert_allclose(fixed(0), (1, 0, 0, 1))
    # everything else preserved
    np.testing.assert_allclose(fixed(128), base(128))


def test_save_colored_masks_renders_colormap(tmp_path, rng, remap_csv):
    path, colors_map = remap_csv
    mask_dir = tmp_path / "masks"
    mask_dir.mkdir()
    mask = np.zeros((10, 10), np.uint8)
    mask[2:5, 2:5] = 1      # cluster_id 1 -> red
    mask[6:9, 6:9] = 3      # cluster_id 3 -> blue
    save_image(str(mask_dir / "f0_pixel_mask.tiff"), mask)
    out_dir = tmp_path / "colored"
    plot_utils.save_colored_masks(["f0"], str(mask_dir), str(out_dir), path,
                                  dict(colors_map), "pixel")
    colored = read_image(str(out_dir / "f0_pixel_mask_colored.tiff"))
    assert colored.shape == (10, 10, 4)
    np.testing.assert_array_equal(colored[3, 3], [255, 0, 0, 255])
    np.testing.assert_array_equal(colored[7, 7], [0, 0, 255, 255])
    np.testing.assert_array_equal(colored[0, 0], [0, 0, 0, 255])


def test_plot_continuous_variable_figure(rng):
    img = rng.random((12, 12))
    fig = plot_utils.plot_continuous_variable(
        img, name="f0", stat_name="diversity",
        cmap=matplotlib.colormaps["viridis"], dpi=50, figsize=(2, 2))
    assert fig.axes  # image + colorbar
    plt.close(fig)


def test_mantis_dir_pairs_masks_by_exact_fov_name(tmp_path, rng):
    """fov1 must get fov1's mask even when fov10 (unrequested, prefix
    collision) also has a mask on disk — the old substring+zip pairing
    shifted every copy by one."""
    from ark_tpu.io.image_utils import read_image, save_image
    img_dir = tmp_path / "images"
    mask_dir = tmp_path / "masks"
    seg_dir = tmp_path / "seg"
    mantis = tmp_path / "mantis"
    for d in (img_dir, mask_dir, seg_dir):
        d.mkdir()
    suffix = "_cell_mask"
    for i, fov in enumerate(["fov1", "fov10", "fov12"]):
        (img_dir / fov).mkdir()
        save_image(str(img_dir / fov / "chan0.tiff"),
                   rng.random((8, 8)).astype(np.float32))
        save_image(str(mask_dir / f"{fov}{suffix}.tiff"),
                   np.full((8, 8), i + 1, np.int32))
        save_image(str(seg_dir / f"{fov}_whole_cell.tiff"),
                   np.ones((8, 8), np.int32))
    mapping = pd.DataFrame({
        "cluster_id": [1], "cell_meta_cluster_rename": ["tumor"]})
    plot_utils.create_mantis_dir(
        fovs=["fov1", "fov12"], mantis_project_path=str(mantis),
        img_data_path=str(img_dir), mask_output_dir=str(mask_dir),
        mask_suffix=suffix, mapping=mapping, seg_dir=str(seg_dir),
        cluster_type="cell", img_sub_folder="",
        seg_suffix_name="_whole_cell.tiff")
    # fov12's population mask must be fov12's (value 3), not fov10's (2)
    pop = read_image(str(mantis / "fov12" / "population_cell_mask.tiff"))
    assert (pop == 3).all()
    pop1 = read_image(str(mantis / "fov1" / "population_cell_mask.tiff"))
    assert (pop1 == 1).all()
