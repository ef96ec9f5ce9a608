import matplotlib
matplotlib.use("Agg")

import numpy as np
import pandas as pd
import pytest

from ark_tpu.utils.metacluster_remap_gui import (MetaClusterData,
                                                 MetaClusterGui,
                                                 ZScoreNormalize,
                                                 distinct_cmap, distinct_rgbs,
                                                 generate_meta_cluster_colormap_dict,
                                                 metaclusterdata_from_files)


@pytest.fixture
def som_avg_csv(tmp_path, rng):
    n = 20
    df = pd.DataFrame(rng.random((n, 3)), columns=["m1", "m2", "m3"])
    df["pixel_som_cluster"] = np.arange(1, n + 1)
    df["pixel_meta_cluster"] = (np.arange(n) % 4) + 1
    df["count"] = rng.integers(10, 100, n)
    path = tmp_path / "som_avg.csv"
    df.to_csv(path, index=False)
    return str(path)


def test_metaclusterdata_from_files(som_avg_csv):
    mcd = metaclusterdata_from_files(som_avg_csv, cluster_type="pixel")
    assert mcd.cluster_count == 20
    assert mcd.metacluster_count == 4
    assert mcd.marker_count == 3
    assert mcd.metaclusters.shape == (4, 3)
    # weighted average sanity: metacluster avg within cluster value range
    assert (mcd.metaclusters.values <= 1.0 + 1e-9).all()
    assert mcd.linkage_matrix.shape[1] == 4


def test_metaclusterdata_remap_and_save(som_avg_csv, tmp_path):
    mcd = metaclusterdata_from_files(som_avg_csv)
    mcd.output_mapping_filename = str(tmp_path / "remap.csv")
    new_mc = mcd.new_metacluster()
    assert new_mc == 5
    mcd.remap(1, new_mc)
    assert mcd.which_metacluster(1) == new_mc
    mcd.change_displayname(new_mc, "tumor")
    out = pd.read_csv(tmp_path / "remap.csv")
    assert {"pixel_som_cluster", "pixel_meta_cluster",
            "pixel_meta_cluster_rename"}.issubset(out.columns)
    assert (out[out["pixel_som_cluster"] == 1][
        "pixel_meta_cluster_rename"] == "tumor").all()


def test_gui_selection_and_remap(som_avg_csv, tmp_path):
    mcd = metaclusterdata_from_files(som_avg_csv)
    mcd.output_mapping_filename = str(tmp_path / "remap.csv")
    gui = MetaClusterGui(mcd, debug=True, enable_throttle=False)
    gui.select_cluster(1)
    gui.select_cluster(2, extend=True)
    assert gui.selected_clusters == {1, 2}
    gui.select_cluster(3)   # no extend -> resets
    assert gui.selected_clusters == {3}
    gui.select_metacluster(1)
    assert set(mcd.cluster_in_metacluster(1)).issubset(gui.selected_clusters)
    mc = gui.new_metacluster_from_selection()
    for c in gui.selected_clusters:
        assert mcd.which_metacluster(c) == mc
    # heatmap data shapes
    z = gui.cluster_heatmap_data()
    assert z.shape == (20, 3)
    assert z.values.max() <= 3 and z.values.min() >= -3


def test_colormap_helpers(som_avg_csv, tmp_path):
    rgbs = distinct_rgbs(10)
    assert len(rgbs) == 10
    assert len(set(rgbs)) == 10
    cmap = distinct_cmap(33)
    assert cmap.N == 33
    # colormap dict from a remap file
    mcd = metaclusterdata_from_files(som_avg_csv)
    mcd.output_mapping_filename = str(tmp_path / "remap.csv")
    mcd.save_output_mapping()
    raw, renamed = generate_meta_cluster_colormap_dict(
        str(tmp_path / "remap.csv"), cmap)
    assert set(raw.keys()) == {1, 2, 3, 4}
    assert len(renamed) == 4


def test_zscore_normalize():
    norm = ZScoreNormalize(-3, 0, 3)
    vals = norm(np.array([-3.0, 0.0, 3.0]))
    np.testing.assert_allclose(vals, [0, 0.5, 1.0])
    np.testing.assert_allclose(norm.inverse([0, 0.5, 1.0]), [-3, 0, 3])
