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


# ---------------------------------------------------------------------------
# Round-2: full widget/pick interaction surface (reference
# `metaclustergui.py:24-567` behavior, driven headlessly on Agg).
# ---------------------------------------------------------------------------

class _FakePick:
    """Stand-in for a matplotlib pick_event."""

    class _Mouse:
        def __init__(self, x, button):
            self.name = "button_press_event"
            self.xdata = float(x)
            self.button = button

    def __init__(self, artist, x, button=1):
        self.artist = artist
        self.mouseevent = self._Mouse(x, button)


@pytest.fixture
def full_gui(som_avg_csv, tmp_path):
    mcd = metaclusterdata_from_files(som_avg_csv)
    mcd.output_mapping_filename = str(tmp_path / "remap.csv")
    gui = MetaClusterGui(mcd, enable_throttle=False)
    assert gui._figure is not None, "widget layer failed to build on Agg"
    return gui, mcd, tmp_path


def test_gui_builds_full_axes_grid(full_gui):
    gui, mcd, _ = full_gui
    # 4x3 grid: pixel-count bars, colorbar, dendrogram, both heatmaps,
    # selection strip, color-label strips
    assert len(gui._figure.axes) >= 12
    assert len(gui.rects_cp) == mcd.cluster_count
    assert gui.im_c.get_array().shape == (mcd.marker_count,
                                          mcd.cluster_count)
    assert gui.im_m.get_array().shape == (mcd.marker_count,
                                          mcd.metacluster_count)


def test_gui_left_click_toggles_cluster(full_gui):
    gui, mcd, _ = full_gui
    first = mcd.clusters.index[0]
    gui.onpick(_FakePick(gui.im_c, 0.4, button=1))
    assert first in gui.selected_clusters
    assert np.asarray(gui.selection_mask)[0, 0] == 1
    gui.onpick(_FakePick(gui.im_c, 0.4, button=1))   # toggle off
    assert first not in gui.selected_clusters


def test_gui_metacluster_click_toggles_whole_group(full_gui):
    gui, mcd, _ = full_gui
    mc = mcd.metaclusters.index[1]
    col = list(mcd.metaclusters.index).index(mc)
    gui.onpick(_FakePick(gui.im_m, col + 0.2, button=1))
    assert set(mcd.cluster_in_metacluster(mc)) <= gui.selected_clusters
    # dropdown follows the selection
    assert gui.current_metacluster.value == mc
    gui.onpick(_FakePick(gui.im_m, col + 0.2, button=1))   # toggle off
    assert not (set(mcd.cluster_in_metacluster(mc))
                & gui.selected_clusters)


def test_gui_color_label_click_selects_metacluster(full_gui):
    gui, mcd, _ = full_gui
    cluster = mcd.clusters_with_metaclusters.index[0]
    mc = mcd.which_metacluster(cluster)
    gui.onpick(_FakePick(gui.im_cl, 0.3, button=1))
    assert set(mcd.cluster_in_metacluster(mc)) <= gui.selected_clusters


def test_gui_right_click_remaps_selection(full_gui):
    gui, mcd, tmp_path = full_gui
    # select two clusters, then right-click metacluster 3's heatmap column
    c0, c1 = mcd.clusters.index[0], mcd.clusters.index[1]
    gui.select_cluster(c0)
    gui.select_cluster(c1, extend=True)
    target = mcd.metaclusters.index[2]
    col = list(mcd.metaclusters.index).index(target)
    gui.onpick(_FakePick(gui.im_m, col + 0.5, button=3))
    assert mcd.which_metacluster(c0) == target
    assert mcd.which_metacluster(c1) == target
    # persisted immediately
    out = pd.read_csv(tmp_path / "remap.csv")
    assert (out.loc[out["pixel_som_cluster"] == c0,
                    "pixel_meta_cluster"] == target).all()


def test_gui_widgets_buttons_and_slider(full_gui):
    gui, mcd, _ = full_gui
    chosen = mcd.clusters.index[0]  # capture: remap re-sorts mcd.clusters
    gui.select_cluster(chosen)
    gui.new_metacluster_button.click()
    assert mcd.which_metacluster(chosen) == 5
    gui.clear_selection_button.click()
    assert gui.selected_clusters == set()
    # z-score slider reclamps the heatmap data
    gui.zscore_clamp_slider.value = 1.0
    assert gui.zscore_cap == 1.0
    assert gui.cluster_heatmap_data().values.max() <= 1.0 + 1e-9


def test_gui_displayname_editor_persists(full_gui):
    gui, mcd, tmp_path = full_gui
    mc = mcd.metaclusters.index[0]
    gui.current_metacluster.value = mc
    gui.current_metacluster_displayname.value = "myeloid"
    assert mcd.get_metacluster_displayname(mc) == "myeloid"
    out = pd.read_csv(tmp_path / "remap.csv")
    assert "myeloid" in set(out["pixel_meta_cluster_rename"])
    # dropdown labels refresh with the new name
    assert ("myeloid", mc) in list(gui.current_metacluster.options)


def test_gui_update_repaints_after_remap(full_gui):
    gui, mcd, _ = full_gui
    before = np.array(gui.im_cl.get_array(), dtype=float).copy()
    gui.select_cluster(mcd.clusters.index[0])
    gui.new_metacluster_from_selection()
    gui._update_gui()
    after = np.array(gui.im_cl.get_array(), dtype=float)
    assert not np.array_equal(before, after)   # color labels re-rendered


def test_gui_enable_debug_mode(full_gui):
    gui, _, _ = full_gui
    n = len(gui.gui.children)
    gui.enable_debug_mode()
    assert len(gui.gui.children) == n + 1


# ---------------------------------------------------------------------------
# Marker ordering: dendrogram leaf order + drag-to-reorder (reference
# `metaclustergui.py:202-209` applies ddg['leaves'][::-1] as marker order).
# ---------------------------------------------------------------------------

class _FakeMouse:
    """Stand-in for a matplotlib button_press/release MouseEvent."""

    def __init__(self, inaxes, ydata):
        self.inaxes = inaxes
        self.ydata = ydata
        self.xdata = 1.0


def test_gui_applies_dendrogram_leaf_order(full_gui):
    gui, mcd, _ = full_gui
    assert gui.ddg["leaves"], "dendrogram did not report leaves"
    assert mcd.marker_order == list(gui.ddg["leaves"])[::-1]
    # marker_names follows the applied order, not the raw column order
    raw = ["m1", "m2", "m3"]
    assert list(mcd.marker_names) == [raw[i] for i in mcd.marker_order]
    # and the heatmap repaints with the reordered rows
    gui._heatmaps_stale = True
    gui._update_gui()
    assert gui.im_c.get_array().shape == (mcd.marker_count,
                                          mcd.cluster_count)


def test_move_marker_reorders_state_and_tables(full_gui):
    gui, mcd, _ = full_gui
    before = mcd.marker_order
    names_before = list(mcd.marker_names)
    gui.move_marker(0, 2)               # top row moves to the bottom
    after = mcd.marker_order
    assert after == [before[1], before[2], before[0]]
    assert list(mcd.marker_names) == \
        [names_before[1], names_before[2], names_before[0]]
    # metacluster averages follow the same column order
    assert list(mcd.metaclusters.columns) == list(mcd.marker_names)


def test_drag_to_reorder_markers(full_gui):
    gui, mcd, _ = full_gui
    names_before = list(mcd.marker_names)
    m = mcd.marker_count
    # press on the TOP display row (high ydata) of the cluster heatmap,
    # release on the BOTTOM display row (ydata just above 0)
    gui._on_marker_press(_FakeMouse(gui.ax_c, m - 0.5))
    assert gui._drag_marker_row == 0
    gui._on_marker_release(_FakeMouse(gui.ax_c, 0.5))
    assert gui._drag_marker_row is None
    assert list(mcd.marker_names) == names_before[1:] + names_before[:1]


def test_drag_outside_heatmap_is_ignored(full_gui):
    gui, mcd, _ = full_gui
    order_before = mcd.marker_order
    # press outside the cluster heatmap axes: no drag starts
    gui._on_marker_press(_FakeMouse(gui.ax_m, 1.5))
    assert gui._drag_marker_row is None
    gui._on_marker_release(_FakeMouse(gui.ax_c, 0.5))
    assert mcd.marker_order == order_before
    # press+release on the SAME row: no-op
    gui._on_marker_press(_FakeMouse(gui.ax_c, 0.5))
    gui._on_marker_release(_FakeMouse(gui.ax_c, 0.5))
    assert mcd.marker_order == order_before
    # release off-axes cancels the drag
    gui._on_marker_press(_FakeMouse(gui.ax_c, 0.5))
    gui._on_marker_release(_FakeMouse(None, None))
    assert mcd.marker_order == order_before


def test_marker_order_survives_remap_and_rename(full_gui):
    gui, mcd, tmp_path = full_gui
    gui.move_marker(2, 0)
    order = mcd.marker_order
    gui.select_cluster(mcd.clusters.index[0])
    mc = gui.new_metacluster_from_selection()
    gui.rename_metacluster(mc, "dragged")
    assert mcd.marker_order == order
    gui._update_gui()                    # repaint with new order + mapping
    assert list(mcd.metaclusters.columns) == list(mcd.marker_names)


def test_gui_constructs_with_default_throttle(som_avg_csv, tmp_path):
    # regression: throttle() used to crash at decoration time
    # (functools.wraps on a bound method), breaking MetaClusterGui(mcd)
    mcd = metaclusterdata_from_files(som_avg_csv)
    mcd.output_mapping_filename = str(tmp_path / "remap.csv")
    gui = MetaClusterGui(mcd)
    assert gui._figure is not None
    gui.select_cluster(mcd.clusters.index[0])
    gui.update_gui()          # throttled repaint path


def test_constant_marker_column_does_not_blank_heatmaps(tmp_path, rng):
    """A zero-variance marker z-scores to NaN; calibrate must not poison
    vmin/vmax (which blanked BOTH heatmaps)."""
    n = 12
    df = pd.DataFrame(rng.random((n, 3)), columns=["m1", "m2", "m3"])
    df["m2"] = 0.0                                  # constant channel
    df["pixel_som_cluster"] = np.arange(1, n + 1)
    df["pixel_meta_cluster"] = (np.arange(n) % 3) + 1
    df["count"] = rng.integers(10, 100, n)
    path = tmp_path / "avg.csv"
    df.to_csv(path, index=False)
    mcd = metaclusterdata_from_files(str(path))
    gui = MetaClusterGui(mcd, enable_throttle=False)
    assert gui._figure is not None
    gui._heatmaps_stale = True
    gui._update_gui()
    assert np.isfinite(gui.zscore_norm.vmin)
    assert np.isfinite(gui.zscore_norm.vmax)
    assert gui.zscore_norm.vmax > 0
    # the non-constant markers still render (not all-NaN output)
    rendered = np.asarray(gui.im_c.get_array(), dtype=float)
    assert np.isfinite(rendered).any()


def test_zscore_calibrate_all_nan_falls_back():
    zn = ZScoreNormalize()
    zn.calibrate(np.full((3, 4), np.nan))
    assert (zn.vmin, zn.vmax) == (-3.0, 3.0)
