"""Interactive SOM→metacluster remapping GUI (ipywidgets + matplotlib).

Capability parity with reference
`src/ark/utils/metacluster_remap_gui/metaclustergui.py:24-567`: a z-scored
cluster heatmap with dendrogram and a weighted metacluster-average heatmap;
click/shift-click selection of SOM clusters, remapping selections into an
existing or new metacluster, renaming metaclusters, and live CSV persistence
via the MetaClusterData state model. The selection/remap state machine is
fully functional headless (used by tests); the widget layer renders when an
ipython display is available."""

from __future__ import annotations

import numpy as np
import pandas as pd

from .metaclusterdata import MetaClusterData
from .throttle import throttle
from .zscore_norm import ZScoreNormalize

DEFAULT_HEATMAP_COLORMAP = "vlag"


class MetaClusterGui:
    """Interactive remapping GUI over a MetaClusterData state model."""

    def __init__(self, metaclusterdata: MetaClusterData, heatmapcolors=None,
                 width=17.0, debug=False, enable_throttle=True):
        self.mcd = metaclusterdata
        self.width = width
        self.debug = debug
        self.selected_clusters = set()
        self.heatmapcolors = heatmapcolors or DEFAULT_HEATMAP_COLORMAP
        self.zscore_norm = ZScoreNormalize(-3, 0, 3)
        self._figure = None
        self._widgets = None

        if enable_throttle:
            self.update_gui = throttle(0.2)(self._update_gui)
        else:
            self.update_gui = self._update_gui

        if not debug:
            try:
                self._build_widgets()
            except Exception:
                # headless environment: state machine remains usable
                self._widgets = None

    # ------------------------------------------------------------------
    # selection / remap state machine
    # ------------------------------------------------------------------
    def select_cluster(self, cluster, extend=False):
        """Select a cluster (shift-click semantics with extend=True)."""
        if not extend:
            self.selected_clusters = set()
        self.selected_clusters.add(cluster)

    def select_metacluster(self, metacluster):
        """Select every cluster in a metacluster."""
        self.selected_clusters.update(
            self.mcd.cluster_in_metacluster(metacluster))

    def clear_selection(self):
        self.selected_clusters = set()

    def remap_current_selection(self, metacluster):
        """Move the selected clusters into `metacluster` and persist."""
        for cluster in self.selected_clusters:
            self.mcd.remap(cluster, metacluster)
        if self.mcd.output_mapping_filename is not None:
            self.mcd.save_output_mapping()

    def new_metacluster_from_selection(self):
        """Move the selection into a brand-new metacluster; returns its id."""
        mc = self.mcd.new_metacluster()
        self.remap_current_selection(mc)
        return mc

    def rename_metacluster(self, metacluster, displayname):
        self.mcd.change_displayname(metacluster, displayname)

    # ------------------------------------------------------------------
    # plotting data
    # ------------------------------------------------------------------
    def cluster_heatmap_data(self) -> pd.DataFrame:
        """z-scored (per marker) cluster expression, metacluster-sorted."""
        from scipy.stats import zscore
        data = self.mcd.clusters
        z = data.apply(zscore)
        return z.clip(lower=-3, upper=3)

    def metacluster_heatmap_data(self) -> pd.DataFrame:
        from scipy.stats import zscore
        data = self.mcd.metaclusters
        z = data.apply(zscore)
        return z.clip(lower=-3, upper=3)

    # ------------------------------------------------------------------
    # widget layer
    # ------------------------------------------------------------------
    def _build_widgets(self):
        import ipywidgets as widgets
        import matplotlib.pyplot as plt
        from scipy.cluster.hierarchy import dendrogram

        self.out = widgets.Output()
        self.rename_box = widgets.Text(description="Rename:")
        self.remap_dropdown = widgets.Dropdown(description="Move to:")
        self.new_mc_button = widgets.Button(description="New metacluster")
        self.clear_button = widgets.Button(description="Clear selection")

        self.new_mc_button.on_click(
            lambda _: (self.new_metacluster_from_selection(),
                       self.update_gui()))
        self.clear_button.on_click(
            lambda _: (self.clear_selection(), self.update_gui()))

        def on_remap(change):
            if change["name"] == "value" and change["new"] is not None:
                self.remap_current_selection(change["new"])
                self.update_gui()
        self.remap_dropdown.observe(on_remap)

        def on_rename(change):
            if change["name"] == "value" and change["new"]:
                mcs = {self.mcd.which_metacluster(c)
                       for c in self.selected_clusters}
                for mc in mcs:
                    self.rename_metacluster(mc, change["new"])
        self.rename_box.observe(on_rename)

        with self.out:
            self._figure, self._axes = plt.subplots(
                2, 2, figsize=(self.width, 8),
                gridspec_kw={"height_ratios": [1, 4],
                             "width_ratios": [7, 2]})
        self._canvas_cid = self._figure.canvas.mpl_connect(
            "button_press_event", self._on_click)
        self.controls = widgets.HBox([
            self.remap_dropdown, self.new_mc_button, self.clear_button,
            self.rename_box])
        self._update_gui()

    def _on_click(self, event):
        if event.inaxes is None or event.xdata is None:
            return
        col = int(round(event.xdata))
        clusters = list(self.mcd.clusters.index)
        if 0 <= col < len(clusters):
            extend = bool(getattr(event, "key", None) == "shift")
            self.select_cluster(clusters[col], extend=extend)
            self.update_gui()

    def _update_gui(self):
        if self._figure is None:
            return
        import matplotlib.pyplot as plt
        from scipy.cluster.hierarchy import dendrogram

        (ax_dendro, ax_blank), (ax_clusters, ax_meta) = self._axes
        for ax in [ax_dendro, ax_blank, ax_clusters, ax_meta]:
            ax.clear()
        ax_blank.axis("off")

        dendrogram(self.mcd.linkage_matrix, ax=ax_dendro, no_labels=True,
                   color_threshold=0)
        ax_dendro.set_xticks([])

        zdata = self.cluster_heatmap_data()
        ax_clusters.imshow(zdata.T.values, aspect="auto",
                           cmap=self.heatmapcolors, norm=self.zscore_norm)
        ax_clusters.set_yticks(np.arange(self.mcd.marker_count))
        ax_clusters.set_yticklabels(self.mcd.marker_names)
        ax_clusters.set_xlabel("SOM cluster (metacluster-sorted)")
        # highlight selection
        clusters = list(zdata.index)
        for i, c in enumerate(clusters):
            if c in self.selected_clusters:
                ax_clusters.axvline(i, color="lime", lw=1.0, alpha=0.8)

        mdata = self.metacluster_heatmap_data()
        ax_meta.imshow(mdata.T.values, aspect="auto",
                       cmap=self.heatmapcolors, norm=self.zscore_norm)
        ax_meta.set_xticks(np.arange(len(mdata)))
        ax_meta.set_xticklabels(self.mcd.metacluster_displaynames,
                                rotation=90)
        ax_meta.set_yticks([])

        self.remap_dropdown.options = [
            (self.mcd.get_metacluster_displayname(mc), mc)
            for mc in self.mcd.metaclusters.index]
        self._figure.canvas.draw_idle()

    def _ipython_display_(self):
        from IPython.display import display
        if self._widgets is None and self._figure is None:
            self._build_widgets()
        import ipywidgets as widgets
        display(widgets.VBox([self.controls, self.out]))
