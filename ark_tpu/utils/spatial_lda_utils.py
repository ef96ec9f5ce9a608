"""Spatial-LDA helpers: argument validation, within-cluster SS, topic plots,
pkl/csv persistence (reference `src/ark/utils/spatial_lda_utils.py:17-270`)."""

from __future__ import annotations

import os
import pickle

import matplotlib.pyplot as plt
import numpy as np
import pandas as pd
import seaborn as sns

from ark_tpu.io import io_utils
from ark_tpu.io.misc_utils import verify_in_list
from ark_tpu.settings import BASE_COLS, CELL_TYPE, LDA_PLOT_TYPES

# matplotlib's Set3 stands in for palettable's Set3_12
_SET3 = plt.get_cmap("Set3").colors


def check_format_cell_table_args(cell_table, markers, clusters):
    """Validate format_cell_table inputs."""
    verify_in_list(required_columns=BASE_COLS,
                   cell_table_columns=cell_table.columns.to_list())
    if markers is None and clusters is None:
        raise ValueError("Markers and clusters cannot both be None.")
    if markers is not None:
        if len(markers) == 0:
            raise ValueError("The markers list is empty.")
        verify_in_list(markers=markers,
                       cell_table_columns=cell_table.columns.to_list())
    if clusters is not None:
        if len(clusters) == 0:
            raise ValueError("The clusters list is empty.")
        cell_table_clusters = cell_table[CELL_TYPE].unique().tolist()
        verify_in_list(clusters=clusters,
                       cell_table_clusters=cell_table_clusters)


def check_featurize_cell_table_args(cell_table, featurization, radius,
                                    cell_index):
    """Validate featurize_cell_table inputs."""
    if not isinstance(radius, int):
        raise TypeError("radius should be of type 'int'")
    if radius < 25:
        raise ValueError("radius must not be less than 25")
    verify_in_list(featurization=[featurization],
                   featurization_options=["cluster", "marker", "avg_marker",
                                          "count"])
    # format_cell_table always inserts both keys (possibly None), so the
    # membership test alone is dead code — check the VALUE like the
    # reference does (spatial_lda_utils.py:check_featurize_cell_table_args)
    if featurization == "cluster" and cell_table.get("clusters") is None:
        raise ValueError("Cannot featurize clusters, because none were used "
                         "for cell table formatting")
    if featurization in ["marker", "avg_marker"] \
            and cell_table.get("markers") is None:
        raise ValueError("Cannot featurize markers, because none were used "
                         "for cell table formatting")
    key = list(cell_table.keys())[0]
    verify_in_list(cell_index=[cell_index],
                   cell_table_columns=cell_table[key].columns.to_list())


def within_cluster_sums(data, labels):
    """Pooled within-cluster sum of squares (for the gap statistic)."""
    from scipy.spatial.distance import pdist
    data = np.asarray(data)
    cluster_sums = []
    for x in np.unique(labels):
        d = data[labels == x]
        cluster_sums.append(pdist(d).sum() / (2 * d.shape[0]))
    return float(np.sum(cluster_sums))


def _standardize_topics(topics):
    topics = np.asarray(topics, float)
    mu = topics.mean(axis=0, keepdims=True)
    sd = topics.std(axis=0, keepdims=True)
    return (topics - mu) / np.where(sd == 0, 1, sd)


def plot_topics_heatmap(topics, features, normalizer=None, transpose=False,
                        scale=0.4):
    """Heatmap of topic × feature loadings."""
    topics = np.asarray(topics)
    n_topics = topics.shape[0]
    topics = normalizer(topics) if normalizer is not None \
        else _standardize_topics(topics)
    topics = pd.DataFrame(np.asarray(topics).T, index=features,
                          columns=[f"Topic {x}" for x in range(n_topics)])
    if transpose:
        topics = topics.T
    plt.subplots(figsize=(scale * topics.shape[1], scale * topics.shape[0]))
    sns.heatmap(topics, square=True, cmap="RdBu")


def plot_fovs_with_topics(ax, fov_idx, topic_weights, cell_table,
                          uncolor_subset=None, color_palette=_SET3):
    """Scatter one FOV's cells colored by their dominant topic."""
    colors = np.array(color_palette[:topic_weights.shape[1]])
    cell_coords = cell_table[fov_idx]
    cell_indices = topic_weights.index.map(lambda x: x[1])
    coords = cell_table[fov_idx].loc[cell_indices]
    if uncolor_subset is not None:
        immune_coords = cell_coords[cell_coords[uncolor_subset]]
        ax.scatter(immune_coords["y"], -immune_coords["x"], s=5, c="k",
                   label=uncolor_subset, alpha=0.1)
    ax.scatter(coords["y"], -coords["x"], s=2,
               c=colors[np.argmax(np.array(topic_weights), axis=1), :])
    ax.set_title(f"FOV {fov_idx}")
    ax.axes.get_yaxis().set_visible(False)
    ax.axes.get_xaxis().set_visible(False)


def plot_adjacency_graph(ax, sample_idx, features_df, fov_df,
                         difference_matrices):
    """Draw the MST adjacency edges over a FOV's cell positions."""
    coords = fov_df[["y", "x"]].values
    ax.scatter(coords[:, 0], -coords[:, 1], s=4, c="k")
    dm = difference_matrices.get(sample_idx)
    if dm is not None:
        for row in np.asarray(dm):
            nz = np.nonzero(row)[0]
            if len(nz) == 2:
                a, b = nz
                ax.plot([coords[a, 0], coords[b, 0]],
                        [-coords[a, 1], -coords[b, 1]], c="tab:blue", lw=0.5)
    ax.set_title(f"FOV {sample_idx}")


def make_plot_fn(plot="adjacency", difference_matrices=None,
                 topic_weights=None, cell_table=None, color_palette=_SET3):
    """Factory for spatial-LDA plot callables."""
    verify_in_list(plot=[plot], plot_options=LDA_PLOT_TYPES)
    if plot == "adjacency":
        if difference_matrices is None:
            raise ValueError("Must provide difference_matrices")

        def plot_fn(ax, sample_idx, features_df, fov_df):
            plot_adjacency_graph(ax, sample_idx, features_df, fov_df,
                                 difference_matrices)
    else:
        if topic_weights is None or cell_table is None:
            raise ValueError("Must provide cell_table and topic_weights")

        def plot_fn(ax, sample_idx, features_df=topic_weights,
                    fov_df=cell_table):
            plot_fovs_with_topics(ax, sample_idx, features_df, fov_df,
                                  color_palette=color_palette)
    return plot_fn


def save_spatial_lda_file(data, dir, file_name, format="pkl"):
    """Persist spatial-LDA objects as pkl or csv."""
    if not os.path.exists(dir):
        raise ValueError("'dir' must be a valid directory.")
    file_path = os.path.join(dir, file_name + "." + format)
    if format == "pkl":
        with open(file_path, "wb") as f:
            pickle.dump(data, f)
    elif format == "csv":
        if isinstance(data, dict):
            raise ValueError("'data' is of type dict.  Use format='pkl' "
                             "instead.")
        if not hasattr(data, "to_csv"):
            raise ValueError("'data' is a spatial_lda model.  Use "
                             "format='pkl' instead.")
        data.to_csv(file_path)
    else:
        raise ValueError("format must be either 'csv' or 'pkl'.")


def read_spatial_lda_file(dir, file_name, format="pkl"):
    """Load spatial-LDA objects saved by save_spatial_lda_file."""
    file_path = os.path.join(dir, file_name + "." + format)
    io_utils.validate_paths(file_path)
    if format == "pkl":
        with open(file_path, "rb") as f:
            return pickle.load(f)
    if format == "csv":
        return pd.read_csv(file_path)
    raise ValueError("format must be either 'csv' or 'pkl'.")
