"""Dimensionality-reduction visualization (reference
`src/ark/analysis/dimensionality_reduction.py:10-120`). UMAP runs as the JAX
implementation in ark_tpu.ops.umap (no umap-learn/numba); PCA runs on device;
tSNE is the exact device implementation in ark_tpu.ops.tsne (the reference
delegates to single-thread sklearn)."""

from __future__ import annotations

import matplotlib.pyplot as plt
import seaborn as sns

from ark_tpu.io.misc_utils import save_figure, verify_in_list
from ark_tpu.ops import umap as umap_ops


def plot_dim_reduced_data(component_one, component_two, fig_id, hue,
                          cell_data, title, title_fontsize=24,
                          palette="Spectral", alpha=0.3, legend_type="full",
                          bbox_to_anchor=(1.05, 1), legend_loc=2,
                          legend_borderaxespad=0., dpi=None, save_dir=None,
                          save_file=None):
    """Scatter a 2-D embedding colored by a category."""
    plt.figure(fig_id)
    sns.scatterplot(x=component_one, y=component_two, hue=hue,
                    palette=palette, data=cell_data, legend=legend_type,
                    alpha=alpha)
    plt.legend(bbox_to_anchor=bbox_to_anchor, loc=legend_loc,
               borderaxespad=legend_borderaxespad)
    plt.title(title, fontsize=title_fontsize)
    if save_dir is not None:
        save_figure(save_dir, save_file, dpi=dpi)


def visualize_dimensionality_reduction(cell_data, columns, category,
                                       color_map="Spectral",
                                       algorithm="UMAP", dpi=None,
                                       save_dir=None):
    """UMAP / PCA / tSNE projection scatter of the specified columns."""
    cell_data = cell_data.dropna()
    verify_in_list(algorithm=algorithm,
                   dimensionality_reduction_algorithms=["UMAP", "PCA",
                                                        "tSNE"])
    graph_title = "%s projection of data" % algorithm

    if algorithm == "UMAP":
        from sklearn.preprocessing import StandardScaler
        column_data = cell_data[columns].values
        scaled = StandardScaler().fit_transform(column_data)
        embedding = umap_ops.UMAP().fit_transform(scaled)
        plot_dim_reduced_data(embedding[:, 0], embedding[:, 1], fig_id=1,
                              hue=cell_data[category], cell_data=cell_data,
                              title=graph_title, dpi=dpi, save_dir=save_dir,
                              save_file="UMAPVisualization.png",
                              palette=color_map)
    elif algorithm == "PCA":
        pca_result = umap_ops.pca_transform(cell_data[columns].values)
        plot_dim_reduced_data(pca_result[:, 0], pca_result[:, 1], fig_id=2,
                              hue=cell_data[category], cell_data=cell_data,
                              title=graph_title, dpi=dpi, save_dir=save_dir,
                              save_file="PCAVisualization.png",
                              palette=color_map)
    elif algorithm == "tSNE":
        from ark_tpu.ops.tsne import TSNE
        tsne_results = TSNE().fit_transform(cell_data[columns].values)
        plot_dim_reduced_data(tsne_results[:, 0], tsne_results[:, 1],
                              fig_id=3, hue=cell_data[category],
                              cell_data=cell_data, title=graph_title,
                              dpi=dpi, save_dir=save_dir,
                              save_file="tSNEVisualization.png",
                              palette=color_map)
