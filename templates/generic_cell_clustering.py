"""Pipeline template: generic cell clustering on arbitrary cell-table columns
(equivalent of `templates/generic_cell_clustering.ipynb`): cell SOM +
consensus directly over marker expression columns instead of pixel-cluster
counts."""

import argparse
import os

import pandas as pd

from ark_tpu.phenotyping import cell_meta_clustering, cell_som_clustering


def main(base_dir, cell_table_path, cell_som_cluster_cols, max_k=20, seed=42):
    cell_table = pd.read_csv(cell_table_path)
    fovs = sorted(cell_table["fov"].unique())

    cell_pysom = cell_som_clustering.train_cell_som(
        fovs, base_dir, cell_table_path, cell_som_cluster_cols,
        cell_table.copy(), seed=seed, normalize=True)
    labeled = cell_som_clustering.cluster_cells(base_dir, cell_pysom,
                                                cell_som_cluster_cols)
    cell_som_clustering.generate_som_avg_files(
        base_dir, labeled, cell_som_cluster_cols,
        "generic_cell_som_cluster_avg.csv")
    cell_cc, labeled = cell_meta_clustering.cell_consensus_cluster(
        base_dir, cell_som_cluster_cols, labeled,
        "generic_cell_som_cluster_avg.csv", max_k=max_k, seed=seed)
    cell_meta_clustering.generate_meta_avg_files(
        base_dir, cell_cc, cell_som_cluster_cols, labeled,
        "generic_cell_som_cluster_avg.csv",
        "generic_cell_meta_cluster_avg.csv")
    labeled.to_csv(os.path.join(base_dir, "generic_cell_clusters.csv"),
                   index=False)
    print("generic cell clustering complete")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--base_dir", required=True)
    p.add_argument("--cell_table_path", required=True)
    p.add_argument("--cell_som_cluster_cols", nargs="+", required=True)
    a = p.parse_args()
    main(a.base_dir, a.cell_table_path, a.cell_som_cluster_cols)
