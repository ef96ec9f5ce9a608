"""Pipeline template: cell-neighbor statistics (equivalent of
`templates/cell_neighbors_analysis.ipynb`): neighborhood diversity + mean
distances to k-nearest cells of each phenotype."""

import argparse
import os

import pandas as pd

from ark_tpu.analysis import (cell_neighborhood_stats, neighborhood_analysis,
                              spatial_analysis_utils)


def main(base_dir, cell_table_path, pixel_radius=50, k=5):
    dist_dir = os.path.join(base_dir, "spatial_analysis", "dist_mats")
    neighbors_dir = os.path.join(base_dir, "spatial_analysis",
                                 "neighborhood_mats")
    os.makedirs(neighbors_dir, exist_ok=True)
    all_data = pd.read_csv(cell_table_path)
    # per-FOV resume: only missing <fov>_dist_mat.xr files are computed
    spatial_analysis_utils.ensure_dist_matrices(all_data, dist_dir)

    counts, freqs = neighborhood_analysis.create_neighborhood_matrix(
        all_data, dist_dir, distlim=pixel_radius)
    freqs_path = os.path.join(
        neighbors_dir,
        f"neighborhood_freqs-cell_meta_cluster_radius{pixel_radius}.csv")
    freqs.to_csv(freqs_path, index=False)

    diversity = cell_neighborhood_stats.generate_neighborhood_diversity_analysis(
        neighbors_dir, pixel_radius, ["cell_meta_cluster"])
    diversity.to_csv(os.path.join(base_dir, "neighborhood_diversity.csv"),
                     index=False)

    distances = cell_neighborhood_stats.generate_cell_distance_analysis(
        all_data, dist_dir,
        os.path.join(base_dir, "cell_distances.csv"), k=k)
    print("cell neighbors analysis complete")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--base_dir", required=True)
    p.add_argument("--cell_table_path", required=True)
    p.add_argument("--pixel_radius", type=int, default=50)
    p.add_argument("--k", type=int, default=5)
    a = p.parse_args()
    main(a.base_dir, a.cell_table_path, a.pixel_radius, a.k)
