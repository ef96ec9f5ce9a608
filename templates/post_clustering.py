"""Pipeline template: post-clustering (equivalent of
`templates/4_Post_Clustering.ipynb`): marker threshold QC, cluster masks,
Mantis project, coarser cluster resolutions."""

import argparse
import os

import pandas as pd

from ark_tpu.phenotyping import post_cluster_utils
from ark_tpu.utils import plot_utils


def main(base_dir, cell_table_path, marker, populations, threshold=None):
    cell_table = pd.read_csv(cell_table_path)
    fovs = sorted(cell_table["fov"].unique())
    seg_dir = os.path.join(base_dir, "segmentation", "deepcell_output")

    # marker-threshold histograms for QC
    post_cluster_utils.plot_hist_thresholds(
        cell_table, populations=populations, marker=marker,
        threshold=threshold)

    # cohort cluster masks + plots
    plot_utils.cohort_cluster_plot(
        fovs=fovs, seg_dir=seg_dir,
        save_dir=os.path.join(base_dir, "post_clustering"),
        cell_data=cell_table, cmap="tab20")

    # full mantis project
    post_cluster_utils.create_mantis_project(
        cell_table=cell_table, fovs=fovs, seg_dir=seg_dir,
        mask_dir=os.path.join(base_dir, "post_clustering", "masks"),
        image_dir=os.path.join(base_dir, "image_data"),
        mantis_dir=os.path.join(base_dir, "mantis"))
    print("post-clustering outputs saved")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--base_dir", required=True)
    p.add_argument("--cell_table_path", required=True)
    p.add_argument("--marker", required=True)
    p.add_argument("--populations", nargs="+", required=True)
    a = p.parse_args()
    main(a.base_dir, a.cell_table_path, a.marker, a.populations)
