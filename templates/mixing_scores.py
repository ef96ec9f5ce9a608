"""Pipeline template: mixing scores (equivalent of
`templates/Calculate_Mixing_Scores.ipynb`)."""

import argparse
import os

import pandas as pd

from ark_tpu.analysis import neighborhood_analysis, spatial_analysis_utils


def main(base_dir, cell_table_path, target_cells, reference_cells,
         distlim=50, mixing_type="percent", ratio_threshold=5,
         cell_count_thresh=200):
    dist_dir = os.path.join(base_dir, "spatial_analysis", "dist_mats")
    all_data = pd.read_csv(cell_table_path)
    # per-FOV resume: only missing <fov>_dist_mat.xr files are computed
    spatial_analysis_utils.ensure_dist_matrices(all_data, dist_dir)
    counts, _ = neighborhood_analysis.create_neighborhood_matrix(
        all_data, dist_dir, distlim=distlim)

    fovs = sorted(counts["fov"].unique())
    ratios = neighborhood_analysis.compute_cell_ratios(
        counts, target_cells, reference_cells, fovs)
    scores = []
    for fov in fovs:
        fov_counts = counts[counts["fov"] == fov]
        score, total = neighborhood_analysis.compute_mixing_score(
            fov_counts.copy(), target_cells, reference_cells, mixing_type,
            ratio_threshold=ratio_threshold,
            cell_count_thresh=cell_count_thresh)
        scores.append({"fov": fov, "mixing_score": score,
                       "population_size": total})
    out = pd.DataFrame(scores).merge(ratios, on="fov")
    out.to_csv(os.path.join(base_dir, "mixing_scores.csv"), index=False)
    print(out)


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--base_dir", required=True)
    p.add_argument("--cell_table_path", required=True)
    p.add_argument("--target_cells", nargs="+", required=True)
    p.add_argument("--reference_cells", nargs="+", required=True)
    a = p.parse_args()
    main(a.base_dir, a.cell_table_path, a.target_cells, a.reference_cells)
