"""Pipeline template: general visualization (equivalent of
`templates/example_visualization.ipynb`): population distributions, heatmaps,
and dimensionality-reduction scatters."""

import argparse
import os

import pandas as pd

from ark_tpu.analysis import dimensionality_reduction, visualize


def main(base_dir, cell_table_path, markers, patient_col="PatientID",
         population_col="cell_meta_cluster"):
    save_dir = os.path.join(base_dir, "viz")
    os.makedirs(save_dir, exist_ok=True)
    cell_data = pd.read_csv(cell_table_path)

    visualize.visualize_patient_population_distribution(
        cell_data, patient_col, population_col, save_dir=save_dir)
    visualize.draw_boxplot(cell_data, markers[0], col_split=population_col,
                           save_dir=save_dir, save_file="boxplot.png")
    dimensionality_reduction.visualize_dimensionality_reduction(
        cell_data, markers, population_col, algorithm="UMAP",
        save_dir=save_dir)
    print(f"plots saved to {save_dir}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--base_dir", required=True)
    p.add_argument("--cell_table_path", required=True)
    p.add_argument("--markers", nargs="+", required=True)
    a = p.parse_args()
    main(a.base_dir, a.cell_table_path, a.markers)
