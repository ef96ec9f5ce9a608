"""visualize module round-2 coverage: crosstab sorting goldens, heatmap
options, barchart/boxplot variants and validation (reference
`visualize.py:11-467`)."""

import matplotlib
matplotlib.use("Agg")

import os

import matplotlib.pyplot as plt
import numpy as np
import pandas as pd
import pytest

from ark_tpu.analysis import visualize


@pytest.fixture()
def cell_data(rng):
    return pd.DataFrame({
        "PatientID": rng.choice([1, 2, 3], 200,
                                p=[0.6, 0.3, 0.1]),
        "cell_meta_cluster": rng.choice(["A", "B", "C"], 200,
                                        p=[0.5, 0.3, 0.2]),
        "marker0": rng.random(200),
    })


def test_get_sorted_data_marginal_ordering(cell_data):
    out = visualize.get_sorted_data(cell_data, "PatientID",
                                    "cell_meta_cluster")
    # rows ordered by patient cell count descending, cols by population
    patient_counts = cell_data.groupby("PatientID").size()
    assert list(out.index) == list(
        patient_counts.sort_values(ascending=False).index)
    pop_counts = cell_data.groupby("cell_meta_cluster").size()
    assert list(out.columns) == list(
        pop_counts.sort_values(ascending=False).index)
    # crosstab values golden
    want = pd.crosstab(cell_data["PatientID"],
                       cell_data["cell_meta_cluster"])
    for p in out.index:
        for c in out.columns:
            assert out.loc[p, c] == want.loc[p, c]
    # normalized rows sum to 1
    norm = visualize.get_sorted_data(cell_data, "PatientID",
                                     "cell_meta_cluster",
                                     is_normalized=True)
    np.testing.assert_allclose(norm.sum(axis=1), 1.0, rtol=1e-9)


def test_draw_boxplot_split_vals_and_validation(cell_data, tmp_path):
    visualize.draw_boxplot(cell_data, "marker0",
                           col_split="cell_meta_cluster",
                           split_vals=["A", "B"], save_dir=str(tmp_path),
                           save_file="bp.png")
    assert os.path.exists(tmp_path / "bp.png")
    plt.close("all")
    with pytest.raises(ValueError, match="col_split must also"):
        visualize.draw_boxplot(cell_data, "marker0", split_vals=["A"])
    with pytest.raises(ValueError):
        visualize.draw_boxplot(cell_data, "no_such_column")
    with pytest.raises(ValueError):
        visualize.draw_boxplot(cell_data, "marker0",
                               col_split="cell_meta_cluster",
                               split_vals=["ZZZ"])


def test_draw_heatmap_options_and_nan_handling(tmp_path, rng):
    data = rng.normal(size=(6, 4))
    data[0, 0] = np.nan
    data[1, 1] = np.inf
    row_colors = [(1, 0, 0)] * 3 + [(0, 0, 1)] * 3
    visualize.draw_heatmap(
        data, [f"r{i}" for i in range(6)], [f"c{i}" for i in range(4)],
        center_val=0, min_val=-3, max_val=3, cbar_ticks=[-3, 0, 3],
        row_colors=row_colors, row_cluster=False,
        save_dir=str(tmp_path), save_file="hm.png")
    assert os.path.exists(tmp_path / "hm.png")
    plt.close("all")


def test_plot_barchart_and_distribution_files(cell_data, tmp_path):
    visualize.visualize_patient_population_distribution(
        cell_data, "PatientID", "cell_meta_cluster", save_dir=str(tmp_path))
    for f in ("PopulationDistribution.png",
              "TotalPopulationDistribution.png",
              "PopulationProportion.png"):
        assert os.path.exists(tmp_path / f)
    plt.close("all")


def test_visualize_fov_stats_metrics(tmp_path, rng):
    data = pd.DataFrame({
        "fov": [f"fov{i}" for i in range(6)],
        "cellular_density": rng.random(6),
        "average_area": rng.uniform(50, 200, 6),
        "total_cells": rng.integers(500, 3000, 6),
    })
    visualize.visualize_fov_stats(data, metric="cellular_density",
                                  save_dir=str(tmp_path))
    assert any(f.endswith(".png") for f in os.listdir(tmp_path))
    plt.close("all")
