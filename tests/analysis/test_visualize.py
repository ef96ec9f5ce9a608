import matplotlib
matplotlib.use("Agg")

import os

import matplotlib.pyplot as plt
import numpy as np
import pandas as pd
import pytest

from ark_tpu.analysis import visualize
from ark_tpu.utils.labeled_array import DataArray

from tests import test_utils


@pytest.fixture
def cell_data(rng):
    df = test_utils.make_cell_table(n_cells=200)
    return df


def test_draw_boxplot(cell_data, tmp_path):
    visualize.draw_boxplot(cell_data, "marker0",
                           col_split="cell_meta_cluster",
                           save_dir=str(tmp_path), save_file="box.png")
    assert (tmp_path / "box.png").exists()
    plt.close("all")
    with pytest.raises(ValueError):
        visualize.draw_boxplot(cell_data, "not_a_column")
    with pytest.raises(ValueError):
        visualize.draw_boxplot(cell_data, "marker0", split_vals=["A"])


def test_draw_heatmap(rng, tmp_path):
    data = rng.normal(size=(10, 5))
    data[0, 0] = np.nan  # NaNs zeroed
    visualize.draw_heatmap(data, [f"r{i}" for i in range(10)],
                           [f"c{i}" for i in range(5)],
                           save_dir=str(tmp_path), save_file="heat.png")
    assert (tmp_path / "heat.png").exists()
    plt.close("all")


def test_population_distribution(cell_data, tmp_path):
    visualize.visualize_patient_population_distribution(
        cell_data, "PatientID", "cell_meta_cluster", save_dir=str(tmp_path))
    for f in ["PopulationDistribution.png",
              "TotalPopulationDistribution.png",
              "PopulationProportion.png"]:
        assert (tmp_path / f).exists()
    plt.close("all")


def test_get_sorted_data(cell_data):
    sorted_data = visualize.get_sorted_data(cell_data, "PatientID",
                                            "cell_meta_cluster")
    assert sorted_data.shape[1] == cell_data["cell_meta_cluster"].nunique()
    norm = visualize.get_sorted_data(cell_data, "PatientID",
                                     "cell_meta_cluster", is_normalized=True)
    np.testing.assert_allclose(norm.sum(axis=1), 1.0, rtol=1e-6)


def test_neighbor_cluster_metrics_plot(tmp_path):
    stats = DataArray(np.array([10.0, 6.0, 4.0, 3.0]),
                      coords={"cluster_num": [2, 3, 4, 5]})
    visualize.visualize_neighbor_cluster_metrics(stats, "inertia",
                                                 save_dir=str(tmp_path))
    assert (tmp_path / "neighborhood_inertia_scores.png").exists()
    plt.close("all")


def test_topic_eda_and_fov_stats_plots(tmp_path, rng):
    data = {
        "inertia": {3: 10.0, 4: 8.0},
        "silhouette": {3: 0.5, 4: 0.6},
        "gap_stat": {3: 0.1, 4: 0.2},
        "gap_sds": {3: 0.01, 4: 0.02},
        "cell_counts": {3: pd.DataFrame(rng.random((4, 3))),
                        4: pd.DataFrame(rng.random((4, 4)))},
        "featurization": "cluster",
    }
    visualize.visualize_topic_eda(data, metric="inertia",
                                  save_dir=str(tmp_path))
    assert (tmp_path / "topic_eda_inertia.png").exists()
    visualize.visualize_topic_eda(data, metric="cell_counts", k=3,
                                  save_dir=str(tmp_path))
    assert (tmp_path / "topic_eda_cell_counts_k_3.png").exists()
    with pytest.raises(ValueError):
        visualize.visualize_topic_eda(data, metric="cell_counts")  # no k
    plt.close("all")

    dens = {"cellular_density": {"fov0": 0.4, "fov1": 0.5},
            "average_area": {"fov0": 100, "fov1": 120},
            "total_cells": {"fov0": 300, "fov1": 250}}
    visualize.visualize_fov_stats(dens, metric="cellular_density",
                                  save_dir=str(tmp_path))
    assert (tmp_path / "fov_metrics_cellular_density.png").exists()
    plt.close("all")
