"""spatial-LDA pipeline tests with planted topic structure."""

import numpy as np
import pandas as pd
import pytest

from ark_tpu import settings
from ark_tpu.spLDA import featurization as ft
from ark_tpu.spLDA import model as lda_model
from ark_tpu.spLDA import processing as pros
from ark_tpu.utils import spatial_lda_utils as spu

from tests import test_utils


@pytest.fixture(scope="module")
def lda_cell_table():
    """Cell table with two spatial 'environments' per FOV: the left half is
    dominated by types A/B, the right half by C/D — LDA should find them."""
    rng = np.random.default_rng(12345)
    rows = []
    for fov in ["fov0", "fov1"]:
        for i in range(1, 301):
            x = rng.uniform(0, 1024)
            y = rng.uniform(0, 1024)
            if x < 512:
                ct = rng.choice(["A", "B"], p=[0.7, 0.3])
            else:
                ct = rng.choice(["C", "D"], p=[0.6, 0.4])
            rows.append({settings.FOV_ID: fov, settings.CELL_LABEL: i,
                         settings.CELL_SIZE: float(rng.integers(50, 200)),
                         settings.CENTROID_0: x, settings.CENTROID_1: y,
                         settings.CELL_TYPE: ct,
                         "marker1": rng.random(), "marker2": rng.random()})
    return pd.DataFrame(rows)


def test_format_cell_table(lda_cell_table):
    fmt = pros.format_cell_table(lda_cell_table, clusters=["A", "B", "C", "D"])
    assert set(fmt["fovs"]) == {"fov0", "fov1"}
    assert {"x", "y", "cluster", "is_index"}.issubset(fmt["fov0"].columns)
    # bad inputs
    with pytest.raises(ValueError):
        pros.format_cell_table(lda_cell_table)


def test_featurize_and_difference_matrices(lda_cell_table):
    fmt = pros.format_cell_table(lda_cell_table, clusters=["A", "B", "C", "D"])
    features = pros.featurize_cell_table(fmt, featurization="cluster",
                                         radius=100, train_frac=0.75)
    feats = features["featurized_fovs"]
    assert set(feats.columns) == {"A", "B", "C", "D"}
    assert len(feats) == 600
    assert len(features["train_features"]) == 450
    # left-half cells should see mostly A/B neighbors
    fov0 = fmt["fov0"]
    left_cells = fov0.index[fov0["x"] < 400]
    left_feats = feats.loc["fov0"].loc[left_cells]
    assert (left_feats[["A", "B"]].sum(1)
            > left_feats[["C", "D"]].sum(1)).mean() > 0.95

    diff = pros.create_difference_matrices(fmt, features)
    dm = diff["train_diff_mat"]["fov0"]
    n_cells = len(features["train_features"].loc["fov0"])
    assert dm.shape == (n_cells - 1, n_cells)  # MST has n-1 edges
    # each row is one +1/-1 edge
    assert (np.abs(dm).sum(1) == 2).all()
    assert np.allclose(dm.sum(1), 0)


def test_lda_train_recovers_environments(lda_cell_table):
    fmt = pros.format_cell_table(lda_cell_table, clusters=["A", "B", "C", "D"])
    features = pros.featurize_cell_table(fmt, featurization="cluster",
                                         radius=100)
    diff = pros.create_difference_matrices(fmt, features)
    model = lda_model.train(features["train_features"],
                            difference_matrices=diff["train_diff_mat"],
                            n_topics=2, n_iters=30, seed=42)
    assert model.components_.shape == (2, 4)
    np.testing.assert_allclose(model.components_.sum(1), 1.0, rtol=1e-4)
    tw = model.topic_weights
    assert tw.shape == (len(features["train_features"]), 2)
    np.testing.assert_allclose(tw.values.sum(1), 1.0, rtol=1e-4)

    # the two topics should separate the A/B vs C/D environments
    fov0_feats = features["train_features"].loc["fov0"]
    ab_heavy = (fov0_feats[["A", "B"]].sum(1)
                > fov0_feats[["C", "D"]].sum(1)).values
    dom0 = tw.loc["fov0"].values.argmax(1)
    # purity: most AB-heavy cells in one topic, CD-heavy in the other
    purity = max((dom0[ab_heavy] == 0).mean() + (dom0[~ab_heavy] == 1).mean(),
                 (dom0[ab_heavy] == 1).mean() + (dom0[~ab_heavy] == 0).mean())
    assert purity > 1.5  # out of 2.0

    # inference on the full set
    inferred = lda_model.infer(model, features["featurized_fovs"],
                               difference_matrices=diff["inference_diff_mat"],
                               n_iters=20)
    assert inferred.shape == (600, 2)
    np.testing.assert_allclose(inferred.values.sum(1), 1.0, rtol=1e-4)


def test_topic_eda_and_density(lda_cell_table):
    fmt = pros.format_cell_table(lda_cell_table, clusters=["A", "B", "C", "D"])
    features = pros.featurize_cell_table(fmt, featurization="cluster",
                                         radius=100)
    eda = pros.compute_topic_eda(features["train_features"],
                                 featurization="cluster", topics=[3, 4],
                                 silhouette=True, num_boots=25)
    assert set(eda["inertia"].keys()) == {3, 4}
    assert eda["inertia"][3] >= eda["inertia"][4]
    assert "gap_stat" in eda and 3 in eda["gap_stat"]
    assert eda["cell_counts"][3].shape[1] == 3

    dens = pros.fov_density(fmt)
    assert set(dens["total_cells"].keys()) == {"fov0", "fov1"}
    assert dens["total_cells"]["fov0"] == 300


def test_save_read_lda_file(tmp_path, lda_cell_table):
    d = {"a": 1}
    spu.save_spatial_lda_file(d, str(tmp_path), "obj", format="pkl")
    back = spu.read_spatial_lda_file(str(tmp_path), "obj", format="pkl")
    assert back == d
    df = pd.DataFrame({"x": [1, 2]})
    spu.save_spatial_lda_file(df, str(tmp_path), "frame", format="csv")
    with pytest.raises(ValueError):
        spu.save_spatial_lda_file(d, str(tmp_path), "bad", format="csv")


def test_visualize_fov_graphs(lda_cell_table, tmp_path):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from ark_tpu.analysis import visualize

    fmt = pros.format_cell_table(lda_cell_table, clusters=["A", "B", "C", "D"])
    features = pros.featurize_cell_table(fmt, featurization="cluster",
                                         radius=100, train_frac=0.75)
    diff = pros.create_difference_matrices(fmt, features)
    visualize.visualize_fov_graphs(fmt, features, diff, fovs=["fov0"],
                                   save_dir=str(tmp_path))
    assert (tmp_path / "adjacency_graph_fovs_fov0.png").exists()
    plt.close("all")
