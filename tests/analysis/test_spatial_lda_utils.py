"""spatial_lda_utils coverage: validators, gap-stat within-cluster sums
(golden vs explicit loop), plot factory, and file persistence (reference
`spatial_lda_utils.py:17-270`)."""

import matplotlib
matplotlib.use("Agg")

import numpy as np
import pandas as pd
import pytest

from ark_tpu import settings
from ark_tpu.spLDA import processing as pros
from ark_tpu.utils import spatial_lda_utils as spu

from tests import test_utils


@pytest.fixture()
def formatted(rng):
    ct = test_utils.make_cell_table(n_cells=150, fovs=["fov0", "fov1"])
    return pros.format_cell_table(ct, clusters=["A", "B", "C"]), ct


def test_check_format_cell_table_args(rng):
    ct = test_utils.make_cell_table(n_cells=30)
    with pytest.raises(ValueError, match="cannot both be None"):
        spu.check_format_cell_table_args(ct, None, None)
    with pytest.raises(ValueError, match="empty"):
        spu.check_format_cell_table_args(ct, [], None)
    with pytest.raises(ValueError, match="empty"):
        spu.check_format_cell_table_args(ct, None, [])
    with pytest.raises(ValueError):
        spu.check_format_cell_table_args(ct, ["not_a_marker"], None)
    with pytest.raises(ValueError):
        spu.check_format_cell_table_args(ct, None, ["NotACluster"])
    spu.check_format_cell_table_args(ct, ["marker0"], ["A"])  # valid


def test_check_featurize_cell_table_args(formatted):
    fmt, _ = formatted
    with pytest.raises(TypeError):
        spu.check_featurize_cell_table_args(fmt, "cluster", 50.0, "is_index")
    with pytest.raises(ValueError, match="less than 25"):
        spu.check_featurize_cell_table_args(fmt, "cluster", 10, "is_index")
    with pytest.raises(ValueError):
        spu.check_featurize_cell_table_args(fmt, "bogus", 100, "is_index")
    with pytest.raises(ValueError):  # unknown cell_index column
        spu.check_featurize_cell_table_args(fmt, "cluster", 100, "label")
    spu.check_featurize_cell_table_args(fmt, "cluster", 100, "is_index")


def test_within_cluster_sums_matches_loop(rng):
    data = rng.normal(size=(40, 3))
    labels = rng.integers(0, 3, 40)
    got = spu.within_cluster_sums(data, labels)
    want = 0.0
    for k in range(3):
        pts = data[labels == k]
        n = len(pts)
        s = 0.0
        for i in range(n):
            for j in range(i + 1, n):
                s += np.linalg.norm(pts[i] - pts[j])
        want += s / (2 * n)
    assert got == pytest.approx(want, rel=1e-9)
    # single point per cluster contributes zero
    assert spu.within_cluster_sums(data[:3], np.arange(3)) == 0.0


def test_make_plot_fn_and_errors(formatted, rng):
    fmt, _ = formatted
    features = pros.featurize_cell_table(fmt, featurization="cluster",
                                         radius=100)
    diff = pros.create_difference_matrices(fmt, features)
    fn = spu.make_plot_fn(plot="adjacency",
                          difference_matrices=diff["train_diff_mat"])
    assert callable(fn)
    with pytest.raises(ValueError, match="difference_matrices"):
        spu.make_plot_fn(plot="adjacency")
    with pytest.raises(ValueError, match="topic_weights"):
        spu.make_plot_fn(plot="topic_assignment")
    with pytest.raises(ValueError):
        spu.make_plot_fn(plot="nonsense")


def test_plot_topics_heatmap_smoke(rng):
    import matplotlib.pyplot as plt
    topics = rng.dirichlet(np.ones(4), size=3)   # 3 topics x 4 features
    spu.plot_topics_heatmap(topics, ["A", "B", "C", "D"])
    plt.close("all")


def test_save_read_roundtrip_and_errors(tmp_path, rng):
    df = pd.DataFrame({"a": [1, 2], "b": [3.0, 4.0]})
    spu.save_spatial_lda_file(df, str(tmp_path), "tbl", format="csv")
    back = spu.read_spatial_lda_file(str(tmp_path), "tbl", format="csv")
    np.testing.assert_allclose(back["b"].values, df["b"].values)

    blob = {"weights": rng.random(5)}
    spu.save_spatial_lda_file(blob, str(tmp_path), "blob", format="pkl")
    back2 = spu.read_spatial_lda_file(str(tmp_path), "blob", format="pkl")
    np.testing.assert_allclose(back2["weights"], blob["weights"])

    with pytest.raises(ValueError, match="dict"):
        spu.save_spatial_lda_file(blob, str(tmp_path), "x", format="csv")
    with pytest.raises(ValueError, match="valid directory"):
        spu.save_spatial_lda_file(df, str(tmp_path / "nope"), "x")
    with pytest.raises(ValueError, match="format"):
        spu.save_spatial_lda_file(df, str(tmp_path), "x", format="json")
    # path validation precedes the format check...
    with pytest.raises(FileNotFoundError):
        spu.read_spatial_lda_file(str(tmp_path), "tbl", format="json")
    # ...and an existing file with an unsupported format still errors
    (tmp_path / "tbl.json").write_text("{}")
    with pytest.raises(ValueError, match="format"):
        spu.read_spatial_lda_file(str(tmp_path), "tbl", format="json")


def test_format_cell_table_structure(formatted):
    fmt, ct = formatted
    # per-FOV frames with x/y/cluster renames + is_index bookkeeping
    for fov in ["fov0", "fov1"]:
        assert fov in fmt
        sub = fmt[fov]
        for col in ("x", "y", "cluster"):
            assert col in sub.columns
        n_src = (ct[settings.FOV_ID] == fov).sum()
        assert len(sub) <= n_src      # filtered to requested clusters
