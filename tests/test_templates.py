"""End-to-end template tests: the equivalent of the reference's testbook
notebook suite (SURVEY.md §4) — each pipeline template runs against a tiny
synthetic cohort on the CPU backend."""

import matplotlib
matplotlib.use("Agg")

import os
import sys

import numpy as np
import pandas as pd
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "templates"))

from tests import test_utils

FOVS = ["fov0", "fov1"]
CHANNELS = ["chan0", "chan1", "chan2", "chan3"]


@pytest.fixture(scope="module")
def cohort_dir(tmp_path_factory):
    base = tmp_path_factory.mktemp("cohort")
    data = test_utils.create_image_cohort(
        str(base / "image_data"), FOVS, CHANNELS, shape=(48, 48), n_cells=12)
    seg_dir = base / "segmentation" / "deepcell_output"
    test_utils.save_label_dir(str(seg_dir), data)
    for fov in FOVS:  # nuclear masks = same labels (eroded)
        from ark_tpu.ops import morphology
        from ark_tpu.io.image_utils import save_image
        save_image(str(seg_dir / f"{fov}_nuclear.tiff"),
                   morphology.erode_mask(data[fov][0]).astype(np.int32))
    return base, data


def test_template_2_and_3_chain(cohort_dir):
    base, data = cohort_dir
    base_dir = str(base)
    os.makedirs(os.path.join(base_dir, "pixel_output_dir"), exist_ok=True)

    import importlib
    t2 = importlib.import_module("2_pixie_cluster_pixels")
    t2.main(base_dir, list(CHANNELS), fovs=FOVS, img_sub_folder=None,
            seg_dir=os.path.join(base_dir, "segmentation",
                                 "deepcell_output"),
            max_k=5, subset_proportion=0.5)
    assert os.path.exists(os.path.join(base_dir,
                                       "pixel_channel_avg_meta_cluster.csv"))

    # build a remap csv (the [interactive] step) and apply it so template 3
    # can use renamed meta clusters
    from ark_tpu.phenotyping import pixel_meta_clustering
    som_avg = pd.read_csv(os.path.join(base_dir,
                                       "pixel_channel_avg_som_cluster.csv"))
    remap = som_avg[["pixel_som_cluster", "pixel_meta_cluster"]].copy()
    remap["pixel_meta_cluster_rename"] = remap["pixel_meta_cluster"].map(
        lambda m: f"pmc_{m}")
    remap.to_csv(os.path.join(base_dir, "pixel_remap.csv"), index=False)
    pixel_meta_clustering.apply_pixel_meta_cluster_remapping(
        FOVS, list(CHANNELS), base_dir, "pixel_mat_data", "pixel_remap.csv")
    pixel_meta_clustering.generate_remap_avg_files(
        FOVS, list(CHANNELS), base_dir, "pixel_mat_data", "pixel_remap.csv",
        "pixel_channel_avg_som_cluster.csv",
        "pixel_channel_avg_meta_cluster.csv")

    # a cell table matching the segmentation labels
    rows = []
    for fov in FOVS:
        labels = data[fov][0]
        for lab in np.unique(labels)[1:]:
            rows.append({"fov": fov, "label": int(lab),
                         "cell_size": float((labels == lab).sum())})
    cell_table_path = os.path.join(base_dir, "cell_table.csv")
    pd.DataFrame(rows).to_csv(cell_table_path, index=False)

    t3 = importlib.import_module("3_pixie_cluster_cells")
    t3.main(base_dir, list(CHANNELS), cell_table_path, fovs=FOVS, max_k=3)
    assert os.path.exists(os.path.join(base_dir,
                                       "cell_som_cluster_channel_avg.csv"))


def test_template_neighborhood_and_enrichment(cohort_dir, tmp_path):
    base, _ = cohort_dir
    base_dir = str(tmp_path)
    rng = np.random.default_rng(12345)
    rows = []
    for fov in FOVS:
        centroids, pops = test_utils.make_planted_proximity_centroids(
            rng, n_a=15, n_b=15, n_bg=30, img_size=400, pair_dist=10)
        for i, (c, p) in enumerate(zip(centroids, pops), start=1):
            rows.append({"fov": fov, "label": i, "cell_meta_cluster": p,
                         "cell_size": 50.0,
                         "centroid-0": c[0], "centroid-1": c[1]})
    ct = pd.DataFrame(rows)
    ct_path = os.path.join(base_dir, "cell_table.csv")
    ct.to_csv(ct_path, index=False)

    import importlib
    tn = importlib.import_module("neighborhood_analysis")
    tn.main(base_dir, ct_path, distlim=30, cluster_num=2)
    assert os.path.exists(os.path.join(base_dir,
                                       "cell_table_neighborhoods.csv"))

    te = importlib.import_module("spatial_enrichment")
    te.main(base_dir, ct_path, dist_lim=15, bootstrap_num=50)
    stats = pd.read_csv(os.path.join(base_dir,
                                     "spatial_enrichment_stats.csv"))
    ab = stats[(stats.pheno1 == "A") & (stats.pheno2 == "B")]
    assert (ab["z"] > 2).all()   # planted signal found in both FOVs

    tc = importlib.import_module("cell_neighbors_analysis")
    tc.main(base_dir, ct_path, pixel_radius=100, k=3)
    assert os.path.exists(os.path.join(base_dir,
                                       "neighborhood_diversity.csv"))


def test_template_lda(cohort_dir, tmp_path):
    base_dir = str(tmp_path)
    rng = np.random.default_rng(12345)
    rows = []
    for fov in FOVS:
        for i in range(1, 101):
            x = rng.uniform(0, 512)
            ct = rng.choice(["A", "B"]) if x < 256 else rng.choice(["C", "D"])
            rows.append({"fov": fov, "label": i, "cell_size": 60.0,
                         "centroid-0": x,
                         "centroid-1": rng.uniform(0, 512),
                         "cell_meta_cluster": ct})
    ct_path = os.path.join(base_dir, "cell_table.csv")
    pd.DataFrame(rows).to_csv(ct_path, index=False)
    import importlib
    tl = importlib.import_module("lda_preprocessing_training_inference")
    tl.main(base_dir, ct_path, n_topics=2)
    assert os.path.exists(os.path.join(
        base_dir, "spatial_analysis", "spatial_lda", "topic_weights.csv"))


def test_template_stitching_and_anndata(tmp_path):
    rng = np.random.default_rng(12345)
    base_dir = str(tmp_path)
    test_utils.create_image_cohort(
        os.path.join(base_dir, "image_data"),
        ["t_R1C1", "t_R1C2", "t_R2C1", "t_R2C2"], ["chan0"], shape=(16, 16))
    import importlib
    ts = importlib.import_module("image_stitching")
    ts.main(base_dir)
    assert os.path.exists(os.path.join(base_dir, "stitched_images", "t",
                                       "chan0_stitched.tiff"))

    ct = test_utils.make_cell_table(n_cells=40, fovs=FOVS)
    cols = (["cell_size"] + [c for c in ct.columns if c.startswith("marker")]
            + ["label", "fov", "PatientID", "cell_meta_cluster",
               "centroid-0", "centroid-1"])
    ct_path = os.path.join(base_dir, "ct.csv")
    ct[cols].to_csv(ct_path, index=False)
    ta = importlib.import_module("anndata_conversion")
    ta.main(base_dir, ct_path)
    assert os.path.exists(os.path.join(base_dir, "adata", "fov0.h5ad"))
