"""Pipeline template: spatial-LDA (equivalent of `LDA_Preprocessing.ipynb` +
`LDA_Training_and_Inference.ipynb`): featurization → difference matrices →
JAX LDA train/infer."""

import argparse
import os

import pandas as pd

from ark_tpu.spLDA import model as lda_model
from ark_tpu.spLDA import processing as pros
from ark_tpu.utils import spatial_lda_utils


def main(base_dir, cell_table_path, clusters=None, n_topics=5, radius=100,
         difference_penalty=0.25):
    cell_table = pd.read_csv(cell_table_path)
    if clusters is None:
        clusters = sorted(cell_table["cell_meta_cluster"].unique())

    # preprocessing
    cell_table_format = pros.format_cell_table(cell_table, clusters=clusters)
    features = pros.featurize_cell_table(cell_table_format,
                                         featurization="cluster",
                                         radius=radius)
    diff_mats = pros.create_difference_matrices(cell_table_format, features)

    # topic-count EDA
    eda = pros.compute_topic_eda(features["train_features"], "cluster",
                                 topics=list(range(3, 8)), num_boots=25)
    print("inertia:", eda["inertia"])

    # train + infer
    model = lda_model.train(features["train_features"],
                            difference_matrices=diff_mats["train_diff_mat"],
                            n_topics=n_topics,
                            difference_penalty=difference_penalty)
    inferred = lda_model.infer(
        model, features["featurized_fovs"],
        difference_matrices=diff_mats["inference_diff_mat"])

    out_dir = os.path.join(base_dir, "spatial_analysis", "spatial_lda")
    os.makedirs(out_dir, exist_ok=True)
    spatial_lda_utils.save_spatial_lda_file(model, out_dir, "lda_model",
                                            format="pkl")
    inferred.to_csv(os.path.join(out_dir, "topic_weights.csv"))
    print("spatial-LDA complete")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--base_dir", required=True)
    p.add_argument("--cell_table_path", required=True)
    p.add_argument("--n_topics", type=int, default=5)
    a = p.parse_args()
    main(a.base_dir, a.cell_table_path, n_topics=a.n_topics)
