"""UMAP/PCA embedding-quality goldens: neighbor preservation, parameter
effects, PCA vs sklearn, and the tSNE/PCA visualization paths (reference
`dimensionality_reduction.py:63-120` over umap-learn/sklearn)."""

import matplotlib
matplotlib.use("Agg")

import numpy as np
import pytest

from ark_tpu.ops import umap as umap_ops


def _blobs(rng, k=4, n_per=50, d=8, sep=8.0, scale=0.4):
    centers = rng.normal(size=(k, d)) * sep
    data = (centers[:, None, :]
            + rng.normal(0, scale, (k, n_per, d))).reshape(-1, d)
    labels = np.repeat(np.arange(k), n_per)
    perm = rng.permutation(len(data))
    return data[perm].astype(np.float32), labels[perm]


def test_umap_embedding_preserves_cluster_structure(rng):
    data, labels = _blobs(rng)
    emb = umap_ops.UMAP(n_neighbors=10, n_epochs=150).fit_transform(data)
    assert emb.shape == (len(data), 2)
    # kNN purity in embedding space: neighbors share the source cluster
    from scipy.spatial.distance import cdist
    d = cdist(emb, emb)
    np.fill_diagonal(d, np.inf)
    nn = d.argsort(1)[:, :5]
    purity = (labels[nn] == labels[:, None]).mean()
    assert purity > 0.9
    # cluster centroids are separated relative to within-cluster spread
    cents = np.stack([emb[labels == i].mean(0) for i in range(4)])
    within = np.mean([emb[labels == i].std() for i in range(4)])
    between = cdist(cents, cents)[np.triu_indices(4, 1)].min()
    assert between > 1.5 * within


def test_umap_deterministic_given_seed(rng):
    data, _ = _blobs(rng, k=2, n_per=30)
    a = umap_ops.UMAP(random_state=7, n_epochs=50).fit_transform(data)
    b = umap_ops.UMAP(random_state=7, n_epochs=50).fit_transform(data)
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
    c = umap_ops.UMAP(random_state=8, n_epochs=50).fit_transform(data)
    assert not np.allclose(a, c)


def test_umap_n_components(rng):
    data, _ = _blobs(rng, k=2, n_per=25, d=6)
    emb3 = umap_ops.UMAP(n_components=3, n_epochs=30).fit_transform(data)
    assert emb3.shape == (50, 3)


def test_pca_matches_sklearn_subspace(rng):
    from sklearn.decomposition import PCA
    data, _ = _blobs(rng, k=3, n_per=40, d=10)
    ours = umap_ops.pca_transform(data, n_components=2)
    sk = PCA(n_components=2).fit_transform(data)
    # principal subspaces agree: per-component correlation ~1 up to sign
    for c in range(2):
        r = abs(np.corrcoef(ours[:, c], sk[:, c])[0, 1])
        assert r > 0.99, f"component {c} correlation {r:.4f}"
    # projections preserve the variance ordering
    assert ours[:, 0].var() >= ours[:, 1].var()


@pytest.mark.parametrize("algorithm", ["UMAP", "PCA", "tSNE"])
def test_visualize_dimensionality_reduction_algorithms(rng, tmp_path,
                                                       algorithm):
    import matplotlib.pyplot as plt
    import pandas as pd

    from ark_tpu.analysis import dimensionality_reduction as dr

    data, labels = _blobs(rng, k=2, n_per=30, d=5)
    df = pd.DataFrame(data, columns=[f"m{i}" for i in range(5)])
    df["cell_meta_cluster"] = np.where(labels == 0, "A", "B")
    dr.visualize_dimensionality_reduction(
        df, [f"m{i}" for i in range(5)], "cell_meta_cluster",
        algorithm=algorithm, save_dir=str(tmp_path))
    import os
    assert any(f.endswith(".png") for f in os.listdir(tmp_path))
    plt.close("all")


def test_visualize_dimensionality_reduction_bad_algorithm(rng):
    import pandas as pd

    from ark_tpu.analysis import dimensionality_reduction as dr
    df = pd.DataFrame({"m0": [1.0, 2.0], "cell_meta_cluster": ["A", "B"]})
    with pytest.raises(ValueError):
        dr.visualize_dimensionality_reduction(df, ["m0"],
                                              "cell_meta_cluster",
                                              algorithm="MDS")
