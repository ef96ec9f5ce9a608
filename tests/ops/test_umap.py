import matplotlib
matplotlib.use("Agg")

import numpy as np
import pandas as pd

from ark_tpu.ops import umap as umap_ops
from ark_tpu.analysis import dimensionality_reduction as dr


def _blobs(rng, n_per=60, d=8):
    centers = np.array([[0] * d, [8] * d, [-8] * d], float)
    data = np.concatenate([
        c + rng.normal(0, 0.5, (n_per, d)) for c in centers]).astype(np.float32)
    labels = np.repeat(np.arange(3), n_per)
    return data, labels


def _separation(emb, labels):
    """Ratio of mean inter-cluster to mean intra-cluster distance."""
    intra, inter = [], []
    cents = np.stack([emb[labels == i].mean(0) for i in range(3)])
    for i in range(3):
        intra.append(np.linalg.norm(emb[labels == i] - cents[i], axis=1).mean())
    for i in range(3):
        for j in range(i + 1, 3):
            inter.append(np.linalg.norm(cents[i] - cents[j]))
    return np.mean(inter) / np.mean(intra)


def test_umap_separates_blobs(rng):
    data, labels = _blobs(rng)
    emb = umap_ops.UMAP(n_epochs=100, random_state=42).fit_transform(data)
    assert emb.shape == (180, 2)
    assert np.isfinite(emb).all()
    assert _separation(emb, labels) > 3.0


def test_pca_transform(rng):
    data, labels = _blobs(rng)
    emb = umap_ops.pca_transform(data)
    assert emb.shape == (180, 2)
    assert _separation(emb, labels) > 3.0


def test_visualize_dimensionality_reduction(rng, tmp_path):
    data, labels = _blobs(rng, n_per=30)
    df = pd.DataFrame(data, columns=[f"m{i}" for i in range(8)])
    df["pop"] = [f"p{i}" for i in labels]
    for algo in ["PCA", "UMAP"]:
        dr.visualize_dimensionality_reduction(
            df, [f"m{i}" for i in range(8)], "pop", algorithm=algo,
            save_dir=str(tmp_path))
    assert (tmp_path / "PCAVisualization.png").exists()
    assert (tmp_path / "UMAPVisualization.png").exists()
