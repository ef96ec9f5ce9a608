import numpy as np
import jax.numpy as jnp
import pytest

from ark_tpu.ops import classical, distances as dist_ops, morphology


def test_binary_erosion():
    mask = np.zeros((16, 16), bool)
    mask[4:12, 4:12] = True
    out = np.asarray(morphology.binary_erosion(jnp.asarray(mask)))
    assert out[5:11, 5:11].all()
    assert not out[4, 4:12].any()        # boundary eroded
    two = np.asarray(morphology.binary_erosion(jnp.asarray(mask),
                                               iterations=2))
    assert two.sum() == 4 * 4


def test_remove_small_objects():
    labels = np.zeros((20, 20), np.int32)
    labels[2:4, 2:4] = 1       # 4 px — small
    labels[8:16, 8:16] = 2     # 64 px — kept
    out = morphology.remove_small_objects(labels, min_size=5)
    assert (out != 1).all()
    assert (out[8:16, 8:16] == 2).all()


def test_knn_mean_distance():
    d = jnp.asarray(np.array([[0.0, 1.0, 2.0, 3.0],
                              [0.0, 5.0, 4.0, 6.0]], np.float32))
    out = np.asarray(dist_ops.knn_mean_distance(d, k=2))
    # zeros (self-distances) are excluded
    np.testing.assert_allclose(out, [1.5, 4.5])


def test_local_adaptive_threshold():
    # bright square on dark background: an adaptive threshold fires just
    # inside the edge (above the local mean) and not just outside or in
    # flat regions (equal to their local mean)
    img = np.zeros((64, 64), np.float32)
    img[16:48, 16:48] = 1.0
    out = classical.local_adaptive_threshold(img, block_size=15)
    assert out[17, 30]          # just inside the top edge
    assert not out[14, 30]      # just outside
    assert not out[4, 4]        # flat background
    assert not out[32, 32]      # flat interior == its local mean
    assert out.dtype == bool


def test_meijering_highlights_thin_ridges(rng):
    img = rng.uniform(0, 0.02, (64, 64)).astype(np.float32)
    img[:, 31:33] += 1.0                    # vertical ridge
    resp = np.asarray(classical.meijering(img, sigmas=[1, 2]))
    ridge = resp[10:54, 31:33].mean()
    bg = resp[10:54, 5:15].mean()
    assert ridge > 3 * max(bg, 1e-9)
