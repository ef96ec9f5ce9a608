import numpy as np
import pytest
import jax.numpy as jnp

from ark_tpu.ops import segment_reduce

from tests import test_utils


def _disk_labels(shape=(64, 64)):
    """Two disks + one square with known properties."""
    labels = np.zeros(shape, np.int32)
    yy, xx = np.mgrid[:shape[0], :shape[1]]
    labels[(yy - 16) ** 2 + (xx - 16) ** 2 <= 8 ** 2] = 1      # disk r=8
    labels[(yy - 45) ** 2 + (xx - 45) ** 2 <= 5 ** 2] = 2      # disk r=5
    labels[5:15, 40:60] = 3                                    # 10x20 rect
    return labels


def test_cell_sizes_and_channel_sums(rng):
    labels = _disk_labels()
    n = 4
    imgs = rng.random((64, 64, 3)).astype(np.float32)
    sizes = np.asarray(segment_reduce.cell_sizes(jnp.asarray(labels), n))
    for lab in range(1, 4):
        assert sizes[lab] == (labels == lab).sum()
    sums = np.asarray(segment_reduce.channel_sums(jnp.asarray(imgs),
                                                  jnp.asarray(labels), n))
    for lab in range(1, 4):
        np.testing.assert_allclose(sums[lab], imgs[labels == lab].sum(0),
                                   rtol=1e-4)
    pos = np.asarray(segment_reduce.positive_pixel_counts(
        jnp.asarray(imgs), jnp.asarray(labels), n, 0.5))
    for lab in range(1, 4):
        np.testing.assert_array_equal(pos[lab],
                                      (imgs[labels == lab] > 0.5).sum(0))


def test_centroids():
    labels = _disk_labels()
    cent = np.asarray(segment_reduce.centroids(jnp.asarray(labels), 4))
    np.testing.assert_allclose(cent[1], [16, 16], atol=0.01)
    np.testing.assert_allclose(cent[2], [45, 45], atol=0.01)
    np.testing.assert_allclose(cent[3], [9.5, 49.5], atol=0.01)


def test_moment_features_rectangle():
    labels = _disk_labels()
    feats = {k: np.asarray(v) for k, v in
             segment_reduce.moment_features(jnp.asarray(labels), 4).items()}
    # rectangle 10 rows x 20 cols
    assert feats["area"][3] == 200
    # uniform rect: major axis along cols, length = 4*sqrt(var); var of
    # discrete uniform over 20 ints = (20^2-1)/12
    expected_major = 4 * np.sqrt((20 ** 2 - 1) / 12)
    expected_minor = 4 * np.sqrt((10 ** 2 - 1) / 12)
    np.testing.assert_allclose(feats["major_axis_length"][3], expected_major,
                               rtol=1e-3)
    np.testing.assert_allclose(feats["minor_axis_length"][3], expected_minor,
                               rtol=1e-3)
    # disk: eccentricity ~ 0, equivalent diameter ~ 2r
    assert feats["eccentricity"][1] < 0.1
    np.testing.assert_allclose(feats["equivalent_diameter"][1],
                               2 * np.sqrt(feats["area"][1] / np.pi), rtol=1e-5)


def test_crofton_perimeter_disk_and_square():
    labels = _disk_labels()
    per = np.asarray(segment_reduce.crofton_perimeter(jnp.asarray(labels), 4))
    # disk r=8: true perimeter 2*pi*8 ~ 50.3 (crofton exact for disks, allow 8%)
    assert abs(per[1] - 2 * np.pi * 8) / (2 * np.pi * 8) < 0.08
    # rect 10x20: true 60; crofton under-estimates squares ~5%
    assert abs(per[3] - 60) / 60 < 0.08


def test_crofton_perimeter_touching_cells():
    # two touching squares: shared boundary counts for both
    labels = np.zeros((20, 20), np.int32)
    labels[5:15, 2:10] = 1
    labels[5:15, 10:18] = 2
    per = np.asarray(segment_reduce.crofton_perimeter(jnp.asarray(labels), 3))
    assert per[1] > 0 and per[2] > 0
    np.testing.assert_allclose(per[1], per[2], rtol=1e-5)  # symmetric shapes


def test_euler_numbers():
    labels = np.zeros((40, 40), np.int32)
    yy, xx = np.mgrid[:40, :40]
    labels[(yy - 10) ** 2 + (xx - 10) ** 2 <= 36] = 1          # solid disk
    ring = ((yy - 28) ** 2 + (xx - 28) ** 2 <= 64) & \
           ((yy - 28) ** 2 + (xx - 28) ** 2 >= 16)
    labels[ring] = 2                                           # annulus
    eul = np.asarray(segment_reduce.euler_numbers(jnp.asarray(labels), 3))
    assert eul[1] == 1.0    # solid: one component, no holes
    assert eul[2] == 0.0    # annulus: one component, one hole


def test_center_weighted_sums_matches_reference_formula(rng):
    labels = _disk_labels()
    imgs = rng.random((64, 64, 2)).astype(np.float32)
    out = np.asarray(segment_reduce.center_weighted_sums(
        jnp.asarray(imgs), jnp.asarray(labels), 4))
    # reference formula per cell (signal_extraction.py:29-56)
    for lab in range(1, 4):
        coords = np.argwhere(labels == lab)
        centroid = coords.mean(0)
        weights = np.linalg.norm(coords - centroid, ord=np.inf, axis=1)
        weights = 1 - weights / (weights.max() + 1)
        expected = weights @ imgs[coords[:, 0], coords[:, 1]]
        np.testing.assert_allclose(out[lab], expected, rtol=1e-3)


def test_moment_features_are_origin_independent():
    """The same cell must report identical shape wherever it sits in the
    FOV: raw f32 moments about the origin cancelled catastrophically
    (12-37% eccentricity error at the far corner of 2048-4096 squares);
    the two-pass central moments are exact."""
    yy, xx = np.mgrid[:24, :36]
    cell = ((yy - 12) / 11.0) ** 2 + ((xx - 18) / 17.0) ** 2 <= 1.0

    def feats_at(offset, size=4096):
        labels = np.zeros((size, size), np.int32)
        labels[offset:offset + 24, offset:offset + 36] = cell
        out = segment_reduce.moment_features(jnp.asarray(labels), 2)
        return {k: float(np.asarray(v)[1]) for k, v in out.items()}

    near = feats_at(0)
    far = feats_at(4096 - 40)
    for key in ("eccentricity", "major_axis_length", "minor_axis_length",
                "orientation"):
        assert near[key] == pytest.approx(far[key], rel=1e-3, abs=1e-3), key
    # and they match the small-image truth
    small = np.zeros((32, 44), np.int32)
    small[4:28, 4:40] = cell
    truth = segment_reduce.moment_features(jnp.asarray(small), 2)
    assert far["eccentricity"] == pytest.approx(
        float(np.asarray(truth["eccentricity"])[1]), rel=1e-3)
