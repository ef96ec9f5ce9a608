"""Batched connected-components (`ops/cc.py` label_batched /
area_filter_batched): scipy array-equality oracles per image, agreement
with the single-image kernel, and the joint convergence flag.

The batched path re-expresses the Shiloach–Vishkin rounds with a JOINT
early-out (vmapping the single-image kernel would select both cond
branches); these tests pin that the lockstep rewrite changes nothing
observable.
"""

import numpy as np
import pytest
import scipy.ndimage as ndi

jnp = pytest.importorskip("jax.numpy")

from ark_tpu.ops import cc  # noqa: E402


@pytest.fixture()
def rng():
    return np.random.default_rng(12345)


def _random_stack(rng, b=4, hw=48, p=0.55):
    noise = rng.random((b, hw, hw))
    return np.stack([ndi.gaussian_filter(n, 1.5) for n in noise]) > p


@pytest.mark.parametrize("connectivity", [1, 2])
def test_label_batched_matches_scipy(rng, connectivity):
    masks = _random_stack(rng)
    labels, counts, done = cc.label_batched(jnp.asarray(masks),
                                            connectivity=connectivity)
    assert bool(done)
    structure = None if connectivity == 1 else np.ones((3, 3))
    for b in range(masks.shape[0]):
        want, n_want = ndi.label(masks[b], structure=structure)
        np.testing.assert_array_equal(np.asarray(labels[b]), want)
        assert int(counts[b]) == n_want


def test_label_batched_matches_single_image(rng):
    masks = _random_stack(rng, b=3, hw=40)
    labels, counts, done = cc.label_batched(jnp.asarray(masks))
    assert bool(done)
    for b in range(masks.shape[0]):
        single, n_single = cc.label(jnp.asarray(masks[b]))
        np.testing.assert_array_equal(np.asarray(labels[b]),
                                      np.asarray(single))
        assert int(counts[b]) == int(n_single)


def test_label_batched_empty_and_full():
    masks = np.stack([np.zeros((16, 16), bool), np.ones((16, 16), bool)])
    labels, counts, done = cc.label_batched(jnp.asarray(masks))
    assert bool(done)
    assert int(counts[0]) == 0 and int(counts[1]) == 1
    np.testing.assert_array_equal(np.asarray(labels[0]), 0)
    np.testing.assert_array_equal(np.asarray(labels[1]), 1)


def test_area_filter_batched_oracle(rng):
    masks = _random_stack(rng, b=3, hw=40)
    labels = np.stack([ndi.label(m)[0] for m in masks])
    for n_max in (None, 63):
        got, ok = cc.area_filter_batched(jnp.asarray(labels),
                                         min_area=5, max_area=60,
                                         n_max=n_max)
        assert bool(ok)
        got = np.asarray(got)
        for b in range(labels.shape[0]):
            counts = np.bincount(labels[b].ravel())
            want = labels[b].copy()
            for lab_id in range(1, counts.size):
                if counts[lab_id] < 5 or counts[lab_id] > 60:
                    want[want == lab_id] = 0
            np.testing.assert_array_equal(got[b], want)


def test_area_filter_batched_keeps_ids(rng):
    """Surviving labels keep their original ids (map_array semantics)."""
    labels = np.zeros((1, 20, 20), np.int32)
    labels[0, :2, :2] = 1          # area 4
    labels[0, 5:10, 5:10] = 7      # area 25
    got, ok = cc.area_filter_batched(jnp.asarray(labels), min_area=5)
    assert bool(ok)
    assert set(np.unique(np.asarray(got))) == {0, 7}


def test_area_filter_batched_n_max_overflow_flag(rng):
    """A label beyond the bounded table must clear the in_range flag (the
    device-postprocess fallback signal), not silently drop pixels."""
    labels = np.zeros((1, 8, 8), np.int32)
    labels[0, 0, 0] = 100
    _, ok = cc.area_filter_batched(jnp.asarray(labels), min_area=1,
                                   n_max=63)
    assert not bool(ok)


def test_label_batched_small_sparse_dots(rng):
    """Scattered tiny components (the watershed-marker regime): scipy-
    exact numbering with the converged flag set."""
    masks = np.zeros((3, 48, 48), bool)
    for b in range(3):
        ys, xs = rng.integers(2, 46, (2, 30))
        masks[b, ys, xs] = True           # dots, some adjacent pairs
    labels, counts, done = cc.label_batched_small(jnp.asarray(masks))
    assert bool(done)
    for b in range(3):
        want, n_want = ndi.label(masks[b])
        np.testing.assert_array_equal(np.asarray(labels[b]), want)
        assert int(counts[b]) == n_want


def test_label_batched_small_flags_large_components(rng):
    """A component wider than the propagation radius must clear the
    converged flag (the caller's fallback signal) instead of silently
    mislabeling."""
    masks = np.zeros((1, 48, 48), bool)
    masks[0, 10, 5:40] = True             # a 35-px line, diameter 34
    _, _, done = cc.label_batched_small(jnp.asarray(masks), rounds=4)
    assert not bool(done)
    _, _, done = cc.label_batched_small(jnp.asarray(masks), rounds=40)
    assert bool(done)


def test_cc_rounds_batched_budget_flag(rng):
    """A deliberately starved round budget must report non-convergence
    (the flag the watershed host wrapper keys its native fallback on)."""
    mask = _random_stack(rng, b=2, hw=64, p=0.52)
    fg = jnp.asarray(mask)
    b, h, w = fg.shape
    n = h * w
    iota = jnp.arange(n, dtype=jnp.int32).reshape(1, h, w)
    lab0 = jnp.where(fg, jnp.broadcast_to(iota, fg.shape), jnp.int32(n))
    _, done = cc._cc_rounds_batched(fg, lab0, 1, rounds=1)
    assert not bool(done)
    _, done = cc._cc_rounds_batched(fg, lab0, 1, rounds=cc._budget(n))
    assert bool(done)
