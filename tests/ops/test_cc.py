"""Device connected-components vs the scipy.ndimage.label oracle.

`ops.cc.label` promises EXACT scipy numbering (raster-scan order of each
component's first pixel), so every parity assertion is array equality, not
equality-up-to-permutation. Pathological shapes (spiral, snakes) exercise
the pointer-jumping convergence path."""

import numpy as np
import pytest
import scipy.ndimage as ndi

import jax.numpy as jnp

from ark_tpu.ops import cc

EIGHT = np.ones((3, 3), dtype=int)


def _oracle(mask, connectivity):
    structure = EIGHT if connectivity == 2 else None  # None = cross
    return ndi.label(np.asarray(mask, bool), structure=structure)


@pytest.mark.parametrize("connectivity", [1, 2])
@pytest.mark.parametrize("density", [0.2, 0.5, 0.8])
def test_random_masks_match_scipy_exactly(rng, connectivity, density):
    mask = rng.random((57, 43)) < density  # non-square, odd sizes
    got, n = cc.label_np(mask, connectivity=connectivity)
    want, n_want = _oracle(mask, connectivity)
    assert n == n_want
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("connectivity", [1, 2])
def test_spiral_converges_and_matches(connectivity):
    # one long snake: worst case for naive label propagation (component
    # diameter ~ H*W); pointer jumping must still reach the fixpoint
    h = w = 64
    mask = np.zeros((h, w), bool)
    top, bottom, left, right = 0, h - 1, 0, w - 1
    while top <= bottom and left <= right:
        mask[top, left:right + 1] = True
        mask[top:bottom + 1, right] = True
        mask[bottom, left:right + 1] = True
        mask[top:bottom + 1, left] = True
        top += 2
        bottom -= 2
        left += 2
        right -= 2
    got, n = cc.label_np(mask, connectivity=connectivity)
    want, n_want = _oracle(mask, connectivity)
    assert n == n_want
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("connectivity", [1, 2])
def test_serpentine_matches(connectivity):
    # boustrophedon snake: rows joined alternately at left/right ends —
    # one component of diameter ~H*W/2
    h, w = 48, 64
    mask = np.zeros((h, w), bool)
    for r in range(0, h, 2):
        mask[r, :] = True
        if r + 2 < h:
            col = w - 1 if (r // 2) % 2 == 0 else 0
            mask[r + 1, col] = True
    got, n = cc.label_np(mask, connectivity=connectivity)
    want, n_want = _oracle(mask, connectivity)
    assert n == n_want == 1
    np.testing.assert_array_equal(got, want)


def test_random_spanning_tree_maze(rng):
    # random-DFS maze on a 31x31 grid: a single component whose geodesic
    # structure is an adversarial tree (long winding corridors)
    cells = 16
    h = w = 2 * cells - 1
    mask = np.zeros((h, w), bool)
    visited = np.zeros((cells, cells), bool)
    stack = [(0, 0)]
    visited[0, 0] = True
    mask[0, 0] = True
    while stack:
        r, c = stack[-1]
        nbrs = [(r + dr, c + dc) for dr, dc in
                ((0, 1), (1, 0), (0, -1), (-1, 0))
                if 0 <= r + dr < cells and 0 <= c + dc < cells
                and not visited[r + dr, c + dc]]
        if not nbrs:
            stack.pop()
            continue
        nr, nc = nbrs[rng.integers(len(nbrs))]
        visited[nr, nc] = True
        mask[2 * nr, 2 * nc] = True
        mask[r + nr, c + nc] = True  # corridor between the two cells
        stack.append((nr, nc))
    for connectivity in (1, 2):
        got, n = cc.label_np(mask, connectivity=connectivity)
        want, n_want = _oracle(mask, connectivity)
        assert n == n_want == 1
        np.testing.assert_array_equal(got, want)


def test_round_budget_converges_with_margin(rng):
    # the static budget must report converged (label_np's backstop loop
    # should never run); check the flag directly on the worst test shapes
    masks = [rng.random((64, 64)) < 0.55]
    spiral = np.zeros((64, 64), bool)
    top, bottom, left, right = 0, 63, 0, 63
    while top <= bottom and left <= right:
        spiral[top, left:right + 1] = True
        spiral[top:bottom + 1, right] = True
        top += 2
        bottom -= 2
        left += 2
        right -= 2
    masks.append(spiral)
    for mask in masks:
        for connectivity in (1, 2):
            _, _, _, done = cc._label_full(jnp.asarray(mask), connectivity)
            assert bool(done)


def test_backstop_resume_path(rng, monkeypatch):
    # force a 1-round budget so _label_full returns done=False and
    # label_np's continuation loop actually runs (the production backstop
    # for the empirical round bound). Unique shape: jit caches by shape,
    # and a shape already traced with the real budget would be reused.
    monkeypatch.setattr(cc, "_budget", lambda n: 1)
    mask = rng.random((37, 41)) < 0.55
    _, _, _, done = cc._label_full(jnp.asarray(mask), 1)
    assert not bool(done)  # the tiny budget must NOT converge this mask
    got, n = cc.label_np(mask, connectivity=1)
    want, n_want = _oracle(mask, 1)
    assert n == n_want
    np.testing.assert_array_equal(got, want)


def test_diagonal_touching_distinguishes_connectivity():
    mask = np.eye(8, dtype=bool)
    _, n4 = cc.label_np(mask, connectivity=1)
    _, n8 = cc.label_np(mask, connectivity=2)
    assert n4 == 8 and n8 == 1


@pytest.mark.parametrize("mask", [
    np.zeros((5, 7), bool),               # empty
    np.ones((5, 7), bool),                # all foreground
    np.array([[True]]),                   # single pixel
    np.array([[False]]),
])
def test_degenerate_masks(mask):
    for connectivity in (1, 2):
        got, n = cc.label_np(mask, connectivity=connectivity)
        want, n_want = _oracle(mask, connectivity)
        assert n == n_want
        np.testing.assert_array_equal(got, want)


def test_label_is_jittable_and_device_resident():
    mask = jnp.zeros((16, 16), bool).at[2:5, 2:5].set(True)
    labels, n = cc.label(mask)  # jitted entry: returns device arrays
    assert int(n) == 1
    assert int(labels[3, 3]) == 1 and int(labels[0, 0]) == 0


def test_area_filter_keeps_ids(rng):
    mask = rng.random((40, 40)) < 0.3
    labels, n = cc.label_np(mask, connectivity=2)
    filtered = np.asarray(cc.area_filter(jnp.asarray(labels), min_area=4))
    counts = np.bincount(labels.ravel(), minlength=n + 1)
    for lab_id in range(1, n + 1):
        survived = set(np.unique(filtered[labels == lab_id]))
        assert survived == ({lab_id} if counts[lab_id] >= 4 else {0})


def test_area_filter_n_max_static_bound(rng):
    mask = rng.random((20, 20)) < 0.3
    labels, n = cc.label_np(mask)
    full = np.asarray(cc.area_filter(jnp.asarray(labels), min_area=3))
    bounded = np.asarray(cc.area_filter(jnp.asarray(labels), n_max=int(n),
                                        min_area=3))
    np.testing.assert_array_equal(full, bounded)


@pytest.mark.parametrize("min_size", [1, 4, 9])
def test_remove_small_objects_matches_host(rng, min_size):
    mask = rng.random((48, 48)) < 0.35
    got = np.asarray(cc.remove_small_objects(jnp.asarray(mask),
                                             min_size=min_size))
    labels, n = _oracle(mask, 1)
    counts = np.bincount(labels.ravel(), minlength=n + 1)
    keep = counts >= min_size
    keep[0] = False
    np.testing.assert_array_equal(got, keep[labels])


@pytest.mark.parametrize("area_threshold", [0, 2, 16])
def test_remove_small_holes_matches_scipy_oracle(rng, area_threshold):
    # independent oracle (scipy labeling of the complement) — NOT
    # ops.morphology.remove_small_holes, which now delegates to this kernel
    mask = rng.random((48, 48)) < 0.6
    got = np.asarray(cc.remove_small_holes(jnp.asarray(mask),
                                           area_threshold=area_threshold))
    bg_labels, n = ndi.label(~mask)
    counts = np.bincount(bg_labels.ravel(), minlength=n + 1)
    fill = np.zeros(n + 1, bool)
    fill[1:] = counts[1:] <= area_threshold
    np.testing.assert_array_equal(got, mask | fill[bg_labels])


def test_border_touching_holes_fill_inclusively():
    # skimage semantics the host version defended: inclusive threshold and
    # no border exclusion — a 2-px notch at the FOV edge must fill at
    # area_threshold=2
    mask = np.ones((6, 6), bool)
    mask[0, 2:4] = False
    got = np.asarray(cc.remove_small_holes(jnp.asarray(mask),
                                           area_threshold=2))
    assert got.all()
