"""Device EDT vs the scipy oracle (exact transform, not chamfer).

Reference usage: `src/ark/segmentation/fiber_segmentation.py:106` feeds
`scipy.ndimage.distance_transform_edt` output into multi-Otsu + watershed,
so metric error would shift fiber boundaries — the kernel must be exact.
"""

import numpy as np
import pytest
import scipy.ndimage as ndi

from ark_tpu.ops import edt


@pytest.mark.parametrize("shape,p", [
    ((33, 47), 0.5),     # odd, non-square
    ((64, 64), 0.9),     # sparse background: long-range distances
    ((128, 96), 0.98),   # very sparse background
    ((50, 50), 0.02),    # dense background: mostly zeros
    ((1, 7), 0.5),       # single row
    ((7, 1), 0.5),       # single column
    ((300, 260), 0.97),  # larger than one source block (256)
])
def test_matches_scipy(rng, shape, p):
    img = rng.random(shape) < p
    if not (~img).any():       # ensure at least one background pixel
        img.flat[0] = False
    ours = np.asarray(edt.distance_transform_edt(img))
    ref = ndi.distance_transform_edt(img)
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_planted_disks(rng):
    """Planted-truth check: distance from a disk interior point to the
    boundary is analytic, independent of any library formula."""
    img = np.zeros((120, 140), bool)
    yy, xx = np.mgrid[:120, :140]
    img |= (yy - 40) ** 2 + (xx - 50) ** 2 < 30 ** 2
    ours = np.asarray(edt.distance_transform_edt(img))
    # at the disk center, the nearest background pixel is the first lattice
    # point with r >= 30 along an axis -> exactly 30
    assert ours[40, 50] == pytest.approx(30.0, abs=1e-5)
    assert ours[~img].max() == 0.0
    np.testing.assert_allclose(ours, ndi.distance_transform_edt(img),
                               atol=1e-4)


def test_integer_input_and_zero_background_semantics(rng):
    img = (rng.random((40, 40)) < 0.7).astype(np.uint8) * 7  # nonzero=fg
    img[0, 0] = 0
    ours = np.asarray(edt.distance_transform_edt(img))
    ref = ndi.distance_transform_edt(img)
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_no_background_returns_inf():
    """scipy's all-foreground answer is an initialization artifact
    (distances to a phantom zero at (-1, 0)); ours is defined as +inf."""
    out = np.asarray(edt.distance_transform_edt(np.ones((8, 9), bool)))
    assert np.isinf(out).all()


def test_all_background_is_zero():
    out = np.asarray(edt.distance_transform_edt(np.zeros((8, 9), bool)))
    assert (out == 0).all()


def test_raises_on_non_2d():
    with pytest.raises(ValueError):
        edt.distance_transform_edt(np.ones((2, 3, 4), bool))
