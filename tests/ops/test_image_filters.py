import numpy as np
import scipy.ndimage as ndi

from ark_tpu.ops import image_filters, quantiles


def test_gaussian_blur_matches_scipy(rng):
    img = rng.random((48, 40)).astype(np.float32)
    for sigma in [1.0, 2.0, 3.5]:
        ours = np.asarray(image_filters.gaussian_blur(img, sigma=sigma))
        ref = ndi.gaussian_filter(img, sigma=sigma)
        np.testing.assert_allclose(ours, ref, rtol=2e-5, atol=2e-6)


def test_gaussian_blur_multichannel(rng):
    img = rng.random((32, 32, 4)).astype(np.float32)
    ours = np.asarray(image_filters.gaussian_blur(img, sigma=2.0))
    for c in range(4):
        ref = ndi.gaussian_filter(img[..., c], sigma=2.0)
        np.testing.assert_allclose(ours[..., c], ref, rtol=2e-5, atol=2e-6)


def test_gaussian_blur_batch(rng):
    imgs = rng.random((3, 16, 16, 2)).astype(np.float32)
    out = np.asarray(image_filters.gaussian_blur_batch(imgs, sigma=2.0))
    single = np.asarray(image_filters.gaussian_blur(imgs[1], sigma=2.0))
    np.testing.assert_allclose(out[1], single, rtol=1e-6)


def test_quantile_matches_numpy(rng):
    x = rng.random(10007).astype(np.float32)
    for q in [0.05, 0.5, 0.99, 0.999]:
        np.testing.assert_allclose(np.asarray(quantiles.quantile(x, q)),
                                   np.quantile(x, q), rtol=1e-5)


def test_nonzero_quantile(rng):
    x = rng.random(5000).astype(np.float32)
    x[rng.random(5000) < 0.3] = 0.0
    ref = np.quantile(x[x > 0], 0.99)
    np.testing.assert_allclose(np.asarray(quantiles.nonzero_quantile(x, 0.99)),
                               ref, rtol=1e-5)


def test_nonzero_quantile_per_column(rng):
    import pandas as pd
    x = rng.random((400, 5)).astype(np.float32)
    x[rng.random((400, 5)) < 0.2] = 0.0
    ref = pd.DataFrame(x).replace(0, np.nan).quantile(0.999).values
    ours = np.asarray(quantiles.nonzero_quantile_per_column(x, 0.999))
    np.testing.assert_allclose(ours, ref, rtol=1e-4)


def test_masked_quantile_per_column(rng):
    x = rng.random((300, 4)).astype(np.float32)
    valid = rng.random(300) < 0.7
    ref = np.array([np.quantile(x[valid, c][x[valid, c] != 0], 0.999)
                    for c in range(4)])
    ours = np.asarray(quantiles.masked_quantile_per_column(x, valid, 0.999))
    np.testing.assert_allclose(ours, ref, rtol=1e-4)
