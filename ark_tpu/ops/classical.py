"""Classical image filters for the fiber / ez_seg pipelines.

Fresh implementations of the skimage ops the reference leans on
(`fiber_segmentation.py:324-356`: CLAHE equalize_adapthist, Frangi
vesselness, Sobel elevation, multi-Otsu thresholds; `ez_object_segmentation`:
local-adaptive thresholds, Meijering-style ridge filter). Hessians/gradients
run as separable Gaussian-derivative convolutions on device (XLA); CLAHE is
a jitted scatter-add/cumsum/gather program on device; multi-Otsu is a DP
over a 256-entry histogram (host numpy — the data-sized work is the
histogram, not the search).
"""

from __future__ import annotations

import functools
from typing import Iterable

import jax
import jax.numpy as jnp
import numpy as np

from ark_tpu.ops.image_filters import _conv1d_axis


def _gaussian_derivative_kernel1d(sigma: float, order: int,
                                  truncate: float = 4.0) -> np.ndarray:
    """1-D Gaussian derivative taps (order 0, 1 or 2), scipy-compatible."""
    radius = int(truncate * sigma + 0.5)
    x = np.arange(-radius, radius + 1, dtype=np.float64)
    g = np.exp(-0.5 * (x / sigma) ** 2)
    g /= g.sum()
    if order == 0:
        return g.astype(np.float32)
    if order == 1:
        return (-x / sigma ** 2 * g).astype(np.float32)
    return (((x ** 2 - sigma ** 2) / sigma ** 4) * g).astype(np.float32)


def _sep_conv(img: jax.Array, krow: np.ndarray, kcol: np.ndarray) -> jax.Array:
    """Separable 2-D convolution with symmetric boundary."""
    x = img[..., None].astype(jnp.float32)
    r = (len(krow) - 1) // 2
    x = jnp.pad(x, ((r, r), (0, 0), (0, 0)), mode="symmetric")
    x = _conv1d_axis(x, jnp.asarray(krow[::-1].copy()), axis=0)
    r = (len(kcol) - 1) // 2
    x = jnp.pad(x, ((0, 0), (r, r), (0, 0)), mode="symmetric")
    x = _conv1d_axis(x, jnp.asarray(kcol[::-1].copy()), axis=1)
    return x[..., 0]


@jax.jit
def sobel(img: jax.Array) -> jax.Array:
    """Sobel gradient-magnitude elevation map (skimage normalization: the
    smoothing tap is [1,2,1]/4, the derivative tap is the UNSCALED
    [1,0,-1], magnitude divided by sqrt(2) — an extra /2 on the
    derivative used to halve every output vs skimage.filters.sobel)."""
    img = img.astype(jnp.float32)
    smooth = np.array([1.0, 2.0, 1.0], np.float32) / 4.0
    diff = np.array([1.0, 0.0, -1.0], np.float32)
    gy = _sep_conv(img, diff, smooth)
    gx = _sep_conv(img, smooth, diff)
    return jnp.sqrt(gx * gx + gy * gy) / jnp.sqrt(2.0)


def multi_otsu(img: np.ndarray, classes: int = 3,
               nbins: int = 256) -> np.ndarray:
    """Multi-Otsu thresholds for any number of classes (skimage
    `threshold_multiotsu` semantics, reference use at
    `src/ark/segmentation/fiber_segmentation.py:114`).

    Maximizes the between-class variance ∑ m_k²/w_k over all placements of
    `classes-1` cuts via dynamic programming on histogram prefix sums —
    O(classes·nbins²) instead of the O(nbins^(classes-1)) exhaustive sweep,
    so classes ≥ 4 are exact rather than unsupported. Each returned
    threshold is the bin center of the first bin of the class above the cut.
    The DP runs on the 256-entry histogram — host numpy; the image-sized
    histogramming cost is negligible next to the device pipeline stages
    around it."""
    if classes < 2:
        raise ValueError("multi_otsu requires classes >= 2")
    img = np.asarray(img, np.float64).ravel()
    lo, hi = img.min(), img.max()
    if hi <= lo:
        return np.array([lo] * (classes - 1))
    hist, bin_edges = np.histogram(img, bins=nbins, range=(lo, hi))
    centers = (bin_edges[:-1] + bin_edges[1:]) / 2
    p = hist / hist.sum()
    W = np.concatenate([[0.0], np.cumsum(p)])
    M = np.concatenate([[0.0], np.cumsum(p * centers)])
    # S[a, b] = m²/w of the class spanning bins [a, b) (0 if massless);
    # only a < b is a legal (non-empty) class span
    wseg = W[None, :] - W[:, None]
    mseg = M[None, :] - M[:, None]
    with np.errstate(divide="ignore", invalid="ignore"):
        S = np.where(wseg > 0, mseg * mseg / np.where(wseg > 0, wseg, 1.0),
                     0.0)
    edge = np.arange(nbins + 1)
    S = np.where(edge[:, None] < edge[None, :], S, -np.inf)

    # best[b] = max objective for the classes so far covering bins [0, b);
    # one argmax table per added cut for backtracking
    best = S[0]
    cut_arg = []
    for _ in range(classes - 1):
        tot = best[:, None] + S                  # (cut t, end b)
        arg = np.argmax(tot, axis=0)             # ties -> lowest cut
        cut_arg.append(arg)
        best = tot[arg, edge]
    cuts = []
    b = nbins
    for arg in reversed(cut_arg):
        b = int(arg[b])
        cuts.append(b)
    cuts = cuts[::-1]
    return centers[np.array(cuts)]


@functools.partial(jax.jit,
                   static_argnames=("th", "tw", "n_tr", "n_tc", "nbins"))
def _clahe_device(img: jax.Array, th: int, tw: int, n_tr: int, n_tc: int,
                  clip_limit: float, nbins: int) -> jax.Array:
    """Jitted CLAHE core: per-tile histograms as one scatter-add, clipped
    cdf transfer functions, bilinear blend of the 4 surrounding tiles."""
    h, w = img.shape
    ph, pw = n_tr * th, n_tc * tw
    padded = jnp.pad(img.astype(jnp.float32),
                     ((0, ph - h), (0, pw - w)), mode="symmetric")

    bins = jnp.clip((padded * (nbins - 1)).astype(jnp.int32), 0, nbins - 1)
    tr = jnp.arange(ph, dtype=jnp.int32) // th
    tc = jnp.arange(pw, dtype=jnp.int32) // tw
    tile_idx = tr[:, None] * n_tc + tc[None, :]
    flat = tile_idx * nbins + bins
    hists = jnp.zeros(n_tr * n_tc * nbins, jnp.float32).at[
        flat.ravel()].add(1.0).reshape(n_tr, n_tc, nbins)

    clip = jnp.maximum(clip_limit * th * tw, 1.0)
    excess = jnp.maximum(hists - clip, 0).sum(axis=2, keepdims=True)
    hists = jnp.minimum(hists, clip) + excess / nbins
    cdf = jnp.cumsum(hists, axis=2)
    cdf = cdf / cdf[:, :, -1:]                                   # (tr, tc, B)

    yy = (jnp.arange(ph, dtype=jnp.float32) + 0.5) / th - 0.5
    xx = (jnp.arange(pw, dtype=jnp.float32) + 0.5) / tw - 0.5
    y0 = jnp.clip(jnp.floor(yy).astype(jnp.int32), 0, n_tr - 1)
    x0 = jnp.clip(jnp.floor(xx).astype(jnp.int32), 0, n_tc - 1)
    y1 = jnp.clip(y0 + 1, 0, n_tr - 1)
    x1 = jnp.clip(x0 + 1, 0, n_tc - 1)
    fy = jnp.clip(yy - y0, 0, 1)[:, None]
    fx = jnp.clip(xx - x0, 0, 1)[None, :]

    b = bins
    c00 = cdf[y0[:, None], x0[None, :], b]
    c01 = cdf[y0[:, None], x1[None, :], b]
    c10 = cdf[y1[:, None], x0[None, :], b]
    c11 = cdf[y1[:, None], x1[None, :], b]
    out = ((1 - fy) * ((1 - fx) * c00 + fx * c01)
           + fy * ((1 - fx) * c10 + fx * c11))
    return out[:h, :w]


def _clahe_geometry(h: int, w: int, kernel_size):
    """Static tile geometry (th, tw, n_tr, n_tc) shared by the host-facing
    CLAHE wrapper and fused device pipelines."""
    if kernel_size is None:
        kernel_size = (h // 8, w // 8)
    if np.isscalar(kernel_size):
        kernel_size = (int(kernel_size), int(kernel_size))
    th = max(int(round(kernel_size[0])), 2)
    tw = max(int(round(kernel_size[1])), 2)
    n_tr = max(-(-h // th), 1)
    n_tc = max(-(-w // tw), 1)
    return th, tw, n_tr, n_tc


def equalize_adapthist(img, kernel_size=None, clip_limit: float = 0.01,
                       nbins: int = 256) -> np.ndarray:
    """CLAHE: tile-wise clipped histogram equalization with bilinear blending
    of neighboring tile transfer functions. Input in [0, 1]; output in [0, 1].

    Runs on device (reference: skimage `equalize_adapthist`,
    `src/ark/segmentation/fiber_segmentation.py:93`): the per-tile
    histograms are a single scatter-add over the tiled image, the transfer
    functions a cumsum, the blend a gather — one jitted program, retraced
    only per distinct (image shape, tile geometry)."""
    arr = jnp.asarray(img)
    h, w = arr.shape
    th, tw, n_tr, n_tc = _clahe_geometry(h, w, kernel_size)
    return np.asarray(_clahe_device(arr, th, tw, n_tr, n_tc,
                                    float(clip_limit), int(nbins)),
                      np.float64)


@functools.partial(jax.jit, static_argnames=("sigma",))
def _hessian_eigvals(img: jax.Array, sigma: float):
    """Scale-normalized Hessian eigenvalues (λ1, λ2 with |λ1| ≤ |λ2|)."""
    g0 = _gaussian_derivative_kernel1d(sigma, 0)
    g1 = _gaussian_derivative_kernel1d(sigma, 1)
    g2 = _gaussian_derivative_kernel1d(sigma, 2)
    s2 = sigma ** 2
    hrr = _sep_conv(img, g2, g0) * s2
    hcc = _sep_conv(img, g0, g2) * s2
    hrc = _sep_conv(img, g1, g1) * s2
    tmp = jnp.sqrt((hrr - hcc) ** 2 + 4 * hrc ** 2)
    mu1 = (hrr + hcc + tmp) / 2
    mu2 = (hrr + hcc - tmp) / 2
    # order by absolute value
    swap = jnp.abs(mu1) > jnp.abs(mu2)
    l1 = jnp.where(swap, mu2, mu1)
    l2 = jnp.where(swap, mu1, mu2)
    return l1, l2


def _frangi_device(x: jax.Array, sigmas, beta: float = 0.5,
                   gamma: float = 15.0) -> jax.Array:
    """Traceable Frangi core (bright ridges): max over scales of
    exp(−R_b²/2β²)·(1−exp(−S²/2γ²)) on ridge-signed Hessian eigenvalues.
    Shared by the host-facing `frangi` and fused device pipelines (where
    the per-scale eigenvalue programs fuse into one dispatch instead of
    one per sigma)."""
    out = None
    for sigma in sigmas:
        l1, l2 = _hessian_eigvals(x, float(sigma))
        rb2 = (l1 / jnp.where(l2 == 0, 1e-10, l2)) ** 2
        s2 = l1 ** 2 + l2 ** 2
        v = jnp.exp(-rb2 / (2 * beta ** 2)) * \
            (1 - jnp.exp(-s2 / (2 * gamma ** 2)))
        v = jnp.where(l2 < 0, v, 0.0)   # bright ridges: λ2 negative
        out = v if out is None else jnp.maximum(out, v)
    return out


def frangi(img, sigmas: Iterable[float] = (1, 3, 5, 7, 9),
           black_ridges: bool = False, beta: float = 0.5,
           gamma: float = 15.0) -> np.ndarray:
    """Frangi vesselness (see `_frangi_device`)."""
    x = jnp.asarray(np.asarray(img), jnp.float32)
    if black_ridges:
        x = -x
    return np.asarray(_frangi_device(x, sigmas, beta, gamma))


def meijering(img, sigmas: Iterable[float] = (1, 3, 5, 7, 9),
              black_ridges: bool = False) -> np.ndarray:
    """Meijering neuriteness ridge filter: max over scales of the normalized
    modified-Hessian minimum eigenvalue."""
    x = jnp.asarray(np.asarray(img), jnp.float32)
    if black_ridges:
        x = -x
    out = None
    for sigma in sigmas:
        l1, l2 = _hessian_eigvals(x, float(sigma))
        # modified eigenvalues: m = λ + λ_other / 3
        m1 = l1 + l2 / 3.0
        m2 = l2 + l1 / 3.0
        mmin = jnp.minimum(m1, m2)
        v = jnp.where(mmin < 0, -mmin, 0.0)
        out = v if out is None else jnp.maximum(out, v)
    mx = jnp.max(out)
    out = jnp.where(mx > 0, out / mx, out)
    return np.asarray(out)


def local_adaptive_threshold(img: np.ndarray, block_size: int,
                             offset: float = 0.0) -> np.ndarray:
    """Gaussian-weighted local threshold (skimage threshold_local
    'gaussian'): pixel > local_mean − offset."""
    from ark_tpu.ops.image_filters import gaussian_blur
    sigma = (block_size - 1) / 6.0
    local_mean = np.asarray(gaussian_blur(jnp.asarray(img, jnp.float32),
                                          sigma=sigma))
    return np.asarray(img) > (local_mean - offset)
