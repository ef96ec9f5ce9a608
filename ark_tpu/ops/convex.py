"""Host-side per-cell convex-hull geometry (SURVEY.md §7 hard part c/d).

Convex hulls are irregular, tiny, per-cell computations that do not map to
XLA; the framework computes them on host with scipy.spatial.ConvexHull while
all dense reductions stay on device. Replaces skimage's `convex_image` /
`convex_area` used by the reference's derived regionprops
(`regionprops_extraction.py:60-143`)."""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np


def group_coords_by_label(labels: np.ndarray) -> Dict[int, np.ndarray]:
    """{label: (n_i, 2) pixel coords}, computed with one argsort (no per-cell
    mask scans)."""
    flat = labels.reshape(-1)
    nz = np.flatnonzero(flat)
    if nz.size == 0:
        return {}
    order = nz[np.argsort(flat[nz], kind="stable")]
    sorted_labels = flat[order]
    boundaries = np.flatnonzero(np.diff(sorted_labels)) + 1
    groups = np.split(order, boundaries)
    w = labels.shape[1]
    out = {}
    for g in groups:
        lab = int(flat[g[0]])
        out[lab] = np.stack([g // w, g % w], axis=1)
    return out


def convex_image(coords: np.ndarray) -> Tuple[np.ndarray, np.ndarray, Tuple[int, int]]:
    """(mask_image, hull_image, bbox_origin) for one cell's pixel coords.

    hull_image rasterizes the convex hull of the pixel coordinates over the
    cell's bounding box (pixel centers inside-or-on the hull), matching
    skimage's `convex_image` semantics.
    """
    rmin, cmin = coords.min(0)
    rmax, cmax = coords.max(0)
    h, w = rmax - rmin + 1, cmax - cmin + 1
    local = coords - np.array([rmin, cmin])
    mask = np.zeros((h, w), bool)
    mask[local[:, 0], local[:, 1]] = True

    hull_img = mask.copy()
    if len(coords) >= 3:
        try:
            from scipy.spatial import ConvexHull
            hull = ConvexHull(local.astype(float))
            # half-plane test: point inside iff all eq . [p, 1] <= tol
            yy, xx = np.mgrid[:h, :w]
            pts = np.stack([yy.ravel(), xx.ravel(),
                            np.ones(h * w)], axis=1)      # (h*w, 3)
            inside = (pts @ hull.equations.T <= 1e-9).all(axis=1)
            hull_img = inside.reshape(h, w) | mask
        except Exception:
            pass  # degenerate (collinear) cells: hull == mask
    return mask, hull_img, (int(rmin), int(cmin))


def convex_features(labels: np.ndarray,
                    cell_ids: np.ndarray) -> Dict[str, np.ndarray]:
    """Per-cell convex_area and convex-centroid shift inputs.

    Returns dict of arrays aligned with `cell_ids`:
      convex_area, convex_centroid-0/1 (global coords), plus cached masks for
      concavity analysis via `masks` (list of (mask, hull, origin))."""
    groups = group_coords_by_label(labels)
    n = len(cell_ids)
    convex_area = np.zeros(n)
    conv_cent = np.zeros((n, 2))
    masks: List = [None] * n
    for i, cid in enumerate(cell_ids):
        coords = groups.get(int(cid))
        if coords is None:
            continue
        mask, hull, origin = convex_image(coords)
        convex_area[i] = hull.sum()
        cy, cx = np.nonzero(hull)
        conv_cent[i] = [cy.mean() + origin[0], cx.mean() + origin[1]]
        masks[i] = (mask, hull, origin)
    return {"convex_area": convex_area, "convex_centroid": conv_cent,
            "masks": masks}


def crofton_perimeter_np(mask: np.ndarray) -> float:
    """Host Cauchy–Crofton perimeter of one binary mask (same estimator as
    ops.segment_reduce.crofton_perimeter)."""
    m = np.pad(mask.astype(np.int8), 1)
    n_h = np.count_nonzero(m[:, :-1] != m[:, 1:])
    n_v = np.count_nonzero(m[:-1, :] != m[1:, :])
    n_d1 = np.count_nonzero(m[:-1, :-1] != m[1:, 1:])
    n_d2 = np.count_nonzero(m[:-1, 1:] != m[1:, :-1])
    return float(np.pi / 4.0 * (n_h + n_v + (n_d1 + n_d2) / np.sqrt(2)) / 2.0)


def count_concavities(mask: np.ndarray, hull: np.ndarray,
                      small_concavity_minimum: float = 10,
                      max_compactness: float = 60,
                      large_concavity_minimum: float = 150) -> int:
    """Number of meaningful concavities: connected components of hull∖mask
    filtered by (area, compactness) thresholds (reference
    `regionprops_extraction.py:105-143`)."""
    import scipy.ndimage as ndi
    diff = hull ^ mask
    if diff.sum() == 0:
        return 0
    lab, n = ndi.label(diff, structure=np.array([[0, 1, 0],
                                                 [1, 1, 1],
                                                 [0, 1, 0]]))
    count = 0
    for comp in range(1, n + 1):
        comp_mask = lab == comp
        area = comp_mask.sum()
        perim = crofton_perimeter_np(comp_mask)
        compactness = perim ** 2 / area
        if (area > small_concavity_minimum and compactness < max_compactness) \
                or area > large_concavity_minimum:
            count += 1
    return count
