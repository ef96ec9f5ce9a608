import numpy as np
import pytest

from ark_tpu.segmentation import regionprops_extraction as rpe
from ark_tpu.utils.labeled_array import DataArray


def _rect_prop(h=6, w=12):
    """RegionProp for a solid h x w rectangle (convex, so hull == mask)."""
    mask = np.ones((h, w), bool)
    return rpe.RegionProp(
        label=1, area=float(h * w), centroid=(h / 2, w / 2),
        major_axis_length=float(w), minor_axis_length=float(h),
        perimeter=2.0 * (h + w), equivalent_diameter=np.sqrt(4 * h * w / np.pi),
        convex_area=float(h * w), image=mask, convex_image=mask)


def test_axis_and_perimeter_ratios():
    p = _rect_prop()
    assert rpe.major_minor_axis_ratio(p) == 2.0
    np.testing.assert_allclose(rpe.perim_square_over_area(p),
                               (2 * 18.0) ** 2 / 72.0)
    np.testing.assert_allclose(rpe.major_axis_equiv_diam_ratio(p),
                               12.0 / np.sqrt(4 * 72 / np.pi))
    p.minor_axis_length = 0.0
    assert np.isnan(rpe.major_minor_axis_ratio(p))


def test_convex_hull_resid_and_centroid_dif():
    p = _rect_prop()
    # convex shape: hull == mask
    assert rpe.convex_hull_resid(p) == 0.0
    assert rpe.centroid_dif(p) == 0.0
    # carve a corner out of the mask: residual and centroid shift appear
    notched = p.image.copy()
    notched[:3, :6] = False
    q = rpe.RegionProp(
        label=1, area=float(notched.sum()), centroid=(0, 0),
        major_axis_length=12.0, minor_axis_length=6.0, perimeter=36.0,
        equivalent_diameter=1.0, convex_area=72.0,
        image=notched, convex_image=p.convex_image)
    assert rpe.convex_hull_resid(q) == pytest.approx((72 - 54) / 72)
    assert rpe.centroid_dif(q) > 0.0


def test_num_concavities():
    # C-shape: one large concavity vs a solid square with none
    mask = np.ones((20, 20), bool)
    mask[5:15, 8:20] = False
    hull = np.ones((20, 20), bool)
    c = rpe.RegionProp(
        label=1, area=float(mask.sum()), centroid=(0, 0),
        major_axis_length=20.0, minor_axis_length=20.0, perimeter=80.0,
        equivalent_diameter=1.0, convex_area=400.0,
        image=mask, convex_image=hull)
    assert rpe.num_concavities(c, small_concavity_minimum=10,
                               large_concavity_minimum=150) >= 1
    solid = _rect_prop(20, 20)
    assert rpe.num_concavities(solid) == 0


def test_nc_ratio():
    features = ["label", "area", "nc_ratio"]
    vals = np.zeros((2, 3, len(features)))
    mc = DataArray(vals, coords={"compartments": ["whole_cell", "nuclear"],
                                 "cell_id": [1, 2, 3],
                                 "features": features})
    mc.loc["whole_cell", :, "area"] = [100.0, 50.0, 0.0]
    mc.loc["nuclear", :, "area"] = [25.0, 25.0, 10.0]
    out = rpe.nc_ratio(mc)
    np.testing.assert_allclose(
        out.sel(compartments="whole_cell", features="nc_ratio").values,
        [0.25, 0.5, 0.0])
    np.testing.assert_allclose(
        out.sel(compartments="nuclear", features="nc_ratio").values,
        [0.25, 0.5, 0.0])


def test_registry_complete():
    from ark_tpu import settings
    for name in settings.REGIONPROPS_SINGLE_COMP + \
            settings.REGIONPROPS_MULTI_COMP:
        assert name in rpe.REGIONPROPS_FUNCTION
