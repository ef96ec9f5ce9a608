"""Unit tests for the DataArray container (the xarray.DataArray subset the
framework's API boundary uses — reference loaders/analyses return real
xarray objects, `spatial_analysis_utils.py:17-64`). Semantics are asserted
against xarray's documented behavior: label selection, scalar dim dropping,
positional .loc, and lossless persistence."""

import numpy as np
import pytest

from ark_tpu.utils.labeled_array import DataArray


@pytest.fixture()
def da(rng):
    vals = rng.random((2, 3, 4)).astype(np.float32)
    return DataArray(vals, coords={"fovs": ["fov0", "fov1"],
                                   "rows": [10, 20, 30],
                                   "channels": ["a", "b", "c", "d"]})


def test_construction_variants(rng):
    v = rng.random((2, 2))
    # dict coords define dims
    d1 = DataArray(v, coords={"x": [0, 1], "y": ["p", "q"]})
    assert d1.dims == ("x", "y")
    # list coords + dims
    d2 = DataArray(v, coords=[[0, 1], ["p", "q"]], dims=["x", "y"])
    assert np.array_equal(d2.coords["y"], np.array(["p", "q"]))
    # default dims/coords
    d3 = DataArray(v)
    assert d3.dims == ("dim_0", "dim_1")
    np.testing.assert_array_equal(d3.coords["dim_1"], [0, 1])
    # rank mismatch / coord length mismatch raise
    with pytest.raises(ValueError):
        DataArray(v, dims=["x"])
    with pytest.raises(ValueError):
        DataArray(v, coords={"x": [0], "y": ["p", "q"]})


def test_sel_scalar_drops_dim(da):
    out = da.sel(fovs="fov1")
    assert out.dims == ("rows", "channels")
    np.testing.assert_array_equal(out.values, da.values[1])
    out2 = out.sel(rows=20, channels="c")
    assert out2.dims == ()
    assert float(out2.values) == da.values[1, 1, 2]


def test_sel_list_keeps_dim_and_reorders(da):
    out = da.sel(channels=["d", "a"])
    assert out.dims == da.dims
    np.testing.assert_array_equal(out.coords["channels"],
                                  np.array(["d", "a"]))
    np.testing.assert_array_equal(out.values, da.values[..., [3, 0]])


def test_sel_missing_label_raises(da):
    with pytest.raises(KeyError, match="not found"):
        da.sel(channels="zzz")
    with pytest.raises(KeyError):
        da.sel(rows=[10, 99])


def test_isel(da):
    out = da.isel(fovs=0, channels=[1, 2])
    assert out.dims == ("rows", "channels")
    np.testing.assert_array_equal(out.coords["channels"],
                                  np.array(["b", "c"]))
    np.testing.assert_array_equal(out.values, da.values[0][:, [1, 2]])


def test_loc_get_and_set(da):
    got = da.loc["fov0", 30, "b"]
    assert float(got.values) == da.values[0, 2, 1]
    # slice(None) passthrough
    row = da.loc["fov0", :, "b"]
    assert row.dims == ("rows",)
    # setitem writes through
    da.loc["fov1", 10, "a"] = 99.0
    assert da.values[1, 0, 0] == 99.0
    da.loc["fov0", :, "d"] = 5.0
    np.testing.assert_array_equal(da.values[0, :, 3], 5.0)


def test_array_protocol(da):
    assert np.asarray(da).shape == (2, 3, 4)
    assert len(da) == 2
    assert da.ndim == 3 and da.dtype == np.float32
    eq = (da == da.values)
    assert eq.all()
    assert "fovs: 2" in repr(da)


def test_h5_roundtrip_with_string_and_int_coords(tmp_path, da):
    path = str(tmp_path / "arr.h5")
    da.name = "dists"
    da.to_h5(path)
    back = DataArray.from_h5(path)
    assert back.equals(da)
    assert back.name == "dists"
    # string coords come back as str, ints as ints
    assert back.coords["channels"].dtype.kind == "U"
    assert back.coords["rows"].dtype.kind in "iu"


def test_equals_detects_differences(da, rng):
    other = DataArray(da.values.copy(),
                      coords={d: da.coords[d] for d in da.dims})
    assert da.equals(other)
    other.values[0, 0, 0] += 1
    assert not da.equals(other)
    renamed = DataArray(da.values, coords={"f": da.coords["fovs"],
                                           "rows": da.coords["rows"],
                                           "channels": da.coords["channels"]})
    assert not da.equals(renamed)


def test_to_h5_roundtrips_unicode_channel_names(tmp_path):
    """Real MIBI panels use names like αSMA / TCRγδ — the old ascii cast
    crashed at save time."""
    da = DataArray(np.arange(6, dtype=np.float32).reshape(2, 3),
                   coords={"fovs": ["fov0", "fov1"],
                           "channels": ["αSMA", "TCRγδ", "CD45"]})
    path = tmp_path / "arr.xr"
    da.to_h5(str(path))
    back = DataArray.from_h5(str(path))
    assert list(back.coords["channels"]) == ["αSMA", "TCRγδ", "CD45"]
    np.testing.assert_array_equal(back.values, da.values)


def test_loc_setitem_outer_product_semantics():
    """Two label lists must select the CROSS PRODUCT (xarray .loc), not
    numpy's pointwise diagonal pairing."""
    da = DataArray(np.zeros((3, 2, 3)),
                   coords={"fovs": ["f0", "f1", "f2"],
                           "rows": [0, 1],
                           "channels": ["c0", "c1", "c2"]})
    da.loc[["f0", "f1"], :, ["c0", "c2"]] = 7.0
    assert (da.values[[0, 1]][:, :, [0, 2]] == 7.0).all()
    assert (da.values[[0, 1]][:, :, 1] == 0.0).all()
    assert (da.values[2] == 0.0).all()
