"""On-disk contract test for the AnnData export.

The environment has no `anndata`/`zarr`, so compatibility is asserted
structurally against the anndata on-disk specification (v0.8+ element
encodings, https://anndata.readthedocs.io/en/latest/fileformat-prose.html):
every element carries `encoding-type`/`encoding-version` attrs, dataframe
groups carry `_index` and `column-order`, string columns are utf-8
variable-length 'string-array' datasets. Divergence from the reference
(`data_utils.py:850-1004` writes zarr stores) is documented in
`_write_h5ad`'s docstring: same logical AnnData object, HDF5 container.
"""

import os

import h5py
import numpy as np
import pandas as pd
import pytest

from ark_tpu import settings
from ark_tpu.utils import data_utils

from tests import test_utils


@pytest.fixture()
def h5ad_store(rng, tmp_path):
    ct = test_utils.make_cell_table(n_cells=60, fovs=["fov0", "fov1"])
    cols = (["cell_size"] + [c for c in ct.columns if c.startswith("marker")]
            + ["label", "fov", "PatientID", "cell_meta_cluster",
               "centroid-0", "centroid-1"])
    ct_path = str(tmp_path / "ct.csv")
    ct[cols].to_csv(ct_path, index=False)
    conv = data_utils.ConvertToAnnData(ct_path)
    save_dir = str(tmp_path / "adata")
    paths = conv.convert_to_adata(save_dir)
    return ct[cols], save_dir, paths


def _assert_encoding(node, enc_type):
    assert node.attrs["encoding-type"] == enc_type, node.name
    assert "encoding-version" in node.attrs, node.name


def test_h5ad_root_and_element_encodings(h5ad_store):
    _, save_dir, _ = h5ad_store
    path = os.path.join(save_dir, "fov0.h5ad")
    with h5py.File(path, "r") as f:
        _assert_encoding(f, "anndata")
        _assert_encoding(f["X"], "array")
        for df_key in ("obs", "var"):
            grp = f[df_key]
            _assert_encoding(grp, "dataframe")
            assert "_index" in grp.attrs
            assert "column-order" in grp.attrs
            index_name = grp.attrs["_index"]
            assert index_name in grp
            # every listed column exists and is itself spec-encoded
            for col in grp.attrs["column-order"]:
                col = col.decode() if isinstance(col, bytes) else col
                assert col in grp
                assert grp[col].attrs["encoding-type"] in ("array",
                                                           "string-array")
        _assert_encoding(f["obsm"], "dict")
        for key in f["obsm"]:
            _assert_encoding(f["obsm"][key], "array")
        # optional mappings present and dict-encoded (anndata tolerates
        # empty dicts; raw absence is also legal — we ship them explicit)
        for extra in ("uns", "layers", "obsp", "varp", "varm"):
            _assert_encoding(f[extra], "dict")


def test_h5ad_string_columns_are_utf8_vlen(h5ad_store):
    _, save_dir, _ = h5ad_store
    with h5py.File(os.path.join(save_dir, "fov0.h5ad"), "r") as f:
        ds = f["obs"]["cell_meta_cluster"]
        assert ds.attrs["encoding-type"] == "string-array"
        string_info = h5py.check_string_dtype(ds.dtype)
        assert string_info is not None
        assert string_info.encoding == "utf-8"
        # index too
        names = f["obs"][f["obs"].attrs["_index"]]
        assert h5py.check_string_dtype(names.dtype) is not None


def test_h5ad_contents_roundtrip_per_fov(h5ad_store):
    table, save_dir, _ = h5ad_store
    for fov in ("fov0", "fov1"):
        sub = table[table["fov"] == fov]
        ad = data_utils.AnnDataLite.read_h5ad(
            os.path.join(save_dir, f"{fov}.h5ad"))
        assert ad.n_obs == len(sub)
        markers = [c for c in table.columns if c.startswith("marker")]
        assert ad.var_names == markers
        np.testing.assert_allclose(ad.X, sub[markers].values, rtol=1e-6)
        # obsm['spatial'] carries centroids
        np.testing.assert_allclose(
            ad.obsm["spatial"],
            sub[[settings.CENTROID_0, settings.CENTROID_1]].values,
            rtol=1e-6)
        # string obs round-trip as str, numeric as numeric
        assert ad.obs["cell_meta_cluster"].dtype.kind in "UO"
        assert set(ad.obs["cell_meta_cluster"]) <= {"A", "B", "C"}
        assert np.issubdtype(np.asarray(ad.obs["area"]).dtype, np.number)


def test_h5ad_readable_without_optional_groups(tmp_path):
    """Stores written by other tools may omit uns/layers/...; the reader
    must not require them."""
    path = str(tmp_path / "m.h5ad")
    obs = pd.DataFrame({"area": [1.0, 2.0]}, index=["c1", "c2"])
    data_utils._write_h5ad(path, np.eye(2, 3), obs, ["m0", "m1", "m2"],
                           {"spatial": np.zeros((2, 2))})
    with h5py.File(path, "r+") as f:
        for extra in ("uns", "layers", "obsp", "varp", "varm"):
            del f[extra]
    ad = data_utils.AnnDataLite.read_h5ad(path)
    assert ad.n_obs == 2 and ad.var_names == ["m0", "m1", "m2"]


def test_extra_obs_parameters_do_not_duplicate_columns(tmp_path, rng):
    """ConvertToAnnData(extra_obs_parameters=[...]) used to spread the
    extras on top of the post-channel columns they are a subset of,
    duplicating obs names and crashing the h5ad writer."""
    from ark_tpu import settings
    from ark_tpu.utils.data_utils import ConvertToAnnData, AnnDataLite
    n = 20
    table = pd.DataFrame({
        settings.FOV_ID: ["fovA"] * n,
        settings.CELL_LABEL: np.arange(1, n + 1),
        settings.CELL_SIZE: rng.integers(20, 90, n).astype(float),
        "CD45": rng.random(n), "CD3": rng.random(n),
        settings.POST_CHANNEL_COL: np.arange(1, n + 1),
        settings.CENTROID_0: rng.uniform(0, 64, n),
        settings.CENTROID_1: rng.uniform(0, 64, n),
        "my_extra": rng.random(n)})
    path = tmp_path / "cell_table.csv"
    table.to_csv(path, index=False)
    conv = ConvertToAnnData(str(path), extra_obs_parameters=["my_extra"])
    assert len(conv.obs_names) == len(set(conv.obs_names))
    assert "my_extra" in conv.obs_names
    out_dir = tmp_path / "adata"
    paths = conv.convert_to_adata(str(out_dir))
    ad = AnnDataLite.read_h5ad(list(paths.values())[0])
    assert "my_extra" in ad.obs.columns
