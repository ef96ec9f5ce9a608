import os

import numpy as np
import pytest

from ark_tpu.io import io_utils, load_utils
from ark_tpu.io.image_utils import save_image, read_image
from ark_tpu.io import feather_utils
from ark_tpu.utils.labeled_array import DataArray

from tests import test_utils


def test_natsorted():
    assert io_utils.natsorted(["fov10", "fov2", "fov1"]) == ["fov1", "fov2", "fov10"]


def test_validate_paths(tmp_path):
    io_utils.validate_paths([str(tmp_path)])
    with pytest.raises(FileNotFoundError):
        io_utils.validate_paths([str(tmp_path / "nope")])


def test_list_files_and_folders(tmp_path):
    (tmp_path / "a.tiff").write_bytes(b"")
    (tmp_path / "b.csv").write_bytes(b"")
    (tmp_path / ".hidden.tiff").write_bytes(b"")
    os.makedirs(tmp_path / "fov2")
    os.makedirs(tmp_path / "fov10")
    assert io_utils.list_files(str(tmp_path), substrs=".tiff") == ["a.tiff"]
    assert io_utils.list_files(str(tmp_path), substrs="a", exact_match=True) == ["a.tiff"]
    assert io_utils.list_folders(str(tmp_path)) == ["fov2", "fov10"]


def test_remove_file_extensions():
    assert io_utils.remove_file_extensions(["a.tiff", "b.csv"]) == ["a", "b"]


def test_tiff_roundtrip(tmp_path):
    for dt in [np.float32, np.int32, np.uint16]:
        img = (np.random.rand(16, 16) * 100).astype(dt)
        p = str(tmp_path / f"x_{np.dtype(dt).name}.tiff")
        save_image(p, img)
        assert np.array_equal(read_image(p), img)


def test_feather_roundtrip(tmp_path):
    import pandas as pd
    df = pd.DataFrame({"a": [1.0, 2.0], "b": [3, 4]})
    p = tmp_path / "x.feather"
    feather_utils.write_dataframe(df, p)
    out = feather_utils.read_dataframe(p)
    pd.testing.assert_frame_equal(df, out)


def test_load_imgs_from_tree(tmp_path):
    fovs = test_utils.make_fov_names(3)
    chans = ["chan0", "chan1"]
    data = test_utils.create_image_cohort(str(tmp_path), fovs, chans, shape=(32, 32))
    da = load_utils.load_imgs_from_tree(str(tmp_path), fovs=fovs, channels=chans)
    assert da.shape == (3, 32, 32, 2)
    assert list(da.coords["fovs"]) == fovs
    assert list(da.coords["channels"]) == chans
    np.testing.assert_allclose(da.sel(fovs="fov1", channels="chan0").values,
                               data["fov1"][1][..., 0], rtol=1e-6)
    # subset of channels
    da1 = load_utils.load_imgs_from_tree(str(tmp_path), fovs=fovs, channels=["chan1"])
    assert da1.shape == (3, 32, 32, 1)


def test_load_imgs_from_dir(tmp_path):
    fovs = test_utils.make_fov_names(2)
    chans = ["chan0"]
    data = test_utils.create_image_cohort(str(tmp_path / "tree"), fovs, chans, shape=(16, 16))
    test_utils.save_label_dir(str(tmp_path / "masks"), data)
    da = load_utils.load_imgs_from_dir(str(tmp_path / "masks"), trim_suffix="_whole_cell")
    assert da.shape == (2, 16, 16, 1)
    assert list(da.coords["fovs"]) == fovs
    assert da.values.max() == 20


def test_get_tiled_fov_names():
    names = load_utils.get_tiled_fov_names(["tile_R1C1", "tile_R2C3"])
    assert len(names) == 6
    assert "tile_R2C2" in names


def test_dataarray_sel_and_h5(tmp_path):
    da = DataArray(np.arange(24).reshape(2, 3, 4),
                   coords={"fovs": ["f0", "f1"], "rows": np.arange(3),
                           "cols": np.arange(4)})
    sub = da.sel(fovs="f1")
    assert sub.shape == (3, 4)
    assert sub.values[0, 0] == 12
    multi = da.sel(fovs=["f0", "f1"])
    assert multi.shape == (2, 3, 4)
    p = str(tmp_path / "d.h5")
    da.to_h5(p)
    back = DataArray.from_h5(p)
    assert back.equals(da)


def test_ome_roundtrip(tmp_path):
    from ark_tpu.io import ome_utils
    fovs = test_utils.make_fov_names(1)
    chans = ["CD3", "CD45"]
    test_utils.create_image_cohort(str(tmp_path / "tree"), fovs, chans,
                                   shape=(16, 16))
    ome = ome_utils.fov_to_ome(str(tmp_path / "tree" / "fov0"),
                               str(tmp_path / "ome"))
    assert ome.endswith("fov0.ome.tiff")
    out_dir = ome_utils.ome_to_fov(ome, str(tmp_path / "back"))
    for chan in chans:
        a = read_image(str(tmp_path / "tree" / "fov0" / f"{chan}.tiff"))
        b = read_image(os.path.join(out_dir, f"{chan}.tiff"))
        np.testing.assert_array_equal(a, b)


def test_load_imgs_from_mibitiff(tmp_path):
    from ark_tpu.io import ome_utils
    chans = ["CD3", "CD45", "ECAD"]
    test_utils.create_image_cohort(str(tmp_path / "tree"), ["fov0", "fov1"],
                                   chans, shape=(16, 16))
    ome_dir = tmp_path / "ome"
    for fov in ["fov0", "fov1"]:
        ome_utils.fov_to_ome(str(tmp_path / "tree" / fov), str(ome_dir))
    da = load_utils.load_imgs_from_mibitiff(str(ome_dir))
    assert da.shape == (2, 16, 16, 3)
    assert list(da.coords["channels"]) == chans
    # channel subset
    da_sub = load_utils.load_imgs_from_mibitiff(str(ome_dir),
                                                channels=["CD45"])
    assert da_sub.shape == (2, 16, 16, 1)
    a = da.sel(fovs="fov0", channels="CD45").values
    b = read_image(str(tmp_path / "tree" / "fov0" / "CD45.tiff"))
    np.testing.assert_array_equal(a, b)
