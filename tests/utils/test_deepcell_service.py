"""DeepCell-service shim contract tests (reference
`deepcell_service_utils.py:17-423`): the zip batch artifacts, response
extraction/rename rules, missing-output warnings, resume semantics, and
argument validation — the parts the reference's suite exercises with a
mocked REST service (`tests/utils/deepcell_service_utils_test.py:22-116`),
here against the real in-process model."""

import os
from zipfile import ZipFile

import numpy as np
import pytest

from ark_tpu.io.image_utils import read_image, save_image
from ark_tpu.utils import deepcell_service_utils as dsu

from tests import test_utils

CKPT = os.path.join(os.path.dirname(dsu.__file__), "..", "models",
                    "checkpoints", "mesmer_mini_synthetic.npz")


def _write_inputs(tmp_path, fovs, hw=64):
    from ark_tpu.segmentation import synthetic
    rng = np.random.default_rng(11)
    imgs, cells, _ = synthetic.synthetic_cells(rng, len(fovs), hw=hw)
    input_dir = tmp_path / "deepcell_input"
    input_dir.mkdir(exist_ok=True)
    for i, fov in enumerate(fovs):
        stack = np.moveaxis(imgs[i], -1, 0)   # channels-first contract
        save_image(str(input_dir / f"{fov}.tiff"), stack)
    return str(input_dir), cells


def test_generate_deepcell_input_validation(tmp_path):
    with pytest.raises(ValueError, match="non-empty"):
        dsu.generate_deepcell_input(str(tmp_path), str(tmp_path), [], [],
                                    ["fov0"])


def test_generate_deepcell_input_mem_only(tmp_path):
    data = test_utils.create_image_cohort(str(tmp_path / "t"), ["fov0"],
                                          ["m1", "m2"], shape=(16, 16))
    out_dir = tmp_path / "in"
    out_dir.mkdir()
    dsu.generate_deepcell_input(str(out_dir), str(tmp_path / "t"),
                                None, ["m1", "m2"], ["fov0"],
                                img_sub_folder=None)
    img = read_image(str(out_dir / "fov0.tiff"))
    assert img.shape == (2, 16, 16)
    assert (img[0] == 0).all()      # empty nuclear plane
    np.testing.assert_allclose(img[1],
                               data["fov0"][1].sum(-1), rtol=1e-5)


def test_zip_input_files_skip_if_exists(tmp_path):
    input_dir, _ = _write_inputs(tmp_path, ["fov0", "fov1"])
    z1 = dsu.zip_input_files(input_dir, ["fov0", "fov1"], batch_num=1)
    mtime = os.path.getmtime(z1)
    with ZipFile(z1) as zf:
        assert sorted(zf.namelist()) == ["fov0.tiff", "fov1.tiff"]
    z2 = dsu.zip_input_files(input_dir, ["fov0"], batch_num=1)
    assert z2 == z1 and os.path.getmtime(z2) == mtime   # not rebuilt


def test_run_deepcell_direct_zip_artifact_roundtrip(tmp_path):
    """zip in -> response zip of <fov>_feature_{0,1}.tif -> extraction
    renames to the whole_cell/nuclear suffixes with the extra 'f'."""
    fovs = ["fovs_a", "fovs_b"]
    input_dir, cells = _write_inputs(tmp_path, fovs)
    zip_path = dsu.zip_input_files(input_dir, fovs, batch_num=1)
    out_dir = tmp_path / "out"
    out_dir.mkdir()
    rc = dsu.run_deepcell_direct(zip_path, str(out_dir),
                                 weights_path=CKPT)
    assert rc == 0
    resp = out_dir / "deepcell_response_fovs_batch_1.zip"
    assert resp.exists()
    with ZipFile(resp) as zf:
        names = sorted(zf.namelist())
    assert names == ["fovs_a_feature_0.tif", "fovs_a_feature_1.tif",
                     "fovs_b_feature_0.tif", "fovs_b_feature_1.tif"]

    dsu.extract_deepcell_response(str(out_dir), fovs, 1, "_whole_cell",
                                  "_nuclear")
    for fov in fovs:
        wc = read_image(str(out_dir / f"{fov}_whole_cell.tiff"))
        nuc = read_image(str(out_dir / f"{fov}_nuclear.tiff"))
        assert wc.dtype == np.int32
        assert wc.max() >= 2        # trained weights segment real instances
        assert nuc.max() >= 1


def test_extract_deepcell_response_warns_on_missing(tmp_path):
    import io as _io

    from PIL import Image
    out_dir = tmp_path
    resp = out_dir / "deepcell_response_fovs_batch_7.zip"
    with ZipFile(resp, "w") as zf:
        buf = _io.BytesIO()
        Image.fromarray(np.zeros((4, 4), np.int32)).save(buf, format="TIFF")
        zf.writestr("fovX_feature_0.tif", buf.getvalue())
    with pytest.warns(UserWarning, match="nuclear output file was not found"):
        dsu.extract_deepcell_response(str(out_dir), ["fovX"], 7,
                                      "_whole_cell", "_nuclear")
    with pytest.warns(UserWarning, match="whole cell output file"):
        dsu.extract_deepcell_response(str(out_dir), ["fovY"], 7,
                                      "_whole_cell", "_nuclear")


def test_create_deepcell_output_validation_and_resume(tmp_path, capsys):
    fovs = ["f0", "f1", "f2"]
    input_dir, _ = _write_inputs(tmp_path, fovs, hw=32)
    out_dir = str(tmp_path / "masks")
    with pytest.raises(ValueError, match="Scale"):
        dsu.create_deepcell_output(input_dir, out_dir, fovs=fovs,
                                   scale="big")
    with pytest.raises(ValueError):    # unknown fov
        dsu.create_deepcell_output(input_dir, out_dir, fovs=["nope"])

    dsu.create_deepcell_output(input_dir, out_dir, fovs=["f0"],
                               weights_path=CKPT)
    capsys.readouterr()
    # resume: f0 done, only f1/f2 processed, with a skip message
    dsu.create_deepcell_output(input_dir, out_dir, fovs=fovs,
                               weights_path=CKPT, zip_size=2)
    out = capsys.readouterr().out
    assert "Skipping 1 previously processed" in out
    for fov in fovs:
        assert os.path.exists(os.path.join(out_dir, fov + "_whole_cell.tiff"))
    # everything present -> full skip
    dsu.create_deepcell_output(input_dir, out_dir, fovs=fovs,
                               weights_path=CKPT)
    assert "All FOVs already segmented" in capsys.readouterr().out


def test_create_deepcell_output_device_postprocess(tmp_path):
    """The compat driver forwards predict kwargs: postprocess='device'
    runs the fused device flood and writes masks matching a direct
    Mesmer.predict on the same inputs."""
    from ark_tpu.segmentation import synthetic
    from ark_tpu.segmentation.mesmer import Mesmer

    fovs = ["f0", "f1"]
    input_dir, _ = _write_inputs(tmp_path, fovs, hw=32)
    out_dir = str(tmp_path / "masks_dev")
    dsu.create_deepcell_output(input_dir, out_dir, fovs=fovs,
                               weights_path=CKPT, postprocess="device")
    # _write_inputs' generator is deterministic: rebuild the same images
    imgs = synthetic.synthetic_cells(np.random.default_rng(11),
                                     len(fovs), hw=32)[0]
    app = Mesmer(weights_path=CKPT)
    want = app.predict(imgs.astype(np.float32), postprocess="device")
    for i, fov in enumerate(fovs):
        got = read_image(os.path.join(out_dir, fov + "_whole_cell.tiff"))
        np.testing.assert_array_equal(got, want["whole_cell"][i])


def test_generate_input_does_not_overflow_integer_channels(tmp_path):
    """Three ~30k-count uint16 membrane channels sum to 90k: the input
    TIFF must carry 90k (promoted dtype + warning), not a wrapped value."""
    import warnings as _warnings
    from ark_tpu.io.image_utils import read_image, save_image
    tiff_dir = tmp_path / "tiffs"
    out_dir = tmp_path / "input"
    out_dir.mkdir()
    (tiff_dir / "fovX").mkdir(parents=True)
    for chan in ("nuc", "mem1", "mem2", "mem3"):
        save_image(str(tiff_dir / "fovX" / f"{chan}.tiff"),
                   np.full((16, 16), 30000, np.uint16))
    with _warnings.catch_warnings(record=True) as w:
        _warnings.simplefilter("always")
        dsu.generate_deepcell_input(
            str(out_dir), str(tiff_dir), ["nuc"], ["mem1", "mem2", "mem3"],
            ["fovX"], img_sub_folder=None)
    assert any("exceed" in str(x.message) for x in w)
    out = read_image(str(out_dir / "fovX.tiff"))
    assert out[1].max() == 90000          # membrane sum intact
    assert out[0].max() == 30000
