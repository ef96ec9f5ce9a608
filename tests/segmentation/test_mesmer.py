import os

import numpy as np
import pytest

from ark_tpu.io.image_utils import read_image, save_image
from ark_tpu.ops import watershed as ws
from ark_tpu.segmentation import mesmer
from ark_tpu.utils import deepcell_service_utils

from tests import test_utils


def test_watershed_separates_touching_cells():
    # two gaussian bumps in the inner-distance -> two cells under watershed
    yy, xx = np.mgrid[:40, :40].astype(np.float32)
    inner = (np.exp(-((yy - 20) ** 2 + (xx - 12) ** 2) / 30)
             + np.exp(-((yy - 20) ** 2 + (xx - 28) ** 2) / 30))
    markers = np.zeros((40, 40), np.int32)
    markers[20, 12] = 1
    markers[20, 28] = 2
    mask = inner > 0.05
    labels = ws.watershed(-inner, markers, mask)
    assert labels[20, 12] == 1 and labels[20, 28] == 2
    assert (labels[~mask] == 0).all()
    # each marker floods its own half
    assert labels[20, 10] == 1 and labels[20, 30] == 2


def test_find_maxima():
    import jax.numpy as jnp
    img = np.zeros((1, 20, 20), np.float32)
    img[0, 5, 5] = 1.0
    img[0, 14, 15] = 0.8
    img[0, 2, 2] = 0.05  # below threshold
    maxima = np.asarray(mesmer._find_maxima(jnp.asarray(img), threshold=0.1))
    assert maxima[0, 5, 5] and maxima[0, 14, 15]
    assert not maxima[0, 2, 2]
    assert maxima[0].sum() == 2


def test_mesmer_predict_shapes(rng):
    app = mesmer.Mesmer(seed=0)
    batch = rng.random((2, 64, 64, 2)).astype(np.float32)
    out = app.predict(batch)
    assert out["whole_cell"].shape == (2, 64, 64)
    assert out["nuclear"].shape == (2, 64, 64)
    assert out["whole_cell"].dtype == np.int32
    raw = app.predict_raw(batch)
    assert raw["whole_cell_pixelwise"].shape == (2, 64, 64, 3)
    np.testing.assert_allclose(raw["whole_cell_pixelwise"].sum(-1), 1.0,
                               rtol=1e-3)


def test_deepcell_io_parity(rng, tmp_path):
    fovs = ["fov0", "fov1"]
    chans = ["nuc1", "nuc2", "mem1"]
    tiff_dir = tmp_path / "imgs"
    data = test_utils.create_image_cohort(str(tiff_dir), fovs, chans,
                                          shape=(32, 32))
    input_dir = tmp_path / "deepcell_input"
    input_dir.mkdir()
    deepcell_service_utils.generate_deepcell_input(
        str(input_dir), str(tiff_dir), ["nuc1", "nuc2"], ["mem1"], fovs,
        img_sub_folder=None)
    for fov in fovs:
        img = read_image(str(input_dir / f"{fov}.tiff"))
        assert img.shape == (2, 32, 32)
        expected_nuc = data[fov][1][..., 0] + data[fov][1][..., 1]
        np.testing.assert_allclose(img[0], expected_nuc, rtol=1e-5)

    output_dir = tmp_path / "deepcell_output"
    deepcell_service_utils.create_deepcell_output(
        str(input_dir), str(output_dir), fovs=fovs, zip_size=2)
    for fov in fovs:
        wc = read_image(str(output_dir / f"{fov}_whole_cell.tiff"))
        nuc = read_image(str(output_dir / f"{fov}_nuclear.tiff"))
        assert wc.shape == (32, 32) and wc.dtype == np.int32
        assert nuc.shape == (32, 32)
    # resume: all outputs exist -> skip
    deepcell_service_utils.create_deepcell_output(
        str(input_dir), str(output_dir), fovs=fovs)


def test_deepcell_zip_roundtrip(rng, tmp_path):
    """zip_input_files -> run_deepcell_direct -> extract_deepcell_response
    reproduces the reference's zip-based service artifact chain in-process."""
    in_dir = tmp_path / "dc_in"
    out_dir = tmp_path / "dc_out"
    in_dir.mkdir()
    out_dir.mkdir()
    fovs = ["fovA", "fovB"]
    for fov in fovs:
        img = (rng.random((2, 64, 64)) * 100).astype(np.float32)
        save_image(str(in_dir / f"{fov}.tiff"), img)

    zip_path = deepcell_service_utils.zip_input_files(str(in_dir), fovs, 1)
    assert zip_path.endswith("fovs_batch_1.zip")
    # second call is a no-op (skip-if-exists)
    assert deepcell_service_utils.zip_input_files(str(in_dir), fovs, 1) \
        == zip_path

    assert deepcell_service_utils.run_deepcell_direct(
        zip_path, str(out_dir)) == 0
    assert (out_dir / "deepcell_response_fovs_batch_1.zip").exists()

    deepcell_service_utils.extract_deepcell_response(
        str(out_dir), fovs, 1, "_whole_cell", "_nuclear")
    for fov in fovs:
        wc = read_image(str(out_dir / f"{fov}_whole_cell.tiff"))
        nuc = read_image(str(out_dir / f"{fov}_nuclear.tiff"))
        assert wc.shape == (64, 64)
        assert nuc.shape == (64, 64)


def test_mesmer_injected_model_requires_weights():
    from ark_tpu.models import unet as unet_mod
    model, variables = unet_mod.init_mesmer_mini()
    with pytest.raises(ValueError, match="variables= or weights_path="):
        mesmer.Mesmer(model=model)
    app = mesmer.Mesmer(model=model, variables=variables)   # valid pairing
    assert app.variables is variables
