"""Device deep-watershed postprocess (`Mesmer.predict(postprocess=
'device')`): instance-level parity with the host C++ priority-flood path
on held-out planted synthetic FOVs, plus the segment_fovs wiring.

The two paths may differ at equidistant watershed ties (ops/watershed.py
module docstring), so parity is asserted at the level the reference's
segmentation value lives at — recovered instances — and additionally as
near-total pixel agreement, not bitwise equality.
"""

import os

import numpy as np
import pytest

from ark_tpu.segmentation import mesmer, synthetic

CKPT = os.path.join(os.path.dirname(mesmer.__file__), "..", "models",
                    "checkpoints", "mesmer_mini_synthetic.npz")


@pytest.fixture(scope="module")
def trained_app():
    return mesmer.Mesmer(weights_path=CKPT)


@pytest.fixture(scope="module")
def held_out():
    rng = np.random.default_rng(999)
    return synthetic.synthetic_cells(rng, 4, hw=64)


def test_device_post_instance_parity_with_host(trained_app, held_out):
    imgs, cells, nucs = held_out
    host = trained_app.predict(imgs, postprocess="host")
    dev = trained_app.predict(imgs, postprocess="device")
    for comp, truth in (("whole_cell", cells), ("nuclear", nucs)):
        # same planted-truth bar as the host-path test
        # (test_mesmer_planted.py), and the two paths must agree per pixel
        # everywhere except watershed-tie boundaries
        stats = [synthetic.match_instances(dev[comp][i], truth[i])
                 for i in range(imgs.shape[0])]
        assert np.mean([s["recall"] for s in stats]) >= 0.9
        assert np.mean([s["precision"] for s in stats]) >= 0.9
        flooded = host[comp] > 0
        np.testing.assert_array_equal(dev[comp] > 0, flooded)
        agree = (dev[comp] == host[comp])[flooded].mean()
        assert agree >= 0.99, f"{comp} pixel agreement {agree:.4f}"


def test_device_post_marker_numbering_matches_host(trained_app, held_out):
    """Marker labeling on device (cc.label_batched) reproduces scipy's
    raster numbering, so label IDS — not just instance sets — line up
    with the host path away from ties."""
    imgs = held_out[0]
    host = trained_app.predict(imgs, postprocess="host")
    dev = trained_app.predict(imgs, postprocess="device")
    for comp in ("whole_cell", "nuclear"):
        assert set(np.unique(dev[comp])) == set(np.unique(host[comp]))


def test_segment_fovs_device_path(trained_app, held_out):
    imgs = held_out[0]
    out = mesmer.segment_fovs(imgs, weights_path=CKPT, batch_size=2,
                              postprocess="device")
    want = trained_app.predict(imgs, postprocess="device")
    for comp in ("whole_cell", "nuclear"):
        assert out[comp].shape == imgs.shape[:3]
        assert out[comp].dtype == np.int32
        np.testing.assert_array_equal(out[comp], want[comp])


def test_predict_rejects_unknown_postprocess(trained_app, held_out):
    with pytest.raises(ValueError, match="postprocess"):
        trained_app.predict(held_out[0][:1], postprocess="gpu")


def test_device_post_min_cell_size(trained_app, held_out):
    """min_cell_size feeds the batched area filter: a huge floor empties
    the segmentation on both paths identically."""
    imgs = held_out[0][:1]
    dev = trained_app.predict(imgs, postprocess="device",
                              min_cell_size=10 ** 6)
    host = trained_app.predict(imgs, postprocess="host",
                               min_cell_size=10 ** 6)
    assert (dev["whole_cell"] == 0).all()
    np.testing.assert_array_equal(dev["whole_cell"], host["whole_cell"])
