"""Per-FOV checkpoint/resume for `generate_cell_table` (VERDICT r4 weak #3:
the endurance rerun redid ~716 s of quantification because the cohort loop
was monolithic, unlike every pixie stage). Resume contract: parts written
under the same settings are loaded bitwise-identically; changed settings
invalidate them; a kill mid-cohort only redoes unfinished FOVs."""

import os

import numpy as np
import pandas as pd
import pytest

from ark_tpu.segmentation import marker_quantification
from tests import test_utils

CHANNELS = ["chan0", "chan1", "chan2"]


@pytest.fixture
def cohort(rng, tmp_path):
    fovs = ["fov0", "fov1", "fov2"]
    tiff_dir = str(tmp_path / "imgs")
    seg_dir = str(tmp_path / "segs")
    data = test_utils.create_image_cohort(tiff_dir, fovs, CHANNELS,
                                          shape=(48, 48), n_cells=8)
    test_utils.save_label_dir(seg_dir, data)
    return fovs, tiff_dir, seg_dir, str(tmp_path / "parts")


def _run(cohort, **kw):
    fovs, tiff_dir, seg_dir, parts = cohort
    return marker_quantification.generate_cell_table(
        segmentation_dir=seg_dir, tiff_dir=tiff_dir, img_sub_folder=None,
        fovs=fovs, **kw)


def test_checkpointed_equals_direct(cohort):
    fovs, tiff_dir, seg_dir, parts = cohort
    norm_d, arc_d = _run(cohort)
    norm_c, arc_c = _run(cohort, checkpoint_dir=parts)
    pd.testing.assert_frame_equal(norm_c, norm_d)
    pd.testing.assert_frame_equal(arc_c, arc_d)
    assert sorted(f for f in os.listdir(parts) if f.endswith(".quant.pkl")) \
        == [f + ".quant.pkl" for f in fovs]


def test_resume_skips_finished_fovs(cohort, monkeypatch):
    """A rerun over a complete checkpoint extracts nothing; a partial
    checkpoint (as left by a mid-cohort kill) only re-extracts the missing
    FOVs — and both reproduce the direct result exactly."""
    fovs, tiff_dir, seg_dir, parts = cohort
    norm_d, arc_d = _run(cohort)
    _run(cohort, checkpoint_dir=parts)

    calls = []
    orig = marker_quantification.create_marker_count_matrices

    def spying(*a, **kw):
        labels = kw["segmentation_labels"] if "segmentation_labels" in kw \
            else a[0]
        calls.append(str(np.asarray(labels.coords["fovs"]).ravel()[0]))
        return orig(*a, **kw)

    monkeypatch.setattr(marker_quantification,
                        "create_marker_count_matrices", spying)
    norm_c, arc_c = _run(cohort, checkpoint_dir=parts)
    assert calls == []          # full checkpoint: zero re-extraction
    pd.testing.assert_frame_equal(norm_c, norm_d)
    pd.testing.assert_frame_equal(arc_c, arc_d)

    # simulate a kill after fov0: drop the later parts, leave a torn .tmp
    os.remove(os.path.join(parts, "fov1.quant.pkl"))
    os.remove(os.path.join(parts, "fov2.quant.pkl"))
    with open(os.path.join(parts, "fov1.quant.pkl.tmp"), "wb") as f:
        f.write(b"torn write")
    norm_r, arc_r = _run(cohort, checkpoint_dir=parts)
    assert calls == ["fov1", "fov2"]
    pd.testing.assert_frame_equal(norm_r, norm_d)
    pd.testing.assert_frame_equal(arc_r, arc_d)


def test_corrupted_part_is_reextracted(cohort):
    fovs, tiff_dir, seg_dir, parts = cohort
    norm_d, _ = _run(cohort)
    _run(cohort, checkpoint_dir=parts)
    with open(os.path.join(parts, "fov1.quant.pkl"), "wb") as f:
        f.write(b"\x00garbage")
    norm_c, _ = _run(cohort, checkpoint_dir=parts)
    pd.testing.assert_frame_equal(norm_c, norm_d)


def test_regenerated_mask_invalidates_only_that_fov(cohort, monkeypatch):
    """Rewriting one FOV's segmentation mask (same settings — e.g. a
    template-1 rerun with a new checkpoint regenerates masks in place)
    must re-extract exactly that FOV: the parameter manifest cannot see
    input changes, so each part carries its input files' identity."""
    from ark_tpu.io.image_utils import read_image, save_image

    fovs, tiff_dir, seg_dir, parts = cohort
    _run(cohort, checkpoint_dir=parts)

    mask_path = os.path.join(seg_dir, "fov1_whole_cell.tiff")
    mask = read_image(mask_path)
    mask[mask == mask.max()] = 0          # genuinely different segmentation
    save_image(mask_path, mask)
    os.utime(mask_path, ns=(os.stat(mask_path).st_atime_ns,
                            os.stat(mask_path).st_mtime_ns + 1_000_000))

    calls = []
    orig = marker_quantification.create_marker_count_matrices

    def spying(*a, **kw):
        labels = kw["segmentation_labels"] if "segmentation_labels" in kw \
            else a[0]
        calls.append(str(np.asarray(labels.coords["fovs"]).ravel()[0]))
        return orig(*a, **kw)

    monkeypatch.setattr(marker_quantification,
                        "create_marker_count_matrices", spying)
    norm_c, _ = _run(cohort, checkpoint_dir=parts)
    assert calls == ["fov1"]
    norm_direct, _ = _run(cohort)
    pd.testing.assert_frame_equal(norm_c, norm_direct)


def test_legacy_identityless_part_is_reextracted(cohort):
    """Parts written by the pre-identity format (2-tuples) are treated as
    stale — their inputs are unknowable."""
    fovs, tiff_dir, seg_dir, parts = cohort
    norm_d, _ = _run(cohort)
    _run(cohort, checkpoint_dir=parts)
    p = os.path.join(parts, "fov0.quant.pkl")
    norm_parts, arc_parts, _ident = pd.read_pickle(p)
    pd.to_pickle((norm_parts, arc_parts), p)
    norm_c, _ = _run(cohort, checkpoint_dir=parts)
    pd.testing.assert_frame_equal(norm_c, norm_d)
    assert len(pd.read_pickle(p)) == 3   # rewritten in the current format


def test_changed_settings_invalidate_parts(cohort):
    fovs, tiff_dir, seg_dir, parts = cohort
    _run(cohort, checkpoint_dir=parts)
    assert os.path.exists(os.path.join(parts, "fov0.quant.pkl"))

    # different extraction → stale parts must be wiped, not reused
    norm_pos, _ = _run(cohort, checkpoint_dir=parts,
                       extraction="positive_pixel")
    assert sorted(f for f in os.listdir(parts) if f.endswith(".quant.pkl")) \
        == [f + ".quant.pkl" for f in fovs]
    norm_pos_direct, _ = _run(cohort, extraction="positive_pixel")
    pd.testing.assert_frame_equal(norm_pos, norm_pos_direct)
    # and positive-pixel counts genuinely differ from total intensity
    norm_d, _ = _run(cohort)
    assert not np.allclose(norm_pos["chan0"].values, norm_d["chan0"].values)
