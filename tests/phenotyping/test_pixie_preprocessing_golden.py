"""pixie preprocessing goldens (reference `pixie_preprocessing.py:18-456`,
mirrored after its 711-LoC test module): per-FOV blur/threshold/rownorm
semantics against scipy oracles, subset proportions, seg-label carry,
cohort resume + channel-set invalidation, and the post-rownorm norm-value
accumulation contract."""

import os

import numpy as np
import pandas as pd
import pytest
import scipy.ndimage as ndi

from ark_tpu.io import feather_utils as feather
from ark_tpu.phenotyping import pixie_preprocessing as pp

from tests import test_utils

CHANNELS = ["chan0", "chan1", "chan2"]


def test_create_fov_pixel_data_matches_scipy_oracle(rng):
    img = rng.random((24, 24, 3)).astype(np.float32)
    seg = rng.integers(0, 5, (24, 24)).astype(np.int32)
    thresh = 1.2
    pixel_mat, subset = pp.create_fov_pixel_data(
        "fovX", CHANNELS, img, seg, pixel_thresh_val=thresh, blur_factor=2,
        subset_proportion=0.5)

    # oracle: scipy blur per channel, rowsum threshold, rownorm
    blurred = np.stack([ndi.gaussian_filter(img[..., c], 2)
                        for c in range(3)], axis=-1).reshape(-1, 3)
    rowsums = blurred.sum(1)
    keep = np.flatnonzero((rowsums > thresh) & (blurred != 0).any(1))
    want = blurred[keep] / rowsums[keep, None]

    assert len(pixel_mat) == len(keep)
    np.testing.assert_allclose(pixel_mat[CHANNELS].values, want,
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(pixel_mat[CHANNELS].sum(axis=1), 1.0,
                               rtol=1e-5)
    # coordinates + seg labels point back at the source pixels
    np.testing.assert_array_equal(
        pixel_mat["row_index"].values * 24 + pixel_mat["column_index"].values,
        keep)
    np.testing.assert_array_equal(pixel_mat["label"].values,
                                  seg.ravel()[keep])
    assert len(subset) == pytest.approx(0.5 * len(pixel_mat), abs=1)
    # subset rows come from the full matrix
    assert subset.index.isin(pixel_mat.index).all()


def test_create_fov_pixel_data_without_seg(rng):
    img = rng.random((16, 16, 3)).astype(np.float32)
    pixel_mat, _ = pp.create_fov_pixel_data(
        "f", CHANNELS, img, None, pixel_thresh_val=0.0)
    assert "label" not in pixel_mat.columns


@pytest.fixture()
def cohort(tmp_path):
    data = test_utils.create_image_cohort(str(tmp_path / "tiffs"),
                                          ["fov0", "fov1", "fov2"], CHANNELS,
                                          shape=(32, 32))
    seg_dir = tmp_path / "seg"
    test_utils.save_label_dir(str(seg_dir), data)
    (tmp_path / "pixel_output_dir").mkdir()
    return tmp_path, data


def _run(base, fovs=("fov0", "fov1", "fov2"), channels=CHANNELS, **kw):
    pp.create_pixel_matrix(
        list(fovs), list(channels), str(base), str(base / "tiffs"),
        str(base / "seg"), img_sub_folder=None, **kw)


def test_create_pixel_matrix_outputs_and_norm_contract(cohort):
    base, _ = cohort
    _run(base)
    for fov in ("fov0", "fov1", "fov2"):
        assert (base / "pixel_mat_data" / f"{fov}.feather").exists()
        assert (base / "pixel_mat_subsetted" / f"{fov}.feather").exists()
    # pre-rownorm channel norms + pixel threshold persisted
    pre = feather.read_dataframe(
        base / "pixel_output_dir" / "channel_norm_pre_rownorm.feather")
    assert list(pre.columns) == sorted(CHANNELS)
    thresh = feather.read_dataframe(
        base / "pixel_output_dir" / "pixel_thresh.feather")
    assert thresh["pixel_thresh_val"].iloc[0] > 0
    # post-rownorm norms = mean over FOVs of per-FOV 99.9% nonzero quantiles
    post = feather.read_dataframe(base / "channel_norm_post_rownorm.feather")
    quants = []
    for fov in ("fov0", "fov1", "fov2"):
        df = feather.read_dataframe(base / "pixel_mat_data"
                                    / f"{fov}.feather")
        quants.append(df[sorted(CHANNELS)].replace(0, np.nan)
                      .quantile(0.999))
    want = pd.concat(quants, axis=1).mean(axis=1)
    np.testing.assert_allclose(post.iloc[0].values, want.values, rtol=1e-6)
    # the per-FOV quantile CSV is KEPT as the cohort ledger so later
    # incremental runs can recompute the cohort mean over ALL FOVs
    assert (base / "pixel_mat_data"
            / "channel_norm_post_rownorm_perfov.csv").exists()


def test_create_pixel_matrix_resume_skips_done_fovs(cohort, capsys):
    base, _ = cohort
    _run(base)
    capsys.readouterr()
    _run(base)   # everything done -> full skip
    assert "no more FOVs" in capsys.readouterr().out

    # simulate a mid-run interruption: fov2's outputs missing while the
    # in-progress per-FOV quantile CSV still lists fov0/fov1
    # (the reference resumes from the quantile CSV columns, :302-332)
    os.remove(base / "pixel_mat_data" / "fov2.feather")
    os.remove(base / "pixel_mat_subsetted" / "fov2.feather")
    quants = {}
    for fov in ("fov0", "fov1"):
        df = feather.read_dataframe(base / "pixel_mat_data"
                                    / f"{fov}.feather")
        quants[fov] = df[sorted(CHANNELS)].replace(0, np.nan).quantile(0.999)
    qdf = pd.DataFrame(quants)
    qdf.index.name = "channel"
    qdf.to_csv(base / "pixel_mat_data"
               / "channel_norm_post_rownorm_perfov.csv")
    _run(base)
    out = capsys.readouterr().out
    assert "Restarting preprocessing" in out
    assert "Processed 1 fovs" in out
    assert (base / "pixel_mat_data" / "fov2.feather").exists()


def test_create_pixel_matrix_channel_change_invalidates(cohort, capsys):
    base, _ = cohort
    _run(base)
    # re-run with a different channel set: cohort wiped and rebuilt
    _run(base, channels=CHANNELS[:2])
    out = capsys.readouterr().out
    assert "New channels provided" in out
    df = feather.read_dataframe(base / "pixel_mat_data" / "fov0.feather")
    assert sorted(set(df.columns) & set(CHANNELS)) == sorted(CHANNELS[:2])
    pre = feather.read_dataframe(
        base / "pixel_output_dir" / "channel_norm_pre_rownorm.feather")
    assert list(pre.columns) == sorted(CHANNELS[:2])


def test_create_pixel_matrix_validations(cohort):
    base, _ = cohort
    with pytest.raises(ValueError, match="subset percentage"):
        _run(base, subset_proportion=0.0)
    with pytest.raises(ValueError):
        _run(base, channels=["nonexistent_chan"])


def test_preprocess_fov_deterministic_subset(cohort):
    base, _ = cohort
    norm_df = pd.DataFrame([[1.0] * 3], columns=sorted(CHANNELS))
    for d in ("pixel_mat_data", "pixel_mat_subsetted"):
        (base / d).mkdir(exist_ok=True)
    m1 = pp.preprocess_fov(
        str(base), str(base / "tiffs"), "pixel_mat_data",
        "pixel_mat_subsetted", str(base / "seg"), "_whole_cell.tiff",
        None, False, sorted(CHANNELS), 2, 0.3, 0.05, 42, norm_df, "fov0")
    s1 = feather.read_dataframe(base / "pixel_mat_subsetted"
                                / "fov0.feather")
    m2 = pp.preprocess_fov(
        str(base), str(base / "tiffs"), "pixel_mat_data",
        "pixel_mat_subsetted", str(base / "seg"), "_whole_cell.tiff",
        None, False, sorted(CHANNELS), 2, 0.3, 0.05, 42, norm_df, "fov0")
    s2 = feather.read_dataframe(base / "pixel_mat_subsetted"
                                / "fov0.feather")
    pd.testing.assert_frame_equal(s1, s2)    # seeded subset is reproducible
    pd.testing.assert_frame_equal(m1.reset_index(drop=True),
                                  m2.reset_index(drop=True))


def test_resume_heals_missing_cohort_norm_file(cohort, capsys):
    """Run killed between the last FOV and the cohort-norm write: feathers
    + quantile CSV complete, norm file absent. The rerun must produce the
    norm file instead of skipping forever (the old early return fired on
    feather-completeness alone and wedged resume permanently)."""
    base, _ = cohort
    _run(base)
    norm_path = base / "channel_norm_post_rownorm.feather"
    saved_norm = feather.read_dataframe(norm_path)
    # reconstruct the killed-run state: norm missing, quantile CSV present
    quant_csv = base / "pixel_mat_data" / "channel_norm_post_rownorm_perfov.csv"
    quants = {}
    for fov in ("fov0", "fov1", "fov2"):
        df = feather.read_dataframe(base / "pixel_mat_data" / f"{fov}.feather")
        chans = [c for c in df.columns
                 if c not in ("fov", "row_index", "column_index", "label")]
        quants[fov] = df[chans].replace(0, np.nan).quantile(0.999)
    pd.DataFrame(quants).rename_axis("channel").to_csv(quant_csv)
    norm_path.unlink()

    capsys.readouterr()
    _run(base)
    out = capsys.readouterr().out
    assert "no more FOVs" not in out          # it did real healing work
    assert norm_path.exists()
    healed = feather.read_dataframe(norm_path)
    pd.testing.assert_frame_equal(
        healed, saved_norm, check_exact=False, rtol=1e-6)
    assert quant_csv.exists()                 # ledger kept for increments

    # and a THIRD run now skips cleanly
    capsys.readouterr()
    _run(base)
    assert "no more FOVs" in capsys.readouterr().out


def test_som_avg_files_in_resumed_session_does_not_crash(cohort, capsys):
    """generate_som_avg_files after a resume where cluster_pixels skipped
    everything: som_clusters_seen is empty — must warn + fall back, not
    pass 0 as the expected cluster count (the reference raises here)."""
    import warnings as _warnings
    from ark_tpu.phenotyping import pixel_som_clustering as psc
    base, _ = cohort
    _run(base)
    pysom = psc.train_pixel_som(
        ["fov0", "fov1", "fov2"], sorted(CHANNELS), str(base),
        norm_vals_name="channel_norm_post_rownorm.feather")
    psc.cluster_pixels(["fov0", "fov1", "fov2"], str(base), pysom,
                       data_dir="pixel_mat_data")
    # fresh session object: nothing assigned in-process
    pysom2 = psc.train_pixel_som(
        ["fov0", "fov1", "fov2"], sorted(CHANNELS), str(base),
        norm_vals_name="channel_norm_post_rownorm.feather")
    assert not pysom2.som_clusters_seen
    with _warnings.catch_warnings(record=True) as w:
        _warnings.simplefilter("always")
        psc.generate_som_avg_files(
            ["fov0", "fov1", "fov2"], sorted(CHANNELS), str(base), pysom2,
            data_dir="pixel_mat_data")
    assert any("resumed run" in str(x.message) for x in w)
    assert (base / "pixel_channel_avg_som_cluster.csv").exists()


def test_incremental_fov_addition_keeps_cohort_norms(cohort, capsys):
    """Adding a FOV to a completed cohort must recompute the norm over ALL
    FOVs — the reference deletes the quantile ledger after completion and
    a later incremental run overwrites the cohort norm with the mean over
    only the new FOVs (executed counterexample in the r2 review)."""
    base, _ = cohort
    _run(base, fovs=("fov0", "fov1"))
    partial_norm = feather.read_dataframe(
        base / "channel_norm_post_rownorm.feather")
    _run(base)   # now the full 3-FOV cohort
    full_norm = feather.read_dataframe(
        base / "channel_norm_post_rownorm.feather")
    # oracle: mean over the 3 per-FOV 99.9% quantiles
    quants = []
    for fov in ("fov0", "fov1", "fov2"):
        df = feather.read_dataframe(base / "pixel_mat_data"
                                    / f"{fov}.feather")
        quants.append(df[sorted(CHANNELS)].replace(0, np.nan)
                      .quantile(0.999))
    want = pd.concat(quants, axis=1).mean(axis=1)
    np.testing.assert_allclose(full_norm.iloc[0].values,
                               want[full_norm.columns].values, rtol=1e-6)
    # and it genuinely changed from the 2-FOV norm
    assert not np.allclose(full_norm.iloc[0].values,
                           partial_norm.iloc[0].values)
