"""Fused single-sweep pixel stage (pixie_fused) vs the multi-pass pipeline.

The contract is artifact bitwise-identity: a cohort run through
``run_pixel_clustering`` must leave the exact same files on disk as the
reference-shaped chain create_pixel_matrix → train_pixel_som →
cluster_pixels → generate_som_avg_files → pixel_consensus_cluster →
generate_meta_avg_files, so resume and GUI remap re-entry work on either
path's outputs interchangeably (VERDICT-r4 weak #1 / SURVEY.md §7)."""

import os

import numpy as np
import pandas as pd
import pytest

from ark_tpu.io import feather_utils as feather
from ark_tpu.phenotyping import (pixel_meta_clustering, pixel_som_clustering,
                                 pixie_fused, pixie_preprocessing)
from tests import test_utils

FOVS = ["fov0", "fov1", "fov2"]
CHANNELS = ["chan0", "chan1", "chan2", "chan3"]
MAX_K = 5


def _build_cohort(base):
    base = str(base)
    data = test_utils.create_image_cohort(
        os.path.join(base, "image_data"), FOVS, CHANNELS, shape=(48, 48),
        n_cells=12)
    seg_dir = os.path.join(base, "segmentation", "deepcell_output")
    test_utils.save_label_dir(seg_dir, data)
    os.makedirs(os.path.join(base, "pixel_output_dir"), exist_ok=True)
    return base, os.path.join(base, "image_data"), seg_dir


def _run_multipass(base, tiff_dir, seg_dir, subset_proportion=0.5):
    pixie_preprocessing.create_pixel_matrix(
        FOVS, CHANNELS, base, tiff_dir, seg_dir, img_sub_folder=None,
        subset_proportion=subset_proportion)
    pysom = pixel_som_clustering.train_pixel_som(
        FOVS, CHANNELS, base,
        norm_vals_name="channel_norm_post_rownorm.feather")
    pixel_som_clustering.cluster_pixels(FOVS, base, pysom)
    pixel_som_clustering.generate_som_avg_files(
        FOVS, CHANNELS, base, pysom, data_dir="pixel_mat_data")
    cc = pixel_meta_clustering.pixel_consensus_cluster(
        FOVS, CHANNELS, base, max_k=MAX_K)
    pixel_meta_clustering.generate_meta_avg_files(
        FOVS, CHANNELS, base, cc, data_dir="pixel_mat_data")
    return pysom, cc


def _run_fused(base, tiff_dir, seg_dir, subset_proportion=0.5, **kw):
    return pixie_fused.run_pixel_clustering(
        FOVS, CHANNELS, base, tiff_dir, seg_dir=seg_dir, img_sub_folder=None,
        max_k=MAX_K, subset_proportion=subset_proportion, **kw)


ARTIFACTS = [
    "pixel_output_dir/channel_norm_pre_rownorm.feather",
    "pixel_output_dir/pixel_thresh.feather",
    "channel_norm_post_rownorm.feather",
    "pixel_som_weights.feather",
] + [f"pixel_mat_subsetted/{f}.feather" for f in FOVS] \
  + [f"pixel_mat_data/{f}.feather" for f in FOVS]

CSVS = ["pixel_mat_data/channel_norm_post_rownorm_perfov.csv",
        "pixel_channel_avg_som_cluster.csv",
        "pixel_channel_avg_meta_cluster.csv"]


def _assert_same_artifacts(base_mp, base_fu):
    for rel in ARTIFACTS + CSVS:
        read = pd.read_csv if rel.endswith(".csv") else feather.read_dataframe
        a = read(os.path.join(base_mp, rel))
        b = read(os.path.join(base_fu, rel))
        try:
            pd.testing.assert_frame_equal(b, a, check_exact=True)
        except AssertionError as e:
            raise AssertionError(f"artifact mismatch: {rel}\n{e}") from e


@pytest.fixture(scope="module")
def cohort_pair(tmp_path_factory):
    """Both pipelines run once on identical cohorts; tests compare slices."""
    base_mp, tiff_mp, seg_mp = _build_cohort(tmp_path_factory.mktemp("mp"))
    base_fu, tiff_fu, seg_fu = _build_cohort(tmp_path_factory.mktemp("fu"))
    _run_multipass(base_mp, tiff_mp, seg_mp)
    _run_fused(base_fu, tiff_fu, seg_fu)
    return base_mp, base_fu


def test_fused_artifacts_bitwise_match_multipass(cohort_pair):
    base_mp, base_fu = cohort_pair
    _assert_same_artifacts(base_mp, base_fu)
    # fused writes the full feather once: som + meta labels present, and
    # the channel columns carry the f64 norm-divided values
    t = feather.read_table(os.path.join(base_fu, "pixel_mat_data",
                                        "fov0.feather"))
    assert "pixel_som_cluster" in t.column_names
    assert "pixel_meta_cluster" in t.column_names
    # cache cleaned up by default
    assert not os.path.exists(
        os.path.join(base_fu, "pixel_output_dir", "_fused_cache"))


def test_batched_channel_percentiles_match_per_channel():
    """The one-dispatch per-channel nonzero quantile must equal the
    multi-pass per-(channel, fov) nonzero_quantile calls bitwise."""
    import jax.numpy as jnp

    from ark_tpu.ops import quantiles
    rng = np.random.default_rng(12345)
    img = rng.random((37, 53, 5), np.float32)
    img[img < 0.4] = 0.0
    img[..., 3] = 0.0  # a channel with no positive pixels
    batched, haspos = pixie_fused._channel_percentiles_device(
        jnp.asarray(img), 0.99)
    batched, haspos = np.asarray(batched), np.asarray(haspos)
    np.testing.assert_array_equal(haspos, (img > 0).any(axis=(0, 1)))
    for c in range(5):
        single = float(quantiles.nonzero_quantile(
            jnp.asarray(img[..., c]), 0.99))
        if np.isnan(single):
            assert np.isnan(batched[c])
        else:
            assert batched[c] == np.float32(single)


def test_fused_spill_path_matches_resident(cohort_pair, tmp_path):
    """hbm_cache_bytes=0 forces every FOV through the disk-stash spill
    path; artifacts must be bitwise-identical to the resident run (which
    must equal multipass, so compare against the multipass base)."""
    base_mp, _ = cohort_pair
    base_sp, tiff_sp, seg_sp = _build_cohort(tmp_path / "spill")
    pixie_fused.run_pixel_clustering(
        FOVS, CHANNELS, base_sp, tiff_sp, seg_dir=seg_sp,
        img_sub_folder=None, max_k=MAX_K, subset_proportion=0.5,
        hbm_cache_bytes=0)
    _assert_same_artifacts(base_mp, base_sp)


def test_fused_host_spill_path_matches(cohort_pair, tmp_path):
    """host_cache_bytes=0 forces every FOV through the write-now-append-
    meta-later path (SOM-only feather + the consensus temp-dir pass);
    artifacts must be bitwise-identical to the multipass base."""
    base_mp, _ = cohort_pair
    base_sp, tiff_sp, seg_sp = _build_cohort(tmp_path / "hostspill")
    pixie_fused.run_pixel_clustering(
        FOVS, CHANNELS, base_sp, tiff_sp, seg_dir=seg_sp,
        img_sub_folder=None, max_k=MAX_K, subset_proportion=0.5,
        host_cache_bytes=0)
    _assert_same_artifacts(base_mp, base_sp)


def test_fused_mixed_ram_and_spill_matches(cohort_pair, tmp_path):
    """A budget that fits only the first FOV exercises BOTH final-write
    paths in one run (RAM-deferred single write + spill append); the
    averaging passes then mix table_source frames with disk reads."""
    base_mp, _ = cohort_pair
    base_mx, tiff_mx, seg_mx = _build_cohort(tmp_path / "mixed")
    # one FOV's store entry is ~n*(C*8+4+8+4) ≈ 110 KB at the test's
    # 48x48x4 cohort — 300 KB holds two FOVs and spills the third
    pixie_fused.run_pixel_clustering(
        FOVS, CHANNELS, base_mx, tiff_mx, seg_dir=seg_mx,
        img_sub_folder=None, max_k=MAX_K, subset_proportion=0.5,
        host_cache_bytes=300_000)
    _assert_same_artifacts(base_mp, base_mx)


def test_fov_quantiles_replicates_pandas():
    """_fov_quantiles (order-stat surrogate replication) must equal the
    real pandas frame quantile bitwise on both numpy paths: any-NaN
    (per-column f32 np.quantile) and no-NaN (f64 2-D np.quantile)."""
    rng = np.random.default_rng(12345)
    for trial in range(40):
        n = int(rng.integers(3, 3000))
        c = int(rng.integers(1, 7))
        q = float(rng.choice([0.999, 0.99, 0.5, 0.05, 0.75]))
        v = rng.random((n, c)).astype(np.float32)
        mode = trial % 3
        if mode == 0:
            v[v < 0.3] = 0.0          # NaN path
        elif mode == 1 and c > 1:
            v[:, 0] = 0.0             # an all-NaN column
        ref = pd.DataFrame(v).replace(0, np.nan).quantile(q=q, axis=0)

        nz_sorted = [np.sort(v[:, ci][v[:, ci] != 0]) for ci in range(c)]
        counts = np.asarray([len(z) for z in nz_sorted])

        def sorted_cols(lo_rows, hi_rows, _z=nz_sorted):
            a_lo = np.asarray([z[i] if len(z) else np.float32(np.nan)
                               for z, i in zip(_z, lo_rows)])
            a_hi = np.asarray([z[i] if len(z) else np.float32(np.nan)
                               for z, i in zip(_z, hi_rows)])
            return a_lo, a_hi

        got = pixie_fused._fov_quantiles(sorted_cols, counts, n, q)
        assert got.dtype == ref.values.dtype, (trial, got.dtype, ref.dtype)
        np.testing.assert_array_equal(got, ref.values, err_msg=str(trial))


def test_fused_resume_after_partial_run(tmp_path):
    """A fused run killed mid-stage resumes to the same artifacts: stash
    files survive, finished FOVs are skipped, and the final state matches
    an uninterrupted fused run on an identical cohort."""
    base_a, tiff_a, seg_a = _build_cohort(tmp_path / "a")
    base_b, tiff_b, seg_b = _build_cohort(tmp_path / "b")
    _run_fused(base_a, tiff_a, seg_a)

    # simulate a kill right after SOM training: train raises on cohort b
    calls = {"n": 0}
    orig = pixel_som_clustering.train_pixel_som

    def dying_train(*a, **kw):
        calls["n"] += 1
        out = orig(*a, **kw)
        if calls["n"] == 1:
            raise KeyboardInterrupt("simulated kill after training")
        return out

    pixel_som_clustering.train_pixel_som, saved = dying_train, orig
    try:
        with pytest.raises(KeyboardInterrupt):
            pixie_fused.run_pixel_clustering(
                FOVS, CHANNELS, base_b, tiff_b, seg_dir=seg_b,
                img_sub_folder=None, max_k=MAX_K, subset_proportion=0.5)
    finally:
        pixel_som_clustering.train_pixel_som = saved
    # no data feathers yet, subsets + weights exist
    assert os.path.exists(os.path.join(base_b, "pixel_som_weights.feather"))
    assert not os.path.exists(os.path.join(base_b, "pixel_mat_data",
                                           "fov0.feather"))
    _run_fused(base_b, tiff_b, seg_b)
    _assert_same_artifacts(base_a, base_b)


def test_fused_resume_missing_stash_and_feather(cohort_pair, tmp_path):
    """Deleting one FOV's outputs (and with the cache long gone) must
    regenerate exactly the same feather from the TIFFs."""
    base_mp, base_fu = cohort_pair
    fov_file = os.path.join(base_fu, "pixel_mat_data", "fov1.feather")
    ref = feather.read_dataframe(fov_file)
    os.remove(fov_file)
    tiff_dir = os.path.join(base_fu, "image_data")
    seg_dir = os.path.join(base_fu, "segmentation", "deepcell_output")
    _run_fused(base_fu, tiff_dir, seg_dir)
    again = feather.read_dataframe(fov_file)
    # meta labels are reattached by the consensus pass on the rerun
    pd.testing.assert_frame_equal(again, ref, check_exact=True)


def test_fused_blank_fov_matches_multipass(tmp_path):
    """A FOV with zero valid pixels (all-zero channels) must not kill the
    fused sweep: the multi-pass driver records NaN for its 99.9% quantile
    and writes empty subset/data feathers, and the fused path must produce
    the identical artifact set (regression: _fov_quantiles raised
    IndexError on the empty no-NaN numpy path)."""
    from tests.test_utils import save_image

    def _blank_fov1(tiff_dir):
        for chan in CHANNELS:
            p = os.path.join(tiff_dir, "fov1", f"{chan}.tiff")
            save_image(p, np.zeros((48, 48), np.float32))

    base_mp, tiff_mp, seg_mp = _build_cohort(tmp_path / "mp")
    base_fu, tiff_fu, seg_fu = _build_cohort(tmp_path / "fu")
    _blank_fov1(tiff_mp)
    _blank_fov1(tiff_fu)
    _run_multipass(base_mp, tiff_mp, seg_mp)
    _run_fused(base_fu, tiff_fu, seg_fu)
    _assert_same_artifacts(base_mp, base_fu)
    blank = feather.read_dataframe(
        os.path.join(base_fu, "pixel_mat_data", "fov1.feather"))
    assert len(blank) == 0


def test_gui_remap_reentry_on_fused_outputs(cohort_pair):
    """apply_pixel_meta_cluster_remapping (the GUI re-entry path) operates
    on fused-written feathers unchanged."""
    base_mp, base_fu = cohort_pair
    som_avg = pd.read_csv(os.path.join(base_fu,
                                       "pixel_channel_avg_som_cluster.csv"))
    remap = som_avg[["pixel_som_cluster", "pixel_meta_cluster"]].copy()
    remap["pixel_meta_cluster_rename"] = remap["pixel_meta_cluster"].map(
        lambda m: f"pmc_{m}")
    remap.to_csv(os.path.join(base_fu, "pixel_remap.csv"), index=False)
    pixel_meta_clustering.apply_pixel_meta_cluster_remapping(
        FOVS, CHANNELS, base_fu, "pixel_mat_data", "pixel_remap.csv")
    t = feather.read_dataframe(os.path.join(base_fu, "pixel_mat_data",
                                            "fov0.feather"))
    assert "pixel_meta_cluster_rename" in t.columns
    assert set(t["pixel_meta_cluster_rename"].unique()) <= \
        set(remap["pixel_meta_cluster_rename"])
