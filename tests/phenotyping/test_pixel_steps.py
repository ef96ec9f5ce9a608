"""Granular pixel SOM/meta step behavior: untrained-object errors,
overwrite/resume semantics, the temp-dir atomic swap, avg-file skip logic,
and remap validation (reference `pixel_som_clustering.py:16-371`,
`pixel_meta_clustering.py:24-537` behaviors the e2e chain doesn't isolate)."""

import os

import numpy as np
import pandas as pd
import pytest

from ark_tpu.io import feather_utils as feather
from ark_tpu.phenotyping import (cluster_helpers, pixel_cluster_utils,
                                 pixel_meta_clustering,
                                 pixel_som_clustering)

CHANNELS = ["chan0", "chan1", "chan2"]
FOVS = ["fov0", "fov1"]


@pytest.fixture()
def pixel_base(tmp_path, rng):
    """base_dir with subsetted + full pixel feathers and norm values."""
    base = tmp_path
    (base / "pixel_mat_subsetted").mkdir()
    (base / "pixel_mat_data").mkdir()
    for fov in FOVS:
        df = pd.DataFrame(rng.random((150, 3)).astype(np.float32),
                          columns=CHANNELS)
        df["fov"] = fov
        df["row_index"] = rng.integers(0, 32, 150)
        df["column_index"] = rng.integers(0, 32, 150)
        df["label"] = rng.integers(1, 8, 150)
        feather.write_dataframe(
            df.sample(50, random_state=1),
            base / "pixel_mat_subsetted" / f"{fov}.feather")
        feather.write_dataframe(df, base / "pixel_mat_data" / f"{fov}.feather")
    feather.write_dataframe(
        pd.DataFrame([[0.9] * 3], columns=CHANNELS),
        base / "post_rowsum_chan_norm.feather")
    return base


def _train(base, **kw):
    return pixel_som_clustering.train_pixel_som(
        FOVS, CHANNELS, str(base), **kw)


def test_train_pixel_som_validations(pixel_base):
    with pytest.raises(ValueError):
        pixel_som_clustering.train_pixel_som(["bogus_fov"], CHANNELS,
                                             str(pixel_base))
    with pytest.raises(ValueError):
        pixel_som_clustering.train_pixel_som(FOVS, ["bogus_chan"],
                                             str(pixel_base))
    pysom = _train(pixel_base)
    assert os.path.exists(pixel_base / "pixel_som_weights.feather")
    assert pysom.weights.shape == (100, 3)


def test_cluster_pixels_untrained_raises(pixel_base):
    pysom = _train(pixel_base)
    pysom.weights = None
    with pytest.raises(ValueError, match="untrained"):
        pixel_som_clustering.cluster_pixels(FOVS, str(pixel_base), pysom,
                                            data_dir="pixel_mat_data")


def test_cluster_pixels_atomic_swap_and_resume(pixel_base, capsys):
    pysom = _train(pixel_base)
    pixel_som_clustering.cluster_pixels(FOVS, str(pixel_base), pysom,
                                        data_dir="pixel_mat_data")
    # temp dir swapped away; labels present
    assert not os.path.exists(pixel_base / "pixel_mat_data_temp")
    for fov in FOVS:
        df = feather.read_dataframe(
            pixel_base / "pixel_mat_data" / f"{fov}.feather")
        assert "pixel_som_cluster" in df.columns
        assert df["pixel_som_cluster"].between(1, 100).all()
    # second run: nothing left to assign
    capsys.readouterr()
    pixel_som_clustering.cluster_pixels(FOVS, str(pixel_base), pysom,
                                        data_dir="pixel_mat_data")
    assert "no more FOVs" in capsys.readouterr().out

    # overwrite reassigns from scratch (and matches, same weights/seed)
    before = feather.read_dataframe(
        pixel_base / "pixel_mat_data" / "fov0.feather")
    pixel_som_clustering.cluster_pixels(FOVS, str(pixel_base), pysom,
                                        data_dir="pixel_mat_data",
                                        overwrite=True)
    after = feather.read_dataframe(
        pixel_base / "pixel_mat_data" / "fov0.feather")
    np.testing.assert_array_equal(before["pixel_som_cluster"].values,
                                  after["pixel_som_cluster"].values)


def test_generate_som_avg_files_skip_and_overwrite(pixel_base, capsys):
    pysom = _train(pixel_base)
    pixel_som_clustering.cluster_pixels(FOVS, str(pixel_base), pysom,
                                        data_dir="pixel_mat_data")
    pixel_som_clustering.generate_som_avg_files(
        FOVS, CHANNELS, str(pixel_base), pysom, data_dir="pixel_mat_data")
    avg_path = pixel_base / "pixel_channel_avg_som_cluster.csv"
    assert avg_path.exists()
    first = pd.read_csv(avg_path)
    assert "count" in first.columns
    # skip when present
    capsys.readouterr()
    pixel_som_clustering.generate_som_avg_files(
        FOVS, CHANNELS, str(pixel_base), pysom, data_dir="pixel_mat_data")
    assert "skipping" in capsys.readouterr().out
    # untrained guard
    pysom_untrained = _train(pixel_base)
    pysom_untrained.weights = None
    with pytest.raises(ValueError, match="untrained"):
        pixel_som_clustering.generate_som_avg_files(
            FOVS, CHANNELS, str(pixel_base), pysom_untrained,
            data_dir="pixel_mat_data", overwrite=True)


@pytest.fixture()
def consensus_base(pixel_base, capsys):
    pysom = _train(pixel_base)
    pixel_som_clustering.cluster_pixels(FOVS, str(pixel_base), pysom,
                                        data_dir="pixel_mat_data")
    pixel_som_clustering.generate_som_avg_files(
        FOVS, CHANNELS, str(pixel_base), pysom, data_dir="pixel_mat_data")
    pixel_cc = pixel_meta_clustering.pixel_consensus_cluster(
        FOVS, CHANNELS, str(pixel_base), max_k=4,
        data_dir="pixel_mat_data")
    return pixel_base, pixel_cc


def test_pixel_consensus_cluster_labels(consensus_base):
    base, pixel_cc = consensus_base
    for fov in FOVS:
        df = feather.read_dataframe(base / "pixel_mat_data"
                                    / f"{fov}.feather")
        assert "pixel_meta_cluster" in df.columns
        assert df["pixel_meta_cluster"].between(1, 4).all()
    assert not os.path.exists(base / "pixel_mat_data_temp")


def test_remap_validation_and_application(consensus_base):
    base, pixel_cc = consensus_base
    pixel_meta_clustering.generate_meta_avg_files(
        FOVS, CHANNELS, str(base), pixel_cc, data_dir="pixel_mat_data")
    som_avg = pd.read_csv(base / "pixel_channel_avg_som_cluster.csv")

    # duplicate rename across different metaclusters must be rejected
    bad = som_avg[["pixel_som_cluster", "pixel_meta_cluster"]].copy()
    if bad["pixel_meta_cluster"].nunique() < 2:
        pytest.skip("consensus collapsed to one metacluster")
    bad["pixel_meta_cluster_rename"] = "same_name"
    bad.to_csv(base / "bad_remap.csv", index=False)
    with pytest.raises(ValueError):
        pixel_meta_clustering.apply_pixel_meta_cluster_remapping(
            FOVS, CHANNELS, str(base), "pixel_mat_data", "bad_remap.csv")

    # a valid remap merges metaclusters and renames
    good = som_avg[["pixel_som_cluster", "pixel_meta_cluster"]].copy()
    good["pixel_meta_cluster"] = 1           # merge everything
    good["pixel_meta_cluster_rename"] = "merged"
    good.to_csv(base / "good_remap.csv", index=False)
    pixel_meta_clustering.apply_pixel_meta_cluster_remapping(
        FOVS, CHANNELS, str(base), "pixel_mat_data", "good_remap.csv")
    df = feather.read_dataframe(base / "pixel_mat_data" / "fov0.feather")
    assert (df["pixel_meta_cluster"] == 1).all()
    assert (df["pixel_meta_cluster_rename"] == "merged").all()


def test_overwrite_recovers_from_stale_temp_dir(pixel_base):
    """A run killed mid-overwrite leaves `<data_dir>_temp` behind; retrying
    with overwrite=True must wipe it and complete (the reference's bare
    mkdir crashes with FileExistsError here, pixel_som_clustering.py:223)."""
    pysom = _train(pixel_base)
    pixel_som_clustering.cluster_pixels(FOVS, str(pixel_base), pysom,
                                        data_dir="pixel_mat_data")
    # simulate the dead run: stale temp with one partial (garbage) feather
    temp = pixel_base / "pixel_mat_data_temp"
    temp.mkdir()
    (temp / "fov0.feather").write_bytes(b"partial write from killed run")

    pixel_som_clustering.cluster_pixels(FOVS, str(pixel_base), pysom,
                                        data_dir="pixel_mat_data",
                                        overwrite=True)
    assert not temp.exists()
    for fov in FOVS:
        df = feather.read_dataframe(
            pixel_base / "pixel_mat_data" / f"{fov}.feather")
        assert "pixel_som_cluster" in df.columns
        assert df["pixel_som_cluster"].between(1, 100).all()


def test_meta_overwrite_recovers_from_stale_temp_dir(pixel_base):
    pysom = _train(pixel_base)
    pixel_som_clustering.cluster_pixels(FOVS, str(pixel_base), pysom,
                                        data_dir="pixel_mat_data")
    pixel_som_clustering.generate_som_avg_files(
        FOVS, CHANNELS, str(pixel_base), pysom, data_dir="pixel_mat_data")
    pixel_meta_clustering.pixel_consensus_cluster(
        FOVS, CHANNELS, str(pixel_base), max_k=3, data_dir="pixel_mat_data")

    temp = pixel_base / "pixel_mat_data_temp"
    temp.mkdir()
    (temp / "fov1.feather").write_bytes(b"\x00\x01 killed mid-write")
    pixel_meta_clustering.pixel_consensus_cluster(
        FOVS, CHANNELS, str(pixel_base), max_k=3, data_dir="pixel_mat_data",
        overwrite=True)
    assert not temp.exists()
    for fov in FOVS:
        df = feather.read_dataframe(
            pixel_base / "pixel_mat_data" / f"{fov}.feather")
        assert "pixel_meta_cluster" in df.columns


def test_interrupted_assignment_resumes_from_temp_marker(pixel_base):
    """Non-overwrite crash recovery: FOVs already written into the temp dir
    by a dead run are kept; only the remainder is processed, then the swap
    commits the union (find_fovs_missing_col temp-marker semantics)."""
    pysom = _train(pixel_base)
    # dead run processed fov0 only: its labeled feather sits in the temp dir
    pixel_som_clustering.cluster_pixels(["fov0"], str(pixel_base), pysom,
                                        data_dir="pixel_mat_data")
    labeled_fov0 = feather.read_dataframe(
        pixel_base / "pixel_mat_data" / "fov0.feather")
    temp = pixel_base / "pixel_mat_data_temp"
    temp.mkdir()
    feather.write_dataframe(labeled_fov0, temp / "fov0.feather")
    # strip fov0's labels from the live dir to mimic pre-swap state
    feather.write_dataframe(
        labeled_fov0.drop(columns="pixel_som_cluster"),
        pixel_base / "pixel_mat_data" / "fov0.feather")

    pixel_som_clustering.cluster_pixels(FOVS, str(pixel_base), pysom,
                                        data_dir="pixel_mat_data")
    assert not temp.exists()
    for fov in FOVS:
        df = feather.read_dataframe(
            pixel_base / "pixel_mat_data" / f"{fov}.feather")
        assert "pixel_som_cluster" in df.columns


def test_subset_fov_run_no_longer_loses_other_fovs(pixel_base):
    """Running cluster_pixels on a SUBSET of FOVs must keep the others'
    feathers intact (the reference's bare swap deletes them —
    pixel_som_clustering.py:287-289; commit_temp_dir preserves survivors)."""
    pysom = _train(pixel_base)
    pixel_som_clustering.cluster_pixels(["fov0"], str(pixel_base), pysom,
                                        data_dir="pixel_mat_data")
    f0 = feather.read_dataframe(pixel_base / "pixel_mat_data" / "fov0.feather")
    f1 = feather.read_dataframe(pixel_base / "pixel_mat_data" / "fov1.feather")
    assert "pixel_som_cluster" in f0.columns
    assert "pixel_som_cluster" not in f1.columns      # untouched, not deleted
    # the remaining FOV can be labeled afterwards
    pixel_som_clustering.cluster_pixels(FOVS, str(pixel_base), pysom,
                                        data_dir="pixel_mat_data")
    f1 = feather.read_dataframe(pixel_base / "pixel_mat_data" / "fov1.feather")
    assert "pixel_som_cluster" in f1.columns


def test_corrupted_fov_survives_the_swap_for_inspection(pixel_base, capsys):
    """A corrupted feather is skipped AND left on disk after the commit
    (previously the swap silently deleted it)."""
    pysom = _train(pixel_base)
    bad = pixel_base / "pixel_mat_data" / "fov1.feather"
    bad.write_bytes(b"not a feather file")
    pixel_som_clustering.cluster_pixels(FOVS, str(pixel_base), pysom,
                                        data_dir="pixel_mat_data")
    out = capsys.readouterr().out
    assert "corrupted" in out
    assert bad.exists()                                # kept for inspection
    assert bad.read_bytes() == b"not a feather file"
    f0 = feather.read_dataframe(pixel_base / "pixel_mat_data" / "fov0.feather")
    assert "pixel_som_cluster" in f0.columns


def test_find_fovs_missing_col_handles_mixed_states(pixel_base):
    """Per-file schema detection: only genuinely unlabeled FOVs are
    returned (the reference samples one file and assumes uniformity)."""
    from ark_tpu.phenotyping import pixel_cluster_utils as pcu
    pysom = _train(pixel_base)
    pixel_som_clustering.cluster_pixels(["fov0"], str(pixel_base), pysom,
                                        data_dir="pixel_mat_data")
    missing = pcu.find_fovs_missing_col(str(pixel_base), "pixel_mat_data",
                                        "pixel_som_cluster")
    assert missing == ["fov1"]
    # the probe created the in-progress marker; a second call still reports
    # only fov1 (temp-dir branch, schema-checked)
    assert (pixel_base / "pixel_mat_data_temp").exists()
    assert pcu.find_fovs_missing_col(str(pixel_base), "pixel_mat_data",
                                     "pixel_som_cluster") == ["fov1"]


def test_read_column_names_without_data(pixel_base, rng):
    from ark_tpu.io import feather_utils
    path = pixel_base / "pixel_mat_data" / "fov0.feather"
    cols = feather_utils.read_column_names(path)
    assert cols == ["chan0", "chan1", "chan2", "fov", "row_index",
                    "column_index", "label"]
    bad = pixel_base / "bad.feather"
    bad.write_bytes(b"junk")
    with pytest.raises(Exception):
        feather_utils.read_column_names(bad)


def test_re_remap_resume_with_edited_csv(pixel_base):
    """Crash-resume of a SECOND remap: every file already carries the
    rename column from the first mapping, so done-ness must come from the
    temp dir, not a column check (review finding: the column check made
    fov_list empty -> IndexError / silent partial commit)."""
    pysom = _train(pixel_base)
    pixel_som_clustering.cluster_pixels(FOVS, str(pixel_base), pysom,
                                        data_dir="pixel_mat_data")
    pixel_som_clustering.generate_som_avg_files(
        FOVS, CHANNELS, str(pixel_base), pysom, data_dir="pixel_mat_data")
    pixel_meta_clustering.pixel_consensus_cluster(
        FOVS, CHANNELS, str(pixel_base), max_k=3, data_dir="pixel_mat_data")
    som_avg = pd.read_csv(pixel_base / "pixel_channel_avg_som_cluster.csv")

    def write_remap(suffix):
        remap = som_avg[["pixel_som_cluster"]].copy()
        remap["pixel_meta_cluster"] = (som_avg["pixel_som_cluster"] % 2) + 1
        remap["pixel_meta_cluster_rename"] = remap["pixel_meta_cluster"].map(
            lambda m: f"{suffix}_{m}")
        remap.to_csv(pixel_base / "remap.csv", index=False)

    write_remap("first")
    pixel_meta_clustering.apply_pixel_meta_cluster_remapping(
        FOVS, CHANNELS, str(pixel_base), "pixel_mat_data", "remap.csv")

    # second remap with an edited CSV dies after fov0: temp holds fov0 only
    write_remap("second")
    temp = pixel_base / "pixel_mat_data_temp"
    pixel_cluster_utils.claim_temp_dir(
        str(pixel_base / "pixel_mat_data"), "remap")
    remap2 = pd.read_csv(pixel_base / "remap.csv")
    rd = dict(remap2[["pixel_som_cluster", "pixel_meta_cluster"]].values)
    nd = dict(remap2[["pixel_meta_cluster",
                      "pixel_meta_cluster_rename"]].drop_duplicates().values)
    pixel_meta_clustering.update_pixel_meta_labels(
        str(pixel_base / "pixel_mat_data"), rd, nd, "fov0")
    assert (temp / "fov0.feather").exists()

    # resume must process exactly fov1 and commit BOTH with the new names
    pixel_meta_clustering.apply_pixel_meta_cluster_remapping(
        FOVS, CHANNELS, str(pixel_base), "pixel_mat_data", "remap.csv")
    assert not temp.exists()
    for fov in FOVS:
        df = feather.read_dataframe(
            pixel_base / "pixel_mat_data" / f"{fov}.feather")
        assert df["pixel_meta_cluster_rename"].str.startswith("second").all()


def test_truncated_temp_file_is_redone_not_committed(pixel_base):
    """A temp feather truncated by a killed run must be re-processed, and
    must never shadow the good original at commit time."""
    from ark_tpu.phenotyping import pixel_cluster_utils as pcu
    pysom = _train(pixel_base)
    temp = pixel_base / "pixel_mat_data_temp"
    pcu.claim_temp_dir(str(pixel_base / "pixel_mat_data"),
                       "pixel_som_cluster")
    (temp / "fov1.feather").write_bytes(b"trunc")   # killed mid-write
    missing = pcu.find_fovs_missing_col(str(pixel_base), "pixel_mat_data",
                                        "pixel_som_cluster")
    assert sorted(missing) == ["fov0", "fov1"]      # fov1 NOT counted done
    pixel_som_clustering.cluster_pixels(FOVS, str(pixel_base), pysom,
                                        data_dir="pixel_mat_data")
    for fov in FOVS:
        df = feather.read_dataframe(
            pixel_base / "pixel_mat_data" / f"{fov}.feather")
        assert "pixel_som_cluster" in df.columns    # real data, not b"trunc"


def test_stranded_complete_temp_dir_gets_committed(pixel_base, capsys):
    """Run killed between the last FOV write and the swap: the next call
    sees nothing left to assign but must commit the stranded temp."""
    pysom = _train(pixel_base)
    # simulate: a full run's output sits in temp; data files unlabeled.
    # claim_temp_dir stage-tags it exactly as the killed run would have —
    # an untagged temp dir reads as another stage's strand and is redone
    temp = pixel_base / "pixel_mat_data_temp"
    pixel_cluster_utils.claim_temp_dir(
        str(pixel_base / "pixel_mat_data"), "pixel_som_cluster")
    for fov in FOVS:
        df = feather.read_dataframe(
            pixel_base / "pixel_mat_data" / f"{fov}.feather")
        labeled = pysom.assign_som_clusters(df)
        feather.write_dataframe(labeled, temp / f"{fov}.feather")

    pixel_som_clustering.cluster_pixels(FOVS, str(pixel_base), pysom,
                                        data_dir="pixel_mat_data")
    assert "no more FOVs" in capsys.readouterr().out
    assert not temp.exists()
    for fov in FOVS:
        df = feather.read_dataframe(
            pixel_base / "pixel_mat_data" / f"{fov}.feather")
        assert "pixel_som_cluster" in df.columns


def test_cross_stage_stranded_temp_not_counted_as_remap_progress(pixel_base):
    """ADVICE r2: a temp dir stranded by a crashed SOM/consensus stage must
    not be mistaken for remap progress — without the stage tag, its files
    (which lack the new remap CSV's names) would be committed as 'done'."""
    pysom = _train(pixel_base)
    pixel_som_clustering.cluster_pixels(FOVS, str(pixel_base), pysom,
                                        data_dir="pixel_mat_data")
    pixel_som_clustering.generate_som_avg_files(
        FOVS, CHANNELS, str(pixel_base), pysom, data_dir="pixel_mat_data")
    pixel_meta_clustering.pixel_consensus_cluster(
        FOVS, CHANNELS, str(pixel_base), max_k=3, data_dir="pixel_mat_data")
    som_avg = pd.read_csv(pixel_base / "pixel_channel_avg_som_cluster.csv")

    # simulate a consensus-stage re-run killed after writing every FOV to
    # temp (tagged for the consensus stage, missing any rename column)
    data_path = str(pixel_base / "pixel_mat_data")
    temp = pixel_base / "pixel_mat_data_temp"
    pixel_cluster_utils.claim_temp_dir(data_path, "pixel_meta_cluster")
    for fov in FOVS:
        df = feather.read_dataframe(
            pixel_base / "pixel_mat_data" / f"{fov}.feather")
        feather.write_dataframe(df, temp / f"{fov}.feather")

    remap = som_avg[["pixel_som_cluster"]].copy()
    remap["pixel_meta_cluster"] = (som_avg["pixel_som_cluster"] % 2) + 1
    remap["pixel_meta_cluster_rename"] = remap["pixel_meta_cluster"].map(
        lambda m: f"renamed_{m}")
    remap.to_csv(pixel_base / "remap.csv", index=False)

    pixel_meta_clustering.apply_pixel_meta_cluster_remapping(
        FOVS, CHANNELS, str(pixel_base), "pixel_mat_data", "remap.csv")
    assert not temp.exists()
    for fov in FOVS:  # every FOV actually remapped, none skipped as 'done'
        df = feather.read_dataframe(
            pixel_base / "pixel_mat_data" / f"{fov}.feather")
        assert df["pixel_meta_cluster_rename"].str.startswith(
            "renamed_").all()


def test_consensus_cluster_returns_cc_on_skip_path(pixel_base):
    """pixel_consensus_cluster must hand back the PixieConsensusCluster
    even when every FOV already has meta labels (the reference returns
    None there and the notebook's avg-file step crashes)."""
    pysom = _train(pixel_base)
    pixel_som_clustering.cluster_pixels(FOVS, str(pixel_base), pysom,
                                        data_dir="pixel_mat_data")
    pixel_som_clustering.generate_som_avg_files(
        FOVS, CHANNELS, str(pixel_base), pysom, data_dir="pixel_mat_data")
    cc1 = pixel_meta_clustering.pixel_consensus_cluster(
        FOVS, CHANNELS, str(pixel_base), max_k=3, data_dir="pixel_mat_data")
    cc2 = pixel_meta_clustering.pixel_consensus_cluster(
        FOVS, CHANNELS, str(pixel_base), max_k=3, data_dir="pixel_mat_data")
    assert cc2 is not None
    pd.testing.assert_frame_equal(cc1.mapping, cc2.mapping)  # deterministic
