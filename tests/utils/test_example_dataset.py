import os

import pytest

from ark_tpu.utils import example_dataset


@pytest.fixture
def offline_mirror(tmp_path, monkeypatch):
    """Local mirror layout: $ARK_EXAMPLE_DATASET_DIR/<dataset>/<partition>/."""
    mirror = tmp_path / "mirror"
    base = mirror / "segment_image_data"
    for partition, files in [("image_data", ["fov0/chan0.tiff"]),
                             ("cell_table", ["cell_table.csv"])]:
        for f in files:
            p = base / partition / f
            p.parent.mkdir(parents=True, exist_ok=True)
            p.write_text("x")
    monkeypatch.setenv("ARK_EXAMPLE_DATASET_DIR", str(mirror))
    return mirror


def test_get_example_dataset_offline(offline_mirror, tmp_path):
    save_dir = tmp_path / "out"
    example_dataset.get_example_dataset("segment_image_data", str(save_dir))
    # partitions land at their canonical path suffixes
    assert (save_dir / "image_data" / "fov0" / "chan0.tiff").exists()
    assert (save_dir / "segmentation" / "cell_table"
            / "cell_table.csv").exists()


def test_get_example_dataset_no_overwrite(offline_mirror, tmp_path):
    save_dir = tmp_path / "out"
    dst = save_dir / "image_data"
    dst.mkdir(parents=True)
    (dst / "existing.txt").write_text("keep me")
    with pytest.warns(UserWarning):
        example_dataset.get_example_dataset(
            "segment_image_data", str(save_dir), overwrite_existing=False)
    assert (dst / "existing.txt").read_text() == "keep me"
    # the populated partition was NOT overwritten
    assert not (dst / "fov0").exists()


def test_get_example_dataset_invalid_name(tmp_path):
    with pytest.raises(ValueError, match="not one of the valid datasets"):
        example_dataset.get_example_dataset("not_a_dataset", str(tmp_path))


# ---------------------------------------------------------------------------
# Round-2: move/overwrite semantics (reference example_dataset_test.py
# exercises these against the real HF download; here against the offline
# mirror layout — this environment has no egress).
# ---------------------------------------------------------------------------

def _mirror(tmp_path, dataset="cluster_pixels",
            parts=("image_data", "deepcell_output")):
    base = tmp_path / "mirror" / dataset
    for part in parts:
        d = base / part
        d.mkdir(parents=True)
        (d / f"{part}_file.txt").write_text("payload")
    return tmp_path / "mirror"


def test_move_example_dataset_canonical_layout(tmp_path, monkeypatch):
    from ark_tpu.utils import example_dataset as ed
    mirror = _mirror(tmp_path)
    monkeypatch.setenv("ARK_EXAMPLE_DATASET_DIR", str(mirror))
    save = tmp_path / "out"
    ed.get_example_dataset("cluster_pixels", save)
    # path suffixes place each partition at its canonical location
    assert (save / "image_data" / "image_data_file.txt").exists()
    assert (save / "segmentation" / "deepcell_output"
            / "deepcell_output_file.txt").exists()


def test_move_overwrite_and_keep_semantics(tmp_path, monkeypatch):
    import pytest as _pytest

    from ark_tpu.utils import example_dataset as ed
    mirror = _mirror(tmp_path, parts=("image_data",))
    monkeypatch.setenv("ARK_EXAMPLE_DATASET_DIR", str(mirror))
    save = tmp_path / "out"
    target = save / "image_data"
    target.mkdir(parents=True)
    (target / "precious.txt").write_text("mine")

    # overwrite_existing=False: existing files preserved, warning raised
    with _pytest.warns(UserWarning, match="will not be overwritten"):
        ed.get_example_dataset("cluster_pixels", save,
                               overwrite_existing=False)
    assert (target / "precious.txt").exists()
    assert not (target / "image_data_file.txt").exists()

    # overwrite_existing=True: dataset lands, warning about existing files
    with _pytest.warns(UserWarning, match="will be overwritten"):
        ed.get_example_dataset("cluster_pixels", save,
                               overwrite_existing=True)
    assert (target / "image_data_file.txt").exists()

    # keep=False into an EMPTY dir: adds the dataset with an 'added in' note
    save2 = tmp_path / "out2"
    (save2 / "image_data").mkdir(parents=True)
    with _pytest.warns(UserWarning, match="added in"):
        ed.get_example_dataset("cluster_pixels", save2,
                               overwrite_existing=False)
    assert (save2 / "image_data" / "image_data_file.txt").exists()


def test_invalid_dataset_name_lists_options(tmp_path):
    import pytest as _pytest

    from ark_tpu.utils import example_dataset as ed
    with _pytest.raises(ValueError, match="not one of the valid datasets"):
        ed.get_example_dataset("nope", tmp_path)


def test_valid_dataset_names_cover_reference_configs():
    """The 11 named configs of the HF dataset (reference
    example_dataset.py:22-32)."""
    from ark_tpu.utils import example_dataset as ed
    assert len(ed.VALID_DATASETS) == 11
    for name in ("segment_image_data", "cluster_pixels", "cluster_cells",
                 "post_clustering", "fiber_segmentation",
                 "LDA_preprocessing", "LDA_training_inference",
                 "neighborhood_analysis", "pairwise_spatial_enrichment",
                 "ome_tiff", "ez_seg_data"):
        assert name in ed.VALID_DATASETS
