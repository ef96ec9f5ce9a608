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
