"""The schema-constant contract: ark_tpu.settings must be value-identical
to the reference's settings.py (`src/ark/settings.py:5-63`) — these names
delimit the cell-table channel block, name every regionprops feature, and
carry the MIBI stage-calibration constants downstream tooling relies on.
Values are hard-coded here (not read from the reference) so the contract
travels with the test suite."""

import numpy as np
import pytest

from ark_tpu import settings


def test_cell_table_schema_names():
    assert settings.CELL_SIZE == "cell_size"
    assert settings.CELL_LABEL == "label"
    assert settings.FOV_ID == "fov"
    assert settings.CELL_TYPE == "cell_meta_cluster"
    assert settings.PATIENT_ID == "PatientID"
    assert settings.KMEANS_CLUSTER == "kmeans_neighborhood"
    assert settings.CENTROID_0 == "centroid-0"
    assert settings.CENTROID_1 == "centroid-1"
    # the channel block is delimited [PRE+1, POST)
    assert settings.PRE_CHANNEL_COL == settings.CELL_SIZE
    assert settings.POST_CHANNEL_COL == settings.CELL_LABEL
    assert settings.BASE_COLS == [
        "fov", "label", "cell_size", "centroid-0", "centroid-1",
        "cell_meta_cluster"]


def test_regionprops_feature_lists():
    # reference settings.py:26-44
    for name in ("label", "area", "eccentricity", "major_axis_length",
                 "minor_axis_length", "perimeter", "centroid",
                 "convex_area", "equivalent_diameter"):
        assert name in settings.REGIONPROPS_BASE
    assert settings.REGIONPROPS_SINGLE_COMP == [
        "major_minor_axis_ratio", "perim_square_over_area",
        "major_axis_equiv_diam_ratio", "convex_hull_resid",
        "centroid_dif", "num_concavities"]
    assert settings.REGIONPROPS_MULTI_COMP == ["nc_ratio"]
    # every named feature resolves in the extraction registry
    from ark_tpu.segmentation.regionprops_extraction import \
        REGIONPROPS_FUNCTION
    for name in (settings.REGIONPROPS_SINGLE_COMP
                 + settings.REGIONPROPS_MULTI_COMP):
        assert name in REGIONPROPS_FUNCTION


def test_fiber_and_lda_constants():
    for prop in ("label", "centroid", "major_axis_length",
                 "minor_axis_length", "orientation", "area",
                 "eccentricity", "euler_number"):
        assert prop in settings.FIBER_OBJECT_PROPS
    assert settings.LDA_PLOT_TYPES == ["adjacency", "topic_assignment"]
    for key in ("inertia", "silhouette", "gap_stat", "gap_sds",
                "cell_counts"):
        assert key in settings.EDA_KEYS


def test_mibi_stage_calibration_values():
    # reference settings.py:20-29 — instrument calibration, bit-exact
    assert settings.MICRON_TO_STAGE_X_MULTIPLIER == 0.001001
    assert settings.MICRON_TO_STAGE_X_OFFSET == 0.3116
    assert settings.MICRON_TO_STAGE_Y_MULTIPLIER == 0.001018
    assert settings.MICRON_TO_STAGE_Y_OFFSET == 0.6294
    assert settings.STAGE_TO_PIXEL_X_MULTIPLIER == pytest.approx(1 / 0.06887)
    assert settings.STAGE_TO_PIXEL_Y_MULTIPLIER == pytest.approx(
        1 / -0.06926)
    assert settings.STAGE_TO_PIXEL_X_OFFSET == 27.79
    assert settings.STAGE_TO_PIXEL_Y_OFFSET == -77.40


def test_example_dataset_revision_pinned():
    assert isinstance(settings.EXAMPLE_DATASET_REVISION, str)
    assert settings.EXAMPLE_DATASET_REVISION  # non-empty pin


def test_settings_drive_the_cell_table_schema(rng):
    """The channel-block delimiters actually slice the marker columns in a
    generated cell table (ConvertToAnnData relies on this)."""
    from tests import test_utils
    ct = test_utils.make_cell_table(n_cells=10)
    cols = (["cell_size"] + [c for c in ct.columns if c.startswith("marker")]
            + ["label", "fov"])
    ct = ct[cols]
    start = list(ct.columns).index(settings.PRE_CHANNEL_COL) + 1
    stop = list(ct.columns).index(settings.POST_CHANNEL_COL)
    markers = list(ct.columns[start:stop])
    assert markers and all(m.startswith("marker") for m in markers)
