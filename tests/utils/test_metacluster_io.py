"""Contract tests for the remap GUI's CSV reader/validator and the
trailing-edge throttle (reference `metacluster_remap_gui/file_reader.py:8-75`
and `throttle.py`; reference tests `file_reader_test.py`, `throttle_test.py`).
"""

import asyncio
import time

import numpy as np
import pandas as pd
import pytest

from ark_tpu.utils.metacluster_remap_gui import metaclusterdata_from_files
from ark_tpu.utils.metacluster_remap_gui.throttle import throttle


def _write_csv(path, n=6, cluster_type="pixel", **overrides):
    df = pd.DataFrame({
        "m1": np.linspace(0, 1, n), "m2": np.linspace(1, 0, n),
        f"{cluster_type}_som_cluster": np.arange(1, n + 1),
        f"{cluster_type}_meta_cluster": (np.arange(n) % 2) + 1,
        "count": np.arange(10, 10 + n)})
    for col, vals in overrides.items():
        if vals is None:
            df = df.drop(columns=col)
        else:
            df[col] = vals
    df.to_csv(path, index=False)
    return str(path)


def test_reads_pixel_csv_and_renames_columns(tmp_path):
    path = _write_csv(tmp_path / "avg.csv")
    mcd = metaclusterdata_from_files(path)
    assert mcd.cluster_count == 6
    assert mcd.metacluster_count == 2
    assert list(mcd.cluster_pixelcounts["count"]) == [10, 11, 12, 13, 14, 15]
    assert set(mcd.clusters.columns) == {"m1", "m2"}


def test_reads_cell_csv_with_cell_prefixed_columns(tmp_path):
    path = _write_csv(tmp_path / "avg.csv", cluster_type="cell")
    mcd = metaclusterdata_from_files(path, cluster_type="cell")
    assert mcd.cluster_count == 6
    assert mcd.cluster_type == "cell"
    # save path writes cell_-prefixed columns
    mcd.output_mapping_filename = str(tmp_path / "remap.csv")
    mcd.save_output_mapping()
    out = pd.read_csv(tmp_path / "remap.csv")
    assert list(out.columns) == ["cell_som_cluster", "cell_meta_cluster",
                                 "cell_meta_cluster_rename"]


def test_prefix_trim_strips_marker_prefixes(tmp_path):
    n = 4
    df = pd.DataFrame({
        "pixie_m1": np.ones(n), "pixie_m2": np.zeros(n),
        "pixel_som_cluster": np.arange(1, n + 1),
        "pixel_meta_cluster": np.ones(n, int), "count": np.ones(n, int)})
    path = tmp_path / "avg.csv"
    df.to_csv(path, index=False)
    mcd = metaclusterdata_from_files(str(path), prefix_trim="pixie_")
    assert set(mcd.clusters.columns) == {"m1", "m2"}


def test_invalid_cluster_type_rejected(tmp_path):
    path = _write_csv(tmp_path / "avg.csv")
    with pytest.raises(ValueError):
        metaclusterdata_from_files(path, cluster_type="voxel")


def test_missing_required_columns_raise(tmp_path):
    for missing in ("pixel_som_cluster", "pixel_meta_cluster", "count"):
        path = _write_csv(tmp_path / f"no_{missing}.csv", **{missing: None})
        with pytest.raises(ValueError):
            metaclusterdata_from_files(path)


def test_duplicate_and_zero_based_ids_rejected(tmp_path):
    dup = _write_csv(tmp_path / "dup.csv",
                     pixel_som_cluster=[1, 1, 2, 3, 4, 5])
    with pytest.raises(ValueError, match="unique"):
        metaclusterdata_from_files(dup)
    zero = _write_csv(tmp_path / "zero.csv",
                      pixel_som_cluster=[0, 1, 2, 3, 4, 5])
    with pytest.raises(ValueError):
        metaclusterdata_from_files(zero)
    no_one = _write_csv(tmp_path / "no1.csv",
                        pixel_som_cluster=[2, 3, 4, 5, 6, 7])
    with pytest.raises(ValueError, match="starting with 1"):
        metaclusterdata_from_files(no_one)


def test_missing_file_raises(tmp_path):
    with pytest.raises(Exception):
        metaclusterdata_from_files(str(tmp_path / "does_not_exist.csv"))


def test_carries_renames_forward_across_sessions(tmp_path):
    path = _write_csv(tmp_path / "avg.csv",
                      pixel_meta_cluster_rename=["tumor", "stroma"] * 3)
    mcd = metaclusterdata_from_files(path)
    assert mcd.get_metacluster_displayname(1) == "tumor"
    assert mcd.get_metacluster_displayname(2) == "stroma"


# ---------------------------------------------------------------------------
# throttle: first call fires immediately; calls inside the window collapse to
# one trailing call delivering the LAST arguments.
# ---------------------------------------------------------------------------

def test_throttle_first_call_immediate_then_trailing():
    calls = []

    @throttle(0.05)
    def record(x):
        calls.append(x)

    async def drive():
        record(1)             # immediate
        record(2)             # within window: becomes pending
        record(3)             # replaces pending
        assert calls == [1]
        await asyncio.sleep(0.15)

    asyncio.run(drive())
    assert calls == [1, 3]


def test_throttle_quiet_period_resets():
    calls = []

    @throttle(0.03)
    def record(x):
        calls.append(x)

    async def drive():
        record("a")
        await asyncio.sleep(0.08)      # longer than the window
        record("b")                    # quiet period over: immediate again
        assert calls == ["a", "b"]

    asyncio.run(drive())


def test_throttle_preserves_function_metadata():
    @throttle(0.01)
    def my_handler(change=None):
        """docs"""

    assert my_handler.__name__ == "my_handler"
    assert my_handler.__doc__ == "docs"


def test_throttle_without_event_loop_degrades_gracefully():
    calls = []

    @throttle(10.0)
    def record(x):
        calls.append(x)

    record(1)       # immediate
    record(2)       # inside window, no loop running: fires anyway
    assert calls == [1, 2]
