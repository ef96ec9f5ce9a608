"""Contract tests for bench.py — the driver-captured artifact. A broken
bench loses the round's BENCH_r{N}.json, so the newest sections get CPU
smoke coverage: the segmentation-e2e helper must return its fields on a
tiny cohort, and the attach-outage watchdog must degrade to an error
string instead of hanging (the observed r3 outage mode)."""

import sys

import pytest


@pytest.fixture(scope="module")
def bench():
    sys.path.insert(0, __file__.rsplit("/tests/", 1)[0])
    import bench as bench_mod
    return bench_mod


def test_probe_attach_healthy(bench):
    """A healthy backend (the CPU suite's) probes clean."""
    assert bench._probe_attach(timeout_s=120) == ""


def test_probe_attach_hang_degrades_to_error(bench):
    """An unresponsive attach must yield an explicit error string, not a
    hang (jax import cannot complete in 10 ms)."""
    err = bench._probe_attach(timeout_s=0.01)
    assert "hung" in err


def test_segmentation_e2e_fields(bench):
    """The e2e helper returns its metric fields with a positive rate on a
    tiny CPU cohort (guards the bench against drift in the Mesmer/
    watershed surfaces it drives)."""
    out = bench._bench_segmentation_e2e(n_fovs=2, size=64)
    assert out["segmentation_e2e_fov_size"] == 64
    assert out["segmentation_e2e_fovs_per_s"] > 0
