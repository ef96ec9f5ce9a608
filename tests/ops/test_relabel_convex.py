import numpy as np

from ark_tpu.ops import convex as convex_ops
from ark_tpu.ops import relabel
from ark_tpu.utils import profiling


def test_relabel_segmentation():
    labels = np.array([[0, 1, 1], [2, 2, 3], [0, 3, 3]], np.int32)
    # reference semantics: every label missing from the mapping (including
    # background 0 — callers add an explicit 0 -> 0 row) gets unassigned_id
    out = relabel.relabel_segmentation(
        mapping={0: 0, 1: 10, 2: 20}, unassigned_id=99, labeled_image=labels,
        _dtype=np.int32)
    expected = np.array([[0, 10, 10], [20, 20, 99], [0, 99, 99]])
    np.testing.assert_array_equal(out, expected)
    # device path gives the same answer
    dev = relabel.relabel_segmentation(
        mapping={0: 0, 1: 10, 2: 20}, unassigned_id=99, labeled_image=labels,
        _dtype=np.int32, use_device=True)
    np.testing.assert_array_equal(dev, expected)


def test_group_coords_by_label():
    labels = np.zeros((8, 8), np.int32)
    labels[1:3, 1:3] = 5
    labels[5, 5] = 2
    groups = convex_ops.group_coords_by_label(labels)
    assert set(groups) == {5, 2}
    assert groups[5].shape == (4, 2)
    np.testing.assert_array_equal(groups[2], [[5, 5]])
    assert convex_ops.group_coords_by_label(np.zeros((4, 4), np.int32)) == {}


def test_convex_image_halfplane_raster():
    # L-shaped coords: the convex image fills the missing corner
    coords = np.array([[0, 0], [0, 3], [3, 0], [3, 3], [0, 1], [1, 0]])
    mask, hull, origin = convex_ops.convex_image(coords)
    assert origin == (0, 0)
    assert hull.shape == (4, 4)
    assert hull.all()                     # square hull of the 4 corners
    assert mask.sum() == len(coords)


def test_stage_timer_and_trace(tmp_path):
    timer = profiling.StageTimer()
    with timer.stage("load", items=100, unit="files"):
        pass
    with timer.stage("compute"):
        pass
    report = timer.report()
    assert [r["stage"] for r in report] == ["load", "compute"]
    assert report[0]["items"] == 100
    assert timer.total_seconds >= 0
    with profiling.trace(str(tmp_path)):
        np.zeros(4).sum()
