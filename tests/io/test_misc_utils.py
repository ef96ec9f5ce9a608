import matplotlib
matplotlib.use("Agg")

import numpy as np
import pytest

from ark_tpu.io import misc_utils


def test_make_iterable():
    assert misc_utils.make_iterable("abc") == ["abc"]
    assert misc_utils.make_iterable(5) == [5]
    assert list(misc_utils.make_iterable([1, 2])) == [1, 2]


def test_verify_in_list():
    misc_utils.verify_in_list(subset=[1, 2], superset=[1, 2, 3])
    with pytest.raises(ValueError):
        misc_utils.verify_in_list(subset=[1, 4], superset=[1, 2, 3])
    with pytest.warns(UserWarning):
        misc_utils.verify_in_list(warn=True, subset=[4], superset=[1, 2, 3])
    # scalar and string arguments are wrapped
    misc_utils.verify_in_list(one="a", valid=["a", "b"])


def test_verify_same_elements():
    misc_utils.verify_same_elements(a=[1, 2, 3], b=[3, 2, 1])
    with pytest.raises(ValueError):
        misc_utils.verify_same_elements(a=[1, 2], b=[1, 2, 3])
    with pytest.raises(ValueError):
        misc_utils.verify_same_elements(enforce_order=True,
                                        a=[1, 2, 3], b=[3, 2, 1])
    with pytest.warns(UserWarning):
        misc_utils.verify_same_elements(warn=True, a=[1], b=[2])


def test_create_invalid_data_str():
    s = misc_utils.create_invalid_data_str(list(range(30)))
    assert "0" in s
    # long lists are truncated
    assert "29" not in s


def test_save_figure(tmp_path):
    import matplotlib.pyplot as plt
    plt.figure()
    plt.plot([0, 1], [0, 1])
    misc_utils.save_figure(str(tmp_path), "fig.png")
    assert (tmp_path / "fig.png").exists()
    plt.close("all")
    with pytest.raises(FileNotFoundError):
        misc_utils.save_figure(str(tmp_path / "missing"), "fig.png")
