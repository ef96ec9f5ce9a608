"""PrefetchLoader behavior: ordering, overlap, error propagation, device
placement (SURVEY.md §2.5(d) host↔device pipelining)."""

import threading
import time

import jax
import numpy as np
import pytest

from ark_tpu.parallel.prefetch import PrefetchLoader


def test_yields_all_items_in_order():
    items = [f"fov{i}" for i in range(7)]
    loader = PrefetchLoader(items, lambda it: it.upper(), buffer_size=3)
    assert len(loader) == 7
    got = list(loader)
    assert [k for k, _ in got] == items
    assert [v for _, v in got] == [it.upper() for it in items]


def test_loading_overlaps_consumption():
    """While the consumer holds batch i, the producer must already be
    loading ahead (that is the entire point of the buffer)."""
    started = []
    gate = threading.Event()

    def load(item):
        started.append(item)
        if item >= 2:
            gate.wait(timeout=5)
        return item

    loader = PrefetchLoader(range(4), load, buffer_size=2)
    it = iter(loader)
    next(it)                       # consume item 0
    deadline = time.monotonic() + 5
    while len(started) < 3 and time.monotonic() < deadline:
        time.sleep(0.01)
    # with item 0 consumed and 2 buffered slots, item 2 must have STARTED
    # loading before the consumer asked for it
    assert len(started) >= 3
    gate.set()
    assert [v for _, v in it] == [1, 2, 3]


def test_producer_exception_propagates_to_consumer():
    def load(item):
        if item == 2:
            raise RuntimeError("corrupt feather")
        return item

    loader = PrefetchLoader(range(5), load, buffer_size=2)
    got = []
    with pytest.raises(RuntimeError, match="corrupt feather"):
        for _, v in loader:
            got.append(v)
    assert got == [0, 1]           # everything before the failure delivered


def test_device_put_places_batches_on_device(rng):
    data = {f"f{i}": rng.random((8, 4)).astype(np.float32)
            for i in range(3)}
    dev = jax.devices("cpu")[0]
    loader = PrefetchLoader(list(data), lambda k: data[k], buffer_size=2,
                            device_put=dev)
    for key, batch in loader:
        assert isinstance(batch, jax.Array)
        assert batch.devices() == {dev}
        np.testing.assert_array_equal(np.asarray(batch), data[key])


def test_empty_and_single_item_lists():
    assert list(PrefetchLoader([], lambda x: x)) == []
    assert list(PrefetchLoader(["only"], lambda x: x + "!")) == \
        [("only", "only!")]


def test_buffer_size_floor_is_one():
    loader = PrefetchLoader(range(3), lambda x: x, buffer_size=0)
    assert [v for _, v in loader] == [0, 1, 2]


def test_abandoned_iteration_releases_producer():
    """A consumer that breaks early must not leave the producer thread
    blocked on a full queue (pinning loaded batches forever)."""
    before = set(threading.enumerate())
    loader = PrefetchLoader(range(100), lambda x: x, buffer_size=2)
    for _, v in loader:
        if v == 1:
            break
    # the producer spawned by THIS iteration must wind down once the
    # generator is closed (compare against the pre-existing thread set —
    # other machinery may keep its own daemons alive)
    deadline = time.monotonic() + 5
    while time.monotonic() < deadline:
        new = [t for t in threading.enumerate()
               if t not in before and t.is_alive()]
        if not new:
            break
        time.sleep(0.05)
    assert not [t for t in threading.enumerate()
                if t not in before and t.is_alive()]
