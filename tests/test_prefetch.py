"""Prefetcher guards (data/prefetch.py): ordering, exceptions, early stop."""
import threading
import time

import pytest

from achelous_tpu.data.prefetch import Prefetcher, prefetch


def test_preserves_order_and_count():
    assert list(prefetch(range(100), depth=3)) == list(range(100))


def test_empty_iterable():
    assert list(prefetch([], depth=2)) == []


def test_overlaps_producer_and_consumer():
    """With prefetch, total wall time is ~max(produce, consume), not the sum."""
    def slow_gen(n, dt):
        for i in range(n):
            time.sleep(dt)
            yield i

    n, dt = 10, 0.02
    t0 = time.time()
    for _ in prefetch(slow_gen(n, dt), depth=2):
        time.sleep(dt)           # consumer work of the same size
    overlapped = time.time() - t0
    assert overlapped < 2 * n * dt * 0.85   # clearly better than serial


def test_propagates_producer_exception():
    def boom():
        yield 1
        raise RuntimeError("producer failed")

    it = prefetch(boom(), depth=2)
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="producer failed"):
        next(it)


def test_close_stops_thread_early():
    produced = []

    def gen():
        for i in range(10_000):
            produced.append(i)
            yield i

    with prefetch(gen(), depth=2) as it:
        for i, _ in zip(range(3), it):
            pass
    # the producer must stop quickly after close, not run to exhaustion
    time.sleep(0.1)
    assert len(produced) < 100
    assert threading.active_count() < 20


def test_is_reentrant_safe_as_iterator():
    it = Prefetcher(iter([1, 2]), depth=1)
    assert next(it) == 1
    assert next(it) == 2
    with pytest.raises(StopIteration):
        next(it)
    with pytest.raises(StopIteration):   # stays stopped
        next(it)
