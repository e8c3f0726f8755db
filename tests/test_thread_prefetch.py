"""ThreadPrefetchIterable: ordering, overlap, error propagation,
early-stop shutdown (data/thread_prefetch.py)."""

import time

import numpy as np
import pytest

from sdfa_tpu.data.thread_prefetch import ThreadPrefetchIterable


class _Gen:
    def __init__(self, n, delay=0.0, fail_at=None):
        self.n, self.delay, self.fail_at = n, delay, fail_at

    def __iter__(self):
        for i in range(self.n):
            if self.fail_at is not None and i == self.fail_at:
                raise ValueError(f"worker boom at {i}")
            if self.delay:
                time.sleep(self.delay)
            yield {"i": i, "x": np.full((4,), i)}


def test_order_and_completeness():
    out = list(ThreadPrefetchIterable(_Gen(20)))
    assert [b["i"] for b in out] == list(range(20))
    assert np.array_equal(out[7]["x"], np.full((4,), 7))


def test_reiteration_fresh_epochs():
    it = ThreadPrefetchIterable(_Gen(5))
    assert [b["i"] for b in it] == [0, 1, 2, 3, 4]
    assert [b["i"] for b in it] == [0, 1, 2, 3, 4]


def test_overlaps_producer_with_consumer():
    n, d = 12, 0.03
    t0 = time.perf_counter()
    for _ in ThreadPrefetchIterable(_Gen(n, delay=d)):
        time.sleep(d)  # consumer work (the "device step")
    overlapped = time.perf_counter() - t0
    # serial would be ~2·n·d; overlap should stay well under 1.6×n·d
    assert overlapped < 1.6 * n * d, overlapped


def test_worker_exception_propagates_with_message():
    with pytest.raises(ValueError, match="worker boom at 3"):
        list(ThreadPrefetchIterable(_Gen(10, fail_at=3)))


def test_early_stop_does_not_hang():
    import threading

    def alive():
        return [t for t in threading.enumerate()
                if t.name == "sdfa-thread-prefetch" and t.is_alive()]

    # long producer: worker parked in the item-put retry loop
    for k, _ in enumerate(ThreadPrefetchIterable(_Gen(1000))):
        if k == 2:
            break
    # short producer, queue full at exhaustion: the worker is at the
    # TERMINAL put (_DONE) when the consumer leaves — the historical
    # leak path (an unbounded q.put there blocks forever)
    for _ in ThreadPrefetchIterable(_Gen(3)):
        break
    deadline = time.time() + 3.0
    while alive() and time.time() < deadline:
        time.sleep(0.05)
    assert not alive(), alive()
