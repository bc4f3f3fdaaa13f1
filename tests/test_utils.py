"""Utility coverage: prefetch thread semantics, step timer, seeding."""

import time

import numpy as np
import pytest

from ctr_recommendation_tpu.data.prefetch import prefetch
from ctr_recommendation_tpu.utils import StepTimer, set_seed


def test_prefetch_preserves_order_and_transform():
    items = list(range(20))
    got = list(prefetch(iter(items), transform=lambda x: x * 2, depth=3))
    assert got == [x * 2 for x in items]


def test_prefetch_propagates_errors():
    def gen():
        yield 1
        raise RuntimeError("boom")

    it = prefetch(gen(), depth=2)
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="boom"):
        list(it)


def test_prefetch_overlaps_producer_with_consumer():
    def slow_gen():
        for i in range(5):
            time.sleep(0.02)
            yield i

    t0 = time.perf_counter()
    for _ in prefetch(slow_gen(), depth=4):
        time.sleep(0.02)  # consumer work overlaps producer work
    elapsed = time.perf_counter() - t0
    assert elapsed < 0.18  # serial would be ~0.2s


def test_step_timer():
    t = StepTimer(alpha=1.0)
    assert t.tick() is None
    time.sleep(0.01)
    ema = t.tick()
    assert ema is not None and ema > 0
    assert t.examples_per_sec(100) == pytest.approx(100 / ema)


def test_set_seed_deterministic():
    set_seed(7)
    a = np.random.rand(3)
    set_seed(7)
    b = np.random.rand(3)
    np.testing.assert_array_equal(a, b)
