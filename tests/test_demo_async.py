"""AsyncPredictor ordering/pipelining semantics (reference predictor.py:137-206)."""

import sys
import time
import os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from demo.demo import AsyncPredictor


def test_async_predictor_ordered_results():
    def slow_square(x):
        time.sleep(0.01 * (5 - x))   # later items finish first if unordered
        return x * x

    ap = AsyncPredictor(slow_square, buffer_size=8)
    for i in range(5):
        ap.put(i)
    got = [ap.get() for _ in range(5)]
    ap.shutdown()
    assert got == [0, 1, 4, 9, 16]


def test_async_predictor_call_and_len():
    ap = AsyncPredictor(lambda x: x + 1)
    assert ap(41) == 42
    assert len(ap) == 0
    ap.shutdown()


def test_async_predictor_propagates_errors():
    def boom(x):
        raise ValueError("boom")

    ap = AsyncPredictor(boom)
    ap.put(1)
    try:
        ap.get()
        raised = False
    except ValueError:
        raised = True
    ap.shutdown()
    assert raised
