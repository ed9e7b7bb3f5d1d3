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


def test_run_on_video_ordering(tmp_path):
    """run_on_video drains a VideoCapture-like source in order via the async
    pipeline (reference predictor.py:75-135)."""
    import numpy as np
    from demo.demo import VisualizationDemo

    class FakeCap:
        def __init__(self, n):
            self.i = 0
            self.n = n

        def read(self):
            if self.i >= self.n:
                return False, None
            self.i += 1
            # encode the frame index in the pixel value
            return True, np.full((8, 8, 3), self.i, np.uint8)

    demo = VisualizationDemo.__new__(VisualizationDemo)
    demo.nc = 4
    demo.colors = np.zeros((4, 3), np.uint8)
    demo.run_on_image = lambda img: np.full(img.shape[:2], int(img[0, 0, 0]) % 4)

    frames = list(VisualizationDemo.run_on_video(demo, FakeCap(7)))
    assert len(frames) == 7
    # visualize: 0.5*img + 0.5*colors[pred]; with black colors -> 0.5*img
    for i, f in enumerate(frames):
        assert f.dtype == np.uint8 and f.shape == (8, 8, 3)
        assert int(f[0, 0, 0]) == (i + 1) // 2


def test_metric_logger_tensorboard(tmp_path):
    from autofocusformermod_tpu.engine.hooks import MetricLogger

    lg = MetricLogger(str(tmp_path), period=1)
    lg.log(1, {"total_loss": 1.5, "lr": 0.1})
    lg.log(2, {"total_loss": 1.2, "lr": 0.1})
    assert (tmp_path / "metrics.jsonl").exists()
    import os
    tb_files = os.listdir(tmp_path / "tb") if (tmp_path / "tb").exists() else []
    assert tb_files, "tensorboard event file not written"
