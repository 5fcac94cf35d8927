"""StopWatch/TimerSet (the reference's profiling contract, StopWatch.h)."""

import time

import pytest

from qcnn_tpu.utils.timing import StopWatch, TimerSet


def test_stopwatch_accumulates():
    w = StopWatch()
    w.resume(); time.sleep(0.01); w.pause()
    w.resume(); time.sleep(0.01); w.pause()
    assert w.count == 2
    assert w.total >= 0.02


def test_stopwatch_double_pause_raises():
    w = StopWatch()
    with pytest.raises(RuntimeError):
        w.pause()


def test_timerset_context():
    ts = TimerSet()
    with ts.time("phase_a"):
        time.sleep(0.005)
    with ts.time("phase_a"):
        pass
    rep = ts.report()
    assert rep["phase_a"]["count"] == 2
    assert rep["phase_a"]["total_s"] >= 0.005
