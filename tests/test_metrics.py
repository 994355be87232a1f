"""Metrics/logging observability module."""

import json
import threading

import numpy as np

from calipsync_tpu.metrics import Metrics, get_logger, global_metrics


def test_counters_gauges_timings(tmp_path):
    m = Metrics()
    m.count("frames")
    m.count("frames", 4)
    m.gauge("buffer", 7)
    with m.time("step"):
        pass
    m.observe("step", 0.01)
    snap = m.snapshot()
    assert snap["counters"]["frames"] == 5
    assert snap["gauges"]["buffer"] == 7
    assert snap["timings"]["step"]["count"] == 2
    assert snap["timings"]["step"]["max_ms"] >= snap["timings"]["step"][
        "min_ms"]

    path = tmp_path / "m.jsonl"
    m.dump_jsonl(str(path))
    m.dump_jsonl(str(path))
    lines = path.read_text().strip().splitlines()
    assert len(lines) == 2
    assert json.loads(lines[0])["counters"]["frames"] == 5

    m.reset()
    assert m.snapshot()["counters"] == {}


def test_thread_safety():
    m = Metrics()

    def work():
        for _ in range(1000):
            m.count("x")
            m.observe("t", 0.001)

    threads = [threading.Thread(target=work) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    snap = m.snapshot()
    assert snap["counters"]["x"] == 4000
    assert snap["timings"]["t"]["count"] == 4000


def test_global_singleton_and_logger():
    assert global_metrics() is global_metrics()
    log = get_logger("calipsync.test")
    log.info("hello")  # no crash, handler attached once
    assert get_logger("calipsync.test") is log
