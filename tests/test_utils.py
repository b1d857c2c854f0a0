"""Utility coverage: metrics writers, decode stats, logging meters."""

import json
import time


def test_jsonl_metrics_writer(tmp_path):
    from omchat_tpu.utils.metrics_writer import JsonlMetricsWriter

    p = tmp_path / "m" / "metrics.jsonl"
    w = JsonlMetricsWriter(str(p))
    w.update(1, loss=2.5, lr=1e-4)
    w.update(2, loss=2.25)
    w.close()
    lines = [json.loads(l) for l in open(p)]
    assert lines[0]["step"] == 1 and lines[0]["loss"] == 2.5
    assert lines[1]["loss"] == 2.25


def test_decode_stats():
    from omchat_tpu.utils.profiling import DecodeStats

    s = DecodeStats()
    time.sleep(0.01)
    for _ in range(5):
        s.on_token()
        time.sleep(0.002)
    out = s.summary()
    assert out["tokens"] == 5
    assert out["ttft_ms"] >= 10
    assert out["decode_tokens_per_sec"] > 0


def test_smoothed_value_and_metric_logger():
    from omchat_tpu.utils.logging import MetricLogger, SmoothedValue

    v = SmoothedValue(window_size=3)
    for x in [1.0, 2.0, 3.0, 4.0]:
        v.update(x)
    assert v.value == 4.0
    assert v.global_avg == 2.5
    assert v.median == 3.0

    m = MetricLogger()
    m.update(loss=1.0)
    m.update(loss=3.0)
    assert "loss" in str(m)
    out = list(m.log_every(range(3), print_freq=2, header="t"))
    assert out == [0, 1, 2]
