"""Offline tooling: profiler-trace summarizer."""

import gzip
import json

from clipa_tpu.tools import trace_summary


def _write_trace(path, events):
    with gzip.open(path, "wt") as f:
        json.dump({"traceEvents": events}, f)
    return str(path)


def test_trace_summary_rooflines_and_step_detection(tmp_path):
    """Durations land on the hlo_category of the metadata-carrying
    instance (spread over same-named events), step count comes from the
    jit_ module spans, and bytes/flops aggregate per family."""
    events = [
        {"ph": "M", "pid": 1, "name": "process_name",
         "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "pid": 1, "tid": 7, "name": "thread_name",
         "args": {"name": "XLA Ops"}},
        # Two traced steps (umbrella spans must not be counted as op time).
        {"ph": "X", "pid": 1, "tid": 7, "name": "jit_update(42)",
         "ts": 0, "dur": 9000},
        {"ph": "X", "pid": 1, "tid": 7, "name": "jit_update(42)",
         "ts": 9000, "dur": 9000},
        # A GEMM-bearing fusion whose *name* looks like a reduce: the
        # category must come from hlo_category, not the name. Metadata is
        # attached to one instance; the second same-named event inherits.
        {"ph": "X", "pid": 1, "tid": 7, "name": "convert_reduce_fusion.1",
         "ts": 0, "dur": 4000,
         "args": {"hlo_category": "convolution fusion",
                  "bytes_accessed": 4_000_000, "model_flops": 2_000_000}},
        {"ph": "X", "pid": 1, "tid": 7, "name": "convert_reduce_fusion.1",
         "ts": 9000, "dur": 4000},
        # A host-lane event that must be ignored (wrong pid).
        {"ph": "X", "pid": 99, "tid": 1, "name": "$profiler.py:1 trace",
         "ts": 0, "dur": 999999},
    ]
    f = _write_trace(tmp_path / "t.trace.json.gz", events)
    out = trace_summary.summarize(f)
    assert out["steps_detected"] == 2
    assert out["steps_divisor"] == 2
    # 8 ms of op time over 2 steps -> 4 ms/step.
    assert out["total_device_ms_per_step"] == 4.0
    cats = out["by_category_ms_per_step"]
    assert list(cats) == ["convolution fusion"]
    assert cats["convolution fusion"]["count"] == 2
    fam = out["by_family_per_step"]["convert_reduce_fusion"]
    assert fam["count"] == 2
    # bytes spread over both instances: 8 MB total / 2 steps = 4 MB/step...
    assert fam["GB"] == 0.004
    # ...and 8 MB over 8 ms -> 1 GB/s achieved.
    assert fam["GBps"] == 1


def test_trace_summary_explicit_steps_override(tmp_path):
    events = [
        {"ph": "M", "pid": 1, "name": "process_name",
         "args": {"name": "/device:TPU:0"}},
        {"ph": "X", "pid": 1, "tid": 7, "name": "fusion.9",
         "ts": 0, "dur": 6000,
         "args": {"hlo_category": "loop fusion", "bytes_accessed": 6000}},
    ]
    f = _write_trace(tmp_path / "t.trace.json.gz", events)
    out = trace_summary.summarize(f, steps=3)
    assert out["steps_detected"] == 0
    assert out["steps_divisor"] == 3
    assert out["total_device_ms_per_step"] == 2.0


def test_find_trace_file(tmp_path):
    d = tmp_path / "plugins" / "profile" / "2026_01_01_00_00_00"
    d.mkdir(parents=True)
    f = d / "vm.trace.json.gz"
    _write_trace(f, [])
    assert trace_summary.find_trace_file(str(tmp_path)) == str(f)
