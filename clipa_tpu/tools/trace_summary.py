"""Summarize a jax.profiler trace: device time by op class.

Aggregates the TraceMe/XLA-op events in a profiler trace
(`plugins/profile/<ts>/*.trace.json.gz`) into a per-op-class table —
fusions, convolutions, copies, Pallas custom calls, collectives — the
quickest way to answer "where did the step time go" without TensorBoard
(which this environment cannot run).

Usage:
    python -m clipa_tpu.tools.trace_summary /tmp/clipa_bench_trace \
        [--top 25] [--steps 3]

The per-step numbers divide total device time by `--steps` (pass how many
steps ran inside the trace; bench.py traces 3, profile_step --trace 3).
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re


def find_trace_file(path: str) -> str:
    """Accepts a trace dir (newest run chosen) or a .trace.json.gz file."""
    if os.path.isfile(path):
        return path
    hits = sorted(glob.glob(
        os.path.join(path, "plugins", "profile", "*", "*.trace.json.gz")))
    if not hits:
        raise FileNotFoundError(f"no *.trace.json.gz under {path}")
    return hits[-1]


_CLASS_RULES = (
    ("copy", re.compile(r"^(copy|bitcast|transpose)[\.\-]?\d*")),
    ("fusion", re.compile(r"^(loop_|input_|output_)?fusion[\.\-]?\d*")),
    ("conv", re.compile(r"^(conv|convolution)[\.\-]?\d*")),
    ("dot", re.compile(r"^dot[\.\-]?\d*")),
    ("custom-call", re.compile(r"^custom-call[\.\-]?\d*")),
    ("collective", re.compile(
        r"^(all-reduce|all-gather|reduce-scatter|collective-permute|"
        r"all-to-all)[\.\-]?\d*")),
    ("rng", re.compile(r"^rng")),
    ("reduce", re.compile(r"^reduce[\.\-]?\d*")),
    ("select-scatter", re.compile(r"^(select|scatter|gather|dynamic)")),
    ("infeed-outfeed", re.compile(r"^(infeed|outfeed)")),
)


def classify(name: str) -> str:
    base = name.split("/")[-1]
    for cls, rx in _CLASS_RULES:
        if rx.match(base):
            return cls
    return "other"


def summarize(trace_file: str, steps: int = 1, top: int = 25) -> dict:
    with gzip.open(trace_file, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])

    # The "XLA Ops" thread of each device process holds exactly the leaf
    # op events (the "Steps"/"XLA Modules" lanes are umbrella spans that
    # would double-count their children).
    dev_pids, op_lanes = set(), set()
    for ev in events:
        if ev.get("ph") != "M":
            continue
        if ev.get("name") == "process_name":
            pname = ev.get("args", {}).get("name", "")
            if re.search(r"TPU|/device:|Device", pname, re.I):
                dev_pids.add(ev["pid"])
        elif ev.get("name") == "thread_name" and \
                ev.get("args", {}).get("name") == "XLA Ops":
            op_lanes.add((ev["pid"], ev["tid"]))
    op_lanes = {(p, t) for (p, t) in op_lanes if p in dev_pids} or None

    by_class = collections.Counter()
    by_op = collections.Counter()
    n_by_class = collections.Counter()
    total = 0.0
    for ev in events:
        if ev.get("ph") != "X" or "dur" not in ev:
            continue
        if op_lanes is not None:
            if (ev.get("pid"), ev.get("tid")) not in op_lanes:
                continue
        elif dev_pids and ev.get("pid") not in dev_pids:
            continue
        name = ev.get("name", "")
        # Skip trace-infra lanes and step markers.
        if name.startswith(("$", "region_", "StepMarker", "tf_Compute")):
            continue
        cls = classify(name)
        dur = float(ev["dur"])  # microseconds
        by_class[cls] += dur
        n_by_class[cls] += 1
        by_op[re.sub(r"[\.\-]\d+$", "", name.split("/")[-1])] += dur
        total += dur

    return {
        "trace_file": trace_file,
        "device_lanes_found": bool(dev_pids),
        "total_device_ms_per_step": round(total / 1e3 / steps, 3),
        "by_class_ms_per_step": {
            k: {"ms": round(v / 1e3 / steps, 3), "count": n_by_class[k]}
            for k, v in by_class.most_common()},
        "top_ops_ms_per_step": {
            k: round(v / 1e3 / steps, 3) for k, v in by_op.most_common(top)},
    }


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("trace", help="trace dir or .trace.json.gz file")
    p.add_argument("--steps", type=int, default=1,
                   help="steps captured in the trace (divisor)")
    p.add_argument("--top", type=int, default=25)
    args = p.parse_args(argv)
    out = summarize(find_trace_file(args.trace), steps=args.steps,
                    top=args.top)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
