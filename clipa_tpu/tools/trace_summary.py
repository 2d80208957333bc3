"""Summarize a jax.profiler trace: device time, bytes and flops by op family.

Aggregates the XLA-op events in a profiler trace
(`plugins/profile/<ts>/*.trace.json.gz`) into a per-op-family roofline
table — achieved GB/s and TF/s per fusion family — the quickest way to
answer "where did the step time go, and is it compute- or HBM-bound"
without TensorBoard (which this environment cannot run).

Two lessons baked in (both bit a round-3 perf investigation):

  * XLA names are NOT semantic classes. A `convert_reduce_fusion` at the
    flagship shape contains the LayerNorm *and* a 215-GFLOP Dense GEMM;
    a plain `fusion.N` can be the dW GEMM fused with the Adam update.
    Classify by the `hlo_category` arg (the compiler's own category) and
    report bytes/flops per family, never by guessing from the name.
  * Step count must be detected, not assumed: the profiler may capture
    fewer executions than were dispatched under the trace. Top-level
    `jit_<name>(...)` module spans on the device lanes are counted as
    steps (`--steps` still overrides).

Usage:
    python -m clipa_tpu.tools.trace_summary /tmp/clipa_bench_trace [--top 25]
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


# Fallback classification for events that never carry an hlo_category arg
# (the profiler attaches metadata to one instance per deduplicated name;
# rare ops can miss out entirely).
_CLASS_RULES = (
    ("copy", re.compile(r"^(copy|bitcast|transpose)[\.\-]?\d*")),
    ("fusion", re.compile(r"^(loop_|input_|output_)?fusion[\.\-]?\d*")),
    ("conv", re.compile(r"^(conv|convolution)")),
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

_JIT_SPAN = re.compile(r"^jit_\w+\(\d+\)$")


def classify(name: str) -> str:
    base = name.split("/")[-1]
    for cls, rx in _CLASS_RULES:
        if rx.match(base):
            return cls
    return "other"


def _family(name: str) -> str:
    """`convolution_add_fusion.250` -> `convolution_add_fusion`."""
    return name.split("/")[-1].split(".")[0]


def summarize(trace_file: str, steps: int = 0, top: int = 25) -> dict:
    with gzip.open(trace_file, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])

    # Restrict to device processes; within them, prefer the "XLA Ops"
    # thread (the leaf-op lane — "Steps"/"XLA Modules" lanes are umbrella
    # spans that would double-count their children).
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

    # Pass 1: metadata join table. The profiler attaches args (bytes,
    # flops, hlo_category) to one event per deduplicated op name; spread
    # them over every same-named instance.
    meta = {}
    n_steps_seen = 0
    for ev in events:
        if ev.get("ph") != "X":
            continue
        name = ev.get("name", "")
        if dev_pids and ev.get("pid") in dev_pids and _JIT_SPAN.match(name):
            n_steps_seen += 1
        args = ev.get("args")
        if args and name not in meta and (
                "bytes_accessed" in args or "hlo_category" in args):
            meta[name] = (int(args.get("bytes_accessed", 0) or 0),
                          int(args.get("model_flops", 0) or 0),
                          args.get("hlo_category", ""))
    steps = steps or n_steps_seen or 1

    by_class = collections.Counter()
    n_by_class = collections.Counter()
    fam = collections.defaultdict(lambda: [0.0, 0, 0, 0])  # us, bytes, fl, n
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
        # Skip trace-infra lanes, step markers and module umbrella spans.
        if name.startswith(("$", "region_", "StepMarker", "tf_Compute")) \
                or _JIT_SPAN.match(name):
            continue
        dur = float(ev["dur"])  # microseconds
        b, fl, cat = meta.get(name, (0, 0, ""))
        by_class[cat or classify(name)] += dur
        n_by_class[cat or classify(name)] += 1
        f = fam[_family(name)]
        f[0] += dur
        f[1] += b
        f[2] += fl
        f[3] += 1
        total += dur

    def _fam_row(us, b, fl, n):
        return {
            "ms": round(us / 1e3 / steps, 3),
            "GB": round(b / 1e9 / steps, 3),
            "GBps": round(b / us / 1e3) if us else 0,
            "TFs": round(fl / us / 1e6, 1) if us else 0.0,
            "count": n,
        }

    families = sorted(fam.items(), key=lambda kv: -kv[1][0])[:top]
    return {
        "trace_file": trace_file,
        "device_lanes_found": bool(dev_pids),
        "steps_detected": n_steps_seen,
        "steps_divisor": steps,
        "total_device_ms_per_step": round(total / 1e3 / steps, 3),
        "total_hbm_gb_per_step": round(
            sum(v[1] for v in fam.values()) / 1e9 / steps, 2),
        "by_category_ms_per_step": {
            k: {"ms": round(v / 1e3 / steps, 3), "count": n_by_class[k]}
            for k, v in by_class.most_common()},
        "by_family_per_step": {k: _fam_row(*v) for k, v in families},
    }


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("trace", help="trace dir or .trace.json.gz file")
    p.add_argument("--steps", type=int, default=0,
                   help="override the detected step count (divisor)")
    p.add_argument("--top", type=int, default=25)
    args = p.parse_args(argv)
    out = summarize(find_trace_file(args.trace), steps=args.steps,
                    top=args.top)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
