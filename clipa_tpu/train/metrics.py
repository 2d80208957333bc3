"""Observability: step metrics writer + the Chrono throughput meter.

Keeps the reference's metric names (`img/sec/core`, `core_hours_<kind>`,
`epoch`, `examples_seen` — clipa_jax/helpers/utils.py:270-449) so dashboards
and BASELINE comparisons carry over. Metrics go to stdout + a JSONL file on
host 0 (async, single writer thread); wandb is an optional sink.
"""

from __future__ import annotations

import json
import os
import time
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Optional

import jax
import numpy as np


class MetricWriter:
    """Host-0 JSONL metric writer with an async single-thread pool."""

    def __init__(self, workdir: Optional[str] = None, *,
                 log_fn=print, wandb_run=None):
        self.workdir = workdir
        self.log_fn = log_fn
        self.wandb_run = wandb_run
        self.step: int = 0
        self._row: dict = {}
        self._pool = ThreadPoolExecutor(max_workers=1,
                                        thread_name_prefix="metrics")
        self._file = None
        if workdir and jax.process_index() == 0:
            os.makedirs(workdir, exist_ok=True)
            self._file = open(os.path.join(workdir, "metrics.jsonl"), "a")

    def write_config(self, config) -> None:
        if self.workdir and jax.process_index() == 0:
            with open(os.path.join(self.workdir, "config.json"), "w") as f:
                f.write(config.to_json(indent=2)
                        if hasattr(config, "to_json")
                        else json.dumps(config, indent=2, default=str))

    def step_start(self, step: int) -> None:
        self.step = step
        self._row = {"step": step}

    def measure(self, name: str, value) -> Any:
        """Records one metric; returns the raw value for chaining.

        Device values are kept as-is and fetched in ONE batched transfer at
        `step_end` — per-metric `device_get` costs a host round-trip each
        (and on a TPU relay, a tunnel round-trip), which dominated logging
        steps when metrics were pulled one by one.
        """
        if jax.process_index() != 0:
            return value
        self._row[name] = value
        return value

    def _materialize(self) -> dict:
        raw = {k: v for k, v in self._row.items() if k != "step"}
        host = jax.device_get(raw)  # one transfer for the whole row
        out = {"step": self._row.get("step", self.step)}
        for name, v in host.items():
            val = np.asarray(v)
            out[name] = float(val) if val.ndim == 0 else val.tolist()
        return out

    def step_end(self) -> None:
        if len(self._row) <= 1:
            return
        row = self._materialize()
        for name, val in row.items():
            if name != "step":
                self.log_fn(f"[{row['step']}] {name} = {val}")
        if self.wandb_run is not None:
            self.wandb_run.log({k: v for k, v in row.items() if k != "step"},
                               step=row["step"])
        if self._file is None:
            return

        def _write():
            self._file.write(json.dumps(row) + "\n")
            self._file.flush()

        self._pool.submit(_write)

    def close(self) -> None:
        self._pool.shutdown(wait=True)
        if self._file:
            self._file.close()


class Chrono:
    """Wall-clock accounting: throughput, core-hours, ETA; restart-proof.

    Call `inform` once sizes are known, `tick(step)` on log steps, and
    `pause`/`resume` around evals/checkpoints so they don't pollute
    throughput. `save()`/`load()` round-trip accumulated state through the
    checkpoint so `img/sec/core` and core-hours survive restarts.
    """

    def __init__(self):
        self.program_start = time.monotonic()
        self.train_start: Optional[float] = None
        self.prev_time: Optional[float] = None
        self.prev_step: Optional[int] = None
        self.pause_start: Optional[float] = None
        self.paused_time = 0.0
        self.accum_train_time = 0.0
        self.accum_pause_time = 0.0
        self.accum_program_time = 0.0
        self.total_steps = 0
        self.global_batch_size = 0
        self.steps_per_epoch = float("inf")
        self.warmup_ticks = 1  # first tick includes compilation; skip it
        self.note = ""
        try:
            self.device_kind = jax.devices()[0].device_kind.replace(" ", "_")
        except RuntimeError:
            self.device_kind = "unknown"

    def inform(self, *, first_step: int = 0, total_steps: int = 0,
               global_bs: int = 0, steps_per_epoch: float = float("inf")):
        self.prev_step = first_step
        self.total_steps = total_steps
        self.global_batch_size = global_bs
        self.steps_per_epoch = steps_per_epoch

    def tick(self, step: int, measure=None, write_note=None) -> dict:
        now = time.monotonic()
        measurements = {}
        if self.train_start is None:
            self.train_start = now
        if self.prev_time is not None and step > (self.prev_step or 0):
            dt = now - self.prev_time - self.paused_time
            dsteps = step - self.prev_step
            if self.warmup_ticks > 0:
                self.warmup_ticks -= 1
            else:
                self.accum_train_time += dt
                imgs = self.global_batch_size * dsteps
                cores = max(1, jax.device_count())
                measurements["img/sec/core"] = imgs / max(dt, 1e-9) / cores
                measurements["img/sec"] = imgs / max(dt, 1e-9)
        self.accum_program_time = now - self.program_start
        measurements["epoch"] = step / self.steps_per_epoch \
            if np.isfinite(self.steps_per_epoch) else 0.0
        measurements["examples_seen"] = step * self.global_batch_size
        cores = max(1, jax.device_count())
        measurements[f"core_hours_{self.device_kind}"] = \
            (self.accum_train_time * cores) / 3600.0
        if self.total_steps and self.accum_train_time > 0 and \
                step > (self.prev_step or 0):
            done = step - (self.prev_step or 0)
            rate = self.accum_train_time / max(step, 1)
            eta_h = rate * (self.total_steps - step) / 3600.0
            self.note = (f"step {step}/{self.total_steps}, "
                         f"ETA {eta_h:.2f}h")
            del done
        self.prev_time = now
        self.prev_step = step
        self.paused_time = 0.0
        if measure:
            for k, v in measurements.items():
                measure(k, v)
        if write_note and self.note:
            write_note(self.note)
        return measurements

    def pause(self, wait_for=()) -> None:
        if wait_for is not None:
            jax.block_until_ready(wait_for)
        self.pause_start = time.monotonic()

    def resume(self) -> None:
        if self.pause_start is not None:
            dt = time.monotonic() - self.pause_start
            self.paused_time += dt
            self.accum_pause_time += dt
            self.pause_start = None

    def save(self) -> dict:
        return {
            "accum_train_time": np.asarray(self.accum_train_time),
            "accum_pause_time": np.asarray(self.accum_pause_time),
            "accum_program_time": np.asarray(self.accum_program_time),
        }

    def load(self, state: dict) -> None:
        self.accum_train_time = float(state["accum_train_time"])
        self.accum_pause_time = float(state["accum_pause_time"])
        self.accum_program_time = float(state["accum_program_time"])


class Profiler:
    """Real jax.profiler wiring (the reference left this as stubs,
    clipa_jax/helpers/utils.py:789-802)."""

    def __init__(self, workdir: Optional[str], start_step: int = 10,
                 num_steps: int = 5):
        self.logdir = os.path.join(workdir, "traces") if workdir else None
        self.start_step = start_step
        self.stop_step = start_step + num_steps
        self._active = False

    def maybe_start(self, step: int) -> None:
        if (self.logdir and not self._active and step == self.start_step
                and jax.process_index() == 0):
            try:
                jax.profiler.start_trace(self.logdir)
                self._active = True
            except Exception:
                self.logdir = None  # profiling unsupported on this runtime

    def maybe_stop(self, step: int) -> None:
        if self._active and step >= self.stop_step:
            try:
                jax.profiler.stop_trace()
            finally:
                self._active = False

    def step_annotation(self, step: int):
        return jax.profiler.StepTraceAnnotation("train_step", step_num=step)
