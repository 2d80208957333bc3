"""Metrics: Chrono accounting, MetricWriter output, itstime schedule."""

import json
import os
import time

import numpy as np

from clipa_tpu import utils as u
from clipa_tpu.train import metrics as m


def test_metric_writer(tmp_path):
    w = m.MetricWriter(str(tmp_path), log_fn=lambda *_: None)
    w.step_start(1)
    w.measure("loss", np.asarray(1.5))
    w.measure("vec", np.asarray([1.0, 2.0]))
    w.step_end()
    w.step_start(2)  # empty step: no row
    w.step_end()
    w.close()
    rows = [json.loads(line)
            for line in open(os.path.join(tmp_path, "metrics.jsonl"))]
    assert rows == [{"step": 1, "loss": 1.5, "vec": [1.0, 2.0]}]


def test_chrono_throughput():
    c = m.Chrono()
    c.inform(first_step=0, total_steps=100, global_bs=64, steps_per_epoch=10)
    c.tick(1)           # warmup tick (compilation) — no throughput yet
    time.sleep(0.05)
    out = c.tick(2)
    assert "img/sec/core" not in out  # second tick is the first measured one?
    time.sleep(0.05)
    out = c.tick(3)
    assert out["img/sec/core"] > 0
    assert out["epoch"] == 0.3
    assert out["examples_seen"] == 3 * 64

    # pauses are excluded from throughput
    c.pause(wait_for=None)
    time.sleep(0.1)
    c.resume()
    time.sleep(0.02)
    out = c.tick(4)
    # 1 step in ~0.02s (pause excluded) -> should exceed 64/0.13
    assert out["img/sec"] > 64 / 0.1


def test_chrono_save_load():
    c = m.Chrono()
    c.accum_train_time = 123.0
    state = c.save()
    c2 = m.Chrono()
    c2.load(state)
    assert c2.accum_train_time == 123.0


def test_itstime():
    assert u.itstime(50, 50, 1000)
    assert not u.itstime(51, 50, 1000)
    assert u.itstime(1000, 50, 1000)       # last step
    assert u.itstime(1, 50, 1000)          # first step
    assert not u.itstime(1, 50, 1000, first=False)
    assert not u.itstime(10, None, 1000)
    assert not u.itstime(10, 0, 1000)
