"""End-to-end trainer: smoke run, metrics, checkpoint, resume."""

import json
import os

import numpy as np
import pytest

from clipa_tpu.config import load_config
from clipa_tpu.train import loop


def test_smoke_train_runs(tmp_path, mesh8):
    config = load_config("clipa_tpu/configs/smoke.py:steps=6,batch=16")
    workdir = str(tmp_path / "run")
    state = loop.train(config, workdir)
    assert int(state["step"]) == 6

    # metrics were written
    with open(os.path.join(workdir, "metrics.jsonl")) as f:
        rows = [json.loads(line) for line in f]
    assert any("training_loss" in r for r in rows)
    assert any("img/sec/core" in r for r in rows)
    assert os.path.exists(os.path.join(workdir, "config.json"))
    assert os.path.exists(os.path.join(workdir, "params.npz"))

    # loss is finite at every logged step (6 steps can't demonstrate
    # learning; the strict oracle is test_loop_evals.py::
    # test_config_path_learns_and_beats_chance at 80 steps)
    losses = [r["training_loss"] for r in rows if "training_loss" in r]
    assert all(np.isfinite(losses))


def test_resume_from_checkpoint(tmp_path):
    workdir = str(tmp_path / "run")
    config = load_config("clipa_tpu/configs/smoke.py:steps=5,batch=16")
    state5 = loop.train(config, workdir)

    # extend to 8 steps: must resume from step 5, not restart
    config = load_config("clipa_tpu/configs/smoke.py:steps=8,batch=16")
    state8 = loop.train(config, workdir)
    assert int(state8["step"]) == 8

    with open(os.path.join(workdir, "metrics.jsonl")) as f:
        steps = [json.loads(line)["step"] for line in f]
    # step 5 logged once by run 1; run 2 logs 6..8 only
    assert 6 in steps or 8 in steps
    assert steps.count(5) == 1


def test_npz_params_export_roundtrip(tmp_path):
    from clipa_tpu.train import checkpoint as ckpt
    workdir = str(tmp_path / "run")
    config = load_config("clipa_tpu/configs/smoke.py:steps=2,batch=16")
    state = loop.train(config, workdir)
    params = ckpt.load_params(os.path.join(workdir, "params.npz"))
    assert "img" in params and "txt" in params and "t" in params
    np.testing.assert_allclose(
        params["t"], np.asarray(state["params"]["t"]), rtol=1e-6)


def test_model_init_with_dont_load(tmp_path):
    """config.model_init loads tower weights, dont_load keeps init values."""
    import jax
    from clipa_tpu.config import ConfigDict
    from clipa_tpu.train import checkpoint as ckpt

    # stage 1: short train, export params
    workdir1 = str(tmp_path / "stage1")
    config = load_config("clipa_tpu/configs/smoke.py:steps=2,batch=16")
    state1 = loop.train(config, workdir1)
    params_npz = os.path.join(workdir1, "params.npz")

    # stage 2: fresh run initialized from stage-1 towers, head re-initialized
    config2 = load_config("clipa_tpu/configs/smoke.py:steps=2,batch=16")
    config2.model_init = params_npz
    config2.model_load = ConfigDict(
        img_load_kw=ConfigDict(dont_load=["head/kernel"]))
    workdir2 = str(tmp_path / "stage2")
    state2 = loop.train(config2, workdir2)
    assert int(state2["step"]) == 2


def test_eval_only_mode(tmp_path):
    config = load_config("clipa_tpu/configs/smoke.py:steps=3,batch=16")
    config.eval_only = True
    state = loop.train(config, str(tmp_path / "run"))
    # eval_only must not train
    assert int(state["step"]) == 0
