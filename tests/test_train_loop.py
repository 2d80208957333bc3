"""End-to-end trainer: smoke run, metrics, checkpoint, resume."""

import json
import os

import numpy as np
import pytest

from clipa_tpu.config import load_config
from clipa_tpu.train import loop


@pytest.fixture(scope="module")
def smoke_run(tmp_path_factory):
    """One 6-step smoke training shared by several assertion-only tests
    (each loop.train invocation costs a full trace+compile on the 1-core
    CI host, so artifact checks share a single run)."""
    workdir = str(tmp_path_factory.mktemp("smoke") / "run")
    remote = str(tmp_path_factory.mktemp("smoke") / "remote")
    config = load_config("clipa_tpu/configs/smoke.py:steps=6,batch=16")
    config.remote_sync = dict(path=remote, every_seconds=9999)
    state = loop.train(config, workdir)
    return workdir, remote, state


def test_smoke_train_runs(smoke_run):
    workdir, _, state = smoke_run
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


def test_resume_from_checkpoint(smoke_run, tmp_path):
    import shutil
    src_workdir, _, _ = smoke_run
    # work on a copy: other tests assert on the shared run's artifacts
    workdir = str(tmp_path / "run")
    shutil.copytree(src_workdir, workdir)
    # extend the finished 6-step run to 9: must resume, not restart
    config = load_config("clipa_tpu/configs/smoke.py:steps=9,batch=16")
    state9 = loop.train(config, workdir)
    assert int(state9["step"]) == 9

    with open(os.path.join(workdir, "metrics.jsonl")) as f:
        steps = [json.loads(line)["step"] for line in f]
    # steps 5-6 logged once by run 1; run 2 logs 7..9 only
    assert 9 in steps
    assert steps.count(5) == 1 and steps.count(6) == 1


def test_remote_sync_mirrors_workdir(smoke_run):
    """config.remote_sync mirrors the workdir to remote storage at the end
    of training (reference: training/main.py:182-197)."""
    _, remote, _ = smoke_run
    assert os.path.exists(os.path.join(remote, "metrics.jsonl"))
    assert os.path.exists(os.path.join(remote, "params.npz"))
    assert os.path.exists(os.path.join(remote, "config.json"))


def test_remote_sync_delta_copy(tmp_path):
    from clipa_tpu.train import remote_sync
    src = tmp_path / "src"
    src.mkdir()
    (src / "a.txt").write_text("one")
    (src / "skip.tmp").write_text("nope")
    dst = str(tmp_path / "dst")
    assert remote_sync.sync(str(src), dst)
    assert (tmp_path / "dst" / "a.txt").read_text() == "one"
    assert not os.path.exists(os.path.join(dst, "skip.tmp"))
    # unchanged file is not re-copied (mtime preserved by the delta check)
    before = os.stat(os.path.join(dst, "a.txt")).st_mtime_ns
    assert remote_sync.sync(str(src), dst)
    assert os.stat(os.path.join(dst, "a.txt")).st_mtime_ns == before


def test_npz_params_export_roundtrip(smoke_run):
    from clipa_tpu.train import checkpoint as ckpt
    workdir, _, state = smoke_run
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
