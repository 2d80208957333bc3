"""Checkpoint format: flat npz, bf16 void round-trip, subtree syntax,
async writer, reference-layout loading."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clipa_tpu import utils as u
from clipa_tpu.train import checkpoint as ckpt


def test_npz_roundtrip(tmp_path):
    tree = {"a": {"b": np.arange(6, dtype=np.float32).reshape(2, 3)},
            "c": np.asarray([1.5])}
    path = str(tmp_path / "x.npz")
    ckpt.save_checkpoint(tree, path)
    loaded = ckpt.load_checkpoint(None, path)
    np.testing.assert_array_equal(loaded["a"]["b"], tree["a"]["b"])
    np.testing.assert_array_equal(loaded["c"], tree["c"])


def test_bf16_void_roundtrip(tmp_path):
    """bf16 params survive npz (the np.void storage convention)."""
    x = jnp.asarray([1.5, -2.25, 3.0], jnp.bfloat16)
    tree = {"w": np.asarray(x)}
    path = str(tmp_path / "bf16.npz")
    ckpt.save_checkpoint(tree, path)
    loaded = ckpt.load_checkpoint(None, path)
    assert str(loaded["w"].dtype) == "bfloat16"
    np.testing.assert_array_equal(loaded["w"].astype(np.float32),
                                  np.asarray(x).astype(np.float32))


def test_subtree_syntax(tmp_path):
    """`file.npz:key` extracts a sub-tree (reference load_params)."""
    tree = {"img": {"w": np.ones((2,))}, "txt": {"w": np.zeros((3,))},
            "t": np.asarray([0.5])}
    path = str(tmp_path / "two_towers.npz")
    ckpt.save_checkpoint({"params": tree}, path)
    img = ckpt.load_params(f"{path}:img")
    np.testing.assert_array_equal(img["w"], np.ones((2,)))
    # params/ prefix auto-detected
    full = ckpt.load_params(path)
    assert set(full) == {"img", "txt", "t"}


def test_load_params_params_prefix(tmp_path):
    """load_params on a full train checkpoint digs out params/."""
    tree = {"params": {"w": np.ones(2)}, "opt": {"count": np.asarray(3)}}
    path = str(tmp_path / "train.npz")
    ckpt.save_checkpoint(tree, path)
    params = ckpt.load_params(path)
    assert "w" in params and "opt" not in params


def test_step_copy(tmp_path):
    path = str(tmp_path / "c.npz")
    ckpt.save_checkpoint({"w": np.ones(1)}, path, step_copy=123)
    assert os.path.exists(path)
    assert os.path.exists(path + "-000000123")


def test_async_writer(tmp_path):
    path = str(tmp_path / "a.npz")
    w = ckpt.AsyncCheckpointWriter()
    w.save({"w": np.arange(4)}, path)
    w.wait()
    np.testing.assert_array_equal(ckpt.load_checkpoint(None, path)["w"],
                                  np.arange(4))


def test_tower_load_via_npz(tmp_path):
    """vit.load / two_towers.load consume our npz exports."""
    from clipa_tpu.models import two_towers

    model = two_towers.Model(
        image={"variant": "Ti/16", "pool_type": "tok", "posemb": "sincos2d"},
        text={"variant": "Ti", "pool_type": "last", "vocab_size": 64},
        out_dim=(32, 32), temperature_init=1 / 0.07)
    params = model.init({"params": jax.random.PRNGKey(0)},
                        jnp.zeros((1, 32, 32, 3)),
                        jnp.zeros((1, 8), jnp.int32))["params"]
    params = jax.device_get(params)
    path = str(tmp_path / "release.npz")
    ckpt.save_checkpoint({"params": params}, path)

    # whole-model load (string shortcut -> img/txt/t subtrees)
    cfg = type("C", (), {"image_model": "vit",
                         "text_model": "text_transformer",
                         "get": lambda self, k: None})()
    restored = two_towers.load(params, path, cfg)
    flat_a = dict(u.tree_flatten_with_names(params)[0])
    flat_b = dict(u.tree_flatten_with_names(restored)[0])
    assert set(flat_a) == set(flat_b)
    for k in flat_a:
        np.testing.assert_array_equal(np.asarray(flat_a[k]),
                                      np.asarray(flat_b[k]), err_msg=k)


def test_pad_shard_unpad():
    @u.pad_shard_unpad
    def embed(params, x):
        return jnp.asarray(x) * 2

    out = embed(None, np.arange(13, dtype=np.float32))
    np.testing.assert_array_equal(out, np.arange(13) * 2)
