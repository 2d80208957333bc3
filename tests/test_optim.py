"""Optimizer factory: schedules, freezing, wd masks, lwd, resume count."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from clipa_tpu import optim
from clipa_tpu.config import ConfigDict


def _params():
    return {
        "img": {"Transformer": {"encoderblock_0": {"kernel": jnp.ones((4, 4))},
                                "encoderblock_1": {"kernel": jnp.ones((4, 4))}},
                "head": {"kernel": jnp.ones((4, 2)), "bias": jnp.zeros(2)}},
        "t": jnp.zeros(1),
    }


def _base_config(**kw):
    c = ConfigDict(
        lr=0.1, wd=0.01, optax_name="scale_by_adam",
        optax=dict(b1=0.9, b2=0.95),
        schedule=[(".*", dict(decay_type="cosine", warmup_steps=5))],
    )
    c.update(kw)
    return c


def test_make_and_step():
    params = _params()
    tx, sched_fns = optim.make(_base_config(), params,
                               sched_kw=dict(total_steps=100))
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, state = tx.update(grads, state, params)  # step 0: lr=0 (warmup)
    np.testing.assert_array_equal(updates["t"], 0.0)
    updates, state = tx.update(grads, state, params)  # step 1: warming up
    new = optax.apply_updates(params, updates)
    assert not np.allclose(new["t"], params["t"])
    assert len(sched_fns) == 1


def test_freezing():
    params = _params()
    cfg = _base_config(schedule=[
        ("t", None),  # freeze temperature
        (".*", dict(decay_type="cosine", warmup_steps=5)),
    ])
    tx, _ = optim.make(cfg, params, sched_kw=dict(total_steps=100))
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    _, state = tx.update(grads, state, params)  # step 0: warmup lr=0
    updates, _ = tx.update(grads, state, params)
    np.testing.assert_array_equal(updates["t"], 0.0)
    assert not np.allclose(updates["img"]["head"]["kernel"], 0.0)


def test_schedule_must_cover_all():
    params = _params()
    cfg = _base_config(schedule=[("img/.*", dict(decay_type="cosine"))])
    with pytest.raises(ValueError):
        optim.make(cfg, params, sched_kw=dict(total_steps=100))


def test_cosine_schedule_shape():
    fn = optim.create_learning_rate_schedule(
        total_steps=100, base=1.0, decay_type="cosine", warmup_steps=10)
    assert float(fn(0)) == 0.0
    np.testing.assert_allclose(float(fn(10)), 1.0, rtol=1e-6)
    np.testing.assert_allclose(float(fn(100)), 0.0, atol=1e-6)
    # mid-point of cosine (warmup excluded): progress=0.5 -> 0.5
    np.testing.assert_allclose(float(fn(55)), 0.5, rtol=1e-6)


def test_cosine_min_lr():
    fn = optim.create_learning_rate_schedule(
        total_steps=100, base=1.0, decay_type="cosine", warmup_steps=0,
        min_lr=0.1, max_lr=1.0)
    np.testing.assert_allclose(float(fn(100)), 0.1, rtol=1e-5)


def test_rsqrt_schedule():
    fn = optim.create_learning_rate_schedule(
        total_steps=1000, base=1.0, decay_type="rsqrt", warmup_steps=10,
        timescale=100)
    assert float(fn(5)) < 1.0  # warming up
    assert float(fn(500)) < float(fn(100))


def test_linear_schedule():
    fn = optim.create_learning_rate_schedule(
        total_steps=100, base=1.0, decay_type="linear")
    np.testing.assert_allclose(float(fn(50)), 0.5, rtol=1e-6)


def test_get_count_resume():
    params = _params()
    tx, _ = optim.make(_base_config(), params, sched_kw=dict(total_steps=100))
    state = tx.init(params)
    assert optim.get_count(state) == 0
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    for _ in range(3):
        _, state = tx.update(grads, state, params)
    assert optim.get_count(state) == 3


def test_wd_only_on_kernels():
    params = _params()
    cfg = _base_config(lr=0.0, wd=0.5)  # isolate weight decay
    tx, _ = optim.make(cfg, params, sched_kw=dict(total_steps=100))
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.zeros_like, params)
    updates, _ = tx.update(grads, state, params)
    # lr=0 scales everything to 0; use lr>0, zero grads instead:
    cfg = _base_config(lr=1.0, wd=0.5,
                       schedule=[(".*", dict(decay_type="linear",
                                             warmup_steps=0))])
    tx, _ = optim.make(cfg, params, sched_kw=dict(total_steps=100))
    state = tx.init(params)
    updates, _ = tx.update(grads, state, params)
    # bias gets no wd, kernel does (adam of zero grad is zero)
    np.testing.assert_array_equal(updates["img"]["head"]["bias"], 0.0)
    assert np.all(np.asarray(updates["img"]["head"]["kernel"]) != 0.0)


def test_lr_mults():
    params = _params()
    cfg = _base_config(
        lr=1.0, wd=0.0,
        lr_mults=[("t", 0.5), (".*", 1.0)],
        schedule=[(".*", dict(decay_type="linear", warmup_steps=0))])
    tx, _ = optim.make(cfg, params, sched_kw=dict(total_steps=100))
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    ratio = float(updates["t"][0] / updates["img"]["head"]["bias"][0])
    np.testing.assert_allclose(ratio, 0.5, rtol=1e-5)


def test_lwd_layerwise_decay():
    params = _params()
    cfg = _base_config(
        lr=1.0, wd=0.0, lwd=0.5,
        model=ConfigDict(image=ConfigDict(variant="Ti/16")),
        schedule=[(".*", dict(decay_type="linear", warmup_steps=0))])
    # Ti has depth 12; blocks 0/1 get 0.5^12, 0.5^11
    tx, _ = optim.make(cfg, params, sched_kw=dict(total_steps=100))
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    u0 = float(np.abs(updates["img"]["Transformer"]["encoderblock_0"]["kernel"][0, 0]))
    u1 = float(np.abs(updates["img"]["Transformer"]["encoderblock_1"]["kernel"][0, 0]))
    np.testing.assert_allclose(u1 / u0, 2.0, rtol=1e-4)


def test_replace_frozen():
    params = _params()
    schedule = [("t", None), (".*", dict(decay_type="cosine"))]
    out = optim.replace_frozen(schedule, params, 0.0)
    assert out["t"] == 0.0
    assert isinstance(out["img"]["head"]["kernel"], jnp.ndarray)


def test_fused_adam_matches_optax():
    """scale_by_fused_adam == optax.scale_by_adam exactly (f32 moments),
    over several steps, with leaves on both sides of the size threshold."""
    key = jax.random.PRNGKey(0)
    params = {
        "big": jax.random.normal(key, (64, 32)),       # >= threshold 1024
        "small_a": jax.random.normal(key, (7,)),
        "small_b": jax.random.normal(key, (3, 5)),
        "scalar": jnp.float32(0.3),
    }
    ref = optax.scale_by_adam(b1=0.9, b2=0.95, eps=1e-8)
    fused = optim.scale_by_fused_adam(b1=0.9, b2=0.95, eps=1e-8,
                                      small_leaf_elems=1024)
    s_ref, s_fused = ref.init(params), fused.init(params)
    for i in range(4):
        grads = jax.tree_util.tree_map(
            lambda p: jax.random.normal(jax.random.fold_in(key, i), p.shape)
            if hasattr(p, "shape") else jnp.float32(0.1), params)
        u_ref, s_ref = ref.update(grads, s_ref)
        u_fused, s_fused = fused.update(grads, s_fused)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-6,
                                                    atol=1e-7),
            u_ref, u_fused)
    assert int(s_fused["count"]) == 4


def test_fused_adam_through_factory():
    """optax_name=scale_by_fused_adam works through make(): full chain,
    wd applied, state round-trips, get_count reads the schedule count."""
    params = _params()
    cfg = _base_config(
        lr=0.1, wd=0.01, optax_name="scale_by_fused_adam",
        optax=dict(b1=0.9, b2=0.95, mu_dtype="bfloat16",
                   small_leaf_elems=64),
        schedule=[(".*", dict(decay_type="cosine", warmup_steps=2))])
    tx, _ = optim.make(cfg, params, sched_kw=dict(total_steps=100))
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    for _ in range(3):
        updates, state = tx.update(grads, state, params)
        params = optax.apply_updates(params, updates)
    assert optim.get_count(state) == 3
    assert all(np.isfinite(x).all()
               for x in jax.tree_util.tree_leaves(params))
