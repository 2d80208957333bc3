"""Int8 quantized matmul path: accuracy, gradients, end-to-end training."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clipa_tpu.ops import quantization as q


def test_int8_matmul_accuracy():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(64, 128).astype(np.float32))
    w = jnp.asarray(rng.randn(128, 96).astype(np.float32) * 0.05)
    exact = np.asarray(x) @ np.asarray(w)
    quant = np.asarray(q.int8_matmul(x, w))
    # int8 with per-row/col scales: ~1% relative error on gaussian data
    rel = np.abs(quant - exact) / (np.abs(exact).mean() + 1e-6)
    assert rel.mean() < 0.02, rel.mean()


def test_int8_matmul_outlier_rows():
    """Per-row scales isolate outliers to their own row."""
    rng = np.random.RandomState(0)
    x = rng.randn(8, 32).astype(np.float32)
    x[0] *= 1000.0  # huge outlier row
    w = rng.randn(32, 16).astype(np.float32)
    out = np.asarray(q.int8_matmul(jnp.asarray(x), jnp.asarray(w)))
    exact = x @ w
    # non-outlier rows unaffected by row 0's scale
    rel = np.abs(out[1:] - exact[1:]) / (np.abs(exact[1:]).mean() + 1e-6)
    assert rel.mean() < 0.02


def test_int8_gradients_are_high_precision():
    """Backward returns exact bf16/fp32 grads (straight-through fwd)."""
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(16, 32).astype(np.float32))
    w = jnp.asarray(rng.randn(32, 8).astype(np.float32) * 0.1)

    def f(x, w):
        return jnp.sum(q.int8_matmul(x, w) ** 2) * 0.5

    gx, gw = jax.grad(f, argnums=(0, 1))(x, w)
    # grads use the quantized output but exact operand transposes:
    y = q.int8_matmul(x, w)
    np.testing.assert_allclose(gx, y @ w.T, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(gw, x.T @ y, rtol=1e-5, atol=1e-5)


def test_quant_dot_shapes():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 5, 32).astype(np.float32))
    k3 = jnp.asarray(rng.randn(32, 4, 8).astype(np.float32))
    out = q.quant_dot(x, k3, quant="int8")
    assert out.shape == (2, 5, 4, 8)
    out_ref = q.quant_dot(x, k3, quant=None)
    assert out_ref.shape == (2, 5, 4, 8)
    np.testing.assert_allclose(out, out_ref, rtol=0.1, atol=0.1)


def test_int8_tower_trains(mesh8):
    """A tiny int8-quantized two-tower model trains (loss decreases)."""
    from clipa_tpu import optim
    from clipa_tpu.config import ConfigDict
    from clipa_tpu.models import two_towers
    from clipa_tpu.parallel import local_batch_to_global
    from clipa_tpu.train import step as step_lib

    model = two_towers.Model(
        image={"variant": "Ti/16", "pool_type": "tok", "posemb": "sincos2d",
               "quant": "int8", "depth": 2, "mlp_dim": 384},
        text={"variant": "Ti", "pool_type": "last", "vocab_size": 128,
              "quant": "int8", "depth": 2, "mlp_dim": 384},
        out_dim=(64, 64), temperature_init=1 / 0.07)
    config = ConfigDict(
        lr=1e-3, wd=1e-4, optax_name="scale_by_adam", optax=dict(),
        schedule=[(".*", dict(decay_type="cosine", warmup_steps=2))],
        init_shapes=[(1, 32, 32, 3), (1, 8)], mask_ratio=0.0, cpu_unit8=True)
    abstract = jax.eval_shape(
        lambda r: model.init({"params": r}, jnp.zeros((1, 32, 32, 3)),
                             jnp.zeros((1, 8), jnp.int32),
                             train=False)["params"],
        jax.random.PRNGKey(0))
    tx, _ = optim.make(config, abstract, sched_kw=dict(total_steps=10))
    state = step_lib.init_train_state(model, tx, config, mesh8,
                                      jax.random.PRNGKey(0))
    update = step_lib.make_update_fn(model, tx, config, mesh8)
    rng = np.random.RandomState(0)
    batch = local_batch_to_global({
        "image": rng.randint(0, 255, (16, 32, 32, 3), dtype=np.uint8),
        "labels": rng.randint(0, 128, (16, 8)).astype(np.int32)}, mesh8)
    losses = []
    for _ in range(8):
        state, meas = update(state, batch)
        losses.append(float(meas["training_loss"]))
    assert np.isfinite(losses).all()
    assert min(losses[3:]) < losses[0] - 0.05, losses
