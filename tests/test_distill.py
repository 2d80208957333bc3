"""Distillation: DistillClipLoss parity + frozen-teacher trainer wiring.

Reference semantics: clipa_torch/open_clip/loss.py (DistillClipLoss) and
clipa_torch/training/train.py:206-213 (teacher forward under no_grad, loss
terms summed), main.py:221-257 (teacher construction, frozen params).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clipa_tpu import losses


def _embeddings(b=16, c=8, seed=0):
    rng = np.random.RandomState(seed)
    z = rng.randn(b, c).astype(np.float32)
    return z / np.linalg.norm(z, axis=1, keepdims=True)


def _naive_distill(zimg, ztxt, t, t_zimg, t_ztxt, t_t):
    def log_softmax(x):
        x = x - x.max(axis=1, keepdims=True)
        return x - np.log(np.exp(x).sum(axis=1, keepdims=True))

    li = zimg @ ztxt.T * t
    lt = li.T
    dli = t_zimg @ t_ztxt.T * t_t
    dlt = dli.T
    contrastive = -0.5 * (np.diag(log_softmax(li))
                          + np.diag(log_softmax(lt))).mean()

    def soft_ce(tl, sl):
        p = np.exp(log_softmax(tl))
        return (-(p * log_softmax(sl)).sum(axis=1)).mean()

    distill = 0.5 * (soft_ce(dli, li) + soft_ce(dlt, lt))
    return contrastive, distill


def test_distill_loss_matches_naive():
    zimg, ztxt = _embeddings(seed=0), _embeddings(seed=1)
    t_zimg, t_ztxt = _embeddings(seed=2), _embeddings(seed=3)
    t, t_t = 10.0, 50.0
    total, extras = losses.distill_contrastive_loss(
        jnp.asarray(zimg), jnp.asarray(ztxt), jnp.asarray(t),
        jnp.asarray(t_zimg), jnp.asarray(t_ztxt), jnp.asarray(t_t))
    contrastive, distill = _naive_distill(zimg, ztxt, t, t_zimg, t_ztxt, t_t)
    np.testing.assert_allclose(extras["contrastive_loss"], contrastive,
                               rtol=1e-5)
    np.testing.assert_allclose(extras["distill_loss"], distill, rtol=1e-5)
    np.testing.assert_allclose(total, contrastive + distill, rtol=1e-5)


def test_distill_teacher_receives_no_gradient():
    zimg, ztxt = _embeddings(seed=0), _embeddings(seed=1)
    t_zimg, t_ztxt = _embeddings(seed=2), _embeddings(seed=3)

    def f(t_zimg, t_ztxt, t_t):
        l, _ = losses.distill_contrastive_loss(
            jnp.asarray(zimg), jnp.asarray(ztxt), jnp.asarray(8.0),
            t_zimg, t_ztxt, t_t)
        return l

    grads = jax.grad(f, argnums=(0, 1, 2))(
        jnp.asarray(t_zimg), jnp.asarray(t_ztxt), jnp.asarray(30.0))
    for g in grads:
        np.testing.assert_allclose(np.asarray(g), 0.0)


def test_distill_minimized_when_student_matches_teacher():
    # KL(teacher || student) term: soft-CE is minimized (equals the teacher
    # entropy) when the student's logits induce the same distribution.
    z = _embeddings(seed=4)
    w = _embeddings(seed=5)
    t = 12.0
    _, extras_same = losses.distill_contrastive_loss(
        jnp.asarray(z), jnp.asarray(w), jnp.asarray(t),
        jnp.asarray(z), jnp.asarray(w), jnp.asarray(t))
    _, extras_diff = losses.distill_contrastive_loss(
        jnp.asarray(_embeddings(seed=6)), jnp.asarray(_embeddings(seed=7)),
        jnp.asarray(t),
        jnp.asarray(z), jnp.asarray(w), jnp.asarray(t))
    assert float(extras_same["distill_loss"]) < \
        float(extras_diff["distill_loss"])


@pytest.fixture(scope="module")
def tiny_setup():
    from clipa_tpu import optim
    from clipa_tpu.config import load_config
    from clipa_tpu.models import two_towers
    from clipa_tpu.parallel import create_mesh
    from clipa_tpu.train import step as step_lib

    mesh = create_mesh(fsdp=1)
    config = load_config("clipa_tpu/configs/smoke.py:steps=6,batch=16")
    model = two_towers.Model(**dict(config.model))
    tx, _ = optim.make(config, jax.eval_shape(
        lambda r: model.init({"params": r},
                             jnp.zeros((1, 32, 32, 3)),
                             jnp.zeros((1, 8), jnp.int32),
                             train=False)["params"],
        jax.random.PRNGKey(0)), sched_kw=dict(total_steps=6))
    return config, model, tx, mesh


def test_update_fn_with_teacher(tiny_setup):
    from clipa_tpu.train import step as step_lib

    config, model, tx, mesh = tiny_setup
    state = step_lib.init_train_state(model, tx, config, mesh,
                                      jax.random.PRNGKey(0))
    teacher_params = step_lib.init_model_params(
        model, config.init_shapes, mesh, jax.random.PRNGKey(7))
    update = step_lib.make_update_fn(model, tx, config, mesh,
                                     teacher_model=model)

    rng = np.random.RandomState(0)
    batch = {
        "image": jnp.asarray(
            rng.randint(0, 255, (16, 32, 32, 3), dtype=np.uint8)),
        "labels": jnp.asarray(rng.randint(5, 17, (16, 8), dtype=np.int32)),
    }
    meas = None
    for _ in range(3):
        state, meas = update(state, batch, teacher_params)
    assert "distill_loss" in meas and "contrastive_loss" in meas
    assert np.isfinite(float(meas["training_loss"]))
    assert float(meas["distill_loss"]) > 0.0
    # The student total includes both terms.
    np.testing.assert_allclose(
        float(meas["training_loss"]),
        float(meas["contrastive_loss"]) + float(meas["distill_loss"]),
        rtol=1e-5)


def test_distill_guards(tiny_setup):
    from clipa_tpu.train import step as step_lib

    config, model, tx, mesh = tiny_setup
    bad = config.copy()
    bad.loss = "sigmoid"
    with pytest.raises(ValueError, match="softmax"):
        step_lib.make_update_fn(model, tx, bad, mesh, teacher_model=model)
    bad2 = config.copy()
    bad2.grad_accum_steps = 2
    with pytest.raises(ValueError, match="grad_accum"):
        step_lib.make_update_fn(model, tx, bad2, mesh, teacher_model=model)


def test_train_loop_with_distill(tmp_path):
    """config.distill drives the full trainer: frozen random teacher."""
    from clipa_tpu.config import ConfigDict, load_config
    from clipa_tpu.train import loop

    config = load_config("clipa_tpu/configs/smoke.py:steps=4,batch=16")
    config.save_ckpt = False
    config.distill = ConfigDict(
        model_name="two_towers",
        model=config.model.copy(),
        seed=3,
    )
    state = loop.train(config, str(tmp_path / "run"))
    assert int(state["step"]) == 4
