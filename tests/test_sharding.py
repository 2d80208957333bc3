"""SPMD: mesh construction, fsdp shardings, train step on 8 virtual devices."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clipa_tpu import optim
from clipa_tpu.config import ConfigDict
from clipa_tpu.models import two_towers
from clipa_tpu.parallel import (batch_sharding, create_mesh, fsdp_shardings,
                                local_batch_to_global, replicated_sharding)
from clipa_tpu.train import step as step_lib


def _tiny_config(**kw):
    c = ConfigDict(
        lr=1e-3, wd=1e-4, optax_name="scale_by_adam", optax=dict(),
        schedule=[(".*", dict(decay_type="cosine", warmup_steps=2))],
        init_shapes=[(1, 32, 32, 3), (1, 8)],
        mask_ratio=0.0, cpu_unit8=True,
    )
    c.update(kw)
    return c


def _tiny_model():
    # depth-2 towers: explicit kwargs override the Ti variant table —
    # the SPMD/sharding semantics under test are depth-independent, and
    # the CPU mesh serializes device programs (wall-time ~ depth).
    return two_towers.Model(
        image={"variant": "Ti/16", "pool_type": "tok", "posemb": "sincos2d",
               "depth": 2, "mlp_dim": 384},
        text={"variant": "Ti", "pool_type": "last", "vocab_size": 128,
              "depth": 2, "mlp_dim": 384},
        out_dim=(64, 64), temperature_init=1 / 0.07)


def _batch(b=16, res=32, tokens=8, seed=0):
    rng = np.random.RandomState(seed)
    return {
        "image": rng.randint(0, 255, (b, res, res, 3), dtype=np.uint8),
        "labels": rng.randint(0, 128, (b, tokens)).astype(np.int32),
    }


def test_mesh_shapes():
    n = jax.device_count()
    mesh = create_mesh(fsdp=1)
    assert mesh.shape["data"] == n and mesh.shape["fsdp"] == 1
    mesh2 = create_mesh(fsdp=2)
    assert mesh2.shape["data"] == n // 2 and mesh2.shape["fsdp"] == 2


def test_fsdp_shardings_shard_large_params(mesh_4x2):
    params = {"big": jnp.zeros((1024, 1024)), "small": jnp.zeros((4,))}
    sh = fsdp_shardings(params, mesh_4x2, min_size_to_shard=2 ** 10)
    assert sh["big"].spec != jax.sharding.PartitionSpec()
    assert sh["small"].spec == jax.sharding.PartitionSpec()


def test_local_batch_to_global(mesh8):
    batch = _batch(b=16)
    global_batch = local_batch_to_global(batch, mesh8)
    assert global_batch["image"].shape == (16, 32, 32, 3)
    assert global_batch["image"].sharding.spec == \
        jax.sharding.PartitionSpec(("data", "fsdp"))


@pytest.mark.parametrize("loss", ["softmax", "chunked", "sigmoid"])
def test_train_step_runs_and_descends(mesh8, loss):
    model = _tiny_model()
    config = _tiny_config(loss=loss, loss_chunk_size=8)
    tx, _ = optim.make(config, _abstract_params(model, config),
                       sched_kw=dict(total_steps=10))
    state = step_lib.init_train_state(model, tx, config, mesh8,
                                      jax.random.PRNGKey(0))
    update = step_lib.make_update_fn(model, tx, config, mesh8)

    losses = []
    batch = local_batch_to_global(_batch(16), mesh8)
    for i in range(3):
        state, meas = update(state, batch)
        losses.append(float(meas["training_loss"]))
    assert np.isfinite(losses).all()
    # same batch re-fed: loss must drop
    assert losses[-1] < losses[0]
    assert int(state["step"]) == 3


def _abstract_params(model, config):
    def init(rng):
        return model.init({"params": rng},
                          jnp.zeros(tuple(config.init_shapes[0])),
                          jnp.zeros(tuple(config.init_shapes[1]), jnp.int32),
                          train=False)["params"]
    return jax.eval_shape(init, jax.random.PRNGKey(0))


def test_train_step_with_masking(mesh8):
    model = _tiny_model()
    config = _tiny_config(mask_ratio=0.5)
    tx, _ = optim.make(config, _abstract_params(model, config),
                       sched_kw=dict(total_steps=10))
    state = step_lib.init_train_state(model, tx, config, mesh8,
                                      jax.random.PRNGKey(0))
    update = step_lib.make_update_fn(model, tx, config, mesh8)
    batch = local_batch_to_global(_batch(16), mesh8)
    state, meas = update(state, batch)
    assert np.isfinite(float(meas["training_loss"]))


def test_fsdp_train_step(mesh_4x2):
    model = _tiny_model()
    config = _tiny_config()
    tx, _ = optim.make(config, _abstract_params(model, config),
                       sched_kw=dict(total_steps=10))
    state = step_lib.init_train_state(model, tx, config, mesh_4x2,
                                      jax.random.PRNGKey(0))
    update = step_lib.make_update_fn(model, tx, config, mesh_4x2)
    batch = local_batch_to_global(_batch(16), mesh_4x2)
    state, meas = update(state, batch)
    assert np.isfinite(float(meas["training_loss"]))


def test_device_count_invariance():
    """Same data, same seed: 1-device and 8-device losses must agree."""
    model = _tiny_model()
    config = _tiny_config()
    batch_np = _batch(16)

    results = []
    for devices in ([jax.devices()[0]], jax.devices()):
        mesh = create_mesh(fsdp=1, devices=devices)
        tx, _ = optim.make(config, _abstract_params(model, config),
                           sched_kw=dict(total_steps=10))
        state = step_lib.init_train_state(model, tx, config, mesh,
                                          jax.random.PRNGKey(0))
        update = step_lib.make_update_fn(model, tx, config, mesh)
        batch = local_batch_to_global(batch_np, mesh)
        _, meas = update(state, batch)
        results.append(float(meas["training_loss"]))
    np.testing.assert_allclose(results[0], results[1], rtol=1e-4)


def test_grad_accumulation_equals_full_batch(mesh8):
    """Two-pass cached-feature accumulation must reproduce the single-pass
    FULL-batch loss and gradients exactly (the reference's accum_freq
    semantics, clipa_torch/training/train.py:217-256): accum=2 with an SGD
    step equals accum=1 on every parameter except the temperature `t`,
    whose gradient sums once per pass (accum x, matching the reference)."""
    import optax

    model = _tiny_model()
    batch = local_batch_to_global(_batch(16), mesh8)
    tx = optax.sgd(0.1)

    updated, losses = [], []
    for accum in (1, 2):
        config = _tiny_config(grad_accum_steps=accum)
        state = step_lib.init_train_state(model, tx, config, mesh8,
                                          jax.random.PRNGKey(0))
        update = step_lib.make_update_fn(model, tx, config, mesh8)
        state, meas = update(state, batch)
        updated.append(jax.device_get(state["params"]))
        losses.append(float(meas["training_loss"]))

    # identical full-batch loss
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-5)
    flat1 = dict(_flatten(updated[0]))
    flat2 = dict(_flatten(updated[1]))
    for k in flat1:
        if k == "t":
            continue
        np.testing.assert_allclose(flat1[k], flat2[k], atol=1e-5,
                                   err_msg=k)
    # t's gradient accumulates once per pass: update is exactly accum x.
    init = step_lib.init_train_state(model, tx, _tiny_config(), mesh8,
                                     jax.random.PRNGKey(0))
    t0 = float(jax.device_get(init["params"]["t"])[0])
    dt1 = float(flat1["t"][0]) - t0
    dt2 = float(flat2["t"][0]) - t0
    np.testing.assert_allclose(dt2, 2 * dt1, rtol=1e-4)


def _flatten(tree):
    from clipa_tpu import utils as u
    return u.tree_flatten_with_names(tree)[0]


def test_chunked_loss_equals_softmax_in_step(mesh8):
    """Full jitted step: 'chunked' and 'softmax' losses agree exactly."""
    model = _tiny_model()
    batch = local_batch_to_global(_batch(16), mesh8)
    losses = {}
    for kind in ("softmax", "chunked"):
        config = _tiny_config(loss=kind, loss_chunk_size=4)
        tx, _ = optim.make(config, _abstract_params(model, config),
                           sched_kw=dict(total_steps=10))
        state = step_lib.init_train_state(model, tx, config, mesh8,
                                          jax.random.PRNGKey(0))
        update = step_lib.make_update_fn(model, tx, config, mesh8)
        _, meas = update(state, batch)
        losses[kind] = float(meas["training_loss"])
    np.testing.assert_allclose(losses["chunked"], losses["softmax"],
                               rtol=1e-5)


def test_ring_infonce_equals_global(mesh8):
    """Ring-permuted InfoNCE (shard_map + ppermute) must equal the global
    bidirectional loss — values AND gradients — on the virtual mesh."""
    from clipa_tpu import losses as losses_lib
    from clipa_tpu.ops import ring_infonce
    from clipa_tpu.parallel import batch_sharding

    rng = np.random.RandomState(0)
    b, d = 32, 16
    zi = rng.randn(b, d).astype(np.float32)
    zt = rng.randn(b, d).astype(np.float32)
    zi /= np.linalg.norm(zi, axis=-1, keepdims=True)
    zt /= np.linalg.norm(zt, axis=-1, keepdims=True)
    t = np.asarray([1 / 0.07], np.float32)

    sh = batch_sharding(mesh8)
    zi_d = jax.device_put(jnp.asarray(zi), sh)
    zt_d = jax.device_put(jnp.asarray(zt), sh)

    def ring(zi, zt, t):
        l, ex = ring_infonce.ring_contrastive_loss(zi, zt, t, mesh8)
        return l, ex

    def ref(zi, zt, t):
        l, ex = losses_lib.bidirectional_contrastive_loss(
            zi, zt, t, reduction=True)
        return l, ex

    (l_ring, ex_ring) = jax.jit(ring)(zi_d, zt_d, jnp.asarray(t))
    (l_ref, ex_ref) = jax.jit(ref)(jnp.asarray(zi), jnp.asarray(zt),
                                   jnp.asarray(t))
    np.testing.assert_allclose(float(l_ring), float(l_ref), rtol=2e-6)
    np.testing.assert_allclose(float(ex_ring["ncorrect"]),
                               float(ex_ref["ncorrect"]), atol=1e-6)

    g_ring = jax.jit(jax.grad(lambda *a: ring(*a)[0], argnums=(0, 1, 2)))(
        zi_d, zt_d, jnp.asarray(t))
    g_ref = jax.jit(jax.grad(lambda *a: ref(*a)[0], argnums=(0, 1, 2)))(
        jnp.asarray(zi), jnp.asarray(zt), jnp.asarray(t))
    for a, b_ in zip(g_ring, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-5, atol=2e-6)


def test_ring_sigmoid_equals_global(mesh8):
    """Ring-permuted sigmoid loss (SigLIP's pod algorithm) must equal the
    global pairwise sigmoid loss — values AND gradients — on the mesh."""
    from clipa_tpu import losses as losses_lib
    from clipa_tpu.ops import ring_infonce
    from clipa_tpu.parallel import batch_sharding

    rng = np.random.RandomState(4)
    b, d = 32, 16
    zi = rng.randn(b, d).astype(np.float32)
    zt = rng.randn(b, d).astype(np.float32)
    zi /= np.linalg.norm(zi, axis=-1, keepdims=True)
    zt /= np.linalg.norm(zt, axis=-1, keepdims=True)
    t = np.asarray([1 / 0.07], np.float32)

    sh = batch_sharding(mesh8)
    zi_d = jax.device_put(jnp.asarray(zi), sh)
    zt_d = jax.device_put(jnp.asarray(zt), sh)

    def ring(zi, zt, t):
        return ring_infonce.ring_sigmoid_contrastive_loss(
            zi, zt, t, mesh8, bias=-10.0)[0]

    def ref(zi, zt, t):
        return losses_lib.sigmoid_contrastive_loss(
            zi, zt, t, bias=-10.0, reduction=True)[0]

    l_ring = jax.jit(ring)(zi_d, zt_d, jnp.asarray(t))
    l_ref = jax.jit(ref)(jnp.asarray(zi), jnp.asarray(zt), jnp.asarray(t))
    np.testing.assert_allclose(float(l_ring), float(l_ref), rtol=2e-6)

    g_ring = jax.jit(jax.grad(ring, argnums=(0, 1, 2)))(
        zi_d, zt_d, jnp.asarray(t))
    g_ref = jax.jit(jax.grad(ref, argnums=(0, 1, 2)))(
        jnp.asarray(zi), jnp.asarray(zt), jnp.asarray(t))
    for a, b_ in zip(g_ring, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-5, atol=2e-6)


def test_siglip_bias_param_in_step(mesh8):
    """bias_init adds the SigLIP scalar logit bias 'b'; the sigmoid step
    consumes it (init loss drops from ~b_global*softplus scale to near the
    SigLIP paper's calibrated start), and it trains (bias gets a grad)."""
    model = two_towers.Model(
        image={"variant": "Ti/16", "pool_type": "tok", "posemb": "sincos2d",
               "depth": 2, "mlp_dim": 384},
        text={"variant": "Ti", "pool_type": "last", "vocab_size": 128,
              "depth": 2, "mlp_dim": 384},
        out_dim=(64, 64), temperature_init=1 / 0.07, bias_init=-10.0)
    batch = local_batch_to_global(_batch(16), mesh8)
    losses = {}
    for kind in ("sigmoid", "ring_sigmoid"):
        config = _tiny_config(loss=kind)
        tx, _ = optim.make(config, _abstract_params(model, config),
                           sched_kw=dict(total_steps=10))
        state = step_lib.init_train_state(model, tx, config, mesh8,
                                          jax.random.PRNGKey(0))
        assert "b" in state["params"]
        assert float(state["params"]["b"][0]) == -10.0
        update = step_lib.make_update_fn(model, tx, config, mesh8)
        new_state, meas = update(state, batch)
        losses[kind] = float(meas["training_loss"])
        # the bias participates in the loss -> it moves once lr warms up
        # (step 1 has lr ~= 0 under the 2-step warmup)
        for _ in range(2):
            new_state, _ = update(new_state, batch)
        assert float(new_state["params"]["b"][0]) != -10.0
    np.testing.assert_allclose(losses["ring_sigmoid"], losses["sigmoid"],
                               rtol=1e-5)
    # With b=-10 every pair starts confidently negative: per-row loss ~
    # softplus(10)*1 positive + ~0 negatives, far below the biasless start.
    assert losses["sigmoid"] < 15.0


def test_ring_loss_in_step(mesh8):
    """loss='ring' trains end-to-end and matches the softmax step loss;
    loss='ring_sigmoid' matches the global sigmoid step loss."""
    model = _tiny_model()
    batch = local_batch_to_global(_batch(16), mesh8)
    losses = {}
    for kind in ("softmax", "ring", "sigmoid", "ring_sigmoid"):
        config = _tiny_config(loss=kind)
        tx, _ = optim.make(config, _abstract_params(model, config),
                           sched_kw=dict(total_steps=10))
        state = step_lib.init_train_state(model, tx, config, mesh8,
                                          jax.random.PRNGKey(0))
        update = step_lib.make_update_fn(model, tx, config, mesh8)
        _, meas = update(state, batch)
        losses[kind] = float(meas["training_loss"])
    np.testing.assert_allclose(losses["ring"], losses["softmax"], rtol=1e-5)
    np.testing.assert_allclose(losses["ring_sigmoid"], losses["sigmoid"],
                               rtol=1e-5)


def test_temperature_clamp(mesh8):
    """config.temperature_clamp mirrors the torch trainer's ln(100) clamp
    (clipa_torch/training/train.py:284-286). temperature_init 1/0.007 puts
    log-t ~ 4.96 > ln(100) ~ 4.605, so the very first step must clamp."""
    model = two_towers.Model(
        image={"variant": "Ti/16", "pool_type": "tok", "posemb": "sincos2d",
               "depth": 2, "mlp_dim": 384},
        text={"variant": "Ti", "pool_type": "last", "vocab_size": 128,
              "depth": 2, "mlp_dim": 384},
        out_dim=(64, 64), temperature_init=1 / 0.007)
    config = _tiny_config(temperature_clamp=True)
    tx, _ = optim.make(config, _abstract_params(model, config),
                       sched_kw=dict(total_steps=10))
    state = step_lib.init_train_state(model, tx, config, mesh8,
                                      jax.random.PRNGKey(0))
    assert float(state["params"]["t"][0]) > np.log(100.0)
    update = step_lib.make_update_fn(model, tx, config, mesh8)
    state, _ = update(state, local_batch_to_global(_batch(16), mesh8))
    assert float(state["params"]["t"][0]) <= np.log(100.0) + 1e-6


def test_norm_metrics_log_matches_always(mesh8):
    """'log' gating reports the SAME l2 values as the reference-style
    'always' mode on logged steps and zeros elsewhere — and does so via
    ungated per-leaf squared sums (no lax.cond over whole trees, which
    would pin grads+params+updates simultaneously live in HBM)."""
    batch_np = _batch(16)
    results = {}
    for mode in ("always", "log"):
        model = _tiny_model()
        config = _tiny_config(norm_metrics=mode, log_training_steps=5)
        tx, _ = optim.make(config, _abstract_params(model, config),
                           sched_kw=dict(total_steps=10))
        state = step_lib.init_train_state(model, tx, config, mesh8,
                                          jax.random.PRNGKey(0))
        update = step_lib.make_update_fn(model, tx, config, mesh8)
        batch = local_batch_to_global(batch_np, mesh8)
        meas = []
        for _ in range(2):
            state, m = update(state, batch)
            meas.append({k: float(m[k]) for k in
                         ("l2_grads", "l2_params", "l2_updates",
                          "training_loss")})
        results[mode] = meas

    # step 1 is a logged step (first): values agree across modes.
    # (l2_updates is legitimately 0.0 there — warmup step has lr=0 —
    # so positivity is only asserted for grads/params.)
    for key in ("l2_grads", "l2_params", "l2_updates"):
        np.testing.assert_allclose(results["log"][0][key],
                                   results["always"][0][key],
                                   rtol=1e-5)
        # step 2 is unlogged under log_steps=5: gated mode reports zeros,
        # always mode keeps reporting real norms
        assert results["log"][1][key] == 0.0
        assert results["always"][1][key] > 0.0
    for key in ("l2_grads", "l2_params"):
        assert results["log"][0][key] > 0.0
