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
    return two_towers.Model(
        image={"variant": "Ti/16", "pool_type": "tok", "posemb": "sincos2d"},
        text={"variant": "Ti", "pool_type": "last", "vocab_size": 128},
        out_dim=(64, 64), temperature_init=1 / 0.07)


def _batch(b=16, res=32, tokens=8, seed=0):
    rng = np.random.RandomState(seed)
    return {
        "image": rng.randint(0, 255, (b, res, res, 3), dtype=np.uint8),
        "labels": rng.randint(0, 128, (b, tokens)).astype(np.int32),
    }


def test_mesh_shapes():
    mesh = create_mesh(fsdp=1)
    assert mesh.shape["data"] == 8 and mesh.shape["fsdp"] == 1
    mesh2 = create_mesh(fsdp=2)
    assert mesh2.shape["data"] == 4 and mesh2.shape["fsdp"] == 2


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


def test_grad_accumulation_matches_big_batch(mesh8):
    """accum=2 over microbatch negatives == two separate small steps'
    gradient average; sanity: runs, finite, and differs from accum=1 only
    via the negatives set (per reference semantics)."""
    model = _tiny_model()
    base = _tiny_config()
    batch = local_batch_to_global(_batch(16), mesh8)

    cfgs = [_tiny_config(), _tiny_config(grad_accum_steps=2)]
    losses = []
    for config in cfgs:
        tx, _ = optim.make(config, _abstract_params(model, config),
                           sched_kw=dict(total_steps=10))
        state = step_lib.init_train_state(model, tx, config, mesh8,
                                          jax.random.PRNGKey(0))
        update = step_lib.make_update_fn(model, tx, config, mesh8)
        state, meas = update(state, batch)
        losses.append(float(meas["training_loss"]))
    assert all(np.isfinite(losses))
    # microbatch negatives (8) vs full batch (16): loss upper bound ln(B)
    assert losses[1] <= losses[0] + 0.1


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
