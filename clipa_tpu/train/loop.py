"""The trainer: config -> data -> SPMD train loop -> checkpoints -> evals.

Orchestration-parity with the reference entry point (clipa_jax/main.py:83-584)
on the jit+Mesh runtime:

  * init priority: existing workdir checkpoint > config.resume >
    config.model_init (per-tower npz + dont_load) > config.masked_init
    (cross-resolution merge) > scratch (main.py:404-443),
  * duration configs in steps/examples/epochs units,
  * Chrono/metrics with reference metric names, NaN hard-abort
    (main.py:505-508), periodic checkpoint + evaluators via `itstime`,
  * Orbax sharded checkpoints for resume + flat-npz export of params for
    parity with released CLIPA weights,
  * real profiler traces (the reference stubbed these out).

CLI: python -m clipa_tpu.train --config=configs/clipa/b16.py:res=84 \
    --workdir=/tmp/run [--config.input.batch_size=256 ...]
"""

from __future__ import annotations

import math
import os
from typing import Any, Optional

import jax
import jax.numpy as jnp

from clipa_tpu import optim as optim_lib
from clipa_tpu import pathio
from clipa_tpu import registry
from clipa_tpu import utils as u
from clipa_tpu.config import ConfigDict, steps as steps_cfg
from clipa_tpu.data import core as data_core
from clipa_tpu.data import pipeline as pipeline_lib
from clipa_tpu.models import get_model_module
from clipa_tpu.parallel import create_mesh
from clipa_tpu.train import checkpoint as ckpt_lib
from clipa_tpu.train import metrics as metrics_lib
from clipa_tpu.train import step as step_lib


def train(config: ConfigDict, workdir: Optional[str] = None) -> dict:
    """Runs the full training job; returns the final train state (host)."""
    write_note = print if jax.process_index() == 0 else (lambda *_: None)

    # A remote workdir (gs://, s3://, file://) is staged on local disk and
    # mirrored: pull-down before resume (rule-1, clipa_jax/main.py:404-414),
    # push during/after training. Orbax writes, JSONL appends and profiler
    # traces all run against the local stage.
    remote_workdir = None
    if workdir and pathio.is_remote(workdir):
        from clipa_tpu.train import remote_sync as sync_lib
        remote_workdir = workdir
        workdir = pathio.stage_dir_for(remote_workdir,
                                       config.get("local_stage_dir"))
        os.makedirs(workdir, exist_ok=True)
        write_note(f"Remote workdir {remote_workdir} staged at {workdir}")
        if not sync_lib.pull(remote_workdir, workdir):
            raise RuntimeError(
                f"Failed to pull remote workdir {remote_workdir}; refusing "
                "to train (a fresh start would silently discard the run's "
                "checkpoints on the next push).")

    mesh = create_mesh(fsdp=int(config.get("fsdp", 1)))
    batch_size = config.input.batch_size
    if batch_size % jax.device_count():
        raise ValueError(f"batch_size {batch_size} must divide device count "
                         f"{jax.device_count()}")

    # ----- data -------------------------------------------------------------
    source = data_core.get_source(**dict(config.input.data))
    ntrain = source.total_examples()
    pp_fn = registry.get_preprocess_fn(config.input.pp)
    batch_fn = None
    if config.input.get("mixup"):
        # Every loss this trainer supports is contrastive; mixing images
        # while captions stay unmixed silently corrupts the InfoNCE pairing
        # (see pp/augment.py docstring). Mixup is for one-hot-label
        # objectives — use make_mixup_fn directly in a custom loop.
        raise ValueError(
            "config.input.mixup is incompatible with contrastive losses "
            f"(loss={config.get('loss', 'softmax')!r}): images would be "
            "mixed while captions stay unmixed. Remove config.input.mixup.")
    batches = pipeline_lib.make_for_train(
        source, pp_fn, batch_size,
        shuffle_buffer=config.input.get("shuffle_buffer_size", 50_000),
        seed=config.get("seed", 0),
        num_workers=config.input.get("num_workers", 8),
        worker_processes=config.input.get("worker_processes", 0),
        pp_str=config.input.pp,
        batch_fn=batch_fn)
    train_iter = pipeline_lib.start_input_pipeline(
        batches, mesh, n_prefetch=config.get("prefetch_to_device", 2))

    total_steps = steps_cfg("total", config, ntrain, batch_size)
    write_note(f"Training for {total_steps} steps "
               f"({ntrain} examples, global batch {batch_size})")

    if config.get_path("wandb.debug_data"):
        # pipeline inspection mode: print batch shapes, never train
        # (reference: clipa_jax/main.py:185-200).
        for i, batch in enumerate(train_iter):
            shapes = jax.tree_util.tree_map(
                lambda x: (x.shape, str(x.dtype)), batch)
            write_note(f"batch {i}: {shapes}")
            if i >= 4:
                return {}

    # ----- model / optimizer / state ----------------------------------------
    model_mod = get_model_module(config.get("model_name", "two_towers"))
    model = model_mod.Model(**dict(config.model))

    def abstract_init():
        img_shape = tuple(config.init_shapes[0])
        txt_shape = tuple(config.init_shapes[1])
        return jax.eval_shape(
            lambda r: model.init({"params": r},
                                 jnp.zeros(img_shape, jnp.float32),
                                 jnp.zeros(txt_shape, jnp.int32),
                                 train=False)["params"],
            jax.random.PRNGKey(0))

    tx, sched_fns = optim_lib.make(
        config, abstract_init(),
        sched_kw=dict(total_steps=total_steps, batch_size=batch_size,
                      data_size=ntrain))

    rng = jax.random.PRNGKey(config.get("seed", 0))
    state = step_lib.init_train_state(model, tx, config, mesh, rng)
    n_params = sum(x.size for x in jax.tree_util.tree_leaves(state["params"]))
    write_note(f"Model has {n_params / 1e6:.1f}M params")

    # Optional frozen distillation teacher (reference --distill-model /
    # --distill-pretrained, clipa_torch/training/main.py:221-257): a second
    # two-tower whose soft logits supervise the student. Params are mesh-
    # placed like the student's but never updated (and never donated).
    teacher_model, teacher_params = None, None
    if config.get("distill"):
        dcfg = config.distill
        teacher_mod = get_model_module(dcfg.get("model_name", "two_towers"))
        teacher_model = teacher_mod.Model(**dict(dcfg.model))
        t_rng = jax.random.PRNGKey(dcfg.get("seed", 0))
        # Same input shapes as the student: the reference assumes the
        # teacher shares tokenizer & transforms (main.py:253 FIXME).
        t_state = step_lib.init_model_params(
            teacher_model, config.init_shapes, mesh, t_rng)
        if dcfg.get("model_init"):
            write_note(f"Loading distillation teacher from "
                       f"{dcfg.model_init}...")
            t_host = teacher_mod.load(jax.device_get(t_state), dcfg.model_init,
                                      dcfg.model,
                                      **dict(dcfg.get("model_load", {})))
            t_state = _place_like(t_host, t_state)
        teacher_params = t_state

    update_fn = step_lib.make_update_fn(model, tx, config, mesh,
                                        total_steps=total_steps,
                                        teacher_model=teacher_model)
    predict_fn = step_lib.make_predict_fn(
        model, normalize=bool(config.get("cpu_unit8", True)))

    # ----- metrics / chrono ---------------------------------------------------
    wandb_run = None
    if config.get_path("wandb.log_wandb") and jax.process_index() == 0:
        try:
            import wandb
            wandb_run = wandb.init(
                project=config.get_path("wandb.project", "clipa_tpu"),
                name=config.get_path("wandb.experiment"),
                entity=config.get_path("wandb.entity"),
                mode=("offline" if config.get_path("wandb.wandb_offline")
                      else "online"),
                config=dict(config))
        except Exception as e:  # wandb absent/offline: JSONL still records
            write_note(f"wandb disabled: {e}")
    metric = metrics_lib.MetricWriter(workdir, wandb_run=wandb_run)
    metric.write_config(config)
    chrono = metrics_lib.Chrono()

    # workdir -> remote storage mirroring on the lead process
    # (reference: training/main.py:182-197 + file_utils.py:44-67)
    syncer = None
    if workdir and (config.get("remote_sync") or remote_workdir) and \
            jax.process_index() == 0:
        from clipa_tpu.train import remote_sync as sync_lib
        rs = config.get("remote_sync") or remote_workdir
        rs = dict(rs) if not isinstance(rs, str) else {"path": rs}
        syncer = sync_lib.SyncThread(
            workdir, rs["path"],
            every_seconds=float(rs.get("every_seconds", 300))).start()
    profiler = metrics_lib.Profiler(
        workdir, start_step=config.get("profile_at_step", 10))

    # ----- init / resume -----------------------------------------------------
    manager = None
    first_step = 0
    if workdir and config.get("save_ckpt", True):
        manager = ckpt_lib.CheckpointManager(
            os.path.join(workdir, "checkpoints"),
            max_to_keep=config.get("keep_ckpts", 3))

    resume_step = manager.latest_step() if manager else None
    if resume_step is not None:
        write_note(f"Resuming from checkpoint step {resume_step}...")
        template = jax.tree_util.tree_map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype,
                                           sharding=getattr(x, "sharding",
                                                            None))
            if hasattr(x, "shape") else x,
            {"state": state, "chrono": chrono.save()})
        restored = manager.restore(template, step=resume_step)
        state = restored["state"]
        chrono.load(restored["chrono"])
        first_step = int(jax.device_get(state["step"]))
    elif config.get("resume"):
        write_note(f"Resuming from {config.resume}...")
        host_state = ckpt_lib.load_checkpoint(None, config.resume)
        state = _place_like(host_state["state"], state)
        if "chrono" in host_state:
            chrono.load(host_state["chrono"])
        first_step = int(jax.device_get(state["step"]))
    elif config.get("model_init"):
        write_note(f"Initializing towers from {config.model_init}...")
        params_host = jax.device_get(state["params"])
        params_host = model_mod.load(params_host, config.model_init,
                                     config.model,
                                     **dict(config.get("model_load", {})))
        state["params"] = _place_like(params_host, state["params"])
    elif config.get("masked_init"):
        write_note(f"Masked-init (cross-resolution) from "
                   f"{config.masked_init}...")
        from clipa_tpu.models.common import merge_params
        loaded = ckpt_lib.load_params(config.masked_init)
        params_host = merge_params(
            loaded, jax.device_get(state["params"]),
            **dict(config.get("masked_no_load", {"dont_load": []})))
        state["params"] = _place_like(params_host, state["params"])

    chrono.inform(first_step=first_step, total_steps=total_steps,
                  global_bs=batch_size,
                  steps_per_epoch=ntrain / batch_size)

    # ----- evaluators ---------------------------------------------------------
    evaluators_cache: list = []

    def evaluators():
        if not evaluators_cache and config.get("evals"):
            from clipa_tpu.evaluators import common as eval_common
            evaluators_cache.extend(eval_common.from_config(
                config, {"predict": predict_fn}, mesh=mesh,
                total_steps=total_steps))
        return evaluators_cache

    def run_evals(step: int, force: bool = False):
        for (name, evaluator, log_steps, prefix) in evaluators():
            if force or u.itstime(step, log_steps, total_steps,
                                  first=log_steps < total_steps):
                chrono.pause(wait_for=state["params"])
                write_note(f"Running evaluator {name} at step {step}...")
                for key, value in evaluator.run(state["params"]):
                    metric.measure(f"{prefix}{key}", value)
                chrono.resume()

    if config.get("eval_only"):
        metric.step_start(first_step)
        run_evals(first_step, force=True)
        metric.step_end()
        metric.close()
        return jax.device_get(state)

    # ----- train loop ---------------------------------------------------------
    log_steps = config.get("log_training_steps", 50)
    ckpt_steps = config.get("ckpt_steps", 1000)

    for step, batch in zip(range(first_step + 1, total_steps + 1),
                           train_iter):
        metric.step_start(step)
        profiler.maybe_start(step)
        with profiler.step_annotation(step):
            if teacher_model is not None:
                state, measurements = update_fn(state, batch, teacher_params)
            else:
                state, measurements = update_fn(state, batch)
        profiler.maybe_stop(step)

        if u.itstime(step, log_steps, total_steps, host=0):
            for name, value in measurements.items():
                metric.measure(name, value)
            for i, sched_fn in enumerate(sched_fns):
                metric.measure(f"global_schedule{i if i else ''}",
                               sched_fn(step - 1) * config.lr)
            chrono.tick(step, measure=metric.measure, write_note=write_note)
            loss = float(jax.device_get(measurements["training_loss"]))
            if not math.isfinite(loss):
                metric.close()
                raise RuntimeError(
                    f"Loss became {loss} at step {step}; aborting "
                    f"(reference behavior: clipa_jax/main.py:505-508)")

        if manager and u.itstime(step, ckpt_steps, total_steps, first=False):
            chrono.pause(wait_for=state["params"])
            manager.save(step, {"state": state, "chrono": chrono.save()})
            chrono.resume()

        run_evals(step)
        metric.step_end()

    if manager:
        manager.save(total_steps, {"state": state, "chrono": chrono.save()})
        manager.wait()
        manager.close()
    if workdir and config.get("export_npz", True) and \
            jax.process_index() == 0:
        ckpt_lib.save_checkpoint({"params": jax.device_get(state["params"])},
                                 os.path.join(workdir, "params.npz"))
    metric.close()
    if syncer:
        syncer.stop(final_sync=True)
    return jax.device_get(state)


def _place_like(host_tree: Any, placed_tree: Any) -> Any:
    """device_puts a host pytree with the shardings of an existing one."""
    return jax.tree_util.tree_map(
        lambda h, p: jax.device_put(jnp.asarray(h, p.dtype), p.sharding),
        host_tree, placed_tree)


def main(argv=None):
    import argparse
    from clipa_tpu.config import apply_overrides, load_config

    # Some TPU images pre-seed jax_platforms with the plugin name, which
    # silently overrides an explicit JAX_PLATFORMS=cpu (the documented way
    # to run the CLI off-TPU). Honor ONLY an explicit cpu request — never
    # re-apply a machine-wide plugin export over a caller's jax.config
    # choice. Same guard as __graft_entry__.py.
    env_platforms = (os.environ.get("JAX_PLATFORMS") or "").strip().lower()
    if env_platforms == "cpu" and jax.config.jax_platforms != "cpu":
        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            pass  # backend already initialized

    parser = argparse.ArgumentParser(description="CLIPA-TPU trainer")
    parser.add_argument("--config", required=True,
                        help="config file path[:arg_string]")
    parser.add_argument("--workdir", default=None)
    parser.add_argument("--no-distributed", action="store_true",
                        help="skip jax.distributed.initialize()")
    args, overrides = parser.parse_known_args(argv)

    # Multi-host bootstrap: on TPU pods the runtime provides coordinator
    # discovery; single-host runs proceed if initialization isn't possible.
    if not args.no_distributed:
        try:
            jax.distributed.initialize()
        except Exception:
            pass

    config = load_config(args.config)
    apply_overrides(config, overrides)
    train(config, args.workdir)


if __name__ == "__main__":
    main()
