"""The jitted SPMD training step.

One ``jax.jit`` program over a Mesh replaces the reference's
pmap(update_fn)+all_gather+pmean stack (clipa_jax/main.py:240-294):

  * the batch arrives sharded over ('data','fsdp'); params/opt are replicated
    (or fsdp-sharded) NamedSharding arrays,
  * the contrastive loss is written as global math — GSPMD partitions the
    B x B logit matmul into local-rows x global-columns per device, which is
    exactly the reference's `local_loss` memory profile without the
    axis_index bookkeeping,
  * gradient averaging is implicit: XLA inserts the reduce-scatter/all-reduce
    over ICI where the partitioned backward pass needs it,
  * params and optimizer state are donated — updates happen in place in HBM.

RNG note: under jit+GSPMD a single global key yields identical results at any
device count (the reference needed fold_in(axis_index) to decorrelate per-pmap
-shard randomness; we fold in only the step).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from clipa_tpu import losses as losses_lib
from clipa_tpu.ops import preprocess
from clipa_tpu.parallel import mesh as mesh_lib

Array = jax.Array


def _make_loss_dispatch(loss_kind: str, config, mesh) -> Callable:
    """One place that maps config.loss to the loss implementation.

    Returns apply_loss(zimg, ztxt, extras, teacher_out) -> (loss, extras
    dict); `teacher_out` is an optional (t_zimg, t_ztxt, t_t) triple that
    switches on soft-label distillation (reference DistillClipLoss)."""

    def apply_loss(zimg, ztxt, extras, teacher_out=None):
        if teacher_out is not None:
            return losses_lib.distill_contrastive_loss(
                zimg, ztxt, extras["t"], *teacher_out)
        if loss_kind == "coca":
            return losses_lib.coca_loss(
                zimg, ztxt, extras["t"], extras["logits"], extras["labels"],
                clip_loss_weight=float(
                    config.get("coca_contrastive_loss_weight", 1.0)),
                caption_loss_weight=float(
                    config.get("coca_caption_loss_weight", 2.0)),
                pad_id=int(config.get("pad_id", 0)))
        if loss_kind == "sigmoid":
            return losses_lib.sigmoid_contrastive_loss(
                zimg, ztxt, extras["t"],
                bias=extras.get("b", 0.0), reduction=True)
        if loss_kind == "chunked":
            from clipa_tpu.ops import infonce
            return infonce.chunked_contrastive_loss(
                zimg, ztxt, extras["t"],
                chunk_size=int(config.get("loss_chunk_size", 4096)))
        if loss_kind == "ring":
            from clipa_tpu.ops import ring_infonce
            return ring_infonce.ring_contrastive_loss(
                zimg, ztxt, extras["t"], mesh)
        if loss_kind == "ring_sigmoid":
            from clipa_tpu.ops import ring_infonce
            return ring_infonce.ring_sigmoid_contrastive_loss(
                zimg, ztxt, extras["t"], mesh, bias=extras.get("b", 0.0))
        return losses_lib.bidirectional_contrastive_loss(
            zimg, ztxt, extras["t"], reduction=True)

    return apply_loss


def make_update_fn(model, tx, config, mesh, total_steps: int = 0,
                   teacher_model=None) -> Callable:
    """Builds the donated, jitted update(train_state, batch) function.

    total_steps (when known) lets the gated norm metrics fire on the final
    step too, matching utils.itstime's `last` rule.

    With `teacher_model` set the update takes a third argument
    (teacher params, NOT donated) and trains against the reference's
    DistillClipLoss: contrastive + soft-label KL from the frozen teacher's
    logits (clipa_torch/training/train.py:206-213).
    """
    mask_ratio = float(config.get("mask_ratio", 0.0))
    # softmax|sigmoid|chunked|ring|ring_sigmoid
    loss_kind = config.get("loss", "softmax")
    normalize_on_device = bool(config.get("cpu_unit8", True))
    measure_block_norms = bool(config.get("log_block_norms", False))
    # The l2_{grads,params,updates} norms are only CONSUMED at the log
    # cadence (train/loop.py reads measurements under `itstime`). "log"
    # computes producer-fused per-leaf squared sums every step (free: XLA
    # folds each into the fusion that made the leaf) and gates only the
    # scalar sqrt, reporting zeros on unlogged steps; "always" restores the
    # reference's every-step global_norm behavior (clipa_jax/main.py:290-294
    # computed them in every pmap step because pmap could not gate);
    # "never" omits the keys.
    norm_metrics = config.get("norm_metrics", "log")  # log|always|never
    log_steps = int(config.get("log_training_steps", 50))
    batch_sharding = mesh_lib.batch_sharding(mesh)

    accum_steps = int(config.get("grad_accum_steps", 1))
    # True -> ln(100) (the CLIP-paper bound); a float sets the max directly.
    temperature_clamp = config.get("temperature_clamp", False)
    t_clamp_max = (float(np.log(100.0)) if temperature_clamp is True
                   else float(temperature_clamp or 0.0))
    apply_loss = _make_loss_dispatch(loss_kind, config, mesh)
    if teacher_model is not None:
        # Same restrictions as the reference trainer (train.py:222-225
        # FIXMEs): distillation composes with the plain global softmax
        # loss, not grad accumulation or the explicit-comm losses.
        if loss_kind != "softmax":
            raise ValueError(
                f"config.distill requires loss='softmax', got {loss_kind!r}")
        if accum_steps > 1:
            raise ValueError(
                "config.distill is incompatible with grad_accum_steps > 1 "
                "(reference limitation too, clipa_torch/training/main.py:222)")

    def update(train_state, batch, teacher_params=None):
        params, opt, rng, step = (train_state["params"], train_state["opt"],
                                  train_state["rng"], train_state["step"])
        images = batch["image"]
        labels = batch["labels"]
        images = jax.lax.with_sharding_constraint(images, batch_sharding)
        labels = jax.lax.with_sharding_constraint(labels, batch_sharding)

        if normalize_on_device and images.dtype == jnp.uint8:
            images = preprocess.normalize_uint8(images)

        rng_step = jax.random.fold_in(rng, step)

        teacher_out = None
        if teacher_model is not None:
            # Frozen teacher forward (reference: torch.no_grad() around
            # dist_model, train.py:206-208). Computed once outside the
            # grad trace; its own temperature scales its logits.
            t_zimg, t_ztxt, t_extras = teacher_model.apply(
                {"params": teacher_params}, images, labels, train=False)
            teacher_out = jax.lax.stop_gradient(
                (t_zimg, t_ztxt, t_extras["t"]))

        def loss_fn(params, images, labels, rng_local):
            zimg, ztxt, extras = model.apply(
                {"params": params}, images, labels, train=True,
                mask_ratio=mask_ratio,
                rngs={"dropout": rng_local, "drop_path": rng_local,
                      "random_mask": rng_local})
            zimg = jax.lax.with_sharding_constraint(zimg, batch_sharding)
            ztxt = jax.lax.with_sharding_constraint(ztxt, batch_sharding)

            l, l_extras = apply_loss(zimg, ztxt, extras, teacher_out)
            return l, {
                "t": extras["t"][0],
                "t/parameter": extras["t/parameter"][0],
                "nimg": jnp.mean(extras["img/norm"]),
                "ntxt": jnp.mean(extras["txt/norm"]),
                **{k: jnp.mean(v) for k, v in l_extras.items()},
            }

        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        if accum_steps <= 1:
            (l, measurements), grads = grad_fn(params, images, labels,
                                               rng_step)
        else:
            # Two-pass full-batch-negative gradient accumulation, matching
            # the reference torch trainer's cached-feature scheme
            # (clipa_torch/training/train.py:217-256):
            #   pass 1: embed every microbatch without gradient tracking,
            #   pass 2: for each microbatch j, re-embed it live, splice it
            #     into the cached full-batch features, compute the loss
            #     against FULL-batch negatives, and accumulate gradients.
            # Gradients SUM over passes (no division): each feature's
            # contribution to the full-batch loss is counted exactly once,
            # so the result equals the single-pass full-batch gradient.
            # (As in the reference, the temperature `t` receives the full
            # dL/dt in every pass, i.e. accum_steps x the single-pass grad.)
            if images.shape[0] % accum_steps:
                raise ValueError(
                    f"grad_accum_steps={accum_steps} must divide the global "
                    f"batch size {images.shape[0]}")
            b = images.shape[0] // accum_steps
            mb_img = images.reshape(accum_steps, b, *images.shape[1:])
            mb_lab = labels.reshape(accum_steps, b, *labels.shape[1:])
            mb_rng = jnp.arange(accum_steps)

            def embed(params, imgs, labs, i):
                # same fold_in as pass 2 so dropout/masking recompute
                # identically and the spliced row block is exact.
                zimg, ztxt, _ = model.apply(
                    {"params": params}, imgs, labs, train=True,
                    mask_ratio=mask_ratio,
                    rngs={"dropout": jax.random.fold_in(rng_step, i),
                          "drop_path": jax.random.fold_in(rng_step, i),
                          "random_mask": jax.random.fold_in(rng_step, i)})
                return zimg, ztxt

            zi_all, zt_all = jax.lax.map(
                lambda xs: embed(params, *xs), (mb_img, mb_lab, mb_rng))
            zi_all = jax.lax.stop_gradient(zi_all)
            zt_all = jax.lax.stop_gradient(zt_all)

            def loss_j(params, imgs, labs, j):
                zimg_j, ztxt_j, extras = model.apply(
                    {"params": params}, imgs, labs, train=True,
                    mask_ratio=mask_ratio,
                    rngs={"dropout": jax.random.fold_in(rng_step, j),
                          "drop_path": jax.random.fold_in(rng_step, j),
                          "random_mask": jax.random.fold_in(rng_step, j)})
                zimg = zi_all.at[j].set(zimg_j).reshape(-1, zimg_j.shape[-1])
                ztxt = zt_all.at[j].set(ztxt_j).reshape(-1, ztxt_j.shape[-1])
                l, l_extras = apply_loss(zimg, ztxt, extras)
                return l, {
                    "t": extras["t"][0],
                    "t/parameter": extras["t/parameter"][0],
                    "nimg": jnp.mean(extras["img/norm"]),
                    "ntxt": jnp.mean(extras["txt/norm"]),
                    **{k: jnp.mean(v) for k, v in l_extras.items()},
                }

            grad_j = jax.value_and_grad(loss_j, has_aux=True)

            def micro(carry, xs):
                g_acc = carry
                imgs, labs, j = xs
                (l, meas), g = grad_j(params, imgs, labs, j)
                return jax.tree_util.tree_map(jnp.add, g_acc, g), (l, meas)

            zeros = jax.tree_util.tree_map(
                lambda x: jnp.zeros(x.shape, jnp.float32), params)
            grads, (l_all, meas_all) = jax.lax.scan(
                micro, zeros, (mb_img, mb_lab, mb_rng))
            l = l_all[-1]  # every pass computes the same full-batch loss
            measurements = jax.tree_util.tree_map(lambda x: x[-1], meas_all)

        updates, opt = tx.update(grads, opt, params)
        params = optax.apply_updates(params, updates)
        if temperature_clamp and "t" in params:
            # Torch-trainer parity knob (clipa_torch/training/train.py:284-286
            # clamps logit_scale to [0, ln 100] after every step, per the CLIP
            # paper); the JAX reference trainer does not clamp, so this is
            # opt-in via config.temperature_clamp = True | max_log_t.
            params["t"] = jnp.clip(params["t"], 0.0, t_clamp_max)

        measurements["training_loss"] = l
        if norm_metrics != "never":
            if norm_metrics == "always":
                l2g = optax.global_norm(grads)
                l2p = optax.global_norm(params)
                l2u = optax.global_norm(updates)
            else:
                # "log" gating must NOT wrap the trees in a lax.cond: cond
                # operands are live at its entry, so a cond over
                # (grads, params, updates) pins THREE full fp32 param-sized
                # trees in HBM simultaneously (~12 GB on ViT-H — the
                # difference between H/14 fitting a 16G chip or not, and a
                # source of XLA memory-pressure remats at large batch on
                # smaller towers). Instead the per-leaf squared sums run
                # UNGATED — XLA fuses each into the fusion that produced
                # the leaf, so each grad/update dies right after its Adam
                # consumer — and only the scalar sqrt/select is gated.
                # Values are identical to optax.global_norm (same per-leaf
                # vdot + scalar-sum structure), zeros on unlogged steps.
                def _sqsum(tree):
                    # sum-of-squares, NOT jnp.vdot: XLA lowers a jitted
                    # vdot to a dot_general whose CPU fast path loses ~3
                    # significant digits vs the reduce, and exact agreement
                    # with optax.global_norm (same abs_sq+sum structure) is
                    # what the parity test asserts.
                    leaves = jax.tree_util.tree_leaves(tree)
                    return sum((jnp.sum(jnp.square(x.astype(jnp.float32)))
                                for x in leaves), jnp.float32(0.0))
                gsq, psq, usq = _sqsum(grads), _sqsum(params), _sqsum(updates)
                # `step` here is pre-increment; the loop logs this batch as
                # step+1 (utils.itstime: first, last, every log_steps).
                logged = step + 1
                due = ((logged % log_steps == 0) | (logged == 1)
                       | (logged == total_steps))
                zero = jnp.zeros((), jnp.float32)
                l2g, l2p, l2u = (
                    jnp.where(due, jnp.sqrt(gsq), zero),
                    jnp.where(due, jnp.sqrt(psq), zero),
                    jnp.where(due, jnp.sqrt(usq), zero))
            measurements["l2_grads"] = l2g
            measurements["l2_params"] = l2p
            measurements["l2_updates"] = l2u
        if measure_block_norms:
            measurements.update(_block_norms(grads, config))

        new_state = {"params": params, "opt": opt, "rng": rng,
                     "step": step + 1}
        return new_state, measurements

    return jax.jit(update, donate_argnums=(0,))


def _block_norms(grads, config):
    """Per-encoder-block gradient norms (reference telemetry,
    clipa_jax/main.py:296-381)."""
    from clipa_tpu import optim
    out = {}
    img = grads.get("img", {})
    for key in ("embedding", "cls", "head"):
        if key in img:
            sub = optim.replace_frozen(config.get("schedule", []),
                                       img[key], 0.0)
            out[f"l2_grad_{key}"] = optax.global_norm(sub)
    tr = img.get("Transformer", {})
    for name, block in tr.items():
        kern = block.get("MlpBlock_0", {}).get("Dense_1", {}).get("kernel")
        if kern is not None:
            out[f"l2_grad_{name}"] = jnp.sqrt(jnp.vdot(kern, kern).real)
    return out


def make_predict_fn(model, normalize: bool = True) -> Callable:
    """Un-jitted predict fn handed to evaluators (they jit with their own
    shardings).

    uint8 images are normalized on-device with the exact statistics the
    train step uses (train/step.py:54-55), so evaluator pp strings stay on
    the efficient uint8 transfer path and train/eval model inputs are
    identically distributed (reference eval pp always normalizes:
    clipa_jax/configs/clip_common.py:89-138). Float images are passed
    through untouched — a pp string that already applied a value range
    (e.g. tools/eval_zeroshot.py) is not double-normalized.
    """
    def predict(params, image=None, text=None, **unused):
        del unused
        if normalize and image is not None and image.dtype == jnp.uint8:
            image = preprocess.normalize_uint8(image)
        zimg, ztxt, out = model.apply({"params": params}, image, text)
        return zimg, ztxt, out
    return predict


def init_model_params(model, init_shapes, mesh, rng) -> Any:
    """Initializes a model's params directly into mesh (fsdp) shardings."""
    img_shape = tuple(init_shapes[0])
    txt_shape = tuple(init_shapes[1])

    def init(rng):
        images = jnp.zeros(img_shape, jnp.float32)
        labels = jnp.zeros(txt_shape, jnp.int32)
        variables = model.init(
            {"params": rng, "dropout": rng, "drop_path": rng,
             "random_mask": rng},
            images, labels, train=False)
        return variables["params"]

    params_shapes = jax.eval_shape(init, rng)
    fsdp = mesh_lib.fsdp_shardings(params_shapes, mesh)
    return jax.jit(init, out_shardings=fsdp)(rng)


def init_train_state(model, tx, config, mesh, rng) -> Any:
    """Initializes params/opt on host then places them with mesh shardings."""
    params = init_model_params(model, config.init_shapes, mesh, rng)
    params_shapes = jax.eval_shape(lambda p: p, params)
    opt = jax.jit(tx.init,
                  out_shardings=mesh_lib.fsdp_shardings(
                      jax.eval_shape(tx.init, params_shapes), mesh))(params)
    return {
        "params": params,
        "opt": opt,
        "rng": jax.device_put(rng, mesh_lib.replicated_sharding(mesh)),
        "step": jax.device_put(jnp.zeros((), jnp.int32),
                               mesh_lib.replicated_sharding(mesh)),
    }
