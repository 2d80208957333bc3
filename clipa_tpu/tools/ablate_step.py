"""Ablation profiling of the CLIPA train step (no device tracing on axon).

Times a ladder of step variants to attribute the gap between achieved TF/s
and the chip's measured matmul peak:

  fwd        — forward loss only
  grad       — value_and_grad, no optimizer
  sgd        — grad + plain SGD apply
  full       — the real update (adam, wd, schedules)
  noattn     — full, attention core replaced with identity (attention cost)
  notext     — full, text tower ablated to near-zero work

Usage: python -m clipa_tpu.tools.ablate_step [--batch 512]
"""

from __future__ import annotations

import argparse
import functools
import json
import time

import numpy as np


def _sync(out):
    import jax
    leaf = [x for x in jax.tree_util.tree_leaves(out)
            if hasattr(x, "ndim")][0]
    np.asarray(jax.device_get(leaf[(0,) * leaf.ndim]))


def _time(f, *args, iters=8):
    out = f(*args)
    _sync(out)
    out = f(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp
    import optax
    from clipa_tpu.models import two_towers
    from clipa_tpu.ops import preprocess

    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=512)
    p.add_argument("--res", type=int, default=112)
    p.add_argument("--tokens", type=int, default=8)
    p.add_argument("--variant", default="L/16")
    p.add_argument("--attn", default="auto")
    p.add_argument("--iters", type=int, default=8)
    args = p.parse_args()

    tv = args.variant.split("/")[0]
    out_dim = {"Ti": 192, "S": 384, "B": 512, "L": 768, "H": 1024,
               "G": 1280}.get(tv, 768)

    def make_model(attn_impl="auto", text_variant=None):
        return two_towers.Model(
            image={"variant": args.variant, "pool_type": "tok",
                   "posemb": "sincos2d", "attn_impl": attn_impl},
            text={"variant": text_variant or tv, "pool_type": "last",
                  "vocab_size": 32000},
            out_dim=(out_dim, out_dim), temperature_init=1 / 0.07,
            dtype=jnp.bfloat16)

    rng = np.random.RandomState(0)
    images_u8 = jnp.asarray(rng.randint(
        0, 255, (args.batch, args.res, args.res, 3), dtype=np.uint8))
    labels = jnp.asarray(
        rng.randint(0, 32000, (args.batch, args.tokens)).astype(np.int32))

    def build(model):
        params = jax.jit(lambda r: model.init(
            {"params": r}, jnp.zeros((1, args.res, args.res, 3)),
            jnp.zeros((1, args.tokens), jnp.int32), train=False)["params"])(
                jax.random.PRNGKey(0))
        return params

    from clipa_tpu import losses as losses_lib

    def loss_fn(model, params, images, labels):
        imgs = preprocess.normalize_uint8(images)
        zimg, ztxt, extras = model.apply(
            {"params": params}, imgs, labels, train=True,
            rngs={"dropout": jax.random.PRNGKey(1),
                  "drop_path": jax.random.PRNGKey(1),
                  "random_mask": jax.random.PRNGKey(1)})
        l, _ = losses_lib.bidirectional_contrastive_loss(
            zimg, ztxt, extras["t"], reduction=True)
        return l

    model = make_model(args.attn)
    params = build(model)
    results = {}

    fwd = jax.jit(functools.partial(loss_fn, model))
    results["fwd_ms"] = round(_time(fwd, params, images_u8, labels,
                                    iters=args.iters) * 1e3, 2)
    print(json.dumps(results), flush=True)

    grad = jax.jit(jax.grad(functools.partial(loss_fn, model)))
    results["grad_ms"] = round(_time(grad, params, images_u8, labels,
                                     iters=args.iters) * 1e3, 2)
    print(json.dumps(results), flush=True)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def sgd(params, images, labels):
        g = jax.grad(functools.partial(loss_fn, model))(params, images,
                                                        labels)
        return jax.tree_util.tree_map(lambda p, gg: p - 1e-8 * gg, params, g)
    params2 = jax.jit(lambda p: jax.tree_util.tree_map(jnp.copy, p))(params)
    results["sgd_ms"] = round(_time(lambda i, l: sgd(
        jax.jit(lambda p: jax.tree_util.tree_map(jnp.copy, p))(params), i, l),
        images_u8, labels, iters=args.iters) * 1e3, 2)
    del params2
    print(json.dumps(results), flush=True)

    tx = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.scale_by_adam(b1=0.9, b2=0.95, mu_dtype=jnp.bfloat16),
        optax.add_decayed_weights(0.2),
        optax.scale(-1e-8))
    opt = jax.jit(tx.init)(params)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def adam_step(params, opt, images, labels):
        g = jax.grad(functools.partial(loss_fn, model))(params, images,
                                                        labels)
        updates, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, updates), opt
    state = (params, opt)

    def adam_loop(i, l):
        nonlocal state
        p, o = adam_step(state[0], state[1], i, l)
        state = (p, o)
        return p

    results["adam_ms"] = round(_time(adam_loop, images_u8,
                                     labels, iters=args.iters) * 1e3, 2)
    params, opt = state
    del state, opt
    print(json.dumps(results), flush=True)

    # attention ablation: xla vs none. "none" isn't a real impl; measure by
    # monkeypatching the core to identity.
    from clipa_tpu.ops import attention as attn_lib
    orig = attn_lib.dot_product_attention
    try:
        attn_lib.dot_product_attention = lambda q, k, v, mask=None, impl="auto": v
        model_na = make_model("xla")
        params_na = build(model_na)
        grad_na = jax.jit(jax.grad(functools.partial(loss_fn, model_na)))
        results["grad_noattn_ms"] = round(
            _time(grad_na, params_na, images_u8, labels,
                  iters=args.iters) * 1e3, 2)
    finally:
        attn_lib.dot_product_attention = orig
    del params_na, grad_na

    # text tower ablation: Ti text tower (~6M params vs 85M)
    model_nt = make_model(args.attn, text_variant="Ti")
    model_nt = two_towers.Model(
        image={"variant": args.variant, "pool_type": "tok",
               "posemb": "sincos2d", "attn_impl": args.attn},
        text={"variant": "Ti", "pool_type": "last", "vocab_size": 32000},
        out_dim=(out_dim, out_dim), temperature_init=1 / 0.07,
        dtype=jnp.bfloat16)
    params_nt = build(model_nt)
    grad_nt = jax.jit(jax.grad(functools.partial(loss_fn, model_nt)))
    results["grad_titext_ms"] = round(
        _time(grad_nt, params_nt, images_u8, labels,
              iters=args.iters) * 1e3, 2)
    del params_nt, grad_nt, model_nt

    # HBM bandwidth probe: big elementwise triad
    big = jnp.ones((256, 1024, 1024), jnp.float32)  # 1 GB

    @jax.jit
    def triad(a):
        return a * 1.0001 + 3.0
    t = _time(triad, big, iters=args.iters)
    results["hbm_triad_gbps"] = round(2 * big.size * 4 / t / 1e9, 1)

    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
