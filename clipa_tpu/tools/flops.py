"""FLOPs / parameter counting CLI (the reference's training/profile.py).

Uses XLA's own cost analysis of the compiled forward pass — exact for the
program that actually runs, rather than an operator-table estimate.

  python -m clipa_tpu.tools.flops --model ViT-H-14-CL32-GAP-BigVision
  python -m clipa_tpu.tools.flops --variant L/16 --res 112 --tokens 8
"""

from __future__ import annotations

import argparse


def analyze(model, image_shape, text_shape) -> dict:
    import jax
    import jax.numpy as jnp
    import numpy as np

    params = jax.eval_shape(
        lambda r: model.init({"params": r}, jnp.zeros(image_shape),
                             jnp.zeros(text_shape, jnp.int32))["params"],
        jax.random.PRNGKey(0))
    n_params = sum(np.prod(x.shape)
                   for x in jax.tree_util.tree_leaves(params))

    def fwd(params, img, txt):
        return model.apply({"params": params}, img, txt)[:2]

    lowered = jax.jit(fwd).lower(
        params, jax.ShapeDtypeStruct(image_shape, jnp.float32),
        jax.ShapeDtypeStruct(text_shape, jnp.int32))
    cost = lowered.compile().cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    return {
        "params_m": float(n_params) / 1e6,
        "fwd_gflops": float(cost.get("flops", 0)) / 1e9,
        "bytes_accessed_mb": float(cost.get("bytes accessed", 0)) / 1e6,
    }


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--model", help="open_clip config name")
    p.add_argument("--variant", default="B/16", help="ViT variant")
    p.add_argument("--res", type=int, default=224)
    p.add_argument("--tokens", type=int, default=32)
    p.add_argument("--batch", type=int, default=1)
    args = p.parse_args(argv)

    if args.model:
        from clipa_tpu.compat import openclip
        from clipa_tpu.models import two_towers
        cfg = openclip.get_model_config(args.model)
        model = two_towers.Model(**openclip._to_two_towers_cfg(cfg))
        res = args.res or cfg["vision_cfg"]["image_size"]
        tokens = cfg["text_cfg"]["context_length"]
    else:
        from clipa_tpu.models import two_towers
        tv = args.variant.split("/")[0]
        model = two_towers.Model(
            image={"variant": args.variant, "pool_type": "gap",
                   "posemb": "sincos2d"},
            text={"variant": tv, "pool_type": "last", "vocab_size": 32000},
            out_dim=512, temperature_init=1 / 0.07)
        res, tokens = args.res, args.tokens

    stats = analyze(model, (args.batch, res, res, 3), (args.batch, tokens))
    print(f"params: {stats['params_m']:.1f}M")
    print(f"forward GFLOPs (batch {args.batch}): {stats['fwd_gflops']:.2f}")
    print(f"bytes accessed: {stats['bytes_accessed_mb']:.1f} MB")


if __name__ == "__main__":
    main()
