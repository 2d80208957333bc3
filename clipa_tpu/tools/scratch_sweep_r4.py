"""Clean batch sweep: ours vs faithful fp32 baseline (norm metrics always).

The reference computes full l2-norm telemetry unconditionally inside the
jitted step (clipa_jax/main.py:296-381) and ran 256 pairs/core
(model_h/84_8_pre_training.py:27). This sweep measures both sides at
several batches so bench.py's protocol (which batch, which norm mode)
is chosen from uncontended data rather than assumption.
"""
import json
import sys

sys.path.insert(0, "/root/repo")

import bench


def run(tag, dtype, batch, **kw):
    try:
        update, state, gbatch = bench.build_step(dtype, batch, **kw)
        t, loss, state = bench.time_steps(update, state, gbatch, iters=20)
        del update, state, gbatch
        print(json.dumps({"tag": tag, "batch": batch,
                          "step_ms": round(t * 1e3, 2),
                          "pairs_per_sec": round(batch / t, 1)}), flush=True)
    except Exception as e:
        print(json.dumps({"tag": tag, "batch": batch,
                          "error": repr(e)[:200]}), flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("ours", "all"):
        for b in (256, 320, 384, 512):
            run("ours", "bfloat16", b, mu_dtype="bfloat16",
                optax_name="scale_by_fused_adam")
    if which in ("base", "all"):
        for b in (256, 384, 512):
            run("base_gated", "float32", b, attn_impl="xla")
        for b in (256, 384, 512):
            run("base_always", "float32", b, attn_impl="xla",
                norm_metrics="always")
