"""Profile the CLIPA training step on the current backend.

Reports, for a configurable bench-shaped step:
  * step time, pairs/sec/chip
  * analytical model FLOPs (XLA cost analysis) and achieved TF/s
  * measured chip matmul peak (bf16 + int8 8192^3 GEMM) and resulting MFU
  * optionally a jax.profiler trace (--trace DIR) for op-level breakdown

Usage:
    python -m clipa_tpu.tools.profile_step [--quant int8_full] [--trace /tmp/t]

This is the measurement tool behind bench.py's `mfu` field; kept separate so
exploratory profiling doesn't perturb the headline benchmark.
"""

from __future__ import annotations

import argparse
import json
import time


def measure_matmul_peak(dtype_str: str = "bfloat16", n: int = 8192,
                        iters: int = 40) -> float:
    """Times a chain of n^3 GEMMs in one dispatch; returns TFLOP/s (int8
    returns TOP/s). Single-dispatch chaining matters: eager per-GEMM calls
    through a remote relay understate the peak ~30% (see bench.py)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    if dtype_str == "int8":
        a = jnp.asarray(np.random.randint(-2, 2, (n, n), np.int8))

        @jax.jit
        def chain(a, k):
            def body(_, x):
                acc = jax.lax.dot_general(
                    a, x, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)
                return jnp.clip(acc, -2, 2).astype(jnp.int8)
            return jax.lax.fori_loop(0, k, body, a, unroll=False)
    else:
        dt = jnp.bfloat16 if dtype_str == "bfloat16" else jnp.float32
        a = jnp.ones((n, n), dt)

        @jax.jit
        def chain(a, k):
            return jax.lax.fori_loop(
                0, k, lambda _, x: ((a @ x) * 1e-4).astype(dt), a,
                unroll=False)

    float(jnp.sum(chain(a, 2).astype(jnp.float32)))  # warmup/compile
    t0 = time.perf_counter()
    r = chain(a, iters)
    float(jnp.sum(r.astype(jnp.float32)))  # host transfer = reliable sync
    dt_s = time.perf_counter() - t0
    return 2 * n**3 * iters / dt_s / 1e12


def main():
    import jax

    p = argparse.ArgumentParser()
    p.add_argument("--quant", default=None,
                   help="None | int8 | int8_full | int8_pallas")
    p.add_argument("--batch", type=int, default=512)
    p.add_argument("--res", type=int, default=112)
    p.add_argument("--tokens", type=int, default=8)
    p.add_argument("--variant", default="L/16")
    p.add_argument("--dtype", default="bfloat16")
    p.add_argument("--remat", default="none")
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--trace", default=None, help="profiler trace output dir")
    p.add_argument("--skip-peak", action="store_true")
    args = p.parse_args()

    import sys
    sys.path.insert(0, "/root/repo")
    import bench as bench_lib

    build_kw = {}
    if args.quant:
        build_kw["quant"] = args.quant
    update, state, gbatch = bench_lib.build_step(
        args.dtype, args.batch, res=args.res, tokens=args.tokens,
        variant=args.variant, mu_dtype="bfloat16", remat=args.remat,
        **build_kw)

    # FLOPs from the compiled program's own cost analysis.
    lowered = update.lower(state, gbatch)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    flops = float(ca.get("flops", 0.0)) if ca else 0.0

    step_time, loss, state = bench_lib.time_steps(update, state, gbatch,
                                                  iters=args.iters)
    n_chips = jax.device_count()
    out = {
        "platform": jax.devices()[0].platform,
        "quant": args.quant,
        "batch": args.batch,
        "step_time_ms": round(step_time * 1e3, 2),
        "pairs_per_sec_chip": round(args.batch / step_time / n_chips, 2),
        "model_tflops_per_step": round(flops / 1e12, 2),
        "achieved_tflops": round(flops / step_time / 1e12, 2),
        "final_loss": round(loss, 4),
    }

    if not args.skip_peak:
        peak_bf16 = measure_matmul_peak("bfloat16")
        peak_int8 = measure_matmul_peak("int8")
        out["measured_peak_bf16_tflops"] = round(peak_bf16, 1)
        out["measured_peak_int8_tops"] = round(peak_int8, 1)
        out["pct_of_bf16_peak"] = round(
            100 * flops / step_time / 1e12 / peak_bf16, 1)

    if args.trace:
        with jax.profiler.trace(args.trace):
            s, b = state, gbatch
            for _ in range(3):
                s, meas = update(s, b)
            jax.block_until_ready(s)
        out["trace_dir"] = args.trace

    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
