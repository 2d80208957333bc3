"""Microbenchmark: int8-quantized GEMM strategies at CLIPA step shapes.

Times, per (M, K, N):
  * bf16       — plain bf16 dot (the baseline the MXU already runs)
  * int8_xla   — quant_dot's XLA path: quantize x per-row + w per-col, dot
  * int8_preqw — weights pre-quantized outside the timed region (training
                 quantizes w once per step, amortized over fwd+dx)
  * int8_pure  — both operands pre-quantized: the raw int8 MXU + scale rate
  * int8_pallas— fused in-kernel quantize-GEMM (ops/int8_gemm.py), if present

Run on the bench chip:  python -m clipa_tpu.tools.bench_gemm
"""

from __future__ import annotations

import json
import time

import numpy as np


def _sync(out):
    # block_until_ready returns early on some experimental PJRT plugins
    # (axon); a host transfer of a dependent scalar is the reliable sync.
    import jax
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jax.device_get(leaf[(0,) * leaf.ndim]))


def _time(f, *args, iters=30):
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
    from clipa_tpu.ops import quantization as q

    # CLIPA ViT-L/16 @112 bench shapes: M = 512*50 image tokens.
    shapes = [
        (25600, 1024, 4096),   # MLP fc1
        (25600, 4096, 1024),   # MLP fc2
        (25600, 1024, 3072),   # fused QKV
        (25600, 1024, 1024),   # single proj / attn out
        (4096, 768, 3072),     # text tower fc1 (512*8 tokens)
    ]
    rng = np.random.RandomState(0)
    results = []
    for (M, K, N) in shapes:
        x = jnp.asarray(rng.randn(M, K), jnp.bfloat16)
        w = jnp.asarray(rng.randn(K, N) * 0.02, jnp.bfloat16)

        bf16 = jax.jit(lambda a, b: jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ()))))
        t_bf16 = _time(bf16, x, w)

        int8_xla = jax.jit(lambda a, b: q.int8_dot_general(a, b, 1))
        t_int8 = _time(int8_xla, x, w)

        # pre-quantized weight path
        def prep_w(b):
            return q._quantize(b.astype(jnp.float32), (0,))
        qw, sw = jax.jit(prep_w)(w)
        qw, sw = jax.block_until_ready((qw, sw))

        @jax.jit
        def int8_preqw(a, qw, sw):
            qa, sa = q._quantize(a.astype(jnp.float32), (1,))
            acc = jax.lax.dot_general(qa, qw, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.int32)
            return (acc.astype(jnp.float32) * sa * sw).astype(jnp.bfloat16)
        t_preqw = _time(int8_preqw, x, qw, sw)

        def prep_x(a):
            return q._quantize(a.astype(jnp.float32), (1,))
        qx, sx = jax.jit(prep_x)(x)
        qx, sx = jax.block_until_ready((qx, sx))

        @jax.jit
        def int8_pure(qa, sa, qw, sw):
            acc = jax.lax.dot_general(qa, qw, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.int32)
            return (acc.astype(jnp.float32) * sa * sw).astype(jnp.bfloat16)
        t_pure = _time(int8_pure, qx, sx, qw, sw)

        row = {
            "MKN": [M, K, N],
            "bf16_ms": round(t_bf16 * 1e3, 3),
            "bf16_tflops": round(2 * M * K * N / t_bf16 / 1e12, 1),
            "int8_xla_ms": round(t_int8 * 1e3, 3),
            "int8_preqw_ms": round(t_preqw * 1e3, 3),
            "int8_pure_ms": round(t_pure * 1e3, 3),
            "int8_pure_tops": round(2 * M * K * N / t_pure / 1e12, 1),
            "speedup_xla": round(t_bf16 / t_int8, 2),
            "speedup_preqw": round(t_bf16 / t_preqw, 2),
            "speedup_pure": round(t_bf16 / t_pure, 2),
        }
        try:
            from clipa_tpu.ops import int8_gemm
            pallas = jax.jit(lambda a, b: int8_gemm.int8_gemm(a, b))
            t_pal = _time(pallas, x, w)
            row["int8_pallas_ms"] = round(t_pal * 1e3, 3)
            row["speedup_pallas"] = round(t_bf16 / t_pal, 2)
            qwp, swp = jax.block_until_ready(jax.jit(int8_gemm.quantize_w)(w))
            pallas_pq = jax.jit(
                lambda a, qw, sw: int8_gemm.int8_gemm_preq(a, qw, sw))
            t_palq = _time(pallas_pq, x, qwp, swp)
            row["int8_pallas_preqw_ms"] = round(t_palq * 1e3, 3)
            row["speedup_pallas_preqw"] = round(t_bf16 / t_palq, 2)
        except ImportError:
            pass
        results.append(row)
        print(json.dumps(row))


if __name__ == "__main__":
    main()
