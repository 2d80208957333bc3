"""Measure deferred-r / scale-folded variants of the 2D attention kernels.

Current production kernels (ops/block_attention.py): fwd already defers the
softmax divide to the (n, hd) output; bwd still divides e/r on the (n, n)
score domain and multiplies ds*scale on (n, n). Candidate v2 moves ALL /r
and *scale work onto (n, hd) operands:

    e  = exp(clip((q*scale) @ k^T) + bias)        # scale exact when 2^-k
    r  = rowsum(e)
    dp = do @ v^T                                  # UNnormalized
    c  = rowsum(dp * e) / r                        # (n, 1)
    et = e * (dp - c)                              # = r * dlogits / scale
    dq = (et @ k)  * (scale / r)                   # (n, hd) epilogue
    dk = et^T @ (q * (scale / r))                  # (n, hd) prologue
    dv = e^T  @ (do / r)                           # (n, hd) prologue

Saves per (n, n) head block: one divide pass and one multiply pass (the two
most expensive non-exp VPU ops); adds three (n, hd) elementwise ops (64
lanes vs n=200 — 3% of the work).
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from clipa_tpu.ops import block_attention as ba

D, H = 1024, 16
HD = D // H
SCALE = HD ** -0.5          # 0.125, exact in bf16
CLIP = ba._EXP_CLIP


def make_inputs(b, l):
    key = jax.random.PRNGKey(0)
    kq, kk, kv, kd = jax.random.split(key, 4)
    mk = lambda k: (jax.random.normal(k, (b * l, D), jnp.bfloat16))
    return mk(kq), mk(kk), mk(kv), mk(kd)


def fwd_v2(b, l, g, fold_scale):
    def kern(q_ref, k_ref, v_ref, o_ref):
        bias = ba._mask_bias(ba._block_diag_mask(g * l, l))
        for h in range(H):
            sl = slice(h * HD, (h + 1) * HD)
            qh = q_ref[:, sl]
            if fold_scale:
                qh = qh * jnp.bfloat16(SCALE)
            s = jax.lax.dot_general(qh, k_ref[:, sl], (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            if not fold_scale:
                s = s * SCALE
            e = jnp.exp(jnp.clip(s, -CLIP, CLIP) + bias)
            r = jnp.sum(e, axis=-1, keepdims=True)
            vh = v_ref[:, sl]
            o = jax.lax.dot_general(e.astype(vh.dtype), vh,
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            o_ref[:, sl] = (o / r).astype(o_ref.dtype)
    spec = pl.BlockSpec((g * l, D), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(kern, grid=(b // g,), in_specs=[spec] * 3,
                          out_specs=spec,
                          out_shape=jax.ShapeDtypeStruct((b * l, D),
                                                         jnp.bfloat16))


def bwd_cur(b, l, g):
    """The production bwd kernel, via its module entry."""
    def kern(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref):
        ba._bwd2d_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref,
                         num_heads=H, seq=l, group=g, scale=SCALE)
    spec = pl.BlockSpec((g * l, D), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(kern, grid=(b // g,), in_specs=[spec] * 4,
                          out_specs=(spec,) * 3,
                          out_shape=tuple(jax.ShapeDtypeStruct((b * l, D),
                                                               jnp.bfloat16)
                                          for _ in range(3)))


def bwd_v2(b, l, g, fold_scale=True):
    f32 = jnp.float32
    def kern(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref):
        bias = ba._mask_bias(ba._block_diag_mask(g * l, l))
        for h in range(H):
            sl = slice(h * HD, (h + 1) * HD)
            qh, kh = q_ref[:, sl], k_ref[:, sl]
            vh, doh = v_ref[:, sl], do_ref[:, sl]
            qs = qh * jnp.bfloat16(SCALE) if fold_scale else qh
            s = jax.lax.dot_general(qs, kh, (((1,), (1,)), ((), ())),
                                    preferred_element_type=f32)
            if not fold_scale:
                s = s * SCALE
            e = jnp.exp(jnp.clip(s, -CLIP, CLIP) + bias)
            r = jnp.sum(e, axis=-1, keepdims=True)
            dp = jax.lax.dot_general(doh, vh, (((1,), (1,)), ((), ())),
                                     preferred_element_type=f32)
            c = jnp.sum(dp * e, axis=-1, keepdims=True) / r
            et = (e * (dp - c)).astype(qh.dtype)
            eb = e.astype(qh.dtype)
            sr = SCALE / r
            qt = (qh * sr).astype(qh.dtype)
            dot = (doh / r).astype(qh.dtype)
            dq = jax.lax.dot_general(et, kh, (((1,), (0,)), ((), ())),
                                     preferred_element_type=f32) * sr
            dk = jax.lax.dot_general(et, qt, (((0,), (0,)), ((), ())),
                                     preferred_element_type=f32)
            dv = jax.lax.dot_general(eb, dot, (((0,), (0,)), ((), ())),
                                     preferred_element_type=f32)
            dq_ref[:, sl] = dq.astype(dq_ref.dtype)
            dk_ref[:, sl] = dk.astype(dk_ref.dtype)
            dv_ref[:, sl] = dv.astype(dv_ref.dtype)
    spec = pl.BlockSpec((g * l, D), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(kern, grid=(b // g,), in_specs=[spec] * 4,
                          out_specs=(spec,) * 3,
                          out_shape=tuple(jax.ShapeDtypeStruct((b * l, D),
                                                               jnp.bfloat16)
                                          for _ in range(3)))


def time_call(f, args, n_out, iters=30):
    # Chain iterations so relay memoization / early block_until_ready can't
    # fake the timing: each iteration feeds the previous output back in.
    @jax.jit
    def chain(a0, n):
        def body(_, a):
            out = f(*a)
            out = out if isinstance(out, tuple) else (out,)
            return tuple(
                x + 1e-6 * o.astype(x.dtype)
                for x, o in zip(a, list(out) * 4))[:len(a)]
        return jax.lax.fori_loop(0, n, body, a0, unroll=False)
    w = chain(args, 2)
    float(jnp.sum(w[0].astype(jnp.float32)))
    t0 = time.perf_counter()
    r = chain(args, iters)
    float(jnp.sum(r[0].astype(jnp.float32)))
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    for b, l, g in ((384, 50, 4), (512, 50, 4)):
        q, k, v, do = make_inputs(b, l)
        # numerics check vs production
        ref_f = ba._call_fwd_2d(q, k, v, H, l)
        ref_b = ba._call_bwd_2d(q, k, v, do, H, l)
        new_f = fwd_v2(b, l, g, True)(q, k, v)
        new_b = bwd_v2(b, l, g)(q, k, v, do)
        print(f"B={b}: fwd max|d|={float(jnp.max(jnp.abs(new_f.astype(jnp.float32) - ref_f.astype(jnp.float32)))):.2e}",
              " bwd max|d|=",
              [f"{float(jnp.max(jnp.abs(a.astype(jnp.float32) - r.astype(jnp.float32)))):.2e}"
               for a, r in zip(new_b, ref_b)])
        t_fc = time_call(lambda q, k, v: ba._call_fwd_2d(q, k, v, H, l),
                         (q, k, v), 1)
        t_f2 = time_call(fwd_v2(b, l, g, True), (q, k, v), 1)
        t_bc = time_call(bwd_cur(b, l, g), (q, k, v, do), 3)
        t_b2 = time_call(bwd_v2(b, l, g), (q, k, v, do), 3)
        t_b2n = time_call(bwd_v2(b, l, g, fold_scale=False), (q, k, v, do), 3)
        print(f"B={b} L={l} g={g}: fwd cur {t_fc:.3f} v2 {t_f2:.3f} | "
              f"bwd cur {t_bc:.3f} v2 {t_b2:.3f} v2-nofold {t_b2n:.3f} ms")


if __name__ == "__main__":
    main()
