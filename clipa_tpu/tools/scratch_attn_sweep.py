"""Sweep softmax-cost variants of the 2D fused attention kernels (fwd+bwd).

The bench trace shows attention custom-calls at 58 ms/step while their MXU
roofline is ~3 ms: the cost is the masked softmax VPU work on (G*L, G*L)
fp32 score blocks. Variants measured here:

  full        current kernel (where-mask, rowmax-sub, fp32 exp, pre-div)
  postdiv     divide AFTER the PV dot on (GL, hd) instead of p on (GL, GL)
  clamp       replace rowmax-sub with a safety clamp (exp(min(s, 40)))
  bf16exp     exp in bf16 (fp32 sum accumulation), p already bf16 for MXU
  addmask     additive -1e30 bias instead of where(-inf)
  combo       postdiv + clamp + bf16exp + addmask
  nosoftmax   p = s (wrong math; VPU-free lower bound)
"""
import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from clipa_tpu.ops import block_attention as ba

B, L, D, H = 512, 50, 1024, 16
G = 4
HD = D // H
SCALE = HD ** -0.5

key = jax.random.PRNGKey(0)
kq, kk, kv, kd = jax.random.split(key, 4)
q = jax.random.normal(kq, (B * L, D), jnp.bfloat16)
k = jax.random.normal(kk, (B * L, D), jnp.bfloat16)
v = jax.random.normal(kv, (B * L, D), jnp.bfloat16)
do = jax.random.normal(kd, (B * L, D), jnp.bfloat16)


def softmax_variant(s, same, addbias, mode):
    """Returns (p_for_pv_dot, denom_or_None). denom!=None => divide after PV."""
    if mode == "nosoftmax":
        return s.astype(jnp.bfloat16), None
    if "addmask" in mode or mode == "combo":
        s = s + addbias
    else:
        s = jnp.where(same, s, -jnp.inf)
    if "clamp" in mode or mode == "combo":
        s = s - 40.0  # shift so exp <= 1 at the clamp; no rowmax reduce
        s = jnp.minimum(s, 0.0)
    else:
        s = s - jnp.max(s, axis=-1, keepdims=True)
    if "bf16exp" in mode or mode == "combo":
        e = jnp.exp(s.astype(jnp.bfloat16))
        denom = jnp.sum(e.astype(jnp.float32), axis=-1, keepdims=True)
    else:
        e = jnp.exp(s)
        denom = jnp.sum(e, axis=-1, keepdims=True)
    if "postdiv" in mode or mode == "combo":
        return e.astype(jnp.bfloat16), denom
    p = e / denom
    return p.astype(jnp.bfloat16), None


def make_fwd(mode):
    def kern(q_ref, k_ref, v_ref, o_ref):
        same = ba._block_diag_mask(G * L, L)
        addbias = jnp.where(same, 0.0, -1e30)
        for h in range(H):
            sl = slice(h * HD, (h + 1) * HD)
            s = jax.lax.dot_general(q_ref[:, sl], k_ref[:, sl],
                                    (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32) * SCALE
            p, denom = softmax_variant(s, same, addbias, mode)
            o = jax.lax.dot_general(p, v_ref[:, sl], (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            if denom is not None:
                o = o / denom
            o_ref[:, sl] = o.astype(o_ref.dtype)
    spec = pl.BlockSpec((G * L, D), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(kern, grid=(B // G,), in_specs=[spec] * 3,
                          out_specs=spec,
                          out_shape=jax.ShapeDtypeStruct((B * L, D),
                                                         jnp.bfloat16))


def make_bwd(mode):
    def kern(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref):
        f32 = jnp.float32
        same = ba._block_diag_mask(G * L, L)
        addbias = jnp.where(same, 0.0, -1e30)
        for h in range(H):
            sl = slice(h * HD, (h + 1) * HD)
            qh, kh = q_ref[:, sl], k_ref[:, sl]
            vh, doh = v_ref[:, sl], do_ref[:, sl]
            s = jax.lax.dot_general(qh, kh, (((1,), (1,)), ((), ())),
                                    preferred_element_type=f32) * SCALE
            pb, denom = softmax_variant(s, same, addbias, mode)
            if mode == "nosoftmax":
                dp = jax.lax.dot_general(doh, vh, (((1,), (1,)), ((), ())),
                                         preferred_element_type=f32)
                dsb = dp.astype(qh.dtype)
            elif denom is not None:
                # p = e/denom: fold 1/denom into do's rows once ((GL, hd)
                # divide) so every (GL, GL) tensor op runs on unnormalized e.
                #   dp/denom      = (do/denom) @ v^T           =: dphat
                #   rowdot        = sum_j dp_j p_j = sum_j dphat_j e_j
                #   ds            = p (dp - rowdot) = e (dphat - rowdot)
                #   dv            = p^T do = e^T (do/denom)
                doh = (doh.astype(f32) / denom).astype(doh.dtype)
                dphat = jax.lax.dot_general(doh, vh, (((1,), (1,)), ((), ())),
                                            preferred_element_type=f32)
                e32 = pb.astype(f32)
                rowdot = jnp.sum(dphat * e32, axis=-1, keepdims=True)
                ds = e32 * (dphat - rowdot)
                dsb = (ds * SCALE).astype(qh.dtype)
            else:
                dp = jax.lax.dot_general(doh, vh, (((1,), (1,)), ((), ())),
                                         preferred_element_type=f32)
                p = pb.astype(f32)
                ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
                dsb = (ds * SCALE).astype(qh.dtype)
            dq = jax.lax.dot_general(dsb, kh, (((1,), (0,)), ((), ())),
                                     preferred_element_type=f32)
            dk = jax.lax.dot_general(dsb, qh, (((0,), (0,)), ((), ())),
                                     preferred_element_type=f32)
            dvv = jax.lax.dot_general(pb, doh, (((0,), (0,)), ((), ())),
                                      preferred_element_type=f32)
            dq_ref[:, sl] = dq.astype(dq_ref.dtype)
            dk_ref[:, sl] = dk.astype(dk_ref.dtype)
            dv_ref[:, sl] = dvv.astype(dv_ref.dtype)
    spec = pl.BlockSpec((G * L, D), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(kern, grid=(B // G,), in_specs=[spec] * 4,
                          out_specs=(spec,) * 3,
                          out_shape=tuple(
                              jax.ShapeDtypeStruct((B * L, D), jnp.bfloat16)
                              for _ in range(3)))


def time_fwd(f, iters=40):
    @jax.jit
    def chain(q, k, v, n):
        def body(_, c):
            return (c + f(c, k, v) * 1e-6).astype(c.dtype)
        return jax.lax.fori_loop(0, n, body, q, unroll=False)
    float(jnp.sum(chain(q, k, v, 2).astype(jnp.float32)))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(jnp.sum(chain(q, k, v, iters).astype(jnp.float32)))
        t1 = time.perf_counter()
        t2 = time.perf_counter()
        float(jnp.sum(chain(q, k, v, 2).astype(jnp.float32)))
        t3 = time.perf_counter()
        best = min(best, ((t1 - t0) - (t3 - t2)) / (iters - 2))
    return best * 1e3


def time_bwd(f, iters=40):
    @jax.jit
    def chain(q, k, v, do, n):
        def body(_, c):
            dq, dk, dv = f(c, k, v, do)
            return (c + dq * 1e-6).astype(c.dtype)
        return jax.lax.fori_loop(0, n, body, q, unroll=False)
    float(jnp.sum(chain(q, k, v, do, 2).astype(jnp.float32)))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(jnp.sum(chain(q, k, v, do, iters).astype(jnp.float32)))
        t1 = time.perf_counter()
        t2 = time.perf_counter()
        float(jnp.sum(chain(q, k, v, do, 2).astype(jnp.float32)))
        t3 = time.perf_counter()
        best = min(best, ((t1 - t0) - (t3 - t2)) / (iters - 2))
    return best * 1e3


def make_fwd_tmax():
    """Safe rowmax via the TRANSPOSED score dot: the lane-axis max becomes a
    sublane-axis max (cheap on VPU), at the cost of one extra MXU dot."""
    def kern(q_ref, k_ref, v_ref, o_ref):
        same = ba._block_diag_mask(G * L, L)
        for h in range(H):
            sl = slice(h * HD, (h + 1) * HD)
            qh, kh = q_ref[:, sl], k_ref[:, sl]
            s = jax.lax.dot_general(qh, kh, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32) * SCALE
            st = jax.lax.dot_general(kh, qh, (((1,), (1,)), ((), ())),
                                     preferred_element_type=jnp.float32) * SCALE
            # rowmax_i(s) = max over sublanes of column i of s^T
            m = jnp.max(jnp.where(same, st, -jnp.inf), axis=0)   # (GL,)
            s = jnp.where(same, s, -jnp.inf) - m[:, None]
            e = jnp.exp(s)
            p = e / jnp.sum(e, axis=-1, keepdims=True)
            o = jax.lax.dot_general(p.astype(v_ref.dtype), v_ref[:, sl],
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            o_ref[:, sl] = o.astype(o_ref.dtype)
    spec = pl.BlockSpec((G * L, D), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(kern, grid=(B // G,), in_specs=[spec] * 3,
                          out_specs=spec,
                          out_shape=jax.ShapeDtypeStruct((B * L, D),
                                                         jnp.bfloat16))


if __name__ == "__main__":
    import numpy as np
    ref = make_fwd("full")(q, k, v)
    for mode in ("full", "postdiv", "clamp", "bf16exp", "addmask", "combo",
                 "nosoftmax"):
        t = time_fwd(make_fwd(mode))
        err = float(jnp.max(jnp.abs((make_fwd(mode)(q, k, v) - ref)
                                    .astype(jnp.float32))))
        print(f"fwd[{mode:10s}]: {t:7.3f} ms  max|d|={err:.2e}", flush=True)
    f = make_fwd_tmax()
    err = float(jnp.max(jnp.abs((f(q, k, v) - ref).astype(jnp.float32))))
    print(f"fwd[{'tmax':10s}]: {time_fwd(f):7.3f} ms  max|d|={err:.2e}",
          flush=True)
    for mode in ("full", "clamp", "postdiv", "addmask", "combo",
                 "nosoftmax"):
        t = time_bwd(make_bwd(mode))
        print(f"bwd[{mode:10s}]: {t:7.3f} ms", flush=True)
