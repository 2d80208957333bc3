"""Attention-kernel variant sweep (the maintained perf-sweep driver).

Times the bias-fused 2D attention kernels (the towers' real hot path —
use_bias=True) against candidate variants at the flagship bench shape.
Measurement protocol: chain iterations through `fori_loop` with a traced
length (identical dispatches are memoized by this relay, and only
host-transfer sync times reliably), subtract a 2-iteration baseline.

Measured history (bench chip, v5e):
  r3: per-sample sliced scores 2x slower than the masked group dot
      (sublane misalignment at L=50); g=4 beats g=8 by 2.6x fwd.
  r4: deferred normalization in the FORWARD: -10% fwd kernel time.
      rowmax-free clip softmax: lane-max reduce was 35-45% of fwd time.
  r5 (B=384): fwd g=4 0.379 ms (g=8 0.398; g=2 Mosaic-illegal, 100 rows);
      bwd normalized 1.127 ms vs deferred-normalization bwd 1.391 ms —
      defer LOSES in the backward (the (GL,hd) do/denom divide + fp32 e
      reuse costs more than the one (GL,GL) divide it saves), so the
      landed kernels keep the normalized backward. Attention custom-calls
      total 39.1 ms of a 289.6 ms step; the backward VPU chain is the
      floor given the masked-group structure.
  r5b: two more variants measured DEAD at the flagship shape:
      (1) pad L 50->64 so g=2 gives one exact (128,128) score tile:
          the (B,50,D)<->(B,64,D) pad/unpad reshape copies around every
          kernel call dominate — fwd 1.105 ms vs 0.461 landed, bwd 1.924
          vs 1.225 (g=4 padded no better: 1.039/1.957). Padding the
          residual stream end-to-end instead would add 28% to every GEMM.
      (2) save normalized p in the forward, skip the score recompute in
          the backward: fwd+p-output is free (0.439 ms) but the backward
          reading the (GL, H*GL) p block runs 1.750 ms vs 1.225 recompute
          — the extra VMEM-resident slab throttles the pipeline more than
          one qk dot + exp chain costs. Flash-style recompute stands.

Variant knobs kept runnable below:
  fwd  g in {2, 4, 8}          — VPU softmax work scales with g (the score
                                 block is (g*L)^2 per g samples).
  bwd  normalized vs defer     — fold 1/denom into do's rows so the
                                 (GL, GL) ops run on unnormalized e.
"""
import functools
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from clipa_tpu.ops import block_attention as ba

B, L, D, H = 384, 50, 1024, 16
HD = D // H
SCALE = HD ** -0.5

key = jax.random.PRNGKey(0)
ks = jax.random.split(key, 7)
q = jax.random.normal(ks[0], (B * L, D), jnp.bfloat16)
k = jax.random.normal(ks[1], (B * L, D), jnp.bfloat16)
v = jax.random.normal(ks[2], (B * L, D), jnp.bfloat16)
do = jax.random.normal(ks[3], (B * L, D), jnp.bfloat16)
bq = jax.random.normal(ks[4], (D,), jnp.bfloat16) * 0.1
bk = jax.random.normal(ks[5], (D,), jnp.bfloat16) * 0.1
bv = jax.random.normal(ks[6], (D,), jnp.bfloat16) * 0.1


def make_fwd_bias(g):
    kern = functools.partial(ba._fwd2d_bias_kernel, num_heads=H, seq=L,
                             group=g, scale=SCALE, exact=False)
    spec = pl.BlockSpec((g * L, D), lambda i: (i, 0), memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(kern, grid=(B // g,),
                          in_specs=[spec] * 3 + [bspec] * 3,
                          out_specs=spec,
                          out_shape=jax.ShapeDtypeStruct((B * L, D),
                                                         jnp.bfloat16))


def make_bwd_bias(g, defer):
    def kern(q_ref, k_ref, v_ref, do_ref, bq_ref, bk_ref, bv_ref,
             dq_ref, dk_ref, dv_ref, dbq_ref, dbk_ref, dbv_ref):
        f32 = jnp.float32
        bias = ba._mask_bias(ba._block_diag_mask(g * L, L))
        for h in range(H):
            sl = slice(h * HD, (h + 1) * HD)
            qh = q_ref[:, sl] + bq_ref[:, sl]
            kh = k_ref[:, sl] + bk_ref[:, sl]
            vh = v_ref[:, sl] + bv_ref[:, sl]
            doh = do_ref[:, sl]
            s = jax.lax.dot_general(qh, kh, (((1,), (1,)), ((), ())),
                                    preferred_element_type=f32) * SCALE
            if defer:
                e = ba._masked_exp(s, bias, False)
                denom = jnp.sum(e, axis=-1, keepdims=True)
                eb = e.astype(qh.dtype)
                dohn = (doh.astype(f32) / denom).astype(doh.dtype)
                dphat = jax.lax.dot_general(dohn, vh, (((1,), (1,)), ((), ())),
                                            preferred_element_type=f32)
                ds = e * (dphat - jnp.sum(dphat * e, axis=-1, keepdims=True))
                ds = ba._clip_grad_mask(ds, s)
                dsb = (ds * SCALE).astype(qh.dtype)
                pb, dov = eb, dohn
            else:
                p = ba._masked_softmax(s, bias, False)
                dp = jax.lax.dot_general(doh, vh, (((1,), (1,)), ((), ())),
                                         preferred_element_type=f32)
                ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
                ds = ba._clip_grad_mask(ds, s)
                dsb = (ds * SCALE).astype(qh.dtype)
                pb, dov = p.astype(qh.dtype), doh
            dq = jax.lax.dot_general(dsb, kh, (((1,), (0,)), ((), ())),
                                     preferred_element_type=f32)
            dk = jax.lax.dot_general(dsb, qh, (((0,), (0,)), ((), ())),
                                     preferred_element_type=f32)
            dv = jax.lax.dot_general(pb, dov, (((0,), (0,)), ((), ())),
                                     preferred_element_type=f32)
            row0 = jax.lax.broadcasted_iota(jnp.int32, (8, HD), 0) == 0
            dbq_ref[:, sl] = jnp.where(
                row0, jnp.sum(dq, axis=0, keepdims=True), 0.0)
            dbk_ref[:, sl] = jnp.where(
                row0, jnp.sum(dk, axis=0, keepdims=True), 0.0)
            dbv_ref[:, sl] = jnp.where(
                row0, jnp.sum(dv, axis=0, keepdims=True), 0.0)
            dq_ref[:, sl] = dq.astype(dq_ref.dtype)
            dk_ref[:, sl] = dk.astype(dk_ref.dtype)
            dv_ref[:, sl] = dv.astype(dv_ref.dtype)

    spec = pl.BlockSpec((g * L, D), lambda i: (i, 0), memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM)
    dbspec = pl.BlockSpec((8, D), lambda i: (i, 0), memory_space=pltpu.VMEM)
    n_prog = B // g
    return pl.pallas_call(
        kern, grid=(n_prog,),
        in_specs=[spec] * 4 + [bspec] * 3,
        out_specs=(spec,) * 3 + (dbspec,) * 3,
        out_shape=(jax.ShapeDtypeStruct((B * L, D), jnp.bfloat16),) * 3
        + (jax.ShapeDtypeStruct((8 * n_prog, D), jnp.float32),) * 3)


def time_fwd(f, iters=40):
    @jax.jit
    def chain(q, k, v, n):
        def body(_, c):
            return (c + f(c, k, v, bq.reshape(1, D), bk.reshape(1, D),
                          bv.reshape(1, D)) * 1e-6).astype(c.dtype)
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
            outs = f(c, k, v, do, bq.reshape(1, D), bk.reshape(1, D),
                     bv.reshape(1, D))
            return (c + outs[0] * 1e-6).astype(c.dtype)
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


def main():
    print(f"shape B={B} L={L} D={D} H={H} (bias kernels)")
    for g in (2, 4, 8):
        try:
            t = time_fwd(make_fwd_bias(g))
            print(f"fwd  g={g}: {t:.3f} ms")
        except Exception as e:
            print(f"fwd  g={g}: FAIL {type(e).__name__}: {str(e)[:120]}")
    for g in (2, 4):
        for defer in (False, True):
            try:
                t = time_bwd(make_bwd_bias(g, defer))
                tag = "defer" if defer else "norm "
                print(f"bwd  g={g} {tag}: {t:.3f} ms")
            except Exception as e:
                print(f"bwd  g={g} defer={defer}: FAIL "
                      f"{type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    main()
