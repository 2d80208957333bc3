"""Experiment: cut VPU passes over the (G*L)^2 domain in the 2D kernels.

Variant A (fwd defer): O = (E @ V) / r — the division moves from the
(G*L, G*L) score matrix to the (G*L, hd) output. Measured -9%.

Variant B (bwd hybrid): keep the current normalized-p structure but get
delta from the identity rowsum(dP * P) == rowsum(dO * O) (O = P@V, P row-
normalized), replacing a (G*L)^2 multiply+reduce with a (G*L, hd) one.
Needs O as an extra kernel input (free: it's the forward output).

Variant C (bwd full-defer): also fold 1/r and scale into the small
operands (flash-attention algebra). Measured SLOWER than current (extra
casts outweigh); kept here as the record.
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from clipa_tpu.ops import block_attention as ba

B, L, D, H = 512, 50, 1024, 16
G = 4
_EXP_CLIP = ba._EXP_CLIP

key = jax.random.PRNGKey(0)
kq, kk, kv, kd = jax.random.split(key, 4)
q = jax.random.normal(kq, (B * L, D), jnp.bfloat16)
k = jax.random.normal(kk, (B * L, D), jnp.bfloat16)
v = jax.random.normal(kv, (B * L, D), jnp.bfloat16)
do = jax.random.normal(kd, (B * L, D), jnp.bfloat16)


def fwd_defer_kernel(q_ref, k_ref, v_ref, o_ref, *, num_heads, seq, group,
                     scale):
    hd = q_ref.shape[-1] // num_heads
    bias = ba._mask_bias(ba._block_diag_mask(group * seq, seq))
    for h in range(num_heads):
        sl = slice(h * hd, (h + 1) * hd)
        qh = q_ref[:, sl]
        kh = k_ref[:, sl]
        s = jax.lax.dot_general(qh, kh, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        e = jnp.exp(jnp.clip(s, -_EXP_CLIP, _EXP_CLIP) + bias)
        r = jnp.sum(e, axis=-1, keepdims=True)
        vh = v_ref[:, sl]
        o = jax.lax.dot_general(e.astype(vh.dtype), vh,
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        o_ref[:, sl] = (o / r).astype(o_ref.dtype)


def bwd_hybrid_kernel(q_ref, k_ref, v_ref, o_ref, do_ref,
                      dq_ref, dk_ref, dv_ref, *, num_heads, seq, group,
                      scale):
    """Current bwd structure; only delta moves to the (G*L, hd) domain."""
    hd = q_ref.shape[-1] // num_heads
    f32 = jnp.float32
    bias = ba._mask_bias(ba._block_diag_mask(group * seq, seq))
    for h in range(num_heads):
        sl = slice(h * hd, (h + 1) * hd)
        qh = q_ref[:, sl]
        kh = k_ref[:, sl]
        vh = v_ref[:, sl]

        s = jax.lax.dot_general(qh, kh, (((1,), (1,)), ((), ())),
                                preferred_element_type=f32) * scale
        p = ba._masked_softmax(s, bias)
        doh = do_ref[:, sl]
        dp = jax.lax.dot_general(doh, vh, (((1,), (1,)), ((), ())),
                                 preferred_element_type=f32)
        delta = jnp.sum(do_ref[:, sl].astype(f32) * o_ref[:, sl].astype(f32),
                        axis=-1, keepdims=True)
        ds = p * (dp - delta)
        dsb = (ds * scale).astype(qh.dtype)
        pb = p.astype(qh.dtype)

        dq = jax.lax.dot_general(dsb, kh, (((1,), (0,)), ((), ())),
                                 preferred_element_type=f32)
        dk = jax.lax.dot_general(dsb, qh, (((0,), (0,)), ((), ())),
                                 preferred_element_type=f32)
        dv = jax.lax.dot_general(pb, doh, (((0,), (0,)), ((), ())),
                                 preferred_element_type=f32)
        dq_ref[:, sl] = dq.astype(dq_ref.dtype)
        dk_ref[:, sl] = dk.astype(dk_ref.dtype)
        dv_ref[:, sl] = dv.astype(dv_ref.dtype)


def _call(kernel, n_in, n_out, **kw):
    scale = (D // H) ** -0.5
    spec = pl.BlockSpec((G * L, D), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    out_shape = (jax.ShapeDtypeStruct((B * L, D), jnp.bfloat16)
                 if n_out == 1 else
                 tuple(jax.ShapeDtypeStruct((B * L, D), jnp.bfloat16)
                       for _ in range(n_out)))
    return pl.pallas_call(
        functools.partial(kernel, num_heads=H, seq=L, group=G, scale=scale,
                          **kw),
        grid=(B // G,), in_specs=[spec] * n_in,
        out_specs=spec if n_out == 1 else (spec,) * n_out,
        out_shape=out_shape)


def timeit(f, *args, iters=30):
    f = jax.jit(f)
    r = f(*args)
    jax.tree_util.tree_map(
        lambda x: float(jnp.sum(x.astype(jnp.float32))), r)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(iters):
            r = f(*args)
        jax.tree_util.tree_map(
            lambda x: float(jnp.sum(x.astype(jnp.float32))), r)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def maxdiff(a, b):
    return float(jnp.max(jnp.abs(jnp.asarray(a, jnp.float32)
                                 - jnp.asarray(b, jnp.float32))))


if __name__ == "__main__":
    o_cur = ba._call_fwd_2d(q, k, v, H, L)
    o_new = _call(fwd_defer_kernel, 3, 1)(q, k, v)
    print(f"fwd defer  max|diff| vs current: {maxdiff(o_cur, o_new):.2e}")

    d_cur = ba._call_bwd_2d(q, k, v, do, H, L)
    d_hyb = _call(bwd_hybrid_kernel, 5, 3)(q, k, v, o_cur, do)
    for name, a, b in zip(("dq", "dk", "dv"), d_hyb, d_cur):
        print(f"bwd hybrid {name} max|diff| vs current: {maxdiff(a, b):.2e}")

    t = timeit(lambda q, k, v: ba._call_fwd_2d(q, k, v, H, L), q, k, v)
    print(f"fwd current: {t:.3f} ms")
    t = timeit(_call(fwd_defer_kernel, 3, 1), q, k, v)
    print(f"fwd defer:   {t:.3f} ms")
    t = timeit(lambda q, k, v, do: ba._call_bwd_2d(q, k, v, do, H, L),
               q, k, v, do)
    print(f"bwd current: {t:.3f} ms")
    t = timeit(_call(bwd_hybrid_kernel, 5, 3), q, k, v, o_cur, do)
    print(f"bwd hybrid:  {t:.3f} ms")
