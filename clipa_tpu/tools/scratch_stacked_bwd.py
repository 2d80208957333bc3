"""Prototype: bwd kernel with all-head stacked softmax/ds VPU phase."""
import time, functools
import jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from clipa_tpu.ops import block_attention as ba

B, L, D, H = 512, 50, 1024, 16
G = 4
N = G * L           # 200
HD = D // H         # 64
key = jax.random.PRNGKey(0)
kq, kk, kv, kd = jax.random.split(key, 4)
q = jax.random.normal(kq, (B * L, D), jnp.bfloat16)
k = jax.random.normal(kk, (B * L, D), jnp.bfloat16)
v = jax.random.normal(kv, (B * L, D), jnp.bfloat16)
do = jax.random.normal(kd, (B * L, D), jnp.bfloat16)
scale = HD ** -0.5

def stacked_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref,
                   s_ref, dp_ref):
    f32 = jnp.float32
    # phase 1: all score + dp dots into stacked scratch (H*N, N)
    for h in range(H):
        sl = slice(h * HD, (h + 1) * HD)
        rows = slice(h * N, (h + 1) * N)
        s_ref[rows, :] = jax.lax.dot_general(
            q_ref[:, sl], k_ref[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=f32)
        dp_ref[rows, :] = jax.lax.dot_general(
            do_ref[:, sl], v_ref[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=f32)
    # phase 2: one big masked softmax + ds over (H*N, N)
    row = jax.lax.broadcasted_iota(jnp.int32, (H * N, N), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (H * N, N), 1)
    same = ((row % N) // L) == (col // L)
    s = jnp.where(same, s_ref[...] * scale, -jnp.inf)
    s = s - jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    dp = dp_ref[...]
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    s_ref[...] = p
    dp_ref[...] = ds * scale
    # phase 3: output dots per head
    for h in range(H):
        sl = slice(h * HD, (h + 1) * HD)
        rows = slice(h * N, (h + 1) * N)
        dsb = dp_ref[rows, :].astype(q_ref.dtype)
        pb = s_ref[rows, :].astype(q_ref.dtype)
        dq_ref[:, sl] = jax.lax.dot_general(
            dsb, k_ref[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dq_ref.dtype)
        dk_ref[:, sl] = jax.lax.dot_general(
            dsb, q_ref[:, sl], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dk_ref.dtype)
        dv_ref[:, sl] = jax.lax.dot_general(
            pb, do_ref[:, sl], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(dv_ref.dtype)

spec = pl.BlockSpec((N, D), lambda i: (i, 0), memory_space=pltpu.VMEM)
stacked = pl.pallas_call(
    stacked_kernel, grid=(B // G,),
    in_specs=[spec] * 4, out_specs=(spec, spec, spec),
    out_shape=tuple(jax.ShapeDtypeStruct((B * L, D), jnp.bfloat16)
                    for _ in range(3)),
    scratch_shapes=[pltpu.VMEM((H * N, N), jnp.float32),
                    pltpu.VMEM((H * N, N), jnp.float32)])

def timeit(f, iters=40):
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

# correctness vs current kernel
ref = ba._call_bwd_2d(q, k, v, do, H, L)
got = stacked(q, k, v, do)
for a, b, name in zip(got, ref, ("dq", "dk", "dv")):
    err = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
    print(f"{name} max|diff| = {err:.6f}")
print(f"stacked bwd: {timeit(stacked):.3f} ms")
