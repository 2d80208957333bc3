"""Fused multi-head attention for CLIPA-scale sequences (Pallas, TPU).

Replaces the XLA einsum-softmax path (and the reference's stock flax
attention, clipa_jax/models/vit.py:126) for every CLIPA resolution:
112px -> 50 tokens, 224px -> 257, 336px -> 577. Two measured facts on the
bench chip (v5e, ~209 TF/s bf16, ~300 GB/s effective HBM) drive the design:

  * The XLA path materializes fp32 ``(B, H, L, L)`` score tensors in HBM.
    At L=50 the (8,128) tile padding inflates them 2.9x (78 MB -> 224 MB
    per block), and without remat the softmax output is *also* saved for
    the backward pass. Attention measured 1.46 ms/block forward against a
    ~0.2 ms compute floor — pure HBM traffic.
  * 4D ``(B, L, H, head_dim)`` operands lane-pad head_dim 64 -> 128,
    doubling q/k/v/out HBM bytes. This kernel therefore takes the packed
    3D ``(B, L, D)`` layout and splits heads on-chip.

Kernel shape: grid ``(B/G, H/head_chunk, L/block_q)``. Each program holds
a (G, L, head_chunk*hd) K/V slab (revisited across the q-tile sweep, so it
is fetched once per sample group) plus one (G, block_q, head_chunk*hd)
q-tile, and runs its head chunk to completion — scores and softmax never
touch HBM, and because the full key length is present there is no
online-softmax rescaling. At pretrain lengths the plan keeps all heads in
one program (head axis of 1); at fine-tune lengths (224px: L=257, 336px:
L=577) it slices the D axis per head chunk so the backward keeps
whole-sequence q-tiles instead of collapsing to bq=32 (measured 336px:
the bq=32 backward lost to the XLA einsum path). The custom VJP
recomputes scores/softmax in the backward kernel from (q, k, v), so the
forward saves no attention residuals at all (the flash-attention trade:
~30% more attention FLOPs for zero score traffic; attention FLOPs are <2%
of a CLIPA step). dK/dV accumulate in fp32 across q-tiles inside resident
output blocks.

Measured vs the XLA path on the bench chip (bf16, 16 heads):
  (512, 50, hd 64):  fwd 1.44 -> 0.61 ms, fwd+bwd 4.38 -> 2.86 ms
  (256, 257, hd 64): fwd 6.23 -> 1.75 ms, fwd+bwd 22.3 -> 8.4 ms

For shapes whose K/V slab exceeds the VMEM budget dispatch falls back to
`ops.flash_attention` (tiled online softmax) via `ops.attention`.

Interpret mode runs the same kernels on CPU for tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

# Separate budgets: Mosaic's own buffering overhead bites harder in the
# backward kernel (three output blocks, two of them revisited fp32
# accumulators), so its plan is capped tighter than the forward's.
_VMEM_BUDGET_FWD = 13 * 1024 * 1024
_VMEM_BUDGET_BWD = 10 * 1024 * 1024


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _plan(batch: int, seq: int, d_model: int, num_heads: int, bwd: bool):
    """Returns (group, block_q, head_chunk) or None if nothing fits VMEM.

    Prefers the largest q-tile (MXU efficiency: the score matmuls are
    (bq x hd) @ (hd x L) per head — small bq starves the systolic array),
    then the most heads per program (fewer programs), then the largest
    batch group. When the full-H working set doesn't fit at a healthy
    q-tile (336px: L=577 forced bq=32 before), the grid gains a head axis
    and every block slices `head_chunk * hd` lanes of D — the K/V slab and
    q/do/dq tiles shrink by H/head_chunk while score temps are unchanged,
    buying back whole-sequence q-tiles at fine-tune lengths."""
    hd = d_model // num_heads
    head_chunks = [num_heads]
    c = num_heads // 2
    # Sliced blocks need a lane-tile-aligned width (128); the full-H block
    # is d_model wide and always aligned.
    while c >= 1 and num_heads % c == 0 and (c * hd) % 128 == 0:
        head_chunks.append(c)
        c //= 2

    def fits(g, bq, hc):
        dh = hc * hd
        kv = 2 * g * seq * dh * 2 * 2               # k/v slabs, double-buffered
        if bwd:
            kv += 2 * g * seq * dh * 4               # dk/dv fp32 accumulators
        tiles = (3 if not bwd else 4) * g * bq * dh * 2 * 2
        scores = 3 * g * bq * seq * 4                # s/p/ds fp32 temps
        budget = _VMEM_BUDGET_BWD if bwd else _VMEM_BUDGET_FWD
        return kv + tiles + scores < budget

    for bq in (512, 256, 128, 64, 32):
        bq = min(bq, seq)
        for hc in head_chunks:
            for g in (16, 8, 4, 2, 1):
                if batch % g:
                    continue
                if fits(g, bq, hc):
                    return g, bq, hc
    return None


def eligible(q_shape, num_heads: int, mask) -> bool:
    """Whether the fused kernel can run for these shapes.

    Gates on the *forward* plan only: when the backward working set does
    not fit VMEM (H/14 @ 336px), the VJP falls back to XLA einsum math —
    scores then exist only transiently inside the backward pass, so the
    forward still saves all its time and residual memory."""
    b, l, d = q_shape
    hd = d // num_heads
    return (mask is None and hd * num_heads == d and hd % 8 == 0
            and _plan(b, l, d, num_heads, bwd=False) is not None)


def _bdot(a, b, contract, batch=((0,), (0,))):
    return jax.lax.dot_general(a, b, (contract, batch),
                               preferred_element_type=jnp.float32)


# fp32 exp is finite for |s| <= 87 (overflow at 88.7, underflow to
# subnormals at -87.3); softmax rows clipped at +-70 deviate from the
# exact result only when a row's true max exceeds 70 — a regime where the
# softmax is already saturated one-hot and training long dead. 70 (not 80)
# leaves headroom for the deferred-normalization kernels, whose fp32 E@V
# accumulation sums n unnormalized exp values times |v|: e^70 * 512 * 1e4
# ~= 1.3e37 < fp32 max, where e^80 could overflow to inf before the
# divide. Denominators live in [e^-70, n*e^70]: never 0, never inf.
#
# Saturation is not silent: the backward kernels zero d(logit) where the
# clip is active (the true gradient of a clipped input), so a tower whose
# logits run past the clip shows collapsing attention gradients in the
# step's l2_grads metric rather than plausible-but-wrong updates. For long
# fine-tunes where logit growth past 70 is a real risk, the towers accept
# `attn_impl="fused_exact"` — the same kernels with the rowmax-subtracted
# softmax (exact at any logit scale, ~35-45% slower kernel time from the
# lane-axis max reduce; tools/attn_sweep.py).
_EXP_CLIP = 70.0


def _softmax(s, exact: bool = False):
    # No rowmax subtraction by default: the lane-axis max reduce is the
    # single most expensive VPU op in these kernels (measured ~35-45% of
    # fwd kernel time at the flagship shape — tools/attn_sweep.py;
    # lane reductions can't ride the MXU the way sum reductions do). The
    # clip above replaces it for numeric safety; `exact` restores it.
    if exact:
        e = jnp.exp(s - jnp.max(s, axis=-1, keepdims=True))
    else:
        e = jnp.exp(jnp.clip(s, -_EXP_CLIP, _EXP_CLIP))
    return e / jnp.sum(e, axis=-1, keepdims=True)


def _clip_grad_mask(ds, s):
    """d(clip)/ds is 0 where the clip saturates: zeroing ds there keeps the
    custom VJP the true gradient of the clipped forward (otherwise the
    saturation regime gets plausible-but-wrong updates, invisible to
    gradient checks because custom_vjp hides the mismatch)."""
    return jnp.where(jnp.abs(s) >= _EXP_CLIP, 0.0, ds)


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, num_heads: int, scale: float,
                exact: bool):
    hd = q_ref.shape[-1] // num_heads
    for h in range(num_heads):
        sl = slice(h * hd, (h + 1) * hd)
        # Operands go to the MXU in the input dtype (bf16 in training) with
        # an fp32 accumulator, and the scale lands on the fp32 scores —
        # operand order and rounding exactly as the XLA einsum path. An
        # earlier revision upcast q/k to fp32 before the dot; fp32 MXU
        # passes run at a fraction of the bf16 rate, which dominated the
        # kernel at fine-tune lengths (L=257/577) where score FLOPs are real.
        qh = q_ref[:, :, sl]                               # (G, bq, hd)
        kh = k_ref[:, :, sl]                               # (G, L, hd)
        p = _softmax(_bdot(qh, kh, ((2,), (2,))) * scale,
                     exact=exact)                          # (G, bq, L) fp32
        vh = v_ref[:, :, sl]
        o = _bdot(p.astype(vh.dtype), vh, ((2,), (1,)))
        o_ref[:, :, sl] = o.astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref, *,
                num_heads: int, scale: float, seq: int, block_q: int,
                accumulate: bool, exact: bool):
    # `num_heads` is the heads present in this block (the plan's head
    # chunk); blocks slice the D axis when the grid has a head dimension.
    # `accumulate` is set when the q-tile sweep revisits the dK/dV blocks
    # (cdiv(L, block_q) > 1): they are then fp32 HBM accumulators. With a
    # single q-tile they are written once, directly in the operand dtype —
    # half the dK/dV write traffic at every pretrain shape.
    hd = q_ref.shape[-1] // num_heads
    j = pl.program_id(2)

    if accumulate:
        @pl.when(j == 0)
        def _():
            dk_ref[...] = jnp.zeros(dk_ref.shape, dk_ref.dtype)
            dv_ref[...] = jnp.zeros(dv_ref.shape, dv_ref.dtype)

    # Rows of the final q-tile past the true sequence end must not
    # contribute to the dK/dV accumulations. The q/do loads themselves are
    # masked too: the padded rows hold uninitialized data, and a NaN there
    # would poison the contraction over the q-tile axis (0 * NaN) even
    # with p/ds zeroed.
    if seq % block_q:
        row = jax.lax.broadcasted_iota(
            jnp.int32, (q_ref.shape[0], block_q, 1), 1) + j * block_q
        row_ok = row < seq
    else:
        row_ok = None

    for h in range(num_heads):
        sl = slice(h * hd, (h + 1) * hd)
        # Input-dtype MXU operands throughout (see _fwd_kernel): the five
        # backward dots were the fp32-pass hotspot. The softmax recompute
        # uses the same dot+scale order as the forward, so the recomputed
        # probabilities match the forward's bit for bit.
        qh = q_ref[:, :, sl]
        kh = k_ref[:, :, sl]
        vh = v_ref[:, :, sl]
        doh = do_ref[:, :, sl]
        if row_ok is not None:
            qh = jnp.where(row_ok, qh, 0)
            doh = jnp.where(row_ok, doh, 0)

        s = _bdot(qh, kh, ((2,), (2,))) * scale            # (G, bq, L) fp32
        p = _softmax(s, exact=exact)
        dp = _bdot(doh, vh, ((2,), (2,)))                  # (G, bq, L) fp32
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        if not exact:
            ds = _clip_grad_mask(ds, s)
        if row_ok is not None:
            p = jnp.where(row_ok, p, 0.0)
            ds = jnp.where(row_ok, ds, 0.0)
        # d(logits) carries the scale (logits = (q.k) * scale); cast once to
        # the operand dtype so dq/dk ride the MXU at the bf16 rate.
        dsb = (ds * scale).astype(qh.dtype)
        pb = p.astype(qh.dtype)

        dq = _bdot(dsb, kh, ((2,), (1,)))                  # (G, bq, hd)
        dk = _bdot(dsb, qh, ((1,), (1,)))                  # (G, L, hd)
        dv = _bdot(pb, doh, ((1,), (1,)))                  # (G, L, hd)

        dq_ref[:, :, sl] = dq.astype(dq_ref.dtype)
        if accumulate:
            dk_ref[:, :, sl] += dk
            dv_ref[:, :, sl] += dv
        else:
            dk_ref[:, :, sl] = dk.astype(dk_ref.dtype)
            dv_ref[:, :, sl] = dv.astype(dv_ref.dtype)


def _call_fwd(q, k, v, num_heads, exact=False):
    b, l, d = q.shape
    g, bq, hc = _plan(b, l, d, num_heads, bwd=False)
    dh = hc * (d // num_heads)
    scale = (d // num_heads) ** -0.5
    qspec = pl.BlockSpec((g, bq, dh), lambda i, h, j: (i, j, h),
                         memory_space=pltpu.VMEM)
    kvspec = pl.BlockSpec((g, l, dh), lambda i, h, j: (i, 0, h),
                          memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, num_heads=hc, scale=scale,
                          exact=exact),
        grid=(b // g, num_heads // hc, pl.cdiv(l, bq)),
        in_specs=[qspec, kvspec, kvspec],
        out_specs=qspec,
        out_shape=jax.ShapeDtypeStruct((b, l, d), q.dtype),
        interpret=_interpret(),
    )(q, k, v)


def _xla_reference(q, k, v, num_heads):
    """The einsum-softmax math the kernel implements, used as the VJP
    fallback when the backward kernel's working set exceeds VMEM."""
    b, l, d = q.shape
    hd = d // num_heads
    q4 = q.reshape(b, l, num_heads, hd)
    k4 = k.reshape(b, l, num_heads, hd)
    v4 = v.reshape(b, l, num_heads, hd)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q4, k4,
                        preferred_element_type=jnp.float32) * (hd ** -0.5)
    weights = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", weights.astype(q.dtype), v4,
                     preferred_element_type=jnp.float32)
    return out.astype(q.dtype).reshape(b, l, d)


def _call_bwd(q, k, v, do, num_heads, exact=False):
    b, l, d = q.shape
    plan = _plan(b, l, d, num_heads, bwd=True)
    if plan is None:
        _, vjp = jax.vjp(lambda q, k, v: _xla_reference(q, k, v, num_heads),
                         q, k, v)
        return vjp(do)
    g, bq, hc = plan
    dh = hc * (d // num_heads)
    scale = (d // num_heads) ** -0.5
    # dK/dV only need fp32 HBM accumulators when several q-tiles revisit
    # them; a single-tile sweep (every pretrain length) writes them once,
    # in the operand dtype.
    accumulate = pl.cdiv(l, bq) > 1
    acc_dt = jnp.float32 if accumulate else k.dtype
    qspec = pl.BlockSpec((g, bq, dh), lambda i, h, j: (i, j, h),
                         memory_space=pltpu.VMEM)
    kvspec = pl.BlockSpec((g, l, dh), lambda i, h, j: (i, 0, h),
                          memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, num_heads=hc, scale=scale,
                          seq=l, block_q=bq, accumulate=accumulate,
                          exact=exact),
        grid=(b // g, num_heads // hc, pl.cdiv(l, bq)),
        in_specs=[qspec, kvspec, kvspec, qspec],
        out_specs=(qspec, kvspec, kvspec),
        out_shape=(jax.ShapeDtypeStruct((b, l, d), q.dtype),
                   jax.ShapeDtypeStruct((b, l, d), acc_dt),
                   jax.ShapeDtypeStruct((b, l, d), acc_dt)),
        interpret=_interpret(),
    )(q, k, v, do)
    return dq, dk.astype(k.dtype), dv.astype(v.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def fused_attention(q: Array, k: Array, v: Array, num_heads: int,
                    exact: bool = False) -> Array:
    """Multi-head self-attention over packed (B, L, D) operands.

    Scores/softmax stay in VMEM; backward recomputes them (no residuals
    besides q, k, v). Equivalent to the XLA einsum path with fp32 softmax.
    `exact` selects the rowmax-subtracted softmax (see _EXP_CLIP).
    """
    return _call_fwd(q, k, v, num_heads, exact)


def _fused_fwd(q, k, v, num_heads, exact):
    return _call_fwd(q, k, v, num_heads, exact), (q, k, v)


def _fused_bwd(num_heads, exact, res, do):
    q, k, v = res
    return _call_bwd(q, k, v, do, num_heads, exact)


fused_attention.defvjp(_fused_fwd, _fused_bwd)


# ---------------------------------------------------------------------------
# 2D-operand variant: the whole residual stream stays (B*L, D)
# ---------------------------------------------------------------------------
#
# Why a second kernel: at the flagship pretrain shape (bf16[512, 50, 1024])
# XLA's layout assignment holds 3D intermediates L-major (the {2,1,0} default
# would sublane-pad 50 -> 64 in HBM), but a Pallas custom call requires the
# default layout on its operands — so every 3D kernel boundary costs a
# transposing copy (~10 GB/step, 192 copies, measured r2/r3). With 2D
# (B·L, D) operands AND a 2D residual stream in the encoder, no 3D tensor
# exists anywhere between patchify and pooling, leaving XLA nothing to
# re-lay-out.
#
# Kernel structure (measured trade, bench chip): each program owns `group`
# full samples; per head it computes ONE (G·L, G·L) score dot over all of
# them and masks the off-block-diagonal (cross-sample) pairs. The exact
# per-sample alternative — slicing each sample's L rows out of the slab —
# needs sublane-misaligned slices whenever L % 8 != 0 (CLIPA's L=50), which
# measured 2x slower, and its G·H-way Python unroll OOMed the XLA compile
# service at 24 encoder instances. The masked form keeps the unroll at H
# segments (same as the 3D kernel), all loads tile-aligned, and MXU-shaped
# (G·L, hd) dots, at the cost of G x score FLOPs — attention scores are
# <1% of a CLIPA step, and G is capped where the waste stays negligible.
# The backward needs no cross-program dK/dV accumulation at all (the
# q-tile spans the whole sequence; CLIPA sequences are short by design,
# SURVEY §5.7).

_MAX_GROUP_2D = 8


def _plan_2d(batch: int, seq: int, d_model: int, num_heads: int, bwd: bool,
             bias: bool = False):
    """Returns the per-program sample group G, or None if nothing fits."""
    def fits(g):
        n = g * seq
        slabs = (4 if not bwd else 7) * n * d_model * 2 * 2
        # live fp32 (n, n) score temps: s/p (+dp/ds in bwd) + iota mask
        temps = (3 if not bwd else 5) * n * n * 4
        if bias:
            # bias-fused variant: three (1, d) bias inputs (8-sublane-padded
            # tiles, double-buffered) and, in the backward, three (8, d)
            # fp32 bias-grad partial output blocks (double-buffered).
            slabs += 3 * 8 * d_model * 2 * 2
            if bwd:
                slabs += 3 * 8 * d_model * 4 * 2
        budget = _VMEM_BUDGET_BWD if bwd else _VMEM_BUDGET_FWD
        return slabs + temps < budget

    def ok(g):
        # Mosaic block constraint: second-minor block dim must be 8-divisible
        # (unless it equals the array dim). The g x score-FLOP waste is the
        # masked-dot trade; bounded by _MAX_GROUP_2D.
        return not (batch % g or (g * seq) % 8 or g > _MAX_GROUP_2D)

    # Prefer the SMALLEST group whose score rows still fill an MXU pass
    # (g*seq >= 128): both the wasted cross-sample score FLOPs and the
    # masked-softmax VPU work scale linearly with g, and at the flagship
    # shape (B=512, L=50) g=4 measured 2.6x faster forward / 14% faster
    # fwd+bwd than g=8 (this session's _bench_attn2d sweep). Groups below
    # 128 rows starve the systolic array; larger-first remains the
    # VMEM-pressure fallback.
    for g in (1, 2, 4, 8):
        if g * seq >= 128 and ok(g) and fits(g):
            return g
    for g in (8, 4, 2, 1):
        if ok(g) and fits(g):
            return g
    return None


def eligible_2d(rows: int, d_model: int, num_heads: int, seq: int,
                mask, bias: bool = False) -> bool:
    """Whether the 2D fused kernel should run for (rows=B*L, D) operands.

    Gates on BOTH the forward and backward 2D plans: the 2D kernel's win
    is layout-copy avoidance at short sequences (L~50), where both fit.
    At fine-tune lengths whose 2D backward working set exceeds VMEM
    (L=138/197/257), the per-sample 3D kernel is faster in the forward
    too (no cross-sample score waste: (g*L)^2 vs g*L^2 VPU work) and r3
    measured no layout-copy penalty there — so dispatch routes 3D for
    both directions instead of pairing a 2D forward with a fallback
    backward."""
    if mask is not None or rows % seq:
        return False
    hd = d_model // num_heads
    if hd * num_heads != d_model or hd % 8:
        return False
    batch = rows // seq
    return (_plan_2d(batch, seq, d_model, num_heads, bwd=False,
                     bias=bias) is not None
            and _plan_2d(batch, seq, d_model, num_heads, bwd=True,
                         bias=bias) is not None)


def _block_diag_mask(n: int, seq: int):
    """(n, n) bool: True where rows/cols belong to the same sample."""
    row = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return (row // seq) == (col // seq)


def _mask_bias(same):
    """Additive mask: 0 on same-sample entries, -1e30 across samples (so
    exp underflows to exactly 0). One select per program instead of a
    where() per head."""
    return jnp.where(same, 0.0, -1e30)


def _masked_softmax(s, bias, exact: bool = False):
    # clip-then-bias: masked entries land at -1e30 -> exp == 0 exactly;
    # unmasked rows keep >= seq entries in [e^-clip, e^clip], so
    # denominators are never 0. No rowmax reduce by default — see _softmax
    # for the rationale; `exact` restores it (max over s+bias so masked
    # entries never win; the block diagonal guarantees an unmasked max).
    e = _masked_exp(s, bias, exact)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def _masked_exp(s, bias, exact: bool):
    if exact:
        sb = s + bias
        return jnp.exp(sb - jnp.max(sb, axis=-1, keepdims=True))
    return jnp.exp(jnp.clip(s, -_EXP_CLIP, _EXP_CLIP) + bias)


def _fwd2d_kernel(q_ref, k_ref, v_ref, o_ref, *, num_heads: int, seq: int,
                  group: int, scale: float, exact: bool):
    hd = q_ref.shape[-1] // num_heads
    bias = _mask_bias(_block_diag_mask(group * seq, seq))
    for h in range(num_heads):
        sl = slice(h * hd, (h + 1) * hd)
        # Input-dtype MXU operands, scale on the fp32 scores (see
        # _fwd_kernel — same XLA-path order, full bf16 MXU rate).
        qh = q_ref[:, sl]                                    # (G*L, hd)
        kh = k_ref[:, sl]
        s = jax.lax.dot_general(qh, kh, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        # Deferred normalization: O = (E @ V) / r moves the division from
        # the (G*L, G*L) score domain to the (G*L, hd) output domain —
        # measured -10% fwd kernel time at the flagship shape (B=512,
        # L=50, D=1024; tools/attn_sweep.py measured history). exp(clip+bias) keeps
        # masked entries at exactly 0 and r >= seq*e^-clip > 0 (see
        # _masked_softmax). E is cast to the MXU input dtype BEFORE
        # normalization either way, so numerics match the normalized
        # kernel to 1 bf16 ulp.
        e = _masked_exp(s, bias, exact)
        r = jnp.sum(e, axis=-1, keepdims=True)
        vh = v_ref[:, sl]
        o = jax.lax.dot_general(e.astype(vh.dtype), vh,
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        o_ref[:, sl] = (o / r).astype(o_ref.dtype)


def _bwd2d_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref, *,
                  num_heads: int, seq: int, group: int, scale: float,
                  exact: bool):
    hd = q_ref.shape[-1] // num_heads
    f32 = jnp.float32
    bias = _mask_bias(_block_diag_mask(group * seq, seq))
    for h in range(num_heads):
        sl = slice(h * hd, (h + 1) * hd)
        # Input-dtype MXU operands for all five dots (see _bwd_kernel);
        # softmax recompute uses the forward's dot+scale order.
        qh = q_ref[:, sl]
        kh = k_ref[:, sl]
        vh = v_ref[:, sl]
        doh = do_ref[:, sl]

        s = jax.lax.dot_general(qh, kh, (((1,), (1,)), ((), ())),
                                preferred_element_type=f32) * scale
        p = _masked_softmax(s, bias, exact)                   # (G*L, G*L)
        dp = jax.lax.dot_general(doh, vh, (((1,), (1,)), ((), ())),
                                 preferred_element_type=f32)
        # masked entries have p == 0, so ds == 0 there: the cross-sample
        # blocks contribute nothing to dq/dk/dv (exactness preserved).
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        if not exact:
            ds = _clip_grad_mask(ds, s)
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


def _call_fwd_2d(q, k, v, num_heads, seq, exact=False):
    rows, d = q.shape
    batch = rows // seq
    g = _plan_2d(batch, seq, d, num_heads, bwd=False)
    if g is None:  # no 8-divisible group fits: XLA einsum math instead
        return _xla_reference_2d(q, k, v, num_heads, seq)
    scale = (d // num_heads) ** -0.5
    spec = pl.BlockSpec((g * seq, d), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_fwd2d_kernel, num_heads=num_heads, seq=seq,
                          group=g, scale=scale, exact=exact),
        grid=(batch // g,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((rows, d), q.dtype),
        interpret=_interpret(),
    )(q, k, v)


def _xla_reference_2d(q, k, v, num_heads, seq):
    rows, d = q.shape
    b = rows // seq
    out = _xla_reference(q.reshape(b, seq, d), k.reshape(b, seq, d),
                         v.reshape(b, seq, d), num_heads)
    return out.reshape(rows, d)


def _call_bwd_2d(q, k, v, do, num_heads, seq, exact=False):
    rows, d = q.shape
    batch = rows // seq
    g = _plan_2d(batch, seq, d, num_heads, bwd=True)
    if g is None:
        # The 2D working set is quadratic in g*seq, so fine-tune lengths
        # (224px masked: L=138; unmasked: 197/257) often fit no 2D group —
        # but the 3D kernel's head-chunk axis shrinks ITS slabs by
        # H/head_chunk, so try it before XLA einsum math: the XLA VJP
        # materializes fp32 (B, H, L, L) score tensors in HBM (measured
        # r5 at 224px/B=256: 153 GB/step of bandwidth-bound fusions, the
        # whole step at 69 TF/s). The flat->3D reshape is a bitcast under
        # default layouts.
        if _plan(batch, seq, d, num_heads, bwd=True) is not None:
            dq, dk, dv = _call_bwd(q.reshape(batch, seq, d),
                                   k.reshape(batch, seq, d),
                                   v.reshape(batch, seq, d),
                                   do.reshape(batch, seq, d),
                                   num_heads, exact)
            return (dq.reshape(rows, d), dk.reshape(rows, d),
                    dv.reshape(rows, d))
        _, vjp = jax.vjp(
            lambda q, k, v: _xla_reference_2d(q, k, v, num_heads, seq),
            q, k, v)
        return vjp(do)
    scale = (d // num_heads) ** -0.5
    spec = pl.BlockSpec((g * seq, d), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_bwd2d_kernel, num_heads=num_heads, seq=seq,
                          group=g, scale=scale, exact=exact),
        grid=(batch // g,),
        in_specs=[spec, spec, spec, spec],
        out_specs=(spec, spec, spec),
        out_shape=(jax.ShapeDtypeStruct((rows, d), q.dtype),
                   jax.ShapeDtypeStruct((rows, d), k.dtype),
                   jax.ShapeDtypeStruct((rows, d), v.dtype)),
        interpret=_interpret(),
    )(q, k, v, do)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_attention_2d(q: Array, k: Array, v: Array, num_heads: int,
                       seq: int, exact: bool = False) -> Array:
    """Multi-head self-attention over flat (B*L, D) operands.

    Row i belongs to sample i // seq. Math identical to `fused_attention`
    (and the XLA einsum path); the flat operand layout is what keeps the
    encoder's residual stream free of 3D layout copies. `exact` selects
    the rowmax-subtracted softmax (see _EXP_CLIP).
    """
    return _call_fwd_2d(q, k, v, num_heads, seq, exact)


def _fused2d_fwd(q, k, v, num_heads, seq, exact):
    return _call_fwd_2d(q, k, v, num_heads, seq, exact), (q, k, v)


def _fused2d_bwd(num_heads, seq, exact, res, do):
    q, k, v = res
    return _call_bwd_2d(q, k, v, do, num_heads, seq, exact)


fused_attention_2d.defvjp(_fused2d_fwd, _fused2d_bwd)


# ---------------------------------------------------------------------------
# Bias-fused variant: QKV projection biases ride the attention kernels
# ---------------------------------------------------------------------------
#
# In the unfused graph the projection bias is free in the FORWARD (XLA folds
# the (D,) add into the GEMM epilogue) but costs real time in the BACKWARD:
# each bias grad is a standalone rowsum over the (B·L, D) dq/dk/dv tensor the
# Pallas VJP just wrote — XLA cannot input-fuse a reduce across the custom-
# call boundary, so it re-reads the whole tensor from HBM (measured 72
# reduce_sum ops, 3.5 ms/step at the flagship shape). Here the bias add
# moves inside the kernels (same operand rounding: round(dot) is already in
# the q/k/v refs, the bias add rounds once — identical to the GEMM-epilogue
# order) and the backward emits per-program bias-grad partials from the
# VMEM-resident dq/dk/dv tiles, so the big tensors are read exactly once.

def _fwd2d_bias_kernel(q_ref, k_ref, v_ref, bq_ref, bk_ref, bv_ref, o_ref, *,
                       num_heads: int, seq: int, group: int, scale: float,
                       exact: bool):
    hd = q_ref.shape[-1] // num_heads
    bias = _mask_bias(_block_diag_mask(group * seq, seq))
    for h in range(num_heads):
        sl = slice(h * hd, (h + 1) * hd)
        qh = q_ref[:, sl] + bq_ref[:, sl]
        kh = k_ref[:, sl] + bk_ref[:, sl]
        s = jax.lax.dot_general(qh, kh, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        e = _masked_exp(s, bias, exact)
        r = jnp.sum(e, axis=-1, keepdims=True)
        vh = v_ref[:, sl] + bv_ref[:, sl]
        o = jax.lax.dot_general(e.astype(vh.dtype), vh,
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        o_ref[:, sl] = (o / r).astype(o_ref.dtype)


def _bwd2d_bias_kernel(q_ref, k_ref, v_ref, do_ref, bq_ref, bk_ref, bv_ref,
                       dq_ref, dk_ref, dv_ref, dbq_ref, dbk_ref, dbv_ref, *,
                       num_heads: int, seq: int, group: int, scale: float,
                       exact: bool):
    hd = q_ref.shape[-1] // num_heads
    f32 = jnp.float32
    bias = _mask_bias(_block_diag_mask(group * seq, seq))
    for h in range(num_heads):
        sl = slice(h * hd, (h + 1) * hd)
        qh = q_ref[:, sl] + bq_ref[:, sl]
        kh = k_ref[:, sl] + bk_ref[:, sl]
        vh = v_ref[:, sl] + bv_ref[:, sl]
        doh = do_ref[:, sl]

        s = jax.lax.dot_general(qh, kh, (((1,), (1,)), ((), ())),
                                preferred_element_type=f32) * scale
        p = _masked_softmax(s, bias, exact)                   # (G*L, G*L)
        dp = jax.lax.dot_general(doh, vh, (((1,), (1,)), ((), ())),
                                 preferred_element_type=f32)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        if not exact:
            ds = _clip_grad_mask(ds, s)
        dsb = (ds * scale).astype(qh.dtype)
        pb = p.astype(qh.dtype)

        dq = jax.lax.dot_general(dsb, kh, (((1,), (0,)), ((), ())),
                                 preferred_element_type=f32)
        dk = jax.lax.dot_general(dsb, qh, (((0,), (0,)), ((), ())),
                                 preferred_element_type=f32)
        dv = jax.lax.dot_general(pb, doh, (((0,), (0,)), ((), ())),
                                 preferred_element_type=f32)
        # Bias-grad partials from the VMEM-resident f32 grads (the whole
        # point of this kernel): one sublane reduce per head, no HBM re-read.
        # The partial blocks are (8, d) — Mosaic requires an 8-divisible
        # second-to-last block dim, so a (1, d) block is illegal for
        # n_prog > 1 — with the rowsum in row 0 and zeros below (an iota
        # select; full-sublane stores avoid masked single-row stores).
        row0 = jax.lax.broadcasted_iota(jnp.int32, (8, hd), 0) == 0
        dbq_ref[:, sl] = jnp.where(row0, jnp.sum(dq, axis=0, keepdims=True),
                                   0.0).astype(dbq_ref.dtype)
        dbk_ref[:, sl] = jnp.where(row0, jnp.sum(dk, axis=0, keepdims=True),
                                   0.0).astype(dbk_ref.dtype)
        dbv_ref[:, sl] = jnp.where(row0, jnp.sum(dv, axis=0, keepdims=True),
                                   0.0).astype(dbv_ref.dtype)
        dq_ref[:, sl] = dq.astype(dq_ref.dtype)
        dk_ref[:, sl] = dk.astype(dk_ref.dtype)
        dv_ref[:, sl] = dv.astype(dv_ref.dtype)


def _call_fwd_2d_b(q, k, v, bq, bk, bv, num_heads, seq, exact=False):
    rows, d = q.shape
    batch = rows // seq
    g = _plan_2d(batch, seq, d, num_heads, bwd=False, bias=True)
    if g is None:
        return _xla_reference_2d(q + bq, k + bk, v + bv, num_heads, seq)
    scale = (d // num_heads) ** -0.5
    spec = pl.BlockSpec((g * seq, d), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_fwd2d_bias_kernel, num_heads=num_heads, seq=seq,
                          group=g, scale=scale, exact=exact),
        grid=(batch // g,),
        in_specs=[spec, spec, spec, bspec, bspec, bspec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((rows, d), q.dtype),
        interpret=_interpret(),
    )(q, k, v, bq.reshape(1, d), bk.reshape(1, d), bv.reshape(1, d))


def _call_bwd_2d_b(q, k, v, bq, bk, bv, do, num_heads, seq, exact=False):
    rows, d = q.shape
    batch = rows // seq
    g = _plan_2d(batch, seq, d, num_heads, bwd=True, bias=True)
    if g is None:
        # Same 3D-kernel fallback as _call_bwd_2d (see the comment there):
        # tensor grads from the head-chunked 3D backward on the biased
        # operands, bias grads as row sums of those (one XLA reduce each —
        # the 3.5 ms/step bias-fusion win doesn't apply at shapes whose 2D
        # working set exceeds VMEM, but the fp32 score-tensor traffic of
        # the XLA einsum VJP is far worse).
        if _plan(batch, seq, d, num_heads, bwd=True) is not None:
            dq, dk, dv = _call_bwd((q + bq).reshape(batch, seq, d),
                                   (k + bk).reshape(batch, seq, d),
                                   (v + bv).reshape(batch, seq, d),
                                   do.reshape(batch, seq, d),
                                   num_heads, exact)
            dq = dq.reshape(rows, d)
            dk = dk.reshape(rows, d)
            dv = dv.reshape(rows, d)
            return (dq, dk, dv,
                    jnp.sum(dq, 0, dtype=jnp.float32).astype(bq.dtype),
                    jnp.sum(dk, 0, dtype=jnp.float32).astype(bk.dtype),
                    jnp.sum(dv, 0, dtype=jnp.float32).astype(bv.dtype))
        _, vjp = jax.vjp(
            lambda q, k, v, bq, bk, bv: _xla_reference_2d(
                q + bq, k + bk, v + bv, num_heads, seq),
            q, k, v, bq, bk, bv)
        return vjp(do)
    scale = (d // num_heads) ** -0.5
    spec = pl.BlockSpec((g * seq, d), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    bspec = pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM)
    # (8, d) partial blocks over an (8*n_prog, d) array: Mosaic's block
    # constraint (second-to-last dim 8-divisible or equal to the array dim)
    # rejects (1, d) blocks for n_prog > 1 — the round-4 lowering failure.
    # Row 0 of each block holds the program's rowsum, rows 1-7 are zero.
    dbspec = pl.BlockSpec((8, d), lambda i: (i, 0), memory_space=pltpu.VMEM)
    n_prog = batch // g
    dq, dk, dv, dbq, dbk, dbv = pl.pallas_call(
        functools.partial(_bwd2d_bias_kernel, num_heads=num_heads, seq=seq,
                          group=g, scale=scale, exact=exact),
        grid=(n_prog,),
        in_specs=[spec, spec, spec, spec, bspec, bspec, bspec],
        out_specs=(spec, spec, spec, dbspec, dbspec, dbspec),
        out_shape=(jax.ShapeDtypeStruct((rows, d), q.dtype),
                   jax.ShapeDtypeStruct((rows, d), k.dtype),
                   jax.ShapeDtypeStruct((rows, d), v.dtype),
                   jax.ShapeDtypeStruct((8 * n_prog, d), jnp.float32),
                   jax.ShapeDtypeStruct((8 * n_prog, d), jnp.float32),
                   jax.ShapeDtypeStruct((8 * n_prog, d), jnp.float32)),
        interpret=_interpret(),
    )(q, k, v, do, bq.reshape(1, d), bk.reshape(1, d), bv.reshape(1, d))
    # (8*n_prog, D) partials -> (D,): a trivial reduce vs re-reading
    # (B*L, D); the zero rows cost nothing.
    return (dq, dk, dv, dbq.sum(0).astype(bq.dtype),
            dbk.sum(0).astype(bk.dtype), dbv.sum(0).astype(bv.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def fused_attention_2d_b(q: Array, k: Array, v: Array, bq: Array, bk: Array,
                         bv: Array, num_heads: int, seq: int,
                         exact: bool = False) -> Array:
    """`fused_attention_2d` over pre-bias projections: computes attention on
    (q + bq, k + bk, v + bv) with (D,) biases, returning bias grads from the
    backward kernel's VMEM tiles (see the section comment above)."""
    return _call_fwd_2d_b(q, k, v, bq, bk, bv, num_heads, seq, exact)


def _fused2db_fwd(q, k, v, bq, bk, bv, num_heads, seq, exact):
    out = _call_fwd_2d_b(q, k, v, bq, bk, bv, num_heads, seq, exact)
    return out, (q, k, v, bq, bk, bv)


def _fused2db_bwd(num_heads, seq, exact, res, do):
    q, k, v, bq, bk, bv = res
    return _call_bwd_2d_b(q, k, v, bq, bk, bv, do, num_heads, seq, exact)


fused_attention_2d_b.defvjp(_fused2db_fwd, _fused2db_bwd)
