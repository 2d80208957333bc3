"""Flash attention for TPU, written in Pallas.

Online-softmax tiled attention (fwd + custom-VJP bwd) for the
full-resolution CLIPA stages (224px -> 197+cls tokens, 336px -> 577+cls),
where materializing B x H x L x L score tensors starts to dominate HBM
traffic. The reference used stock flax attention everywhere
(clipa_jax/models/vit.py:126); SURVEY.md §2.5 calls out flash attention as
the TPU-native replacement.

Design (see /opt/skills/guides/pallas_guide.md):
  * **Transposed operand layout (b*h, d, L)**: TPU HBM layouts tile the two
    minor dims as (8 sublanes, 128 lanes). ViT head dims (64/80/104) in the
    minor-most position would lane-pad to 128 and double every operand in
    HBM; with d in sublanes and the sequence in lanes there is no padding
    for any d % 8 == 0.
  * grid (batch*heads, L/block_q); K/V stream through VMEM inside a
    fori_loop with running (max, sumexp, out-accumulator) — the score
    matrix never exists.
  * fp32 accumulation on MXU (`preferred_element_type`); inputs any float.
  * backward = two Pallas kernels (dQ over q-tiles; dK/dV over k-tiles)
    rebuilding P from the saved per-row logsumexp (flash-attention-2
    scheme). The custom-VJP boundary sits at the public unpadded (b,l,h,d)
    level so residuals stay in natural layout.
  * sequences pad to the tile size; padded KEY columns are masked via an
    in-kernel iota test, padded QUERY rows are sliced off by the wrapper.

Interpret mode makes the same kernels run (slowly) on CPU for tests.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

Array = jax.Array

NEG_INF = float(-1e30)  # large-negative instead of -inf: keeps 0*x finite


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _dot(a, b, dims):
    return jax.lax.dot_general(a, b, (dims, ((), ())),
                               preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# forward kernel — operands (1, d, L) per (batch*head) program
# ---------------------------------------------------------------------------

def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, block_k: int,
                kv_len: int, scale: float):
    # Operands stay in the input dtype for the MXU dots (fp32 accumulate
    # via preferred_element_type); fp32 MXU passes run at a fraction of
    # the bf16 rate. Scale lands on the fp32 scores — the XLA-path order.
    qt = q_ref[0]                                     # (d, block_q)
    d, block_q = qt.shape
    n_kv = k_ref.shape[2] // block_k

    def body(j, carry):
        m_prev, s_prev, acc = carry                   # acc: (d, block_q)
        kt = k_ref[0, :, pl.ds(j * block_k, block_k)]
        vt = v_ref[0, :, pl.ds(j * block_k, block_k)]
        # scores (block_q, block_k) = q^T k, contracting d (sublane dim)
        scores = _dot(qt, kt, ((0,), (0,))) * scale
        col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1) \
            + j * block_k
        scores = jnp.where(col < kv_len, scores, NEG_INF)

        m_new = jnp.maximum(m_prev, jnp.max(scores, axis=1))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(scores - m_new[:, None])          # (block_q, block_k)
        s_new = s_prev * alpha + jnp.sum(p, axis=1)
        # acc (d, block_q) += v_t (d, block_k) @ p^T; p rides the MXU in
        # the operand dtype, the accumulator stays fp32.
        acc = acc * alpha[None, :] + _dot(vt, p.astype(vt.dtype),
                                          ((1,), (1,)))
        return m_new, s_new, acc

    m0 = jnp.full((block_q,), NEG_INF, jnp.float32)
    s0 = jnp.zeros((block_q,), jnp.float32)
    acc0 = jnp.zeros((d, block_q), jnp.float32)
    m, s, acc = jax.lax.fori_loop(0, n_kv, body, (m0, s0, acc0))

    o_ref[0] = (acc / s[None, :]).astype(o_ref.dtype)
    lse_ref[0, 0] = m + jnp.log(s)


def _flash_fwd(q, k, v, *, block_q: int, block_k: int, kv_len: int,
               scale: float):
    bh, d, lq = q.shape
    lk = k.shape[2]
    out, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, block_k=block_k, kv_len=kv_len,
                          scale=scale),
        grid=(bh, lq // block_q),
        in_specs=[
            pl.BlockSpec((1, d, block_q), lambda b, i: (b, 0, i)),
            pl.BlockSpec((1, d, lk), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, d, lk), lambda b, i: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, d, block_q), lambda b, i: (b, 0, i)),
            pl.BlockSpec((1, 1, block_q), lambda b, i: (b, 0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct((bh, 1, lq), jnp.float32),
        ],
        interpret=_interpret(),
    )(q, k, v)
    return out, lse


# ---------------------------------------------------------------------------
# backward kernels
# ---------------------------------------------------------------------------

def _dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref, *,
               block_k: int, kv_len: int, scale: float):
    qt = q_ref[0]                                     # (d, block_q)
    dot_ = do_ref[0]                                  # (d, block_q)
    lse = lse_ref[0, 0]
    delta = delta_ref[0, 0]
    d, block_q = qt.shape
    n_kv = k_ref.shape[2] // block_k

    def body(j, dq_acc):
        kt = k_ref[0, :, pl.ds(j * block_k, block_k)]
        vt = v_ref[0, :, pl.ds(j * block_k, block_k)]
        scores = _dot(qt, kt, ((0,), (0,))) * scale
        col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1) \
            + j * block_k
        scores = jnp.where(col < kv_len, scores, NEG_INF)
        p = jnp.exp(scores - lse[:, None])            # (block_q, block_k)
        dp = _dot(dot_, vt, ((0,), (0,)))             # (block_q, block_k)
        ds = p * (dp - delta[:, None])
        # dq_t (d, block_q) += k_t (d, block_k) @ ds^T
        return dq_acc + _dot(kt, ds.astype(kt.dtype), ((1,), (1,)))

    dq = jax.lax.fori_loop(0, n_kv, body,
                           jnp.zeros((d, block_q), jnp.float32))
    dq_ref[0] = (dq * scale).astype(dq_ref.dtype)


def _dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                dk_ref, dv_ref, *, block_q: int, kv_len: int, scale: float):
    kt = k_ref[0]                                     # (d, block_k)
    vt = v_ref[0]
    d, block_k = kt.shape
    n_q = q_ref.shape[2] // block_q
    kv_start = pl.program_id(1) * block_k
    col_valid = (jax.lax.broadcasted_iota(jnp.int32, (1, block_k), 1)
                 + kv_start < kv_len)

    def body(i, carry):
        dk_acc, dv_acc = carry                        # (d, block_k)
        qt = q_ref[0, :, pl.ds(i * block_q, block_q)]
        dot_ = do_ref[0, :, pl.ds(i * block_q, block_q)]
        lse = lse_ref[0, 0, pl.ds(i * block_q, block_q)]
        delta = delta_ref[0, 0, pl.ds(i * block_q, block_q)]
        scores = _dot(qt, kt, ((0,), (0,))) * scale   # (block_q, block_k)
        scores = jnp.where(col_valid, scores, NEG_INF)
        p = jnp.exp(scores - lse[:, None])
        # dv_t (d, block_k) += do_t (d, block_q) @ p
        dv_acc = dv_acc + _dot(dot_, p.astype(dot_.dtype), ((1,), (0,)))
        dp = _dot(dot_, vt, ((0,), (0,)))             # (block_q, block_k)
        ds = p * (dp - delta[:, None])
        # dk_t (d, block_k) += q_t (d, block_q) @ ds
        dk_acc = dk_acc + _dot(qt, ds.astype(qt.dtype), ((1,), (0,)))
        return dk_acc, dv_acc

    zeros = jnp.zeros((d, block_k), jnp.float32)
    dk, dv = jax.lax.fori_loop(0, n_q, body, (zeros, zeros))
    dk_ref[0] = (dk * scale).astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _flash_bwd(q, k, v, out, lse, do, *, block_q: int, block_k: int,
               kv_len: int, scale: float):
    bh, d, lq = q.shape
    lk = k.shape[2]
    delta = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32),
                    axis=1, keepdims=True)            # (bh, 1, lq)

    dq = pl.pallas_call(
        functools.partial(_dq_kernel, block_k=block_k, kv_len=kv_len,
                          scale=scale),
        grid=(bh, lq // block_q),
        in_specs=[
            pl.BlockSpec((1, d, block_q), lambda b, i: (b, 0, i)),
            pl.BlockSpec((1, d, lk), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, d, lk), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, d, block_q), lambda b, i: (b, 0, i)),
            pl.BlockSpec((1, 1, block_q), lambda b, i: (b, 0, i)),
            pl.BlockSpec((1, 1, block_q), lambda b, i: (b, 0, i)),
        ],
        out_specs=pl.BlockSpec((1, d, block_q), lambda b, i: (b, 0, i)),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=_interpret(),
    )(q, k, v, do, lse, delta)

    dk, dv = pl.pallas_call(
        functools.partial(_dkv_kernel, block_q=block_q, kv_len=kv_len,
                          scale=scale),
        grid=(bh, lk // block_k),
        in_specs=[
            pl.BlockSpec((1, d, lq), lambda b, j: (b, 0, 0)),
            pl.BlockSpec((1, d, block_k), lambda b, j: (b, 0, j)),
            pl.BlockSpec((1, d, block_k), lambda b, j: (b, 0, j)),
            pl.BlockSpec((1, d, lq), lambda b, j: (b, 0, 0)),
            pl.BlockSpec((1, 1, lq), lambda b, j: (b, 0, 0)),
            pl.BlockSpec((1, 1, lq), lambda b, j: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, d, block_k), lambda b, j: (b, 0, j)),
            pl.BlockSpec((1, d, block_k), lambda b, j: (b, 0, j)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ],
        interpret=_interpret(),
    )(q, k, v, do, lse, delta)
    return dq, dk, dv


# ---------------------------------------------------------------------------
# public API with custom VJP
# ---------------------------------------------------------------------------
#
# The VJP boundary sits at the PUBLIC (b, l, h, d) level: residuals are the
# original unpadded tensors in natural layout, and the transpose/pad to
# kernel layout happens inside fwd/bwd (transient, not pinned across the
# backward graph).


def _to_kernel_layout(x, lp):
    """(b, l, h, d) -> (b*h, d, l_padded)."""
    b, l, h, d = x.shape
    x = jnp.transpose(x, (0, 2, 3, 1)).reshape(b * h, d, l)
    if lp != l:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, lp - l)))
    return x


def _from_kernel_layout(x, b, h, l):
    """(b*h, d, l_padded) -> (b, l, h, d)."""
    d = x.shape[1]
    x = x[:, :, :l].reshape(b, h, d, l)
    return jnp.transpose(x, (0, 3, 1, 2))


def _plan(lq, lk, block_q, block_k):
    block_q = min(block_q, _round_up(lq, 128))
    block_k = min(block_k, _round_up(lk, 128))
    return block_q, block_k, _round_up(lq, block_q), _round_up(lk, block_k)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _flash(q, k, v, block_q, block_k):
    out, _ = _flash_apply(q, k, v, block_q, block_k)
    return out


def _flash_apply(q, k, v, block_q, block_k):
    b, lq, h, d = q.shape
    lk = k.shape[1]
    bq, bk, lq_p, lk_p = _plan(lq, lk, block_q, block_k)
    out, lse = _flash_fwd(
        _to_kernel_layout(q, lq_p), _to_kernel_layout(k, lk_p),
        _to_kernel_layout(v, lk_p),
        block_q=bq, block_k=bk, kv_len=lk, scale=d ** -0.5)
    return _from_kernel_layout(out, b, h, lq), lse


def _flash_vjp_fwd(q, k, v, block_q, block_k):
    out, lse = _flash_apply(q, k, v, block_q, block_k)
    return out, (q, k, v, out, lse)


def _flash_vjp_bwd(block_q, block_k, residuals, do):
    q, k, v, out, lse = residuals
    b, lq, h, d = q.shape
    lk = k.shape[1]
    bq, bk, lq_p, lk_p = _plan(lq, lk, block_q, block_k)
    dq, dk, dv = _flash_bwd(
        _to_kernel_layout(q, lq_p), _to_kernel_layout(k, lk_p),
        _to_kernel_layout(v, lk_p), _to_kernel_layout(out, lq_p), lse,
        _to_kernel_layout(do, lq_p),
        block_q=bq, block_k=bk, kv_len=lk, scale=d ** -0.5)
    return (_from_kernel_layout(dq, b, h, lq),
            _from_kernel_layout(dk, b, h, lk),
            _from_kernel_layout(dv, b, h, lk))


_flash.defvjp(_flash_vjp_fwd, _flash_vjp_bwd)


def flash_attention(q: Array, k: Array, v: Array,
                    mask: Optional[Array] = None,
                    block_q: int = 128, block_k: int = 128) -> Array:
    """Tiled attention over (B, L, H, D) tensors (self- or cross-attention).

    Pads L up to the tile size internally (padded keys masked in-kernel,
    padded query rows sliced off). `mask` is unsupported — CLIPA's towers
    are fully bidirectional; use the XLA path for masked attention.
    """
    if mask is not None:
        raise NotImplementedError("flash_attention is for unmasked towers")
    if q.shape[-1] % 8:
        raise ValueError(f"head_dim {q.shape[-1]} must be a multiple of 8")
    return _flash(q, k, v, block_q, block_k).astype(q.dtype)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m
