"""Chunked global InfoNCE with online logsumexp.

At pod scale CLIPA trains with global batches of 32k-65k; the naive
bidirectional InfoNCE materializes a B x B logit matrix (65k^2 fp32 = 16 GB)
— the reference bounds this with per-device local rows
(clipa_jax/losses/common.py:72-94) but still holds B_local x B_global.

This op never materializes more than (B_rows x chunk) at a time: a
``lax.scan`` over column chunks maintains a running (max, sumexp) pair per
row — the flash-attention trick applied to the contrastive loss — and the
custom VJP rescans the chunks in the backward pass, rebuilding softmax
weights from the saved per-row/column LSEs. Results (loss AND gradients) are
bitwise-equivalent in structure and numerically equal (fp32 accumulation) to
:func:`clipa_tpu.losses.bidirectional_contrastive_loss`.

All chunk matmuls are (B x C) x (C x chunk) GEMMs — MXU-shaped by
construction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

Array = jax.Array


def chunked_contrastive_loss(zimg: Array, ztxt: Array, t: Array,
                             chunk_size: int = 4096):
    """Mean bidirectional InfoNCE, O(B*chunk) memory.

    Args:
      zimg, ztxt: (B, C) L2-normalized embeddings.
      t: temperature (already exp'd), scalar or (1,).
      chunk_size: column-chunk length; B must be divisible by it (pad the
        batch, or pick a divisor — batch sizes here are powers of two).

    Returns:
      (scalar loss, {"ncorrect": fraction of rows whose argmax is the diagonal})
    """
    b = zimg.shape[0]
    if b % chunk_size:
        requested = chunk_size
        chunk_size = _largest_divisor(b, chunk_size)
        # A pathological batch (e.g. prime) can force a tiny fallback chunk;
        # the loss would still be exact but up to ~100x slower (the scan runs
        # B/chunk steps). Error rather than silently degrade.
        if chunk_size * 4 < min(requested, b):
            raise ValueError(
                f"chunked_contrastive_loss: batch {b} has no divisor near "
                f"the requested chunk_size {requested}; the largest is "
                f"{chunk_size}, which would scan {b // chunk_size} chunks "
                "(pathological slowdown). Pick a batch size with a divisor "
                "close to loss_chunk_size.")
    t = jnp.asarray(t, jnp.float32).reshape(())
    loss, ncorrect = _chunked_loss(zimg.astype(jnp.float32),
                                   ztxt.astype(jnp.float32), t, chunk_size)
    return loss, {"ncorrect": ncorrect}


def _largest_divisor(n: int, upper: int) -> int:
    for c in range(min(upper, n), 0, -1):
        if n % c == 0:
            return c
    return n


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _chunked_loss(zimg, ztxt, t, chunk_size):
    loss, ncorrect, _, _ = _forward(zimg, ztxt, t, chunk_size)
    return loss, ncorrect


def _forward(zimg, ztxt, t, chunk_size):
    b, _ = zimg.shape
    n_chunks = b // chunk_size
    ztxt_chunks = ztxt.reshape(n_chunks, chunk_size, -1)

    diag = jnp.sum(zimg * ztxt, axis=-1) * t  # (B,) positive logits

    def body(carry, inputs):
        m_row, s_row, amax_val, amax_idx = carry
        j, ztxt_c = inputs
        # (B, chunk) logits for this column block.
        logits = jnp.dot(zimg, ztxt_c.T,
                         precision=jax.lax.Precision.HIGHEST) * t
        # online row LSE
        m_new = jnp.maximum(m_row, jnp.max(logits, axis=1))
        s_row = s_row * jnp.exp(m_row - m_new) + \
            jnp.sum(jnp.exp(logits - m_new[:, None]), axis=1)
        # online row argmax (for ncorrect)
        c_val = jnp.max(logits, axis=1)
        c_idx = jnp.argmax(logits, axis=1) + j * chunk_size
        take_new = c_val > amax_val
        amax_val = jnp.where(take_new, c_val, amax_val)
        amax_idx = jnp.where(take_new, c_idx, amax_idx)
        # column LSE is complete within one block (all rows present).
        lse_col_c = jax.scipy.special.logsumexp(logits, axis=0)
        return (m_new, s_row, amax_val, amax_idx), lse_col_c

    init = (jnp.full((b,), -jnp.inf), jnp.zeros((b,)),
            jnp.full((b,), -jnp.inf), jnp.zeros((b,), jnp.int32))
    (m_row, s_row, _, amax_idx), lse_col = jax.lax.scan(
        body, init, (jnp.arange(n_chunks), ztxt_chunks))

    lse_row = m_row + jnp.log(s_row)          # (B,)
    lse_col = lse_col.reshape(b)              # (B,)

    loss = jnp.mean(0.5 * (lse_row + lse_col) - diag)
    ncorrect = jnp.mean(amax_idx == jnp.arange(b))
    return loss, ncorrect, lse_row, lse_col


def _fwd(zimg, ztxt, t, chunk_size):
    loss, ncorrect, lse_row, lse_col = _forward(zimg, ztxt, t, chunk_size)
    return (loss, ncorrect), (zimg, ztxt, t, lse_row, lse_col)


def _bwd(chunk_size, residuals, cotangents):
    zimg, ztxt, t, lse_row, lse_col = residuals
    g, _ = cotangents  # gradient w.r.t. ncorrect is discarded (int metric)
    b = zimg.shape[0]
    n_chunks = b // chunk_size
    ztxt_chunks = ztxt.reshape(n_chunks, chunk_size, -1)
    lse_col_chunks = lse_col.reshape(n_chunks, chunk_size)

    def body(acc, inputs):
        acc_z, acc_t = acc
        ztxt_c, lse_col_c = inputs
        logits = jnp.dot(zimg, ztxt_c.T,
                         precision=jax.lax.Precision.HIGHEST) * t
        p_row = jnp.exp(logits - lse_row[:, None])   # softmax over columns
        p_col = jnp.exp(logits - lse_col_c[None, :])  # softmax over rows
        w = 0.5 * (p_row + p_col)                    # (B, chunk)
        acc_z = acc_z + jnp.dot(w, ztxt_c, precision=jax.lax.Precision.HIGHEST)
        g_w_c = jnp.dot(w.T, zimg, precision=jax.lax.Precision.HIGHEST)
        acc_t = acc_t + jnp.sum(w * logits) / t
        return (acc_z, acc_t), g_w_c

    (acc_z, acc_t), g_w = jax.lax.scan(
        body, (jnp.zeros_like(zimg), jnp.zeros(())),
        (ztxt_chunks, lse_col_chunks))

    scale = g * t / b
    g_zimg = scale * (acc_z - ztxt)
    g_ztxt = scale * (g_w.reshape(b, -1) - zimg)
    diag_c = jnp.sum(zimg * ztxt, axis=-1)  # cosine similarities (no t)
    g_t = (g / b) * (acc_t - jnp.sum(diag_c))
    return g_zimg, g_ztxt, jnp.asarray(g_t, t.dtype)


_chunked_loss.defvjp(_fwd, _bwd)
