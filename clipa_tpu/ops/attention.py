"""Attention cores.

Two entry points:

  * :func:`multi_head_attention` — packed ``(B, L, D)`` operands (the
    layout the projections produce; no lane-padded 4D tensors in HBM).
    This is what the towers call.
  * :func:`dot_product_attention` — split ``(B, L, H, hd)`` operands, kept
    for compatibility and for the long-sequence flash kernel.

Dispatch (``impl="auto"``):
  * ``fused``  — whole-sequence Pallas kernel (ops/block_attention.py):
                 scores/softmax live in VMEM, backward recomputes them.
                 Covers every CLIPA resolution (50/257/577 tokens). On the
                 bench chip the XLA path's fp32 (B,H,L,L) score tensors
                 tile-pad 2.9x in HBM and dominate attention time; this
                 kernel removes that traffic entirely.
  * ``pallas`` — tiled online-softmax flash attention for sequences past
                 the whole-sequence VMEM budget (> ~640 tokens).
  * ``xla``    — einsum + fp32 softmax; masked attention (causal text
                 towers) and non-TPU backends.

Replaces the reference's stock flax MultiHeadDotProductAttention core
(clipa_jax/models/vit.py:126, text_transformer.py:180).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array

# Sequences whose K/V slab exceeds the fused kernel's VMEM budget move to
# the tiled online-softmax flash kernel.
_FLASH_MIN_SEQ = 1024

# Below this the fused kernel's (bq x L) score tiles starve the MXU and its
# backward recompute loses to XLA's saved tiny score tensors. Measured on
# the bench chip (fwd+bwd, batch 512): L=8 fused 2.41ms vs xla 1.86ms;
# L=50 fused 4.06ms vs xla 7.85ms — crossover is between the text towers
# (<=32 tokens) and the smallest image tower (50 tokens).
_FUSED_MIN_SEQ = 33


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except RuntimeError:
        return False


def multi_head_attention(q: Array, k: Array, v: Array, num_heads: int,
                         mask: Optional[Array] = None,
                         impl: str = "auto",
                         seq_len: Optional[int] = None,
                         qkv_biases=None) -> Array:
    """Multi-head attention over packed (B, L, D) or flat (B*L, D) operands.

    Args:
      q, k, v: (B, L, D) arrays, D = num_heads * head_dim — or flat
        (B*L, D) arrays with `seq_len` set (row i belongs to sample
        i // seq_len). The flat form keeps the encoder's residual stream
        2D end to end, which is what prevents XLA from assigning L-major
        layouts to 3D intermediates and paying transposing copies at every
        Pallas kernel boundary (~10 GB/step at the flagship shape).
      num_heads: head count.
      mask: optional boolean (B, 1|H, Lq, Lk); True = attend. Masked
        attention always uses the XLA path.
      impl: "auto" | "fused" | "fused_exact" | "xla" | "pallas".
        "fused_exact" runs the fused kernels with the rowmax-subtracted
        softmax — exact at any attention-logit scale, ~35-45% slower
        kernel time; for long fine-tunes where logit growth past the
        default clip (block_attention._EXP_CLIP) is a risk.
      seq_len: static sequence length; required iff operands are 2D.
      qkv_biases: optional ((D,), (D,), (D,)) projection biases NOT yet
        added to q/k/v. On the fused 2D path the bias add runs inside the
        kernels and the backward emits the bias grads from its VMEM tiles —
        a standalone bias-grad reduce re-reads the whole (B·L, D) grad
        tensor from HBM (measured 3.5 ms/step at the flagship shape). On
        every other path the biases are added here and XLA folds the add
        into the projection GEMM epilogue exactly as before.

    Returns:
      array of q's shape and dtype.
    """
    from clipa_tpu.ops import block_attention

    if q.ndim == 2:
        if seq_len is None:
            raise ValueError("2D operands require seq_len")
        rows, d = q.shape
        if impl in ("auto", "fused", "fused_exact") and _on_tpu() \
                and q.shape == k.shape and seq_len >= _FUSED_MIN_SEQ \
                and block_attention.eligible_2d(rows, d, num_heads,
                                                seq_len, mask,
                                                bias=qkv_biases is not None):
            exact = impl == "fused_exact"
            if qkv_biases is not None:
                bq, bk, bv = (b.astype(q.dtype) for b in qkv_biases)
                return block_attention.fused_attention_2d_b(
                    q, k, v, bq, bk, bv, num_heads, seq_len, exact)
            return block_attention.fused_attention_2d(q, k, v, num_heads,
                                                      seq_len, exact)
        # Fallback: reshape to (B, L, D) and use the 3D dispatch. Off-TPU
        # (tests) and masked/short-sequence paths land here; the reshape is
        # a bitcast under default layouts.
        if qkv_biases is not None:
            bq, bk, bv = (b.astype(q.dtype) for b in qkv_biases)
            q, k, v, qkv_biases = q + bq, k + bk, v + bv, None
        b = rows // seq_len
        out = multi_head_attention(
            q.reshape(b, seq_len, d),
            k.reshape(k.shape[0] // seq_len, seq_len, k.shape[-1]),
            v.reshape(v.shape[0] // seq_len, seq_len, v.shape[-1]),
            num_heads, mask=mask, impl=impl)
        return out.reshape(rows, d)

    if qkv_biases is not None:  # 3D operands: plain adds (GEMM-epilogue fused)
        bq, bk, bv = (b.astype(q.dtype) for b in qkv_biases)
        q, k, v = q + bq, k + bk, v + bv

    if impl == "auto":
        if (_on_tpu() and q.shape == k.shape
                and q.shape[1] >= _FUSED_MIN_SEQ
                and block_attention.eligible(q.shape, num_heads, mask)):
            impl = "fused"
        elif (_on_tpu() and mask is None and q.shape[1] >= _FLASH_MIN_SEQ
                and q.shape[2] // num_heads <= 128):
            impl = "pallas"
        else:
            impl = "xla"

    if impl in ("fused", "fused_exact"):
        # Explicit impl="fused" must not silently drop a mask or hand an
        # ineligible shape to the kernel (whose plan would be None).
        if mask is not None:
            raise ValueError("impl='fused' does not support masks; use "
                             "impl='xla' (or 'auto') for masked attention.")
        if not block_attention.eligible(q.shape, num_heads, mask):
            raise ValueError(
                f"impl='fused' ineligible for q.shape={q.shape}, "
                f"num_heads={num_heads}; use impl='auto' to dispatch.")
        return block_attention.fused_attention(q, k, v, num_heads,
                                               impl == "fused_exact")

    b, l, d = q.shape
    hd = d // num_heads
    q4 = q.reshape(b, l, num_heads, hd)
    k4 = k.reshape(k.shape[0], k.shape[1], num_heads, hd)
    v4 = v.reshape(v.shape[0], v.shape[1], num_heads, hd)
    out = dot_product_attention(q4, k4, v4, mask=mask, impl=impl)
    return out.reshape(b, l, d)


def dot_product_attention(q: Array, k: Array, v: Array,
                          mask: Optional[Array] = None,
                          impl: str = "auto") -> Array:
    """Scaled dot-product attention over (batch, len, heads, head_dim).

    Args:
      q, k, v: (B, L, H, D) arrays (any float dtype; accumulation is fp32).
      mask: optional boolean (B, 1|H, Lq, Lk); True = attend.
      impl: "auto" | "xla" | "pallas".

    Returns:
      (B, Lq, H, D) array in q's dtype.
    """
    if impl in ("auto", "fused"):
        impl = "pallas" if _pallas_eligible(q, k, mask) else "xla"
    if impl == "pallas":
        from clipa_tpu.ops import flash_attention
        return flash_attention.flash_attention(q, k, v, mask=mask)
    return _xla_attention(q, k, v, mask)


def _pallas_eligible(q: Array, k: Array, mask) -> bool:
    if not _on_tpu() or mask is not None:
        return False
    lq, d = q.shape[1], q.shape[-1]
    return lq >= _FLASH_MIN_SEQ and d <= 128


def _xla_attention(q: Array, k: Array, v: Array,
                   mask: Optional[Array]) -> Array:
    dtype = q.dtype
    depth = q.shape[-1]
    scale = depth ** -0.5
    # fp32 logits: cheap at CLIPA's sequence lengths and avoids bf16 softmax
    # saturation at large widths.
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32) * scale
    if mask is not None:
        logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)
    weights = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", weights.astype(dtype), v,
                      preferred_element_type=jnp.float32).astype(dtype)
