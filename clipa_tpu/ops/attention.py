"""Attention cores.

One entry point, :func:`dot_product_attention`, dispatching between:
  * ``xla``    — einsum + softmax; XLA fuses this well for the short
                 sequences CLIPA trains at (8-text / 37-image tokens).
  * ``pallas`` — a flash-attention Pallas kernel (online softmax, tiled over
                 VMEM) for the full-resolution fine-tune stages
                 (224px -> 257 tokens, 336px -> 577 tokens).
  * ``auto``   — pallas on TPU when shapes are tile-aligned and long enough
                 to pay off, else xla.

Replaces the reference's stock flax MultiHeadDotProductAttention core
(clipa_jax/models/vit.py:126, text_transformer.py:180).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

Array = jax.Array

# Sequence length at which "auto" starts dispatching to the Pallas flash
# kernel. Measured on v5e at CLIPA shapes (L<=640, D 64/80, 16 heads): XLA's
# fused attention is FASTER at every CLIPA resolution — per-(batch*head)
# kernel programs are too small to amortize invocation overhead — while the
# flash kernel wins on *memory* (no B*H*L^2 score tensor). Default therefore
# keeps XLA; lower this (or pass impl="pallas") for long-sequence /
# memory-bound regimes, e.g. giant-batch 336px unmask-tuning.
_PALLAS_MIN_SEQ = 1024


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except RuntimeError:
        return False


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
    if impl == "auto":
        impl = "pallas" if _pallas_eligible(q, k, mask) else "xla"
    if impl == "pallas":
        from clipa_tpu.ops import flash_attention
        return flash_attention.flash_attention(q, k, v, mask=mask)
    return _xla_attention(q, k, v, mask)


def _pallas_eligible(q: Array, k: Array, mask) -> bool:
    if not _on_tpu() or mask is not None:
        return False
    lq, d = q.shape[1], q.shape[-1]
    return lq >= _PALLAS_MIN_SEQ and d <= 128


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
