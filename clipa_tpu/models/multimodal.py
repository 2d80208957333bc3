"""CoCa multimodal text decoder (captioning head).

Capability parity with the reference MultimodalTransformer
(clipa_torch/open_clip/transformer.py:684-772): per layer, a causal
self-attention block over the text tokens followed by a full residual
cross-attention block (its own MLP) whose keys/values are the LN'd image
tokens; then ln_final and a projection to vocab logits.

TPU notes: the image tokens are LN'd once per block entry exactly as the
reference (ln_1_kv inside each cross block); all dots run in the tower
compute dtype on the MXU; the causal mask is a static boolean so XLA folds
it into the softmax.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from clipa_tpu.models import layers

Array = Any


class CrossAttnBlock(nn.Module):
    """Pre-LN residual cross-attention block with its own MLP.

    Reference ResidualAttentionBlock(is_cross_attention=True)
    (clipa_torch/open_clip/transformer.py:195-251): q from ln_1(x),
    k/v from ln_1_kv(context); then ln_2 + MLP.
    """

    num_heads: int
    mlp_dim: Optional[int] = None
    dropout: float = 0.0
    attn_qkv_init: Any = nn.initializers.xavier_uniform()
    attn_out_init: Any = nn.initializers.xavier_uniform()
    mlp_fc_init: Any = nn.initializers.xavier_uniform()
    mlp_proj_init: Any = nn.initializers.xavier_uniform()
    dtype: Optional[Any] = None
    gelu_approx: Any = False
    ln_eps: float = 1e-5

    @nn.compact
    def __call__(self, x: Array, context: Array,
                 deterministic: bool = True) -> Array:
        kv = nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype,
                          param_dtype=jnp.float32,
                          name="ln_kv")(context.astype(x.dtype))
        y = nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype,
                         param_dtype=jnp.float32)(x)
        y = layers.MultiHeadAttention(
            num_heads=self.num_heads,
            qkv_kernel_init=self.attn_qkv_init,
            out_kernel_init=self.attn_out_init,
            dtype=self.dtype, attn_impl="xla",
            name="MultiHeadDotProductAttention_0")(y, kv)
        y = nn.Dropout(rate=self.dropout)(y, deterministic)
        x = x + y

        y = nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype,
                         param_dtype=jnp.float32)(x)
        y = layers.MlpBlock(mlp_dim=self.mlp_dim, dropout=self.dropout,
                            fc_init=self.mlp_fc_init,
                            proj_init=self.mlp_proj_init,
                            dtype=self.dtype, gelu_approx=self.gelu_approx,
                            name="MlpBlock_0")(y, deterministic)
        y = nn.Dropout(rate=self.dropout)(y, deterministic)
        return x + y


class Decoder(nn.Module):
    """Stack of (causal self-attn block, cross-attn block) pairs + vocab head.

    Blocks are named encoderblock_i / crossblock_i. Returns (B, L, vocab)
    logits aligned with the input text-token positions.
    """

    vocab_size: int
    width: int = 512
    depth: int = 12
    num_heads: int = 8
    mlp_dim: Optional[int] = None
    dropout: float = 0.0
    dtype: Optional[Any] = None
    gelu_approx: Any = False
    ln_eps: float = 1e-5

    @nn.compact
    def __call__(self, text_embs: Array, image_embs: Array, *,
                 train: bool = False) -> Array:
        dtype = self.dtype or text_embs.dtype
        x = text_embs.astype(dtype)
        l = x.shape[1]
        causal = jnp.tril(jnp.ones((l, l), bool))[None, None]

        # CLIP-paper residual-scaled inits (MultimodalTransformer
        # .init_parameters, transformer.py:726-742) for both block kinds.
        init_std = {
            "attn": self.width ** -0.5,
            "proj": (self.width ** -0.5) * ((2 * self.depth) ** -0.5),
            "fc": (2 * self.width) ** -0.5,
        }
        inits = dict(
            attn_qkv_init=nn.initializers.normal(stddev=init_std["attn"]),
            attn_out_init=nn.initializers.normal(stddev=init_std["proj"]),
            mlp_fc_init=nn.initializers.normal(stddev=init_std["fc"]),
            mlp_proj_init=nn.initializers.normal(stddev=init_std["proj"]),
        )

        for i in range(self.depth):
            x = layers.EncoderBlock(
                num_heads=self.num_heads, mlp_dim=self.mlp_dim,
                dropout=self.dropout, dtype=dtype, attn_impl="xla",
                gelu_approx=self.gelu_approx, ln_eps=self.ln_eps, **inits,
                name=f"encoderblock_{i}")(x, not train, causal)
            x = CrossAttnBlock(
                num_heads=self.num_heads, mlp_dim=self.mlp_dim,
                dropout=self.dropout, dtype=dtype,
                gelu_approx=self.gelu_approx, ln_eps=self.ln_eps, **inits,
                name=f"crossblock_{i}")(x, image_embs, not train)

        x = nn.LayerNorm(epsilon=self.ln_eps, dtype=dtype,
                         param_dtype=jnp.float32, name="encoder_norm")(x)
        logits = nn.Dense(
            self.vocab_size, use_bias=False,
            kernel_init=nn.initializers.normal(stddev=self.width ** -0.5),
            dtype=dtype, param_dtype=jnp.float32, name="head")(x)
        return logits.astype(jnp.float32)
