"""BERT-style text tower.

The reference's optional BERT tower wraps flaxformer's BertEncoder for
LiT-style initialization from TF checkpoints (clipa_jax/models/bert.py).
This implementation owns the architecture: a standard BERT encoder
(token + position + segment embeddings, post-LN blocks, [CLS] pooling with a
tanh pooler) built from our transformer primitives — no flaxformer
dependency. CLIPA-v2 itself trains the bidirectional `text_transformer`
tower; this exists for LiT-style experiments and checkpoint parity work.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp

from clipa_tpu.models import layers

Array = Any


class BertBlock(nn.Module):
    """Post-LN transformer block (BERT ordering)."""

    num_heads: int
    mlp_dim: int
    dropout: float = 0.0
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        y = layers.MultiHeadAttention(
            num_heads=self.num_heads, dtype=self.dtype,
            qkv_kernel_init=nn.initializers.normal(stddev=0.02),
            out_kernel_init=nn.initializers.normal(stddev=0.02),
            name="MultiHeadDotProductAttention_0")(x, x)
        y = nn.Dropout(rate=self.dropout)(y, deterministic)
        x = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32,
                         name="LayerNorm_0")(x + y)
        y = layers.MlpBlock(
            mlp_dim=self.mlp_dim, dropout=self.dropout,
            fc_init=nn.initializers.normal(stddev=0.02),
            proj_init=nn.initializers.normal(stddev=0.02),
            dtype=self.dtype, name="MlpBlock_0")(x, deterministic)
        y = nn.Dropout(rate=self.dropout)(y, deterministic)
        return nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32,
                            name="LayerNorm_1")(x + y)


class _Model(nn.Module):
    num_classes: Optional[int] = None
    width: int = 768
    depth: int = 12
    mlp_dim: Optional[int] = None
    num_heads: int = 12
    vocab_size: int = 30522
    max_len: int = 512
    dropout: float = 0.0
    pool_type: str = "tok"
    head_zeroinit: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, text: Array, *, train: bool = False, **unused_kw):
        out = {}
        dtype = self.dtype or jnp.float32
        emb_init = nn.initializers.normal(stddev=0.02)

        x = nn.Embed(self.vocab_size, self.width, embedding_init=emb_init,
                     param_dtype=jnp.float32, dtype=dtype,
                     name="word_embeddings")(text)
        pos = self.param("position_embeddings", emb_init,
                         (1, self.max_len, self.width), jnp.float32)
        x = x + pos[:, :x.shape[1]].astype(dtype)
        seg = self.param("type_embeddings", emb_init, (1, 1, self.width),
                         jnp.float32)
        x = x + seg.astype(dtype)  # single-segment input
        x = nn.LayerNorm(dtype=dtype, param_dtype=jnp.float32,
                         name="embeddings_norm")(x)
        x = nn.Dropout(rate=self.dropout)(x, not train)

        for i in range(self.depth):
            x = BertBlock(num_heads=self.num_heads,
                          mlp_dim=self.mlp_dim or 4 * self.width,
                          dropout=self.dropout, dtype=dtype,
                          name=f"encoderblock_{i}")(x, not train)
        out["encoded"] = x

        if self.pool_type == "tok":
            pooled = nn.Dense(self.width, dtype=dtype,
                              param_dtype=jnp.float32,
                              kernel_init=emb_init, name="pooler")(x[:, 0])
            pooled = jnp.tanh(pooled)
        elif self.pool_type == "gap":
            pooled = jnp.mean(x, axis=1)
        else:
            raise ValueError(f"Unknown pool_type {self.pool_type!r}")
        out["head_input"] = pooled

        if self.num_classes:
            init = (nn.initializers.zeros if self.head_zeroinit
                    else nn.initializers.normal(stddev=self.width ** -0.5))
            pooled = nn.Dense(self.num_classes, use_bias=False,
                              kernel_init=init, dtype=dtype,
                              param_dtype=jnp.float32, name="head")(pooled)
            out["logits"] = pooled
        return pooled.astype(jnp.float32), out


def Model(num_classes=None, *, variant=None, **kw):  # noqa: N802
    return _Model(num_classes, **{**decode_variant(variant), **kw})


def decode_variant(variant: Optional[str]) -> dict:
    if variant is None:
        return {}
    return {
        "base": {"width": 768, "depth": 12, "mlp_dim": 3072, "num_heads": 12},
        "large": {"width": 1024, "depth": 24, "mlp_dim": 4096,
                  "num_heads": 16},
    }[variant]


def load(init_params, init_file, model_cfg=None, dont_load=()):
    from clipa_tpu.train import checkpoint as ckpt
    from clipa_tpu.models import common
    restored = ckpt.load_params(init_file)
    return common.merge_params(restored, init_params, dont_load)
