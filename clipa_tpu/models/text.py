"""Text transformer tower.

Bidirectional (no causal mask) transformer over WordPiece token ids, exactly
the encoder CLIPA trains (reference: clipa_jax/models/text_transformer.py):
token embedding (std 0.02), learnable (std 0.01) or sincos1d posemb, encoder
blocks with CLIP-paper init scales — attention std w^-0.5, residual
projections scaled by (2*depth)^-0.5, MLP fc std (2w)^-0.5 — final LayerNorm
`encoder_norm`, pooling {last, tok, gap}, optional no-bias head.

Parameter names match the reference tree (Embed_0, pos_embedding,
Transformer/encoderblock_i/..., encoder_norm, head) for npz parity.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from clipa_tpu.models import layers

Array = Any


def posemb_sincos_1d(max_len: int, width: int, min_scale: float = 1.0,
                     max_scale: float = 10_000.0, dtype=jnp.float32) -> Array:
    """Fixed 1D sin-cos posemb ([sin | cos] halves, MoCo-v3 construction)."""
    pe = np.zeros((max_len, width), dtype=np.float32)
    position = np.arange(max_len)[:, None]
    half = width // 2
    scale_factor = -np.log(max_scale / min_scale) / (half - 1)
    div_term = min_scale * np.exp(np.arange(half) * scale_factor)
    pe[:, :half] = np.sin(position * div_term)
    pe[:, half:2 * half] = np.cos(position * div_term)
    return jnp.asarray(pe, dtype)[None]


class _Model(nn.Module):
    """Text encoder producing a pooled embedding (and optional head logits)."""

    num_classes: Optional[int] = None
    width: int = 512
    depth: int = 12
    mlp_dim: Optional[int] = None
    num_heads: int = 8
    dropout: float = 0.0
    drop_path: float = 0.0
    posemb: str = "learn"  # or "sincos1d"
    pool_type: str = "last"  # "last" | "tok" | "gap" | "eot"
    vocab_size: int = 32000
    head_zeroinit: bool = False
    remat_policy: str = "none"
    dtype: Optional[Any] = None
    attn_impl: str = "auto"
    quant: Optional[str] = None
    # Residual-stream layout: "flat" or "ref3d" (see layers.Encoder.stream).
    stream: str = "flat"
    # open_clip-variant fidelity: causal (autoregressive) attention mask,
    # the open_clip TextTransformer default (`attention_mask: true`,
    # clipa_torch/open_clip/transformer.py:619-625). CLIPA-v2/BigVision
    # towers are bidirectional (attention_mask: false).
    causal_mask: bool = False
    gelu_approx: Any = True  # True=tanh, False=erf, "quick"=QuickGELU
    # LayerNorm epsilon: flax/big_vision 1e-6, torch/open_clip 1e-5
    ln_eps: float = 1e-6
    # CoCa text tower (open_clip TextTransformer embed_cls,
    # transformer.py:560-660): a learnable cls embedding is APPENDED after
    # the text tokens; the pooled output is ln_final(cls position), and the
    # per-token outputs (out["tokens"], un-normed — the multimodal decoder
    # applies its own ln_1_kv) feed the caption decoder. Forces causal
    # attention with the reference's cls-row pad mask.
    embed_cls: bool = False
    pad_id: int = 0
    # Fixed positional-embedding capacity (reference num_pos =
    # context_length + 1 with cls_emb, transformer.py:559-578); the table is
    # sliced to the input length so shorter generation prefixes reuse the
    # same parameters. None (default) sizes the table to the input length.
    context_length: Optional[int] = None

    @nn.compact
    def __call__(self, text: Array, *, train: bool = False, **unused_kw):
        out = {}
        dtype = self.dtype or jnp.float32

        x = nn.Embed(num_embeddings=self.vocab_size, features=self.width,
                     embedding_init=nn.initializers.normal(stddev=0.02),
                     param_dtype=jnp.float32, dtype=dtype)(text)
        if self.embed_cls:
            cls_emb = self.param("cls_emb",
                                 nn.initializers.normal(stddev=0.01),
                                 (1, 1, self.width), jnp.float32)
            x = jnp.concatenate(
                [x, jnp.tile(cls_emb.astype(dtype), [x.shape[0], 1, 1])],
                axis=1)
        _, l, d = x.shape

        num_pos = l
        if self.context_length is not None:
            num_pos = self.context_length + (1 if self.embed_cls else 0)
            if l > num_pos:
                raise ValueError(f"input length {l} exceeds "
                                 f"positional capacity {num_pos}")
        if self.posemb == "learn":
            pe = self.param("pos_embedding",
                            nn.initializers.normal(stddev=0.01),
                            (1, num_pos, d), jnp.float32)[:, :l]
        elif self.posemb == "sincos1d":
            pe = posemb_sincos_1d(l, d)
        else:
            raise ValueError(f"Unknown posemb {self.posemb!r}")
        x = x + pe.astype(dtype)
        x = nn.Dropout(rate=self.dropout)(x, not train)

        # CLIP-paper residual-scaled initializers, constant across blocks.
        init_std = {
            "attn": self.width ** -0.5,
            "proj": (self.width ** -0.5) * ((2 * self.depth) ** -0.5),
            "fc": (2 * self.width) ** -0.5,
        }
        block_inits = dict(
            attn_qkv_init=nn.initializers.normal(stddev=init_std["attn"]),
            attn_out_init=nn.initializers.normal(stddev=init_std["proj"]),
            mlp_fc_init=nn.initializers.normal(stddev=init_std["fc"]),
            mlp_proj_init=nn.initializers.normal(stddev=init_std["proj"]),
        )
        mask = None
        if self.causal_mask or self.embed_cls:
            mask = jnp.tril(jnp.ones((l, l), bool))[None, None]
        if self.embed_cls:
            # The cls query row sees [1, text != pad] over keys — exactly the
            # reference's build_cls_mask + causal sum, including its key-index
            # shift (key j gates on text[j-1]; open_clip
            # transformer.py:626-633). Other rows stay purely causal.
            cls_row = jnp.concatenate(
                [jnp.ones((text.shape[0], 1), bool), text != self.pad_id],
                axis=1)  # (B, l)
            mask = jnp.broadcast_to(mask, (text.shape[0], 1, l, l))
            mask = mask.at[:, :, -1, :].set(cls_row[:, None, :])

        x = layers.Encoder(
            depth=self.depth, num_heads=self.num_heads, mlp_dim=self.mlp_dim,
            dropout=self.dropout, drop_path=self.drop_path,
            remat_policy=self.remat_policy,
            block_init_fn=lambda i: block_inits,
            dtype=dtype, attn_impl=self.attn_impl, quant=self.quant,
            gelu_approx=self.gelu_approx, ln_eps=self.ln_eps,
            stream=self.stream,
            name="Transformer")(x, not train, mask)

        if self.embed_cls:
            # pooled = ln_final(cls position); tokens stay UN-normed (the
            # caption decoder norms them itself; open_clip
            # transformer.py:655-657 pools before ln'ing the tokens).
            out["tokens"] = x[:, :-1].astype(jnp.float32)
            x = nn.LayerNorm(epsilon=self.ln_eps, dtype=dtype,
                             param_dtype=jnp.float32,
                             name="encoder_norm")(x[:, -1])
            out["head_input"] = x
            if self.num_classes:
                init = (nn.initializers.zeros if self.head_zeroinit
                        else nn.initializers.normal(stddev=self.width ** -0.5))
                x = nn.Dense(self.num_classes, use_bias=False,
                             kernel_init=init, dtype=dtype,
                             param_dtype=jnp.float32, name="head")(x)
                out["logits"] = x
            return x.astype(jnp.float32), out

        x = nn.LayerNorm(epsilon=self.ln_eps, dtype=dtype,
                         param_dtype=jnp.float32, name="encoder_norm")(x)

        if self.pool_type == "last":
            x = x[:, -1, :]
        elif self.pool_type == "tok":
            x = x[:, 0]
        elif self.pool_type == "gap":
            x = jnp.mean(x[:, 1:], axis=1)
        elif self.pool_type == "eot":
            # open_clip pooling: the eot token carries the sentence embedding
            # and has the highest token id in each BPE sequence
            # (clipa_torch/open_clip/transformer.py:661-663).
            x = x[jnp.arange(x.shape[0]), jnp.argmax(text, axis=-1)]
        else:
            raise ValueError(f"Unknown pool_type {self.pool_type!r}")
        out["head_input"] = x

        if self.num_classes:
            init = (nn.initializers.zeros if self.head_zeroinit
                    else nn.initializers.normal(stddev=self.width ** -0.5))
            x = nn.Dense(self.num_classes, use_bias=False, kernel_init=init,
                         dtype=dtype, param_dtype=jnp.float32, name="head")(x)
            out["logits"] = x

        return x.astype(jnp.float32), out


def Model(num_classes=None, *, variant=None, **kw):  # noqa: N802
    """Builds a text tower from a variant string plus overrides."""
    return _Model(num_classes, **{**decode_variant(variant), **kw})


def decode_variant(variant: Optional[str]) -> dict:
    """Text-tower size table (note B = width 512 / 8 heads, unlike image B)."""
    if variant is None:
        return {}
    v = variant.split("/")[0]
    return {
        "width": {"Ti": 192, "S": 384, "M": 512, "B": 512, "L": 768,
                  "H": 1024, "g": 1408, "G": 1664, "e": 1792}[v],
        "depth": {"Ti": 12, "S": 12, "M": 12, "B": 12, "L": 12,
                  "H": 24, "g": 40, "G": 48, "e": 56}[v],
        "mlp_dim": {"Ti": 768, "S": 1536, "M": 2048, "B": 2048, "L": 3072,
                    "H": 4096, "g": 6144, "G": 8192, "e": 15360}[v],
        "num_heads": {"Ti": 3, "S": 6, "M": 8, "B": 8, "L": 12,
                      "H": 16, "g": 16, "G": 16, "e": 16}[v],
    }


def load(init_params, init_file, model_cfg=None, dont_load=()):
    """Loads tower params from an npz checkpoint, merging with random init."""
    del model_cfg
    from clipa_tpu.train import checkpoint as ckpt
    from clipa_tpu.models import common
    restored = ckpt.load_params(init_file)
    return common.merge_params(restored, init_params, dont_load)
