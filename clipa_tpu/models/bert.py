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
import numpy as np

from clipa_tpu.models import layers

Array = Any


class BertBlock(nn.Module):
    """Post-LN transformer block (BERT ordering)."""

    num_heads: int
    mlp_dim: int
    dropout: float = 0.0
    dtype: Optional[Any] = None
    gelu_approx: bool = False  # erf gelu: HF/`hidden_act="gelu"` semantics

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True,
                 mask: Optional[Array] = None) -> Array:
        y = layers.MultiHeadAttention(
            num_heads=self.num_heads, dtype=self.dtype,
            qkv_kernel_init=nn.initializers.normal(stddev=0.02),
            out_kernel_init=nn.initializers.normal(stddev=0.02),
            name="MultiHeadDotProductAttention_0")(x, x, mask=mask)
        y = nn.Dropout(rate=self.dropout)(y, deterministic)
        x = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32,
                         name="LayerNorm_0")(x + y)
        y = layers.MlpBlock(
            mlp_dim=self.mlp_dim, dropout=self.dropout,
            fc_init=nn.initializers.normal(stddev=0.02),
            proj_init=nn.initializers.normal(stddev=0.02),
            dtype=self.dtype, gelu_approx=self.gelu_approx,
            name="MlpBlock_0")(x, deterministic)
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


def convert_hf_state_dict(sd: dict, depth: int, num_heads: int) -> dict:
    """Maps a HuggingFace `BertModel` state dict onto this tower's params.

    The reference initializes its BERT tower from Google TF checkpoints via
    flaxformer (clipa_jax/models/bert.py:load + configs/clip_common.py:26-42);
    this framework is TF-free, so the same capability is provided from the
    HF-torch release of those exact weights (`bert-base-uncased` etc.).

    Raises KeyError on missing keys and ValueError on unconsumed ones, like
    `compat.openclip.convert_torch_state_dict`.
    """
    sd = {k: np.asarray(v) for k, v in sd.items()
          if not k.startswith("cls.")}  # drop the MLM head if present
    consumed = set()

    def take(name):
        consumed.add(name)
        return sd[name]

    width = take("embeddings.word_embeddings.weight").shape[1]
    hd = width // num_heads
    p = {
        "word_embeddings": {
            "embedding": take("embeddings.word_embeddings.weight")},
        "position_embeddings":
            take("embeddings.position_embeddings.weight")[None],
        # single-segment input: segment-0 row only
        "type_embeddings":
            take("embeddings.token_type_embeddings.weight")[:1][None],
        "embeddings_norm": {"scale": take("embeddings.LayerNorm.weight"),
                            "bias": take("embeddings.LayerNorm.bias")},
        "pooler": {"kernel": take("pooler.dense.weight").T,
                   "bias": take("pooler.dense.bias")},
    }
    # token_type rows beyond 0 are deliberately unused (CLIP text input is
    # single-segment); mark them consumed.
    for i in range(depth):
        hf = f"encoder.layer.{i}."
        attn = {}
        for ours, theirs in [("query", "attention.self.query"),
                             ("key", "attention.self.key"),
                             ("value", "attention.self.value")]:
            w = take(hf + theirs + ".weight")  # (width, width) torch (out,in)
            b = take(hf + theirs + ".bias")
            attn[ours] = {"kernel": w.T.reshape(width, num_heads, hd),
                          "bias": b.reshape(num_heads, hd)}
        wo = take(hf + "attention.output.dense.weight")
        attn["out"] = {"kernel": wo.T.reshape(num_heads, hd, width),
                       "bias": take(hf + "attention.output.dense.bias")}
        p[f"encoderblock_{i}"] = {
            "MultiHeadDotProductAttention_0": attn,
            "LayerNorm_0": {
                "scale": take(hf + "attention.output.LayerNorm.weight"),
                "bias": take(hf + "attention.output.LayerNorm.bias")},
            "MlpBlock_0": {
                "Dense_0": {
                    "kernel": take(hf + "intermediate.dense.weight").T,
                    "bias": take(hf + "intermediate.dense.bias")},
                "Dense_1": {
                    "kernel": take(hf + "output.dense.weight").T,
                    "bias": take(hf + "output.dense.bias")}},
            "LayerNorm_1": {
                "scale": take(hf + "output.LayerNorm.weight"),
                "bias": take(hf + "output.LayerNorm.bias")},
        }
    leftover = set(sd) - consumed
    if leftover:
        raise ValueError(f"Unconsumed HF BERT keys: {sorted(leftover)[:8]}"
                         f"{'...' if len(leftover) > 8 else ''}")
    return p


def load(init_params, init_file, model_cfg=None, dont_load=()):
    """Loads npz checkpoints, HF-torch files (*.pt/*.bin/*.safetensors), or
    `hf:<model-name>` via the local transformers cache."""
    from clipa_tpu.models import common

    depth = len([k for k in init_params if k.startswith("encoderblock_")])
    heads = (model_cfg or {}).get("num_heads", 12)
    if str(init_file).startswith("hf:"):
        from transformers import BertModel
        hf = BertModel.from_pretrained(str(init_file)[3:])
        restored = convert_hf_state_dict(
            {k: v.detach().numpy() for k, v in hf.state_dict().items()},
            depth, heads)
    elif str(init_file).endswith(".safetensors"):
        # torch.load cannot parse safetensors; go through the safetensors
        # reader (numpy flavor — no torch tensors needed).
        try:
            from safetensors.numpy import load_file as _st_load
            sd = _st_load(init_file)
        except ImportError:
            from safetensors.torch import load_file as _st_load_t
            sd = {k: v.numpy() for k, v in _st_load_t(init_file).items()}
        sd = {k.removeprefix("bert."): v for k, v in sd.items()}
        restored = convert_hf_state_dict(sd, depth, heads)
    elif str(init_file).endswith((".pt", ".bin")):
        import torch
        sd = torch.load(init_file, map_location="cpu", weights_only=True)
        sd = sd.get("state_dict", sd)
        sd = {k.removeprefix("bert."): v.numpy() for k, v in sd.items()}
        restored = convert_hf_state_dict(sd, depth, heads)
    else:
        from clipa_tpu.train import checkpoint as ckpt
        restored = ckpt.load_params(init_file)
    return common.merge_params(restored, init_params, dont_load)
