"""mT5 encoder text tower (the reference's mt5 HF text-encoder path).

Capability parity with HFTextEncoder over mt5 trunks
(clipa_torch/open_clip/hf_model.py:108-112 takes `.encoder` of the
encoder-decoder model; hf_configs.py "mt5" + mean_pooler): a T5 encoder —
RMS layer norm (no mean subtraction, no bias), relative position bias
(bucketed, computed once in block 0 and shared), unscaled q·k attention,
gated-GELU feed-forward — with masked mean pooling and the open_clip MLP
projection.

We own the architecture (no transformers runtime dependency); HF
MT5EncoderModel checkpoints load through ``convert_hf_mt5``.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Array = Any

# Public architecture constants (huggingface.co mt5 configs).
T5_ARCHS = {
    "mt5-base": dict(width=768, mlp_dim=2048, depth=12, num_heads=12,
                     head_dim=64, vocab_size=250112),
    "mt5-xl": dict(width=2048, mlp_dim=5120, depth=24, num_heads=32,
                   head_dim=64, vocab_size=250112),
}


class RMSNorm(nn.Module):
    """T5LayerNorm: scale / sqrt(mean(x^2)+eps), no mean subtraction/bias."""

    eps: float = 1e-6
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        scale = self.param("scale", nn.initializers.ones,
                           (x.shape[-1],), jnp.float32)
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1,
                       keepdims=True)
        y = x.astype(jnp.float32) * jax.lax.rsqrt(var + self.eps)
        return (y * scale).astype(self.dtype or x.dtype)


def relative_position_bucket(rel_pos: Array, num_buckets: int = 32,
                             max_distance: int = 128) -> Array:
    """T5's bidirectional relative-position bucketing (HF
    T5Attention._relative_position_bucket semantics)."""
    num_buckets //= 2
    ret = (rel_pos > 0).astype(jnp.int32) * num_buckets
    n = jnp.abs(rel_pos)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-6)
        / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)).astype(jnp.int32)
    val_if_large = jnp.minimum(val_if_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_if_large)


class T5SelfAttention(nn.Module):
    """T5 self-attention: unscaled q·k dot (scaling folded into init),
    optional relative position bias, no projection biases."""

    num_heads: int
    head_dim: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: Array, pos_bias: Array,
                 key_mask: Optional[Array] = None) -> Array:
        dtype = self.dtype or x.dtype
        d_inner = self.num_heads * self.head_dim
        dense = lambda d, name: nn.Dense(d, use_bias=False, dtype=dtype,
                                         param_dtype=jnp.float32, name=name)
        b, l, _ = x.shape
        q = dense(d_inner, "q")(x).reshape(b, l, self.num_heads,
                                           self.head_dim)
        k = dense(d_inner, "k")(x).reshape(b, l, self.num_heads,
                                           self.head_dim)
        v = dense(d_inner, "v")(x).reshape(b, l, self.num_heads,
                                           self.head_dim)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k).astype(jnp.float32)
        scores = scores + pos_bias  # (1|B, H, L, L)
        if key_mask is not None:
            scores = jnp.where(key_mask[:, None, None, :], scores,
                               jnp.finfo(jnp.float32).min)
        attn = jax.nn.softmax(scores, axis=-1).astype(dtype)
        y = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, l, d_inner)
        return dense(x.shape[-1], "o")(y)


class _Model(nn.Module):
    num_classes: Optional[int] = None
    width: int = 768
    depth: int = 12
    num_heads: int = 12
    head_dim: int = 64
    mlp_dim: int = 2048
    vocab_size: int = 250112
    pad_id: int = 0
    rel_buckets: int = 32
    rel_max_distance: int = 128
    dropout: float = 0.0
    proj: str = "mlp"
    ln_eps: float = 1e-6
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, text: Array, *, train: bool = False, **unused_kw):
        out = {}
        dtype = self.dtype or jnp.float32
        pad_mask = text != self.pad_id

        x = nn.Embed(self.vocab_size, self.width,
                     embedding_init=nn.initializers.normal(stddev=1.0),
                     param_dtype=jnp.float32, dtype=dtype,
                     name="word_embeddings")(text)

        # Relative position bias: one (num_buckets, H) table, block 0 only,
        # shared by every block (HF has_relative_attention_bias semantics).
        l = text.shape[1]
        pos = jnp.arange(l)
        buckets = relative_position_bucket(pos[None, :] - pos[:, None],
                                           self.rel_buckets,
                                           self.rel_max_distance)
        rel_table = self.param("relative_attention_bias",
                               nn.initializers.normal(stddev=1.0),
                               (self.rel_buckets, self.num_heads),
                               jnp.float32)
        pos_bias = jnp.take(rel_table, buckets, axis=0)  # (L, L, H)
        pos_bias = jnp.transpose(pos_bias, (2, 0, 1))[None]  # (1, H, L, L)

        for i in range(self.depth):
            y = RMSNorm(eps=self.ln_eps, dtype=dtype,
                        name=f"block_{i}_ln0")(x)
            y = T5SelfAttention(self.num_heads, self.head_dim, dtype=dtype,
                                name=f"block_{i}_attn")(y, pos_bias,
                                                        pad_mask)
            x = x + nn.Dropout(rate=self.dropout)(y, not train)
            y = RMSNorm(eps=self.ln_eps, dtype=dtype,
                        name=f"block_{i}_ln1")(x)
            # mt5 gated-GELU FF (feed_forward_proj="gated-gelu": gelu_new,
            # i.e. the tanh approximation).
            dense = lambda d, name: nn.Dense(
                d, use_bias=False, dtype=dtype, param_dtype=jnp.float32,
                name=name)
            g = nn.gelu(dense(self.mlp_dim, f"block_{i}_wi0")(y),
                        approximate=True)
            y = g * dense(self.mlp_dim, f"block_{i}_wi1")(y)
            y = dense(self.width, f"block_{i}_wo")(y)
            x = x + nn.Dropout(rate=self.dropout)(y, not train)

        x = RMSNorm(eps=self.ln_eps, dtype=dtype, name="final_norm")(x)
        out["encoded"] = x

        m = pad_mask[..., None].astype(x.dtype)
        pooled = jnp.sum(x * m, axis=1) / jnp.maximum(
            jnp.sum(m, axis=1), 1.0)
        out["head_input"] = pooled

        if self.num_classes:
            emb_init = nn.initializers.normal(stddev=0.02)
            if self.proj == "mlp":
                hidden = (self.width + self.num_classes) // 2
                pooled = nn.Dense(hidden, use_bias=False,
                                  kernel_init=emb_init, dtype=dtype,
                                  param_dtype=jnp.float32,
                                  name="proj_fc")(pooled)
                pooled = nn.gelu(pooled, approximate=False)
            pooled = nn.Dense(self.num_classes, use_bias=False,
                              kernel_init=emb_init, dtype=dtype,
                              param_dtype=jnp.float32, name="head")(pooled)
            out["logits"] = pooled
        return pooled.astype(jnp.float32), out


def Model(num_classes=None, *, variant=None, **kw):  # noqa: N802
    return _Model(num_classes, **{**(T5_ARCHS.get(variant) or {}), **kw})


def convert_hf_mt5(sd: dict, depth: int) -> dict:
    """transformers MT5EncoderModel (or .encoder of MT5Model) state dict ->
    our parameter tree. Strict on leftover weight tensors."""
    from clipa_tpu import utils as u

    sd = {k.removeprefix("encoder."): np.asarray(v) for k, v in sd.items()}
    consumed = set()

    def take(name):
        consumed.add(name)
        return sd[name]

    flat = {}
    if "shared.weight" in sd:
        flat["word_embeddings/embedding"] = take("shared.weight")
        consumed.add("embed_tokens.weight")  # tied copy
    else:
        flat["word_embeddings/embedding"] = take("embed_tokens.weight")
    flat["relative_attention_bias"] = take(
        "block.0.layer.0.SelfAttention.relative_attention_bias.weight")
    flat["final_norm/scale"] = take("final_layer_norm.weight")
    for i in range(depth):
        b = f"block.{i}"
        flat[f"block_{i}_ln0/scale"] = take(f"{b}.layer.0.layer_norm.weight")
        for p in ("q", "k", "v", "o"):
            flat[f"block_{i}_attn/{p}/kernel"] = take(
                f"{b}.layer.0.SelfAttention.{p}.weight").T
        flat[f"block_{i}_ln1/scale"] = take(f"{b}.layer.1.layer_norm.weight")
        flat[f"block_{i}_wi0/kernel"] = take(
            f"{b}.layer.1.DenseReluDense.wi_0.weight").T
        flat[f"block_{i}_wi1/kernel"] = take(
            f"{b}.layer.1.DenseReluDense.wi_1.weight").T
        flat[f"block_{i}_wo/kernel"] = take(
            f"{b}.layer.1.DenseReluDense.wo.weight").T

    leftover = [k for k in sd if k not in consumed]
    if leftover:
        raise ValueError(
            f"convert_hf_mt5 left {len(leftover)} tensors unconsumed: "
            f"{leftover[:8]}")
    return u.recover_tree(list(flat.keys()), list(flat.values()))


def load(init_params, init_file, model_cfg=None, dont_load=()):
    from clipa_tpu.models import common
    from clipa_tpu.train import checkpoint as ckpt
    restored = ckpt.load_params(init_file)
    return common.merge_params(restored, init_params, dont_load)
