"""RoBERTa-family text tower (the reference's HF text-encoder path).

Capability parity with HFTextEncoder over roberta/xlm-roberta trunks
(clipa_torch/open_clip/hf_model.py:84-150 + hf_configs.py): a post-LN
BERT-style encoder with RoBERTa embedding semantics (position ids offset
past padding_idx, pad-masked attention), mean pooling over non-pad
positions, and the open_clip MLP projection (Linear -> GELU -> Linear,
hidden = (width + out)//2, no biases).

We own the architecture (no transformers runtime dependency — the
reference calls AutoModel); HF checkpoints load through
``convert_hf_roberta``. The mt5 trunks (encoder-decoder, relative
attention bias) remain a declared non-goal.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from clipa_tpu.models.bert import BertBlock

Array = Any

# Public architecture constants for the zoo's hf_model_name values
# (huggingface.co model cards; avoids AutoConfig network access).
HF_ARCHS = {
    "roberta-base": dict(width=768, depth=12, num_heads=12, mlp_dim=3072,
                         vocab_size=50265, max_len=514, pad_id=1),
    "xlm-roberta-base": dict(width=768, depth=12, num_heads=12,
                             mlp_dim=3072, vocab_size=250002, max_len=514,
                             pad_id=1),
    "xlm-roberta-large": dict(width=1024, depth=24, num_heads=16,
                              mlp_dim=4096, vocab_size=250002, max_len=514,
                              pad_id=1),
}


class _Model(nn.Module):
    num_classes: Optional[int] = None
    width: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_dim: Optional[int] = None
    vocab_size: int = 50265
    max_len: int = 514
    pad_id: int = 1
    dropout: float = 0.0
    proj: str = "mlp"  # "mlp" | "linear" | None (hf_model.py:124-133)
    ln_eps: float = 1e-5
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, text: Array, *, train: bool = False, **unused_kw):
        out = {}
        dtype = self.dtype or jnp.float32
        emb_init = nn.initializers.normal(stddev=0.02)
        pad_mask = text != self.pad_id  # (B, L)

        x = nn.Embed(self.vocab_size, self.width, embedding_init=emb_init,
                     param_dtype=jnp.float32, dtype=dtype,
                     name="word_embeddings")(text)
        # RoBERTa position ids: cumsum over non-pad, offset past padding_idx
        # (transformers create_position_ids_from_input_ids).
        pos_ids = jnp.cumsum(pad_mask, axis=1) * pad_mask + self.pad_id
        pos = self.param("position_embeddings", emb_init,
                         (self.max_len, self.width), jnp.float32)
        x = x + jnp.take(pos, pos_ids, axis=0).astype(dtype)
        seg = self.param("type_embeddings", emb_init, (1, 1, self.width),
                         jnp.float32)
        x = x + seg.astype(dtype)  # single-segment input (token_type 0)
        x = nn.LayerNorm(epsilon=self.ln_eps, dtype=dtype,
                         param_dtype=jnp.float32, name="embeddings_norm")(x)
        x = nn.Dropout(rate=self.dropout)(x, not train)

        attn_mask = pad_mask[:, None, None, :]  # keys masked for all queries
        for i in range(self.depth):
            x = BertBlock(num_heads=self.num_heads,
                          mlp_dim=self.mlp_dim or 4 * self.width,
                          dropout=self.dropout, dtype=dtype,
                          name=f"encoderblock_{i}")(x, not train, attn_mask)
        out["encoded"] = x

        # MeanPooler (hf_model.py:46-52): masked mean over the sequence.
        m = pad_mask[..., None].astype(x.dtype)
        pooled = jnp.sum(x * m, axis=1) / jnp.sum(m, axis=1)
        out["head_input"] = pooled

        if self.num_classes:
            if self.proj == "mlp":
                hidden = (self.width + self.num_classes) // 2
                pooled = nn.Dense(hidden, use_bias=False,
                                  kernel_init=emb_init, dtype=dtype,
                                  param_dtype=jnp.float32,
                                  name="proj_fc")(pooled)
                pooled = nn.gelu(pooled, approximate=False)
                pooled = nn.Dense(self.num_classes, use_bias=False,
                                  kernel_init=emb_init, dtype=dtype,
                                  param_dtype=jnp.float32,
                                  name="head")(pooled)
            elif self.proj == "linear":
                pooled = nn.Dense(self.num_classes, use_bias=False,
                                  kernel_init=emb_init, dtype=dtype,
                                  param_dtype=jnp.float32,
                                  name="head")(pooled)
            out["logits"] = pooled
        return pooled.astype(jnp.float32), out


def Model(num_classes=None, *, variant=None, **kw):  # noqa: N802
    return _Model(num_classes, **{**(HF_ARCHS.get(variant) or {}), **kw})


def convert_hf_roberta(sd: dict, depth: int, num_heads: int) -> dict:
    """transformers Roberta/XLMRoberta state dict -> our parameter tree.

    Strict: raises on unconsumed weight tensors (same policy as
    compat.openclip.convert_torch_variables).
    """
    from clipa_tpu import utils as u

    sd = {k.removeprefix("roberta."): np.asarray(v) for k, v in sd.items()}
    consumed = set()

    def take(name):
        consumed.add(name)
        return sd[name]

    flat = {}
    flat["word_embeddings/embedding"] = take(
        "embeddings.word_embeddings.weight")
    flat["position_embeddings"] = take(
        "embeddings.position_embeddings.weight")
    tt = take("embeddings.token_type_embeddings.weight")
    if tt.shape[0] != 1:
        # CLIP text input is single-segment; only row 0 is ever used.
        tt = tt[:1]
    flat["type_embeddings"] = tt.reshape(1, 1, -1)
    flat["embeddings_norm/scale"] = take("embeddings.LayerNorm.weight")
    flat["embeddings_norm/bias"] = take("embeddings.LayerNorm.bias")

    width = flat["word_embeddings/embedding"].shape[1]
    hd = width // num_heads
    for i in range(depth):
        b = f"encoder.layer.{i}"
        o = f"encoderblock_{i}"
        attn = f"{o}/MultiHeadDotProductAttention_0"
        for hf, ours in (("query", "query"), ("key", "key"),
                         ("value", "value")):
            flat[f"{attn}/{ours}/kernel"] = take(
                f"{b}.attention.self.{hf}.weight").T.reshape(width,
                                                             num_heads, hd)
            flat[f"{attn}/{ours}/bias"] = take(
                f"{b}.attention.self.{hf}.bias").reshape(num_heads, hd)
        flat[f"{attn}/out/kernel"] = take(
            f"{b}.attention.output.dense.weight").T.reshape(num_heads, hd,
                                                            width)
        flat[f"{attn}/out/bias"] = take(f"{b}.attention.output.dense.bias")
        flat[f"{o}/LayerNorm_0/scale"] = take(
            f"{b}.attention.output.LayerNorm.weight")
        flat[f"{o}/LayerNorm_0/bias"] = take(
            f"{b}.attention.output.LayerNorm.bias")
        flat[f"{o}/MlpBlock_0/Dense_0/kernel"] = take(
            f"{b}.intermediate.dense.weight").T
        flat[f"{o}/MlpBlock_0/Dense_0/bias"] = take(
            f"{b}.intermediate.dense.bias")
        flat[f"{o}/MlpBlock_0/Dense_1/kernel"] = take(
            f"{b}.output.dense.weight").T
        flat[f"{o}/MlpBlock_0/Dense_1/bias"] = take(f"{b}.output.dense.bias")
        flat[f"{o}/LayerNorm_1/scale"] = take(f"{b}.output.LayerNorm.weight")
        flat[f"{o}/LayerNorm_1/bias"] = take(f"{b}.output.LayerNorm.bias")

    ignorable = ("embeddings.position_ids", "pooler.dense.weight",
                 "pooler.dense.bias")
    leftover = [k for k in sd if k not in consumed
                and not k.endswith(ignorable)]
    if leftover:
        raise ValueError(
            f"convert_hf_roberta left {len(leftover)} tensors unconsumed: "
            f"{leftover[:8]}")
    return u.recover_tree(list(flat.keys()), list(flat.values()))


def load(init_params, init_file, model_cfg=None, dont_load=()):
    from clipa_tpu.models import common
    from clipa_tpu.train import checkpoint as ckpt
    restored = ckpt.load_params(init_file)
    return common.merge_params(restored, init_params, dont_load)
