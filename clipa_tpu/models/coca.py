"""CoCa: contrastive captioner (two towers + multimodal caption decoder).

Capability parity with the reference CoCa (clipa_torch/open_clip/
coca_model.py:79-165): a ViT image tower that also emits its token
sequence, a text tower with an appended cls embedding (pooled contrastive
embedding) whose per-token outputs feed a causal+cross-attention decoder
predicting the next text token. Trained with CoCaLoss = clip_weight *
InfoNCE + caption_weight * CE(logits, next tokens, ignore pad).

The interface mirrors two_towers.Model — __call__(image, text) ->
(zimg, ztxt, out) with out["t"], out["logits"], out["labels"] — so the
SPMD trainer, evaluators, and checkpointing work unchanged
(config.model_name = "coca", config.loss = "coca").
"""

from __future__ import annotations

from typing import Any, Optional, Tuple, Union

import flax.linen as nn
import jax.numpy as jnp

from clipa_tpu.models import get_model_module, multimodal

ConfigDict = Any
Array = Any


class AttentionalPooler(nn.Module):
    """n_queries learned queries attending over the image tokens
    (clipa_torch/open_clip/transformer.py:169-192): q = ln_q(query),
    k/v projected from ln_k(context) (kdim = context width)."""

    d_model: int
    n_head: int = 8
    n_queries: int = 256
    ln_eps: float = 1e-5
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:  # noqa: F821
        dtype = self.dtype or x.dtype
        b = x.shape[0]
        query = self.param("query", nn.initializers.normal(stddev=1.0),
                           (self.n_queries, self.d_model), jnp.float32)
        x = nn.LayerNorm(epsilon=self.ln_eps, dtype=dtype,
                         param_dtype=jnp.float32, name="ln_k")(x)
        q = nn.LayerNorm(epsilon=self.ln_eps, dtype=dtype,
                         param_dtype=jnp.float32,
                         name="ln_q")(query.astype(dtype))

        dense = lambda d, name: nn.Dense(d, dtype=dtype,
                                         param_dtype=jnp.float32, name=name)
        hd = self.d_model // self.n_head
        q = dense(self.d_model, "q_proj")(q)            # (nq, d)
        k = dense(self.d_model, "k_proj")(x)            # (b, L, d)
        v = dense(self.d_model, "v_proj")(x)
        q = q.reshape(1, self.n_queries, self.n_head, hd)
        k = k.reshape(b, -1, self.n_head, hd)
        v = v.reshape(b, -1, self.n_head, hd)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q * (hd ** -0.5), k)
        attn = nn.softmax(logits.astype(jnp.float32), axis=-1).astype(dtype)
        y = jnp.einsum("bhqk,bkhd->bqhd", attn, v)
        y = y.reshape(b, self.n_queries, self.d_model)
        return dense(self.d_model, "out_proj")(y)


class Model(nn.Module):
    image: Optional[ConfigDict] = None
    text: Optional[ConfigDict] = None
    multimodal_cfg: Optional[ConfigDict] = None
    image_model: str = "vit"
    # "text_transformer" (CLIP tower + appended cls) or an HF-trunk tower
    # ("hf_text"/"t5_text") — the reference's coca_roberta path
    # (coca_model.py:95-100 builds self.text via _build_text_tower, which
    # returns HFTextEncoder when text_cfg.hf_model_name is set).
    text_model: str = "text_transformer"
    out_dim: Union[int, Tuple[int, int]] = 512
    temperature_init: float = 1 / 0.07
    # vision_cfg.attentional_pool (coca_ViT-B-32.json): pool the image
    # tokens with n_queries learned queries; token 0 of the pooled set is
    # the contrastive embedding, tokens 1..n feed the decoder.
    attentional_pool: bool = False
    n_queries: int = 256
    attn_pooler_heads: int = 8
    pad_id: int = 0
    ln_eps: float = 1e-5
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, image, text=None, *, train: bool = False,
                 mask_ratio: float = 0.0, embed_cls: bool = True, **kw):
        """Returns (zimg, ztxt, out); out carries the caption logits/labels.

        embed_cls=True truncates text[:, :-1] before the tower to make room
        for the appended cls token (coca_model.py:136-137); generation
        passes embed_cls=False to decode over the full prefix.
        """
        out = {}
        out_dims = self.out_dim
        if isinstance(out_dims, int):
            out_dims = (out_dims, out_dims)

        ztxt = zimg = None
        text_tokens = None
        if text is not None:
            full_text = text
            # The cls-slot truncation happens at the CoCa level for EVERY
            # tower type (coca_model.py:137 `text[:, :-1] if embed_cls`),
            # including the HF trunks, which have no appended cls of their
            # own — parity requires keeping it here, not inside the tower.
            if embed_cls:
                text = text[:, :-1]
            if self.text_model == "text_transformer":
                text_model = get_model_module("text_transformer").Model(
                    **{"num_classes": out_dims[1], "dtype": self.dtype,
                       "embed_cls": True, "pad_id": self.pad_id,
                       **(self.text or {})}, name="txt")
                ztxt, out_txt = text_model(text, train=train)
                text_tokens = out_txt["tokens"]
            else:
                # HF trunk (hf_text/t5_text): pooled projection is the
                # contrastive embedding; the decoder cross-reads the FULL
                # hidden-state sequence (hf_model.py:144-151 — tokens are
                # the unprojected last_hidden_state for a mean pooler).
                text_model = get_model_module(self.text_model).Model(
                    **{"num_classes": out_dims[1], "dtype": self.dtype,
                       **(self.text or {})}, name="txt")
                ztxt, out_txt = text_model(text, train=train)
                text_tokens = out_txt["encoded"]
            out["txt/norm"] = jnp.linalg.norm(ztxt, axis=1, keepdims=True)
            out["txt/normalized"] = ztxt = ztxt / (out["txt/norm"] + 1e-8)
            # next-token labels: the last len(tokens) ids of the ORIGINAL
            # text (coca_model.py:156) — with embed_cls, text[:, 1:].
            out["labels"] = full_text[:, -text_tokens.shape[1]:]
            for k, v in out_txt.items():
                out[f"txt/{k}"] = v

        image_tokens = None
        if image is not None:
            image_model = get_model_module(self.image_model).Model(
                **{"num_classes": None, "pool_type": "0",
                   "dtype": self.dtype, **(self.image or {})}, name="img")
            _, out_img = image_model(image, train=train,
                                     mask_ratio=mask_ratio, **kw)
            encoded = out_img["encoded"]  # (B, 1+L, width), pre-ln_post
            dtype = encoded.dtype
            if self.attentional_pool:
                # attn_pool -> ln_post -> (token 0, rest); proj is
                # (out_dim, out_dim) (transformer.py:403-405,516-519).
                x = AttentionalPooler(
                    d_model=out_dims[0], n_head=self.attn_pooler_heads,
                    n_queries=self.n_queries, ln_eps=self.ln_eps,
                    dtype=self.dtype, name="img_pool")(encoded)
                x = nn.LayerNorm(epsilon=self.ln_eps, dtype=dtype,
                                 param_dtype=jnp.float32,
                                 name="img_encoder_norm")(x)
                pooled, image_tokens = x[:, 0], x[:, 1:]
            else:
                # open_clip pool: pooled = ln_post(cls), tokens = raw rest
                # (transformer.py:472-478,521-523).
                pooled = nn.LayerNorm(epsilon=self.ln_eps, dtype=dtype,
                                      param_dtype=jnp.float32,
                                      name="img_encoder_norm")(encoded[:, 0])
                image_tokens = encoded[:, 1:]
            zimg = nn.Dense(
                out_dims[0], use_bias=False,
                kernel_init=nn.initializers.normal(
                    stddev=pooled.shape[-1] ** -0.5),
                dtype=dtype, param_dtype=jnp.float32,
                name="img_head")(pooled).astype(jnp.float32)
            out["img/norm"] = jnp.linalg.norm(zimg, axis=1, keepdims=True)
            out["img/normalized"] = zimg = zimg / (out["img/norm"] + 1e-8)

        if text_tokens is not None and image_tokens is not None:
            mm = dict(self.multimodal_cfg or {})
            decoder = multimodal.Decoder(
                vocab_size=mm.pop("vocab_size",
                                  (self.text or {}).get("vocab_size", 49408)),
                width=mm.pop("width", text_tokens.shape[-1]),
                dtype=self.dtype, ln_eps=self.ln_eps, **mm, name="decoder")
            out["logits"] = decoder(text_tokens, image_tokens, train=train)

        temp_init = jnp.log(self.temperature_init)
        t = self.param("t", lambda key, shape, dtype_: temp_init *
                       jnp.ones(shape, dtype_), (1,), jnp.float32)
        out["t"] = jnp.exp(t)
        out["t/parameter"] = t
        return zimg, ztxt, out


def load(init_params, init_file, model_cfg=None, dont_load=()):
    from clipa_tpu.models import common
    from clipa_tpu.train import checkpoint as ckpt
    restored = ckpt.load_params(init_file)
    return common.merge_params(restored, init_params, dont_load)
