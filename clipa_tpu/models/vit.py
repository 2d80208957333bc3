"""ViT image tower.

Capability-parity with the reference ViT (clipa_jax/models/vit.py:210-334):
conv/linear patchify, cls token, learnable or sincos2d position embeddings,
pre-LN encoder, {tok, gap, map, 0} pooling, optional projection head, and
CLIPA's MAE-style on-device random token masking (argsort-of-noise, keep the
(1-r)*L lowest). Parameter names match the reference tree so released npz
checkpoints load directly (embedding, cls, pos_embedding,
Transformer/encoderblock_i, encoder_norm, head, MAPHead_0).

TPU-first differences from the reference:
  * compute dtype is configurable (bf16 end-to-end on TPU; params fp32),
  * the attention core dispatches to a Pallas flash kernel at 224/336px,
  * posemb resampling for hi-res fine-tuning uses jax.image.resize (no scipy
    host round-trip).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from clipa_tpu.models import layers

Array = Any


def posemb_sincos_2d(h: int, w: int, width: int, temperature: float = 10_000.,
                     dtype=jnp.float32, cls_token: bool = False) -> Array:
    """Fixed 2D sin-cos position embedding (MoCo-v3 construction).

    Matches the reference grid (clipa_jax/models/vit.py:44-63): per-axis
    frequencies omega_i = 1/T^(i/(w/4-1)), layout [sin x | cos x | sin y | cos y],
    with an all-zeros row prepended for the cls token.
    """
    if width % 4:
        raise ValueError("sincos2d needs width % 4 == 0")
    y, x = np.mgrid[:h, :w]
    omega = np.arange(width // 4) / (width // 4 - 1)
    omega = 1.0 / (temperature ** omega)
    y = np.einsum("m,d->md", y.flatten(), omega)
    x = np.einsum("m,d->md", x.flatten(), omega)
    pe = np.concatenate([np.sin(x), np.cos(x), np.sin(y), np.cos(y)], axis=1)
    if cls_token:
        pe = np.concatenate([np.zeros((1, width)), pe], axis=0)
    return jnp.asarray(pe, dtype)[None]


def random_masking(x: Array, mask_ratio: float, rng: Array):
    """Keeps a random (1-mask_ratio) subset of tokens per sample.

    CLIPA-v2's image-token reduction for unmask-tuning
    (reference: clipa_jax/models/vit.py:310-334): draw iid uniform noise per
    token, keep the len_keep smallest. Returns (kept tokens, binary mask in
    original order with 1 = removed, restore indices).
    """
    n, l, _ = x.shape
    len_keep = int(l * (1 - mask_ratio))
    noise = jax.random.uniform(rng, (n, l))
    ids_shuffle = jnp.argsort(noise, axis=1)
    ids_restore = jnp.argsort(ids_shuffle, axis=1)
    ids_keep = ids_shuffle[:, :len_keep]
    x_masked = jnp.take_along_axis(x, ids_keep[:, :, None], axis=1)
    mask = jnp.ones((n, l)).at[:, :len_keep].set(0)
    mask = jnp.take_along_axis(mask, ids_restore, axis=1)
    return x_masked, mask, ids_restore


class MAPHead(nn.Module):
    """Multihead attention pooling (learned probe attends over tokens)."""

    num_heads: int = 12
    mlp_dim: Optional[int] = None
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        n, _, d = x.shape
        probe = self.param("probe", nn.initializers.xavier_uniform(),
                           (1, 1, d), jnp.float32)
        probe = jnp.tile(probe.astype(x.dtype), [n, 1, 1])
        x = layers.MultiHeadAttention(
            num_heads=self.num_heads, dtype=self.dtype,
            name="MultiHeadDotProductAttention_0")(probe, x)
        y = nn.LayerNorm(dtype=self.dtype, param_dtype=jnp.float32)(x)
        x = x + layers.MlpBlock(mlp_dim=self.mlp_dim, dtype=self.dtype,
                                name="MlpBlock_0")(y)
        return x[:, 0]


class _Model(nn.Module):
    """ViT encoder producing a pooled embedding (and optional head logits)."""

    num_classes: Optional[int] = None
    patch_size: Sequence[int] = (16, 16)
    width: int = 768
    depth: int = 12
    mlp_dim: Optional[int] = None
    num_heads: int = 12
    posemb: str = "learn"  # or "sincos2d"
    dropout: float = 0.0
    drop_path: float = 0.0
    pool_type: str = "gap"  # "map" | "tok" | "gap" | "gap_all" | "0"
    head_zeroinit: bool = False
    patch_embed: str = "conv"  # or "linear"
    remat_policy: str = "none"
    dtype: Optional[Any] = None  # compute dtype; params always fp32
    attn_impl: str = "auto"
    quant: Optional[str] = None  # None | "int8" forward matmuls
    # open_clip-variant fidelity (CLIPA-v1-style checkpoints):
    # pre-transformer LayerNorm (clipa_torch/open_clip/transformer.py:391)
    ln_pre: bool = False
    # tanh-approximate gelu (BigVision) vs erf gelu (open_clip default)
    gelu_approx: Any = True  # True=tanh, False=erf, "quick"=QuickGELU
    # LayerNorm epsilon: flax/big_vision 1e-6, torch/open_clip 1e-5
    ln_eps: float = 1e-6
    # LayerScale init (open_clip vision_cfg.ls_init_value); None = off
    ls_init: Optional[float] = None
    # Residual-stream layout: "flat" (B*L, D) or "ref3d" (B, L, D); see
    # layers.Encoder.stream.
    stream: str = "flat"

    @nn.compact
    def __call__(self, image: Array, *, train: bool = False,
                 mask_ratio: float = 0.0):
        out = {}
        dtype = self.dtype or image.dtype

        if self.patch_embed == "conv":
            x = nn.Conv(self.width, self.patch_size, strides=self.patch_size,
                        use_bias=False, padding="VALID", dtype=dtype,
                        param_dtype=jnp.float32,
                        name="embedding")(image.astype(dtype))
            n, h, w, c = x.shape
            x = x.reshape(n, h * w, c)
        elif self.patch_embed == "linear":
            p = self.patch_size[0]
            n = image.shape[0]
            h, w = image.shape[1] // p, image.shape[2] // p
            x = image.reshape(n, h, p, w, p, 3)
            x = jnp.einsum("nhpwqc->nhwpqc", x)
            x = x.reshape(n, h * w, p * p * 3)
            x = nn.Dense(self.width, dtype=dtype, param_dtype=jnp.float32,
                         name="embedding")(x.astype(dtype))
        else:
            raise ValueError(f"Unknown patch_embed {self.patch_embed!r}")
        c = x.shape[-1]

        cls = self.param("cls", nn.initializers.zeros, (1, 1, c), jnp.float32)
        x = jnp.concatenate([jnp.tile(cls.astype(dtype), [n, 1, 1]), x], axis=1)

        if self.posemb == "learn":
            pe = self.param("pos_embedding",
                            nn.initializers.normal(stddev=self.width ** -0.5),
                            (1, h * w + 1, c), jnp.float32)
        elif self.posemb == "sincos2d":
            pe = posemb_sincos_2d(h, w, c, cls_token=True)
        else:
            raise ValueError(f"Unknown posemb {self.posemb!r}")
        x = x + pe.astype(dtype)
        x = nn.Dropout(rate=self.dropout)(x, not train)

        if mask_ratio > 0:
            cls_tok = x[:, :1]
            rng = self.make_rng("random_mask")
            kept, mask, _ = random_masking(x[:, 1:], mask_ratio, rng)
            out["mask"] = mask
            x = jnp.concatenate([cls_tok, kept], axis=1)

        if self.ln_pre:
            x = nn.LayerNorm(epsilon=self.ln_eps, dtype=dtype,
                             param_dtype=jnp.float32, name="ln_pre")(x)

        x = layers.Encoder(
            depth=self.depth, num_heads=self.num_heads, mlp_dim=self.mlp_dim,
            dropout=self.dropout, drop_path=self.drop_path,
            remat_policy=self.remat_policy, dtype=dtype,
            attn_impl=self.attn_impl, quant=self.quant,
            gelu_approx=self.gelu_approx, ln_eps=self.ln_eps,
            ls_init=self.ls_init, stream=self.stream,
            name="Transformer")(x, not train)
        out["encoded"] = x

        if self.pool_type == "map":
            x = MAPHead(num_heads=self.num_heads, mlp_dim=self.mlp_dim,
                        dtype=dtype, name="MAPHead_0")(x)
        elif self.pool_type == "gap":
            x = jnp.mean(x[:, 1:], axis=1)
            x = nn.LayerNorm(epsilon=self.ln_eps, dtype=dtype,
                             param_dtype=jnp.float32, name="encoder_norm")(x)
        elif self.pool_type == "gap_all":
            # open_clip global_average_pool: mean over ALL tokens incl. cls,
            # then ln_post (clipa_torch/open_clip/transformer.py:472-478).
            x = jnp.mean(x, axis=1)
            x = nn.LayerNorm(epsilon=self.ln_eps, dtype=dtype,
                             param_dtype=jnp.float32, name="encoder_norm")(x)
        elif self.pool_type == "tok":
            x = nn.LayerNorm(epsilon=self.ln_eps, dtype=dtype,
                             param_dtype=jnp.float32, name="encoder_norm")(x)
            x = x[:, 0]
        elif self.pool_type == "0":
            x = x[:, 0]
        else:
            raise ValueError(f"Unknown pool_type {self.pool_type!r}")
        out["head_input"] = x

        if self.num_classes:
            init = (nn.initializers.zeros if self.head_zeroinit
                    else nn.initializers.normal(stddev=self.width ** -0.5))
            x = nn.Dense(self.num_classes, use_bias=False, kernel_init=init,
                         dtype=dtype, param_dtype=jnp.float32, name="head")(x)
            out["logits"] = x

        # Embeddings leave the tower in fp32: the loss (logit matmul + LSE)
        # is precision-sensitive at pod-scale batch.
        return x.astype(jnp.float32), out


def Model(num_classes=None, *, variant=None, **kw):  # noqa: N802
    """Builds a ViT from a variant string (e.g. "L/16") plus overrides."""
    return _Model(num_classes, **{**decode_variant(variant), **kw})


def decode_variant(variant: Optional[str]) -> dict:
    """"B/16" -> dims dict. Table 2 of arxiv.org/abs/2106.04560."""
    if variant is None:
        return {}
    v, _, patch = variant.partition("/")
    cfg = {
        "width": {"Ti": 192, "S": 384, "M": 512, "B": 768, "L": 1024,
                  "H": 1280, "g": 1408, "G": 1664, "e": 1792}[v],
        "depth": {"Ti": 12, "S": 12, "M": 12, "B": 12, "L": 24,
                  "H": 32, "g": 40, "G": 48, "e": 56}[v],
        "mlp_dim": {"Ti": 768, "S": 1536, "M": 2048, "B": 3072, "L": 4096,
                    "H": 5120, "g": 6144, "G": 8192, "e": 15360}[v],
        "num_heads": {"Ti": 3, "S": 6, "M": 8, "B": 12, "L": 16,
                      "H": 16, "g": 16, "G": 16, "e": 16}[v],
    }
    if patch:
        cfg["patch_size"] = (int(patch), int(patch))
    return cfg


def resample_posemb(old: Array, new: Array) -> Array:
    """Bilinearly resizes a (1, N, C) posemb grid for hi-res fine-tuning.

    Equivalent of the reference's scipy zoom path (clipa_jax/models/vit.py:364-379)
    but with jax.image.resize so it can run jitted on device.
    """
    if old.shape == new.shape:
        return old
    gs_old = int(np.sqrt(old.shape[1]))
    gs_new = int(np.sqrt(new.shape[1]))
    grid = old.reshape(gs_old, gs_old, -1)
    grid = jax.image.resize(grid, (gs_new, gs_new, grid.shape[-1]), "bilinear")
    return jnp.asarray(grid.reshape(1, gs_new * gs_new, -1), old.dtype)


def load(init_params, init_file, model_cfg=None, dont_load=()):
    """Loads tower params from an npz checkpoint, merging with random init."""
    del model_cfg
    from clipa_tpu.train import checkpoint as ckpt
    from clipa_tpu.models import common
    restored = ckpt.load_params(init_file)
    restored = common.merge_params(restored, init_params, dont_load)
    if init_params and "pos_embedding" in init_params \
            and "pos_embedding" in restored:
        restored["pos_embedding"] = resample_posemb(
            old=restored["pos_embedding"], new=init_params["pos_embedding"])
    if "pos_embedding" in dont_load and init_params:
        _, l, c = init_params["pos_embedding"].shape
        g = int(round((l - 1) ** 0.5))
        restored["pos_embedding"] = posemb_sincos_2d(g, g, c, cls_token=True)
    return restored
