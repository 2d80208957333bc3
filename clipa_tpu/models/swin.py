"""Swin Transformer image tower (the reference's `swin_*` timm trunk).

Capability parity with the reference's timm-wrapped Swin vision tower
(clipa_torch/open_clip/timm_model.py:54-84 builds `timm.create_model(
"swin_base_patch4_window7_224")` + default avg pool + linear proj;
named by clipa_torch/open_clip/model_configs/swin_base_patch4_window7_224
.json). Rebuilt natively: 4x4 patch embed, four stages of windowed
attention blocks (LN -> [shifted] window MHA with learned relative
position bias -> residual, LN -> 4x MLP -> residual), 2x2 patch merging
between stages, final LN + token-mean pool + linear projection head.

TPU notes: every shape is static (224px -> 56/28/14/7 grids, all
divisible by window 7, so there is no padding and no dynamic control
flow). Window partitioning is pure reshape/transpose; cyclic shifts are
`jnp.roll` (one contiguous HBM copy); window attention lowers to large
*batched* GEMMs over (B * num_windows) windows of 49 tokens, which XLA
tiles onto the MXU. The shifted-window attention mask and the relative
position index are numpy constants baked at trace time.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from clipa_tpu.models.layers import DropPath

Array = Any

_init = nn.initializers.normal(0.02)


def _window_partition(x: Array, w: int) -> Array:
    """(B, H, W, C) -> (B * nH * nW, w*w, C)."""
    b, h, wd, c = x.shape
    x = x.reshape(b, h // w, w, wd // w, w, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, w * w, c)


def _window_reverse(x: Array, w: int, h: int, wd: int) -> Array:
    """(B * nH * nW, w*w, C) -> (B, H, W, C)."""
    c = x.shape[-1]
    x = x.reshape(-1, h // w, wd // w, w, w, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, h, wd, c)


def _relative_position_index(w: int) -> np.ndarray:
    """(w*w, w*w) indices into the (2w-1)^2 relative-position bias table."""
    coords = np.stack(np.meshgrid(np.arange(w), np.arange(w),
                                  indexing="ij"))          # (2, w, w)
    coords = coords.reshape(2, -1)                         # (2, w*w)
    rel = coords[:, :, None] - coords[:, None, :]          # (2, N, N)
    rel = rel.transpose(1, 2, 0) + (w - 1)                 # to [0, 2w-2]
    return (rel[..., 0] * (2 * w - 1) + rel[..., 1]).astype(np.int32)


def _shift_attn_mask(h: int, wd: int, w: int, shift: int) -> np.ndarray:
    """(nW, w*w, w*w) additive mask for shifted-window attention.

    After a cyclic shift, windows on the bottom/right edges contain tokens
    that were not spatially adjacent; pairs drawn from different pre-shift
    regions must not attend to each other. Region ids follow the standard
    3-band partition along each axis.
    """
    img = np.zeros((h, wd), dtype=np.int32)
    cnt = 0
    for hs in (slice(0, -w), slice(-w, -shift), slice(-shift, None)):
        for ws in (slice(0, -w), slice(-w, -shift), slice(-shift, None)):
            img[hs, ws] = cnt
            cnt += 1
    win = img.reshape(h // w, w, wd // w, w).transpose(0, 2, 1, 3)
    win = win.reshape(-1, w * w)                           # (nW, w*w)
    diff = win[:, :, None] - win[:, None, :]
    return np.where(diff == 0, 0.0, -1e9).astype(np.float32)


class WindowAttention(nn.Module):
    """Per-window MHA with a learned relative position bias table."""

    dim: int
    num_heads: int
    window: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: Array, mask: Optional[Array] = None) -> Array:
        bw, n, _ = x.shape
        dtype = self.dtype or x.dtype
        hd = self.dim // self.num_heads
        qkv = nn.Dense(3 * self.dim, kernel_init=_init, dtype=dtype,
                       param_dtype=jnp.float32, name="qkv")(x)
        qkv = qkv.reshape(bw, n, 3, self.num_heads, hd)
        q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))

        table = self.param("rel_pos_table", _init,
                           ((2 * self.window - 1) ** 2, self.num_heads),
                           jnp.float32)
        idx = _relative_position_index(self.window).reshape(-1)
        bias = table[idx].reshape(n, n, self.num_heads)
        bias = bias.transpose(2, 0, 1)                     # (heads, N, N)

        attn = jnp.einsum("bhqd,bhkd->bhqk", q, k) * (hd ** -0.5)
        attn = attn + bias[None].astype(attn.dtype)
        if mask is not None:
            nw = mask.shape[0]
            attn = attn.reshape(bw // nw, nw, self.num_heads, n, n)
            attn = attn + mask[None, :, None].astype(attn.dtype)
            attn = attn.reshape(bw, self.num_heads, n, n)
        attn = nn.softmax(attn.astype(jnp.float32), axis=-1).astype(dtype)
        y = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        y = y.transpose(0, 2, 1, 3).reshape(bw, n, self.dim)
        return nn.Dense(self.dim, kernel_init=_init, dtype=dtype,
                        param_dtype=jnp.float32, name="proj")(y)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window: int
    shift: int
    mlp_ratio: float = 4.0
    drop_path: float = 0.0
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        b, h, wd, c = x.shape
        dtype = self.dtype or x.dtype

        y = nn.LayerNorm(dtype=dtype, param_dtype=jnp.float32,
                         name="norm1")(x)
        if self.shift:
            y = jnp.roll(y, (-self.shift, -self.shift), axis=(1, 2))
            mask = jnp.asarray(
                _shift_attn_mask(h, wd, self.window, self.shift))
        else:
            mask = None
        y = _window_partition(y, self.window)
        y = WindowAttention(self.dim, self.num_heads, self.window,
                            dtype=dtype, name="attn")(y, mask)
        y = _window_reverse(y, self.window, h, wd)
        if self.shift:
            y = jnp.roll(y, (self.shift, self.shift), axis=(1, 2))
        x = x + DropPath(rate=self.drop_path)(y, deterministic)

        y = nn.LayerNorm(dtype=dtype, param_dtype=jnp.float32,
                         name="norm2")(x)
        y = nn.Dense(int(self.dim * self.mlp_ratio), kernel_init=_init,
                     dtype=dtype, param_dtype=jnp.float32, name="mlp_fc1")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, kernel_init=_init, dtype=dtype,
                     param_dtype=jnp.float32, name="mlp_fc2")(y)
        return x + DropPath(rate=self.drop_path)(y, deterministic)


class PatchMerging(nn.Module):
    """2x2 neighborhood concat (4C) -> LN -> Linear to 2C (no bias)."""

    dim: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        b, h, w, c = x.shape
        dtype = self.dtype or x.dtype
        x = x.reshape(b, h // 2, 2, w // 2, 2, c)
        # NOTE: this concatenates the 2x2 neighbors in (0,0),(0,1),(1,0),
        # (1,1) order; canonical timm uses (0,0),(1,0),(0,1),(1,1). Fine
        # for from-scratch training; a timm weight converter must permute
        # the `reduction` kernel's input rows (swap blocks 1 and 2 of 4).
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, w // 2, 4 * c)
        x = nn.LayerNorm(dtype=dtype, param_dtype=jnp.float32,
                         name="norm")(x)
        return nn.Dense(2 * self.dim, use_bias=False, kernel_init=_init,
                        dtype=dtype, param_dtype=jnp.float32,
                        name="reduction")(x)


class _Model(nn.Module):
    num_classes: Optional[int] = None
    embed_dim: int = 128                   # swin_base
    depths: Tuple[int, ...] = (2, 2, 18, 2)
    num_heads: Tuple[int, ...] = (4, 8, 16, 32)
    window: int = 7
    patch_size: int = 4
    mlp_ratio: float = 4.0
    drop_path: float = 0.0
    # open_clip's timm adapter projects with nn.Linear(bias=proj_bias),
    # proj_bias default False (timm_model.py:79).
    head_bias: bool = False
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, image: Array, *, train: bool = False,
                 mask_ratio: float = 0.0):
        del mask_ratio  # token masking is a (plain) ViT concept
        out = {}
        dtype = self.dtype or image.dtype
        dp = np.linspace(0, self.drop_path, sum(self.depths))
        cur = 0

        x = nn.Conv(self.embed_dim, (self.patch_size,) * 2,
                    self.patch_size, kernel_init=_init, dtype=dtype,
                    param_dtype=jnp.float32,
                    name="patch_embed")(image.astype(dtype))
        x = nn.LayerNorm(dtype=dtype, param_dtype=jnp.float32,
                         name="patch_norm")(x)

        dim = self.embed_dim
        for i, (depth, heads) in enumerate(zip(self.depths,
                                               self.num_heads)):
            if x.shape[1] % self.window or x.shape[2] % self.window:
                raise ValueError(
                    f"swin stage {i}: token grid {x.shape[1]}x{x.shape[2]} "
                    f"is not divisible by window {self.window}; image_size "
                    f"must satisfy size/{self.patch_size}/2^stage % "
                    f"{self.window} == 0 at every stage (224 works for "
                    f"window 7; 256 does not)")
            for j in range(depth):
                shift = 0 if j % 2 == 0 else self.window // 2
                # A window covering the whole grid never needs shifting
                # (the stage-4 7x7 grid in the 224px config).
                if min(x.shape[1], x.shape[2]) <= self.window:
                    shift = 0
                x = SwinBlock(dim, heads, self.window, shift,
                              self.mlp_ratio, float(dp[cur + j]),
                              dtype=dtype,
                              name=f"layers{i}_blocks{j}")(x, not train)
            cur += depth
            if i < len(self.depths) - 1:
                x = PatchMerging(dim, dtype=dtype,
                                 name=f"layers{i}_downsample")(x)
                dim *= 2

        x = nn.LayerNorm(dtype=dtype, param_dtype=jnp.float32,
                         name="norm")(x)
        x = jnp.mean(x, axis=(1, 2))       # timm default avg pool
        out["head_input"] = x
        if self.num_classes:
            x = nn.Dense(self.num_classes, use_bias=self.head_bias,
                         kernel_init=nn.initializers.normal(dim ** -0.5),
                         dtype=dtype, param_dtype=jnp.float32,
                         name="head")(x)
            out["logits"] = x
        return x.astype(jnp.float32), out


def Model(num_classes=None, *, variant=None, **kw):  # noqa: N802
    return _Model(num_classes, **{**decode_variant(variant), **kw})


def decode_variant(variant: Optional[str]) -> dict:
    if variant is None:
        return {}
    return {
        "T": dict(embed_dim=96, depths=(2, 2, 6, 2),
                  num_heads=(3, 6, 12, 24)),
        "S": dict(embed_dim=96, depths=(2, 2, 18, 2),
                  num_heads=(3, 6, 12, 24)),
        "B": dict(embed_dim=128, depths=(2, 2, 18, 2),
                  num_heads=(4, 8, 16, 32)),
        "L": dict(embed_dim=192, depths=(2, 2, 18, 2),
                  num_heads=(6, 12, 24, 48)),
    }[variant.split("/")[0]]


def load(init_params, init_file, model_cfg=None, dont_load=()):
    from clipa_tpu.train import checkpoint as ckpt
    from clipa_tpu.models import common
    restored = ckpt.load_params(init_file)
    return common.merge_params(restored, init_params, dont_load)
