"""ModifiedResNet image tower (OpenAI CLIP's anti-aliased ResNet).

Capability parity with the reference tower
(clipa_torch/open_clip/modified_resnet.py:95-181):

  * 3-conv stem (stride-2 first conv) + 2x2 average pool instead of the
    torchvision single 7x7 conv + max pool,
  * anti-aliased downsampling: every strided convolution becomes
    stride-1 conv preceded by an average pool (Bottleneck, :10-55),
  * the final pool is a single-query QKV attention over the 7x7 feature
    map with a learned (HW+1, C) positional embedding (AttentionPool2d,
    :58-92).

TPU-first notes: NHWC layout throughout (XLA's native conv layout on
TPU); the attention pool computes the query projection only for the
pooled token — the reference projects all HW+1 queries through
F.multi_head_attention_forward and then discards every row but the
first (:72-92), which is (HW+1)x wasted MXU work for identical output.
BatchNorm in train mode normalizes by the batch statistics of the
GLOBAL (GSPMD-sharded) batch — i.e. sync-BN for free; running statistics
live in the standard flax "batch_stats" collection and are updated only
when the caller marks it mutable (`model.apply(..., mutable=["batch_stats"])`,
the flax idiom). Eval uses the stored running statistics, which is what
loaded OpenAI/open_clip RN checkpoints provide.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

Array = Any


def _conv(features, kernel, name, dtype):
    return nn.Conv(features, (kernel, kernel), use_bias=False,
                   padding=[(kernel // 2, kernel // 2)] * 2,
                   dtype=dtype, param_dtype=jnp.float32, name=name)


def _bn(train, name, dtype):
    # torch BatchNorm2d defaults: eps 1e-5, momentum 0.1 (flax momentum is
    # the complement: ema = m*ema + (1-m)*batch).
    return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                        epsilon=1e-5, dtype=dtype, param_dtype=jnp.float32,
                        name=name)


def _avg_pool(x, stride):
    return nn.avg_pool(x, (stride, stride), (stride, stride))


class Bottleneck(nn.Module):
    """1x1 -> 3x3 -> (avgpool if strided) -> 1x1(4x), identity via
    avgpool+1x1 when shape changes (modified_resnet.py:10-55)."""

    planes: int
    stride: int = 1
    dtype: Optional[Any] = None
    expansion = 4

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        dtype = self.dtype or x.dtype
        inplanes = x.shape[-1]
        out = _conv(self.planes, 1, "conv1", dtype)(x)
        out = nn.relu(_bn(train, "bn1", dtype)(out))
        out = _conv(self.planes, 3, "conv2", dtype)(out)
        out = nn.relu(_bn(train, "bn2", dtype)(out))
        if self.stride > 1:
            out = _avg_pool(out, self.stride)
        out = _conv(self.planes * self.expansion, 1, "conv3", dtype)(out)
        out = _bn(train, "bn3", dtype)(out)

        identity = x
        if self.stride > 1 or inplanes != self.planes * self.expansion:
            identity = _avg_pool(x, self.stride) if self.stride > 1 else x
            identity = _conv(self.planes * self.expansion, 1,
                             "downsample_conv", dtype)(identity)
            identity = _bn(train, "downsample_bn", dtype)(identity)
        return nn.relu(out + identity)


class AttentionPool2d(nn.Module):
    """Single-query multi-head attention pool (modified_resnet.py:58-92).

    The query is the mean-pooled feature (token 0 after the mean-prepend);
    keys/values are all HW+1 tokens. Output = c_proj of the attended value.
    """

    num_heads: int
    output_dim: int
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        dtype = self.dtype or x.dtype
        b, h, w, c = x.shape
        x = x.reshape(b, h * w, c)
        x = jnp.concatenate([x.mean(axis=1, keepdims=True), x], axis=1)
        posemb = self.param("pos_embedding",
                            nn.initializers.normal(stddev=c ** -0.5),
                            (h * w + 1, c), jnp.float32)
        x = (x + posemb.astype(dtype)).astype(dtype)

        dense = lambda d, name: nn.Dense(
            d, dtype=dtype, param_dtype=jnp.float32,
            kernel_init=nn.initializers.normal(stddev=c ** -0.5), name=name)
        hd = c // self.num_heads
        q = dense(c, "q_proj")(x[:, :1])              # (b, 1, c)
        k = dense(c, "k_proj")(x)                     # (b, L, c)
        v = dense(c, "v_proj")(x)
        q = q.reshape(b, 1, self.num_heads, hd)
        k = k.reshape(b, -1, self.num_heads, hd)
        v = v.reshape(b, -1, self.num_heads, hd)
        # torch F.multi_head_attention_forward scales q by hd**-0.5 and
        # softmaxes in float32 under autocast; keep the softmax in f32.
        logits = jnp.einsum("bqhd,bkhd->bhqk", q * (hd ** -0.5), k)
        attn = nn.softmax(logits.astype(jnp.float32), axis=-1).astype(dtype)
        pooled = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, c)
        return dense(self.output_dim, "c_proj")(pooled)


class _Model(nn.Module):
    """ModifiedResNet trunk + attention pool -> (embedding, out dict)."""

    num_classes: Optional[int] = None
    layers: Sequence[int] = (3, 4, 6, 3)
    width: int = 64
    num_heads: Optional[int] = None  # default width*32 // 64 (head_width 64)
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, image: Array, *, train: bool = False,
                 mask_ratio: float = 0.0):
        del mask_ratio  # token masking is a ViT concept
        out = {}
        dtype = self.dtype or image.dtype
        w = self.width

        # 3-layer stem (modified_resnet.py:109-118,166-171); conv1 stride 2.
        x = nn.Conv(w // 2, (3, 3), 2, padding=[(1, 1), (1, 1)],
                    use_bias=False, dtype=dtype, param_dtype=jnp.float32,
                    name="conv1")(image.astype(dtype))
        x = nn.relu(_bn(train, "bn1", dtype)(x))
        x = _conv(w // 2, 3, "conv2", dtype)(x)
        x = nn.relu(_bn(train, "bn2", dtype)(x))
        x = _conv(w, 3, "conv3", dtype)(x)
        x = nn.relu(_bn(train, "bn3", dtype)(x))
        x = _avg_pool(x, 2)

        # 4 stages; the first block of stages 2-4 is strided (:121-139).
        for i, (blocks, planes) in enumerate(
                zip(self.layers, (w, w * 2, w * 4, w * 8))):
            for j in range(blocks):
                x = Bottleneck(planes, stride=2 if (j == 0 and i > 0) else 1,
                               dtype=dtype,
                               name=f"layer{i + 1}_{j}")(x, train)
        out["pre_pool"] = x

        embed_dim = w * 32
        heads = self.num_heads or embed_dim // 64
        x = AttentionPool2d(heads, self.num_classes or embed_dim,
                            dtype=dtype, name="attnpool")(x)
        out["head_input"] = x
        return x.astype(jnp.float32), out


def Model(num_classes=None, *, variant=None, **kw):  # noqa: N802
    return _Model(num_classes, **{**decode_variant(variant), **kw})


def decode_variant(variant: Optional[str]) -> dict:
    """RN variant table (clipa_torch/open_clip/model_configs/RN*.json)."""
    if variant is None:
        return {}
    return {
        "50": dict(layers=(3, 4, 6, 3), width=64),
        "101": dict(layers=(3, 4, 23, 3), width=64),
        "50x4": dict(layers=(4, 6, 10, 6), width=80),
        "50x16": dict(layers=(6, 8, 18, 8), width=96),
        "50x64": dict(layers=(3, 15, 36, 10), width=128),
    }[variant.removeprefix("RN")]


def load(init_params, init_file, model_cfg=None, dont_load=()):
    from clipa_tpu.models import common
    from clipa_tpu.train import checkpoint as ckpt
    restored = ckpt.load_params(init_file)
    return common.merge_params(restored, init_params, dont_load)
