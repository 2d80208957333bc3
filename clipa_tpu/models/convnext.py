"""ConvNeXt image tower (optional alternative to ViT).

Capability parity with the reference tower (clipa_jax/models/convnext.py):
4x4 patchify stem, four stages of ConvNeXt blocks (7x7 depthwise conv ->
LN -> pointwise 4x expand -> GELU -> project, optional layer scale,
DropPath) with 2x2 downsampling between stages, GAP + LN + head. Module
names match the reference tree (embedding, downsample_layers{i}{j},
encoderblock_j / stages{i}{j}, norm, head).

TPU note: depthwise 7x7 convs lower to XLA's grouped convolution — fine on
v5e; the pointwise convs are plain GEMMs on the MXU (the FLOPs bulk).
"""

from __future__ import annotations

from typing import Any, Callable, Iterable, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from clipa_tpu.models.layers import DropPath

Array = Any

_init = nn.initializers.normal(0.02)


class DepthwiseConv2D(nn.Module):
    """Depthwise conv via feature_group_count (one filter per channel)."""

    kernel_shape: Tuple[int, int] = (7, 7)
    stride: Tuple[int, int] = (1, 1)
    use_bias: bool = True
    kernel_init: Callable = _init
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        c = x.shape[-1]
        dtype = self.dtype or x.dtype
        kernel = self.param("kernel", self.kernel_init,
                            self.kernel_shape + (1, c), jnp.float32)
        y = jax.lax.conv_general_dilated(
            x.astype(dtype), kernel.astype(dtype), self.stride, "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (c,),
                              jnp.float32)
            y = y + bias.astype(dtype)
        return y


class ConvNeXtBlock(nn.Module):
    dim: int
    layer_scale_init_value: float = 0.0
    drop_path: float = 0.0
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: Array, deterministic: bool = True) -> Array:
        dtype = self.dtype or x.dtype
        y = DepthwiseConv2D((7, 7), dtype=dtype, name="dwconv")(x)
        y = nn.LayerNorm(dtype=dtype, param_dtype=jnp.float32,
                         name="norm")(y)
        y = nn.Dense(4 * self.dim, kernel_init=_init, dtype=dtype,
                     param_dtype=jnp.float32, name="pwconv1")(y)
        y = nn.gelu(y)
        y = nn.Dense(self.dim, kernel_init=_init, dtype=dtype,
                     param_dtype=jnp.float32, name="pwconv2")(y)
        if self.layer_scale_init_value > 0:
            gamma = self.param(
                "gamma",
                lambda k, s: jnp.full(s, self.layer_scale_init_value),
                (self.dim,))
            y = gamma.astype(dtype) * y
        return x + DropPath(rate=self.drop_path)(y, deterministic)


class _Model(nn.Module):
    num_classes: Optional[int] = None
    dims: Iterable[int] = (96, 192, 384, 768)
    depths: Iterable[int] = (3, 3, 9, 3)
    layer_scale_init_value: float = 0.0
    dropout: float = 0.0
    drop_path: float = 0.0
    head_zeroinit: bool = False
    # timm_proj="mlp" (open_clip timm_model.py Mlp head: hidden 2*embed_dim,
    # GELU, used by convnext_large_d): Dense(2*nc) -> gelu -> Dense(nc).
    head_mlp: bool = False
    remat_policy: str = "none"
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, image: Array, *, train: bool = False,
                 mask_ratio: float = 0.0):
        del mask_ratio  # token masking is a ViT concept
        out = {}
        dims, depths = tuple(self.dims), tuple(self.depths)
        dtype = self.dtype or image.dtype
        dp_rates = np.linspace(0, self.drop_path, sum(depths))
        curr = 0

        x = nn.Conv(dims[0], (4, 4), 4, kernel_init=_init, dtype=dtype,
                    param_dtype=jnp.float32,
                    name="embedding")(image.astype(dtype))
        x = nn.LayerNorm(dtype=dtype, param_dtype=jnp.float32,
                         name="downsample_layers01")(x)
        for j in range(depths[0]):
            x = ConvNeXtBlock(dims[0], self.layer_scale_init_value,
                              float(dp_rates[curr + j]), dtype=dtype,
                              name=f"encoderblock_{j}")(x, not train)
        curr += depths[0]

        for i in range(3):
            x = nn.LayerNorm(dtype=dtype, param_dtype=jnp.float32,
                             name=f"downsample_layers{i + 1}0")(x)
            x = nn.Conv(dims[i + 1], (2, 2), 2, kernel_init=_init,
                        dtype=dtype, param_dtype=jnp.float32,
                        name=f"downsample_layers{i + 1}1")(x)
            for j in range(depths[i + 1]):
                x = ConvNeXtBlock(dims[i + 1], self.layer_scale_init_value,
                                  float(dp_rates[curr + j]), dtype=dtype,
                                  name=f"stages{i + 1}{j}")(x, not train)
            curr += depths[i + 1]

        x = jnp.mean(x, axis=(1, 2))
        x = nn.LayerNorm(dtype=dtype, param_dtype=jnp.float32, name="norm")(x)
        out["head_input"] = x
        if self.num_classes:
            init = (nn.initializers.zeros if self.head_zeroinit
                    else nn.initializers.normal(stddev=dims[-1] ** -0.5))
            if self.head_mlp:
                x = nn.Dense(2 * self.num_classes, kernel_init=init,
                             dtype=dtype, param_dtype=jnp.float32,
                             name="head_mlp_fc")(x)
                x = jax.nn.gelu(x, approximate=False)
            x = nn.Dense(self.num_classes, kernel_init=init, dtype=dtype,
                         param_dtype=jnp.float32, name="head")(x)
            out["logits"] = x
        return x.astype(jnp.float32), out


def Model(num_classes=None, *, variant=None, **kw):  # noqa: N802
    return _Model(num_classes, **{**decode_variant(variant), **kw})


def decode_variant(variant: Optional[str]) -> dict:
    if variant is None:
        return {}
    v = variant.split("/")[0]
    return {
        "dims": {"T": (96, 192, 384, 768), "S": (96, 192, 384, 768),
                 "B": (128, 256, 512, 1024), "L": (192, 384, 768, 1536),
                 "XL": (256, 512, 1024, 2048)}[v],
        "depths": {"T": (3, 3, 9, 3), "S": (3, 3, 27, 3),
                   "B": (3, 3, 27, 3), "L": (3, 3, 27, 3),
                   "XL": (3, 3, 27, 3)}[v],
    }


def load(init_params, init_file, model_cfg=None, dont_load=()):
    from clipa_tpu.train import checkpoint as ckpt
    from clipa_tpu.models import common
    restored = ckpt.load_params(init_file)
    return common.merge_params(restored, init_params, dont_load)
