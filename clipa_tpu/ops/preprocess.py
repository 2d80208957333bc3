"""On-device input preprocessing.

CLIPA ships uint8 images to the device and normalizes there — at 84px the
model is small enough that host->device bandwidth is the bottleneck, so the
transfer must stay uint8 (4x smaller than fp32; reference:
clipa_jax/main.py:248-253 `cpu_unit8` and clipa_torch/training/train.py:191-197
`--to-float-on-device`).

Here the normalize (and optionally the patchify reshape) is a device op that
XLA fuses directly into the stem convolution's input; a Pallas variant exists
for the fused uint8->normalized-patches path used at full resolution.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

# ImageNet channel statistics scaled to the uint8 range (the "vgg_value_range"
# convention the reference trains with, clipa_jax/transforms/ops_image.py:338-361).
IMAGENET_MEAN_255 = (0.485 * 255, 0.456 * 255, 0.406 * 255)
IMAGENET_STD_255 = (0.229 * 255, 0.224 * 255, 0.225 * 255)


def normalize_uint8(images: Array,
                    mean=IMAGENET_MEAN_255,
                    std=IMAGENET_STD_255,
                    dtype=jnp.float32) -> Array:
    """(B, H, W, 3) uint8 -> normalized float, on device.

    Written so XLA fuses it into the consumer (the patch-embed conv): a single
    HBM read of the uint8 batch, no fp32 image ever materialized.
    """
    mean = jnp.asarray(mean, dtype)[None, None, None, :]
    inv_std = 1.0 / jnp.asarray(std, dtype)[None, None, None, :]
    return (images.astype(dtype) - mean) * inv_std


def normalize_and_patchify(images: Array, patch_size: int,
                           mean=IMAGENET_MEAN_255,
                           std=IMAGENET_STD_255,
                           dtype=jnp.bfloat16) -> Array:
    """uint8 (B, H, W, 3) -> normalized (B, L, p*p*3) patches in one pass.

    Feeds the 'linear' patch-embed path: the stem matmul then runs straight
    on MXU with a (L, p*p*3) x (p*p*3, width) GEMM.
    """
    b, h, w, c = images.shape
    p = patch_size
    if h % p or w % p:
        raise ValueError(f"Image {h}x{w} not divisible by patch {p}")
    x = normalize_uint8(images, mean, std, dtype)
    x = x.reshape(b, h // p, p, w // p, p, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, (h // p) * (w // p), p * p * c)
