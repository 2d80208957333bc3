"""Fused uint8 patch-embed vs the reference normalize->conv path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clipa_tpu.ops import patch_embed, preprocess


def _reference(images, kernel, mean, std):
    """normalize -> patchify -> matmul, in fp32."""
    x = preprocess.normalize_uint8(images, mean, std, jnp.float32)
    p = kernel.shape[0]
    b, h, w, c = x.shape
    x = x.reshape(b, h // p, p, w // p, p, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(
        b, (h // p) * (w // p), p * p * c)
    return jnp.dot(x, kernel.reshape(-1, kernel.shape[-1]))


@pytest.mark.parametrize("impl", ["xla", "pallas"])
def test_fused_matches_reference(impl):
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randint(0, 255, (2, 32, 32, 3), np.uint8))
    kernel = jnp.asarray(rng.randn(16, 16, 3, 128).astype(np.float32) * 0.02)
    ref = np.asarray(_reference(images, kernel, preprocess.IMAGENET_MEAN_255,
                                preprocess.IMAGENET_STD_255))
    out = np.asarray(patch_embed.fused_patch_embed(
        images, kernel, out_dtype=jnp.float32, impl=impl))
    assert out.shape == (2, 4, 128)
    np.testing.assert_allclose(out, ref, rtol=2e-3, atol=2e-3)


def test_fold_normalization_with_bias():
    rng = np.random.RandomState(1)
    images = jnp.asarray(rng.randint(0, 255, (1, 16, 16, 3), np.uint8))
    kernel = jnp.asarray(rng.randn(16, 16, 3, 128).astype(np.float32) * 0.02)
    bias = jnp.asarray(rng.randn(128).astype(np.float32))
    ref = _reference(images, kernel, preprocess.IMAGENET_MEAN_255,
                     preprocess.IMAGENET_STD_255) + bias
    out = patch_embed.fused_patch_embed(images, kernel, bias=bias,
                                        out_dtype=jnp.float32, impl="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)
