"""Flash attention kernel vs the XLA reference path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clipa_tpu.ops import flash_attention
from clipa_tpu.ops.attention import _xla_attention


def _qkv(b=2, l=128, h=2, d=64, seed=0, dtype=jnp.float32):
    rng = np.random.RandomState(seed)
    mk = lambda: jnp.asarray(rng.randn(b, l, h, d).astype(np.float32) * 0.3,
                             dtype)
    return mk(), mk(), mk()


@pytest.mark.parametrize("l", [128, 256])
def test_forward_matches_xla(l):
    q, k, v = _qkv(l=l)
    out = flash_attention.flash_attention(q, k, v)
    ref = _xla_attention(q, k, v, None)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)


def test_forward_unaligned_seq():
    """197 tokens (224px ViT) -> padded to tile size internally."""
    q, k, v = _qkv(l=197, h=1)
    out = flash_attention.flash_attention(q, k, v)
    ref = _xla_attention(q, k, v, None)
    assert out.shape == (2, 197, 1, 64)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)


def test_gradients_match_xla():
    q, k, v = _qkv(l=128, b=1, h=1, d=32)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention.flash_attention(q, k, v) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_xla_attention(q, k, v, None) ** 2)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(a, b, atol=5e-5, rtol=1e-3)


def test_gradients_unaligned_seq():
    q, k, v = _qkv(l=197, b=1, h=1, d=32)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention.flash_attention(q, k, v) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_xla_attention(q, k, v, None) ** 2)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(a, b, atol=5e-5, rtol=1e-3)


def test_bf16_inputs():
    q, k, v = _qkv(l=128, dtype=jnp.bfloat16)
    out = flash_attention.flash_attention(q, k, v)
    ref = _xla_attention(q, k, v, None)
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(out.astype(np.float32),
                               ref.astype(np.float32), atol=2e-2, rtol=2e-2)


def test_cross_attention_lengths():
    """MAPHead probe: 1 query over L keys."""
    q, _, _ = _qkv(l=8, h=2, d=64)
    _, k, v = _qkv(l=128, h=2, d=64, seed=1)
    out = flash_attention.flash_attention(q, k, v)
    ref = _xla_attention(q, k, v, None)
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)
