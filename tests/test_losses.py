"""Losses: global vs local vs chunked InfoNCE equivalence, gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clipa_tpu import losses
from clipa_tpu.ops import infonce


def _embeddings(b=16, c=8, seed=0):
    rng = np.random.RandomState(seed)
    zimg = rng.randn(b, c).astype(np.float32)
    ztxt = rng.randn(b, c).astype(np.float32)
    zimg /= np.linalg.norm(zimg, axis=1, keepdims=True)
    ztxt /= np.linalg.norm(ztxt, axis=1, keepdims=True)
    return jnp.asarray(zimg), jnp.asarray(ztxt)


def test_contrastive_loss_value():
    zimg, ztxt = _embeddings()
    t = jnp.asarray(10.0)
    l, extras = losses.bidirectional_contrastive_loss(zimg, ztxt, t,
                                                      reduction=True)
    # hand-rolled naive reference
    logits = np.asarray(zimg) @ np.asarray(ztxt).T * 10.0
    p1 = logits - np.log(np.exp(logits).sum(1, keepdims=True))
    p2 = logits - np.log(np.exp(logits).sum(0, keepdims=True))
    expected = -0.5 * (np.diag(p1) + np.diag(p2)).mean()
    np.testing.assert_allclose(l, expected, rtol=1e-5)
    assert 0.0 <= extras["ncorrect"] <= 1.0


def test_contrastive_loss_mask():
    zimg, ztxt = _embeddings()
    mask = jnp.asarray([1.0] * 12 + [0.0] * 4)
    l, _ = losses.bidirectional_contrastive_loss(zimg, ztxt, 10.0, mask=mask,
                                                 reduction=True)
    l_sub, _ = losses.bidirectional_contrastive_loss(
        zimg[:12], ztxt[:12], 10.0, reduction=True)
    np.testing.assert_allclose(l, l_sub, rtol=1e-5)


def test_local_equals_global():
    zimg, ztxt = _embeddings(b=16)
    t = jnp.asarray(7.0)
    g_loss, _ = losses.bidirectional_contrastive_loss(zimg, ztxt, t,
                                                      reduction=True)
    # Simulate 4 devices each holding 4 rows.
    locals_ = []
    for rank in range(4):
        sl = slice(rank * 4, (rank + 1) * 4)
        l, _ = losses.local_contrastive_loss(
            zimg[sl], ztxt[sl], zimg, ztxt, t, rank, reduction=True)
        locals_.append(l)
    np.testing.assert_allclose(np.mean(locals_), g_loss, rtol=1e-5)


def test_chunked_equals_naive():
    zimg, ztxt = _embeddings(b=32)
    t = jnp.asarray(5.0)
    naive, naive_extras = losses.bidirectional_contrastive_loss(
        zimg, ztxt, t, reduction=True)
    for chunk in (4, 8, 16, 32):
        chunked, extras = infonce.chunked_contrastive_loss(
            zimg, ztxt, t, chunk_size=chunk)
        np.testing.assert_allclose(chunked, naive, rtol=1e-5)
        np.testing.assert_allclose(extras["ncorrect"],
                                   naive_extras["ncorrect"], rtol=1e-6)


def test_chunked_gradients_equal_naive():
    zimg, ztxt = _embeddings(b=32)

    def naive_fn(zi, zt, t):
        l, _ = losses.bidirectional_contrastive_loss(zi, zt, t, reduction=True)
        return l

    def chunked_fn(zi, zt, t):
        l, _ = infonce.chunked_contrastive_loss(zi, zt, t, chunk_size=8)
        return l

    t = jnp.asarray(5.0)
    g_naive = jax.grad(naive_fn, argnums=(0, 1, 2))(zimg, ztxt, t)
    g_chunked = jax.grad(chunked_fn, argnums=(0, 1, 2))(zimg, ztxt, t)
    for gn, gc in zip(g_naive, g_chunked):
        np.testing.assert_allclose(gc, gn, rtol=1e-4, atol=1e-6)


def test_chunked_prime_batch_raises():
    # A prime batch forces fallback chunk 1 -> pathological scan; the loss
    # must error loudly instead of silently training ~100x slower.
    zimg, ztxt = _embeddings(b=23)
    with pytest.raises(ValueError, match="no divisor near"):
        infonce.chunked_contrastive_loss(zimg, ztxt, 5.0, chunk_size=16)


def test_chunked_non_divisible_chunk():
    zimg, ztxt = _embeddings(b=24)
    naive, _ = losses.bidirectional_contrastive_loss(zimg, ztxt, 5.0,
                                                     reduction=True)
    chunked, _ = infonce.chunked_contrastive_loss(zimg, ztxt, 5.0,
                                                  chunk_size=7)
    np.testing.assert_allclose(chunked, naive, rtol=1e-5)


def test_sigmoid_contrastive_loss():
    zimg, ztxt = _embeddings(b=8)
    t, bias = 10.0, -10.0
    l, _ = losses.sigmoid_contrastive_loss(zimg, ztxt, t, bias=bias,
                                           reduction=True)
    # naive oracle: independent binary CE per pair, +1 on diag, -1 off.
    logits = np.asarray(zimg, np.float64) @ np.asarray(ztxt, np.float64).T
    logits = logits * t + bias
    signs = 2 * np.eye(8) - 1
    expected = np.log1p(np.exp(-signs * logits)).sum(1).mean()
    np.testing.assert_allclose(l, expected, rtol=1e-5)


def test_sigmoid_xent_matches_bce():
    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(4, 6), jnp.float32)
    labels = jnp.asarray(rng.rand(4, 6) > 0.5, jnp.float32)
    a = losses.sigmoid_xent(logits=logits, labels=labels, reduction=False)
    # cross-check vs direct formula
    p = jax.nn.sigmoid(logits)
    expected = -(labels * jnp.log(p) + (1 - labels) * jnp.log1p(-p)).sum(-1)
    np.testing.assert_allclose(a, expected, rtol=1e-4)


def test_mae_loss():
    rng = np.random.RandomState(0)
    pred = jnp.asarray(rng.randn(2, 8, 16), jnp.float32)
    target = jnp.asarray(rng.randn(2, 8, 16), jnp.float32)
    mask = jnp.ones((2, 8))
    l = losses.mae_loss(pred=pred, target=target, mask=mask)
    assert np.isfinite(l) and l > 0


def test_weighted_softmax_xent():
    rng = np.random.RandomState(0)
    logits = jnp.asarray(rng.randn(2, 5, 10), jnp.float32)
    labels = jnp.asarray(rng.randint(0, 10, (2, 5)))
    weights = jnp.ones((2, 5))
    l = losses.weighted_softmax_xent(logits=logits, labels=labels,
                                     weights=weights)
    assert np.isfinite(l)
