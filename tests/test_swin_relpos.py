"""Swin + relpos-ViT towers (models/swin.py, models/vit_relpos.py).

Covers the last two reference model-config names
(clipa_torch/open_clip/model_configs/{swin_base_patch4_window7_224,
vit_relpos_medium_patch16_cls_224}.json, built there through the timm
adapter clipa_torch/open_clip/timm_model.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clipa_tpu.compat import openclip
from clipa_tpu.models import swin as swin_lib
from clipa_tpu.models import vit_relpos as relpos_lib


# ---------------------------------------------------------------- swin

def test_shift_attn_mask_bruteforce():
    """4x4 grid, window 2, shift 1 — hand-derived region partition."""
    m = swin_lib._shift_attn_mask(4, 4, 2, 1)
    assert m.shape == (4, 4, 4)
    # diagonal always allowed
    assert np.all(np.diagonal(m, axis1=1, axis2=2) == 0)
    allowed = (m == 0).sum(axis=(1, 2))
    # window 0: one region (16 allowed); windows crossing one wrap
    # boundary: two regions of 2 (8); the corner window: 4 distinct
    # regions (diagonal only).
    assert allowed.tolist() == [16, 8, 8, 4]


def test_window_partition_roundtrip():
    x = jnp.asarray(np.random.default_rng(0).random((2, 8, 8, 5)))
    y = swin_lib._window_reverse(swin_lib._window_partition(x, 4), 4, 8, 8)
    np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_window_attention_matches_dense_when_window_covers_grid():
    """shift=0 + window == grid -> equals a naive dense MHA w/ rel bias."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((3, 16, 24), np.float32))
    mod = swin_lib.WindowAttention(dim=24, num_heads=2, window=4)
    params = mod.init(jax.random.PRNGKey(0), x)
    y = mod.apply(params, x)

    p = params["params"]
    qkv = np.asarray(x) @ np.asarray(p["qkv"]["kernel"]) + np.asarray(
        p["qkv"]["bias"])
    q, k, v = np.split(qkv, 3, axis=-1)

    def heads(a):
        return a.reshape(3, 16, 2, 12).transpose(0, 2, 1, 3)

    q, k, v = heads(q), heads(k), heads(v)
    table = np.asarray(p["rel_pos_table"])
    idx = swin_lib._relative_position_index(4).reshape(-1)
    bias = table[idx].reshape(16, 16, 2).transpose(2, 0, 1)
    logits = np.einsum("bhqd,bhkd->bhqk", q, k) * (12 ** -0.5) + bias
    w = np.exp(logits - logits.max(-1, keepdims=True))
    w /= w.sum(-1, keepdims=True)
    ref = np.einsum("bhqk,bhkd->bhqd", w, v).transpose(0, 2, 1, 3)
    ref = ref.reshape(3, 16, 24) @ np.asarray(
        p["proj"]["kernel"]) + np.asarray(p["proj"]["bias"])
    np.testing.assert_allclose(np.asarray(y), ref, rtol=2e-5, atol=2e-5)


@pytest.fixture(scope="module")
def tiny_swin():
    model = swin_lib._Model(
        num_classes=8, embed_dim=16, depths=(2, 2), num_heads=(2, 4),
        window=2, patch_size=4)
    img = jnp.asarray(
        np.random.default_rng(2).random((2, 32, 32, 3), np.float32))
    params = model.init(jax.random.PRNGKey(0), img)
    return model, params, img

def test_tiny_swin_forward_and_grads(tiny_swin):
    model, params, img = tiny_swin
    z, out = model.apply(params, img)
    assert z.shape == (2, 8)
    assert out["head_input"].shape == (2, 32)
    assert np.all(np.isfinite(np.asarray(z)))

    def loss(p):
        return jnp.sum(model.apply(p, img)[0] ** 2)

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves_with_path(g)
    # relative-position table, patch-merging reduction, and both shifted
    # and unshifted block paths all receive gradient
    for needle in ("rel_pos_table", "reduction", "blocks1"):
        vals = [v for pth, v in leaves if needle in jax.tree_util.keystr(pth)]
        assert vals and any(float(jnp.abs(v).max()) > 0 for v in vals)


def test_swin_base_from_config_zoo():
    model = openclip.create_model("swin_base_patch4_window7_224")
    z = model.encode_image(
        np.random.default_rng(3).random((1, 224, 224, 3), np.float32))
    assert z.shape == (1, 640)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(z)), 1.0,
                               rtol=1e-4)
    n = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(
        model.params["img"]))
    # swin-B trunk is ~86.7M (timm swin_base_patch4_window7_224 minus its
    # 1000-class head) + 1024*640 proj
    assert 85e6 < n < 90e6, n


# --------------------------------------------------------------- relpos

def test_relpos_bias_zero_for_cls():
    mod = relpos_lib.RelPosMlpBias(grid=(3, 3), num_heads=2)
    bias = mod.apply(mod.init(jax.random.PRNGKey(0)))
    assert bias.shape == (2, 10, 10)
    assert np.all(np.asarray(bias)[:, 0, :] == 0)
    assert np.all(np.asarray(bias)[:, :, 0] == 0)
    # grid tokens get a non-degenerate bias (same relative offset ->
    # same bias; different offsets differ somewhere)
    b = np.asarray(bias)[:, 1:, 1:]
    np.testing.assert_allclose(b[:, 0, 1], b[:, 1, 2], rtol=1e-6)
    assert np.ptp(b) > 0


def test_relpos_coords_log_symmetric():
    # "cr" (default): timm RelPosMlp natural-log coords, no pre-scale —
    # extreme offset ±3 -> ±ln(4)
    c = relpos_lib._rel_coords_log(4, 4)
    assert c.shape == (49, 2)
    np.testing.assert_allclose(c, -c[::-1], atol=1e-6)
    np.testing.assert_allclose(np.abs(c).max(), np.log(4.0), rtol=1e-6)
    # "swinv2": log2(1+8)/log2(8) — range is [-~1.057, ~1.057]
    c = relpos_lib._rel_coords_log(4, 4, "swinv2")
    np.testing.assert_allclose(c, -c[::-1], atol=1e-6)
    assert np.abs(c).max() <= np.log2(9) / np.log2(8) + 1e-6


def test_tiny_relpos_forward_and_grads():
    model = relpos_lib._Model(num_classes=8, width=16, depth=2,
                              num_heads=2, patch_size=4, rel_pos_dim=8)
    img = jnp.asarray(
        np.random.default_rng(4).random((2, 16, 16, 3), np.float32))
    params = model.init(jax.random.PRNGKey(0), img)
    z, out = model.apply(params, img)
    assert z.shape == (2, 8)
    assert np.all(np.isfinite(np.asarray(z)))

    g = jax.grad(lambda p: jnp.sum(model.apply(p, img)[0] ** 2))(params)
    leaves = jax.tree_util.tree_leaves_with_path(g)
    for needle in ("rel_pos", "cls"):
        vals = [v for pth, v in leaves if needle in jax.tree_util.keystr(pth)]
        assert vals and any(float(jnp.abs(v).max()) > 0 for v in vals)


def test_relpos_medium_from_config_zoo():
    model = openclip.create_model("vit_relpos_medium_patch16_cls_224")
    z = model.encode_image(
        np.random.default_rng(5).random((1, 224, 224, 3), np.float32))
    assert z.shape == (1, 512)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(z)), 1.0,
                               rtol=1e-4)
    n = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(
        model.params["img"]))
    # ViT-M/16 (qkv_bias=False) + 12 relpos MLPs + proj: ~38-40M
    assert 36e6 < n < 42e6, n
