"""Fused whole-sequence attention kernel vs the XLA einsum path.

Runs the Pallas kernels in interpret mode on the CPU mesh. Comparisons are
made under jax.default_matmul_precision("highest"): the installed JAX
default lowers fp32 dots to bf16 passes, which would drown the comparison
in matmul noise unrelated to the kernel.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clipa_tpu.ops import attention, block_attention


SHAPES = [
    # (batch, seq, heads, head_dim) — 112px CLIPA, masked-token odd L, 224px
    (8, 50, 16, 64),
    (4, 37, 8, 16),
    (2, 257, 4, 32),
]


@pytest.mark.parametrize("b,l,h,hd", SHAPES)
def test_fused_forward_matches_xla(b, l, h, hd):
    d = h * hd
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(b, l, d), jnp.float32)
    k = jnp.asarray(rng.randn(b, l, d), jnp.float32)
    v = jnp.asarray(rng.randn(b, l, d), jnp.float32)
    with jax.default_matmul_precision("highest"):
        ref = attention.multi_head_attention(q, k, v, h, impl="xla")
        out = block_attention.fused_attention(q, k, v, h)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("b,l,h,hd", SHAPES)
def test_fused_grads_match_xla(b, l, h, hd):
    d = h * hd
    rng = np.random.RandomState(1)
    q = jnp.asarray(rng.randn(b, l, d), jnp.float32)
    k = jnp.asarray(rng.randn(b, l, d), jnp.float32)
    v = jnp.asarray(rng.randn(b, l, d), jnp.float32)

    def loss(fn):
        return lambda q, k, v: (fn(q, k, v) ** 2).sum()

    with jax.default_matmul_precision("highest"):
        gr = jax.grad(loss(lambda q, k, v: attention.multi_head_attention(
            q, k, v, h, impl="xla")), argnums=(0, 1, 2))(q, k, v)
        gf = jax.grad(loss(lambda q, k, v: block_attention.fused_attention(
            q, k, v, h)), argnums=(0, 1, 2))(q, k, v)
    for name, a, b_ in zip("qkv", gr, gf):
        scale = float(jnp.max(jnp.abs(a))) + 1e-9
        np.testing.assert_allclose(np.asarray(b_) / scale,
                                   np.asarray(a) / scale,
                                   atol=2e-5, err_msg=f"d{name}")


def test_bwd_vmem_fallback_matches():
    """Shapes whose backward plan exceeds VMEM still differentiate
    correctly through the XLA-math VJP fallback."""
    b, l, h, hd = 2, 64, 4, 16
    d = h * hd
    rng = np.random.RandomState(2)
    q = jnp.asarray(rng.randn(b, l, d), jnp.float32)
    k = jnp.asarray(rng.randn(b, l, d), jnp.float32)
    v = jnp.asarray(rng.randn(b, l, d), jnp.float32)

    orig = block_attention._VMEM_BUDGET_BWD
    try:
        block_attention._VMEM_BUDGET_BWD = 0  # force the fallback
        with jax.default_matmul_precision("highest"):
            gf = jax.grad(lambda q: (block_attention.fused_attention(
                q, k, v, h) ** 2).sum())(q)
            gr = jax.grad(lambda q: (attention.multi_head_attention(
                q, k, v, h, impl="xla") ** 2).sum())(q)
    finally:
        block_attention._VMEM_BUDGET_BWD = orig
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                               atol=2e-5, rtol=2e-4)


def test_head_split_plan_matches_xla():
    """Fine-tune lengths (336px: L=577) plan a head-chunked grid so the
    backward keeps whole-sequence q-tiles; the sliced-D blocks must still
    reproduce the XLA math (fwd and grads), including the ragged final
    q-tile (577 % 512)."""
    b, l, h, hd = 2, 577, 8, 64
    d = h * hd
    fwd_orig, bwd_orig = (block_attention._VMEM_BUDGET_FWD,
                          block_attention._VMEM_BUDGET_BWD)
    rng = np.random.RandomState(3)
    q = jnp.asarray(rng.randn(b, l, d), jnp.float32)
    k = jnp.asarray(rng.randn(b, l, d), jnp.float32)
    v = jnp.asarray(rng.randn(b, l, d), jnp.float32)
    try:
        budget = 6 * 1024 * 1024
        block_attention._VMEM_BUDGET_FWD = budget
        block_attention._VMEM_BUDGET_BWD = budget
        plan_f = block_attention._plan(b, l, d, h, bwd=False)
        plan_b = block_attention._plan(b, l, d, h, bwd=True)
        assert plan_f is not None and plan_f[2] < h, plan_f
        assert plan_b is not None and plan_b[2] < h, plan_b
        with jax.default_matmul_precision("highest"):
            out = block_attention.fused_attention(q, k, v, h)
            gf = jax.grad(lambda q, k, v: (block_attention.fused_attention(
                q, k, v, h) ** 2).sum(), argnums=(0, 1, 2))(q, k, v)
    finally:
        block_attention._VMEM_BUDGET_FWD = fwd_orig
        block_attention._VMEM_BUDGET_BWD = bwd_orig
    with jax.default_matmul_precision("highest"):
        ref = attention.multi_head_attention(q, k, v, h, impl="xla")
        gr = jax.grad(lambda q, k, v: (attention.multi_head_attention(
            q, k, v, h, impl="xla") ** 2).sum(), argnums=(0, 1, 2))(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
    for name, a, b_ in zip("qkv", gr, gf):
        scale = float(jnp.max(jnp.abs(a))) + 1e-9
        np.testing.assert_allclose(np.asarray(b_) / scale,
                                   np.asarray(a) / scale,
                                   atol=2e-5, err_msg=f"d{name}")


def test_eligibility():
    assert block_attention.eligible((512, 50, 1024), 16, None)
    assert block_attention.eligible((64, 577, 1280), 16, None)  # H/14 @336
    assert not block_attention.eligible((8, 50, 1024), 16, "mask")
    assert not block_attention.eligible((8, 50, 1000), 16, None)  # hd*H != D
    # sequence whose K/V slab cannot fit VMEM
    assert not block_attention.eligible((8, 100_000, 1024), 16, None)


def test_packed_layout_matches_4d_path():
    """multi_head_attention's packed-3D xla path equals the legacy 4D op."""
    b, l, h, hd = 4, 50, 8, 64
    d = h * hd
    rng = np.random.RandomState(3)
    q = jnp.asarray(rng.randn(b, l, d), jnp.float32)
    with jax.default_matmul_precision("highest"):
        packed = attention.multi_head_attention(q, q, q, h, impl="xla")
        q4 = q.reshape(b, l, h, hd)
        legacy = attention.dot_product_attention(q4, q4, q4, impl="xla")
    np.testing.assert_allclose(np.asarray(packed),
                               np.asarray(legacy.reshape(b, l, d)),
                               atol=1e-5)


# ---------------------------------------------------------------------------
# 2D-operand kernel (flat residual stream)
# ---------------------------------------------------------------------------

SHAPES_2D = [
    (8, 50, 16, 64),   # flagship pretrain shape (plans G=4/8)
    (8, 37, 8, 16),    # odd L with G=8 (8*L always 8-divisible)
    (4, 37, 8, 16),    # no 8-divisible group -> XLA fallback path
]


@pytest.mark.parametrize("b,l,h,hd", SHAPES_2D)
def test_fused2d_forward_matches_xla(b, l, h, hd):
    d = h * hd
    rng = np.random.RandomState(2)
    q = jnp.asarray(rng.randn(b * l, d), jnp.float32)
    k = jnp.asarray(rng.randn(b * l, d), jnp.float32)
    v = jnp.asarray(rng.randn(b * l, d), jnp.float32)
    with jax.default_matmul_precision("highest"):
        ref = attention.multi_head_attention(
            q.reshape(b, l, d), k.reshape(b, l, d), v.reshape(b, l, d),
            h, impl="xla").reshape(b * l, d)
        out = block_attention.fused_attention_2d(q, k, v, h, l)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


@pytest.mark.parametrize("b,l,h,hd", SHAPES_2D)
def test_fused2d_grads_match_xla(b, l, h, hd):
    d = h * hd
    rng = np.random.RandomState(3)
    q = jnp.asarray(rng.randn(b * l, d), jnp.float32)
    k = jnp.asarray(rng.randn(b * l, d), jnp.float32)
    v = jnp.asarray(rng.randn(b * l, d), jnp.float32)

    def ref_fn(q, k, v):
        o = attention.multi_head_attention(
            q.reshape(b, l, d), k.reshape(b, l, d), v.reshape(b, l, d),
            h, impl="xla")
        return (o.astype(jnp.float32) ** 2).sum()

    def fused_fn(q, k, v):
        o = block_attention.fused_attention_2d(q, k, v, h, l)
        return (o.astype(jnp.float32) ** 2).sum()

    with jax.default_matmul_precision("highest"):
        g_ref = jax.grad(ref_fn, argnums=(0, 1, 2))(q, k, v)
        g_out = jax.grad(fused_fn, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_out, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=3e-4, rtol=3e-4)


def test_fused2d_matches_3d_kernel():
    b, l, h, hd = 4, 50, 8, 32
    d = h * hd
    rng = np.random.RandomState(4)
    q = jnp.asarray(rng.randn(b, l, d), jnp.float32)
    k = jnp.asarray(rng.randn(b, l, d), jnp.float32)
    v = jnp.asarray(rng.randn(b, l, d), jnp.float32)
    with jax.default_matmul_precision("highest"):
        o3 = block_attention.fused_attention(q, k, v, h)
        o2 = block_attention.fused_attention_2d(
            q.reshape(b * l, d), k.reshape(b * l, d), v.reshape(b * l, d),
            h, l)
    np.testing.assert_allclose(np.asarray(o2), np.asarray(o3.reshape(b * l, d)),
                               atol=2e-5, rtol=2e-5)


def test_eligible_2d():
    # flagship pretrain shape
    assert block_attention.eligible_2d(512 * 50, 1024, 16, 50, None)
    # masked -> no
    assert not block_attention.eligible_2d(512 * 50, 1024, 16, 50, object())
    # rows not a multiple of seq -> no
    assert not block_attention.eligible_2d(512 * 50 + 1, 1024, 16, 50, None)
    # head_dim not a multiple of 8 -> no
    assert not block_attention.eligible_2d(8 * 50, 36, 3, 50, None)


@pytest.mark.parametrize("b,l,h,hd", SHAPES_2D[:2])
def test_fused2d_bias_forward_and_grads(b, l, h, hd):
    """The bias-fused kernel == attention(q+bq, k+bk, v+bv), incl. the
    bias grads its backward emits from VMEM partials."""
    d = h * hd
    rng = np.random.RandomState(5)
    q = jnp.asarray(rng.randn(b * l, d), jnp.float32)
    k = jnp.asarray(rng.randn(b * l, d), jnp.float32)
    v = jnp.asarray(rng.randn(b * l, d), jnp.float32)
    bq = jnp.asarray(rng.randn(d), jnp.float32)
    bk = jnp.asarray(rng.randn(d), jnp.float32)
    bv = jnp.asarray(rng.randn(d), jnp.float32)

    def ref_fn(q, k, v, bq, bk, bv):
        o = attention.multi_head_attention(
            (q + bq).reshape(b, l, d), (k + bk).reshape(b, l, d),
            (v + bv).reshape(b, l, d), h, impl="xla")
        return (o.astype(jnp.float32) ** 2).sum()

    def fused_fn(q, k, v, bq, bk, bv):
        o = block_attention.fused_attention_2d_b(q, k, v, bq, bk, bv, h, l)
        return (o.astype(jnp.float32) ** 2).sum()

    with jax.default_matmul_precision("highest"):
        out = block_attention.fused_attention_2d_b(q, k, v, bq, bk, bv, h, l)
        ref = attention.multi_head_attention(
            (q + bq).reshape(b, l, d), (k + bk).reshape(b, l, d),
            (v + bv).reshape(b, l, d), h, impl="xla").reshape(b * l, d)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)
        g_ref = jax.grad(ref_fn, argnums=tuple(range(6)))(q, k, v, bq, bk, bv)
        g_out = jax.grad(fused_fn, argnums=tuple(range(6)))(q, k, v,
                                                            bq, bk, bv)
    for a, b_ in zip(g_out[:3], g_ref[:3]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=3e-4, rtol=3e-4)
    # A bias grad is the rowsum of the corresponding tensor grad: tight
    # against the kernel's OWN dq/dk/dv (pure accumulation-order noise),
    # loose against the XLA reference (the summed per-element softmax
    # rounding diffs are correlated, so they don't cancel like the
    # per-element comparison above).
    for db, dt, db_ref in zip(g_out[3:], g_out[:3], g_ref[3:]):
        np.testing.assert_allclose(np.asarray(db),
                                   np.asarray(dt).sum(axis=0),
                                   atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(db), np.asarray(db_ref),
                                   atol=5e-3, rtol=5e-3)


def test_mha_qkv_biases_arg_matches_inline_add():
    """multi_head_attention(qkv_biases=...) == adding the biases up front,
    on the XLA fallback path (CPU) for both 2D and 3D operands."""
    b, l, h, hd = 2, 12, 4, 16
    d = h * hd
    rng = np.random.RandomState(6)
    q = jnp.asarray(rng.randn(b, l, d), jnp.float32)
    k = jnp.asarray(rng.randn(b, l, d), jnp.float32)
    v = jnp.asarray(rng.randn(b, l, d), jnp.float32)
    biases = tuple(jnp.asarray(rng.randn(d), jnp.float32) for _ in range(3))
    ref = attention.multi_head_attention(q + biases[0], k + biases[1],
                                         v + biases[2], h)
    out3 = attention.multi_head_attention(q, k, v, h, qkv_biases=biases)
    np.testing.assert_allclose(np.asarray(out3), np.asarray(ref),
                               atol=1e-6, rtol=1e-6)
    out2 = attention.multi_head_attention(
        q.reshape(b * l, d), k.reshape(b * l, d), v.reshape(b * l, d),
        h, seq_len=l, qkv_biases=biases)
    np.testing.assert_allclose(np.asarray(out2),
                               np.asarray(ref.reshape(b * l, d)),
                               atol=1e-6, rtol=1e-6)


@pytest.mark.parametrize("variant", ["3d", "2d", "2d_bias"])
def test_exact_softmax_mode_matches_xla_at_huge_logits(variant):
    """attn impl 'fused_exact' (rowmax-subtracted softmax) stays exact when
    attention logits exceed the clip threshold — the regime where the
    default clipped kernels intentionally deviate (ADVICE r4: logit growth
    past the clip is a documented instability mode of large CLIP runs)."""
    b, l, h, hd = 2, 40, 4, 16
    d = h * hd
    rng = np.random.RandomState(7)
    # scale q so some logits land far past _EXP_CLIP
    q = jnp.asarray(rng.randn(b, l, d) * 40, jnp.float32)
    k = jnp.asarray(rng.randn(b, l, d), jnp.float32)
    v = jnp.asarray(rng.randn(b, l, d), jnp.float32)
    zeros = jnp.zeros((d,), jnp.float32)

    def fwd(fn, *args):
        with jax.default_matmul_precision("highest"):
            return np.asarray(fn(*args))

    ref = fwd(lambda q, k, v: attention.multi_head_attention(
        q, k, v, h, impl="xla"), q, k, v)
    if variant == "3d":
        out = fwd(lambda q, k, v: block_attention.fused_attention(
            q, k, v, h, True), q, k, v)
        clipped = fwd(lambda q, k, v: block_attention.fused_attention(
            q, k, v, h, False), q, k, v)
    elif variant == "2d":
        out = fwd(lambda q, k, v: block_attention.fused_attention_2d(
            q.reshape(b * l, d), k.reshape(b * l, d), v.reshape(b * l, d),
            h, l, True).reshape(b, l, d), q, k, v)
        clipped = fwd(lambda q, k, v: block_attention.fused_attention_2d(
            q.reshape(b * l, d), k.reshape(b * l, d), v.reshape(b * l, d),
            h, l, False).reshape(b, l, d), q, k, v)
    else:
        out = fwd(lambda q, k, v: block_attention.fused_attention_2d_b(
            q.reshape(b * l, d), k.reshape(b * l, d), v.reshape(b * l, d),
            zeros, zeros, zeros, h, l, True).reshape(b, l, d), q, k, v)
        clipped = fwd(lambda q, k, v: block_attention.fused_attention_2d_b(
            q.reshape(b * l, d), k.reshape(b * l, d), v.reshape(b * l, d),
            zeros, zeros, zeros, h, l, False).reshape(b, l, d), q, k, v)
    np.testing.assert_allclose(out, ref, atol=3e-5, rtol=3e-5)
    # sanity: the clipped kernel really does deviate here, so the exact
    # assert above is not vacuous
    assert np.abs(clipped - ref).max() > 1e-3


def test_clip_saturation_zeroes_attention_grads():
    """In the clipped (default) kernels the VJP is the true gradient of the
    clipped forward: where every logit of a row saturates, d(logit) == 0,
    so dq collapses to zero instead of emitting plausible-but-wrong
    updates (the saturation signal visible in the step's l2_grads)."""
    b, l, h, hd = 1, 40, 4, 16
    d = h * hd
    rng = np.random.RandomState(8)
    # all logits pushed far past the clip: whole rows saturate
    q = jnp.asarray(np.abs(rng.randn(b * l, d)) * 200 + 200, jnp.float32)
    k = jnp.asarray(np.abs(rng.randn(b * l, d)) + 1.0, jnp.float32)
    v = jnp.asarray(rng.randn(b * l, d), jnp.float32)

    def loss(q, k, v):
        return (block_attention.fused_attention_2d(q, k, v, h, l) ** 2).sum()

    with jax.default_matmul_precision("highest"):
        dq, dk, _ = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    assert float(jnp.abs(dq).max()) == 0.0
    assert float(jnp.abs(dk).max()) == 0.0


def test_bwd2d_vmem_fallback_uses_3d_kernel_and_matches_xla():
    """At fine-tune lengths (224px masked: L=138) no 2D backward group fits
    VMEM, but the head-chunked 3D backward does: the 2D VJP must route
    there (NOT to the XLA einsum VJP, whose fp32 (B,H,L,L) score tensors
    measured 153 GB/step of HBM traffic at B=256) and still match XLA
    grads — incl. the bias variant's row-sum bias grads."""
    b, l, h, hd = 8, 138, 16, 64
    d = h * hd
    assert block_attention._plan_2d(b, l, d, h, bwd=True, bias=True) is None
    assert block_attention._plan(b, l, d, h, bwd=True) is not None

    rng = np.random.RandomState(9)
    q = jnp.asarray(rng.randn(b * l, d) * 0.1, jnp.float32)
    k = jnp.asarray(rng.randn(b * l, d) * 0.1, jnp.float32)
    v = jnp.asarray(rng.randn(b * l, d) * 0.1, jnp.float32)
    bq = jnp.asarray(rng.randn(d) * 0.05, jnp.float32)
    bk = jnp.asarray(rng.randn(d) * 0.05, jnp.float32)
    bv = jnp.asarray(rng.randn(d) * 0.05, jnp.float32)

    def fused_loss(q, k, v, bq, bk, bv):
        o = block_attention._call_bwd_2d_b  # noqa: F841 (routing asserted above)
        out = block_attention.fused_attention_2d_b(q, k, v, bq, bk, bv, h, l)
        return (out.astype(jnp.float32) ** 2).sum()

    def ref_loss(q, k, v, bq, bk, bv):
        o = attention.multi_head_attention(
            (q + bq).reshape(b, l, d), (k + bk).reshape(b, l, d),
            (v + bv).reshape(b, l, d), h, impl="xla")
        return (o.astype(jnp.float32) ** 2).sum()

    with jax.default_matmul_precision("highest"):
        gf = jax.grad(fused_loss, argnums=tuple(range(6)))(q, k, v,
                                                           bq, bk, bv)
        gr = jax.grad(ref_loss, argnums=tuple(range(6)))(q, k, v, bq, bk, bv)
    # dbk is excluded from the vs-XLA comparison: softmax row-gradients sum
    # to zero, so the true dbk is identically 0 and both sides compute pure
    # accumulation noise (summing b*l rows of O(1) rounding) — instead
    # bound it by the same noise scale.
    for name, a, r in zip(("dq", "dk", "dv", "dbq", "dbv"),
                          gf[:3] + (gf[3], gf[5]),
                          gr[:3] + (gr[3], gr[5])):
        scale = float(jnp.max(jnp.abs(r))) + 1e-9
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(r) / scale,
                                   atol=2e-4, err_msg=name)
    noise = float(jnp.max(jnp.abs(gr[1]))) * np.sqrt(b * l) * 1e-3
    assert float(jnp.max(jnp.abs(gf[4]))) < max(noise, 1e-3), "dbk not noise"
