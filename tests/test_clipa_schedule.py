"""CLIPA schedule machinery: configs parse, augs run, cross-res masked_init."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clipa_tpu.config import load_config
from clipa_tpu.models import two_towers
from clipa_tpu.models.common import merge_params


def test_pretrain_config_parses():
    cfg = load_config(
        "clipa_tpu/configs/clipa_pretrain.py:img=L/16,res=112,runlocal")
    assert cfg.model.image.variant == "L/16"
    assert cfg.init_shapes[0] == (1, 112, 112, 3)
    assert "syntax_tokenize" in cfg.input.pp
    assert cfg.optax.mu_dtype == "bfloat16"
    assert cfg.loss == "softmax"


def test_pretrain_config_pod_scale():
    cfg = load_config(
        "clipa_tpu/configs/clipa_pretrain.py:img=H/14,res=84,batchsize=65536")
    assert cfg.input.batch_size == 65536
    assert cfg.total_steps == 12_800_000_000 // 65536
    assert cfg.lr == 8e-6 * 256
    assert cfg.model.image.remat_policy == "minimal"


def test_finetune_config_parses():
    cfg = load_config(
        "clipa_tpu/configs/clipa_finetune.py:img=H/14,res=224,"
        "mask_ratio=0.3,init=/tmp/x.npz,runlocal")
    assert cfg.mask_ratio == 0.3
    assert cfg.masked_init == "/tmp/x.npz"
    assert cfg.model.image.remat_policy == "minimal"


def test_finetune_336_schedule():
    cfg = load_config(
        "clipa_tpu/configs/clipa_finetune.py:img=H/14,res=336,"
        "mask_ratio=0.4,schedule_x=1,batchsize=32768")
    assert cfg.total_steps == 131_072_000 // 32768
    assert cfg.init_shapes[0] == (1, 336, 336, 3)


def test_bigg_loss_variants():
    for loss in ("chunked", "sigmoid"):
        cfg = load_config(
            f"clipa_tpu/configs/clipa_pretrain.py:img=G/14,loss={loss},"
            f"runlocal")
        assert cfg.loss == loss
        assert cfg.model.image.variant == "G/14"


def test_simclr_jitter_gray():
    from clipa_tpu.registry import get_preprocess_fn
    fn = get_preprocess_fn("simclr_jitter_gray(jitter_strength=0.4)")
    img = np.random.RandomState(0).randint(0, 255, (16, 16, 3), np.uint8)
    rng = np.random.default_rng(0)
    out = fn({"image": img, "_rng": rng})["image"]
    assert out.shape == img.shape and out.dtype == np.uint8
    # deterministic under the same rng
    out2 = fn({"image": img, "_rng": np.random.default_rng(0)})["image"]
    np.testing.assert_array_equal(out, out2)
    # grayscale branch eventually triggers: channels equal
    grays = 0
    rng = np.random.default_rng(1)
    for _ in range(50):
        o = fn({"image": img, "_rng": rng})["image"]
        if np.all(o[..., 0] == o[..., 1]):
            grays += 1
    assert 0 < grays < 50


def test_random_erase():
    from clipa_tpu.registry import get_preprocess_fn
    fn = get_preprocess_fn("random_erase(prob=1.0)")
    img = np.zeros((32, 32, 3), np.uint8)
    out = fn({"image": img, "_rng": np.random.default_rng(0)})["image"]
    assert out.std() > 0  # something was erased with noise


def test_mixup_cutmix():
    from clipa_tpu.pp.augment import mixup_cutmix
    rng = np.random.default_rng(0)
    batch = {"image": np.stack([np.zeros((8, 8, 3)), np.ones((8, 8, 3))])}
    out = mixup_cutmix(batch, rng)
    assert "mix_lam" in out and "mix_perm" in out
    assert out["mix_lam"].shape == (2,)  # batch-shaped for device sharding
    assert 0.0 <= float(out["mix_lam"][0]) <= 1.0


def test_mixup_mixes_onehot_labels():
    """Float one-hot labels are mixed in place (timm/reference semantics),
    so softmax/sigmoid losses need no loss-side changes."""
    from clipa_tpu.pp.augment import mixup_cutmix
    rng = np.random.default_rng(3)
    n, ncls = 8, 4
    onehot = np.eye(ncls, dtype=np.float32)[np.arange(n) % ncls]
    batch = {"image": np.random.default_rng(0).random((n, 8, 8, 3),
                                                      np.float32),
             "labels": onehot}
    out = mixup_cutmix(batch, rng, switch_prob=0.0)  # force mixup branch
    assert "mix_lam" not in out
    np.testing.assert_allclose(out["labels"].sum(-1), 1.0, rtol=1e-5)
    assert not np.allclose(out["labels"], onehot)  # actually mixed
    # smoothing keeps rows normalized too
    out2 = mixup_cutmix(dict(batch), rng, switch_prob=0.0,
                        label_smoothing=0.1)
    np.testing.assert_allclose(out2["labels"].sum(-1), 1.0, rtol=1e-5)


def test_mixup_wired_into_train_pipeline():
    """`config.input.mixup` reaches the batch stream via make_for_train's
    batch_fn hook (reference: input_pipeline.py:64-65)."""
    from clipa_tpu.data import core, pipeline
    from clipa_tpu.pp.augment import make_mixup_fn

    src = core.SyntheticSource(n_examples=32, res=8)

    def pp(s):
        return {"image": np.asarray(s["image"], np.float32)}

    it = pipeline.make_for_train(
        src, pp, batch_size=8, shuffle_buffer=1, seed=0, num_workers=0,
        batch_fn=make_mixup_fn(seed=0, switch_prob=0.0))
    b = next(it)
    assert b["image"].shape[0] == 8
    assert "mix_lam" in b and b["mix_perm"].shape == (8,)


def _tiny(res, posemb="learn"):
    model = two_towers.Model(
        image={"variant": "Ti/16", "pool_type": "gap", "posemb": posemb},
        text={"variant": "Ti", "pool_type": "last", "vocab_size": 64},
        out_dim=(32, 32), temperature_init=1 / 0.07)
    params = model.init({"params": jax.random.PRNGKey(0)},
                        jnp.zeros((1, res, res, 3)),
                        jnp.zeros((1, 8), jnp.int32))["params"]
    return model, params


def test_masked_init_cross_resolution():
    """The CLIPA two-stage flow: pretrain@32px -> unmask-tune@64px."""
    _, params32 = _tiny(32)
    model64, params64 = _tiny(64)

    merged = merge_params(jax.device_get(params32),
                          jax.device_get(params64), dont_load=[])
    # posemb resampled 2x2(+cls) -> 4x4(+cls)
    assert merged["img"]["pos_embedding"].shape == \
        params64["img"]["pos_embedding"].shape
    # all other weights carried over exactly
    np.testing.assert_array_equal(
        merged["img"]["Transformer"]["encoderblock_0"]["MlpBlock_0"][
            "Dense_0"]["kernel"],
        params32["img"]["Transformer"]["encoderblock_0"]["MlpBlock_0"][
            "Dense_0"]["kernel"])
    # merged params run at the new resolution
    zimg, _, _ = model64.apply({"params": merged},
                               jnp.ones((1, 64, 64, 3)), None)
    assert np.isfinite(np.asarray(zimg)).all()


def test_masked_init_with_masking_forward():
    """Full unmask-tuning step shape: cross-res init + random masking."""
    _, params32 = _tiny(32, posemb="sincos2d")
    model64, params64 = _tiny(64, posemb="sincos2d")
    merged = merge_params(jax.device_get(params32),
                          jax.device_get(params64), dont_load=[])
    zimg, _, out = model64.apply(
        {"params": merged}, jnp.ones((2, 64, 64, 3)), None,
        train=False, mask_ratio=0.3,
        rngs={"random_mask": jax.random.PRNGKey(0)})
    # 16 patches, 30% masked -> 11 kept + cls
    assert out["img/encoded"].shape[1] == 12
