"""Model towers: shapes, param naming (npz parity), masking, variants."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clipa_tpu import utils as u
from clipa_tpu.models import text as text_mod
from clipa_tpu.models import two_towers
from clipa_tpu.models import vit as vit_mod


def tiny_model(**kw):
    return two_towers.Model(
        image={"variant": "Ti/16", "pool_type": "tok", "posemb": "sincos2d"},
        text={"variant": "Ti", "pool_type": "last", "vocab_size": 128},
        out_dim=(64, 64), temperature_init=1 / 0.07, **kw)


@pytest.fixture(scope="module")
def tiny_params():
    model = tiny_model()
    rng = jax.random.PRNGKey(0)
    images = jnp.zeros((2, 32, 32, 3))
    texts = jnp.zeros((2, 8), jnp.int32)
    params = model.init({"params": rng}, images, texts)["params"]
    return model, params


def test_forward_shapes(tiny_params):
    model, params = tiny_params
    images = jnp.ones((2, 32, 32, 3))
    texts = jnp.ones((2, 8), jnp.int32)
    zimg, ztxt, out = model.apply({"params": params}, images, texts)
    assert zimg.shape == (2, 64) and ztxt.shape == (2, 64)
    np.testing.assert_allclose(np.linalg.norm(zimg, axis=1), 1.0, atol=1e-3)
    np.testing.assert_allclose(np.linalg.norm(ztxt, axis=1), 1.0, atol=1e-3)
    np.testing.assert_allclose(out["t"], 1 / 0.07, rtol=1e-5)


def test_param_names_match_reference_layout(tiny_params):
    """Released CLIPA npz checkpoints must load: names are the contract."""
    _, params = tiny_params
    names = {n for n, _ in u.tree_flatten_with_names(params)[0]}
    expected_subset = {
        "t",
        "img/embedding/kernel",
        "img/cls",
        "img/Transformer/encoderblock_0/LayerNorm_0/scale",
        "img/Transformer/encoderblock_0/MultiHeadDotProductAttention_0/query/kernel",
        "img/Transformer/encoderblock_0/MultiHeadDotProductAttention_0/out/kernel",
        "img/Transformer/encoderblock_0/MlpBlock_0/Dense_0/kernel",
        "img/Transformer/encoderblock_0/MlpBlock_0/Dense_1/bias",
        "img/Transformer/encoderblock_11/LayerNorm_1/bias",
        "img/encoder_norm/scale",
        "img/head/kernel",
        "txt/Embed_0/embedding",
        "txt/pos_embedding",
        "txt/Transformer/encoderblock_0/MultiHeadDotProductAttention_0/key/bias",
        "txt/encoder_norm/bias",
        "txt/head/kernel",
    }
    missing = expected_subset - names
    assert not missing, f"Missing reference param names: {sorted(missing)}"
    # sincos2d posemb must NOT create a learnable img/pos_embedding.
    assert "img/pos_embedding" not in names


def test_attention_param_shapes(tiny_params):
    _, params = tiny_params
    attn = params["img"]["Transformer"]["encoderblock_0"][
        "MultiHeadDotProductAttention_0"]
    width, heads = 192, 3
    assert attn["query"]["kernel"].shape == (width, heads, width // heads)
    assert attn["query"]["bias"].shape == (heads, width // heads)
    assert attn["out"]["kernel"].shape == (heads, width // heads, width)
    assert attn["out"]["bias"].shape == (width,)


def test_param_count_b16():
    """ViT-B/16 image tower ~86M params (sanity vs decode_variant table)."""
    model = vit_mod.Model(variant="B/16", pool_type="tok", posemb="learn")
    params = jax.eval_shape(
        lambda rng: model.init(rng, jnp.zeros((1, 224, 224, 3)))["params"],
        jax.random.PRNGKey(0))
    n = sum(np.prod(x.shape) for x in jax.tree_util.tree_leaves(params))
    assert 85e6 < n < 88e6, f"got {n / 1e6:.1f}M"


def test_mask_ratio_reduces_tokens():
    model = vit_mod.Model(variant="Ti/16", pool_type="tok", posemb="sincos2d")
    rng = jax.random.PRNGKey(0)
    images = jnp.ones((2, 64, 64, 3))
    params = model.init({"params": rng}, images)["params"]
    _, out_full = model.apply({"params": params}, images,
                              rngs={"random_mask": rng})
    _, out_masked = model.apply({"params": params}, images, mask_ratio=0.5,
                                rngs={"random_mask": rng})
    # 16 patches: full = 16+cls, masked keeps 8+cls.
    assert out_full["encoded"].shape[1] == 17
    assert out_masked["encoded"].shape[1] == 9


def test_random_masking_determinism():
    rng = jax.random.PRNGKey(42)
    x = jnp.arange(2 * 16 * 4, dtype=jnp.float32).reshape(2, 16, 4)
    kept1, mask1, _ = vit_mod.random_masking(x, 0.25, rng)
    kept2, mask2, _ = vit_mod.random_masking(x, 0.25, rng)
    np.testing.assert_array_equal(kept1, kept2)
    np.testing.assert_array_equal(mask1, mask2)
    assert kept1.shape == (2, 12, 4)
    # mask marks exactly L - len_keep positions as removed.
    np.testing.assert_array_equal(mask1.sum(axis=1), [4, 4])


def test_pool_types():
    for pool in ("tok", "gap", "map", "0"):
        model = vit_mod.Model(variant="Ti/16", pool_type=pool, posemb="sincos2d")
        rng = jax.random.PRNGKey(0)
        images = jnp.ones((1, 32, 32, 3))
        params = model.init({"params": rng}, images)["params"]
        z, _ = model.apply({"params": params}, images)
        assert z.shape == (1, 192) if pool == "0" else z.shape[0] == 1


def test_text_pool_types():
    for pool in ("last", "tok", "gap"):
        model = text_mod.Model(variant="Ti", pool_type=pool, vocab_size=64)
        rng = jax.random.PRNGKey(0)
        texts = jnp.ones((2, 8), jnp.int32)
        params = model.init({"params": rng}, texts)["params"]
        z, _ = model.apply({"params": params}, texts)
        assert z.shape == (2, 192)


def test_decode_variant_tables():
    assert vit_mod.decode_variant("L/14") == {
        "width": 1024, "depth": 24, "mlp_dim": 4096, "num_heads": 16,
        "patch_size": (14, 14)}
    assert vit_mod.decode_variant("H/14")["depth"] == 32
    # Text B differs from image B (512 wide, 8 heads).
    t = text_mod.decode_variant("B")
    assert t["width"] == 512 and t["num_heads"] == 8


def test_posemb_sincos2d_properties():
    pe = vit_mod.posemb_sincos_2d(4, 4, 64, cls_token=True)
    assert pe.shape == (1, 17, 64)
    np.testing.assert_array_equal(np.asarray(pe)[0, 0], np.zeros(64))


def test_resample_posemb():
    old = jnp.asarray(np.random.RandomState(0).randn(1, 16, 8), jnp.float32)
    new = jnp.zeros((1, 64, 8))
    out = vit_mod.resample_posemb(old, new)
    assert out.shape == (1, 64, 8)
    same = vit_mod.resample_posemb(old, jnp.zeros((1, 16, 8)))
    np.testing.assert_array_equal(same, old)


def test_image_only_and_text_only_calls(tiny_params):
    model, params = tiny_params
    zimg, ztxt, _ = model.apply({"params": params},
                                jnp.ones((2, 32, 32, 3)), None)
    assert ztxt is None and zimg.shape == (2, 64)
    zimg, ztxt, _ = model.apply({"params": params}, None,
                                jnp.ones((2, 8), jnp.int32))
    assert zimg is None and ztxt.shape == (2, 64)


def test_bf16_compute_dtype():
    model = tiny_model(dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    images = jnp.ones((2, 32, 32, 3))
    texts = jnp.ones((2, 8), jnp.int32)
    params = model.init({"params": rng}, images, texts)["params"]
    # params stay fp32
    leaf_dtypes = {x.dtype for x in jax.tree_util.tree_leaves(params)}
    assert leaf_dtypes == {jnp.dtype(jnp.float32)}
    zimg, ztxt, _ = model.apply({"params": params}, images, texts)
    # embeddings leave the tower in fp32 for the loss
    assert zimg.dtype == jnp.float32 and ztxt.dtype == jnp.float32


def test_convnext_tower():
    from clipa_tpu.models import convnext
    model = convnext.Model(num_classes=32, dims=(16, 32, 64, 128),
                           depths=(1, 1, 2, 1))
    rng = jax.random.PRNGKey(0)
    images = jnp.ones((2, 64, 64, 3))
    params = model.init({"params": rng}, images)["params"]
    z, out = model.apply({"params": params}, images)
    assert z.shape == (2, 32)
    names = {n for n, _ in u.tree_flatten_with_names(params)[0]}
    # reference-compatible module names
    assert "embedding/kernel" in names
    assert "encoderblock_0/dwconv/kernel" in names
    assert "stages10/pwconv1/kernel" in names
    assert "stages21/pwconv2/kernel" in names
    assert "downsample_layers11/kernel" in names


def test_convnext_in_two_towers():
    model = two_towers.Model(
        image={"dims": (16, 32, 64, 128), "depths": (1, 1, 2, 1)},
        image_model="convnext",
        text={"variant": "Ti", "pool_type": "last", "vocab_size": 64},
        out_dim=(32, 32), temperature_init=1 / 0.07)
    rng = jax.random.PRNGKey(0)
    zimg, ztxt, _ = model.apply(
        {"params": model.init({"params": rng}, jnp.ones((1, 32, 32, 3)),
                              jnp.ones((1, 8), jnp.int32))["params"]},
        jnp.ones((1, 32, 32, 3)), jnp.ones((1, 8), jnp.int32))
    assert zimg.shape == (1, 32) and ztxt.shape == (1, 32)


def test_bert_tower():
    from clipa_tpu.models import bert
    model = bert.Model(num_classes=32, width=64, depth=2, mlp_dim=128,
                       num_heads=4, vocab_size=100, max_len=16)
    rng = jax.random.PRNGKey(0)
    tokens = jnp.ones((2, 8), jnp.int32)
    params = model.init({"params": rng}, tokens)["params"]
    z, _ = model.apply({"params": params}, tokens)
    assert z.shape == (2, 32)


def test_bert_matches_huggingface():
    """LiT-init parity: a HF BertModel's weights converted into our tower
    produce the same encodings + pooler output (the capability the reference
    gets from TF checkpoints via flaxformer, clipa_jax/models/bert.py)."""
    torch = pytest.importorskip("torch")
    trf = pytest.importorskip("transformers")
    from clipa_tpu.models import bert

    cfg = trf.BertConfig(
        vocab_size=100, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=16, hidden_act="gelu",
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    hf = trf.BertModel(cfg).eval()

    model = bert.Model(width=32, depth=2, mlp_dim=64, num_heads=4,
                       vocab_size=100, max_len=16)
    tokens_np = np.random.RandomState(0).randint(0, 100, (2, 10))
    params = model.init({"params": jax.random.PRNGKey(0)},
                        jnp.asarray(tokens_np, jnp.int32))["params"]
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    converted = bert.convert_hf_state_dict(sd, depth=2, num_heads=4)
    params = jax.tree.map(lambda old, new: np.asarray(new, old.dtype),
                          params, converted)

    pooled, out = model.apply({"params": params},
                              jnp.asarray(tokens_np, jnp.int32))
    with torch.no_grad():
        ref = hf(torch.tensor(tokens_np))
    np.testing.assert_allclose(np.asarray(out["encoded"]),
                               ref.last_hidden_state.numpy(),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(pooled),
                               ref.pooler_output.numpy(),
                               atol=2e-5, rtol=1e-4)


def test_bert_hf_converter_strict():
    from clipa_tpu.models import bert
    trf = pytest.importorskip("transformers")
    cfg = trf.BertConfig(vocab_size=50, hidden_size=16, num_hidden_layers=1,
                         num_attention_heads=2, intermediate_size=32,
                         max_position_embeddings=8)
    sd = {k: v.detach().numpy()
          for k, v in trf.BertModel(cfg).state_dict().items()}
    sd["mystery.weight"] = np.zeros(3, np.float32)
    with pytest.raises(ValueError, match="Unconsumed"):
        bert.convert_hf_state_dict(sd, depth=1, num_heads=2)


def test_hf_text_matches_roberta():
    """RoBERTa-family tower parity: a HF RobertaModel's weights converted
    into our hf_text tower produce the same hidden states and masked mean
    pool (the reference's HFTextEncoder path,
    clipa_torch/open_clip/hf_model.py:84-150)."""
    torch = pytest.importorskip("torch")
    trf = pytest.importorskip("transformers")
    from clipa_tpu.models import hf_text

    cfg = trf.RobertaConfig(
        vocab_size=100, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=18, hidden_act="gelu", pad_token_id=1,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    hf = trf.RobertaModel(cfg, add_pooling_layer=False).eval()

    model = hf_text._Model(None, width=32, depth=2, mlp_dim=64, num_heads=4,
                           vocab_size=100, max_len=18, pad_id=1)
    rng = np.random.RandomState(0)
    tokens_np = rng.randint(2, 100, (2, 10))
    tokens_np[0, 6:] = 1  # pads: the attention mask + mean pool do work
    tokens = jnp.asarray(tokens_np, jnp.int32)
    params = model.init({"params": jax.random.PRNGKey(0)},
                        tokens)["params"]
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    converted = hf_text.convert_hf_roberta(sd, depth=2, num_heads=4)
    params = jax.tree.map(lambda old, new: np.asarray(new, old.dtype),
                          params, converted)

    pooled, out = model.apply({"params": params}, tokens)
    with torch.no_grad():
        mask_t = torch.tensor((tokens_np != 1).astype(np.int64))
        ref = hf(torch.tensor(tokens_np), attention_mask=mask_t)
        ref_h = ref.last_hidden_state
        ref_pool = ((ref_h * mask_t[..., None]).sum(1)
                    / mask_t.sum(-1, keepdim=True))
    # pad-position hidden states differ (HF computes them unmasked; they
    # are excluded from the pool), so compare non-pad positions only.
    ours = np.asarray(out["encoded"])
    theirs = ref_h.numpy()
    keep = tokens_np != 1
    np.testing.assert_allclose(ours[keep], theirs[keep],
                               atol=1e-4, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(pooled), ref_pool.numpy(),
                               atol=1e-4, rtol=2e-3)


def test_hf_text_compat_configs():
    """roberta/xlm-roberta zoo configs translate to the hf_text tower with
    mean pooling + mlp proj; mt5 raises (declared non-goal)."""
    from clipa_tpu.compat import openclip
    tt = openclip._to_two_towers_cfg(
        openclip.get_model_config("roberta-ViT-B-32"))
    assert tt["text_model"] == "hf_text"
    assert tt["text"]["variant"] == "roberta-base"
    assert tt["text"]["proj"] == "mlp"
    big = openclip._to_two_towers_cfg(
        openclip.get_model_config("xlm-roberta-large-ViT-H-14"))
    assert big["text"]["variant"] == "xlm-roberta-large"
    # mt5 is native now (models/t5_text.py); unknown trunks still raise
    assert openclip._text_tower_cfg(
        {"hf_model_name": "google/mt5-base"}, False)["variant"] == "mt5-base"
    with pytest.raises(NotImplementedError, match="no native tower"):
        openclip._text_tower_cfg({"hf_model_name": "gpt2"}, False)

    # tiny two-tower build through the registry end to end
    from clipa_tpu.models import two_towers
    model = two_towers.Model(
        image={"variant": "Ti/16"}, text_model="hf_text",
        text={"variant": None, "width": 32, "depth": 1, "num_heads": 2,
              "mlp_dim": 64, "vocab_size": 64, "max_len": 16, "pad_id": 1},
        out_dim=(16, 16))
    txt = np.full((2, 8), 1, np.int32)
    txt[:, :4] = 5
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 32, 32, 3)), jnp.asarray(txt))
    zimg, ztxt, _ = model.apply(variables, jnp.ones((2, 32, 32, 3)),
                                jnp.asarray(txt))
    assert zimg.shape == (2, 16) and ztxt.shape == (2, 16)


def test_t5_text_matches_mt5():
    """mT5-encoder tower parity: a HF MT5EncoderModel's weights converted
    into our t5_text tower produce the same hidden states and masked mean
    pool (reference hf path: hf_model.py:108-112 takes model.encoder)."""
    torch = pytest.importorskip("torch")
    trf = pytest.importorskip("transformers")
    from clipa_tpu.models import t5_text

    cfg = trf.MT5Config(
        vocab_size=100, d_model=32, d_kv=16, d_ff=64, num_layers=2,
        num_heads=2, relative_attention_num_buckets=8,
        relative_attention_max_distance=20, dropout_rate=0.0,
        feed_forward_proj="gated-gelu", pad_token_id=0)
    hf = trf.MT5EncoderModel(cfg).eval()

    model = t5_text._Model(None, width=32, depth=2, num_heads=2,
                           head_dim=16, mlp_dim=64, vocab_size=100,
                           rel_buckets=8, rel_max_distance=20)
    rng = np.random.RandomState(0)
    tokens_np = rng.randint(2, 100, (2, 10))
    tokens_np[0, 6:] = 0  # pads exercise the mask + mean pool
    tokens = jnp.asarray(tokens_np, jnp.int32)
    params = model.init({"params": jax.random.PRNGKey(0)}, tokens)["params"]
    sd = {k: v.detach().numpy() for k, v in hf.state_dict().items()}
    converted = t5_text.convert_hf_mt5(sd, depth=2)
    params = jax.tree.map(lambda old, new: np.asarray(new, old.dtype),
                          params, converted)

    pooled, out = model.apply({"params": params}, tokens)
    with torch.no_grad():
        mask_t = torch.tensor((tokens_np != 0).astype(np.int64))
        ref_h = hf(torch.tensor(tokens_np),
                   attention_mask=mask_t).last_hidden_state
        ref_pool = ((ref_h * mask_t[..., None]).sum(1)
                    / mask_t.sum(-1, keepdim=True))
    ours = np.asarray(out["encoded"])
    keep = tokens_np != 0
    np.testing.assert_allclose(ours[keep], ref_h.numpy()[keep],
                               atol=1e-4, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(pooled), ref_pool.numpy(),
                               atol=1e-4, rtol=2e-3)


def test_t5_converter_strict_and_zoo():
    trf = pytest.importorskip("transformers")
    from clipa_tpu.compat import openclip
    from clipa_tpu.models import t5_text
    cfg = trf.MT5Config(vocab_size=50, d_model=16, d_kv=8, d_ff=32,
                        num_layers=1, num_heads=2,
                        relative_attention_num_buckets=8,
                        feed_forward_proj="gated-gelu")
    sd = {k: v.detach().numpy()
          for k, v in trf.MT5EncoderModel(cfg).state_dict().items()}
    sd["mystery.weight"] = np.zeros(3, np.float32)
    with pytest.raises(ValueError, match="unconsumed"):
        t5_text.convert_hf_mt5(sd, depth=1)

    tt = openclip._to_two_towers_cfg(
        openclip.get_model_config("mt5-base-ViT-B-32"))
    assert tt["text_model"] == "t5_text"
    assert tt["text"]["variant"] == "mt5-base"
    xl = openclip._to_two_towers_cfg(
        openclip.get_model_config("mt5-xl-ViT-H-14"))
    assert xl["text"]["variant"] == "mt5-xl"


def test_ref3d_stream_matches_flat(tiny_params):
    """The bench baseline's `stream="ref3d"` layout (the reference's
    (B, L, D) residual stream, clipa_jax/models/vit.py:164-183) must be a
    pure layout change: same params, same outputs as the default flat
    (B*L, D) stream."""
    model, params = tiny_params
    model3d = two_towers.Model(
        image={"variant": "Ti/16", "pool_type": "tok",
               "posemb": "sincos2d", "stream": "ref3d"},
        text={"variant": "Ti", "pool_type": "last", "vocab_size": 128,
              "stream": "ref3d"},
        out_dim=(64, 64), temperature_init=1 / 0.07)
    images = jnp.linspace(0, 1, 2 * 32 * 32 * 3).reshape(2, 32, 32, 3)
    texts = jnp.arange(16, dtype=jnp.int32).reshape(2, 8) % 128
    zi, zt, _ = model.apply({"params": params}, images, texts)
    zi3, zt3, _ = model3d.apply({"params": params}, images, texts)
    np.testing.assert_allclose(np.asarray(zi3), np.asarray(zi),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(zt3), np.asarray(zt),
                               rtol=1e-5, atol=1e-5)
