"""CoCa: model, loss, trainer integration, factory, generation.

Reference semantics: clipa_torch/open_clip/coca_model.py (model/generate),
open_clip/loss.py:160-199 (CoCaLoss), open_clip/transformer.py:559-772
(embed_cls text tower + MultimodalTransformer).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clipa_tpu import losses
from clipa_tpu.compat import openclip
from clipa_tpu.models import coca as coca_lib

# Consistent with the reference's dimensional constraints: with
# attentional_pool the image tokens come out at embed_dim, so the decoder
# (multimodal width) and the text tokens (text width) must equal embed_dim
# (coca_ViT-B-32: 512/512/512 with vision width 768).
TINY_CFG = {
    "embed_dim": 32,
    "vision_cfg": {"image_size": 32, "layers": 2, "width": 64,
                   "head_width": 32, "patch_size": 16,
                   "attentional_pool": True, "attn_pooler_heads": 2,
                   "n_queries": 8, "output_tokens": True},
    "text_cfg": {"context_length": 12, "vocab_size": 96, "width": 32,
                 "heads": 2, "layers": 2, "embed_cls": True,
                 "output_tokens": True},
    "multimodal_cfg": {"context_length": 12, "vocab_size": 96, "width": 32,
                       "heads": 2, "layers": 2, "attn_pooler_heads": 2},
    "custom_text": True,
}


def _tiny_model():
    model = coca_lib.Model(**openclip._to_coca_cfg(TINY_CFG))
    params = model.init({"params": jax.random.PRNGKey(0)},
                        jnp.zeros((1, 32, 32, 3)),
                        jnp.zeros((1, 12), jnp.int32))["params"]
    return model, params


@pytest.fixture(scope="module")
def tiny_coca():
    return _tiny_model()


def _batch(b=4, rng=None):
    rng = rng or np.random.RandomState(0)
    img = rng.rand(b, 32, 32, 3).astype(np.float32)
    txt = np.concatenate(
        [np.full((b, 1), 90), rng.randint(4, 80, (b, 9)),
         np.full((b, 1), 91), np.zeros((b, 1))], axis=1).astype(np.int32)
    return img, txt


def test_coca_forward_shapes(tiny_coca):
    model, params = tiny_coca
    img, txt = _batch()
    zimg, ztxt, out = model.apply({"params": params}, jnp.asarray(img),
                                  jnp.asarray(txt))
    assert zimg.shape == (4, 32) and ztxt.shape == (4, 32)
    # logits cover the truncated text (L-1 positions); labels are the
    # original text shifted by one (coca_model.py:150-158).
    assert out["logits"].shape == (4, 11, 96)
    np.testing.assert_array_equal(np.asarray(out["labels"]), txt[:, 1:])
    np.testing.assert_allclose(np.linalg.norm(np.asarray(zimg), axis=-1),
                               1.0, rtol=1e-5)
    # single-modality calls (evaluators embed one side at a time)
    zi, _, _ = model.apply({"params": params}, jnp.asarray(img), None)
    _, zt, _ = model.apply({"params": params}, None, jnp.asarray(txt))
    np.testing.assert_allclose(np.asarray(zi), np.asarray(zimg), atol=1e-6)
    np.testing.assert_allclose(np.asarray(zt), np.asarray(ztxt), atol=1e-6)


def test_coca_loss_matches_naive(tiny_coca):
    """coca_loss == clip_w * InfoNCE + cap_w * mean CE over non-pad, the
    torch CrossEntropyLoss(ignore_index=pad) semantics."""
    model, params = tiny_coca
    img, txt = _batch()
    zimg, ztxt, out = model.apply({"params": params}, jnp.asarray(img),
                                  jnp.asarray(txt))
    loss, extras = losses.coca_loss(
        zimg, ztxt, out["t"], out["logits"], out["labels"],
        clip_loss_weight=0.5, caption_loss_weight=2.0)

    clip_l, _ = losses.bidirectional_contrastive_loss(zimg, ztxt, out["t"],
                                                      reduction=True)
    logits = np.asarray(out["logits"], np.float64)
    labels = np.asarray(out["labels"])
    logp = logits - np.log(np.sum(np.exp(
        logits - logits.max(-1, keepdims=True)), -1, keepdims=True)) \
        - logits.max(-1, keepdims=True)
    nlls = [-logp[i, j, labels[i, j]]
            for i in range(labels.shape[0])
            for j in range(labels.shape[1]) if labels[i, j] != 0]
    expected = 0.5 * float(clip_l) + 2.0 * float(np.mean(nlls))
    assert labels.min() == 0  # pads present: the mask does real work
    np.testing.assert_allclose(float(loss), expected, rtol=1e-5)


def _t_block(torch, x, sd, b, heads, attn_bias=None, kv=None):
    """Reference ResidualAttentionBlock math (transformer.py:195-251),
    float64; kv != None = cross-attention (ln_1_kv applied to kv)."""
    import torch.nn.functional as F
    w = x.shape[-1]
    hd = w // heads
    y = F.layer_norm(x, (w,), sd[f"{b}.ln_1.weight"], sd[f"{b}.ln_1.bias"],
                     eps=1e-5)
    if kv is not None:
        ctx = F.layer_norm(kv, (w,), sd[f"{b}.ln_1_kv.weight"],
                           sd[f"{b}.ln_1_kv.bias"], eps=1e-5)
    else:
        ctx = y
    wqkv, bqkv = sd[f"{b}.attn.in_proj_weight"], sd[f"{b}.attn.in_proj_bias"]
    q = y @ wqkv[:w].T + bqkv[:w]
    k = ctx @ wqkv[w:2 * w].T + bqkv[w:2 * w]
    v = ctx @ wqkv[2 * w:].T + bqkv[2 * w:]
    bsz, lq, _ = q.shape
    q = q.view(bsz, lq, heads, hd).transpose(1, 2)
    k = k.view(bsz, -1, heads, hd).transpose(1, 2)
    v = v.view(bsz, -1, heads, hd).transpose(1, 2)
    logits = q @ k.transpose(-1, -2) / hd ** 0.5
    if attn_bias is not None:
        logits = logits + attn_bias
    a = (logits.softmax(-1) @ v).transpose(1, 2).reshape(bsz, lq, w)
    y = a @ sd[f"{b}.attn.out_proj.weight"].T + sd[f"{b}.attn.out_proj.bias"]
    x = x + y
    y = F.layer_norm(x, (w,), sd[f"{b}.ln_2.weight"], sd[f"{b}.ln_2.bias"],
                     eps=1e-5)
    y = y @ sd[f"{b}.mlp.c_fc.weight"].T + sd[f"{b}.mlp.c_fc.bias"]
    y = torch.nn.functional.gelu(y, approximate="none")
    y = y @ sd[f"{b}.mlp.c_proj.weight"].T + sd[f"{b}.mlp.c_proj.bias"]
    return x + y


def test_coca_semantics_match_torch_reference():
    """Full CoCa forward (vision + attn pool, embed_cls text incl. the
    reference's cls pad-mask quirk, caption decoder) must match a float64
    torch forward written from the reference spec, from exported weights.
    This is the CoCa leg of the checkpoint-parity oracle."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.RandomState(0)
    img = rng.rand(2, 32, 32, 3).astype(np.float32)
    txt = np.zeros((2, 12), np.int64)
    txt[0, :5] = [90, 7, 8, 9, 91]
    txt[1, :7] = [90, 30, 31, 32, 33, 34, 91]

    jax.config.update("jax_enable_x64", True)
    try:
        model = coca_lib.Model(dtype=jnp.float64,
                               **openclip._to_coca_cfg(TINY_CFG))
        params = model.init({"params": jax.random.PRNGKey(2)},
                            jnp.asarray(img, jnp.float64),
                            jnp.asarray(txt))["params"]
        zimg, ztxt, out = model.apply({"params": params},
                                      jnp.asarray(img, jnp.float64),
                                      jnp.asarray(txt))
        zimg, ztxt = np.asarray(zimg), np.asarray(ztxt)
        logits_j = np.asarray(out["logits"])
        sd = {k: torch.tensor(np.asarray(v), dtype=torch.float64)
              for k, v in openclip.export_torch_state_dict(params).items()}
    finally:
        jax.config.update("jax_enable_x64", False)

    heads = 2

    # ---- vision: patchify + cls + posemb + ln_pre + blocks ----
    x = torch.tensor(img.transpose(0, 3, 1, 2), dtype=torch.float64)
    x = F.conv2d(x, sd["visual.conv1.weight"], stride=16)
    x = x.reshape(2, 64, -1).permute(0, 2, 1)  # (B, 4, width)
    cls = sd["visual.class_embedding"].reshape(1, 1, -1).expand(2, 1, 64)
    x = torch.cat([cls, x], dim=1) + sd["visual.positional_embedding"]
    x = F.layer_norm(x, (64,), sd["visual.ln_pre.weight"],
                     sd["visual.ln_pre.bias"], eps=1e-5)
    for i in range(2):
        x = _t_block(torch, x, sd, f"visual.transformer.resblocks.{i}",
                     heads)
    # attentional pool (transformer.py:169-192) then ln_post, split, proj
    q = F.layer_norm(sd["visual.attn_pool.query"], (32,),
                     sd["visual.attn_pool.ln_q.weight"],
                     sd["visual.attn_pool.ln_q.bias"], eps=1e-5)
    kx = F.layer_norm(x, (64,), sd["visual.attn_pool.ln_k.weight"],
                      sd["visual.attn_pool.ln_k.bias"], eps=1e-5)
    pooled, _ = F.multi_head_attention_forward(
        query=q[:, None, :].expand(8, 2, 32),
        key=kx.permute(1, 0, 2), value=kx.permute(1, 0, 2),
        embed_dim_to_check=32, num_heads=2,
        q_proj_weight=sd["visual.attn_pool.attn.q_proj_weight"],
        k_proj_weight=sd["visual.attn_pool.attn.k_proj_weight"],
        v_proj_weight=sd["visual.attn_pool.attn.v_proj_weight"],
        in_proj_weight=None,
        in_proj_bias=sd["visual.attn_pool.attn.in_proj_bias"],
        bias_k=None, bias_v=None, add_zero_attn=False, dropout_p=0.0,
        out_proj_weight=sd["visual.attn_pool.attn.out_proj.weight"],
        out_proj_bias=sd["visual.attn_pool.attn.out_proj.bias"],
        use_separate_proj_weight=True, need_weights=False)
    xp = pooled.permute(1, 0, 2)  # (B, 8, 32)
    xp = F.layer_norm(xp, (32,), sd["visual.ln_post.weight"],
                      sd["visual.ln_post.bias"], eps=1e-5)
    img_pooled, img_tokens = xp[:, 0], xp[:, 1:]
    zimg_t = img_pooled @ sd["visual.proj"]
    zimg_t = zimg_t / zimg_t.norm(dim=-1, keepdim=True)
    np.testing.assert_allclose(zimg, zimg_t.numpy(), atol=1e-6)

    # ---- text: truncate, embed, append cls, causal+cls mask, blocks ----
    t_in = torch.tensor(txt[:, :-1])  # embed_cls truncation (B, 11)
    xt = sd["text.token_embedding.weight"][t_in]  # (B, 11, 32)
    cls_emb = sd["text.cls_emb"].reshape(1, 1, -1).expand(2, 1, 32)
    xt = torch.cat([xt, cls_emb], dim=1)  # (B, 12, 64)
    l = 12
    xt = xt + sd["text.positional_embedding"][:l]
    causal = torch.full((l, l), float("-inf"), dtype=torch.float64).triu_(1)
    # build_cls_mask (transformer.py:626-633): the cls row sees
    # [1, text != pad] (keys shifted by one — the reference quirk).
    cls_mask = torch.zeros((2, l, l), dtype=torch.float64)
    vis = torch.cat([torch.ones(2, 1, dtype=torch.bool), t_in != 0], dim=1)
    cls_mask[:, -1, :] = torch.where(vis, 0.0, float("-inf"))
    attn_bias = (causal[None] + cls_mask)[:, None]  # (B, 1, L, L)
    for i in range(2):
        xt = _t_block(torch, xt, sd, f"text.transformer.resblocks.{i}",
                      heads, attn_bias=attn_bias)
    txt_pooled, txt_tokens = xt[:, -1], xt[:, :-1]
    txt_pooled = F.layer_norm(txt_pooled, (32,), sd["text.ln_final.weight"],
                              sd["text.ln_final.bias"], eps=1e-5)
    ztxt_t = txt_pooled @ sd["text.text_projection"]
    ztxt_t = ztxt_t / ztxt_t.norm(dim=-1, keepdim=True)
    np.testing.assert_allclose(ztxt, ztxt_t.numpy(), atol=1e-6)

    # ---- decoder: (causal self block, cross block) x depth, ln, proj ----
    xd = txt_tokens
    lq = xd.shape[1]
    causal_d = torch.full((lq, lq), float("-inf"),
                          dtype=torch.float64).triu_(1)
    for i in range(2):
        xd = _t_block(torch, xd, sd, f"text_decoder.resblocks.{i}", heads,
                      attn_bias=causal_d)
        xd = _t_block(torch, xd, sd, f"text_decoder.cross_attn.{i}", heads,
                      kv=img_tokens)
    xd = F.layer_norm(xd, (32,), sd["text_decoder.ln_final.weight"],
                      sd["text_decoder.ln_final.bias"], eps=1e-5)
    logits_t = xd @ sd["text_decoder.text_projection"]
    np.testing.assert_allclose(logits_j, logits_t.numpy(), atol=1e-5)


def test_coca_torch_roundtrip(tiny_coca):
    """params -> torch state dict -> back, bit-exact (converter inverse)."""
    from clipa_tpu import utils as u
    _, params = tiny_coca
    sd = openclip.export_torch_state_dict(params)
    back = openclip.convert_torch_variables(sd, heads={"img": 2, "txt": 2,
                                                       "decoder": 2})
    flat_a = dict(u.tree_flatten_with_names(params)[0])
    flat_b = dict(u.tree_flatten_with_names(back["params"])[0])
    assert set(flat_a) == set(flat_b), (
        sorted(set(flat_a) ^ set(flat_b))[:10])
    for k in flat_a:
        np.testing.assert_array_equal(np.asarray(flat_a[k]),
                                      np.asarray(flat_b[k]), err_msg=k)


def test_coca_trainer_learns(tmp_path):
    """30 fixed-batch steps with model_name=coca, loss=coca must reduce
    both loss components (the sharded update optimizes decoder + towers)."""
    from clipa_tpu import optim
    from clipa_tpu.config import ConfigDict
    from clipa_tpu.parallel import create_mesh, local_batch_to_global
    from clipa_tpu.train import step as step_lib

    model = coca_lib.Model(**openclip._to_coca_cfg(TINY_CFG))
    config = ConfigDict(
        lr=3e-3, wd=1e-4, optax_name="scale_by_adam",
        schedule=[(".*", dict(decay_type="const", warmup_steps=2))],
        init_shapes=[(1, 32, 32, 3), (1, 12)],
        model_name="coca", loss="coca", cpu_unit8=True,
    )
    mesh = create_mesh(devices=jax.devices()[:2])
    tx, _ = optim.make(config, jax.eval_shape(
        lambda r: model.init({"params": r}, jnp.zeros((1, 32, 32, 3)),
                             jnp.zeros((1, 12), jnp.int32))["params"],
        jax.random.PRNGKey(0)), sched_kw=dict(total_steps=30))
    state = step_lib.init_train_state(model, tx, config, mesh,
                                      jax.random.PRNGKey(0))
    update = step_lib.make_update_fn(model, tx, config, mesh)

    rng = np.random.RandomState(3)
    img, txt = _batch(8, rng)
    batch = local_batch_to_global(
        {"image": (img * 255).astype(np.uint8), "labels": txt}, mesh)
    hist = []
    for _ in range(30):
        state, meas = update(state, batch)
        hist.append({k: float(meas[k]) for k in
                     ("training_loss", "contrastive_loss", "caption_loss")})
    assert all(np.isfinite(h["training_loss"]) for h in hist)
    assert hist[-1]["training_loss"] < hist[0]["training_loss"] - 1.0, hist
    assert hist[-1]["caption_loss"] < hist[0]["caption_loss"], hist


def test_coca_factory_and_generate(monkeypatch):
    orig = openclip.get_model_config
    monkeypatch.setattr(
        openclip, "get_model_config",
        lambda n: TINY_CFG if n == "coca_tiny_test" else orig(n))
    m = openclip.create_model("coca_tiny_test")
    assert isinstance(m, openclip.CoCaModel)
    img, txt = _batch(2)
    assert m.encode_image(img).shape == (2, 32)
    assert m.encode_text(txt).shape == (2, 32)

    out = m.generate(img, seq_len=8, generation_type="top_k", top_k=3,
                     sot_token_id=90, eos_token_id=91, min_seq_len=2)
    assert out.shape[0] == 2 and out.shape[1] <= 8
    assert (out[:, 0] == 90).all()

    out = m.generate(img, seq_len=8, generation_type="beam_search",
                     num_beams=4, num_beam_groups=2, sot_token_id=90,
                     eos_token_id=91, min_seq_len=2)
    assert out.shape[0] == 2
    assert (out[:, 0] == 90).all()
    # beams end with eos (or are eos-terminated by finalize)
    assert ((out == 91).sum(axis=1) >= 1).all()

    # fixed_output_length pads to seq_len
    out = m.generate(img, seq_len=10, generation_type="top_p", top_p=0.9,
                     sot_token_id=90, eos_token_id=91, min_seq_len=2,
                     fixed_output_length=True)
    assert out.shape == (2, 10)


def test_coca_configs_build():
    """The 3 reference coca configs translate (mapping only — no init at
    full width on the CPU host)."""
    for name in ("coca_base", "coca_ViT-B-32", "coca_ViT-L-14"):
        cfg = openclip.get_model_config(name)
        kw = openclip._to_coca_cfg(cfg)
        assert kw["multimodal_cfg"]["vocab_size"] == \
            cfg["text_cfg"]["vocab_size"]
        assert kw["text"]["embed_cls"] is True
        model = coca_lib.Model(**kw)
        # shape-only init proves the module tree is constructible
        shapes = jax.eval_shape(
            lambda r, m=model, c=cfg: m.init(
                {"params": r},
                jnp.zeros((1, c["vision_cfg"]["image_size"],
                           c["vision_cfg"]["image_size"], 3)),
                jnp.zeros((1, c["text_cfg"]["context_length"]),
                          jnp.int32))["params"],
            jax.random.PRNGKey(0))
        assert "decoder" in shapes and "img" in shapes and "txt" in shapes


def test_coca_roberta_config_builds():
    """coca_roberta-ViT-B-32: HF text trunk under the caption decoder
    (reference coca_model.py:95-106 via hf_model.py)."""
    cfg = openclip.get_model_config("coca_roberta-ViT-B-32")
    kw = openclip._to_coca_cfg(cfg)
    assert kw["text_model"] == "hf_text"
    assert kw["text"] == {"variant": "roberta-base", "proj": "linear"}
    # decoder vocab falls back to the CLIPTextCfg default, not roberta's
    # 50265 (reference passes text_cfg.vocab_size = 49408 default).
    assert kw["multimodal_cfg"]["vocab_size"] == 49408
    model = coca_lib.Model(**kw)
    shapes = jax.eval_shape(
        lambda r: model.init(
            {"params": r}, jnp.zeros((1, 224, 224, 3)),
            jnp.zeros((1, 77), jnp.int32))["params"],
        jax.random.PRNGKey(0))
    assert "word_embeddings" in shapes["txt"]  # roberta trunk, not CLIP
    assert shapes["decoder"]["head"]["kernel"].shape[-1] == 49408


def test_coca_hf_text_forward_and_grads():
    """A tiny hf_text-trunk CoCa: forward shapes, labels = text[:, 1:]
    (tokens span the truncated sequence), and the caption loss
    backpropagates into the roberta trunk."""
    model = coca_lib.Model(
        image=dict(variant=None, width=32, depth=2, num_heads=2, mlp_dim=64,
                   patch_size=(16, 16), posemb="learn"),
        text=dict(width=32, depth=2, num_heads=2, mlp_dim=64, vocab_size=96,
                  max_len=40, pad_id=1, proj="linear"),
        text_model="hf_text",
        multimodal_cfg=dict(vocab_size=96, width=32, depth=2, num_heads=2,
                            mlp_dim=64),
        out_dim=32)
    img, txt = _batch()
    txt = txt % 96
    params = model.init({"params": jax.random.PRNGKey(0)},
                        jnp.zeros((1, 32, 32, 3)),
                        jnp.zeros((1, 12), jnp.int32))["params"]
    zimg, ztxt, out = model.apply({"params": params}, img, txt)
    assert zimg.shape == (4, 32) and ztxt.shape == (4, 32)
    assert out["logits"].shape == (4, 11, 96)  # ctx-1 positions
    np.testing.assert_array_equal(np.asarray(out["labels"]), txt[:, 1:])

    def loss_fn(p):
        zi, zt, o = model.apply({"params": p}, img, txt)
        l, _ = losses.coca_loss(zi, zt, o["t"], o["logits"], o["labels"],
                                pad_id=1)
        return l
    g = jax.grad(loss_fn)(params)
    trunk_g = g["txt"]["word_embeddings"]["embedding"]
    assert float(jnp.sum(jnp.abs(trunk_g))) > 0.0
