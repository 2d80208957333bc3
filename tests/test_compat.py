"""open_clip-compatible facade: registry, converter roundtrip, tokenizer."""

import io
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clipa_tpu import utils as u
from clipa_tpu.compat import openclip


def test_list_models():
    models = openclip.list_models()
    assert "ViT-H-14-CL32-GAP-BigVision" in models
    assert "ViT-L-16-CL32-GAP" in models
    assert len(models) >= 10


# Every reference model-config name now has a native tower here
# (swin/relpos-ViT landed in models/swin.py, models/vit_relpos.py).
_ZOO_NON_GOAL_PREFIXES = ()


@pytest.mark.skipif(not os.path.isdir(
    "/root/reference/clipa_torch/open_clip/model_configs"),
    reason="reference checkout not available")
def test_model_zoo_covers_reference():
    """Every reference model-config name resolves here except the declared
    non-goal families (reference clipa_torch/open_clip/model_configs/)."""
    ref_dir = "/root/reference/clipa_torch/open_clip/model_configs"
    ref = {os.path.splitext(f)[0] for f in os.listdir(ref_dir)
           if f.endswith(".json")}
    ours = set(openclip.list_models())
    missing = {n for n in ref - ours
               if not n.startswith(_ZOO_NON_GOAL_PREFIXES)}
    assert not missing, f"reference model configs absent: {sorted(missing)}"


def test_model_config_fields():
    cfg = openclip.get_model_config("ViT-H-14-CL32-GAP-BigVision")
    assert cfg["embed_dim"] == 1024
    assert cfg["vision_cfg"]["head_width"] == 80
    assert cfg["text_cfg"]["bert_tokenizer"] is True
    assert cfg["text_cfg"]["attention_mask"] is False


def test_to_two_towers_cfg():
    cfg = openclip.get_model_config("ViT-H-14-CL32-GAP-BigVision")
    tt = openclip._to_two_towers_cfg(cfg)
    assert tt["image"]["num_heads"] == 16  # 1280 / 80
    assert tt["image"]["pool_type"] == "gap"
    assert tt["text"]["pool_type"] == "last"
    assert tt["out_dim"] == (1024, 1024)
    big = openclip._to_two_towers_cfg(
        openclip.get_model_config("ViT-bigG-14-CL32-GAP-BigVision"))
    assert big["image"]["mlp_dim"] == 8192


@pytest.fixture(scope="module")
def tiny_params():
    from clipa_tpu.models import two_towers
    model = two_towers.Model(
        image={"variant": "Ti/16", "pool_type": "gap", "posemb": "learn"},
        text={"variant": "Ti", "pool_type": "last", "vocab_size": 64},
        out_dim=(32, 32), temperature_init=1 / 0.07)
    params = model.init({"params": jax.random.PRNGKey(0)},
                        jnp.zeros((1, 32, 32, 3)),
                        jnp.zeros((1, 8), jnp.int32))["params"]
    return model, params


def test_torch_state_dict_roundtrip(tiny_params):
    """export -> convert must reproduce the tree exactly."""
    _, params = tiny_params
    sd = openclip.export_torch_state_dict(params)
    assert "visual.conv1.weight" in sd
    assert sd["visual.transformer.resblocks.0.attn.in_proj_weight"].shape \
        == (3 * 192, 192)
    back = openclip.convert_torch_state_dict(sd)
    flat_a = dict(u.tree_flatten_with_names(params)[0])
    flat_b = dict(u.tree_flatten_with_names(back)[0])
    assert set(flat_a) == set(flat_b)
    for k in flat_a:
        np.testing.assert_allclose(np.asarray(flat_a[k]), flat_b[k],
                                   rtol=1e-6, err_msg=k)


def test_converted_weights_forward_equal(tiny_params):
    """Loading the converted tree must preserve model outputs exactly."""
    model, params = tiny_params
    sd = openclip.export_torch_state_dict(params)
    back = openclip.convert_torch_state_dict(sd)
    img = jnp.asarray(np.random.RandomState(0).rand(2, 32, 32, 3),
                      jnp.float32)
    txt = jnp.asarray(np.random.RandomState(1).randint(0, 64, (2, 8)))
    a = model.apply({"params": params}, img, txt)
    b = model.apply({"params": jax.tree_util.tree_map(jnp.asarray, back)},
                    img, txt)
    np.testing.assert_allclose(a[0], b[0], atol=1e-6)
    np.testing.assert_allclose(a[1], b[1], atol=1e-6)


def test_non_bigvision_cfg_translation():
    """open_clip-default JSONs must map to the faithful variant knobs
    (reference defaults: clipa_torch/open_clip/model.py:25-75)."""
    cfg = openclip.get_model_config("ViT-B-16-CL16")
    tt = openclip._to_two_towers_cfg(cfg)
    assert tt["image"]["ln_pre"] is True
    assert tt["image"]["gelu_approx"] is False
    assert tt["image"]["pool_type"] == "tok"
    assert tt["text"]["causal_mask"] is True
    assert tt["text"]["pool_type"] == "eot"
    gap = openclip._to_two_towers_cfg(
        openclip.get_model_config("ViT-L-16-CL32-GAP"))
    assert gap["image"]["pool_type"] == "gap_all"
    bv = openclip._to_two_towers_cfg(
        openclip.get_model_config("ViT-H-14-CL32-GAP-BigVision"))
    assert bv["image"]["ln_pre"] is False
    assert bv["image"]["gelu_approx"] is True
    assert bv["text"]["causal_mask"] is False


def test_converter_errors_on_unconsumed_keys(tiny_params):
    _, params = tiny_params
    sd = openclip.export_torch_state_dict(params)
    sd["visual.mystery.weight"] = np.zeros((3, 3), np.float32)
    with pytest.raises(ValueError, match="unconsumed"):
        openclip.convert_torch_state_dict(sd)
    # non-strict mode tolerates it
    openclip.convert_torch_state_dict(sd, strict=False)


def _torch_block(torch, x, sd, b, heads, attn_bias=None, gelu="erf"):
    """Reference transformer block math (pre-LN), written from the
    open_clip spec (clipa_torch/open_clip/transformer.py ResidualAttentionBlock).
    gelu: "erf" (open_clip default) or "tanh" (the BigVision-compat configs'
    gelu_approximate, model_configs/*-BigVision.json)."""
    import torch.nn.functional as F
    w = x.shape[-1]
    hd = w // heads
    y = F.layer_norm(x, (w,), sd[f"{b}.ln_1.weight"], sd[f"{b}.ln_1.bias"])
    qkv = y @ sd[f"{b}.attn.in_proj_weight"].T + sd[f"{b}.attn.in_proj_bias"]
    q, k, v = qkv.split(w, dim=-1)
    bsz, length, _ = q.shape
    q = q.view(bsz, length, heads, hd).transpose(1, 2)
    k = k.view(bsz, length, heads, hd).transpose(1, 2)
    v = v.view(bsz, length, heads, hd).transpose(1, 2)
    logits = q @ k.transpose(-1, -2) / hd ** 0.5
    if attn_bias is not None:
        logits = logits + attn_bias
    a = (logits.softmax(-1) @ v).transpose(1, 2).reshape(bsz, length, w)
    y = a @ sd[f"{b}.attn.out_proj.weight"].T + sd[f"{b}.attn.out_proj.bias"]
    x = x + y
    y = F.layer_norm(x, (w,), sd[f"{b}.ln_2.weight"], sd[f"{b}.ln_2.bias"])
    y = y @ sd[f"{b}.mlp.c_fc.weight"].T + sd[f"{b}.mlp.c_fc.bias"]
    y = torch.nn.functional.gelu(
        y, approximate="tanh" if gelu == "tanh" else "none")
    y = y @ sd[f"{b}.mlp.c_proj.weight"].T + sd[f"{b}.mlp.c_proj.bias"]
    return x + y


def test_openclip_semantics_match_torch_reference():
    """CLIPA-v1-style (open_clip default) models — ln_pre, causal text mask,
    eot pooling, erf gelu — must produce the same embeddings as a torch
    forward implementing the open_clip spec, from the same exported weights.
    This is the numeric leg of the 0.2% checkpoint-parity claim."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    cfg = {
        "embed_dim": 32,
        "vision_cfg": {"image_size": 16, "layers": 2, "width": 64,
                       "head_width": 32, "patch_size": 8},
        "text_cfg": {"context_length": 8, "vocab_size": 64, "width": 64,
                     "heads": 2, "layers": 2},
    }
    tt = openclip._to_two_towers_cfg(cfg)
    assert tt["image"]["ln_pre"] and tt["text"]["causal_mask"]
    from clipa_tpu.models import two_towers
    rng = np.random.RandomState(0)
    img = rng.rand(2, 16, 16, 3).astype(np.float32)
    txt = np.stack([[2, 9, 7, 30, 3, 0, 0, 0],    # eot (max id=30) at pos 3
                    [2, 14, 5, 8, 21, 50, 0, 0]])  # eot (50) at pos 5

    # float64 on both sides: any residual difference is semantic, not
    # accumulation-order noise.
    jax.config.update("jax_enable_x64", True)
    try:
        model = two_towers.Model(dtype=jnp.float64, **tt)
        params = model.init({"params": jax.random.PRNGKey(1)},
                            jnp.asarray(img), jnp.asarray(txt))["params"]
        zimg, ztxt, _ = model.apply({"params": params}, jnp.asarray(img),
                                    jnp.asarray(txt))
        zimg, ztxt = np.asarray(zimg), np.asarray(ztxt)
        exported = openclip.export_torch_state_dict(params)
    finally:
        jax.config.update("jax_enable_x64", False)

    sd = {k: torch.tensor(np.asarray(v, np.float64))
          for k, v in exported.items()}

    # ---- torch vision forward (open_clip spec) ----
    x = torch.tensor(img, dtype=torch.float64).permute(0, 3, 1, 2)
    x = F.conv2d(x, sd["visual.conv1.weight"], stride=8)
    x = x.reshape(2, 64, -1).permute(0, 2, 1)  # (B, L, w)
    cls = sd["visual.class_embedding"].expand(2, 1, -1)
    x = torch.cat([cls, x], dim=1) + sd["visual.positional_embedding"]
    x = F.layer_norm(x, (64,), sd["visual.ln_pre.weight"],
                     sd["visual.ln_pre.bias"])
    for i in range(2):
        x = _torch_block(torch, x, sd, f"visual.transformer.resblocks.{i}",
                         heads=2)
    pooled = F.layer_norm(x[:, 0], (64,), sd["visual.ln_post.weight"],
                          sd["visual.ln_post.bias"])
    zimg_t = pooled @ sd["visual.proj"]
    zimg_t = zimg_t / zimg_t.norm(dim=-1, keepdim=True)

    # ---- torch text forward (causal mask + eot argmax pooling) ----
    t = torch.tensor(txt, dtype=torch.long)
    x = sd["token_embedding.weight"][t] + sd["positional_embedding"]
    causal = torch.full((8, 8), float("-inf"), dtype=torch.float64).triu(1)
    for i in range(2):
        x = _torch_block(torch, x, sd, f"transformer.resblocks.{i}",
                         heads=2, attn_bias=causal)
    x = F.layer_norm(x, (64,), sd["ln_final.weight"], sd["ln_final.bias"])
    pooled = x[torch.arange(2), t.argmax(dim=-1)]
    ztxt_t = pooled @ sd["text_projection"]
    ztxt_t = ztxt_t / ztxt_t.norm(dim=-1, keepdim=True)

    # towers cast outputs to float32, so f32 rounding (~1e-8) remains; the
    # LN-eps class of semantic bug this test exists to catch shows at ~4e-5.
    np.testing.assert_allclose(zimg, zimg_t.numpy(), atol=1e-6)
    np.testing.assert_allclose(ztxt, ztxt_t.numpy(), atol=1e-6)


def test_bigvision_semantics_match_torch_reference():
    """CLIPA-v2-style (BigVision-compat) models — NO ln_pre, bidirectional
    text, gap vision pool excluding the cls token, last-token text pool,
    tanh gelu — must produce the same embeddings as a torch forward
    implementing the open_clip spec (transformer.py:472-526 big_vision_gap,
    :638-673 big_vision_last), from the same exported weights. This is the
    pathway the released CLIPA-v2 checkpoints evaluate through (the
    de-facto cross-framework parity oracle, SURVEY §4.4)."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    cfg = {
        "embed_dim": 32,
        "vision_cfg": {"image_size": 16, "layers": 2, "width": 64,
                       "head_width": 32, "patch_size": 8,
                       "gelu_approximate": "tanh", "ln_pre": False,
                       "pool_style": "big_vision_gap",
                       "global_average_pool": True},
        "text_cfg": {"context_length": 8, "vocab_size": 64, "width": 64,
                     "heads": 2, "layers": 2, "gelu_approximate": "tanh",
                     "pool_style": "big_vision_last",
                     "attention_mask": False, "bert_tokenizer": True},
    }
    tt = openclip._to_two_towers_cfg(cfg)
    assert not tt["image"]["ln_pre"] and not tt["text"]["causal_mask"]
    assert tt["image"]["pool_type"] == "gap"
    assert tt["text"]["pool_type"] == "last"
    from clipa_tpu.models import two_towers
    rng = np.random.RandomState(2)
    img = rng.rand(2, 16, 16, 3).astype(np.float32)
    txt = np.stack([[2, 9, 7, 30, 3, 0, 0, 0],
                    [2, 14, 5, 8, 21, 50, 1, 7]])

    jax.config.update("jax_enable_x64", True)
    try:
        model = two_towers.Model(dtype=jnp.float64, **tt)
        params = model.init({"params": jax.random.PRNGKey(3)},
                            jnp.asarray(img), jnp.asarray(txt))["params"]
        zimg, ztxt, _ = model.apply({"params": params}, jnp.asarray(img),
                                    jnp.asarray(txt))
        zimg, ztxt = np.asarray(zimg), np.asarray(ztxt)
        exported = openclip.export_torch_state_dict(params)
    finally:
        jax.config.update("jax_enable_x64", False)

    sd = {k: torch.tensor(np.asarray(v, np.float64))
          for k, v in exported.items()}
    assert "visual.ln_pre.weight" not in sd

    # ---- torch vision forward (big_vision_gap: cls token attends but is
    # excluded from the pool; ln_post on the pooled vector) ----
    x = torch.tensor(img, dtype=torch.float64).permute(0, 3, 1, 2)
    x = F.conv2d(x, sd["visual.conv1.weight"], stride=8)
    x = x.reshape(2, 64, -1).permute(0, 2, 1)
    cls = sd["visual.class_embedding"].expand(2, 1, -1)
    x = torch.cat([cls, x], dim=1) + sd["visual.positional_embedding"]
    for i in range(2):
        x = _torch_block(torch, x, sd, f"visual.transformer.resblocks.{i}",
                         heads=2, gelu="tanh")
    pooled = x[:, 1:].mean(dim=1)
    pooled = F.layer_norm(pooled, (64,), sd["visual.ln_post.weight"],
                          sd["visual.ln_post.bias"])
    zimg_t = pooled @ sd["visual.proj"]
    zimg_t = zimg_t / zimg_t.norm(dim=-1, keepdim=True)

    # ---- torch text forward (bidirectional, last-token pooling) ----
    t = torch.tensor(txt, dtype=torch.long)
    x = sd["token_embedding.weight"][t] + sd["positional_embedding"]
    for i in range(2):
        x = _torch_block(torch, x, sd, f"transformer.resblocks.{i}",
                         heads=2, gelu="tanh")
    x = F.layer_norm(x, (64,), sd["ln_final.weight"], sd["ln_final.bias"])
    pooled = x[:, -1]
    ztxt_t = pooled @ sd["text_projection"]
    ztxt_t = ztxt_t / ztxt_t.norm(dim=-1, keepdim=True)

    np.testing.assert_allclose(zimg, zimg_t.numpy(), atol=1e-6)
    np.testing.assert_allclose(ztxt, ztxt_t.numpy(), atol=1e-6)


def _openai_style_state_dict(width=64, layers=2, patch=16, grid=2,
                             twidth=64, tlayers=2, ctx=8, vocab=64,
                             embed=32, seed=0):
    """Synthetic state dict in the OpenAI CLIP release layout
    (clipa_torch/open_clip/model.py:376-419 infers config from it)."""
    rs = np.random.RandomState(seed)
    sd = {
        "logit_scale": np.float32(np.log(1 / 0.07)),
        "visual.conv1.weight": rs.randn(width, 3, patch, patch),
        "visual.class_embedding": rs.randn(width),
        "visual.positional_embedding": rs.randn(grid * grid + 1, width),
        "visual.proj": rs.randn(width, embed),
        "visual.ln_pre.weight": np.ones(width), "visual.ln_pre.bias":
            np.zeros(width),
        "visual.ln_post.weight": np.ones(width), "visual.ln_post.bias":
            np.zeros(width),
        "token_embedding.weight": rs.randn(vocab, twidth),
        "positional_embedding": rs.randn(ctx, twidth),
        "text_projection": rs.randn(twidth, embed),
        "ln_final.weight": np.ones(twidth), "ln_final.bias": np.zeros(twidth),
    }
    for pre, w, n in [("visual.transformer.resblocks", width, layers),
                      ("transformer.resblocks", twidth, tlayers)]:
        for i in range(n):
            b = f"{pre}.{i}."
            sd.update({
                b + "ln_1.weight": np.ones(w), b + "ln_1.bias": np.zeros(w),
                b + "ln_2.weight": np.ones(w), b + "ln_2.bias": np.zeros(w),
                b + "attn.in_proj_weight": rs.randn(3 * w, w),
                b + "attn.in_proj_bias": rs.randn(3 * w),
                b + "attn.out_proj.weight": rs.randn(w, w),
                b + "attn.out_proj.bias": rs.randn(w),
                b + "mlp.c_fc.weight": rs.randn(4 * w, w),
                b + "mlp.c_fc.bias": rs.randn(4 * w),
                b + "mlp.c_proj.weight": rs.randn(w, 4 * w),
                b + "mlp.c_proj.bias": rs.randn(w),
            })
    return {k: np.asarray(v, np.float32) for k, v in sd.items()}


def test_load_openai_model(tmp_path):
    """OpenAI-release loading: architecture inferred from tensor shapes,
    QuickGELU activated, weights land (openai.py:23 parity)."""
    torch = pytest.importorskip("torch")
    sd = _openai_style_state_dict()
    path = str(tmp_path / "openai_clip.pt")
    torch.save({k: torch.tensor(v) for k, v in sd.items()}, path)

    model = openclip.load_openai_model(path)
    assert model.config["quick_gelu"] is True
    assert model.config["vision_cfg"]["image_size"] == 32
    assert model.config["text_cfg"]["context_length"] == 8
    # weights actually landed, not re-initialized
    np.testing.assert_allclose(
        np.asarray(model.params["img"]["pos_embedding"][0]),
        sd["visual.positional_embedding"], rtol=1e-6)
    z = model.encode_image(np.zeros((1, 32, 32, 3), np.float32))
    assert z.shape == (1, 32)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(z), axis=-1),
                               1.0, rtol=1e-4)


def _tiny_rn_cfg():
    return {
        "embed_dim": 16,
        "vision_cfg": {"image_size": 32, "layers": [1, 1, 1, 1],
                       "width": 16, "patch_size": None},
        "text_cfg": {"context_length": 8, "vocab_size": 64, "width": 32,
                     "heads": 2, "layers": 1},
    }


def test_resnet_config_builds_and_encodes():
    """RN*.json -> ModifiedResNet tower: builds, normalizes, BN stats
    carried as model_state (modified_resnet.py:95-181 parity surface)."""
    tt = openclip._to_two_towers_cfg(_tiny_rn_cfg())
    assert tt["image_model"] == "resnet"
    assert tt["image"]["num_heads"] == 16 * 32 // 64
    from clipa_tpu.models import two_towers
    model = two_towers.Model(**tt)
    variables = model.init({"params": jax.random.PRNGKey(0)},
                           jnp.zeros((1, 32, 32, 3)),
                           jnp.zeros((1, 8), jnp.int32))
    assert "batch_stats" in variables
    zimg, ztxt, _ = model.apply(variables, jnp.ones((2, 32, 32, 3)) * 0.5,
                                jnp.zeros((2, 8), jnp.int32))
    assert zimg.shape == (2, 16) and ztxt.shape == (2, 16)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(zimg), axis=-1),
                               1.0, rtol=1e-5)


def test_resnet_torch_roundtrip():
    """params+batch_stats -> torch state dict -> back, bit-exact."""
    from clipa_tpu.models import two_towers
    tt = openclip._to_two_towers_cfg(_tiny_rn_cfg())
    model = two_towers.Model(**tt)
    rng = jax.random.PRNGKey(3)
    variables = model.init({"params": rng}, jnp.zeros((1, 32, 32, 3)),
                           jnp.zeros((1, 8), jnp.int32))
    params, stats = variables["params"], variables["batch_stats"]
    # make running stats distinctive so the round-trip is meaningful
    stats = jax.tree_util.tree_map(
        lambda x: x + np.random.RandomState(0).rand(*x.shape)
        .astype(np.float32), stats)
    sd = openclip.export_torch_state_dict(params, stats)
    back = openclip.convert_torch_variables(
        sd, heads=openclip._heads_from_params(params))
    flat_a = dict(u.tree_flatten_with_names(params)[0])
    flat_b = dict(u.tree_flatten_with_names(back["params"])[0])
    assert set(flat_a) == set(flat_b)
    for k in flat_a:
        np.testing.assert_array_equal(np.asarray(flat_a[k]),
                                      np.asarray(flat_b[k]), err_msg=k)
    sa = dict(u.tree_flatten_with_names(stats)[0])
    sb = dict(u.tree_flatten_with_names(back["batch_stats"])[0])
    assert set(sa) == set(sb)
    for k in sa:
        np.testing.assert_array_equal(np.asarray(sa[k]),
                                      np.asarray(sb[k]), err_msg=k)


def test_resnet_semantics_match_torch_reference():
    """ModifiedResNet visual tower must match a float64 torch forward
    written from the reference spec (modified_resnet.py:10-92): stem,
    anti-aliased bottlenecks, and the single-query attention pool."""
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    from clipa_tpu.models import two_towers
    tt = openclip._to_two_towers_cfg(_tiny_rn_cfg())
    rng = np.random.RandomState(0)
    img = rng.rand(2, 32, 32, 3).astype(np.float32)

    jax.config.update("jax_enable_x64", True)
    try:
        model = two_towers.Model(dtype=jnp.float64, **tt)
        variables = model.init({"params": jax.random.PRNGKey(1)},
                               jnp.asarray(img),
                               jnp.zeros((1, 8), jnp.int64))
        params, stats = variables["params"], variables["batch_stats"]
        # distinctive running stats: eval-mode BN must actually use them
        stats = jax.tree_util.tree_map(
            lambda x: x + 0.5 * np.abs(rng.rand(*x.shape)), stats)
        zimg, _, _ = model.apply({"params": params, "batch_stats": stats},
                                 jnp.asarray(img), None)
        zimg = np.asarray(zimg)
        sd = {k: torch.tensor(np.asarray(v), dtype=torch.float64)
              for k, v in openclip.export_torch_state_dict(
                  params, stats).items()}
    finally:
        jax.config.update("jax_enable_x64", False)

    def bn(x, p):
        return F.batch_norm(x, sd[f"{p}.running_mean"],
                            sd[f"{p}.running_var"], sd[f"{p}.weight"],
                            sd[f"{p}.bias"], training=False, eps=1e-5)

    def bottleneck(x, p, stride):
        out = F.relu(bn(F.conv2d(x, sd[f"{p}.conv1.weight"]), f"{p}.bn1"))
        out = F.relu(bn(F.conv2d(out, sd[f"{p}.conv2.weight"], padding=1),
                        f"{p}.bn2"))
        if stride > 1:
            out = F.avg_pool2d(out, stride)
        out = bn(F.conv2d(out, sd[f"{p}.conv3.weight"]), f"{p}.bn3")
        if f"{p}.downsample.0.weight" in sd:
            idn = F.avg_pool2d(x, stride) if stride > 1 else x
            idn = bn(F.conv2d(idn, sd[f"{p}.downsample.0.weight"]),
                     f"{p}.downsample.1")
        else:
            idn = x
        return F.relu(out + idn)

    x = torch.tensor(img.transpose(0, 3, 1, 2), dtype=torch.float64)
    x = F.relu(bn(F.conv2d(x, sd["visual.conv1.weight"], stride=2,
                           padding=1), "visual.bn1"))
    x = F.relu(bn(F.conv2d(x, sd["visual.conv2.weight"], padding=1),
                  "visual.bn2"))
    x = F.relu(bn(F.conv2d(x, sd["visual.conv3.weight"], padding=1),
                  "visual.bn3"))
    x = F.avg_pool2d(x, 2)
    for layer in (1, 2, 3, 4):
        x = bottleneck(x, f"visual.layer{layer}.0",
                       stride=1 if layer == 1 else 2)

    # AttentionPool2d (modified_resnet.py:68-92): mean-prepend, posemb,
    # full multi-head attention, keep the pooled query's output row.
    b, c, h, w = x.shape
    x = x.reshape(b, c, h * w).permute(2, 0, 1)          # (HW) N C
    x = torch.cat([x.mean(dim=0, keepdim=True), x], dim=0)
    x = x + sd["visual.attnpool.positional_embedding"][:, None, :]
    heads = 16 * 32 // 64
    out, _ = F.multi_head_attention_forward(
        query=x, key=x, value=x, embed_dim_to_check=c, num_heads=heads,
        q_proj_weight=sd["visual.attnpool.q_proj.weight"],
        k_proj_weight=sd["visual.attnpool.k_proj.weight"],
        v_proj_weight=sd["visual.attnpool.v_proj.weight"],
        in_proj_weight=None,
        in_proj_bias=torch.cat([sd["visual.attnpool.q_proj.bias"],
                                sd["visual.attnpool.k_proj.bias"],
                                sd["visual.attnpool.v_proj.bias"]]),
        bias_k=None, bias_v=None, add_zero_attn=False, dropout_p=0.0,
        out_proj_weight=sd["visual.attnpool.c_proj.weight"],
        out_proj_bias=sd["visual.attnpool.c_proj.bias"],
        use_separate_proj_weight=True, need_weights=False)
    zimg_t = out[0]
    zimg_t = zimg_t / zimg_t.norm(dim=-1, keepdim=True)
    # the tower returns float32 (models/resnet.py _Model return cast), so
    # agreement is bounded by f32 rounding; semantic bugs show at >=1e-5.
    np.testing.assert_allclose(zimg, zimg_t.numpy(), atol=1e-6,
                               err_msg="ModifiedResNet semantics diverge")


def test_infer_openai_config_resnet():
    """OpenAI RN checkpoints: architecture inferred from layer counts and
    the attn-pool grid (open_clip model.py:388-397)."""
    sd = {
        "visual.layer1.0.conv1.weight": np.zeros((16, 16, 1, 1)),
        "visual.layer2.0.conv1.weight": np.zeros((32, 64, 1, 1)),
        "visual.layer3.0.conv1.weight": np.zeros((64, 128, 1, 1)),
        "visual.layer4.0.conv1.weight": np.zeros((128, 256, 1, 1)),
        "visual.attnpool.positional_embedding": np.zeros((2, 512)),
        "text_projection": np.zeros((32, 16)),
        "ln_final.weight": np.zeros(32),
        "positional_embedding": np.zeros((8, 32)),
        "token_embedding.weight": np.zeros((64, 32)),
        "transformer.resblocks.0.ln_1.weight": np.zeros(32),
    }
    cfg = openclip._infer_openai_config(sd)
    assert cfg["vision_cfg"]["layers"] == [1, 1, 1, 1]
    assert cfg["vision_cfg"]["width"] == 16
    assert cfg["vision_cfg"]["image_size"] == 32
    assert cfg["quick_gelu"] is True


def test_quick_gelu_differs_from_erf():
    from clipa_tpu.models.layers import MlpBlock
    x = jnp.asarray(np.random.RandomState(0).randn(2, 4, 8), jnp.float32)
    outs = {}
    for mode in (False, True, "quick"):
        m = MlpBlock(mlp_dim=16, gelu_approx=mode)
        p = m.init(jax.random.PRNGKey(0), x)
        outs[str(mode)] = np.asarray(m.apply(p, x))
    assert not np.allclose(outs["quick"], outs["False"])
    assert not np.allclose(outs["quick"], outs["True"])


def test_get_tokenizer_bert(tmp_path):
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "a", "photo", "of", "cat",
             "dog"]
    vp = tmp_path / "vocab.txt"
    vp.write_text("\n".join(vocab))
    tok = openclip.get_tokenizer("ViT-H-14-CL32-GAP-BigVision",
                                 vocab_path=str(vp), context_length=8)
    out = tok(["a photo of a cat", "dog"])
    assert out.shape == (2, 8) and out.dtype == np.int32
    assert out[0, 0] == 2  # [CLS]
    assert list(out[1]) == [2, 8, 0, 0, 0, 0, 0, 0]


def test_get_tokenizer_bpe_raises():
    with pytest.raises(ValueError, match="BPE"):
        openclip.get_tokenizer("ViT-L-16-CL32-GAP")


def test_image_transform_eval():
    from PIL import Image
    t = openclip.image_transform(32, is_train=False)
    img = Image.fromarray(np.zeros((64, 48, 3), np.uint8))
    out = t(img)
    assert out.shape == (3, 32, 32)
    assert out.dtype == np.float32
    # zeros normalize to -mean/std
    np.testing.assert_allclose(
        out[:, 0, 0], -np.asarray(openclip.OPENAI_MEAN) /
        np.asarray(openclip.OPENAI_STD), rtol=1e-4)


def test_image_transform_train_jpeg():
    from PIL import Image
    buf = io.BytesIO()
    Image.fromarray(np.random.RandomState(0).randint(
        0, 255, (100, 120, 3), dtype=np.uint8)).save(buf, "JPEG")
    t = openclip.image_transform(32, is_train=True,
                                 interpolation="bilinear")
    out = t(np.asarray(Image.open(io.BytesIO(buf.getvalue()))))
    assert out.shape == (3, 32, 32)


def test_standard_vit_configs_build():
    """Every standard (non-CLIPA) ViT config must construct a faithful
    model: open_clip defaults (ln_pre, causal mask, eot pool, erf/quick
    gelu) with the published widths/heads."""
    for name in ["ViT-B-32", "ViT-B-16", "ViT-L-14", "ViT-H-14",
                 "ViT-g-14", "ViT-bigG-14", "ViT-e-14",
                 "ViT-B-32-quickgelu"]:
        cfg = openclip.get_model_config(name)
        tt = openclip._to_two_towers_cfg(cfg)
        assert tt["image"]["ln_pre"] is True, name
        assert tt["text"]["causal_mask"] is True, name
        assert tt["text"]["pool_type"] == "eot", name
        assert cfg["text_cfg"]["vocab_size"] == 49408, name
        assert tt["image"]["width"] % tt["image"]["num_heads"] == 0, name
    q = openclip._to_two_towers_cfg(
        openclip.get_model_config("ViT-B-32-quickgelu"))
    assert q["image"]["gelu_approx"] == "quick"
    # mlp_ratio configs land exactly (bigG: 1664 * 4.9231 -> 8192)
    big = openclip._to_two_towers_cfg(
        openclip.get_model_config("ViT-bigG-14"))
    assert big["image"]["mlp_dim"] == 8192
    assert big["image"]["num_heads"] == 16  # 1664 / 104

    # a small one actually initializes and runs
    model = openclip.create_model("ViT-S-16", force_image_size=32)
    z = model.encode_image(np.zeros((1, 32, 32, 3), np.float32))
    assert z.shape == (1, 384)


def test_variant_vit_configs_build():
    """The plus/alt/hi-res ViT variants map to faithful tower configs
    (reference clipa_torch/open_clip/model_configs/ViT-*-{plus,alt,280,320})."""
    expect = {  # name -> (embed_dim, vision width, patch, image_size)
        "ViT-S-32": (384, 384, 32, 224),
        "ViT-S-32-alt": (256, 384, 32, 224),
        "ViT-S-16-alt": (256, 384, 16, 224),
        "ViT-M-32": (512, 512, 32, 224),
        "ViT-M-32-alt": (384, 512, 32, 224),
        "ViT-M-16-alt": (384, 512, 16, 224),
        "ViT-B-16-plus": (640, 896, 16, 224),
        "ViT-B-32-plus-256": (640, 896, 32, 256),
        "ViT-L-14-280": (768, 1024, 14, 280),
        "ViT-L-16-320": (768, 1024, 16, 320),
    }
    for name, (embed, width, patch, size) in expect.items():
        cfg = openclip.get_model_config(name)
        tt = openclip._to_two_towers_cfg(cfg)
        assert cfg["embed_dim"] == embed, name
        assert tt["image"]["width"] == width, name
        assert tt["image"]["patch_size"] == (patch, patch), name
        assert cfg["vision_cfg"]["image_size"] == size, name
    # ls_init_value (ViT-M-16-alt) must reach the tower config
    tt = openclip._to_two_towers_cfg(openclip.get_model_config("ViT-M-16-alt"))
    assert tt["image"]["ls_init"] == 1e-4


def test_layer_scale_params_and_effect():
    """ls_init creates per-block ls1/ls2 (D,) gains initialized to the
    configured value; at init they scale both residual branches."""
    model = openclip.create_model("ViT-S-16-alt")  # no layer scale
    assert "ls1" not in str(jax.tree_util.tree_structure(model.params))
    model_ls = openclip.create_model("ViT-M-16-alt")
    blocks = model_ls.params["img"]["Transformer"]
    g = blocks["encoderblock_0"]["ls1"]
    assert g.shape == (512,)
    np.testing.assert_allclose(np.asarray(g), 1e-4)


def test_convnext_configs_build_and_encode():
    """convnext_* configs resolve through the timm-name mapping onto the
    native ConvNeXt tower (reference: open_clip timm adapter
    clipa_torch/open_clip/timm_model.py:34-84 — trunk + GAP + proj)."""
    names = ["convnext_tiny", "convnext_small", "convnext_base",
             "convnext_base_w", "convnext_base_w_320", "convnext_large",
             "convnext_large_d", "convnext_xlarge", "convnext_xxlarge",
             "convnext_xxlarge_320"]
    dims0 = {"convnext_tiny": 96, "convnext_small": 96, "convnext_base": 128,
             "convnext_base_w": 128, "convnext_base_w_320": 128,
             "convnext_large": 192, "convnext_large_d": 192,
             "convnext_xlarge": 256, "convnext_xxlarge": 384,
             "convnext_xxlarge_320": 384}
    for name in names:
        cfg = openclip.get_model_config(name)
        tt = openclip._to_two_towers_cfg(cfg)
        assert tt["image_model"] == "convnext", name
        assert tt["image"]["dims"][0] == dims0[name], name
    # mlp proj only for the _d variant
    assert openclip._to_two_towers_cfg(
        openclip.get_model_config("convnext_large_d"))["image"]["head_mlp"]
    assert not openclip._to_two_towers_cfg(
        openclip.get_model_config("convnext_base"))["image"]["head_mlp"]
    # the smallest one actually runs end to end
    model = openclip.create_model("convnext_tiny")
    z = model.encode_image(
        np.random.default_rng(0).random((1, 224, 224, 3), np.float32))
    assert z.shape == (1, 1024)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(z)), 1.0, rtol=1e-4)


def test_unsupported_timm_trunk_raises():
    with pytest.raises(NotImplementedError, match="efficientnet"):
        openclip._timm_vision_cfg({"timm_model_name":
                                   "efficientnet_b0"})


@pytest.fixture(scope="module")
def tiny_convnext():
    """Tiny ConvNeXt-tower CLIP (custom dims/depths; layer scale on so
    gamma round-trips)."""
    from clipa_tpu.models import two_towers
    model = two_towers.Model(
        image_model="convnext",
        image={"dims": (8, 16, 24, 32), "depths": (1, 2, 2, 1),
               "layer_scale_init_value": 1e-6},
        text={"variant": "Ti", "pool_type": "last", "vocab_size": 64},
        out_dim=(32, 32), temperature_init=1 / 0.07)
    params = model.init({"params": jax.random.PRNGKey(0)},
                        jnp.zeros((1, 32, 32, 3)),
                        jnp.zeros((1, 8), jnp.int32))["params"]
    return model, params


def test_convnext_torch_roundtrip(tiny_convnext):
    """ConvNeXt tower: export to the timm-trunk torch layout
    (visual.trunk.* + visual.head.*, reference
    clipa_torch/open_clip/timm_model.py:64-84) and convert back, bit-exact
    (VERDICT r4 missing #3: convnext checkpoints were previously
    unloadable)."""
    _, params = tiny_convnext
    sd = openclip.export_torch_state_dict(params)
    assert "visual.trunk.stem.0.weight" in sd
    assert sd["visual.trunk.stem.0.weight"].shape == (8, 3, 4, 4)
    assert "visual.trunk.stages.1.downsample.1.weight" in sd
    assert "visual.trunk.stages.0.blocks.0.conv_dw.weight" in sd
    assert sd["visual.trunk.stages.0.blocks.0.conv_dw.weight"].shape \
        == (8, 1, 7, 7)
    assert "visual.trunk.stages.0.blocks.0.gamma" in sd
    assert "visual.head.proj.weight" in sd
    back = openclip.convert_torch_state_dict(sd)
    flat_a = dict(u.tree_flatten_with_names(params)[0])
    flat_b = dict(u.tree_flatten_with_names(back)[0])
    assert set(flat_a) == set(flat_b)
    for k in flat_a:
        np.testing.assert_array_equal(np.asarray(flat_a[k]),
                                      np.asarray(flat_b[k]), err_msg=k)


def test_convnext_converted_forward_equal(tiny_convnext):
    model, params = tiny_convnext
    sd = openclip.export_torch_state_dict(params)
    back = openclip.convert_torch_state_dict(sd)
    img = jnp.asarray(np.random.RandomState(0).rand(2, 32, 32, 3), jnp.float32)
    txt = jnp.asarray(np.random.RandomState(1).randint(0, 64, (2, 8)))
    a = model.apply({"params": params}, img, txt)
    b = model.apply({"params": jax.tree_util.tree_map(jnp.asarray, back)},
                    img, txt)
    for x, y in zip(a[:2], b[:2]):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_convnext_mlp_head_roundtrip():
    """convnext_large_d-style mlp projection (visual.head.mlp.*)."""
    from clipa_tpu.models import two_towers
    model = two_towers.Model(
        image_model="convnext",
        image={"dims": (8, 16, 24, 32), "depths": (1, 1, 1, 1),
               "head_mlp": True},
        text={"variant": "Ti", "pool_type": "last", "vocab_size": 64},
        out_dim=(32, 32), temperature_init=1 / 0.07)
    params = model.init({"params": jax.random.PRNGKey(1)},
                        jnp.zeros((1, 32, 32, 3)),
                        jnp.zeros((1, 8), jnp.int32))["params"]
    sd = openclip.export_torch_state_dict(params)
    assert "visual.head.mlp.fc1.weight" in sd
    assert "visual.head.mlp.fc2.weight" in sd
    back = openclip.convert_torch_state_dict(sd)
    flat_a = dict(u.tree_flatten_with_names(params)[0])
    flat_b = dict(u.tree_flatten_with_names(back)[0])
    assert set(flat_a) == set(flat_b)
    for k in flat_a:
        np.testing.assert_array_equal(np.asarray(flat_a[k]),
                                      np.asarray(flat_b[k]), err_msg=k)


def test_convnext_checkpoint_loads_via_create_model(tmp_path):
    """create_model('convnext_tiny', pretrained=<torch .bin>) — the full
    user path for released convnext checkpoints (torch-serialized
    timm-trunk state dict -> native tower), outputs preserved exactly."""
    torch = pytest.importorskip("torch")
    model = openclip.create_model("convnext_tiny")
    sd = {k: torch.from_numpy(np.asarray(v))
          for k, v in openclip.export_torch_state_dict(model.params).items()}
    path = str(tmp_path / "convnext_tiny.bin")
    torch.save(sd, path)
    loaded = openclip.create_model("convnext_tiny", pretrained=path)
    img = np.random.default_rng(0).random((1, 224, 224, 3), np.float32)
    np.testing.assert_array_equal(np.asarray(model.encode_image(img)),
                                  np.asarray(loaded.encode_image(img)))


@pytest.fixture(scope="module")
def tiny_swin():
    """Tiny Swin-tower CLIP (32px, patch 4, window 2: grids 8x8 -> 4x4)."""
    from clipa_tpu.models import two_towers
    model = two_towers.Model(
        image_model="swin",
        image={"embed_dim": 8, "depths": (2, 2), "num_heads": (2, 2),
               "window": 2, "patch_size": 4},
        text={"variant": "Ti", "pool_type": "last", "vocab_size": 64},
        out_dim=(32, 32), temperature_init=1 / 0.07)
    params = model.init({"params": jax.random.PRNGKey(2)},
                        jnp.zeros((1, 32, 32, 3)),
                        jnp.zeros((1, 8), jnp.int32))["params"]
    return model, params


def test_swin_torch_roundtrip(tiny_swin):
    """Swin tower: export to the timm-trunk torch layout (incl. the
    PatchMerging neighbor-order row permutation, models/swin.py note) and
    convert back, bit-exact."""
    _, params = tiny_swin
    sd = openclip.export_torch_state_dict(params)
    assert "visual.trunk.patch_embed.proj.weight" in sd
    assert "visual.trunk.layers.0.blocks.0.attn.relative_position_bias_table" in sd
    assert "visual.trunk.layers.0.downsample.reduction.weight" in sd
    assert sd["visual.trunk.layers.0.downsample.reduction.weight"].shape \
        == (16, 32)
    back = openclip.convert_torch_state_dict(sd)
    flat_a = dict(u.tree_flatten_with_names(params)[0])
    flat_b = dict(u.tree_flatten_with_names(back)[0])
    assert set(flat_a) == set(flat_b)
    for k in flat_a:
        np.testing.assert_array_equal(np.asarray(flat_a[k]),
                                      np.asarray(flat_b[k]), err_msg=k)


def test_swin_converted_forward_equal(tiny_swin):
    model, params = tiny_swin
    sd = openclip.export_torch_state_dict(params)
    back = openclip.convert_torch_state_dict(sd)
    img = jnp.asarray(np.random.RandomState(3).rand(2, 32, 32, 3), jnp.float32)
    txt = jnp.asarray(np.random.RandomState(4).randint(0, 64, (2, 8)))
    a = model.apply({"params": params}, img, txt)
    b = model.apply({"params": jax.tree_util.tree_map(jnp.asarray, back)},
                    img, txt)
    for x, y in zip(a[:2], b[:2]):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.fixture(scope="module")
def tiny_relpos():
    """Tiny relpos-ViT-tower CLIP (16px, patch 4: 4x4 grid + cls)."""
    from clipa_tpu.models import two_towers
    model = two_towers.Model(
        image_model="vit_relpos",
        image={"width": 16, "depth": 2, "num_heads": 2, "patch_size": 4,
               "rel_pos_dim": 8},
        text={"variant": "Ti", "pool_type": "last", "vocab_size": 64},
        out_dim=(32, 32), temperature_init=1 / 0.07)
    params = model.init({"params": jax.random.PRNGKey(5)},
                        jnp.zeros((1, 16, 16, 3)),
                        jnp.zeros((1, 8), jnp.int32))["params"]
    return model, params


def test_relpos_torch_roundtrip(tiny_relpos):
    """relpos-ViT tower: export to the timm-trunk torch layout
    (visual.trunk.blocks.*.attn.rel_pos.mlp.*, reference
    clipa_torch/open_clip/timm_model.py adapter around timm
    vision_transformer_relpos.py) and convert back, bit-exact."""
    _, params = tiny_relpos
    sd = openclip.export_torch_state_dict(params)
    assert "visual.trunk.cls_token" in sd
    assert "visual.trunk.blocks.0.attn.rel_pos.mlp.fc1.weight" in sd
    assert sd["visual.trunk.blocks.0.attn.rel_pos.mlp.fc1.weight"].shape \
        == (8, 2)
    assert "visual.trunk.blocks.0.attn.qkv.weight" in sd
    assert "visual.trunk.blocks.0.attn.qkv.bias" not in sd  # qkv_bias=False
    assert "visual.head.proj.weight" in sd
    back = openclip.convert_torch_state_dict(sd)
    flat_a = dict(u.tree_flatten_with_names(params)[0])
    flat_b = dict(u.tree_flatten_with_names(back)[0])
    assert set(flat_a) == set(flat_b)
    for k in flat_a:
        np.testing.assert_array_equal(np.asarray(flat_a[k]),
                                      np.asarray(flat_b[k]), err_msg=k)


def test_relpos_converted_forward_equal(tiny_relpos):
    model, params = tiny_relpos
    sd = openclip.export_torch_state_dict(params)
    back = openclip.convert_torch_state_dict(sd)
    img = jnp.asarray(np.random.RandomState(6).rand(2, 16, 16, 3), jnp.float32)
    txt = jnp.asarray(np.random.RandomState(7).randint(0, 64, (2, 8)))
    a = model.apply({"params": params}, img, txt)
    b = model.apply({"params": jax.tree_util.tree_map(jnp.asarray, back)},
                    img, txt)
    for x, y in zip(a[:2], b[:2]):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_relpos_checkpoint_loads_via_create_model(tmp_path):
    """create_model('vit_relpos_medium_patch16_cls_224', pretrained=<torch
    .bin>) — the full user path for timm-trunk relpos checkpoints; buffer
    keys timm persists (rel_coords_log) are ignored like
    relative_position_index."""
    torch = pytest.importorskip("torch")
    model = openclip.create_model("vit_relpos_medium_patch16_cls_224")
    sd = {k: torch.from_numpy(np.asarray(v))
          for k, v in openclip.export_torch_state_dict(model.params).items()}
    sd["visual.trunk.blocks.0.attn.rel_pos.rel_coords_log"] = \
        torch.zeros(49, 2)  # a persisted buffer must not break strict mode
    path = str(tmp_path / "vit_relpos_medium.bin")
    torch.save(sd, path)
    loaded = openclip.create_model("vit_relpos_medium_patch16_cls_224",
                                   pretrained=path)
    img = np.random.default_rng(8).random((1, 224, 224, 3), np.float32)
    np.testing.assert_array_equal(np.asarray(model.encode_image(img)),
                                  np.asarray(loaded.encode_image(img)))
