"""open_clip-compatible facade: registry, converter roundtrip, tokenizer."""

import io

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
