"""Pretrained registry breadth + open_clip export layout round-trip."""

import hashlib
import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from clipa_tpu import utils as u
from clipa_tpu.compat import export as export_lib
from clipa_tpu.compat import openclip
from clipa_tpu.compat import pretrained as registry

# Every (model, tag) pair the reference registers
# (clipa_torch/open_clip/pretrained.py:203-231) — our table must be a
# superset.
_REFERENCE_PAIRS = [
    ("RN50", "openai"), ("RN50", "yfcc15m"), ("RN50", "cc12m"),
    ("RN50-quickgelu", "openai"), ("RN50-quickgelu", "yfcc15m"),
    ("RN50-quickgelu", "cc12m"),
    ("RN101", "openai"), ("RN101", "yfcc15m"),
    ("RN101-quickgelu", "openai"), ("RN101-quickgelu", "yfcc15m"),
    ("RN50x4", "openai"), ("RN50x16", "openai"), ("RN50x64", "openai"),
    ("ViT-B-32", "openai"), ("ViT-B-32", "laion400m_e31"),
    ("ViT-B-32", "laion400m_e32"), ("ViT-B-32", "laion2b_e16"),
    ("ViT-B-32", "laion2b_s34b_b79k"),
    ("ViT-B-32-quickgelu", "openai"), ("ViT-B-32-quickgelu", "laion400m_e31"),
    ("ViT-B-32-quickgelu", "laion400m_e32"),
    ("ViT-B-16", "openai"), ("ViT-B-16", "laion400m_e31"),
    ("ViT-B-16", "laion400m_e32"), ("ViT-B-16", "laion2b_s34b_b88k"),
    ("ViT-B-16-plus-240", "laion400m_e31"),
    ("ViT-B-16-plus-240", "laion400m_e32"),
    ("ViT-L-14", "openai"), ("ViT-L-14", "laion400m_e31"),
    ("ViT-L-14", "laion400m_e32"), ("ViT-L-14", "laion2b_s32b_b82k"),
    ("ViT-L-14-336", "openai"),
    ("ViT-H-14", "laion2b_s32b_b79k"),
    ("ViT-g-14", "laion2b_s12b_b42k"),
    ("ViT-bigG-14", "laion2b_s39b_b160k"),
    ("roberta-ViT-B-32", "laion2b_s12b_b32k"),
    ("xlm-roberta-base-ViT-B-32", "laion5b_s13b_b90k"),
    ("xlm-roberta-large-ViT-H-14", "frozen_laion5b_s13b_b90k"),
    ("convnext_base", "laion400m_s13b_b51k"),
    ("convnext_base_w", "laion2b_s13b_b82k"),
    ("convnext_base_w", "laion2b_s13b_b82k_augreg"),
    ("convnext_base_w", "laion_aesthetic_s13b_b82k"),
    ("convnext_base_w_320", "laion_aesthetic_s13b_b82k"),
    ("convnext_base_w_320", "laion_aesthetic_s13b_b82k_augreg"),
    ("convnext_large_d", "laion2b_s26b_b102k_augreg"),
    ("convnext_large_d_320", "laion2b_s29b_b131k_ft"),
    ("convnext_large_d_320", "laion2b_s29b_b131k_ft_soup"),
    ("convnext_xxlarge", "laion2b_s34b_b82k_augreg"),
    ("convnext_xxlarge", "laion2b_s34b_b82k_augreg_rewind"),
    ("convnext_xxlarge", "laion2b_s34b_b82k_augreg_soup"),
    ("coca_ViT-B-32", "laion2b_s13b_b90k"),
    ("coca_ViT-B-32", "mscoco_finetuned_laion2b_s13b_b90k"),
    ("coca_ViT-L-14", "laion2b_s13b_b90k"),
    ("coca_ViT-L-14", "mscoco_finetuned_laion2b_s13b_b90k"),
]


def test_registry_covers_reference_pairs():
    ours = set(registry.list_pretrained())
    missing = [p for p in _REFERENCE_PAIRS if p not in ours]
    assert not missing, f"registry pairs absent: {missing}"


def test_registry_clipa_families_present():
    assert registry.is_pretrained_cfg("ViT-L-14-CL32-GAP-BigVision",
                                      "datacomp1b")
    assert registry.is_pretrained_cfg("ViT-H-14-CL32-GAP-BigVision",
                                      "laion2b")


def test_registry_query_api():
    assert "RN50" in registry.list_pretrained_models_by_tag("openai")
    assert "ViT-bigG-14" not in registry.list_pretrained_models_by_tag(
        "openai")
    tags = registry.list_pretrained_tags_by_model("ViT-B-32")
    assert "openai" in tags and "laion2b_s34b_b79k" in tags
    # tag normalization: '-' and case fold like the reference's _clean_tag
    assert registry.is_pretrained_cfg("ViT-B-32", "LAION2B-S34B-B79K")
    assert registry.list_pretrained(as_str=True).count("RN50:openai") == 1


def test_registry_urls_carry_sha256():
    cfg = registry.get_pretrained_cfg("ViT-L-14", "openai")
    assert registry._expected_sha256(cfg["url"]).startswith("b8cca3fd")
    cfg = registry.get_pretrained_cfg("RN50", "yfcc15m")
    assert registry._expected_sha256(cfg["url"]) == "455df137"


def test_registry_mean_std_override():
    cfg = registry.get_pretrained_cfg("ViT-L-14", "laion2b_s32b_b82k")
    assert cfg["mean"] == (0.5, 0.5, 0.5) and cfg["std"] == (0.5, 0.5, 0.5)
    assert registry.get_pretrained_cfg("ViT-B-32", "openai")["mean"] is None


def test_download_from_url_sha256_verification(tmp_path):
    payload = b"checkpoint bytes"
    sha8 = hashlib.sha256(payload).hexdigest()[:8]
    good = tmp_path / f"rn50-quickgelu-test-{sha8}.pt"
    good.write_bytes(payload)
    url = ("https://github.com/mlfoundations/open_clip/releases/download/"
           f"v0.2-weights/{good.name}")
    # pre-seeded cache with matching sha: no network touched
    path = registry.download_pretrained_from_url(url,
                                                 cache_dir=str(tmp_path))
    assert path == str(good)
    # corrupt cache entry -> re-download attempted (fails offline)
    good.write_bytes(b"corrupted")
    with pytest.raises(Exception):
        registry.download_pretrained_from_url(url, cache_dir=str(tmp_path))


def test_download_pretrained_local_path_passthrough(tmp_path):
    f = tmp_path / "weights.npz"
    f.write_bytes(b"x")
    assert registry.download_pretrained("ViT-B-32", str(f)) == str(f)
    with pytest.raises(KeyError):
        registry.download_pretrained("ViT-B-32", "no_such_tag")


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
    return params


def test_save_open_clip_roundtrip(tiny_params, tmp_path):
    """our params -> exported torch .bin -> convert back == identical."""
    import torch
    out = export_lib.save_open_clip(tiny_params, "ViT-B-32", str(tmp_path))
    bin_path = os.path.join(out, export_lib.WEIGHTS_FILENAME)
    cfg_path = os.path.join(out, export_lib.CONFIG_FILENAME)
    assert os.path.isfile(bin_path) and os.path.isfile(cfg_path)

    sd = torch.load(bin_path, map_location="cpu", weights_only=True)
    back = openclip.convert_torch_state_dict(
        {k: v.numpy() for k, v in sd.items()})
    flat_a = dict(u.tree_flatten_with_names(tiny_params)[0])
    flat_b = dict(u.tree_flatten_with_names(back)[0])
    assert set(flat_a) == set(flat_b)
    for k in flat_a:
        np.testing.assert_allclose(np.asarray(flat_a[k], np.float32),
                                   flat_b[k], rtol=1e-6, err_msg=k)


def test_save_open_clip_config_and_readme(tiny_params, tmp_path):
    export_lib.save_open_clip(
        tiny_params, "ViT-B-32", str(tmp_path),
        model_card={"description": "test model",
                    "details": {"Dataset": "LAION-2B"}})
    with open(tmp_path / export_lib.CONFIG_FILENAME) as f:
        cfg = json.load(f)
    assert cfg["model_cfg"] == openclip.get_model_config("ViT-B-32")
    assert cfg["preprocess_cfg"]["mean"] == list(export_lib.OPENAI_MEAN)
    readme = (tmp_path / "README.md").read_text()
    assert readme.startswith("---\n")
    assert "- zero-shot-image-classification" in readme
    assert "datasets:\n- laion-2b" in readme
    assert "# Model card for ViT-B-32" in readme


def test_save_open_clip_from_npz(tiny_params, tmp_path):
    """The CLI pathway: flat npz checkpoint -> export folder."""
    from clipa_tpu.train import checkpoint as ckpt
    npz = tmp_path / "model.npz"
    ckpt.save_checkpoint(tiny_params, str(npz))
    out_dir = tmp_path / "export"
    export_lib.save_open_clip(str(npz), "ViT-B-32", str(out_dir))
    assert (out_dir / export_lib.WEIGHTS_FILENAME).is_file()


def test_create_model_resolves_registry_tag(monkeypatch, tmp_path):
    """create_model('<name>', '<tag>') goes through the registry."""
    calls = {}

    def fake_download(model, tag, **kw):
        calls["args"] = (model, tag)
        raise RuntimeError("offline")

    monkeypatch.setattr(registry, "download_pretrained", fake_download)
    with pytest.raises(RuntimeError, match="offline"):
        openclip.create_model("RN50", "openai")
    assert calls["args"] == ("RN50", "openai")
