"""Serving: bucketed batch embedding over the compat facade."""

import io
import json
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_ckpt(tmp_path_factory):
    """A tiny model config + matching npz checkpoint."""
    import jax
    import jax.numpy as jnp
    from clipa_tpu.models import two_towers
    from clipa_tpu.train import checkpoint as ckpt

    d = tmp_path_factory.mktemp("serve")
    # register a tiny model config next to the built-ins
    from clipa_tpu.compat import openclip
    cfg = {
        "embed_dim": 32,
        "vision_cfg": {"image_size": 32, "layers": 2, "width": 64,
                       "head_width": 32, "patch_size": 16,
                       "pool_style": "big_vision_gap",
                       "global_average_pool": True},
        "text_cfg": {"context_length": 8, "vocab_size": 32, "width": 64,
                     "heads": 2, "layers": 2, "bert_tokenizer": True,
                     "pool_style": "big_vision_last",
                     "attention_mask": False},
    }
    cfg_path = os.path.join(openclip._CONFIG_DIR, "Test-Tiny.json")
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)

    model = two_towers.Model(**openclip._to_two_towers_cfg(cfg))
    params = model.init({"params": jax.random.PRNGKey(0)},
                        jnp.zeros((1, 32, 32, 3)),
                        jnp.zeros((1, 8), jnp.int32))["params"]
    ckpt_path = str(d / "params.npz")
    ckpt.save_checkpoint({"params": jax.device_get(params)}, ckpt_path)

    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "a", "photo", "of",
             "cat", "dog"]
    vocab_path = str(d / "vocab.txt")
    with open(vocab_path, "w") as f:
        f.write("\n".join(vocab))

    yield "Test-Tiny", ckpt_path, vocab_path
    os.remove(cfg_path)
    openclip.get_model_config.cache_clear()


def test_embedding_service(tiny_ckpt, tmp_path):
    from clipa_tpu.serving import EmbeddingService
    from PIL import Image

    name, ckpt_path, vocab_path = tiny_ckpt
    svc = EmbeddingService(name, ckpt_path, vocab_path=vocab_path,
                           buckets=(4, 8), num_workers=2)

    # raw array intake, non-bucket-aligned count
    rng = np.random.RandomState(0)
    imgs = rng.randint(0, 255, (5, 32, 32, 3), np.uint8)
    z = svc.embed_images(imgs)
    assert z.shape == (5, 32)
    np.testing.assert_allclose(np.linalg.norm(z, axis=1), 1.0, atol=1e-3)

    # file intake
    files = []
    for i in range(3):
        path = str(tmp_path / f"img{i}.jpg")
        Image.fromarray(rng.randint(0, 255, (50, 60, 3), np.uint8)).save(path)
        files.append(path)
    z2 = svc.embed_images(files)
    assert z2.shape == (3, 32)

    zt = svc.embed_texts(["a photo of a cat", "a photo of a dog"])
    assert zt.shape == (2, 32)

    sim = z2 @ zt.T
    assert np.isfinite(sim).all()


def test_bucketing_consistency(tiny_ckpt):
    """Padding to buckets must not change embeddings."""
    from clipa_tpu.serving import EmbeddingService
    name, ckpt_path, vocab_path = tiny_ckpt
    svc = EmbeddingService(name, ckpt_path, vocab_path=vocab_path,
                           buckets=(2, 16), num_workers=0)
    rng = np.random.RandomState(1)
    imgs = rng.randint(0, 255, (6, 32, 32, 3), np.uint8)
    z_all = svc.embed_images(imgs)
    z_one = np.concatenate([svc.embed_images(imgs[i:i + 1])
                            for i in range(6)])
    np.testing.assert_allclose(z_all, z_one, atol=1e-5)
