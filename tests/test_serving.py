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


def test_sharded_buckets_round_up_to_mesh(tiny_ckpt):
    """Buckets round up to the device count; results sharded == unsharded."""
    import jax
    from clipa_tpu.serving import EmbeddingService
    name, ckpt_path, vocab_path = tiny_ckpt
    n_dev = len(jax.devices())
    svc = EmbeddingService(name, ckpt_path, vocab_path=vocab_path,
                           buckets=(1, 3), num_workers=0)
    assert all(b % n_dev == 0 for b in svc.buckets), svc.buckets
    one_dev = EmbeddingService(name, ckpt_path, vocab_path=vocab_path,
                               buckets=(4,), num_workers=0,
                               devices=jax.devices()[:1])
    rng = np.random.RandomState(2)
    imgs = rng.randint(0, 255, (7, 32, 32, 3), np.uint8)
    np.testing.assert_allclose(svc.embed_images(imgs),
                               one_dev.embed_images(imgs), atol=1e-5)


@pytest.mark.parametrize("fmt", ["npy", "zarr"])
def test_streaming_store(tiny_ckpt, tmp_path, fmt):
    """embed_*_to streams to disk and matches the in-RAM path exactly."""
    from clipa_tpu.serving import EmbeddingService
    name, ckpt_path, vocab_path = tiny_ckpt
    svc = EmbeddingService(name, ckpt_path, vocab_path=vocab_path,
                           buckets=(4,), num_workers=0)
    rng = np.random.RandomState(3)
    imgs = rng.randint(0, 255, (6, 32, 32, 3), np.uint8)
    suffix = ".npy" if fmt == "npy" else ".zarr"
    path = str(tmp_path / ("img_emb" + suffix))
    n = svc.embed_images_to(imgs, path, fmt=fmt)
    assert n == 6
    if fmt == "npy":
        stored = np.load(path, mmap_mode="r")
    else:
        import tensorstore as ts
        stored = ts.open({"driver": "zarr", "kvstore": {
            "driver": "file", "path": path}}).result().read().result()
    np.testing.assert_allclose(np.asarray(stored), svc.embed_images(imgs),
                               atol=1e-6)

    texts = ["a cat", "a dog", "a photo of a cat"]
    tpath = str(tmp_path / ("txt_emb" + suffix))
    assert svc.embed_texts_to(texts, tpath, fmt=fmt) == 3
    if fmt == "npy":
        np.testing.assert_allclose(np.load(tpath), svc.embed_texts(texts),
                                   atol=1e-6)


def test_streaming_from_files_lazy(tiny_ckpt, tmp_path):
    """File-path streaming decodes lazily (window by window) and matches
    the eager embed_images path."""
    from clipa_tpu.serving import EmbeddingService
    from PIL import Image
    name, ckpt_path, vocab_path = tiny_ckpt
    svc = EmbeddingService(name, ckpt_path, buckets=(2,), num_workers=2)
    rng = np.random.RandomState(4)
    files = []
    for i in range(5):
        path = str(tmp_path / f"s{i}.png")  # png = lossless, exact compare
        Image.fromarray(rng.randint(0, 255, (40, 40, 3), np.uint8)).save(path)
        files.append(path)
    out = str(tmp_path / "emb.npy")
    assert svc.embed_images_to(files, out, fmt="npy") == 5
    np.testing.assert_allclose(np.load(out), svc.embed_images(files),
                               atol=1e-6)


def test_multi_model_service(tiny_ckpt):
    from clipa_tpu.serving import MultiModelService
    name, ckpt_path, vocab_path = tiny_ckpt
    spec = dict(model_name=name, pretrained=ckpt_path,
                vocab_path=vocab_path, buckets=(4,), num_workers=0)
    svc = MultiModelService({"a": spec, "b": dict(spec)}, max_live=1)
    assert svc.names == ["a", "b"]
    rng = np.random.RandomState(5)
    imgs = rng.randint(0, 255, (2, 32, 32, 3), np.uint8)
    za = svc.embed_images("a", imgs)
    assert len(svc._live) == 1
    zb = svc.embed_images("b", imgs)  # evicts "a" (max_live=1)
    assert list(svc._live) == ["b"]
    np.testing.assert_allclose(za, zb, atol=1e-6)  # same weights
    zt = svc.embed_texts("b", ["a cat"])
    assert zt.shape[1] == za.shape[1]
    with pytest.raises(KeyError):
        svc.get("missing")
