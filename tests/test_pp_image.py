"""Image pp ops: decode, crops, resize, value ranges, fused decode+crop."""

import io

import numpy as np
import pytest

from clipa_tpu.registry import get_preprocess_fn


@pytest.fixture(scope="module")
def jpeg_bytes():
    from PIL import Image
    rng = np.random.RandomState(0)
    arr = rng.randint(0, 255, (300, 400, 3), dtype=np.uint8)
    img = Image.fromarray(arr)
    buf = io.BytesIO()
    img.save(buf, "JPEG", quality=90)
    return buf.getvalue()


def test_decode(jpeg_bytes):
    fn = get_preprocess_fn('decode(inkey="jpg", outkey="image")')
    out = fn({"jpg": jpeg_bytes})
    assert out["image"].shape == (300, 400, 3)
    assert out["image"].dtype == np.uint8


def test_resize():
    fn = get_preprocess_fn("resize(64)")
    out = fn({"image": np.zeros((100, 200, 3), np.uint8)})
    assert out["image"].shape == (64, 64, 3)


def test_resize_small_keeps_aspect():
    fn = get_preprocess_fn('resize_small(50, method="bilinear")')
    out = fn({"image": np.zeros((100, 200, 3), np.uint8)})
    assert out["image"].shape == (50, 100, 3)


def test_central_crop():
    img = np.arange(10 * 10).reshape(10, 10, 1).astype(np.uint8)
    fn = get_preprocess_fn("central_crop(4)")
    out = fn({"image": np.tile(img, (1, 1, 3))})
    assert out["image"].shape == (4, 4, 3)
    assert out["image"][0, 0, 0] == 10 * 3 + 3  # top-left of center window


def test_inception_crop_distribution():
    fn = get_preprocess_fn("inception_crop(32, area_min=40)")
    rng = np.random.default_rng(0)
    img = np.zeros((100, 100, 3), np.uint8)
    shapes = {fn({"image": img, "_rng": rng})["image"].shape
              for _ in range(5)}
    assert shapes == {(32, 32, 3)}


def test_decode_jpeg_and_inception_crop(jpeg_bytes):
    fn = get_preprocess_fn(
        'decode_jpeg_and_inception_crop(inkey="jpg", size=64, area_min=40, '
        'method="bilinear", antialias=True)')
    rng = np.random.default_rng(0)
    out = fn({"jpg": jpeg_bytes, "_rng": rng})
    assert out["image"].shape == (64, 64, 3)
    assert out["image"].dtype == np.uint8


def test_fused_crop_matches_decode_then_crop_statistically(jpeg_bytes):
    """Draft-mode decode must produce a similar image to full decode."""
    fused = get_preprocess_fn(
        'decode_jpeg_and_inception_crop(inkey="jpg", size=32, area_min=99)')
    plain = get_preprocess_fn(
        'decode(inkey="jpg", outkey="image")|inception_crop(32, area_min=99)')
    a = fused({"jpg": jpeg_bytes, "_rng": np.random.default_rng(7)})["image"]
    b = plain({"jpg": jpeg_bytes, "_rng": np.random.default_rng(7)})["image"]
    # same RNG -> same crop box; draft decode differs slightly in pixels
    assert a.shape == b.shape
    assert abs(a.astype(float).mean() - b.astype(float).mean()) < 10


def test_flip_lr():
    img = np.zeros((4, 4, 3), np.uint8)
    img[:, 0] = 255
    fn = get_preprocess_fn("flip_lr")

    class FakeRng:
        def __init__(self, r):
            self._r = r

        def random(self):
            return self._r

    flipped = fn({"image": img, "_rng": FakeRng(0.1)})["image"]
    kept = fn({"image": img, "_rng": FakeRng(0.9)})["image"]
    assert flipped[0, -1, 0] == 255
    assert kept[0, 0, 0] == 255


def test_value_range():
    fn = get_preprocess_fn("value_range(-1, 1)")
    out = fn({"image": np.array([[[0, 127.5, 255]]], np.float32)})
    np.testing.assert_allclose(out["image"], [[[-1, 0, 1]]], atol=1e-6)


def test_vgg_value_range():
    fn = get_preprocess_fn("vgg_value_range")
    img = np.full((2, 2, 3), 128, np.uint8)
    out = fn({"image": img})
    expected = (128 - np.array([0.485, 0.456, 0.406]) * 255) / \
        (np.array([0.229, 0.224, 0.225]) * 255)
    np.testing.assert_allclose(out["image"][0, 0], expected, rtol=1e-5)


def test_keep_drop_copy():
    fn = get_preprocess_fn('copy("a", "b")|keep("b")')
    out = fn({"a": 1, "c": 2, "_rng": None})
    assert out == {"b": 1, "_rng": None}
    fn2 = get_preprocess_fn('drop("c")')
    assert fn2({"a": 1, "c": 2}) == {"a": 1}


def test_onehot():
    fn = get_preprocess_fn("onehot(5)")
    out = fn({"labels": 2})
    np.testing.assert_array_equal(out["labels"], [0, 0, 1, 0, 0])


def test_full_clipa_pretrain_pp_string(jpeg_bytes, tmp_path):
    """The exact pp pipeline shape CLIPA pretrains with."""
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "a", "photo", "of", "cat"]
    vp = tmp_path / "vocab.txt"
    vp.write_text("\n".join(vocab))
    pp = (f'decode_jpeg_and_inception_crop(inkey="jpg", size=84, area_min=40, '
          f'method="bilinear", antialias=True)|flip_lr|'
          f'bert_tokenize(inkey="txt", max_len=8, vocab_path="{vp}")|'
          f'keep("image", "labels")')
    fn = get_preprocess_fn(pp)
    out = fn({"jpg": jpeg_bytes, "txt": b"a photo of cat",
              "_rng": np.random.default_rng(0)})
    assert set(out) == {"image", "labels", "_rng"}
    assert out["image"].shape == (84, 84, 3) and out["image"].dtype == np.uint8
    assert out["labels"].shape == (8,)
    assert list(out["labels"][:5]) == [2, 4, 5, 6, 7]
