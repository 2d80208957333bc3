"""Native C++ components: parity with the Python implementations."""

import io
import os

import numpy as np
import pytest

from clipa_tpu import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")


VOCAB = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "a", "the", "cat", "dog",
         "run", "##ning", "##s", "photo", "of", "!", ",", "un",
         "##believ", "##able"]


def test_wordpiece_parity_ascii():
    from clipa_tpu.native.wordpiece import NativeWordPieceTokenizer
    from clipa_tpu.pp.tokenizer import WordPieceTokenizer
    nat = NativeWordPieceTokenizer(VOCAB)
    py = WordPieceTokenizer(VOCAB)
    cases = [
        "The cat, running!",
        "a photo of a dog",
        "unbelievable RUNNING cats!!!",
        "",
        "x" * 150,
        "punct.,!between",
        "tabs\tand\nnewlines",
    ]
    for s in cases:
        assert nat.encode(s) == py.encode(s), s


def test_wordpiece_parity_real_vocab_random():
    vocab_path = "/root/reference/data/vocab.txt"
    if not os.path.exists(vocab_path):
        pytest.skip("no real vocab")
    from clipa_tpu.native.wordpiece import NativeWordPieceTokenizer
    from clipa_tpu.pp.tokenizer import WordPieceTokenizer
    nat = NativeWordPieceTokenizer(vocab_path)
    py = WordPieceTokenizer(vocab_path)
    rng = np.random.RandomState(0)
    words = ["photo", "dog", "catalogue", "xylophone", "running", "1999",
             "$4.99", "hand-made", "THE", "aB3x", "zzzzqqq"]
    for _ in range(50):
        s = " ".join(rng.choice(words, size=rng.randint(1, 12)))
        assert nat.encode(s) == py.encode(s), s


def test_wordpiece_nonascii_falls_back():
    from clipa_tpu.native.wordpiece import NativeWordPieceTokenizer
    from clipa_tpu.pp.tokenizer import WordPieceTokenizer
    nat = NativeWordPieceTokenizer(VOCAB)
    py = WordPieceTokenizer(VOCAB)
    for s in ["café au lait", "日本 cat", "naïve dog"]:
        assert nat.encode(s) == py.encode(s), s


@pytest.fixture()
def jpeg_bytes():
    from PIL import Image
    rng = np.random.RandomState(0)
    # smooth image so lossy decode paths stay comparable
    base = rng.randint(0, 255, (30, 40, 3), dtype=np.uint8)
    img = Image.fromarray(base).resize((400, 300))
    buf = io.BytesIO()
    img.save(buf, "JPEG", quality=92)
    return buf.getvalue()


def test_jpeg_info(jpeg_bytes):
    import ctypes
    lib = native.load()
    w, h = ctypes.c_int(), ctypes.c_int()
    assert lib.jpeg_info(jpeg_bytes, len(jpeg_bytes),
                         ctypes.byref(w), ctypes.byref(h)) == 0
    assert (w.value, h.value) == (400, 300)


def test_jpeg_decode_crop_resize_matches_pil(jpeg_bytes):
    import ctypes
    from PIL import Image
    lib = native.load()
    out = np.zeros((64, 64, 3), np.uint8)
    ret = lib.jpeg_decode_crop_resize(
        jpeg_bytes, len(jpeg_bytes), 50, 80, 200, 240, 64, 64,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    assert ret == 0
    ref = Image.open(io.BytesIO(jpeg_bytes)).convert("RGB")
    ref = ref.crop((80, 50, 80 + 240, 50 + 200)).resize(
        (64, 64), Image.Resampling.BILINEAR)
    ref = np.asarray(ref)
    # DCT-scaled decode anti-aliases differently from full-res decode +
    # resize; compare statistics, not pixels.
    diff = np.abs(out.astype(float) - ref.astype(float))
    assert diff.mean() < 25, diff.mean()
    assert abs(out.mean() - ref.mean()) < 2.0
    # at identical scale the images must match closely
    out_full = np.zeros((200, 240, 3), np.uint8)
    assert lib.jpeg_decode_crop_resize(
        jpeg_bytes, len(jpeg_bytes), 50, 80, 200, 240, 200, 240,
        out_full.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))) == 0
    ref_full = np.asarray(Image.open(io.BytesIO(jpeg_bytes)).convert(
        "RGB").crop((80, 50, 320, 250)))
    assert np.abs(out_full.astype(float) - ref_full.astype(float)).mean() < 8


def test_jpeg_full_image(jpeg_bytes):
    import ctypes
    lib = native.load()
    out = np.zeros((84, 84, 3), np.uint8)
    ret = lib.jpeg_decode_crop_resize(
        jpeg_bytes, len(jpeg_bytes), 0, 0, 0, 0, 84, 84,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    assert ret == 0 and out.std() > 0


def test_jpeg_bad_input():
    import ctypes
    lib = native.load()
    out = np.zeros((8, 8, 3), np.uint8)
    ret = lib.jpeg_decode_crop_resize(
        b"not a jpeg", 10, 0, 0, 0, 0, 8, 8,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    assert ret == -1


def test_tfr_scan(tmp_path):
    import ctypes
    from clipa_tpu.data import tfrecord
    lib = native.load()
    path = str(tmp_path / "t.tfrecord")
    payloads = [b"abc", b"x" * 1000, b""]
    tfrecord.write_records(path, payloads)

    n = lib.tfr_scan(path.encode(), None, None, 0, 1)
    assert n == 3
    offs = (ctypes.c_int64 * 3)()
    lens = (ctypes.c_int64 * 3)()
    n = lib.tfr_scan(path.encode(), offs, lens, 3, 1)
    assert n == 3
    assert list(lens) == [3, 1000, 0]
    with open(path, "rb") as f:
        f.seek(offs[1])
        assert f.read(lens[1]) == payloads[1]


def test_native_crc_matches_python():
    from clipa_tpu.data import tfrecord
    lib = native.load()
    for data in (b"", b"123456789", bytes(range(256)) * 3):
        assert lib.tfr_crc32c_masked(data, len(data)) == \
            tfrecord.masked_crc32c(data)


def test_corrupt_tfrecord_detected(tmp_path):
    from clipa_tpu.data import tfrecord
    lib = native.load()
    path = str(tmp_path / "bad.tfrecord")
    tfrecord.write_records(path, [b"hello world"])
    raw = bytearray(open(path, "rb").read())
    raw[14] ^= 0xFF  # flip a payload byte
    open(path, "wb").write(bytes(raw))
    assert lib.tfr_scan(path.encode(), None, None, 0, 1) == -2
    # unverified scan still counts frames
    assert lib.tfr_scan(path.encode(), None, None, 0, 0) == 1
