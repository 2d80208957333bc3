"""Data layer: TFRecord IO, tf.Example codec, sources, pipeline."""

import io

import numpy as np
import pytest

from clipa_tpu.data import core, pipeline, tfrecord


def test_crc32c_known_vectors():
    # RFC 3720 appendix B.4 test vectors + the classic check string
    assert tfrecord.crc32c(b"") == 0
    assert tfrecord.crc32c(bytes(32)) == 0x8A9136AA
    assert tfrecord.crc32c(b"\xff" * 32) == 0x62A8AB43
    assert tfrecord.crc32c(bytes(range(32))) == 0x46DD794E
    assert tfrecord.crc32c(b"123456789") == 0xE3069283


def test_tfrecord_roundtrip(tmp_path):
    path = str(tmp_path / "test.tfrecord")
    payloads = [b"hello", b"world" * 100, b""]
    assert tfrecord.write_records(path, payloads) == 3
    assert list(tfrecord.read_records(path, verify=True)) == payloads


def test_example_roundtrip():
    features = {
        "jpg": b"\xff\xd8fakejpegbytes",
        "txt": ["a caption", "another caption"],
        "scores": np.asarray([0.5, -1.25], np.float32),
        "ids": np.asarray([1, -7, 2 ** 40], np.int64),
    }
    payload = tfrecord.build_example(features)
    parsed = tfrecord.parse_example(payload)
    assert parsed["jpg"] == features["jpg"]
    assert parsed["txt"] == [b"a caption", b"another caption"]
    np.testing.assert_array_equal(parsed["scores"], features["scores"])
    np.testing.assert_array_equal(parsed["ids"], features["ids"])


def test_example_matches_tensorflow():
    """Cross-check our wire format against TF's own Example codec."""
    tf = pytest.importorskip("tensorflow")
    features = {
        "jpg": b"rawbytes",
        "txt": "one caption",
        "f": np.asarray([1.5, 2.5], np.float32),
        "i": np.asarray([3, -4], np.int64),
    }
    ours = tfrecord.build_example(features)
    parsed_by_tf = tf.train.Example.FromString(ours)
    fmap = parsed_by_tf.features.feature
    assert fmap["jpg"].bytes_list.value[0] == b"rawbytes"
    assert fmap["txt"].bytes_list.value[0] == b"one caption"
    np.testing.assert_allclose(list(fmap["f"].float_list.value), [1.5, 2.5])
    assert list(fmap["i"].int64_list.value) == [3, -4]

    theirs = parsed_by_tf.SerializeToString()
    reparsed = tfrecord.parse_example(theirs)
    assert reparsed["jpg"] == b"rawbytes"
    np.testing.assert_array_equal(reparsed["i"], [3, -4])


@pytest.fixture()
def shards(tmp_path):
    paths = []
    for s in range(3):
        path = str(tmp_path / f"data-{s:05d}-of-00003.tfrecord")
        tfrecord.write_records(path, [
            tfrecord.build_example({
                "image": b"img-bytes-%d-%d" % (s, i),
                "texts": f"caption {s} {i}",
                "id": np.asarray([s * 10 + i]),
            }) for i in range(4)
        ])
        paths.append(path)
    return paths


def test_tfrecord_source(shards):
    src = core.TFRecordSource(shards)
    samples = list(src.iter_process_shard())
    assert len(samples) == 12
    assert src.total_examples() == 12
    assert samples[0]["texts"] == b"caption 0 0"


def test_even_file_splits():
    files = [f"f{i}" for i in range(5)]
    s0 = core.even_file_splits(files, 0, 2)
    s1 = core.even_file_splits(files, 1, 2)
    assert sorted(s0 + s1) == files and set(s0).isdisjoint(s1)


def test_synthetic_source():
    src = core.SyntheticSource(n_examples=10, res=16)
    samples = list(src.iter_process_shard(seed=0))
    assert len(samples) == 10
    assert samples[0]["image"].shape == (16, 16, 3)
    assert isinstance(samples[0]["texts"], str)


def test_train_pipeline_batches(shards):
    src = core.TFRecordSource(shards)

    def pp(s):
        return {"id": np.asarray(s["id"][0], np.int64), "_rng": s["_rng"]}

    it = pipeline.make_for_train(src, pp, batch_size=4, shuffle_buffer=8,
                                 seed=0, num_workers=2)
    b1 = next(it)
    assert b1["id"].shape == (4,)
    # repeats forever
    for _ in range(5):
        next(it)


def test_train_pipeline_determinism(shards):
    src = core.TFRecordSource(shards)

    def pp(s):
        rng = s["_rng"]
        return {"noise": rng.random(2), "id": np.asarray(s["id"][0])}

    def first_batches(n=3):
        it = pipeline.make_for_train(src, pp, batch_size=4, shuffle_buffer=8,
                                     seed=7, num_workers=2)
        return [next(it) for _ in range(n)]

    a, b = first_batches(), first_batches()
    for ba, bb in zip(a, b):
        np.testing.assert_array_equal(ba["id"], bb["id"])
        np.testing.assert_array_equal(ba["noise"], bb["noise"])


def test_inference_pipeline_padding(shards):
    src = core.TFRecordSource(shards)  # 12 examples

    def pp(s):
        return {"id": np.asarray(s["id"][0], np.int64)}

    it, n_batches = pipeline.make_for_inference(src, pp, batch_size=5)
    batches = list(it)
    assert len(batches) == n_batches == 3  # ceil(12/5)
    masks = np.concatenate([b["_mask"] for b in batches])
    assert masks.sum() == 12
    assert masks.shape[0] == 15
    # padding is all-zero and at the end
    assert list(masks) == [1] * 12 + [0] * 3


def test_shuffle_buffer_covers_all():
    stream = iter([{"v": i} for i in range(100)])
    out = [s["v"] for s in pipeline._shuffle(stream, 10, seed=1)]
    assert sorted(out) == list(range(100))
    assert out != list(range(100))  # actually shuffled


def test_process_pool_pp_matches_threaded(shards):
    """worker_processes pp map yields the same samples as the threaded map
    (order preserved, per-sample rng semantics intact)."""
    pp_str = 'keep("id")'
    from clipa_tpu.registry import get_preprocess_fn
    pp_fn = get_preprocess_fn(pp_str)

    def run(**kw):
        src = core.TFRecordSource(shards)
        it = pipeline.make_for_train(src, pp_fn, batch_size=4,
                                     shuffle_buffer=1, seed=0, **kw)
        return [np.asarray(next(it)["id"]) for _ in range(3)]

    threaded = run(num_workers=2)
    procs = run(worker_processes=2, pp_str=pp_str)
    for a, b in zip(threaded, procs):
        np.testing.assert_array_equal(a, b)

    import pytest
    with pytest.raises(ValueError, match="pp_str"):
        src = core.TFRecordSource(shards)
        next(pipeline.make_for_train(src, pp_fn, batch_size=4,
                                     shuffle_buffer=1, seed=0,
                                     worker_processes=2))


def test_device_prefetch(mesh8, shards):
    src = core.TFRecordSource(shards)

    def pp(s):
        return {"id": np.asarray([s["id"][0]] * 2, np.int64)}

    it = pipeline.make_for_train(src, pp, batch_size=8, shuffle_buffer=4,
                                 seed=0, num_workers=0)
    dev_it = pipeline.start_input_pipeline(it, mesh8, n_prefetch=2)
    batch = next(dev_it)
    assert batch["id"].shape == (8, 2)
    import jax
    assert isinstance(batch["id"], jax.Array)
    assert len(batch["id"].sharding.device_set) == jax.device_count()


def _png_bytes(color, size=8):
    from PIL import Image
    img = Image.new("RGB", (size, size), color)
    buf = io.BytesIO()
    img.save(buf, "PNG")
    return buf.getvalue()


def test_csv_source(tmp_path):
    """Torch-quickstart CSV surface (clipa_torch/training/data.py:33-56):
    tab-separated filepath/title columns, relative paths resolved against
    the CSV's directory, raw bytes out (pp `decode` owns decoding)."""
    (tmp_path / "imgs").mkdir()
    rows = ["filepath\ttitle"]
    for i, color in enumerate([(255, 0, 0), (0, 255, 0), (0, 0, 255)]):
        (tmp_path / "imgs" / f"{i}.png").write_bytes(_png_bytes(color))
        rows.append(f"imgs/{i}.png\tcaption number {i}")
    (tmp_path / "data.csv").write_text("\n".join(rows) + "\n")

    src = core.CsvSource(str(tmp_path / "data.csv"))
    assert src.total_examples() == 3
    samples = list(src.iter_process_shard())
    assert len(samples) == 3
    assert samples[0]["texts"] == "caption number 0"
    from clipa_tpu.pp import ops_image
    decoded = ops_image.get_decode()({"image": samples[0]["image"]})["image"]
    assert decoded.shape == (8, 8, 3)
    assert decoded[0, 0, 0] == 255  # red pixel survives the round trip

    # seeded repeat reshuffles; unseeded order is stable
    again = list(src.iter_process_shard())
    assert [s["texts"] for s in again] == [s["texts"] for s in samples]


def test_csv_source_validates_columns(tmp_path):
    (tmp_path / "bad.csv").write_text("a\tb\n1\t2\n")
    with pytest.raises(ValueError, match="filepath"):
        core.CsvSource(str(tmp_path / "bad.csv"))


def test_image_folder_source(tmp_path):
    """torchvision-ImageFolder semantics (reference raw IN-1K val path,
    clipa_torch/training/data.py:123-145): sorted class dirs -> labels."""
    for cls, color in [("n01_cat", (250, 1, 1)), ("n02_dog", (1, 250, 1))]:
        d = tmp_path / cls
        d.mkdir()
        for j in range(2):
            (d / f"{j}.png").write_bytes(_png_bytes(color))
    (tmp_path / "n01_cat" / "notes.txt").write_text("skip me")

    src = core.ImageFolderSource(str(tmp_path))
    assert src.class_names == ["n01_cat", "n02_dog"]
    assert src.total_examples() == 4
    samples = list(src.iter_process_shard())
    assert sorted(s["label"] for s in samples) == [0, 0, 1, 1]
    from clipa_tpu.pp import ops_image
    img = ops_image.get_decode()({"image": samples[0]["image"]})["image"]
    assert img.shape == (8, 8, 3)


def test_get_source_names():
    with pytest.raises(KeyError, match="csv"):
        core.get_source("nope")


def _wds_shard(path, samples):
    """Write a webdataset tar: samples = [(key, {suffix: bytes})]."""
    import tarfile
    with tarfile.open(path, "w") as tf:
        for key, members in samples:
            for suffix, data in members.items():
                info = tarfile.TarInfo(f"{key}.{suffix}")
                info.size = len(data)
                tf.addfile(info, io.BytesIO(data))


def test_webdataset_source(tmp_path):
    """LAION-format tar shards (clipa_torch/training/data.py:340-392):
    group-by-key, caption/image filter, rename to image/texts, json
    sidecar parsed, raw bytes out."""
    _wds_shard(tmp_path / "00000.tar", [
        ("s0", {"jpg": _png_bytes((255, 0, 0)), "txt": b"first caption",
                "json": b'{"width": 8}'}),
        ("s1", {"png": _png_bytes((0, 255, 0)), "txt": b"second caption"}),
        ("s2", {"txt": b"no image, dropped"}),
        ("s3", {"jpg": _png_bytes((0, 0, 255))}),  # no caption, dropped
    ])
    _wds_shard(tmp_path / "00001.tar", [
        ("s4", {"webp": _png_bytes((9, 9, 9)), "txt": b"third"}),
    ])

    src = core.WebDatasetSource(str(tmp_path / "{00000..00001}.tar"))
    assert len(src.files) == 2
    samples = list(src.iter_process_shard())
    assert [s["texts"] for s in samples] == [
        "first caption", "second caption", "third"]
    assert samples[0]["json"] == {"width": 8}
    from clipa_tpu.pp import ops_image
    img = ops_image.get_decode()({"image": samples[0]["image"]})["image"]
    assert img.shape == (8, 8, 3)

    # n_examples contract (--train-num-samples): explicit wins, else counted
    assert src.total_examples() == 3
    assert core.WebDatasetSource([str(tmp_path / "00000.tar")],
                                 n_examples=10).total_examples() == 10

    # seeded epochs reshuffle shards; resampled draws with replacement
    it = core.WebDatasetSource(
        str(tmp_path / "0000*.tar"), n_examples=3,
        resampled=True).iter_process_shard(repeat=True, seed=1)
    assert len([next(it) for _ in range(8)]) == 8


def test_webdataset_group_by_keys_nothrow(tmp_path):
    """Repeated-suffix and prefix-change both close a sample, and a
    multi-dot suffix groups with its base (reference group_by_keys_nothrow,
    clipa_torch/training/data.py:191-216)."""
    import tarfile
    with tarfile.open(tmp_path / "t.tar", "w") as tf:
        for name, data in [
                ("a.txt", b"cap a"), ("a.seg.jpg", b"ignored-extra"),
                ("a.jpg", _png_bytes((1, 1, 1))),
                # repeated suffix for the same prefix -> new sample
                ("a.txt", b"cap a2"), ("a.jpg", _png_bytes((2, 2, 2))),
                ("b.jpg", _png_bytes((3, 3, 3))), ("b.txt", b"cap b")]:
            info = tarfile.TarInfo(name)
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
    src = core.WebDatasetSource([str(tmp_path / "t.tar")])
    samples = list(src.iter_process_shard())
    assert [s["texts"] for s in samples] == ["cap a", "cap a2", "cap b"]
    assert samples[0]["seg.jpg"] == b"ignored-extra"


def test_webdataset_expand_urls():
    assert core.expand_urls("a/{00..02}.tar") == [
        "a/00.tar", "a/01.tar", "a/02.tar"]
    assert core.expand_urls("x{1..2}y{8..9}.tar") == [
        "x1y8.tar", "x1y9.tar", "x2y8.tar", "x2y9.tar"]
    assert core.expand_urls("a.tar::b.tar") == ["a.tar", "b.tar"]


def test_webdataset_in_pipeline(tmp_path):
    """webdataset -> pp -> batches through the training pipeline."""
    _wds_shard(tmp_path / "00000.tar", [
        (f"s{i}", {"jpg": _png_bytes((i * 30 % 255, 0, 0)),
                   "txt": f"caption {i}".encode()})
        for i in range(8)
    ])
    src = core.get_source("webdataset", pattern=str(tmp_path / "00000.tar"),
                          n_examples=8)
    from clipa_tpu import registry
    pp = registry.get_preprocess_fn("decode|resize(8)|keep('image')")
    it = pipeline.make_for_train(src, pp, batch_size=4, shuffle_buffer=8,
                                 seed=0, num_workers=0)
    batch = next(it)
    assert batch["image"].shape == (4, 8, 8, 3)
