"""Multi-host data splitting: exact example-granularity splits + padding.

Round-4 VERDICT weak #4: whole-file splits desync the inference padding
math (`make_for_inference`) whenever shard files are uneven or fewer than
hosts — a host holding extra files yields more than `n_batches*local_bs`
(negative pad), and a host holding zero files had no template to pad from.
These tests simulate every process of a pod (via the data layer's
`core._PROCESS_OVERRIDE` seam) and assert the reference's
`tfds.even_splits` semantics (clipa_jax/datasets/tfds.py:38-39) and
infinite-padding behavior (input_pipeline.py:137-163).
"""

import contextlib
import json

import numpy as np
import pytest

from clipa_tpu.data import core, pipeline, tfrecord


@contextlib.contextmanager
def as_process(pidx: int, pcount: int):
    old = core._PROCESS_OVERRIDE
    core._PROCESS_OVERRIDE = (pidx, pcount)
    try:
        yield
    finally:
        core._PROCESS_OVERRIDE = old


def _write_shards(tmp_path, lengths, with_metadata=False):
    """Uneven TFRecord shards; sample i (global order) has id == i."""
    paths, gid = [], 0
    for s, n in enumerate(lengths):
        path = str(tmp_path / f"data-{s:05d}-of-{len(lengths):05d}.tfrecord")
        payloads = []
        for _ in range(n):
            payloads.append(tfrecord.build_example({
                "image": b"img-bytes-%d" % gid,
                "texts": f"caption {gid}",
                "id": np.asarray([gid]),
            }))
            gid += 1
        tfrecord.write_records(path, payloads)
        paths.append(path)
    if with_metadata:
        info = {"splits": [{"shardLengths": [str(n) for n in lengths]}]}
        with open(tmp_path / "dataset_info.json", "w") as f:
            json.dump(info, f)
    return paths


@pytest.mark.parametrize("lengths", [(7, 2, 1), (4,), (3, 3, 3, 1)])
@pytest.mark.parametrize("pcount", [1, 2, 3, 5, 16])
def test_tfrecord_single_pass_even_split(tmp_path, lengths, pcount):
    paths = _write_shards(tmp_path, lengths)
    total = sum(lengths)
    seen = []
    for pidx in range(pcount):
        with as_process(pidx, pcount):
            src = core.TFRecordSource(paths)
            ids = [int(s["id"][0]) for s in src.iter_process_shard()]
            start, end = src.even_example_range()
            assert len(ids) == src.num_examples_per_process()
            assert ids == list(range(start, end))
            seen.extend(ids)
    assert sorted(seen) == list(range(total))


def test_tfrecord_metadata_skips_files(tmp_path, monkeypatch):
    """With shardLengths metadata, files wholly before the process's range
    are never opened (object-store reads matter on real pods)."""
    paths = _write_shards(tmp_path, (5, 5, 5), with_metadata=True)
    opened = []
    real = tfrecord.read_records

    def spy(path, *a, **kw):
        opened.append(path)
        return real(path, *a, **kw)

    monkeypatch.setattr(tfrecord, "read_records", spy)
    with as_process(2, 3):  # owns global ids [10, 15) == exactly file 2
        src = core.TFRecordSource(paths)
        ids = [int(s["id"][0]) for s in src.iter_process_shard()]
    assert ids == list(range(10, 15))
    assert opened == [paths[2]]


@pytest.mark.parametrize("pcount", [2, 4, 7])
def test_webdataset_single_pass_even_split(tmp_path, pcount):
    import io
    import tarfile

    def write_tar(path, ids):
        with tarfile.open(path, "w") as tf:
            for gid in ids:
                for suffix, payload in (("jpg", b"fakejpeg%d" % gid),
                                        ("txt", b"caption %d" % gid)):
                    info = tarfile.TarInfo(f"{gid:08d}.{suffix}")
                    info.size = len(payload)
                    tf.addfile(info, io.BytesIO(payload))

    write_tar(str(tmp_path / "00000.tar"), range(0, 3))
    write_tar(str(tmp_path / "00001.tar"), range(3, 4))
    src_paths = [str(tmp_path / "00000.tar"), str(tmp_path / "00001.tar")]

    seen = []
    for pidx in range(pcount):
        with as_process(pidx, pcount):
            src = core.WebDatasetSource(src_paths, n_examples=4)
            caps = [s["texts"] for s in src.iter_process_shard()]
            assert len(caps) == src.num_examples_per_process()
            seen.extend(caps)
    assert sorted(seen) == [f"caption {i}" for i in range(4)]


def test_inference_padding_with_empty_host(tmp_path):
    """3 examples over 4 simulated hosts: every host yields the same batch
    count, the empty host pads from the template, and the union of
    unmasked samples is exactly the dataset."""
    paths = _write_shards(tmp_path, (2, 1))
    pcount, batch_size = 4, 8  # local_bs = 2

    def pp(s):
        return {"id": np.asarray(int(s["id"][0]), np.int64)}

    n_batches_seen, unmasked = [], []
    for pidx in range(pcount):
        with as_process(pidx, pcount):
            src = core.TFRecordSource(paths)
            batches, n_batches = pipeline.make_for_inference(
                src, pp, batch_size, num_workers=0)
            batches = list(batches)
        n_batches_seen.append(n_batches)
        assert len(batches) == n_batches
        for b in batches:
            assert b["id"].shape[0] == batch_size // pcount
            unmasked.extend(b["id"][b["_mask"] == 1].tolist())
    assert len(set(n_batches_seen)) == 1
    assert sorted(unmasked) == [0, 1, 2]


def test_inference_rejects_overyielding_source(tmp_path):
    """A source whose split disagrees with num_examples_per_process must
    fail loudly, not silently desync hosts."""

    class Bad(core.SyntheticSource):
        def iter_process_shard(self, *, repeat=False, seed=None):
            # yields the FULL dataset on every host
            for _ in range(self.total_examples()):
                yield {"image": np.zeros((8, 8, 3), np.uint8),
                       "texts": "x", "label": 0}

    with as_process(0, 2):
        src = Bad(n_examples=16, res=8)
        batches, _ = pipeline.make_for_inference(
            src, lambda s: {"label": np.asarray(s["label"])}, 8,
            num_workers=0)
        with pytest.raises(RuntimeError, match="disagrees"):
            list(batches)


def test_zeroshot_eval_more_hosts_than_shards(tmp_path):
    """End-to-end: the zero-shot evaluator run per simulated host (more
    hosts than shard files, one host empty) sums to the single-process
    result. The device math runs unsharded per host (a 1-chip stand-in for
    the global batch); what's under test is the data split + padding +
    masked accumulation protocol."""
    import jax.numpy as jnp

    from clipa_tpu.evaluators import zeroshot
    from clipa_tpu.parallel import create_mesh, mesh as mesh_lib

    rng = np.random.RandomState(0)
    # 10 labeled "images" in 2 shards; 4 hosts -> host 3 gets nothing.
    raw = rng.randint(0, 255, (10, 8, 8, 3)).astype(np.uint8)
    labels = rng.randint(0, 3, 10)
    paths = []
    for s, rng_ids in enumerate((range(0, 7), range(7, 10))):
        path = str(tmp_path / f"imgs-{s:05d}.tfrecord")
        tfrecord.write_records(path, [
            tfrecord.build_example({"image": raw[i].tobytes(),
                                    "label": np.asarray([labels[i]])})
            for i in rng_ids])
        paths.append(path)

    # toy predict_fn: image embedding = mean pixel one-hot-ish projection;
    # text embedding = identity rows (class i -> e_i). Deterministic, so
    # per-host and single-process runs must agree exactly.
    emb = rng.randn(3, 192).astype(np.float32)
    emb /= np.linalg.norm(emb, axis=-1, keepdims=True)

    def predict_fn(params, image=None, labels=None):
        zimg = ztxt = None
        if image is not None:
            flat = jnp.reshape(image.astype(jnp.float32), (image.shape[0], -1))
            cls = jnp.asarray(flat[:, 0] % 3, jnp.int32)  # pixel-derived class
            zimg = jnp.asarray(emb)[cls]
        if labels is not None:
            ztxt = jnp.asarray(emb)[jnp.clip(labels[:, 0], 0, 2)]
        return zimg, ztxt, None

    from clipa_tpu.registry import Registry

    def decode_raw_uint8(shape):
        def op(s):
            s["image"] = np.frombuffer(s["image"], np.uint8).reshape(shape)
            return s
        return op

    def toy_class_tokens():
        def op(s):
            s["labels"] = np.asarray(
                [{"zero": 0, "one": 1, "two": 2}[s["texts"]]] * 4, np.int32)
            return s
        return op

    import jax

    def run_eval(pidx, pcount, batch_size):
        with as_process(pidx, pcount):
            src = core.TFRecordSource(paths)
            ev = zeroshot.Evaluator(
                predict_fn, create_mesh(devices=[jax.devices()[0]]),
                batch_size=batch_size,
                dataset_names=["toy"],
                class_names=["zero", "one", "two"],
                prompt_templates="class_name_only",
                pp_img="decode_raw_uint8(shape=(8, 8, 3))",
                pp_txt="toy_class_tokens",
                sources={"toy": src}, num_workers=0)
            return ev.evaluate(None, "toy")

    with Registry.temporary_ops(decode_raw_uint8=decode_raw_uint8,
                                toy_class_tokens=toy_class_tokens):
        single = run_eval(0, 1, 4)
        assert single["count"] == 10

        per_host = [run_eval(i, 4, 8) for i in range(4)]
    assert sum(r["count"] for r in per_host) == 10
    assert sum(r["correct"] for r in per_host) == single["correct"]
