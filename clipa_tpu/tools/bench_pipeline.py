"""Input-pipeline throughput benchmark at the pretrain shape.

Proof artifact for the question "can the host feed the chip?"
(reference's tf.data pipeline: clipa_jax/datasets/input_pipeline.py:181-185;
ours: clipa_tpu/data/pipeline.py). Generates real JPEG tfrecords, then
measures end-to-end samples/sec of source -> decode+inception-crop ->
simclr jitter -> tokenize -> batch, across worker counts, and compares to
the chip's consumption rate measured by bench.py.

Usage:
  python -m clipa_tpu.tools.bench_pipeline [--res 84] [--chip-rate 1125] \
      [--n 4096] [--jpeg-size 256] [--seconds 10]

Prints one JSON line per worker count + a summary verdict line.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import tempfile
import time

import numpy as np


def make_jpeg_shards(root: str, n: int, jpeg_size: int,
                     shards: int = 8) -> str:
    from PIL import Image
    from clipa_tpu.data import tfrecord

    rng = np.random.RandomState(0)
    per = n // shards
    for s in range(shards):
        def payloads():
            for _ in range(per):
                arr = rng.randint(0, 255, (jpeg_size, jpeg_size, 3),
                                  np.uint8)
                buf = io.BytesIO()
                Image.fromarray(arr).save(buf, format="JPEG", quality=90)
                yield tfrecord.build_example({
                    "jpg": buf.getvalue(),
                    "txt": b"a photo of a synthetic benchmark image",
                })
        tfrecord.write_records(
            os.path.join(root, f"bench-{s:05d}.tfrecord"), payloads())
    return os.path.join(root, "*.tfrecord")


def measure(pattern: str, pp: str, num_workers: int, batch_size: int,
            seconds: float, n_available: int, processes: bool = False) -> dict:
    from clipa_tpu.data import core as data_core
    from clipa_tpu.data import pipeline
    from clipa_tpu.registry import get_preprocess_fn

    source = data_core.TFRecordSource(pattern)
    pp_fn = get_preprocess_fn(pp)
    kw = (dict(worker_processes=num_workers, pp_str=pp) if processes
          else dict(num_workers=num_workers))
    it = pipeline.make_for_train(source, pp_fn, batch_size,
                                 shuffle_buffer=1024, seed=0, **kw)
    # warmup: one batch (thread spin-up, first decode)
    next(it)
    t0 = time.perf_counter()
    n = 0
    while time.perf_counter() - t0 < seconds:
        b = next(it)
        n += b["image"].shape[0]
    dt = time.perf_counter() - t0
    return {"num_workers": num_workers,
            "mode": "processes" if processes else "threads",
            "samples_per_sec": round(n / dt, 1),
            "batches": n // batch_size}


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--res", type=int, default=84)
    p.add_argument("--n", type=int, default=4096)
    p.add_argument("--jpeg-size", type=int, default=256)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--seconds", type=float, default=10.0)
    p.add_argument("--chip-rate", type=float, default=None,
                   help="pairs/sec/chip the train step consumes "
                        "(bench.py's headline value)")
    p.add_argument("--workers", type=str, default="0,2,4,8,16")
    p.add_argument("--processes", action="store_true",
                   help="use the process-pool pp map instead of threads")
    p.add_argument("--data-dir", type=str, default=None,
                   help="reuse/keep shards here instead of a temp dir")
    args = p.parse_args(argv)

    vocab = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "..", "data", "vocab.txt")
    vocab = os.path.normpath(vocab)
    pp = (f'decode_jpeg_and_inception_crop(inkey="jpg", size={args.res}, '
          f'area_min=40, method="bilinear", antialias=True)|'
          f'simclr_jitter_gray(jitter_strength=0.4)|'
          f'bert_tokenize(inkey="txt", max_len=32, vocab_path="{vocab}")|'
          f'keep("image", "labels")')

    tmp = None
    if args.data_dir:
        root = args.data_dir
        os.makedirs(root, exist_ok=True)
    else:
        tmp = tempfile.TemporaryDirectory()
        root = tmp.name
    existing = [f for f in os.listdir(root) if f.endswith(".tfrecord")]
    if not existing:
        pattern = make_jpeg_shards(root, args.n, args.jpeg_size)
    else:
        pattern = os.path.join(root, "*.tfrecord")

    results = []
    for w in [int(x) for x in args.workers.split(",")]:
        r = measure(pattern, pp, w, args.batch_size, args.seconds, args.n,
                    processes=args.processes and w > 0)
        results.append(r)
        print(json.dumps(r), flush=True)

    best = max(results, key=lambda r: r["samples_per_sec"])
    verdict = {"metric": f"input pipeline samples/sec (JPEG->{args.res}px)",
               "value": best["samples_per_sec"],
               "best_num_workers": best["num_workers"]}
    if args.chip_rate:
        verdict["chip_rate"] = args.chip_rate
        verdict["feed_headroom"] = round(
            best["samples_per_sec"] / args.chip_rate, 2)
        verdict["feeds_chip"] = best["samples_per_sec"] >= args.chip_rate
    print(json.dumps(verdict), flush=True)
    if tmp:
        tmp.cleanup()
    return verdict


if __name__ == "__main__":
    main()
