"""LAION/TFRecord dataset preparation tooling.

Covers the reference's data/laion400m scripts (SURVEY.md §2.3) without TF:
  * count   — per-shard record counts -> shard_lengths.json +
              dataset_info.json (the metadata our TFRecordSource reads;
              replaces compute_split_info.py + generate_metadata.py),
  * rename  — rename img2dataset shard files to the
              `{name}-{split}.tfrecord-XXXXX-of-NNNNN` template
              (replaces rename_tfds.py),
  * smoke   — decode a few samples end to end (replaces
              tfds_load_example.py),
  * convert-webdataset — .tar shards (img2dataset default) -> tfrecord.

Usage: python -m clipa_tpu.tools.laion count --pattern '/data/*.tfrecord*'
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import tarfile


def cmd_count(args) -> None:
    from clipa_tpu.data import tfrecord
    files = sorted(glob.glob(args.pattern))
    if not files:
        sys.exit(f"no files match {args.pattern}")
    lengths = []
    try:
        from clipa_tpu import native
        lib = native.load()
        for f in files:
            n = lib.tfr_scan(f.encode(), None, None, 0, 1 if args.verify else 0)
            if n < 0:
                sys.exit(f"corrupt shard: {f}")
            lengths.append(int(n))
    except Exception:
        for f in files:
            lengths.append(sum(1 for _ in tfrecord.read_records(
                f, verify=args.verify)))
    out_dir = os.path.dirname(os.path.abspath(files[0]))
    info = {
        "name": args.name,
        "splits": [{"name": args.split, "shardLengths":
                    [str(n) for n in lengths]}],
        "totalExamples": sum(lengths),
    }
    with open(os.path.join(out_dir, "dataset_info.json"), "w") as f:
        json.dump(info, f, indent=2)
    print(f"{len(files)} shards, {sum(lengths)} examples "
          f"-> {out_dir}/dataset_info.json")


def cmd_rename(args) -> None:
    files = sorted(glob.glob(args.pattern))
    n = len(files)
    for i, f in enumerate(files):
        dst = os.path.join(
            os.path.dirname(f),
            f"{args.name}-{args.split}.tfrecord-{i:05d}-of-{n:05d}")
        if not args.dry_run:
            os.rename(f, dst)
        print(f"{f} -> {dst}")


def cmd_smoke(args) -> None:
    from clipa_tpu.data.core import TFRecordSource
    src = TFRecordSource(args.pattern)
    for i, sample in enumerate(src.iter_process_shard()):
        keys = {k: (len(v) if isinstance(v, (bytes, list)) else v)
                for k, v in sample.items()}
        print(f"sample {i}: {keys}")
        if i + 1 >= args.n:
            break


def cmd_convert_webdataset(args) -> None:
    """img2dataset .tar shards -> tf.Example tfrecords (jpg + txt + json)."""
    from clipa_tpu.data import tfrecord
    tars = sorted(glob.glob(args.pattern))
    os.makedirs(args.out_dir, exist_ok=True)
    for i, tar_path in enumerate(tars):
        out_path = os.path.join(
            args.out_dir,
            f"{args.name}-{args.split}.tfrecord-{i:05d}-of-{len(tars):05d}")
        samples: dict[str, dict] = {}
        with tarfile.open(tar_path) as tf_:
            for member in tf_.getmembers():
                if not member.isfile():
                    continue
                key, _, ext = member.name.rpartition(".")
                data = tf_.extractfile(member).read()
                samples.setdefault(key, {})[ext] = data

        def payloads():
            for key in sorted(samples):
                parts = samples[key]
                if "jpg" not in parts and "jpeg" not in parts:
                    continue
                feats = {"jpg": parts.get("jpg", parts.get("jpeg")),
                         "txt": parts.get("txt", b""),
                         "key": key.encode()}
                yield tfrecord.build_example(feats)

        n = tfrecord.write_records(out_path, payloads())
        print(f"{tar_path} -> {out_path} ({n} samples)")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("count")
    c.add_argument("--pattern", required=True)
    c.add_argument("--name", default="laion400m")
    c.add_argument("--split", default="full")
    c.add_argument("--verify", action="store_true")
    c.set_defaults(fn=cmd_count)

    r = sub.add_parser("rename")
    r.add_argument("--pattern", required=True)
    r.add_argument("--name", default="laion400m")
    r.add_argument("--split", default="full")
    r.add_argument("--dry-run", action="store_true")
    r.set_defaults(fn=cmd_rename)

    s = sub.add_parser("smoke")
    s.add_argument("--pattern", required=True)
    s.add_argument("-n", type=int, default=3)
    s.set_defaults(fn=cmd_smoke)

    w = sub.add_parser("convert-webdataset")
    w.add_argument("--pattern", required=True)
    w.add_argument("--out-dir", required=True)
    w.add_argument("--name", default="laion400m")
    w.add_argument("--split", default="full")
    w.set_defaults(fn=cmd_convert_webdataset)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
