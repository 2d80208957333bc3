"""Batch inference / serving.

The reference stops at training + eval scripts; production use of a CLIP
model is embedding extraction at scale. This module provides:

  * :class:`EmbeddingService` — a warm jitted encoder pair with fixed batch
    buckets (pad-to-bucket keeps one compiled program per bucket; no
    recompiles at serving time), uint8 image intake (device-side
    normalization), threaded host preprocessing, data-parallel sharding
    over every local chip (`jax.sharding.Mesh`), and a two-deep dispatch
    pipeline so host decode/transfer of chunk i+1 overlaps device compute
    of chunk i.
  * streaming extraction (:meth:`EmbeddingService.embed_images_to` /
    :meth:`embed_texts_to`) — embeddings land incrementally in a
    memory-mapped ``.npy`` or a TensorStore zarr array, so corpus size is
    bounded by disk, not host RAM.
  * :class:`MultiModelService` — several checkpoints warm behind one
    object, lazily constructed, with an LRU cap bounding live HBM.
  * a CLI that embeds a directory of images and/or a text file of captions:

      python -m clipa_tpu.serving --model ViT-H-14-CL32-GAP-BigVision \
          --pretrained /ckpt/params.npz --vocab /data/vocab.txt \
          --images '/data/*.jpg' --texts captions.txt --out /tmp/emb
"""

from __future__ import annotations

import argparse
import collections
import glob
import os
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# --------------------------------------------------------------------------
# Streaming writers
# --------------------------------------------------------------------------

class MemmapWriter:
    """Row-streaming writer into a memory-mapped .npy of known length."""

    def __init__(self, path: str, num_rows: int, dim: int,
                 dtype: str = "float32"):
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        self._arr = np.lib.format.open_memmap(
            path, mode="w+", dtype=np.dtype(dtype), shape=(num_rows, dim))
        self._row = 0
        self.path = path

    def write(self, block: np.ndarray) -> None:
        n = block.shape[0]
        self._arr[self._row:self._row + n] = block
        self._row += n

    def close(self) -> None:
        self._arr.flush()
        # Release the mmap so the file is complete on disk.
        del self._arr

    @property
    def rows_written(self) -> int:
        return self._row


class TensorStoreWriter:
    """Row-streaming writer into a chunked zarr array (via tensorstore).

    Zarr chunks land on disk as they complete, so downstream consumers
    (ANN index builders, dataloaders) can start reading a partially
    written corpus; the same spec opens on gs:// in a real deployment.
    """

    def __init__(self, path: str, num_rows: int, dim: int,
                 dtype: str = "float32", chunk_rows: int = 8192):
        import tensorstore as ts
        self._ts = ts
        self._store = ts.open({
            "driver": "zarr",
            "kvstore": {"driver": "file", "path": os.path.abspath(path)},
            "metadata": {
                "shape": [num_rows, dim],
                "chunks": [min(chunk_rows, num_rows or 1), dim],
                "dtype": np.dtype(dtype).str,
            },
            "create": True,
            "delete_existing": True,
        }).result()
        self._row = 0
        self._pending = []
        self.path = path

    def write(self, block: np.ndarray) -> None:
        n = block.shape[0]
        # Async writes; completion collected at close().
        self._pending.append(
            self._store[self._row:self._row + n, :].write(block))
        self._row += n

    def close(self) -> None:
        for fut in self._pending:
            fut.result()
        self._pending.clear()

    @property
    def rows_written(self) -> int:
        return self._row


def _make_writer(path: str, fmt: str, num_rows: int, dim: int):
    if fmt == "npy":
        return MemmapWriter(path, num_rows, dim)
    if fmt == "zarr":
        return TensorStoreWriter(path, num_rows, dim)
    raise ValueError(f"unknown embedding store format {fmt!r} "
                     "(expected 'npy' or 'zarr')")


# --------------------------------------------------------------------------
# Embedding service
# --------------------------------------------------------------------------

class EmbeddingService:
    """Warm CLIP encoders: bucketed batching, sharded over local chips."""

    def __init__(self, model_name: str, pretrained: str, *,
                 vocab_path: Optional[str] = None,
                 image_size: Optional[int] = None,
                 precision: str = "bfloat16",
                 buckets: Sequence[int] = (8, 64, 256),
                 num_workers: int = 8,
                 devices: Optional[Sequence] = None):
        from clipa_tpu.compat import openclip
        from clipa_tpu.parallel import mesh as mesh_lib

        self.clip = openclip.create_model(model_name, pretrained,
                                          force_image_size=image_size,
                                          precision=precision)
        self.tokenizer = openclip.get_tokenizer(
            model_name, vocab_path=vocab_path) if vocab_path else None
        self.image_size = self.clip.image_size
        self._pool = (ThreadPoolExecutor(max_workers=num_workers)
                      if num_workers > 0 else None)

        # Data-parallel mesh over all (or the given) local devices. Params
        # are replicated; each bucket is split along dim 0, so a pod host
        # with 4 chips serves 4x the single-chip rate from the same object.
        self.mesh = mesh_lib.create_mesh(devices=devices)
        self._batch_sharding = mesh_lib.batch_sharding(self.mesh)
        n_dev = self.mesh.devices.size
        # Buckets must split evenly over the mesh; round up (padding to the
        # bucket already preserves results, see test_bucketing_consistency).
        self.buckets = tuple(sorted({-(-b // n_dev) * n_dev
                                     for b in buckets}))
        self.params = jax.device_put(
            self.clip.params, mesh_lib.replicated_sharding(self.mesh))

        model = self.clip.model

        def embed_images(params, images_uint8):
            from clipa_tpu.ops import preprocess
            x = preprocess.normalize_uint8(images_uint8)
            zimg, _, _ = model.apply({"params": params}, x, None)
            return zimg

        def embed_texts(params, tokens):
            _, ztxt, _ = model.apply({"params": params}, None, tokens)
            return ztxt

        self._embed_images = jax.jit(embed_images)
        self._embed_texts = jax.jit(embed_texts)

    def _bucket(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        return self.buckets[-1]

    def _chunks(self, arrays: np.ndarray) -> Iterator[Tuple[np.ndarray, int]]:
        """Yields (bucket-padded chunk, valid row count)."""
        i, n = 0, arrays.shape[0]
        while i < n:
            b = self._bucket(n - i)
            take = min(n - i, b)
            chunk = arrays[i:i + take]
            if take < b:
                pad = np.zeros((b - take, *chunk.shape[1:]), chunk.dtype)
                chunk = np.concatenate([chunk, pad])
            yield chunk, take
            i += take

    def _dispatch(self, fn, chunk: np.ndarray):
        """Shards a host chunk over the mesh and dispatches (async)."""
        x = jax.device_put(np.asarray(chunk), self._batch_sharding)
        return fn(self.params, x)

    def _run_bucketed(self, fn, arrays: np.ndarray,
                      writer=None) -> Optional[np.ndarray]:
        """Runs fn over bucket-padded chunks, two dispatches in flight.

        With `writer`, rows stream to it and nothing accumulates in RAM;
        otherwise returns the stacked (N, C) matrix.
        """
        out = [] if writer is None else None
        pending = collections.deque()  # (device result, valid rows)

        def drain_one():
            z, take = pending.popleft()
            block = np.asarray(jax.device_get(z))[:take]
            if writer is None:
                out.append(block)
            else:
                writer.write(block)

        for chunk, take in self._chunks(arrays):
            pending.append((self._dispatch(fn, chunk), take))
            if len(pending) >= 2:   # keep host decode ahead of the device
                drain_one()
        while pending:
            drain_one()
        if writer is None:
            return np.concatenate(out) if out else np.zeros((0,))
        return None

    # ------------------------------------------------------------------ API
    def embed_images(self, images) -> np.ndarray:
        """images: (N, H, W, 3) uint8 array, or an iterable of file paths /
        JPEG bytes (decoded + center-cropped on host threads)."""
        images = self._load_images(images)
        return self._run_bucketed(self._embed_images, images)

    def embed_texts(self, texts: Sequence[str]) -> np.ndarray:
        return self._run_bucketed(self._embed_texts, self._tokenize(texts))

    def embed_images_to(self, images, path: str,
                        fmt: str = "npy") -> int:
        """Streams image embeddings to `path` (.npy memmap or zarr dir).

        Decode runs on host threads per chunk, so only one bucket of
        pixels (plus one in-flight device batch) is ever resident.
        Returns the number of rows written.
        """
        if isinstance(images, np.ndarray):
            n = images.shape[0]
            chunks_src = images
        else:
            images = list(images)
            n = len(images)
            chunks_src = _LazyImageLoader(self, images)
        writer = _make_writer(path, fmt, n, self.embed_dim)
        try:
            self._run_bucketed(self._embed_images, chunks_src, writer=writer)
        finally:
            writer.close()
        return n

    def embed_texts_to(self, texts: Sequence[str], path: str,
                       fmt: str = "npy") -> int:
        tokens = self._tokenize(texts)
        writer = _make_writer(path, fmt, tokens.shape[0], self.embed_dim)
        try:
            self._run_bucketed(self._embed_texts, tokens, writer=writer)
        finally:
            writer.close()
        return tokens.shape[0]

    def similarity(self, images, texts) -> np.ndarray:
        zimg = self.embed_images(images)
        ztxt = self.embed_texts(texts)
        return zimg @ ztxt.T * float(np.asarray(self.clip.logit_scale))

    @property
    def embed_dim(self) -> int:
        return int(self.clip.config["embed_dim"])

    # ------------------------------------------------------------ internals
    def _tokenize(self, texts: Sequence[str]) -> np.ndarray:
        if self.tokenizer is None:
            raise ValueError("construct with vocab_path= to embed texts")
        return np.asarray(self.tokenizer(list(texts)))

    def _load_images(self, images) -> np.ndarray:
        if isinstance(images, np.ndarray):
            return images
        mapper = self._pool.map if self._pool else map
        return np.stack(list(mapper(self._load_image, images)))

    def _load_image(self, item) -> np.ndarray:
        from clipa_tpu.registry import get_preprocess_fn
        pp = get_preprocess_fn(
            f'decode|resize_small({self.image_size}, method="bilinear")|'
            f'central_crop({self.image_size})')
        if isinstance(item, (str, os.PathLike)):
            with open(item, "rb") as f:
                item = f.read()
        return pp({"image": item})["image"]


class _LazyImageLoader:
    """Array-like over image paths/bytes: slicing decodes just that window
    (on the service's thread pool), so streaming extraction never holds
    more than one bucket of pixels."""

    def __init__(self, svc: EmbeddingService, items: list):
        self._svc = svc
        self._items = items
        self.shape = (len(items),)

    def __getitem__(self, idx):
        return self._svc._load_images(self._items[idx])


# --------------------------------------------------------------------------
# Multi-model service
# --------------------------------------------------------------------------

class MultiModelService:
    """Several models warm behind one object.

    Construct with ``{name: kwargs-for-EmbeddingService}``; services build
    lazily on first use and an LRU cap bounds how many stay live (evicted
    services release their params to the allocator).

        svc = MultiModelService({
            "clipa-h": dict(model_name="ViT-H-14-CL32-GAP-BigVision",
                            pretrained="/ckpt/h14.npz", vocab_path=VOCAB),
            "clipa-l": dict(model_name="ViT-L-16-CL16-GAP-BigVision",
                            pretrained="/ckpt/l16.npz", vocab_path=VOCAB),
        }, max_live=1)
        z = svc.embed_images("clipa-h", imgs)
    """

    def __init__(self, specs: dict, max_live: int = 2):
        if max_live < 1:
            raise ValueError("max_live must be >= 1")
        self._specs = dict(specs)
        self._max_live = max_live
        self._live = collections.OrderedDict()
        self._lock = threading.Lock()

    @property
    def names(self):
        return sorted(self._specs)

    def get(self, name: str) -> EmbeddingService:
        with self._lock:
            if name in self._live:
                self._live.move_to_end(name)
                return self._live[name]
            if name not in self._specs:
                raise KeyError(
                    f"unknown model {name!r}; registered: {self.names}")
            svc = EmbeddingService(**self._specs[name])
            self._live[name] = svc
            while len(self._live) > self._max_live:
                self._live.popitem(last=False)
            return svc

    def embed_images(self, name: str, images) -> np.ndarray:
        return self.get(name).embed_images(images)

    def embed_texts(self, name: str, texts) -> np.ndarray:
        return self.get(name).embed_texts(texts)

    def similarity(self, name: str, images, texts) -> np.ndarray:
        return self.get(name).similarity(images, texts)


# --------------------------------------------------------------------------
# CLI
# --------------------------------------------------------------------------

def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--model", required=True)
    p.add_argument("--pretrained", required=True)
    p.add_argument("--vocab", default=None)
    p.add_argument("--images", default=None, help="glob of image files")
    p.add_argument("--texts", default=None, help="file with one caption/line")
    p.add_argument("--out", required=True, help="output directory")
    p.add_argument("--image-size", type=int, default=None)
    p.add_argument("--format", default="npy", choices=("npy", "zarr"),
                   help="embedding store: streamed .npy memmap or zarr dir")
    args = p.parse_args(argv)

    svc = EmbeddingService(args.model, args.pretrained,
                           vocab_path=args.vocab,
                           image_size=args.image_size)
    os.makedirs(args.out, exist_ok=True)
    suffix = ".npy" if args.format == "npy" else ".zarr"
    if args.images:
        files = sorted(glob.glob(args.images))
        out_path = os.path.join(args.out, "image_embeddings" + suffix)
        n = svc.embed_images_to(files, out_path, fmt=args.format)
        with open(os.path.join(args.out, "image_files.txt"), "w") as f:
            f.write("\n".join(files))
        print(f"embedded {n} images -> {out_path}")
    if args.texts:
        with open(args.texts) as f:
            texts = [line.rstrip("\n") for line in f if line.strip()]
        out_path = os.path.join(args.out, "text_embeddings" + suffix)
        n = svc.embed_texts_to(texts, out_path, fmt=args.format)
        print(f"embedded {n} texts -> {out_path}")


if __name__ == "__main__":
    main()
