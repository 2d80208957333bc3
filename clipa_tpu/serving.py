"""Batch inference / serving.

The reference stops at training + eval scripts; production use of a CLIP
model is embedding extraction at scale. This module provides:

  * :class:`EmbeddingService` — a warm jitted encoder pair with fixed batch
    buckets (pad-to-bucket keeps one compiled program per bucket; no
    recompiles at serving time), uint8 image intake (device-side
    normalization), threaded host preprocessing.
  * a CLI that embeds a directory of images and/or a text file of captions
    into .npy matrices:

      python -m clipa_tpu.serving --model ViT-H-14-CL32-GAP-BigVision \
          --pretrained /ckpt/params.npz --vocab /data/vocab.txt \
          --images '/data/*.jpg' --texts captions.txt --out /tmp/emb
"""

from __future__ import annotations

import argparse
import glob
import os
from concurrent.futures import ThreadPoolExecutor
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


class EmbeddingService:
    """Warm CLIP encoders with bucketed batching."""

    def __init__(self, model_name: str, pretrained: str, *,
                 vocab_path: Optional[str] = None,
                 image_size: Optional[int] = None,
                 precision: str = "bfloat16",
                 buckets: Sequence[int] = (8, 64, 256),
                 num_workers: int = 8):
        from clipa_tpu.compat import openclip
        from clipa_tpu.ops import preprocess

        self.clip = openclip.create_model(model_name, pretrained,
                                          force_image_size=image_size,
                                          precision=precision)
        self.tokenizer = openclip.get_tokenizer(
            model_name, vocab_path=vocab_path) if vocab_path else None
        self.buckets = tuple(sorted(buckets))
        self.image_size = self.clip.image_size
        self._pool = (ThreadPoolExecutor(max_workers=num_workers)
                      if num_workers > 0 else None)

        model = self.clip.model

        def embed_images(params, images_uint8):
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

    def _run_bucketed(self, fn, arrays: np.ndarray) -> np.ndarray:
        """Runs fn over bucket-padded chunks; one compile per bucket size."""
        out = []
        i, n = 0, arrays.shape[0]
        while i < n:
            remaining = n - i
            b = self._bucket(remaining)
            take = min(remaining, b)
            chunk = arrays[i:i + take]
            if take < b:
                pad = np.zeros((b - take, *chunk.shape[1:]), chunk.dtype)
                chunk = np.concatenate([chunk, pad])
            z = np.asarray(jax.device_get(fn(self.clip.params,
                                             jnp.asarray(chunk))))
            out.append(z[:take])
            i += take
        return np.concatenate(out) if out else np.zeros((0,))

    # ------------------------------------------------------------------ API
    def embed_images(self, images) -> np.ndarray:
        """images: (N, H, W, 3) uint8 array, or an iterable of file paths /
        JPEG bytes (decoded + center-cropped on host threads)."""
        if not isinstance(images, np.ndarray):
            mapper = self._pool.map if self._pool else map
            images = np.stack(list(mapper(self._load_image, images)))
        return self._run_bucketed(self._embed_images, images)

    def embed_texts(self, texts: Sequence[str]) -> np.ndarray:
        if self.tokenizer is None:
            raise ValueError("construct with vocab_path= to embed texts")
        tokens = self.tokenizer(list(texts))
        return self._run_bucketed(self._embed_texts, tokens)

    def similarity(self, images, texts) -> np.ndarray:
        zimg = self.embed_images(images)
        ztxt = self.embed_texts(texts)
        return zimg @ ztxt.T * float(np.asarray(self.clip.logit_scale))

    def _load_image(self, item) -> np.ndarray:
        from clipa_tpu.registry import get_preprocess_fn
        pp = get_preprocess_fn(
            f'decode|resize_small({self.image_size}, method="bilinear")|'
            f'central_crop({self.image_size})')
        if isinstance(item, (str, os.PathLike)):
            with open(item, "rb") as f:
                item = f.read()
        return pp({"image": item})["image"]


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--model", required=True)
    p.add_argument("--pretrained", required=True)
    p.add_argument("--vocab", default=None)
    p.add_argument("--images", default=None, help="glob of image files")
    p.add_argument("--texts", default=None, help="file with one caption/line")
    p.add_argument("--out", required=True, help="output directory")
    p.add_argument("--image-size", type=int, default=None)
    args = p.parse_args(argv)

    svc = EmbeddingService(args.model, args.pretrained,
                           vocab_path=args.vocab,
                           image_size=args.image_size)
    os.makedirs(args.out, exist_ok=True)
    if args.images:
        files = sorted(glob.glob(args.images))
        z = svc.embed_images(files)
        np.save(os.path.join(args.out, "image_embeddings.npy"), z)
        with open(os.path.join(args.out, "image_files.txt"), "w") as f:
            f.write("\n".join(files))
        print(f"embedded {len(files)} images -> {z.shape}")
    if args.texts:
        with open(args.texts) as f:
            texts = [line.rstrip("\n") for line in f if line.strip()]
        z = svc.embed_texts(texts)
        np.save(os.path.join(args.out, "text_embeddings.npy"), z)
        print(f"embedded {len(texts)} texts -> {z.shape}")


if __name__ == "__main__":
    main()
