"""Image<->text retrieval evaluator (COCO/Flickr-style Recall@K).

Reference behavior (clipa_jax/evaluators/proj/image_text/retrieval.py:152-293
and image_text_retrieval.py:26-88): each image carries several captions;
captions are unrolled into their own examples carrying the parent image id;
all images and all captions are embedded once; ranking on the host gives
Recall@{1,5,10} in both directions. txt2img: a caption is correct at K if
its parent image ranks in the top K. img2txt: an image is correct at K if
ANY of its captions ranks in the top K.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import numpy as np

from clipa_tpu import registry
from clipa_tpu.data import core as data_core
from clipa_tpu.data import pipeline as pipeline_lib
from clipa_tpu.parallel import mesh as mesh_lib


def image_to_text_retrieval_eval(similarity: np.ndarray,
                                 text_image_ids: np.ndarray,
                                 ks: Sequence[int] = (1, 5, 10)) -> dict:
    """similarity: (n_img, n_txt); text_image_ids: parent image per caption."""
    ranks = np.argsort(-similarity, axis=1)  # (n_img, n_txt) caption indices
    out = {}
    image_ids = np.unique(text_image_ids)
    id_of_row = image_ids  # row i of similarity corresponds to image_ids[i]
    for k in ks:
        hits = 0
        for row, img_id in enumerate(id_of_row):
            top = text_image_ids[ranks[row, :k]]
            hits += bool(np.any(top == img_id))
        out[f"Recall@{k}"] = hits / len(id_of_row)
    return out


def text_to_image_retrieval_eval(similarity: np.ndarray,
                                 text_image_ids: np.ndarray,
                                 ks: Sequence[int] = (1, 5, 10)) -> dict:
    """similarity: (n_img, n_txt) — ranks images for each caption."""
    image_ids = np.unique(text_image_ids)
    ranks = np.argsort(-similarity.T, axis=1)  # (n_txt, n_img) image rows
    out = {}
    for k in ks:
        top_ids = image_ids[ranks[:, :k]]
        hits = np.any(top_ids == text_image_ids[:, None], axis=1)
        out[f"Recall@{k}"] = float(hits.mean())
    return out


class Evaluator:
    def __init__(self, predict_fn: Callable, mesh, *, batch_size: int = 256,
                 data: Optional[dict] = None, source=None,
                 pp_img: str = "", pp_txt: str = "",
                 txt_name: str = "texts", image_key: str = "image",
                 ks: Sequence[int] = (1, 5, 10), num_workers: int = 8):
        self.mesh = mesh
        self.batch_size = batch_size
        self.num_workers = num_workers
        self.ks = tuple(ks)
        self.txt_name = txt_name
        self.image_key = image_key
        self.source = source or data_core.get_source(**dict(data or {}))
        self.pp_img_fn = registry.get_preprocess_fn(pp_img)
        self.pp_txt_fn = registry.get_preprocess_fn(pp_txt)

        def embed_images(params, image):
            zimg, _, _ = predict_fn(params, image, None)
            return zimg

        def embed_texts(params, labels):
            _, ztxt, _ = predict_fn(params, None, labels)
            return ztxt

        self._embed_images = jax.jit(embed_images)
        self._embed_texts = jax.jit(embed_texts)

    def _embed_all(self, params) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Embeds every image once and every caption (unrolled) once."""
        img_embs, txt_embs, txt_img_ids = [], [], []

        def pp_image(sample):
            out = self.pp_img_fn(dict(sample))
            return {"image": out["image"]}

        batches, _ = pipeline_lib.make_for_inference(
            self.source, pp_image, self.batch_size,
            num_workers=self.num_workers)
        masks = []
        for batch in batches:
            g = mesh_lib.local_batch_to_global(batch, self.mesh)
            img_embs.append(np.asarray(jax.device_get(
                self._embed_images(params, g["image"]))))
            masks.append(np.asarray(jax.device_get(g["_mask"])))
        zimg = np.concatenate(img_embs)[np.concatenate(masks).astype(bool)]

        # caption unrolling on the host (ragged); batch-embed the captions
        tokens, ids = [], []
        for img_id, sample in enumerate(
                self.source.iter_process_shard(repeat=False)):
            caps = sample[self.txt_name]
            caps = caps if isinstance(caps, (list, tuple)) else [caps]
            for cap in caps:
                out = self.pp_txt_fn({"texts": cap})
                tokens.append(out["labels"])
                ids.append(img_id)
        tokens = np.stack(tokens)
        ids = np.asarray(ids)

        bs = self.batch_size
        padded = -(-len(tokens) // bs) * bs
        tokens_p = np.pad(tokens, ((0, padded - len(tokens)), (0, 0)))
        for i in range(0, padded, bs):
            g = mesh_lib.local_batch_to_global(
                {"labels": tokens_p[i:i + bs]}, self.mesh)
            txt_embs.append(np.asarray(jax.device_get(
                self._embed_texts(params, g["labels"]))))
        ztxt = np.concatenate(txt_embs)[:len(tokens)]
        return zimg, ztxt, ids

    def run(self, params):
        zimg, ztxt, text_image_ids = self._embed_all(params)
        similarity = zimg @ ztxt.T
        results = []
        for k, v in image_to_text_retrieval_eval(
                similarity, text_image_ids, self.ks).items():
            results.append((f"img2txt/{k}", v))
        for k, v in text_to_image_retrieval_eval(
                similarity, text_image_ids, self.ks).items():
            results.append((f"txt2img/{k}", v))
        return results
