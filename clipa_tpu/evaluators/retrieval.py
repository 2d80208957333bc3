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
                                 ks: Sequence[int] = (1, 5, 10),
                                 image_row_ids=None) -> dict:
    """similarity: (n_img, n_txt); text_image_ids: parent image per caption;
    image_row_ids: the image id of each similarity row (defaults to sorted
    unique caption parents, the single-host layout)."""
    ranks = np.argsort(-similarity, axis=1)  # (n_img, n_txt) caption indices
    out = {}
    id_of_row = (np.unique(text_image_ids) if image_row_ids is None
                 else np.asarray(image_row_ids))
    for k in ks:
        hits = 0
        for row, img_id in enumerate(id_of_row):
            top = text_image_ids[ranks[row, :k]]
            hits += bool(np.any(top == img_id))
        out[f"Recall@{k}"] = hits / len(id_of_row)
    return out


def text_to_image_retrieval_eval(similarity: np.ndarray,
                                 text_image_ids: np.ndarray,
                                 ks: Sequence[int] = (1, 5, 10),
                                 image_row_ids=None) -> dict:
    """similarity: (n_img, n_txt) — ranks images for each caption."""
    image_ids = (np.unique(text_image_ids) if image_row_ids is None
                 else np.asarray(image_row_ids))
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

        # Replicated outputs: device_get is multi-host safe, and every host
        # sees all rows regardless of which host fed them. Image/caption ids
        # travel through the programs so host-side grouping never depends on
        # global batch-assembly order.
        replicated = mesh_lib.replicated_sharding(mesh)

        def embed_images(params, image, img_id, mask):
            zimg, _, _ = predict_fn(params, image, None)
            return zimg, img_id, mask

        def embed_texts(params, labels, img_id, mask):
            _, ztxt, _ = predict_fn(params, None, labels)
            return ztxt, img_id, mask

        self._embed_images = jax.jit(embed_images, out_shardings=replicated)
        self._embed_texts = jax.jit(embed_texts, out_shardings=replicated)

    def _embed_all(self, params):
        """Embeds every image once and every caption (unrolled) once.

        Globally-unique image ids are ordinal * nproc + process_index, so
        ids never collide across hosts."""
        nproc, pidx = jax.process_count(), jax.process_index()
        img_embs, img_ids, txt_embs, txt_ids = [], [], [], []

        def pp_image(sample):
            ordinal = int(sample["_ordinal"])
            out = self.pp_img_fn(dict(sample))
            return {"image": out["image"],
                    "img_id": np.asarray(ordinal * nproc + pidx, np.int32)}

        def source_with_ordinals():
            for ordinal, sample in enumerate(
                    self.source.iter_process_shard(repeat=False)):
                sample["_ordinal"] = ordinal
                yield sample

        class _WrappedSource(data_core.DataSource):
            total_examples = self.source.total_examples
            num_examples_per_process = self.source.num_examples_per_process

            def iter_process_shard(self, **kw):
                return source_with_ordinals()

        batches, _ = pipeline_lib.make_for_inference(
            _WrappedSource(), pp_image, self.batch_size,
            num_workers=self.num_workers)
        for batch in batches:
            g = mesh_lib.local_batch_to_global(batch, self.mesh)
            z, ids, m = jax.device_get(self._embed_images(
                params, g["image"], g["img_id"], g["_mask"]))
            keep = np.asarray(m).astype(bool)
            img_embs.append(np.asarray(z)[keep])
            img_ids.append(np.asarray(ids)[keep])
        zimg = np.concatenate(img_embs)
        image_row_ids = np.concatenate(img_ids)

        # caption unrolling on the host (ragged, local shard only);
        # batch-embed the captions with ids+mask through the program.
        tokens, ids = [], []
        for ordinal, sample in enumerate(
                self.source.iter_process_shard(repeat=False)):
            caps = sample[self.txt_name]
            caps = caps if isinstance(caps, (list, tuple)) else [caps]
            for cap in caps:
                out = self.pp_txt_fn({"texts": cap})
                tokens.append(out["labels"])
                ids.append(ordinal * nproc + pidx)
        tokens = np.stack(tokens)
        ids = np.asarray(ids, np.int32)

        if self.batch_size % nproc:
            raise ValueError(f"eval batch_size {self.batch_size} must "
                             f"divide process count {nproc}")
        local_bs = self.batch_size // nproc
        # all hosts must step the same number of batches
        n_local = len(tokens)
        n_steps = int(np.max(_allgather_host_counts(n_local, self.mesh)))
        n_steps = max(1, -(-n_steps // local_bs))
        padded = n_steps * local_bs
        tokens_p = np.zeros((padded,) + tokens.shape[1:], tokens.dtype)
        tokens_p[:n_local] = tokens
        ids_p = np.zeros((padded,), np.int32)
        ids_p[:n_local] = ids
        mask_p = np.zeros((padded,), np.int32)
        mask_p[:n_local] = 1
        for i in range(0, padded, local_bs):
            g = mesh_lib.local_batch_to_global(
                {"labels": tokens_p[i:i + local_bs],
                 "img_id": ids_p[i:i + local_bs],
                 "mask": mask_p[i:i + local_bs]}, self.mesh)
            z, tid, m = jax.device_get(self._embed_texts(
                params, g["labels"], g["img_id"], g["mask"]))
            keep = np.asarray(m).astype(bool)
            txt_embs.append(np.asarray(z)[keep])
            txt_ids.append(np.asarray(tid)[keep])
        ztxt = np.concatenate(txt_embs)
        text_image_ids = np.concatenate(txt_ids)
        return zimg, image_row_ids, ztxt, text_image_ids

    def run(self, params):
        zimg, image_row_ids, ztxt, text_image_ids = self._embed_all(params)
        similarity = zimg @ ztxt.T
        results = []
        for k, v in image_to_text_retrieval_eval(
                similarity, text_image_ids, self.ks,
                image_row_ids=image_row_ids).items():
            results.append((f"img2txt/{k}", v))
        for k, v in text_to_image_retrieval_eval(
                similarity, text_image_ids, self.ks,
                image_row_ids=image_row_ids).items():
            results.append((f"txt2img/{k}", v))
        return results


def _allgather_host_counts(n_local: int, mesh) -> np.ndarray:
    """Every host's local count (so all hosts can agree on max steps).
    Single-host: trivially [n_local] without touching the mesh."""
    if jax.process_count() == 1:
        return np.asarray([n_local])
    from jax.experimental import multihost_utils
    return np.asarray(multihost_utils.process_allgather(
        np.asarray([n_local])).reshape(-1))
