"""Zero-shot discriminative classifier — the headline CLIPA metric.

Behavioral parity with the reference evaluator
(clipa_jax/evaluators/proj/image_text/discriminative_classifier.py:174-472):

  * class texts = canonicalized class names x prompt templates (80
    CLIP-paper prompts), embedded and averaged per class then re-normalized,
  * class aliases separated by "," (first_class_name_only),
  * images streamed once with zero-padding + `_mask`, predictions =
    argmax(zimg @ ztxt.T), multi-label correctness (a prediction counts if
    it hits ANY of the example's labels),
  * metric key `{dataset}_accuracy`.

SPMD design difference: instead of the reference's per-host class-name
sharding + pmap + psum (discriminative_classifier.py:121-149,303-333), the
prompt set is split contiguously across processes (each host tokenizes only
its share), batches are globally sharded, and every jit program returns
**replicated** outputs — prompt embeddings travel with their (owner, mask)
ids through the program, so accumulation on the host is order-independent
and `jax.device_get` only ever touches fully-replicated arrays (safe on
real multi-host, where non-addressable shards cannot be fetched). The
correct/count reduction happens inside the jit program and comes back as
replicated scalars.

Normalization contract: the default `pp_img` yields **uint8** images — the
predict_fn (train/step.py:make_predict_fn) normalizes them on device with
the same ImageNet statistics the train step applies, so eval inputs are
identically distributed with training inputs (the reference's eval pp
always ends in vgg_value_range: clipa_jax/configs/clip_common.py:89-138).
A pp_img that applies its own value range emits float and is passed through.
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from clipa_tpu import registry
from clipa_tpu.data import core as data_core
from clipa_tpu.data import pipeline as pipeline_lib
from clipa_tpu.evaluators import prompts
from clipa_tpu.parallel import mesh as mesh_lib


def build_prompts(names, templates):
    """(class names, templates) -> (texts, owner) prompt lists.

    Classes may carry comma-separated aliases: every (alias, template) pair
    contributes one prompt owned by the class; the class embedding is the
    mean over all of them (reference discriminative_classifier.py:155-171
    averages template embeddings per class name the same way).
    """
    texts, owner = [], []
    for ci, name in enumerate(names):
        for alias in [a.strip() for a in name.split(",") if a.strip()]:
            for tpl in templates:
                texts.append(tpl.format(alias))
                owner.append(ci)
    return texts, owner


def shard_host_prompts(texts, owner, nproc: int, pidx: int, local_bs: int,
                       pp_txt_fn):
    """One host's contiguous, padded share of the prompt set.

    Every host pads its slice to the same `per_host` length (a multiple of
    its local batch) so all hosts step the same jit program the same number
    of times; `mask` zeroes the padding out of the accumulation. Tested at
    1000-class x 81-template cardinality in tests/test_evaluators.py.
    """
    total = len(texts)
    base = -(-total // nproc)                       # ceil per host
    per_host = -(-base // local_bs) * local_bs      # same on all hosts
    lo, hi = pidx * base, min((pidx + 1) * base, total)
    probe = pp_txt_fn({"texts": texts[0]})
    if "labels" not in probe:
        raise ValueError(
            "the zero-shot evaluator's pp_txt must tokenize prompts into a "
            "'labels' array (e.g. pp_txt='bert_tokenize(inkey=\"texts\", "
            "max_len=..., vocab_path=...)'); the configured pp_txt produced "
            f"keys {sorted(probe)}")
    tokens = np.zeros((per_host,) + tuple(probe["labels"].shape), np.int32)
    owner_loc = np.zeros((per_host,), np.int32)
    mask_loc = np.zeros((per_host,), np.int32)
    for j, gi in enumerate(range(lo, hi)):
        tokens[j] = pp_txt_fn({"texts": texts[gi]})["labels"]
        owner_loc[j] = owner[gi]
        mask_loc[j] = 1
    return tokens, owner_loc, mask_loc


class Evaluator:
    def __init__(self, predict_fn: Callable, mesh, *, batch_size: int = 256,
                 dataset_names: Sequence[str] = ("imagenet2012",),
                 data_dir: Optional[str] = None,
                 split: str = "validation",
                 class_names=None,
                 prompt_templates: str = "clip_paper",
                 canonicalize: bool = True,
                 pp_img: str = 'resize_small(256, method="bilinear")|'
                               'central_crop(224)',
                 pp_txt: str = "",
                 first_class_name_only: bool = True,
                 sources: Optional[dict] = None,
                 dataset_specs: Optional[dict] = None,
                 max_labels: int = 1,
                 num_workers: int = 8):
        self.mesh = mesh
        self.batch_size = batch_size
        self.max_labels = max_labels
        self.num_workers = num_workers
        self.pp_img_fn = registry.get_preprocess_fn(pp_img)
        self.pp_txt_fn = registry.get_preprocess_fn(pp_txt)
        self.datasets = {}
        for name in dataset_names:
            names = prompts.get_class_names(
                name, source=class_names, do_canonicalize=canonicalize)
            if first_class_name_only:
                names = [n.split(",")[0].strip() for n in names]
            # else: comma-separated aliases all contribute prompts and are
            # averaged into one class embedding (reference semantics).
            # IN-A / IN-R evaluate against 200-class subsets: restrict the
            # classifier to those classes and remap dataset labels onto them.
            subset = prompts.get_label_subset(name)
            if subset is not None:
                names = [names[i] for i in subset]
            if sources and name in sources:
                source = sources[name]
            else:
                spec = (dataset_specs or {}).get(
                    name, {"name": "tfrecord",
                           "pattern": f"{data_dir}/{name}*{split}*"})
                source = data_core.get_source(**spec)
            self.datasets[name] = {
                "class_names": names,
                "templates": prompts.get_prompt_templates(
                    prompt_templates, do_canonicalize=canonicalize),
                "source": source,
            }

        # jitted programs (shared across datasets; shapes are static per
        # batch size so each compiles once). All outputs are replicated so
        # device_get works on every host (multi-host safe).
        replicated = mesh_lib.replicated_sharding(mesh)

        def embed_texts(params, labels, owner, mask):
            _, ztxt, _ = predict_fn(params, None, labels)
            return ztxt, owner, mask

        def count_correct(params, image, ztxt, labels, mask):
            zimg, _, _ = predict_fn(params, image, None)
            logits = jnp.dot(zimg, ztxt.T,
                             precision=jax.lax.Precision.HIGHEST)
            pred = jnp.argmax(logits, axis=-1)
            hit = jnp.any(pred[:, None] == labels, axis=-1)
            return jnp.sum(hit * mask), jnp.sum(mask)

        self._embed_texts_jit = jax.jit(embed_texts,
                                        out_shardings=replicated)
        self._count_correct_jit = jax.jit(count_correct,
                                          out_shardings=replicated)

    # ------------------------------------------------------------------ text
    def _class_embeddings(self, params, dataset_name: str) -> jax.Array:
        ds = self.datasets[dataset_name]
        names, templates = ds["class_names"], ds["templates"]
        n_class = len(names)

        texts, owner = build_prompts(names, templates)

        # Shard the prompt set contiguously across processes: each host
        # tokenizes only its share (the reference shards class names per
        # host, discriminative_classifier.py:121-149). Every host pads its
        # slice to the same length so all hosts step the same program.
        nproc, pidx = jax.process_count(), jax.process_index()
        if self.batch_size % nproc:
            raise ValueError(f"eval batch_size {self.batch_size} must "
                             f"divide process count {nproc}")
        local_bs = self.batch_size // nproc
        tokens, owner_loc, mask_loc = shard_host_prompts(
            texts, owner, nproc, pidx, local_bs, self.pp_txt_fn)

        z = np.zeros((n_class, 0), np.float32)  # resized on first batch
        counts = np.zeros((n_class,), np.int64)
        for i in range(0, len(tokens), local_bs):
            batch = mesh_lib.local_batch_to_global(
                {"labels": tokens[i:i + local_bs],
                 "owner": owner_loc[i:i + local_bs],
                 "mask": mask_loc[i:i + local_bs]}, self.mesh)
            ztxt, ow, m = jax.device_get(self._embed_texts_jit(
                params, batch["labels"], batch["owner"], batch["mask"]))
            if z.shape[1] == 0:
                z = np.zeros((n_class, ztxt.shape[-1]), np.float32)
            keep = np.asarray(m).astype(bool)
            np.add.at(z, np.asarray(ow)[keep], np.asarray(ztxt)[keep])
            counts += np.bincount(np.asarray(ow)[keep], minlength=n_class)
        z /= np.maximum(counts, 1)[:, None]
        z /= np.linalg.norm(z, axis=-1, keepdims=True) + 1e-8
        return z.astype(np.float32)

    # ----------------------------------------------------------------- image
    def evaluate(self, params, dataset_name: str) -> dict:
        ds = self.datasets[dataset_name]
        ztxt = jax.device_put(self._class_embeddings(params, dataset_name),
                              mesh_lib.replicated_sharding(self.mesh))

        def pp(sample):
            out = self.pp_img_fn(dict(sample))
            # Multi-label sets (e.g. "are we done with imagenet" protocol)
            # may attach a ragged list of valid labels; pad to a fixed width
            # with -1 (never a valid class index) so batches stack.
            label = np.asarray(out.get("label", -1)).reshape(-1)
            if label.shape[0] < self.max_labels:
                label = np.pad(label, (0, self.max_labels - label.shape[0]),
                               constant_values=-1)
            return {"image": out["image"], "label": label[:self.max_labels]}

        batches, _ = pipeline_lib.make_for_inference(
            ds["source"], pp, self.batch_size, num_workers=self.num_workers)

        correct, count = 0, 0
        for batch in batches:
            gbatch = mesh_lib.local_batch_to_global(batch, self.mesh)
            c, n = jax.device_get(self._count_correct_jit(
                params, gbatch["image"], ztxt, gbatch["label"],
                gbatch["_mask"]))
            correct += int(c)
            count += int(n)
        return {"accuracy": correct / max(count, 1), "correct": correct,
                "count": count}

    def run(self, params):
        return [(f"{name}_accuracy", self.evaluate(params, name)["accuracy"])
                for name in self.datasets]
