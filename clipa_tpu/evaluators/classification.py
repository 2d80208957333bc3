"""Supervised classification evaluator: loss + prec@1 on labeled data.

Working rebuild of the reference's evaluator (clipa_jax/evaluators/
classification.py:36-90 — which is import-broken there: it imports
`big_vision.*` modules that do not exist in the repo, SURVEY §2.1 J23).
Semantics preserved: labels arrive one/multi-hot under `label_key`,
examples whose label row is all-zero are excluded (mask *= labels.max()),
top-1 correctness is the label value at the argmax logit (so multi-hot
rows count any hot class as correct), and the per-example loss is
`loss_name` from clipa_tpu.losses (softmax_xent | sigmoid_xent |
bce_logits | weighted_softmax_xent) with reduction=False.

The predict fn is resolved the way the reference unpacks it
(`logits, *_ = predict_fn(params, **batch)`): a bare array is used
directly, a tuple/list contributes its first element, and a mapping
contributes `out["logits"]`.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from clipa_tpu import losses as losses_lib
from clipa_tpu import registry
from clipa_tpu.data import core as data_core
from clipa_tpu.data import pipeline as pipeline_lib
from clipa_tpu.parallel import mesh as mesh_lib


def _resolve_logits(out):
    if isinstance(out, (tuple, list)):
        out = out[0]
    if hasattr(out, "get") and not hasattr(out, "ndim"):
        out = out["logits"]
    return out


class Evaluator:
    def __init__(self, predict_fn: Callable, mesh, *, batch_size: int = 256,
                 data: Optional[dict] = None, source=None, pp: str = "",
                 loss_name: str = "softmax_xent", label_key: str = "labels",
                 num_workers: int = 8):
        self.mesh = mesh
        self.batch_size = batch_size
        self.num_workers = num_workers
        self.label_key = label_key
        self.source = source or data_core.get_source(**dict(data or {}))
        self.pp_fn = registry.get_preprocess_fn(pp)
        loss = getattr(losses_lib, loss_name)

        def eval_batch(params, batch, labels, mask):
            logits = _resolve_logits(predict_fn(params, **batch))
            # Ignore entries whose label row is all zeros (reference
            # clipa_jax/evaluators/classification.py:44).
            mask = mask * jnp.max(labels, axis=1)
            losses = loss(logits=logits, labels=labels, reduction=False)
            top1_idx = jnp.argmax(logits, axis=1)
            top1_correct = jnp.take_along_axis(
                labels, top1_idx[:, None], axis=1)[:, 0]
            return (jnp.sum(top1_correct * mask),
                    jnp.sum(losses * mask),
                    jnp.sum(mask))

        # replicated scalar outputs: device_get is multi-host safe
        self._eval_jit = jax.jit(
            eval_batch, out_shardings=mesh_lib.replicated_sharding(mesh))

    def run(self, params):
        batches, _ = pipeline_lib.make_for_inference(
            self.source, lambda s: self.pp_fn(dict(s)), self.batch_size,
            num_workers=self.num_workers)

        ncorrect = loss_sum = count = 0.0
        for batch in batches:
            g = mesh_lib.local_batch_to_global(batch, self.mesh)
            labels = g.pop(self.label_key)
            mask = g.pop("_mask").astype(jnp.float32)
            nc, l, n = jax.device_get(
                self._eval_jit(params, g, labels, mask))
            ncorrect += float(nc)
            loss_sum += float(l)
            count += float(n)
        return [("prec@1", ncorrect / max(count, 1)),
                ("loss", loss_sum / max(count, 1))]
