"""Contrastive evaluator: validation loss + in-batch retrieval accuracy.

Training-health monitor (reference:
clipa_jax/evaluators/proj/image_text/contrastive.py:52-107): streams a
held-out image-text split once, computes the bidirectional InfoNCE loss and
the fraction of examples whose best match within the evaluation batch is the
true pair. Masked (padding) examples are excluded.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from clipa_tpu import losses as losses_lib
from clipa_tpu import registry
from clipa_tpu.data import core as data_core
from clipa_tpu.data import pipeline as pipeline_lib
from clipa_tpu.parallel import mesh as mesh_lib


class Evaluator:
    def __init__(self, predict_fn: Callable, mesh, *, batch_size: int = 256,
                 data: Optional[dict] = None, source=None, pp: str = "",
                 use_global_batch: bool = True, num_workers: int = 8):
        self.mesh = mesh
        self.batch_size = batch_size
        self.num_workers = num_workers
        self.source = source or data_core.get_source(**dict(data or {}))
        self.pp_fn = registry.get_preprocess_fn(pp)

        def eval_batch(params, image, labels, mask):
            zimg, ztxt, out = predict_fn(params, image, labels)
            l, extras = losses_lib.bidirectional_contrastive_loss(
                zimg, ztxt, out["t"], mask=mask, reduction=False)
            return (jnp.sum(l * mask),
                    jnp.sum(extras["ncorrect"] * mask),
                    jnp.sum(mask))

        # replicated scalar outputs: device_get is multi-host safe
        self._eval_jit = jax.jit(
            eval_batch, out_shardings=mesh_lib.replicated_sharding(mesh))

    def run(self, params):
        def pp(sample):
            out = self.pp_fn(dict(sample))
            return {"image": out["image"], "labels": out["labels"]}

        batches, _ = pipeline_lib.make_for_inference(
            self.source, pp, self.batch_size, num_workers=self.num_workers)

        loss_sum = ncorrect = count = 0.0
        for batch in batches:
            g = mesh_lib.local_batch_to_global(batch, self.mesh)
            l, nc, n = jax.device_get(self._eval_jit(
                params, g["image"], g["labels"],
                g["_mask"].astype(jnp.float32)))
            loss_sum += float(l)
            ncorrect += float(nc)
            count += float(n)
        return [("loss", loss_sum / max(count, 1)),
                ("ncorrect", ncorrect / max(count, 1))]
