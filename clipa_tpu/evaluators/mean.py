"""Mean-of-per-example-metrics evaluator.

Working rebuild of the reference's evaluator (clipa_jax/evaluators/
mean.py:37-90 — import-broken there, same `big_vision.*` imports as
classification.py, SURVEY §2.1 J23). Contract preserved:
`predict_fn(params, batch)` returns a mapping from metric name to a
per-example array shaped like the batch mask; this evaluator sums each
metric over unmasked examples (and across hosts — the jitted global sum
replaces the reference's pmap+psum) and reports sum / n_unmasked.

Usable directly for quick prototyping (hand it a lambda computing e.g.
per-example losses) or as a base for thin subclass evaluators, the two
uses the reference documents.
"""

from __future__ import annotations

from typing import Callable, Mapping, Optional

import jax
import jax.numpy as jnp

from clipa_tpu import registry
from clipa_tpu.data import core as data_core
from clipa_tpu.data import pipeline as pipeline_lib
from clipa_tpu.parallel import mesh as mesh_lib


class Evaluator:
    def __init__(self, predict_fn: Callable, mesh, *, batch_size: int = 256,
                 data: Optional[dict] = None, source=None, pp: str = "",
                 num_workers: int = 8):
        self.mesh = mesh
        self.batch_size = batch_size
        self.num_workers = num_workers
        self.source = source or data_core.get_source(**dict(data or {}))
        self.pp_fn = registry.get_preprocess_fn(pp)

        def eval_batch(params, batch, mask):
            metrics = predict_fn(params, batch)
            if not isinstance(metrics, Mapping):
                raise TypeError("mean.Evaluator's predict_fn must return a "
                                f"dict, got {type(metrics).__name__}")
            for k, y in metrics.items():
                if y.shape != mask.shape:
                    raise ValueError(
                        f"per-example metric {k!r} must have the batch shape "
                        f"{mask.shape}, got {y.shape}")
            sums = {k: jnp.sum(jnp.where(mask, y, 0))
                    for k, y in metrics.items()}
            sums["_mask"] = jnp.sum(mask)
            return sums

        self._eval_jit = jax.jit(
            eval_batch, out_shardings=mesh_lib.replicated_sharding(mesh))

    def run(self, params):
        batches, _ = pipeline_lib.make_for_inference(
            self.source, lambda s: self.pp_fn(dict(s)), self.batch_size,
            num_workers=self.num_workers)

        totals: dict = {}
        for batch in batches:
            g = mesh_lib.local_batch_to_global(batch, self.mesh)
            mask = g.pop("_mask")
            sums = jax.device_get(self._eval_jit(params, g, mask))
            for k, v in sums.items():
                totals[k] = totals.get(k, 0.0) + float(v)
        n = max(totals.pop("_mask", 0.0), 1)
        return [(k, v / n) for k, v in totals.items()]
