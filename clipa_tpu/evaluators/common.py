"""Evaluator factory: builds evaluators from `config.evals` entries.

Same contract as the reference (clipa_jax/evaluators/common.py:28-88): each
entry has a `type`, optional `pred` (which function from the fns dict to
use), `prefix`, `log_steps`, and type-specific kwargs. Returns a list of
(name, evaluator, log_steps, prefix).
"""

from __future__ import annotations

import importlib
from typing import Any, Callable

_TYPE_ALIASES = {
    "zeroshot_classifier": "clipa_tpu.evaluators.zeroshot",
    "proj.image_text.discriminative_classifier":
        "clipa_tpu.evaluators.zeroshot",
    "contrastive": "clipa_tpu.evaluators.contrastive",
    "proj.image_text.contrastive": "clipa_tpu.evaluators.contrastive",
    "retrieval": "clipa_tpu.evaluators.retrieval",
    "proj.image_text.retrieval": "clipa_tpu.evaluators.retrieval",
    "fewshot": "clipa_tpu.evaluators.fewshot",
    "fewshot_lsr": "clipa_tpu.evaluators.fewshot",
    "classification": "clipa_tpu.evaluators.classification",
    "mean": "clipa_tpu.evaluators.mean",
}

_CONTROL_KEYS = ("type", "pred", "prefix", "log_steps", "log_percent",
                 "log_examples", "log_epochs", "skip_first")


def from_config(config: Any, predict_fns: dict[str, Callable],
                mesh=None, total_steps: int = 0) -> list:
    """Builds [(name, evaluator, log_steps, prefix)] from config.evals.

    Eval cadence may be given in steps/examples/epochs/percent units
    (resolved like every other duration, reference: evaluators/common.py).
    """
    from clipa_tpu.config import steps as steps_cfg

    evaluators = []
    specs = dict(config.get("evals", {}))
    for name, cfg in specs.items():
        # Accept any mapping-like (our ConfigDict, ml_collections.ConfigDict
        # — which is neither a dict subclass nor registered as a Mapping —
        # plain dict): users coming from the reference write evals with
        # ml_collections; silently skipping those configs was a trap.
        if not hasattr(cfg, "items"):
            if cfg is not None:
                raise TypeError(
                    f"config.evals.{name} must be a mapping (got "
                    f"{type(cfg).__name__})")
            continue
        cfg = dict(cfg.items())
        module_name = cfg.pop("type", name)
        module = importlib.import_module(
            _TYPE_ALIASES.get(module_name, module_name))
        pred_key = cfg.pop("pred", "predict")
        prefix = cfg.pop("prefix", f"{name}/")
        log_steps = steps_cfg(
            "log", cfg, batch_size=config.get_path("input.batch_size"),
            total_steps=total_steps, default=None)
        for k in _CONTROL_KEYS:
            cfg.pop(k, None)
        cfg.setdefault("batch_size", config.get(
            "eval_batch_size", config.get_path("input.batch_size", 256)))
        evaluator = module.Evaluator(predict_fns[pred_key], mesh, **cfg)
        evaluators.append((name, evaluator, log_steps, prefix))
    return evaluators
