"""Few-shot linear-probe evaluator (closed-form L2-regularized regression).

Working replacement for the reference's fewshot_lsr evaluator, which ships
with broken big_vision imports (clipa_jax/evaluators/fewshot_lsr.py:23-26 —
SURVEY.md J23). Method: embed train/test splits once, solve multi-target
ridge regression against {-1, +1} one-vs-all targets via a single
eigendecomposition of the (padded) gram matrix, sweep the l2_reg grid for
free, report test accuracy at the best setting per (dataset, shots).
"""

from __future__ import annotations

import functools
from typing import Callable, Optional, Sequence

import jax
import numpy as np

from clipa_tpu import registry
from clipa_tpu.data import pipeline as pipeline_lib
from clipa_tpu.parallel import mesh as mesh_lib

BIAS_CONSTANT = 100.0


def _eig_cache(x: np.ndarray, y: np.ndarray):
    """Precomputes the eigendecomposition used for every l2_reg value."""
    mean = x.mean(axis=0, keepdims=True)
    std = x.std(axis=0, keepdims=True) + 1e-5
    x = (x - mean) / std
    x = np.pad(x, ((0, 0), (0, 1)), constant_values=BIAS_CONSTANT)
    eigs, q = np.linalg.eigh(x.T @ x)
    rhs = q.T @ (x.T @ y)
    return {"eigs": eigs, "q": q, "rhs": rhs, "mean": mean, "std": std,
            "x": x, "y": y}


def _gcv_score(cache: dict, w: np.ndarray, l2_reg: float) -> float:
    """Generalized cross-validation score for ridge on the TRAIN split —
    selects l2_reg without touching the test set (the reference's broken
    evaluator picked it on test: selection leak, round-1 Weak #9).
    GCV(λ) = n * RSS / (n - tr(S_λ))², tr(S_λ) = Σ eig/(eig+λ)."""
    n = cache["x"].shape[0]
    resid = cache["y"] - cache["x"] @ w
    rss = float(np.sum(resid ** 2))
    df = float(np.sum(cache["eigs"] / (cache["eigs"] + l2_reg)))
    denom = max(n - df, 1e-6)
    return n * rss / denom ** 2


def _solve(cache: dict, l2_reg: float) -> np.ndarray:
    scaling = 1.0 / (cache["eigs"] + l2_reg * np.ones_like(cache["eigs"]))
    return cache["q"] @ (scaling[:, None] * cache["rhs"])


def _predict(cache: dict, w: np.ndarray, x: np.ndarray) -> np.ndarray:
    x = (x - cache["mean"]) / cache["std"]
    x = np.pad(x, ((0, 0), (0, 1)), constant_values=BIAS_CONSTANT)
    return np.argmax(x @ w, axis=1)


class Evaluator:
    """Few-shot accuracy over {1,5,10,25}-shot subsets of labeled datasets."""

    def __init__(self, predict_fn: Callable, mesh, *, batch_size: int = 256,
                 datasets: Optional[dict] = None,
                 shots: Sequence[int] = (1, 5, 10, 25),
                 l2_regs: Sequence[float] = (2 ** 6, 2 ** 8, 2 ** 10, 2 ** 12),
                 pp: str = "", num_workers: int = 0, seed: int = 0):
        """datasets: {name: (train_source, test_source)} of labeled data."""
        self.mesh = mesh
        self.batch_size = batch_size
        self.datasets = datasets or {}
        self.shots = tuple(shots)
        self.l2_regs = tuple(l2_regs)
        self.num_workers = num_workers
        self.seed = seed
        self.pp_fn = registry.get_preprocess_fn(pp)

        # labels/mask travel through the jit program and come back
        # replicated: device_get never touches non-addressable shards
        # (multi-host safe), and every host sees the full split.
        def embed(params, image, label, mask):
            zimg, _, _ = predict_fn(params, image, None)
            return zimg, label, mask

        self._embed = jax.jit(
            embed, out_shardings=mesh_lib.replicated_sharding(mesh))

    def _embed_split(self, params, source):
        def pp(sample):
            out = self.pp_fn(dict(sample))
            return {"image": out["image"],
                    "label": np.asarray(out["label"], np.int32)}

        batches, _ = pipeline_lib.make_for_inference(
            source, pp, self.batch_size, num_workers=self.num_workers)
        zs, ys, masks = [], [], []
        for batch in batches:
            g = mesh_lib.local_batch_to_global(batch, self.mesh)
            z, y, m = jax.device_get(self._embed(
                params, g["image"], g["label"], g["_mask"]))
            zs.append(np.asarray(z))
            ys.append(np.asarray(y))
            masks.append(np.asarray(m))
        keep = np.concatenate(masks).astype(bool)
        return np.concatenate(zs)[keep], np.concatenate(ys)[keep]

    def run(self, params):
        results = []
        rng = np.random.default_rng(self.seed)
        for name, (train_src, test_src) in self.datasets.items():
            x_tr, y_tr = self._embed_split(params, train_src)
            x_te, y_te = self._embed_split(params, test_src)
            classes = np.unique(y_tr)
            for shots in self.shots:
                idx = []
                for c in classes:
                    rows = np.flatnonzero(y_tr == c)
                    take = min(shots, len(rows))
                    idx.extend(rng.permutation(rows)[:take])
                idx = np.asarray(idx)
                y_onehot = -np.ones((len(idx), len(classes)), np.float32)
                for j, c in enumerate(classes):
                    y_onehot[y_tr[idx] == c, j] = 1.0
                cache = _eig_cache(x_tr[idx], y_onehot)
                best_l2, best_gcv, best_w = None, np.inf, None
                for l2 in self.l2_regs:
                    w = _solve(cache, l2)
                    gcv = _gcv_score(cache, w, l2)
                    if gcv < best_gcv:
                        best_l2, best_gcv, best_w = l2, gcv, w
                pred = _predict(cache, best_w, x_te)
                acc = float((classes[pred] == y_te).mean())
                results.append((f"{name}/{shots}shot", acc))
        return results
