"""Pytree-by-name utilities.

The whole framework addresses parameters by flat slash-joined names
(`img/Transformer/encoderblock_0/LayerNorm_0/scale`): the optimizer factory
masks optax chains by regex over these names, checkpoints store them as npz
keys, and merge_params matches them across trees. Same naming contract as the
reference (clipa_jax/helpers/utils.py:452-651) so released npz checkpoints and
config regexes carry over.
"""

from __future__ import annotations

import re
from typing import Any, Callable, Sequence

import jax
import numpy as np


def tree_flatten_with_names(tree: Any) -> tuple[list[tuple[str, Any]], Any]:
    """Flattens a pytree into (name, leaf) pairs plus the tree structure.

    Names are slash-joined dict keys / sequence indices, in the same leaf
    order as ``jax.tree_util.tree_flatten``.
    """
    vals, tree_def = jax.tree_util.tree_flatten(tree)
    paths = jax.tree_util.tree_flatten_with_path(tree)[0]
    names = ["/".join(_key_str(k) for k in path) for path, _ in paths]
    return list(zip(names, vals)), tree_def


def _key_str(key) -> str:
    if hasattr(key, "key"):  # DictKey
        return str(key.key)
    if hasattr(key, "idx"):  # SequenceKey
        return str(key.idx)
    if hasattr(key, "name"):  # GetAttrKey / FlattenedIndexKey
        return str(key.name)
    return str(key)


def tree_map_with_names(f: Callable, tree: Any, *rest) -> Any:
    """Like tree_map but f also receives the flat name as first argument."""
    names_and_vals, tree_def = tree_flatten_with_names(tree)
    names, vals = zip(*names_and_vals) if names_and_vals else ((), ())
    rest_vals = [jax.tree_util.tree_flatten(t)[0] for t in rest]
    out = [f(name, v, *extra) for name, v, *extra in zip(names, vals, *rest_vals)]
    return jax.tree_util.tree_unflatten(tree_def, out)


def check_and_compile_patterns(patterns: Sequence) -> list[re.Pattern]:
    """Validates and compiles a list of regex patterns (str or compiled)."""
    out = []
    for p in patterns:
        if isinstance(p, str):
            out.append(re.compile(p))
        elif isinstance(p, re.Pattern):
            out.append(p)
        else:
            raise TypeError(f"Pattern must be str or re.Pattern, got {type(p)}")
    return out


def make_mask_trees(tree: Any, patterns: Sequence, log: str | None = None):
    """Returns one boolean pytree per pattern; first-match-wins over names."""
    compiled = check_and_compile_patterns(patterns)

    def matchfirst(name: str) -> list[bool]:
        matches = []
        for pat in compiled:
            matches.append(not any(matches) and bool(pat.fullmatch(name)))
        return matches

    multimask = tree_map_with_names(lambda name, _: matchfirst(name), tree)
    is_leaf = lambda x: isinstance(x, list)  # noqa: E731 — match lists whole
    return [jax.tree_util.tree_map(lambda m, i=i: m[i], multimask,
                                   is_leaf=is_leaf)
            for i in range(len(patterns))]


def recover_tree(keys: Sequence[str], values: Sequence[Any]) -> dict:
    """Rebuilds a nested dict from slash-joined keys (npz -> pytree).

    The inverse of tree_flatten_with_names' naming scheme — the key format
    ("img/Transformer/encoderblock_0/..." etc.) is the checkpoint-compat
    contract, shared with the reference's flat-npz layout.
    """
    tree: dict = {}
    for key, value in zip(keys, values):
        node = tree
        *parents, leaf = key.split("/")
        for part in parents:
            node = node.setdefault(part, {})
        node[leaf] = value
    return tree


def recover_dtype(a: np.ndarray) -> np.ndarray:
    """Recovers bfloat16 arrays that np.save stored as void bytes."""
    if hasattr(a, "dtype") and a.dtype.type is np.void:
        import ml_dtypes
        if a.dtype.itemsize != 2:
            raise ValueError(f"Unknown dtype to recover: {a.dtype}")
        return a.view(ml_dtypes.bfloat16)
    return a


def itstime(step: int, every_n: int | None, total_steps: int,
            host: int | None = None, last: bool = True,
            first: bool = True) -> bool:
    """Scheduling predicate: is `step` a multiple of every_n / first / last?"""
    if every_n is None or every_n <= 0:
        return False
    if host is not None and jax.process_index() != host:
        return False
    is_last = last and step == total_steps
    is_first = first and step == 1
    return is_first or is_last or step % every_n == 0


def pad_shard_unpad(wrapped: Callable, static_argnums=(0,),
                    static_argnames=()):
    """Wraps a fn so host batches of any size run through a fixed-size program.

    Pads the batch up to a multiple of the global device batch, runs the
    wrapped (jitted) fn, and slices the padding back off. Used by evaluators
    on the final partial batch.
    """
    import functools

    @functools.wraps(wrapped)
    def pad_shard_unpad_wrapper(*args, min_device_batch=None, **kw):
        nd = jax.device_count()
        batch_sizes = {a.shape[0] for i, a in enumerate(args)
                       if i not in static_argnums and hasattr(a, "shape")}
        batch_sizes |= {v.shape[0] for k, v in kw.items()
                        if k not in static_argnames and hasattr(v, "shape")}
        assert len(batch_sizes) == 1, f"Inconsistent batch sizes: {batch_sizes}"
        b = batch_sizes.pop()

        def pad(x):
            if not hasattr(x, "shape"):
                return x
            _, *shape = x.shape
            db, rest = divmod(b, nd)
            if rest:
                x = np.concatenate(
                    [x, np.zeros((nd - rest, *shape), x.dtype)], axis=0)
                db += 1
            if min_device_batch and db < min_device_batch:
                x = np.concatenate(
                    [x, np.zeros((nd * (min_device_batch - db), *shape),
                                 x.dtype)])
            return x

        args = [a if i in static_argnums else pad(a)
                for i, a in enumerate(args)]
        kw = {k: v if k in static_argnames else pad(v) for k, v in kw.items()}
        out = wrapped(*args, **kw)

        def unpad(x):
            return jax.device_get(x)[:b]
        return jax.tree_util.tree_map(unpad, out)

    return pad_shard_unpad_wrapper


def sync() -> None:
    """Multi-host barrier (reference: clipa_jax/helpers/utils.py:723-731).

    All processes block until every process reaches this point.
    """
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices("clipa_tpu_sync")
