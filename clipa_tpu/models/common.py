"""Cross-model utilities: checkpoint<->init parameter merging.

Implements the reference's merge semantics (clipa_jax/models/common.py:50-151):
parameters are matched by flat name; `dont_load` regexes (fullmatch) keep the
init value; position embeddings falling out of `dont_load` or shape changes
are bilinearly resampled (the cross-resolution "masked_init" path CLIPA's
unmask-tuning relies on).
"""

from __future__ import annotations

import logging
from typing import Any, Sequence

import jax
import jax.numpy as jnp

from clipa_tpu import utils as u

log = logging.getLogger(__name__)


def merge_params(loaded: Any, inited: Any, dont_load: Sequence = ()) -> Any:
    """Makes `loaded` match `inited`'s structure, keeping init where told to.

    Raises if a parameter exists on only one side and no `dont_load` regex
    covers it.
    """
    if inited is None:
        return loaded

    patterns = u.check_and_compile_patterns(dont_load)

    def should_merge(name: str) -> bool:
        return not any(p.fullmatch(name) for p in patterns)

    loaded_flat = dict(u.tree_flatten_with_names(loaded)[0])
    inited_flat = dict(u.tree_flatten_with_names(inited)[0])

    merged = {}
    for name, init_val in inited_flat.items():
        if name in loaded_flat and should_merge(name) \
                and loaded_flat[name].shape == init_val.shape:
            merged[name] = loaded_flat[name]
        elif name.endswith("pos_embedding") and name in loaded_flat:
            # Resolution changed (unmask-tuning) or posemb excluded: resample.
            log.info("Resampling %s from %s to %s", name,
                     loaded_flat[name].shape, init_val.shape)
            merged[name] = _resample_posemb_any(loaded_flat[name], init_val)
        else:
            log.info("Using init value for %s", name)
            merged[name] = init_val

    not_in_loaded = {k for k in inited_flat.keys() - loaded_flat.keys()
                     if should_merge(k)}
    not_in_inited = {k for k in loaded_flat.keys() - inited_flat.keys()
                     if should_merge(k)}
    if not_in_loaded or not_in_inited:
        raise ValueError(
            "Parameter mismatch not covered by dont_load.\n"
            f"In model but not checkpoint: {sorted(not_in_loaded)}\n"
            f"In checkpoint but not model: {sorted(not_in_inited)}")

    return u.recover_tree(list(merged.keys()), list(merged.values()))


def _resample_posemb_any(old, new_template):
    """Resamples a (1, N, C) posemb; 2D grid-aware when N-1 is a square."""
    old = jnp.asarray(old)
    if old.shape == new_template.shape:
        return old
    l_old, l_new = old.shape[1], new_template.shape[1]
    g_old, g_new = int((l_old - 1) ** 0.5), int((l_new - 1) ** 0.5)
    if g_old * g_old + 1 == l_old and g_new * g_new + 1 == l_new:
        # cls row passes through; the grid part is resized bilinearly.
        cls_row, grid = old[:, :1], old[:, 1:]
        grid = grid.reshape(g_old, g_old, -1)
        grid = jax.image.resize(grid, (g_new, g_new, grid.shape[-1]),
                                "bilinear")
        return jnp.concatenate(
            [cls_row, grid.reshape(1, g_new * g_new, -1)], axis=1
        ).astype(new_template.dtype)
    return jax.image.resize(old, new_template.shape,
                            "bilinear").astype(new_template.dtype)
