"""Checkpointing.

Two formats:
  * **flat npz** — pytree flattened to slash-joined keys, atomically written
    (tmp + rename), bf16 stored as void views. Wire-compatible with released
    CLIPA weights (reference: clipa_jax/helpers/utils.py:147-203,653-692),
    including the `file.npz:key` sub-tree syntax.
  * **Orbax** — async, sharded, for pod-scale runs (the npz single-file path
    can't hold bigG); see :class:`CheckpointManager`.
"""

from __future__ import annotations

import io
import os
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Optional

import jax
import numpy as np

from clipa_tpu import pathio
from clipa_tpu import utils as u


# ---------------------------------------------------------------------------
# flat npz format
# ---------------------------------------------------------------------------

def npsave(data: Any, path: str) -> None:
    """Atomic np.savez of a flat dict (tmp + rename), local or remote URL
    (gs://... routes through fsspec; reference wrote these via gfile,
    clipa_jax/helpers/utils.py:683-692)."""
    with io.BytesIO() as bio:
        np.savez(bio, **data)
        pathio.write_bytes_atomic(path, bio.getvalue())


def npload(path: str) -> dict:
    if pathio.is_remote(path):
        with pathio.open_file(path, "rb") as f:
            buf = io.BytesIO(f.read())
        checkpoint = np.load(buf, allow_pickle=False)
    else:
        checkpoint = np.load(path, allow_pickle=False)
    keys, values = zip(*list(checkpoint.items()))
    return dict(zip(keys, values))


def save_checkpoint(checkpoint: Any, path: str,
                    step_copy: Optional[int] = None) -> None:
    """Flattens and saves a pytree; optionally keeps a `-{step:09d}` copy."""
    names_and_vals, _ = u.tree_flatten_with_names(checkpoint)
    flat = {k: _to_np(v) for k, v in names_and_vals}
    if step_copy is not None:
        npsave(flat, f"{path}-{step_copy:09d}")
    npsave(flat, path)


def _to_np(x):
    x = np.asarray(jax.device_get(x))
    if x.dtype.name == "bfloat16":
        # np.savez can't store bf16; keep the raw bytes as void — recovered
        # by utils.recover_dtype on load (same convention as the reference,
        # clipa_jax/helpers/utils.py:653-659).
        return x.view("V2")
    return x


def load_checkpoint(tree: Any, path: str) -> Any:
    """Loads a flat npz back into the given pytree structure."""
    flat = npload(path)
    flat = {k: u.recover_dtype(v) for k, v in flat.items()}
    loaded = u.recover_tree(list(flat.keys()), list(flat.values()))
    if tree is not None:
        treedef = jax.tree_util.tree_structure(tree)
        names_and_vals, _ = u.tree_flatten_with_names(tree)
        vals = [_lookup(loaded, name) for name, _ in names_and_vals]
        return jax.tree_util.tree_unflatten(treedef, vals)
    return loaded


def _lookup(tree: dict, name: str):
    node = tree
    for part in name.split("/"):
        node = node[part]
    return node


def load_params(path: str, init_params: Any = None) -> Any:
    """Loads params from `file.npz` or `file.npz:subtree/key`.

    Accepts checkpoints that are a bare params tree or a full train
    checkpoint containing a `params/` prefix.
    """
    key = None
    if pathio.is_remote(path):
        # scheme contributes one ':'; a second one marks a subtree key.
        if path.count(":") > 1:
            path, _, key = path.rpartition(":")
    elif ":" in path:
        path, _, key = path.rpartition(":")
    tree = load_checkpoint(None, path)
    if "params" in tree and isinstance(tree["params"], dict) and \
            (not key or key.split("/")[0] not in tree):
        tree = tree["params"]  # full train checkpoint: dig out the params
    if key:
        for part in key.split("/"):
            tree = tree[part]
    del init_params
    return tree


# ---------------------------------------------------------------------------
# async writer with timeout watchdog
# ---------------------------------------------------------------------------

class AsyncCheckpointWriter:
    """Single-slot async writer: saves overlap the next train steps.

    A watchdog flags writes that exceed `timeout_secs` (reference behavior:
    clipa_jax/helpers/utils.py:246-256 checkpointing_timeout).
    """

    def __init__(self, timeout_secs: float = 600.0):
        self._pool = ThreadPoolExecutor(max_workers=1,
                                        thread_name_prefix="ckpt")
        self._future = None
        self.timeout_secs = timeout_secs

    def wait(self):
        if self._future is not None:
            self._future.result(timeout=self.timeout_secs)
            self._future = None

    def save(self, checkpoint: Any, path: str,
             step_copy: Optional[int] = None):
        self.wait()  # one write in flight at a time
        # Pull to host before handing to the thread (device buffers may be
        # donated by the next step).
        host = jax.tree_util.tree_map(
            lambda x: np.asarray(jax.device_get(x)), checkpoint)
        self._future = self._pool.submit(save_checkpoint, host, path,
                                         step_copy)


# ---------------------------------------------------------------------------
# Orbax (sharded, async) for pod-scale runs
# ---------------------------------------------------------------------------

class CheckpointManager:
    """Thin wrapper over orbax.checkpoint for sharded train state."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        import orbax.checkpoint as ocp
        # abspath would mangle a gs://... URL into /cwd/gs:/...; Orbax
        # handles remote URLs natively (via etils.epath/tensorstore).
        if not pathio.is_remote(directory):
            directory = os.path.abspath(directory)
        self._mgr = ocp.CheckpointManager(
            directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True,
                enable_async_checkpointing=True),
        )

    def save(self, step: int, state: Any):
        import orbax.checkpoint as ocp
        self._mgr.save(step, args=ocp.args.StandardSave(state))

    def restore(self, state_template: Any, step: Optional[int] = None):
        import orbax.checkpoint as ocp
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            return None
        return self._mgr.restore(
            step, args=ocp.args.StandardRestore(state_template))

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def wait(self):
        self._mgr.wait_until_finished()

    def close(self):
        self._mgr.close()
