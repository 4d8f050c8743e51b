"""Checkpointing with true resume (Orbax).

The reference saves ``{total_steps, model, optimizer, scheduler}`` every 10k
steps (``train_stereo.py:260-269``) but on restore loads model weights only —
optimizer/scheduler state is saved and never restored (SURVEY.md §5). Here a
checkpoint is the full training state (params + opt_state + step), restored
atomically, so a preempted run resumes exactly.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, max_to_keep: int = 5):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep, create=True
            ),
        )

    def save(self, step: int, state: Any, wait: bool = False):
        """Save a pytree training state (flax TrainState works as-is)."""
        self._mgr.save(step, args=ocp.args.StandardSave(state))
        if wait:
            self._mgr.wait_until_finished()

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def restore(self, target: Any, step: Optional[int] = None) -> Any:
        """Restore into the structure of ``target`` (an abstract or concrete
        pytree of the same shape/dtype)."""
        if step is None:
            step = self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, target)
        return self._mgr.restore(step, args=ocp.args.StandardRestore(abstract))

    def restore_params_only(self, params_target: Any,
                            step: Optional[int] = None) -> Any:
        """Reference-style weights-only restore (``--restore_ckpt`` semantics,
        train_stereo.py:287-302): pull just the ``params`` subtree from a full
        training-state checkpoint."""
        if step is None:
            step = self.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoint in {self.directory}")
        abstract = jax.tree_util.tree_map(
            ocp.utils.to_shape_dtype_struct, params_target
        )
        # Use a standalone PyTreeCheckpointer on the step's item directory so
        # the manager's StandardSave handler registration doesn't conflict
        # with a partial (params-only) restore.
        item_dir = os.path.join(self.directory, str(step))
        if os.path.isdir(os.path.join(item_dir, "default")):
            item_dir = os.path.join(item_dir, "default")
        with ocp.PyTreeCheckpointer() as ckptr:
            restored = ckptr.restore(
                item_dir,
                args=ocp.args.PyTreeRestore(
                    item={"params": abstract},
                    partial_restore=True,
                ),
            )
        return restored["params"]

    def close(self):
        self._mgr.wait_until_finished()
        self._mgr.close()


def save_params(directory: str, params: Any):
    """One-shot parameter export (eval/distribution artifacts)."""
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(directory), params, force=True)
    ckptr.wait_until_finished()


def load_params(directory: str, params_target: Any) -> Any:
    ckptr = ocp.StandardCheckpointer()
    abstract = jax.tree_util.tree_map(
        ocp.utils.to_shape_dtype_struct, params_target
    )
    return ckptr.restore(os.path.abspath(directory), abstract)


def save_params_npz(params: Any, path: str, dtype="float16"):
    """Single-file npz parameter export (committable test fixtures).

    Stored at reduced precision by default; keys are tree key-paths so the
    file round-trips through any target tree with the same structure."""
    import numpy as np

    flat = jax.tree_util.tree_leaves_with_path(params)
    arrs = {jax.tree_util.keystr(k): np.asarray(v).astype(dtype)
            for k, v in flat}
    np.savez_compressed(path, **arrs)


def load_params_npz(path: str, params_target: Any, dtype="float32") -> Any:
    import jax.numpy as jnp
    import numpy as np

    data = np.load(path)
    flat, treedef = jax.tree_util.tree_flatten_with_path(params_target)
    leaves = [jnp.asarray(data[jax.tree_util.keystr(k)]).astype(dtype)
              for k, _ in flat]
    return jax.tree_util.tree_unflatten(treedef, leaves)
