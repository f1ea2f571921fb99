"""Factor-state checkpointing for long megabase-scale runs.

The reference has no checkpointing (runs are minutes-long and outputs are
written once at the end, `demethify/demethify.py:221-233`; SURVEY.md §5).
For genome-scale sharded runs this module saves/restores the factor state
(U, alpha, RNG key, iteration counter) with Orbax, preserving shardings on
restore so a resumed run continues on the same mesh layout.

Usage:
    save_factors(path, u=u, alpha=alpha, step=k)
    state = load_factors(path, like={"u": u_template, ...})  # resharded
"""

import os
from typing import Any, Dict, Optional



def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_factors(path: str, **state: Any) -> str:
    """Save a pytree of factor state (jax or numpy arrays) atomically."""
    path = os.path.abspath(path)
    ckpt = _checkpointer()
    ckpt.save(path, state, force=True)
    return path


def load_factors(path: str,
                 like: Optional[Dict[str, Any]] = None,
                 as_numpy: bool = False) -> Dict[str, Any]:
    """Restore factor state. When ``like`` provides template arrays
    (values with .sharding), restored arrays are placed with the same
    sharding — a resumed run continues distributed without a gather.
    ``as_numpy`` forces host numpy leaves regardless of the sharding the
    checkpoint was saved with — the safe form when restoring onto a
    different device topology (the caller re-places onto its own mesh)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckpt = _checkpointer()
    if as_numpy:
        import jax
        import numpy as np

        tree = ckpt.metadata(path).item_metadata.tree
        restore_args = jax.tree.map(
            lambda _: ocp.RestoreArgs(restore_type=np.ndarray), tree)
        return ckpt.restore(path, restore_args=restore_args)
    if like is None:
        return ckpt.restore(path)

    def as_restore_arg(template):
        if hasattr(template, "sharding") and hasattr(template, "shape"):
            return ocp.ArrayRestoreArgs(
                sharding=template.sharding,
                global_shape=template.shape,
                dtype=template.dtype)
        return ocp.RestoreArgs()

    restore_args = {k: as_restore_arg(v) for k, v in like.items()}
    return ckpt.restore(path, restore_args=restore_args)
