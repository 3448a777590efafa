"""Checkpoint / resume for model pipelines (SURVEY.md §7 row).

The loss/decoder library itself is stateless (pure functions — nothing to
checkpoint, same as the reference).  The model families in `models/` do have
state; this is the thin orbax-backed save/restore used by their training
loops and by serving.
"""

from __future__ import annotations

import os

import jax


def save_checkpoint(path: str, state) -> None:
    """Save a pytree (params / train state) to `path` (orbax StandardSave)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state, force=True)


def restore_checkpoint(path: str, like):
    """Restore a pytree saved by save_checkpoint; `like` supplies structure
    and shapes (e.g. a freshly-initialized params tree)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        target = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), like
        )
        return ckptr.restore(path, target)
