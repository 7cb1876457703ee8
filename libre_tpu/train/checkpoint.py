"""Checkpoint/resume for inverse rendering via orbax (SURVEY.md §5.4: the
reference renderer is stateless per frame and has none; training state is
the new framework's durable state)."""

from __future__ import annotations

import os
from typing import Any, Optional

import jax


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_checkpoint(path: str, state: Any) -> None:
    """Save a TrainState (or any pytree) to ``path`` (a directory)."""
    ckptr = _checkpointer()
    ckptr.save(os.path.abspath(path), state, force=True)


def restore_checkpoint(path: str, template: Optional[Any] = None) -> Any:
    """Restore a pytree; ``template`` (matching structure/shardings) makes
    restoration placement-aware."""
    ckptr = _checkpointer()
    if template is not None:
        return ckptr.restore(os.path.abspath(path), item=template)
    return ckptr.restore(os.path.abspath(path))
