"""Checkpointing of lattices, beams and training state via orbax.

The reference persists only lattices (LatticeJSON); training/tuning state has
no story (SURVEY.md §5).  Since every lynx-tpu object is a pytree, a whole
tuning session — segment, optimizer state, RNG keys, env states — checkpoints
as one tree.  Array leaves are saved with orbax; the static structure
(element classes, names, flags) is reconstructed from a template pytree with
the same treedef on restore, which is how JAX frameworks conventionally
restore typed modules.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any

import jax


def save(path: str | Path, pytree: Any) -> None:
    """Save any lynx-tpu pytree (Segment, Beam, optimizer state, ...)."""
    import orbax.checkpoint as ocp

    leaves = jax.tree_util.tree_leaves(pytree)
    with ocp.StandardCheckpointer() as checkpointer:
        checkpointer.save(Path(path).absolute(), leaves, force=True)


def restore(path: str | Path, template: Any) -> Any:
    """Restore a pytree saved with :func:`save`.

    :param template: A pytree with the same structure (e.g. a freshly
        constructed Segment / optimizer state); its array leaves provide the
        shapes/dtypes, its treedef provides the static structure.
    """
    import orbax.checkpoint as ocp

    leaves, treedef = jax.tree_util.tree_flatten(template)
    with ocp.StandardCheckpointer() as checkpointer:
        restored = checkpointer.restore(Path(path).absolute(), leaves)
    return jax.tree_util.tree_unflatten(treedef, restored)
