"""Orbax train-state checkpointing (step + trainable params + optimizer
state + rng).

The reference saves only model weights -- optimizer/scheduler state is lost
on resume (SURVEY.md §5.4: "Optimizer/scheduler state is **not** saved");
`resume_from_checkpoint` restarts Adam moments from zero.  Here the full
TrainState is checkpointed with Orbax next to the diffusers-layout pipeline
dir, so `--resume_from_checkpoint` continues bit-exact: same step counter,
same Adam moments, same RNG stream.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax


_STATE_SUBDIR = "train_state"


def save_train_state(checkpoint_dir: str, state: Any) -> str:
    """Write the TrainState pytree under `<checkpoint_dir>/train_state`."""
    import orbax.checkpoint as ocp
    path = os.path.abspath(os.path.join(checkpoint_dir, _STATE_SUBDIR))
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, jax.device_get(state), force=True)
    return path


def has_train_state(checkpoint_dir: str) -> bool:
    return os.path.isdir(os.path.join(checkpoint_dir, _STATE_SUBDIR))


def load_train_state(checkpoint_dir: str, abstract_state: Any) -> Any:
    """Restore a TrainState saved by `save_train_state`.

    `abstract_state` is a freshly-initialized TrainState with the same tree
    structure (its array values supply shapes/dtypes/shardings to restore
    into -- pass the real initialized state; values are replaced).
    """
    import orbax.checkpoint as ocp
    path = os.path.abspath(os.path.join(checkpoint_dir, _STATE_SUBDIR))
    template = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct,
                                      abstract_state)
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, template)
