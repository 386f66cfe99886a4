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

import dataclasses
import logging
import os
from typing import Any, Optional

import jax
import jax.numpy as jnp

logger = logging.getLogger("t2v_tpu")


_STATE_SUBDIR = "train_state"


def save_train_state(checkpoint_dir: str, state: Any) -> str:
    """Write the TrainState pytree under `<checkpoint_dir>/train_state`."""
    import orbax.checkpoint as ocp
    path = os.path.abspath(os.path.join(checkpoint_dir, _STATE_SUBDIR))
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, jax.device_get(state), force=True)
    return path


class AsyncTrainStateSaver:
    """Non-blocking TrainState saves: file serialization overlaps training.

    Orbax's StandardCheckpointer subclasses AsyncCheckpointer, but the
    one-shot `with` form in `save_train_state` forces the wait before the
    block exits, so every periodic checkpoint stalls the train loop for the
    full disk write (seconds to minutes at full-finetune state sizes: fp32
    params + two Adam moments).  The engine instead keeps ONE saver for the
    whole run: `save()` snapshots the state to host (the only synchronous
    part) and returns while the background thread writes the directory; the
    next `save()` -- or a final `wait()` before the run returns -- joins the
    in-flight write.  At most one save is in flight at a time, so a slow
    disk degrades gracefully to the old synchronous behavior instead of
    queueing unbounded host copies.
    """

    def __init__(self):
        self._ckptr = None

    def _checkpointer(self):
        import orbax.checkpoint as ocp
        if self._ckptr is None:
            self._ckptr = ocp.StandardCheckpointer()
        return self._ckptr

    def save(self, checkpoint_dir: str, state: Any) -> str:
        ckptr = self._checkpointer()
        ckptr.wait_until_finished()  # at most one in-flight write
        path = os.path.abspath(os.path.join(checkpoint_dir, _STATE_SUBDIR))
        # host snapshot now (immutable w.r.t. subsequent donated steps);
        # the directory write happens on orbax's background thread
        ckptr.save(path, jax.device_get(state), force=True)
        return path

    def wait(self):
        if self._ckptr is not None:
            self._ckptr.wait_until_finished()

    def close(self):
        if self._ckptr is not None:
            self._ckptr.close()
            self._ckptr = None


def has_train_state(checkpoint_dir: str) -> bool:
    return os.path.isdir(os.path.join(checkpoint_dir, _STATE_SUBDIR))


def load_train_state(checkpoint_dir: str, abstract_state: Any) -> Any:
    """Restore a TrainState saved by `save_train_state`.

    `abstract_state` is a freshly-initialized TrainState with the same tree
    structure (its array values supply shapes/dtypes/shardings to restore
    into -- pass the real initialized state; values are replaced).

    The `ema` field makes checkpoints saved with use_ema on/off have
    different tree structures; rather than surfacing orbax's opaque
    structure-mismatch error, a presence mismatch is bridged explicitly
    (ADVICE r3):
    - checkpoint WITHOUT ema, resuming with use_ema=True: the EMA shadow is
      seeded from the restored trainable params (a fresh EMA start);
    - checkpoint WITH ema, resuming with use_ema=False: the stored shadow
      is dropped (the ema always mirrors the trainable tree, so it restores
      against that structure and is discarded).
    """
    import orbax.checkpoint as ocp
    path = os.path.abspath(os.path.join(checkpoint_dir, _STATE_SUBDIR))

    def _restore(template_state):
        template = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct,
                                          template_state)
        with ocp.StandardCheckpointer() as ckptr:
            return ckptr.restore(path, template)

    try:
        return _restore(abstract_state)
    except Exception as exc:
        want_ema = getattr(abstract_state, "ema", None) is not None
        try:
            if want_ema:
                restored = _restore(dataclasses.replace(abstract_state,
                                                        ema=None))
                restored = dataclasses.replace(
                    restored,
                    ema=jax.tree_util.tree_map(jnp.copy, restored.trainable))
                logger.warning(
                    f"checkpoint {path} was saved without an EMA shadow "
                    "(use_ema was off); seeding the EMA from the restored "
                    "trainable params")
            else:
                restored = _restore(dataclasses.replace(
                    abstract_state, ema=abstract_state.trainable))
                restored = dataclasses.replace(restored, ema=None)
                logger.warning(
                    f"checkpoint {path} contains an EMA shadow but use_ema "
                    "is off for this run; the stored shadow is discarded")
        except Exception:
            raise RuntimeError(
                f"failed to restore the train state at {path}: the tree "
                "structure does not match the current run's TrainState "
                "(and it is not a use_ema on/off mismatch, which would be "
                "bridged automatically). Keep optimizer/accumulation/LoRA "
                "settings consistent with the run that wrote the "
                "checkpoint.") from exc
        return restored
