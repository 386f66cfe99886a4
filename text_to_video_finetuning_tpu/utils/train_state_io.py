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
import json
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


def _checkpoint_has_ema(path: str, ema_index: int) -> Optional[bool]:
    """Whether the checkpoint's tree metadata records an EMA shadow.

    Orbax's PyTree format writes a `_METADATA` JSON whose `tree_metadata`
    maps flattened key paths to leaf metadata.  TrainState is a positional
    pytree, so the ema field appears as key index `ema_index` (its dataclass
    field position): saved with ``ema=None`` the entry is a single leaf with
    ``value_metadata.value_type == "None"``; with a live shadow the entries
    are the shadow's subtree (``('4', 'unet', ...)``).  Returns None when
    the file is missing or the format is unrecognized (caller restores
    against its own template and lets any error propagate).
    """
    try:
        with open(os.path.join(path, "_METADATA")) as f:
            tree = json.load(f).get("tree_metadata")
    except (OSError, ValueError):
        return None
    if not isinstance(tree, dict):
        return None
    entries = [v for v in tree.values()
               if isinstance(v, dict)
               and (v.get("key_metadata") or [{}])[0].get("key")
               == str(ema_index)]
    if not entries:
        return None
    for v in entries:
        value_type = (v.get("value_metadata") or {}).get("value_type")
        if len(v.get("key_metadata") or []) > 1 or value_type != "None":
            return True
    return False


def load_train_state(checkpoint_dir: str, abstract_state: Any) -> Any:
    """Restore a TrainState saved by `save_train_state`.

    `abstract_state` is a freshly-initialized TrainState with the same tree
    structure (its array values supply shapes/dtypes/shardings to restore
    into -- pass the real initialized state; values are replaced).

    The `ema` field makes checkpoints saved with use_ema on/off have
    different tree structures; rather than surfacing orbax's opaque
    structure-mismatch error, a presence mismatch is detected up front from
    the checkpoint's own tree metadata and bridged explicitly (ADVICE r3):
    - checkpoint WITHOUT ema, resuming with use_ema=True: the EMA shadow is
      seeded from the restored trainable params (a fresh EMA start);
    - checkpoint WITH ema, resuming with use_ema=False: the stored shadow
      is dropped (the ema always mirrors the trainable tree, so it restores
      against that structure and is discarded).
    When the metadata probe is CONCLUSIVE, every path performs exactly ONE
    restore, and non-structural failures (corrupt/truncated checkpoints,
    I/O errors) propagate with their real cause instead of being retried
    and re-labelled as a settings mismatch.  When the probe is
    inconclusive (e.g. a future orbax changed its private _METADATA
    layout, ADVICE r4), the restore is attempted optimistically and only
    a failure falls back to one bridge retry; if the bridge also fails,
    the ORIGINAL error is raised.
    """
    import orbax.checkpoint as ocp
    path = os.path.abspath(os.path.join(checkpoint_dir, _STATE_SUBDIR))

    def _restore(template_state):
        template = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct,
                                          template_state)
        with ocp.StandardCheckpointer() as ckptr:
            return ckptr.restore(path, template)

    want_ema = getattr(abstract_state, "ema", None) is not None
    try:
        ema_index = [f.name for f in
                     dataclasses.fields(abstract_state)].index("ema")
    except (TypeError, ValueError):
        ema_index = -1  # not a dataclass / no ema field: probe disabled

    def _bridge_ema_mismatch():
        """Restore against the OPPOSITE ema structure and convert."""
        if want_ema:  # checkpoint predates EMA / was saved use_ema=False
            restored = _restore(
                dataclasses.replace(abstract_state, ema=None))
            logger.warning(
                f"checkpoint {path} was saved without an EMA shadow "
                "(use_ema was off); seeding the EMA from the restored "
                "trainable params")
            return dataclasses.replace(
                restored,
                ema=jax.tree_util.tree_map(jnp.copy, restored.trainable))
        restored = _restore(dataclasses.replace(
            abstract_state, ema=abstract_state.trainable))
        logger.warning(
            f"checkpoint {path} contains an EMA shadow but use_ema is off "
            "for this run; the stored shadow is discarded")
        return dataclasses.replace(restored, ema=None)

    has_ema = (_checkpoint_has_ema(path, ema_index)
               if ema_index >= 0 else None)
    if has_ema is None and ema_index >= 0:
        # metadata probe inconclusive (e.g. a future orbax version changed
        # the private _METADATA layout, ADVICE r4): restore optimistically,
        # and only on failure retry via the ema-presence bridge; if the
        # bridge fails too, the ORIGINAL error was the real one — raise it
        try:
            return _restore(abstract_state)
        except Exception as first_err:
            try:
                return _bridge_ema_mismatch()
            except Exception:
                raise first_err
    if has_ema is None or has_ema == want_ema:
        return _restore(abstract_state)
    return _bridge_ema_mismatch()
