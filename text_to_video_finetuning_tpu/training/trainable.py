"""Trainable-parameter selection.

Behavioral spec: `handle_trainable_modules` (reference train.py:316-337) --
patterns like ("attn1", "attn2"), "all" unlocks everything -- plus the LoRA
co-training negation (`negate_params`, reference train.py:195-202): when
co-training base modules alongside LoRA, base params whose torch name
contains a LoRA'd child name are skipped, UNLESS the name contains 'temp'
(temporal layers are always allowed through).

Functionally: returns a boolean mask pytree / path predicate used to
partition the params into (trainable, frozen) subtrees.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

from flax.traverse_util import flatten_dict, unflatten_dict

from ..utils.torch_names import flax_to_torch_key


def _torch_name(path: Tuple[str, ...], model_kind: str) -> str:
    return flax_to_torch_key(path[:-1], model_kind) + "." + path[-1]


def select_trainable(params, model_kind: str,
                     trainable_modules: Optional[Sequence[str]],
                     negation: Optional[Sequence[str]] = None):
    """-> (trainable_tree, frozen_tree). `trainable_modules=None` freezes
    everything; 'all' unlocks everything (reference train.py:321-326)."""
    flat = flatten_dict(params)
    if trainable_modules is None:
        return {}, unflatten_dict(flat)
    unlock_all = any(name == "all" for name in trainable_modules)

    def negated(name: str) -> bool:
        if not negation:
            return False
        return any(n in name and "temp" not in name for n in negation)

    trainable, frozen = {}, {}
    for path, leaf in flat.items():
        name = _torch_name(path, model_kind)
        is_trainable = unlock_all or any(tm in name
                                         for tm in trainable_modules)
        if is_trainable and not negated(name):
            trainable[path] = leaf
        else:
            frozen[path] = leaf
    return unflatten_dict(trainable), unflatten_dict(frozen)
