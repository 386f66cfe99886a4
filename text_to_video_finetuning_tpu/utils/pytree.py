"""Pytree utilities: flatten/partition/merge for parameter trees.

The reference mutates torch modules in place (`requires_grad_`, param groups,
module surgery); the TPU-native equivalent is splitting the parameter pytree
into trainable/frozen subtrees and merging them inside the jitted step.
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

from flax.traverse_util import flatten_dict, unflatten_dict

Path = Tuple[str, ...]


def flat(params) -> Dict[Path, object]:
    return flatten_dict(params)


def unflat(d: Dict[Path, object]):
    return unflatten_dict(d)


def dotted(path: Path) -> str:
    return ".".join(path)


def partition(params, predicate: Callable[[Path], bool]):
    """Split params into (selected, rest) by path predicate."""
    f = flatten_dict(params)
    selected = {k: v for k, v in f.items() if predicate(k)}
    rest = {k: v for k, v in f.items() if not predicate(k)}
    return unflatten_dict(selected), unflatten_dict(rest)


def merge(*trees):
    """Merge flat-disjoint param trees back into one nested dict."""
    out = {}
    for tree in trees:
        if tree:
            out.update(flatten_dict(tree))
    return unflatten_dict(out)


def tree_size(params) -> int:
    import jax
    return sum(x.size for x in jax.tree_util.tree_leaves(params))
