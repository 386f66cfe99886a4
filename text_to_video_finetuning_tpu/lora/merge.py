"""LoRA merging: combine several LoRAs into one, or bake them into a model.

The reference lists "Merge LoRA weights together (yet)" under *What you
cannot do* (reference README.md:141-145).  The functional overlay makes it
exact: a weighted sum of low-rank deltas

    sum_i  w_i * up_i @ down_i  ==  concat_r(w_i * up_i) @ concat_r(down_i)

is itself a LoRA of rank sum(r_i) -- merging is concatenation along the
rank axis (down: axis 0, up: axis 1 in both flavors' torch layouts, see
overlay.py).  The merged file stays loadable here (the loaders are
shape-driven) and in torch loaders that size lora modules from the
checkpoint tensors.

An optional SVD re-factorization (`truncate_lora_rank`, cloneofsimo only)
compresses the merged LoRA back to a target rank: per site the exact delta
`up @ down` is re-factored through its top-r singular triplets -- the
best rank-r approximation of the merged delta (Eckart-Young), the standard
LoRA-merge compression.

stable_lora (loralib) merging is exact under the same concatenation
(B'@A' = sum w_i B_i@A_i holds blockwise for the conv (r*k, in*k) layout
and the mean-over-k Conv3d view is linear in the product), provided every
input was trained with the same alpha/r scaling, which stays the caller's
single `alpha_over_r` at apply time.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np

from flax.traverse_util import flatten_dict, unflatten_dict

from .sites import LoraSite

__all__ = ["merge_lora_trees", "truncate_lora_rank"]


def merge_lora_trees(trees: Sequence[Dict],
                     weights: Optional[Sequence[float]] = None) -> Dict:
    """Exact weighted merge of LoRA pytrees targeting the SAME sites:
    down leaves concatenate along the rank axis (0), up leaves along the
    rank axis (1) with each input's weight folded in."""
    if not trees:
        raise ValueError("no LoRA trees to merge")
    if weights is None:
        weights = [1.0] * len(trees)
    if len(weights) != len(trees):
        raise ValueError(f"{len(trees)} trees but {len(weights)} weights")
    flats = [flatten_dict(t) for t in trees]
    paths = set(flats[0])
    for i, f in enumerate(flats[1:], 1):
        if set(f) != paths:
            raise ValueError(
                f"LoRA #{i} targets different sites than LoRA #0 "
                "(same model / target_replace_module set required)")
    out = {}
    for path in paths:
        leaves = [np.asarray(f[path], np.float32) for f in flats]
        if path[-1] == "down":
            out[path] = np.concatenate(leaves, axis=0)
        elif path[-1] == "up":
            out[path] = np.concatenate(
                [w * l for w, l in zip(weights, leaves)], axis=1)
        else:
            raise ValueError(f"unexpected LoRA leaf {path}")
    return unflatten_dict(out)


def truncate_lora_rank(lora_params: Dict, sites: Sequence[LoraSite],
                       rank: int) -> Dict:
    """Compress a (merged) cloneofsimo LoRA to `rank` per site via SVD of
    the exact delta: up@down = U S V^T, keep the top-r triplets with the
    singular values split evenly (up = U sqrt(S), down = sqrt(S) V^T)."""
    flat = dict(flatten_dict(lora_params))
    for site in sites:
        dk = site.flax_path + ("down",)
        uk = site.flax_path + ("up",)
        if dk not in flat:
            continue
        down = np.asarray(flat[dk], np.float32)
        up = np.asarray(flat[uk], np.float32)
        r_in = down.shape[0]
        if r_in <= rank:
            continue
        up2 = up.reshape(up.shape[0], r_in)            # (out, r)
        down2 = down.reshape(r_in, -1)                 # (r, in*prod(k))
        u, s, vt = np.linalg.svd(up2 @ down2, full_matrices=False)
        r = min(rank, s.shape[0])
        sq = np.sqrt(s[:r])
        flat[uk] = (u[:, :r] * sq).reshape(
            (up.shape[0], r) + up.shape[2:]).astype(np.float32)
        flat[dk] = (sq[:, None] * vt[:r]).reshape(
            (r,) + down.shape[1:]).astype(np.float32)
    return unflatten_dict(flat)
