"""LoRA as a functional parameter overlay (TPU-native).

Instead of the reference's module surgery (LoraInjected* wrappers,
reference utils/lora.py:33-246; loralib subclasses,
reference stable_lora/lora.py:70-200), LoRA here is a second parameter
pytree; the jitted step computes `W_eff = W + scale * expand(up, down)` per
site and runs the unmodified model.  The expansion is mathematically exact
for both flavors:

* cloneofsimo Linear/Conv: a k-kernel down conv followed by a 1x1 up conv
  composes to a single k-kernel conv with weight up@down -- exactly the
  `collapse_lora` math (reference utils/lora.py:781-816).
* stable_lora (loralib): `(B @ A).view(weight.shape) * alpha/r` for
  Linear/Conv2d, and the mean-over-k merged view for Conv3d
  (reference stable_lora/lora.py:190-197).

Parameter layout per site: {'down': ..., 'up': ...} stored in the flavor's
native matrix layout so checkpoint serialization is a pure re-keying.
  cloneofsimo: down = torch lora_down.weight, up = torch lora_up.weight
               (linear: (r,in)/(out,r); conv2d: (r,in,kh,kw)/(out,r,1,1);
                conv3d: (r,in,kt,1,1)/(out,r,1,1,1))
  stable_lora: A = (r*k, in*k), B = (out*k, r*k); embedding A=(r,V), B=(D,r)

The reference applies dropout on the low-rank branch activations
(reference utils/lora.py:57-62); a parameter overlay cannot express
per-activation dropout exactly, so training dropout is applied to the
low-rank delta (inverted-dropout Bernoulli mask on `down`), a standard
weight-dropout approximation. Inference (deterministic) is exact.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from flax.traverse_util import flatten_dict, unflatten_dict

from .sites import LoraSite

LORA_VERSIONS = ["stable_lora", "cloneofsimo"]

Path = Tuple[str, ...]


def _clamped_rank(site: LoraSite, r: int) -> int:
    # reference utils/lora.py:40-45: rank clamped to min(in, out)
    return min(r, site.in_features, site.out_features)


def init_lora_params(rng, sites: Sequence[LoraSite], rank: int,
                     version: str = "cloneofsimo",
                     dtype=jnp.float32) -> Dict:
    """Create the LoRA pytree for `sites`. Mirrors reference init:
    cloneofsimo down ~ N(0, (1/r)^2), up = 0 (reference utils/lora.py:53-54);
    stable_lora A ~ kaiming_uniform(a=sqrt(5)) = U(+-1/sqrt(fan_in)), B = 0
    (reference stable_lora/lora.py:104-108)."""
    flat = {}
    rngs = jax.random.split(rng, max(len(sites), 1))
    for site, key in zip(sites, rngs):
        r = _clamped_rank(site, rank)
        k = site.kernel_size
        if version == "cloneofsimo":
            if site.kind == "linear":
                down_shape = (r, site.in_features)
                up_shape = (site.out_features, r)
            elif site.kind == "conv2d":
                down_shape = (r, site.in_features, k, k)
                up_shape = (site.out_features, r, 1, 1)
            elif site.kind == "conv3d":
                down_shape = (r, site.in_features, k, 1, 1)
                up_shape = (site.out_features, r, 1, 1, 1)
            else:
                continue  # cloneofsimo has no embedding LoRA
            down = jax.random.normal(key, down_shape, dtype) * (1.0 / r)
            up = jnp.zeros(up_shape, dtype)
        elif version == "stable_lora":
            if site.kind == "linear":
                a_shape, fan_in = (r, site.in_features), site.in_features
                b_shape = (site.out_features, r)
            elif site.kind in ("conv2d", "conv3d"):
                a_shape = (r * k, site.in_features * k)
                fan_in = site.in_features * k
                b_shape = (site.out_features * k, r * k)
            elif site.kind == "embedding":
                # loralib Embedding init is reversed: A zeros, B ~ N(0,1)
                flat[site.flax_path + ("down",)] = jnp.zeros(
                    (r, site.in_features), dtype)
                flat[site.flax_path + ("up",)] = jax.random.normal(
                    key, (site.out_features, r), dtype)
                continue
            else:
                continue
            bound = 1.0 / (fan_in ** 0.5)
            down = jax.random.uniform(key, a_shape, dtype, -bound, bound)
            up = jnp.zeros(b_shape, dtype)
        else:
            raise ValueError(f"unknown LoRA version {version}")
        flat[site.flax_path + ("down",)] = down
        flat[site.flax_path + ("up",)] = up
    return unflatten_dict(flat)


def _delta_cloneofsimo(site: LoraSite, down, up):
    """up (out,r,...) x down (r,in,...) -> flax kernel delta."""
    if site.kind == "linear":
        w = up @ down                       # (out, in)
        return w.T                          # flax (in, out)
    # convs: 1x1 up composed with k-kernel down == single conv with
    # weight[o,i,*k] = sum_r up[o,r] down[r,i,*k]
    up2 = up.reshape(up.shape[0], up.shape[1])      # (out, r)
    down2 = down.reshape(down.shape[0], -1)         # (r, in*prod(k))
    w = (up2 @ down2).reshape((up.shape[0],) + down.shape[1:])
    if site.kind == "conv2d":              # (out,in,kh,kw)->(kh,kw,in,out)
        return w.transpose(2, 3, 1, 0)
    return w.transpose(2, 3, 4, 1, 0)      # conv3d


def _delta_stable(site: LoraSite, a, b, scaling: float):
    k = site.kernel_size
    w = b @ a                               # 2D
    if site.kind == "linear":
        return (w * scaling).T              # flax (in, out)
    if site.kind == "conv2d":
        w = w.reshape(site.out_features, site.in_features, k, k) * scaling
        return w.transpose(2, 3, 1, 0)
    if site.kind == "conv3d":
        # mean over the 4th dim of view (out,in,k,k,1)
        # (reference stable_lora/lora.py:190-197)
        w = w.reshape(site.out_features, site.in_features, k, k, 1)
        w = jnp.mean(w, axis=3, keepdims=True) * scaling  # (out,in,k,1,1)
        return w.transpose(2, 3, 4, 1, 0)
    if site.kind == "embedding":
        return (w * scaling).T              # (V, D) flax embedding layout
    raise ValueError(site.kind)


def _masked_down(down, key, rate: float):
    """Inverted-dropout Bernoulli mask on the down matrix (the overlay's
    weight-dropout approximation of the reference's branch dropout,
    reference utils/lora.py:57-62); shared by the overlay and branch paths
    so both draw the SAME mask from the same rng."""
    keep = jax.random.bernoulli(key, 1.0 - rate, down.shape)
    return down * keep / (1.0 - rate)


def prepare_branch_collection(lora_params: Dict, sites: Sequence[LoraSite],
                              scale: float = 1.0, dropout_rng=None,
                              dropout_rate: float = 0.0,
                              version: str = "cloneofsimo",
                              alpha_over_r: float = 1.0) -> Dict:
    """Fold scale/dropout into the lora tree for the BRANCH execution path
    (models/lora_layers.py): the returned tree is passed to `model.apply`
    as the "lora" variable collection, where each LoraDense/LoraConv reads
    {'down','up'} at its own scope and computes base(x) + up(down(x)).

    Both flavors: cloneofsimo uses `scale`; stable_lora (loralib) uses
    `alpha_over_r`, matching apply_lora's merged semantics.  stable_lora
    EMBEDDING sites have no branch layer (nn.Embed) and are left untouched
    in the returned collection (unread by the model) -- the caller folds
    them into params via apply_lora(only_kinds={"embedding"})."""
    eff_scale = scale if version == "cloneofsimo" else alpha_over_r
    flat = dict(flatten_dict(lora_params))
    drop_keys = None
    if dropout_rng is not None and dropout_rate > 0.0:
        drop_keys = jax.random.split(dropout_rng, max(len(sites), 1))
    for i, site in enumerate(sites):
        dk = site.flax_path + ("down",)
        uk = site.flax_path + ("up",)
        if dk not in flat:
            continue
        if site.kind == "embedding":
            continue  # folded by the caller; see docstring
        assert site.kind in ("linear", "conv2d", "conv3d"), (
            f"branch LoRA has no {site.kind} path; use apply_lora")
        if drop_keys is not None:
            flat[dk] = _masked_down(flat[dk], drop_keys[i], dropout_rate)
        if eff_scale != 1.0:
            flat[uk] = flat[uk] * eff_scale
    return unflatten_dict(flat)


def apply_lora(params: Dict, lora_params: Optional[Dict],
               sites: Sequence[LoraSite], version: str = "cloneofsimo",
               scale: float = 1.0, alpha_over_r: float = 1.0,
               dropout_rng=None, dropout_rate: float = 0.0,
               only_kinds: Optional[frozenset] = None) -> Dict:
    """Return params with LoRA deltas folded in. Jit-friendly; gradients
    flow through to the lora leaves.

    `only_kinds` restricts folding to the named site kinds while keeping
    per-site dropout rng draws indexed by position in `sites` (used by the
    branch path to fold ONLY the embedding sites the branch can't run)."""
    if lora_params is None:
        return params
    flat = dict(flatten_dict(params))
    lora_flat = flatten_dict(lora_params)
    drop_keys = None
    if dropout_rng is not None and dropout_rate > 0.0:
        drop_keys = jax.random.split(dropout_rng, max(len(sites), 1))
    for i, site in enumerate(sites):
        if only_kinds is not None and site.kind not in only_kinds:
            continue
        dk = site.flax_path + ("down",)
        uk = site.flax_path + ("up",)
        if dk not in lora_flat:
            continue
        down, up = lora_flat[dk], lora_flat[uk]
        if drop_keys is not None:
            down = _masked_down(down, drop_keys[i], dropout_rate)
        if version == "cloneofsimo":
            delta = _delta_cloneofsimo(site, down, up) * scale
        else:
            delta = _delta_stable(site, down, up, alpha_over_r)
        leaf = "embedding" if site.kind == "embedding" else "kernel"
        key = site.flax_path + (leaf,)
        flat[key] = flat[key] + delta.astype(flat[key].dtype)
    return unflatten_dict(flat)


def collapse_lora(params: Dict, lora_params: Dict,
                  sites: Sequence[LoraSite], version: str = "cloneofsimo",
                  alpha: float = 1.0) -> Dict:
    """Bake LoRA into base weights (reference utils/lora.py:781-816 /
    merge-on-eval semantics of loralib)."""
    return apply_lora(params, lora_params, sites, version=version,
                      scale=alpha, alpha_over_r=alpha)
