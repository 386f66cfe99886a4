"""Sharding rules: params over ('fsdp','tp'), batch over 'dp'.

Rules are path-pattern based, the SPMD analog of the reference's
module-level device placement. With fsdp=tp=1 everything degenerates to the
reference's pure DP replication.

TP rules (applied when mesh has tp > 1) follow the Megatron split for the
transformer sublayers of the UNet and CLIP:
  to_q/to_k/to_v, ff.net_0 (GEGLU proj), q/k/v_proj, fc1 -> split output dim
  to_out_0, ff.net_2, out_proj, fc2                      -> split input dim
Convs and norms are replicated over tp (spatial convs dominate FLOPs at low
resolution but their channel dims are small enough to replicate; attention
is the TP win at 2880-token spatial sequences).

FSDP rule: every kernel >= 2 dims is sharded over 'fsdp' on its largest
divisible axis (ZeRO-3-style), gathered on use by XLA.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from flax.traverse_util import flatten_dict, unflatten_dict
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_TP_COL = ("to_q", "to_k", "to_v", "q_proj", "k_proj", "v_proj", "fc1")
_TP_COL_PARENT = ("net_0",)   # GEGLU proj: path ends (.., net_0, proj)
_TP_ROW = ("to_out_0", "out_proj", "fc2", "net_2")


def _spec_for(path, arr, mesh: Mesh, use_fsdp: bool, use_tp: bool):
    """PartitionSpec for one param leaf."""
    parts = path[:-1]
    leaf = path[-1]
    ndim = getattr(arr, "ndim", len(getattr(arr, "shape", ())))
    shape = arr.shape
    tp = mesh.shape.get("tp", 1)
    fsdp = mesh.shape.get("fsdp", 1)

    spec = [None] * ndim
    if leaf == "kernel" and ndim >= 2 and use_tp and tp > 1:
        name = parts[-1] if parts else ""
        parent = parts[-2] if len(parts) >= 2 else ""
        if (name in _TP_COL or parent in _TP_COL_PARENT) \
                and shape[-1] % tp == 0:
            spec[-1] = "tp"
        elif name in _TP_ROW and shape[-2] % tp == 0:
            spec[-2] = "tp"
    if use_fsdp and fsdp > 1 and ndim >= 1:
        # shard the largest not-yet-sharded divisible axis
        order = sorted(range(ndim), key=lambda i: -shape[i])
        for i in order:
            if spec[i] is None and shape[i] % fsdp == 0:
                spec[i] = "fsdp"
                break
    return P(*spec)


def params_sharding(params, mesh: Mesh, use_fsdp: bool = True,
                    use_tp: bool = True):
    """Pytree of NamedShardings matching `params`."""
    flat = flatten_dict(params)
    out = {k: NamedSharding(mesh, _spec_for(k, v, mesh, use_fsdp, use_tp))
           for k, v in flat.items()}
    return unflatten_dict(out)


def replicate(mesh: Mesh):
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, batch_axis: int = 0,
                   frame_axis: Optional[int] = None):
    """Batch over 'dp'; optionally the frame axis over 'sp' (sequence
    parallelism -- XLA inserts all-to-alls where the model reshapes frames
    between the spatial fold (B*F as batch) and temporal modules)."""
    n = max(batch_axis + 1,
            (frame_axis + 1) if frame_axis is not None else 0)
    spec = [None] * n
    spec[batch_axis] = "dp"
    if frame_axis is not None and mesh.shape.get("sp", 1) > 1:
        spec[frame_axis] = "sp"
    return NamedSharding(mesh, P(*spec))


def shard_params(params, mesh: Mesh, use_fsdp: bool = True,
                 use_tp: bool = True):
    """Device-put params according to the rules."""
    shardings = params_sharding(params, mesh, use_fsdp, use_tp)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s), params, shardings)


def shard_batch(batch, mesh: Mesh):
    """Shard every array in the batch over 'dp' on axis 0."""
    s = batch_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), batch)
