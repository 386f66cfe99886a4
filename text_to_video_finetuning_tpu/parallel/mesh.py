"""Device mesh construction.

The reference's only distribution strategy is data parallelism via
Accelerate/DDP/NCCL (reference train.py:518-523,661-667; SURVEY.md §2.2).
TPU-native, the equivalent (and more) is a `jax.sharding.Mesh` whose axes
ride the ICI: 'dp' (data/batch), 'fsdp' (parameter/optimizer sharding,
ZeRO-style) and 'tp' (tensor parallelism over attention heads / hidden).
XLA inserts the gradient all-reduce (the NCCL analog of
`accelerator.backward`, reference train.py:861) automatically from the
sharding annotations.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    dp: int = -1     # -1: all remaining devices
    fsdp: int = 1
    tp: int = 1
    # sequence parallelism over the FRAME axis (SURVEY §5.7: the reference
    # has no sequence-length scaling beyond serial windowing; here frames
    # shard across ICI and XLA inserts the all-to-alls at the
    # spatial<->temporal module boundaries)
    sp: int = 1


def make_mesh(config: MeshConfig = MeshConfig(),
              devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    rest = config.fsdp * config.tp * config.sp
    dp = config.dp
    if dp == -1:
        assert n % rest == 0, (
            f"{n} devices not divisible by fsdp*tp*sp={rest}")
        dp = n // rest
    assert dp * rest == n, (
        f"mesh {dp}x{config.fsdp}x{config.tp}x{config.sp} != {n} devices")
    arr = np.asarray(devices).reshape(dp, config.fsdp, config.tp, config.sp)
    return Mesh(arr, axis_names=("dp", "fsdp", "tp", "sp"))
