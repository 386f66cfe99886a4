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
    # real exceptions, not asserts: mesh specs come straight from CLI
    # flags (mesh_from_string), must fail with the same helpful ValueError
    # whether dp is explicit or inferred, and must survive python -O
    if dp == -1:
        if n % rest != 0:
            raise ValueError(
                f"{n} devices not divisible by fsdp*tp*sp={rest}; "
                "adjust the mesh spec or omit axes (e.g. 'dp=2,sp=4')")
        dp = n // rest
    if dp * rest != n:
        raise ValueError(
            f"mesh dp={dp},fsdp={config.fsdp},tp={config.tp},"
            f"sp={config.sp} needs {dp * rest} devices, have {n}")
    arr = np.asarray(devices).reshape(dp, config.fsdp, config.tp, config.sp)
    return Mesh(arr, axis_names=("dp", "fsdp", "tp", "sp"))


def mesh_from_string(spec: str, devices=None) -> Optional[Mesh]:
    """CLI mesh syntax: 'dp=2,sp=4' -> make_mesh(MeshConfig(dp=2, sp=4)).
    Empty/whitespace spec -> None (single-device).  Unknown axis names
    raise with the valid set so a typo fails before any model load.
    An omitted dp absorbs all remaining devices (MeshConfig.dp=-1); a
    fully explicit spec smaller than the host's device count uses the
    first product-many devices (e.g. 'dp=2,sp=2' on 8 chips runs on 4)."""
    spec = (spec or "").replace(" ", "")
    if not spec:
        return None
    valid = {f.name for f in dataclasses.fields(MeshConfig)}
    kwargs = {}
    for part in spec.split(","):
        if not part:
            continue
        name, eq, val = part.partition("=")
        if name not in valid or not eq:
            raise ValueError(
                f"bad mesh spec {part!r}: expected axis=N with axis in "
                f"{sorted(valid)} (e.g. 'dp=2,sp=4')")
        try:
            size = int(val)
        except ValueError:
            raise ValueError(
                f"bad mesh spec {part!r}: axis size must be an integer "
                "(e.g. 'dp=2,sp=4')") from None
        if size < 1 and not (name == "dp" and size == -1):
            raise ValueError(
                f"bad mesh spec {part!r}: axis size must be >= 1 "
                "(dp=-1 means 'all remaining devices')")
        kwargs[name] = size
    devices = list(devices) if devices is not None else list(jax.devices())
    if kwargs.get("dp", -1) != -1:
        need = int(np.prod([kwargs.get(f.name, 1)
                            for f in dataclasses.fields(MeshConfig)]))
        if need > len(devices):
            raise ValueError(
                f"mesh spec {spec!r} needs {need} devices, "
                f"have {len(devices)}")
        devices = devices[:need]
    return make_mesh(MeshConfig(**kwargs), devices=devices)
