"""Tracing / profiling subsystem.

The reference has none (SURVEY.md §5.1: tqdm only); here step-time and MFU
meters plus `jax.profiler` trace capture are first-class.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


def unet3d_flops_per_step(config, batch: int, frames: int, height: int,
                          width: int, two_pass: bool = True,
                          backward: bool = True,
                          pass1: Optional[str] = None) -> float:
    """Approximate matmul/conv FLOPs of one train step of the 3D UNet.

    Counts conv and attention GEMMs per resolution level; backward ~ 2x
    forward; gradient checkpointing adds ~1 extra forward.

    pass1 describes the second loss pass (reference train.py:813-829):
      "full"   -- frozen text path, two_pass on: a second FULL UNet pass
      "frame1" -- trainable text path: frame-1-only second pass
      "none"   -- two_pass_loss=False
    When pass1 is None, the legacy `two_pass` bool maps to frame1/none.
    """
    if pass1 is None:
        pass1 = "frame1" if two_pass else "none"
    ch = config.block_out_channels
    h, w = height // 8, width // 8   # latent dims
    flops = 0.0
    bf = batch * frames

    def conv_flops(n, cin, cout, k=3, kt=1):
        return 2.0 * n * cin * cout * k * k * kt

    def attn_flops(tokens, dim, kv_tokens=None):
        kv = kv_tokens or tokens
        # qkv+out projections + 2 attention GEMMs
        return (2.0 * tokens * dim * dim * 3 + 2.0 * tokens * dim * dim
                + 2.0 * tokens * kv * dim * 2)

    levels = [(ch[i], h // (2 ** i), w // (2 ** i)) for i in range(len(ch))]
    for i, (c, lh, lw) in enumerate(levels):
        n = bf * lh * lw
        layers = config.layers_per_block
        # down + up resnets and temporal convs (approximate: up has +1 layer)
        flops += (2 * layers + 1) * (2 * conv_flops(n, c, c)      # resnets
                                     + 4 * conv_flops(n, c, c, k=1, kt=3))
        if i < len(levels) - 1:
            tokens = lh * lw
            spatial = attn_flops(tokens, c, kv_tokens=tokens) \
                + attn_flops(tokens, c, kv_tokens=77)
            temporal = 2 * attn_flops(frames, c) * lh * lw / frames
            flops += (2 * layers + 1) * bf * (spatial + temporal) / tokens \
                * tokens
    mult = 1.0
    if backward:
        mult += 2.0
    if pass1 == "full":
        mult *= 2.0
    elif pass1 == "frame1":
        mult *= 1.0 + 1.0 / max(frames, 1)
    return flops * mult


class StepTimer:
    """Rolling step-time + throughput + MFU meter."""

    def __init__(self, flops_per_step: Optional[float] = None,
                 peak_flops: Optional[float] = None, window: int = 20):
        self.flops_per_step = flops_per_step
        # flops_per_step covers the GLOBAL batch, so the denominator is the
        # aggregate peak of every device in the mesh, not one chip
        self.peak_flops = (peak_flops
                           or _device_peak_flops() * jax.device_count())
        self.window = window
        self._times = []
        self._last = None

    def tick(self):
        now = time.perf_counter()
        if self._last is not None:
            self._times.append(now - self._last)
            if len(self._times) > self.window:
                self._times.pop(0)
        self._last = now

    @property
    def step_time(self) -> float:
        return sum(self._times) / len(self._times) if self._times else 0.0

    @property
    def steps_per_sec(self) -> float:
        st = self.step_time
        return 1.0 / st if st > 0 else 0.0

    @property
    def mfu(self) -> float:
        if not self.flops_per_step or not self.peak_flops or not self._times:
            return 0.0
        return (self.flops_per_step / self.step_time) / self.peak_flops

    def stats(self):
        return {"step_time_s": self.step_time,
                "steps_per_sec": self.steps_per_sec, "mfu": self.mfu}


def _device_peak_flops() -> float:
    """bf16 peak FLOPs of the local device (rough table)."""
    try:
        kind = jax.devices()[0].device_kind.lower()
    except Exception:
        return 0.0
    table = {
        "v4": 275e12, "v5 lite": 197e12, "v5litepod": 197e12,
        "v5e": 197e12, "v5p": 459e12, "v6": 918e12, "v6e": 918e12,
    }
    for name, flops in table.items():
        if name in kind:
            return flops
    return 0.0


@contextlib.contextmanager
def profiler_trace(log_dir: str, enabled: bool = True):
    """Capture a jax.profiler trace (view with tensorboard/xprof)."""
    if not enabled:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
