"""YAML config schema.

Behavioral spec: the reference's config surface is exactly the kwargs of
`train.py:main()` (reference train.py:457-513) splatted from a flat YAML
(reference train.py:986-991), with two nested dicts `train_data` and
`validation_data` (reference configs/v2/train_config.yaml).  The same keys
are accepted here; TPU-specific extras (mesh shape, compute dtype, attention
backend) are additive and default to single-chip DP.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Optional, Tuple

import yaml


@dataclasses.dataclass
class TrainConfig:
    # -- reference keys (reference train.py:457-513) ------------------------
    pretrained_model_path: str = ""
    output_dir: str = "./outputs"
    train_data: Dict[str, Any] = dataclasses.field(default_factory=dict)
    validation_data: Dict[str, Any] = dataclasses.field(default_factory=dict)
    extra_train_data: List[Any] = dataclasses.field(default_factory=list)
    dataset_types: Tuple[str, ...] = ("json",)
    shuffle: bool = True
    validation_steps: int = 100
    trainable_modules: Optional[Tuple[str, ...]] = None
    trainable_text_modules: Optional[Tuple[str, ...]] = None
    extra_unet_params: Optional[Dict[str, Any]] = None
    extra_text_encoder_params: Optional[Dict[str, Any]] = None
    train_batch_size: int = 1
    max_train_steps: int = 500
    learning_rate: float = 5e-5
    scale_lr: bool = False
    lr_scheduler: str = "constant"
    lr_warmup_steps: int = 0
    adam_beta1: float = 0.9
    adam_beta2: float = 0.999
    adam_weight_decay: float = 1e-2
    adam_epsilon: float = 1e-8
    max_grad_norm: float = 1.0
    gradient_accumulation_steps: int = 1
    gradient_checkpointing: bool = False
    text_encoder_gradient_checkpointing: bool = False
    checkpointing_steps: int = 500
    # on SIGTERM (TPU-pod preemption notice) finish the in-flight step,
    # write a resumable checkpoint-<step>, and exit cleanly (beyond the
    # reference, which dies without saving; resume via
    # resume_from_checkpoint as usual)
    save_on_preemption: bool = True
    resume_from_checkpoint: Optional[str] = None
    resume_step: Optional[int] = None
    mixed_precision: Optional[str] = "bf16"   # fp16 requests map to bf16
    use_8bit_adam: bool = False
    enable_xformers_memory_efficient_attention: bool = True
    enable_torch_2_attn: bool = False
    seed: Optional[int] = None
    train_text_encoder: bool = False
    use_offset_noise: bool = False
    rescale_schedule: bool = False
    offset_noise_strength: float = 0.1
    extend_dataset: bool = False
    cache_latents: bool = False
    cached_latent_dir: Optional[str] = None
    lora_version: str = "cloneofsimo"
    save_lora_for_webui: bool = False
    only_lora_for_webui: bool = False
    lora_bias: str = "none"
    use_unet_lora: bool = False
    use_text_lora: bool = False
    unet_lora_modules: Tuple[str, ...] = ("ResnetBlock2D",)
    text_encoder_lora_modules: Tuple[str, ...] = ("CLIPEncoderLayer",)
    save_pretrained_model: bool = True
    lora_rank: int = 16
    lora_path: str = ""
    lora_unet_dropout: float = 0.1
    lora_text_dropout: float = 0.1
    logger_type: str = "tensorboard"
    # -- TPU-native extras ---------------------------------------------------
    mesh_dp: int = -1           # -1: all devices on the data axis
    mesh_fsdp: int = 1
    mesh_tp: int = 1
    mesh_sp: int = 1            # sequence (frame-axis) parallelism
    attention_backend: str = "auto"   # auto | xla | pallas
    # grad-ckpt saveable set: nothing | dots | conv_outs | conv_attn |
    # conv_attn_dense | conv_dots, optionally with a "+skiplow"/"+skiplowN"
    # suffix (no remat on the N smallest-activation deepest levels; the
    # shipped configs and bench.py default to conv_attn_dense+skiplow3;
    # at hires geometries (576x320+) prefer conv_attn+skiplow -- measured
    # fastest there, and the skiplow3 sets exceed compile-service memory,
    # benchmarks/RESULTS.md hires table) --
    # see models/unet3d_blocks.py REMAT_POLICIES and models/unet3d.py
    remat_policy: str = "nothing"
    fused_groupnorm: bool = False     # pallas one-pass GroupNorm+SiLU
    # cloneofsimo LoRA as the reference's branch form (base + up(down(x)))
    # in the train step: avoids full weight-grad convs for LoRA'd kernels
    # (models/lora_layers.py); False falls back to the merged overlay
    lora_branch: bool = True
    # False skips the reference's redundant second UNet pass when the text
    # encoder is frozen (~2x faster LoRA steps, expectation-equal gradients)
    two_pass_loss: bool = True
    # Compile the two loss passes as SEPARATE XLA programs (plus a small
    # optimizer-update program) instead of one fused step: same numerics,
    # roughly half the peak compile-time memory.  Use at geometries where
    # the fused two-pass graph breaks the compile service (e.g. 16-frame
    # 576x320 -- benchmarks/RESULTS.md); ignored when only one pass runs.
    split_two_pass: bool = False
    eval_train: bool = False
    profile_steps: int = 0      # if >0, capture a jax profiler trace
    # keep only the newest N checkpoint-<step> dirs (None: keep all, the
    # reference behavior); pruning runs after each periodic save
    checkpoints_total_limit: Optional[int] = None
    # if >0, skip optimizer updates whose gradients contain NaN/inf
    # (params + Adam moments untouched); after that many CONSECUTIVE
    # skips the update is let through (divergence stays visible as NaN
    # loss).  0 disables (reference behavior: NaNs propagate immediately)
    skip_nonfinite_updates: int = 0
    # EMA shadow of the trainable params, blended once per optimizer
    # update; saved pipelines and validation samples use the EMA weights
    # (the TrainState keeps both, so resume is still bit-exact)
    use_ema: bool = False
    ema_decay: float = 0.9999
    # unknown YAML keys land here (reference **kwargs semantics)
    extra_kwargs: Dict[str, Any] = dataclasses.field(default_factory=dict)


def load_train_config(path: str) -> TrainConfig:
    with open(path) as f:
        raw = yaml.safe_load(f) or {}
    return train_config_from_dict(raw)


def train_config_from_dict(raw: Dict[str, Any]) -> TrainConfig:
    fields = {f.name for f in dataclasses.fields(TrainConfig)}
    known = {k: v for k, v in raw.items() if k in fields}
    extra = {k: v for k, v in raw.items() if k not in fields}
    cfg = TrainConfig(**known)
    cfg.extra_kwargs = extra
    # reference knob mapping: xformers/sdp -> fused attention backend
    if cfg.mixed_precision == "fp16":
        # bf16 is the TPU-native half precision; fp16 configs run as bf16
        cfg.mixed_precision = "bf16"
    return cfg


def save_config(cfg: TrainConfig, path: str):
    d = dataclasses.asdict(cfg)
    extra = d.pop("extra_kwargs", {})
    d.update(extra)
    with open(path, "w") as f:
        yaml.safe_dump(d, f, sort_keys=False)
