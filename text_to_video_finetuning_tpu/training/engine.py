"""Training engine: config -> run orchestration.

Behavioral spec: `train.py main()` (reference train.py:457-984) -- model
load/freeze, LoRA injection, optimizer param assembly with LoRA negation,
dataset assembly/extension, latent caching, the epoch/step loop with
gradient accumulation, grad clip, loss gathering, validation sampling, and
checkpointing -- rebuilt as a single jitted SPMD train step over a device
mesh (the Accelerate/DDP layer maps to sharding annotations; XLA emits the
gradient all-reduce the reference gets from `accelerator.backward`,
reference train.py:861).
"""

from __future__ import annotations

import datetime
import logging
import math
import os
import shutil
import signal
import threading
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import TrainConfig, save_config, train_config_from_dict
from ..data import (CachedDataset, ConcatDataset, DataLoader,
                    extend_datasets, get_train_dataset)
from ..data.video import export_to_video
from ..lora.handler import LoraHandler
from ..lora.overlay import collapse_lora
from ..models.clip_text import CLIPTextModel
from ..models.unet3d import UNet3DConditionModel
from ..models.vae import AutoencoderKL
from ..parallel import (batch_sharding, make_mesh, MeshConfig, replicate,
                        shard_params)
from ..pipelines.text_to_video import TextToVideoSDPipeline
from ..schedulers.ddpm import DDPMScheduler
from ..utils import checkpoint as ckpt
from ..utils import train_state_io
from ..utils.background import OneInFlight
from ..utils.profiling import StepTimer, unet3d_flops_per_step
from ..utils.pytree import merge, tree_size
from .optim import get_lr_schedule, get_optimizer
from .train_step import (TrainState, TrainStepConfig,
                         make_split_train_step, make_train_step)
from .trainable import select_trainable

logger = logging.getLogger("t2v_tpu")


def create_output_folders(output_dir: str, cfg: TrainConfig) -> str:
    now = datetime.datetime.now().strftime("%Y-%m-%dT%H-%M-%S")
    if jax.process_count() > 1:
        # all hosts must agree on the run directory name; use process 0's
        # timestamp (hosts' clocks can straddle a second boundary)
        from jax.experimental import multihost_utils
        buf = np.frombuffer(now.encode().ljust(32), dtype=np.uint8).copy()
        buf = multihost_utils.broadcast_one_to_all(buf)
        now = bytes(np.asarray(buf)).decode().strip()
    out_dir = os.path.join(output_dir, f"train_{now}")
    os.makedirs(out_dir, exist_ok=True)
    os.makedirs(f"{out_dir}/samples", exist_ok=True)
    if jax.process_index() == 0:
        save_config(cfg, os.path.join(out_dir, "config.yaml"))
    return out_dir


def load_primary_models(pretrained_model_path: str):
    """reference train.py:118-125: scheduler, tokenizer, text encoder, vae,
    unet from a diffusers pipeline directory."""
    from transformers import CLIPTokenizer
    scheduler_config = ckpt.load_scheduler_config(
        os.path.join(pretrained_model_path, "scheduler"))
    tokenizer = CLIPTokenizer.from_pretrained(
        os.path.join(pretrained_model_path, "tokenizer"))
    clip_config, text_params = ckpt.load_text_encoder(
        os.path.join(pretrained_model_path, "text_encoder"))
    vae_config, vae_params = ckpt.load_vae(
        os.path.join(pretrained_model_path, "vae"))
    unet_config, unet_params = ckpt.load_unet(
        os.path.join(pretrained_model_path, "unet"))
    return (scheduler_config, tokenizer, (clip_config, text_params),
            (vae_config, vae_params), (unet_config, unet_params))


def resolve_attention_backend(cfg: TrainConfig) -> str:
    """reference handle_memory_attention (train.py:154-170): both knobs pick
    a fused attention kernel; here they select the Pallas flash backend."""
    if cfg.attention_backend != "auto":
        return cfg.attention_backend
    if (cfg.enable_xformers_memory_efficient_attention
            or cfg.enable_torch_2_attn):
        return "auto"   # auto picks pallas for flash-worthy shapes
    return "xla"


def should_skip_resume_step(cfg: "TrainConfig", epoch: int,
                            step: int) -> bool:
    """Reference train.py:843: when resuming, skip the first `resume_step`
    batches of the FIRST epoch only (later epochs run in full)."""
    return bool(cfg.resume_from_checkpoint and epoch == 0
                and cfg.resume_step and step < cfg.resume_step)


def should_sample(global_step, validation_steps, validation_data) -> bool:
    return ((global_step % validation_steps == 0 or global_step == 1)
            and validation_data.get("sample_preview", False))


def handle_cache_latents(cfg: TrainConfig, output_dir: str, loader,
                         vae: AutoencoderKL, vae_params,
                         global_batch_size: Optional[int] = None):
    """reference train.py:266-314: one VAE-encode pass over the dataset,
    cached to disk, then a cached-latent loader (num_workers=0).  Unlike the
    reference (which assumes caching batch size 1, train.py:297), every item
    in the batch is cached."""
    if not cfg.cache_latents:
        return None
    n_proc, proc = jax.process_count(), jax.process_index()
    if cfg.cached_latent_dir is not None:
        # pre-built shared cache: shard it across hosts at load time
        cache_dir = os.path.abspath(cfg.cached_latent_dir)
        shards = (n_proc, proc)
        local_bs = global_batch_size or cfg.train_batch_size
    else:
        # fresh cache: each host encodes (and later reads) only its own
        # shard of the dataset, so the directory is host-local
        cache_dir = f"{output_dir}/cached_latents"
        if n_proc > 1:
            cache_dir = f"{cache_dir}/host{proc}"
        shards = (1, 0)
        gbs = global_batch_size or cfg.train_batch_size
        if gbs % n_proc != 0:
            raise ValueError(
                f"global batch size {gbs} is not divisible by the process "
                f"count {n_proc}; every host must supply the same number of "
                "rows to the dp-sharded global batch")
        local_bs = gbs // n_proc
        os.makedirs(cache_dir, exist_ok=True)
        encode = jax.jit(lambda p, x, k: vae.apply(
            {"params": p}, x, rng=k, method=AutoencoderKL.encode))
        rng = jax.random.PRNGKey(cfg.seed or 0)
        # iterate the DATASET (not the padded training loader, whose
        # wrap-around pad would bake duplicate items into the cache);
        # hosts stride-shard the items
        dataset = loader.dataset
        from ..data import native as dnative
        ext = dnative.CACHE_EXT   # T2VC binary container (native/dataio.cpp)
        written = 0
        for idx in range(proc, len(dataset), n_proc):
            item = dataset[idx]
            rng, key = jax.random.split(rng)
            px = jnp.asarray(item["pixel_values"])       # (F, C, H, W)
            lat = encode(vae_params, px, key) * 0.18215  # (F, 4, h, w)
            lat = jnp.transpose(lat, (1, 0, 2, 3))       # (C, F, h, w)
            dnative.cache_write_item(
                f"{cache_dir}/cached_{written}{ext}",
                np.asarray(lat, dtype=np.float32),
                np.asarray(item["prompt_ids"]), item["text_prompt"])
            written += 1
        # pad every host's shard to a COMMON item count (repeat the last
        # item, as the wrap-pad loader does for batches): when len(dataset)
        # is not divisible by process_count, hosts would otherwise see
        # different batch counts per epoch and desync the SPMD loop
        per_host = max(1, math.ceil(len(dataset) / n_proc))
        if written == 0:
            raise ValueError(
                f"host {proc} received no dataset items to cache "
                f"(dataset has {len(dataset)} items, {n_proc} hosts)")
        import shutil
        while written < per_host:
            shutil.copyfile(f"{cache_dir}/cached_{written - 1}{ext}",
                            f"{cache_dir}/cached_{written}{ext}")
            written += 1
    # preserve the training loader's shape-grouped batching: cached items
    # keep their per-bucket (h, w), and stacking mixed shapes would fail
    return DataLoader(CachedDataset(cache_dir=cache_dir),
                      batch_size=local_bs, shuffle=False, num_workers=0,
                      pad_last=True, num_shards=shards[0],
                      shard_index=shards[1],
                      bucket_batching=getattr(loader, "bucket_batching",
                                              False))


def save_pipe(cfg: TrainConfig, output_dir: str, global_step: int,
              pretrained_model_path: str, models, params, lora_state,
              lora_manager: LoraHandler, is_checkpoint: bool):
    """reference save_pipe (train.py:395-449): write a full diffusers
    pipeline dir + LoRA sidecar files.  cloneofsimo saves the pipeline with
    LoRA collapsed into base weights (reference utils/lora_handler.py:303)."""
    if is_checkpoint:
        save_path = os.path.join(output_dir, f"checkpoint-{global_step}")
        os.makedirs(save_path, exist_ok=True)
    else:
        save_path = output_dir

    unet_cfg, clip_cfg, vae_cfg, scheduler_cfg = (
        models["unet_config"], models["clip_config"], models["vae_config"],
        models["scheduler_config"])
    unet_params = params["unet"]
    text_params = params["text"]

    if lora_manager.use_lora:
        lora_manager.save_lora_weights(
            save_path, global_step,
            unet_lora=lora_state.get("unet_lora"),
            unet_sites=lora_state.get("unet_sites", ()),
            text_lora=lora_state.get("text_lora"),
            text_sites=lora_state.get("text_sites", ()))
        if lora_manager.is_cloneofsimo_lora():
            if lora_state.get("unet_lora") is not None:
                unet_params = collapse_lora(
                    unet_params, lora_state["unet_lora"],
                    lora_state["unet_sites"], lora_manager.version)
            if lora_state.get("text_lora") is not None:
                text_params = collapse_lora(
                    text_params, lora_state["text_lora"],
                    lora_state["text_sites"], lora_manager.version)

    if cfg.save_pretrained_model:
        ckpt.save_pipeline(
            save_path,
            unet=(unet_cfg, unet_params),
            vae=(vae_cfg, params["vae"]),
            text_encoder=(clip_cfg, text_params),
            scheduler_config=scheduler_cfg,
            tokenizer_dir=os.path.join(pretrained_model_path, "tokenizer"))
    logger.info(f"Saved model at {save_path} on step {global_step}")


def prune_checkpoints(output_dir: str, limit: Optional[int],
                      in_flight_step: int):
    """Keep only the newest `limit` `checkpoint-<step>` dirs (diffusers
    `checkpoints_total_limit` semantics — the reference keeps every one).
    The dir written THIS step is never pruned: the async savers own it,
    and any earlier in-flight write was already joined before this save
    started (OneInFlight / AsyncTrainStateSaver are one-in-flight)."""
    if not limit or limit < 1:
        return
    steps = []
    for name in os.listdir(output_dir):
        if not name.startswith("checkpoint-"):
            continue
        try:
            steps.append(int(name.split("-", 1)[1]))
        except ValueError:
            continue
    steps.sort()
    for s in (steps[:-limit] if len(steps) > limit else []):
        if s == in_flight_step:
            continue
        shutil.rmtree(os.path.join(output_dir, f"checkpoint-{s}"),
                      ignore_errors=True)
        logger.info(f"Pruned checkpoint-{s} (checkpoints_total_limit="
                    f"{limit})")


def maybe_init_distributed():
    """Multi-host: bring up the JAX distributed service when a coordinator
    is configured (TPU pods set this via environment; single-host runs are
    untouched).  This is the DCN analog of the reference's NCCL process
    group init (reference train.py:518-523).

    Must run before ANY backend-initializing jax call (including
    jax.process_count()), so the only gate is the env var; initialize()
    itself raises cleanly if called twice.

    jax.distributed.initialize() only auto-detects Slurm / Open MPI / TPU
    -metadata environments; on a plain multi-host launcher the process
    topology arrives via JAX_NUM_PROCESSES / JAX_PROCESS_ID next to the
    coordinator address, so pass them explicitly when present (exercised
    for real by tests/test_multiprocess.py: 2 OS processes over the
    coordination service on CPU)."""
    coord = (os.environ.get("JAX_COORDINATOR_ADDRESS")
             or os.environ.get("COORDINATOR_ADDRESS"))
    if not coord:
        return
    nproc = os.environ.get("JAX_NUM_PROCESSES")
    pid = os.environ.get("JAX_PROCESS_ID")
    try:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(nproc) if nproc is not None else None,
            process_id=int(pid) if pid is not None else None)
    except RuntimeError as e:
        # already initialized (e.g. caller did it), or backend already up
        logger.warning(f"jax.distributed.initialize skipped: {e}")
    if jax.process_count() > 1:
        # barrier over every device: fails fast if a host is missing, and
        # establishes the all-device communicator clique while the hosts
        # are still in lockstep -- the first *training-step* collective
        # otherwise creates it after each host's independent compile, and
        # compile-time skew between hosts can exceed the transport's
        # context-handshake timeout (observed with Gloo's 30 s limit in
        # tests/test_multiprocess.py)
        from jax.experimental import multihost_utils
        multihost_utils.sync_global_devices("t2v:post_init")


def _aot_compile_and_barrier(jit_fn, *args):
    """Multi-host: compile the train step ahead-of-time, then rendezvous at
    a HOST-SIDE coordination-service barrier before the first execution.

    Each host compiles the SPMD step independently; compile-time skew
    between hosts can exceed the collective transport's context-handshake
    timeout (observed: Gloo's 30 s limit in tests/test_multiprocess.py;
    the same hazard exists for NCCL/DCN bring-up on real clusters).  The
    explicit .lower().compile() pays the compile here and populates the
    persistent compilation cache, so the subsequent jit call re-materializes
    the executable from disk in seconds (AOT compile does NOT seed jit's
    in-memory executable cache -- the CLIs enable the persistent cache, and
    without it the cost is one redundant compile, still bounded-skew) and
    every host enters the first collective in lockstep.  The barrier rides
    the gRPC coordination service (1 h timeout), not a device collective --
    a device barrier would itself be a fresh executable with the same
    handshake hazard.

    Split-compile steps (make_split_train_step) are plain closures without
    .lower(); they expose the same pre-compile via an `aot_lower` attribute
    that lowers their big gradient sub-programs."""
    aot = getattr(jit_fn, "aot_lower", None)
    if aot is not None:
        aot(*args)
    else:
        jit_fn.lower(*args).compile()
    try:
        from jax._src import distributed
        client = distributed.global_state.client
        if client is not None:
            client.wait_at_barrier("t2v:step_compiled", 3_600_000)
            return
    except Exception as e:                          # pragma: no cover
        logger.warning(f"coordination-service barrier unavailable ({e}); "
                       "falling back to a device barrier")
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices("t2v:step_compiled")


def _put_global_batch(arr, sharding):
    """Assemble a globally-sharded batch array.  Single-host: plain
    device_put.  Multi-host: each process contributes its local slice
    (loaded by its shard of the DataLoader) and XLA addresses the rest
    over DCN."""
    if jax.process_count() == 1:
        return jax.device_put(arr, sharding)
    return jax.make_array_from_process_local_data(sharding, np.asarray(arr))


def main(**kwargs):
    cfg = (kwargs.pop("config") if "config" in kwargs
           and isinstance(kwargs.get("config"), TrainConfig)
           else train_config_from_dict(kwargs))
    logging.basicConfig(level=logging.INFO)
    maybe_init_distributed()

    output_dir = create_output_folders(cfg.output_dir, cfg)
    # host-side artifact writes (tensorboard, checkpoints, samples) happen
    # on process 0 only: every process holds the full replicated state, so
    # concurrent writes to shared storage would race (reference equivalent:
    # accelerator.is_main_process gating, reference train.py:536,700,910)
    is_main = jax.process_index() == 0
    writer = None
    if cfg.logger_type == "tensorboard" and is_main:
        try:
            from tensorboardX import SummaryWriter
            writer = SummaryWriter(os.path.join(output_dir, "logs"))
        except Exception as e:
            # surface it: a silent None writer means a run the user believes
            # is logged writes nothing, discovered only hours later
            logging.getLogger(__name__).warning(
                "tensorboardX unavailable (%s); training metrics will NOT "
                "be logged to %s", e, os.path.join(output_dir, "logs"))

    # mesh (the Accelerate process-group analog)
    mesh = make_mesh(MeshConfig(dp=cfg.mesh_dp, fsdp=cfg.mesh_fsdp,
                                tp=cfg.mesh_tp, sp=cfg.mesh_sp))
    n_devices = int(np.prod(list(mesh.shape.values())))

    # models
    (scheduler_config, tokenizer, (clip_config, text_params),
     (vae_config, vae_params), (unet_config, unet_params)) = \
        load_primary_models(cfg.pretrained_model_path)

    compute_dtype = (jnp.bfloat16 if cfg.mixed_precision in ("fp16", "bf16")
                     else jnp.float32)
    backend = resolve_attention_backend(cfg)
    unet = UNet3DConditionModel(config=unet_config, dtype=compute_dtype,
                                gradient_checkpointing=
                                cfg.gradient_checkpointing,
                                remat_policy=cfg.remat_policy,
                                fused_groupnorm=cfg.fused_groupnorm,
                                attention_backend=backend)
    text_encoder = CLIPTextModel(
        config=clip_config, dtype=compute_dtype,
        gradient_checkpointing=cfg.text_encoder_gradient_checkpointing)
    vae = AutoencoderKL(config=vae_config, dtype=compute_dtype)
    noise_scheduler = DDPMScheduler(scheduler_config)
    if not cfg.use_offset_noise and cfg.rescale_schedule:
        noise_scheduler = noise_scheduler.rescale_betas_zero_snr()

    learning_rate = cfg.learning_rate
    if cfg.scale_lr:
        # reference train.py:548-551: lr x accum x per-process batch x
        # num_processes; the process count analog is the 'dp' axis extent
        learning_rate = (learning_rate * cfg.gradient_accumulation_steps
                         * cfg.train_batch_size * mesh.shape["dp"])

    # LoRA
    lora_manager = LoraHandler(
        version=cfg.lora_version, use_unet_lora=cfg.use_unet_lora,
        use_text_lora=cfg.use_text_lora,
        save_for_webui=cfg.save_lora_for_webui,
        only_for_webui=cfg.only_lora_for_webui,
        unet_replace_modules=cfg.unet_lora_modules,
        text_encoder_replace_modules=cfg.text_encoder_lora_modules,
        lora_bias=cfg.lora_bias)
    rng = jax.random.PRNGKey(cfg.seed if cfg.seed is not None else 0)
    rng, k1, k2 = jax.random.split(rng, 3)
    unet_lora, unet_sites, unet_negation = lora_manager.add_lora_to_model(
        cfg.use_unet_lora, "unet", unet_config,
        dropout=cfg.lora_unet_dropout, lora_path=cfg.lora_path,
        r=cfg.lora_rank, rng=k1)
    text_lora, text_sites, text_negation = lora_manager.add_lora_to_model(
        cfg.use_text_lora, "text_encoder", clip_config,
        dropout=cfg.lora_text_dropout, lora_path=cfg.lora_path,
        r=cfg.lora_rank, rng=k2)

    # trainable selection (reference handle_trainable_modules + negation)
    unet_trainable, unet_frozen = select_trainable(
        unet_params, "unet", cfg.trainable_modules, unet_negation)
    text_modules = (cfg.trainable_text_modules
                    if cfg.train_text_encoder else None)
    text_trainable, text_frozen = select_trainable(
        text_params, "text_encoder", text_modules, text_negation)

    # reference train.py:680-686: frozen models run in half precision
    # (trainable params stay fp32 = classic mixed precision); storing the
    # frozen 1.4B-param tree in bf16 also halves its HBM read traffic per
    # UNet pass and removes the per-layer fp32->bf16 converts
    if compute_dtype == jnp.bfloat16:
        cast = lambda t: jax.tree_util.tree_map(
            lambda x: x.astype(np.float32).astype(jnp.bfloat16)
            if hasattr(x, "astype") else x, t)
        unet_frozen = cast(unet_frozen)
        text_frozen = cast(text_frozen)
        vae_params = cast(vae_params)

    trainable = {}
    if unet_trainable:
        trainable["unet"] = unet_trainable
    if text_trainable:
        trainable["text"] = text_trainable
    if unet_lora is not None:
        trainable["unet_lora"] = unet_lora
    if text_lora is not None:
        trainable["text_lora"] = text_lora
    if not trainable:
        raise ValueError(
            "nothing to train: set trainable_modules or enable LoRA")
    frozen = {"unet": unet_frozen, "text": text_frozen}

    logger.info(f"devices={n_devices} mesh={dict(mesh.shape)} "
                f"trainable params={tree_size(trainable):,} "
                f"frozen={tree_size(frozen) + tree_size(vae_params):,}")

    # optimizer
    schedule = get_lr_schedule(cfg.lr_scheduler, learning_rate,
                               cfg.lr_warmup_steps, cfg.max_train_steps)
    # per-model hyperparam overrides (reference extra_unet_params /
    # extra_text_encoder_params, applied to the base AND lora groups)
    group_overrides = {}
    if cfg.extra_unet_params:
        group_overrides["unet"] = dict(cfg.extra_unet_params)
        group_overrides["unet_lora"] = dict(cfg.extra_unet_params)
    if cfg.extra_text_encoder_params:
        group_overrides["text"] = dict(cfg.extra_text_encoder_params)
        group_overrides["text_lora"] = dict(cfg.extra_text_encoder_params)
    optimizer = get_optimizer(
        schedule, cfg.adam_beta1, cfg.adam_beta2, cfg.adam_weight_decay,
        cfg.adam_epsilon, cfg.max_grad_norm, cfg.use_8bit_adam,
        group_overrides=group_overrides or None, base_lr=learning_rate)
    if cfg.gradient_accumulation_steps > 1:
        optimizer = optax.MultiSteps(
            optimizer, every_k_schedule=cfg.gradient_accumulation_steps)
    if cfg.skip_nonfinite_updates:
        # bf16 production guard: a micro-batch whose gradients contain
        # NaN/inf is dropped whole (params, Adam moments AND the
        # accumulation window untouched) instead of poisoning the weights;
        # after N CONSECUTIVE bad micro-batches optax gives up and lets the
        # NaN through, so a genuinely diverged run still surfaces as NaN
        # loss rather than spinning forever.  The guard must wrap OUTSIDE
        # MultiSteps: its accumulator resets by multiplying with zero, so
        # one NaN that reaches it sticks forever (0*NaN=NaN) -- checking
        # each micro-gradient keeps NaNs out of the accumulator entirely
        # (a dropped micro-batch defers the window's update by one step).
        optimizer = optax.apply_if_finite(
            optimizer, max_consecutive_errors=cfg.skip_nonfinite_updates)

    # datasets
    train_datasets = get_train_dataset(cfg.dataset_types, cfg.train_data,
                                       tokenizer)
    try:
        for ds in (cfg.extra_train_data or []):
            train_datasets += get_train_dataset(
                ds["dataset_types"], ds["train_data"], tokenizer)
    except Exception as e:
        print(f"Could not process extra train datasets due to an error : "
              f"{e}")
    extend_datasets(train_datasets,
                    ["train_data", "frames", "image_dir", "video_files"],
                    extend=cfg.extend_dataset)
    train_dataset = (train_datasets[0] if len(train_datasets) == 1
                     else ConcatDataset(train_datasets))
    # train_batch_size is per-device (reference DDP: per-process batch x
    # num_processes, train.py:548-551); the jitted SPMD step consumes one
    # global batch sharded over 'dp', padded by wrap-around like torch's
    # DistributedSampler so the compiled shape is fixed
    dp_size = mesh.shape["dp"]
    global_batch_size = cfg.train_batch_size * dp_size
    if global_batch_size % jax.process_count() != 0:
        raise ValueError(
            f"global batch size {global_batch_size} (train_batch_size "
            f"{cfg.train_batch_size} x dp {dp_size}) must be divisible by "
            f"the process count {jax.process_count()}: every host supplies "
            "an equal slice of the dp-sharded global batch")
    # aspect bucketing emits a small set of (H, W) shapes; group batches by
    # shape so the jitted step compiles once per bucket (SURVEY §7)
    use_bucketing = bool((cfg.train_data or {}).get("use_bucketing")) or any(
        bool((ds.get("train_data") or {}).get("use_bucketing"))
        for ds in (cfg.extra_train_data or []))
    if use_bucketing and jax.process_count() > 1:
        # shape-grouped batching is a host-local decision; on multi-host
        # meshes every host must emit the same batch sequence, so fall back
        # to plain batching (datasets still resize to bucket shapes -- a
        # single-aspect source stays stackable; mixed aspects need
        # fixed-size train_data on multi-host)
        logger.warning(
            "use_bucketing: shape-grouped batch ordering is single-host "
            "only; disabling bucket batching for this multi-host run")
        use_bucketing = False
    train_dataloader = DataLoader(train_dataset,
                                  batch_size=global_batch_size,
                                  shuffle=cfg.shuffle,
                                  seed=cfg.seed or 0, pad_last=True,
                                  num_shards=jax.process_count(),
                                  shard_index=jax.process_index(),
                                  bucket_batching=use_bucketing)

    cached = handle_cache_latents(cfg, output_dir, train_dataloader, vae,
                                  vae_params,
                                  global_batch_size=global_batch_size)
    if cached is not None:
        train_dataloader = cached

    # train step
    step_cfg = TrainStepConfig(
        unet=unet, text_encoder=text_encoder, vae=vae,
        scheduler=noise_scheduler,
        unet_sites=tuple(unet_sites), text_sites=tuple(text_sites),
        lora_version=cfg.lora_version,
        lora_branch=cfg.lora_branch,
        lora_unet_dropout=cfg.lora_unet_dropout,
        lora_text_dropout=cfg.lora_text_dropout,
        cache_latents=cfg.cache_latents,
        use_offset_noise=cfg.use_offset_noise,
        rescale_schedule=cfg.rescale_schedule,
        offset_noise_strength=cfg.offset_noise_strength,
        scaling_factor=vae_config.scaling_factor,
        mixed_precision=cfg.mixed_precision,
        eval_train=bool(cfg.eval_train),
        two_pass=cfg.two_pass_loss,
        ema_decay=(cfg.ema_decay if cfg.use_ema else 0.0),
        ema_every=cfg.gradient_accumulation_steps)
    train_step = make_train_step(step_cfg, optimizer)

    # shard: params replicated (fsdp shards if configured), batch over dp
    with mesh:
        rng, state_rng = jax.random.split(rng)
        state = TrainState(step=jnp.zeros((), jnp.int32),
                           trainable=trainable,
                           opt_state=optimizer.init(trainable),
                           rng=state_rng,
                           # distinct buffers: the step donates the state,
                           # aliased ema/trainable leaves would double-free
                           ema=(jax.tree_util.tree_map(jnp.copy, trainable)
                                if cfg.use_ema else None))
        use_fsdp = cfg.mesh_fsdp > 1
        state = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, replicate(mesh)), state)
        # full-state resume (step + Adam moments + rng), which the reference
        # cannot do (SURVEY.md §5.4: optimizer state is not saved there)
        if (cfg.resume_from_checkpoint
                and train_state_io.has_train_state(
                    cfg.resume_from_checkpoint)):
            state = train_state_io.load_train_state(
                cfg.resume_from_checkpoint, state)
            logger.info(f"Restored train state (step "
                        f"{int(jax.device_get(state.step))}) from "
                        f"{cfg.resume_from_checkpoint}")
        frozen = shard_params(frozen, mesh, use_fsdp=use_fsdp, use_tp=False)
        vae_params_d = shard_params(vae_params, mesh, use_fsdp=False,
                                    use_tp=False)
        # frame axis: (B, 4, F, h, w) cached latents vs (B, F, C, H, W) raw
        data_sharding = batch_sharding(
            mesh, frame_axis=2 if cfg.cache_latents else 1)
        ids_sharding = batch_sharding(mesh)

        # split_two_pass: compile each loss pass as its own XLA program
        # (same numerics -- grad linearity + shared rng splits; see
        # make_split_train_step).  Only useful when a second pass actually
        # runs; otherwise the fused step is one program anyway.
        second_pass_runs = cfg.two_pass_loss or ("text" in trainable) or (
            "text_lora" in trainable)
        if cfg.split_two_pass and second_pass_runs:
            logger.info("split_two_pass: compiling the two loss passes "
                        "as separate XLA programs")
            jit_step = make_split_train_step(step_cfg, optimizer)
        else:
            jit_step = jax.jit(train_step, donate_argnums=(0,))

        # epochs sized in MICRO-batches: an optimizer update may span epoch
        # boundaries when len(loader) < gradient_accumulation_steps.
        # len(loader) is an UPPER BOUND under bucket batching (each bucket
        # drops its partial remainder), so this count is a log-line
        # estimate only -- the loop below runs until max_train_steps
        total_micro = cfg.max_train_steps * cfg.gradient_accumulation_steps
        num_train_epochs = math.ceil(total_micro
                                     / max(len(train_dataloader), 1))
        num_update_steps_per_epoch = math.ceil(
            len(train_dataloader) / cfg.gradient_accumulation_steps)
        total_batch_size = (global_batch_size
                            * cfg.gradient_accumulation_steps)
        logger.info("***** Running training *****")
        logger.info(f"  Num examples = {len(train_dataset)}")
        logger.info(f"  Num Epochs = {num_train_epochs}")
        logger.info(f"  Instantaneous batch size per device = "
                    f"{cfg.train_batch_size}")
        logger.info(f"  Total train batch size = {total_batch_size}")
        logger.info(f"  Total optimization steps = {cfg.max_train_steps}")

        models = {"unet_config": unet_config, "clip_config": clip_config,
                  "vae_config": vae_config,
                  "scheduler_config": scheduler_config}
        # state.step counts micro-batches (jit_step calls); global_step
        # counts optimizer updates like the reference
        micro_step = int(jax.device_get(state.step))
        global_step = micro_step // cfg.gradient_accumulation_steps
        run_steps = 0
        last_prompt = ""
        window_losses = []
        pending_losses = []   # buffered (global_step, device loss scalar)
        t_start = time.time()
        # lazy CLIP scorer for validation_data.compute_clip_score; the
        # config error surfaces before training starts, not at step N
        clip_scorer = None
        if cfg.validation_data.get("compute_clip_score"):
            clip_dir = cfg.validation_data.get("clip_model_path")
            if not clip_dir:
                raise ValueError(
                    "validation_data.compute_clip_score requires "
                    "validation_data.clip_model_path (a local transformers "
                    "CLIPModel dir, e.g. openai/clip-vit-base-patch32)")
            # the scorer itself is built lazily at the first validation
            # step; a missing/unusable dir must still fail NOW, not hours in
            if not os.path.isfile(os.path.join(clip_dir, "config.json")):
                raise ValueError(
                    f"validation_data.clip_model_path={clip_dir!r} is not a "
                    "transformers CLIPModel dir (no config.json); download "
                    "one locally first (see README, quality evaluation)")

        # step-time/MFU meter + optional jax.profiler capture (SURVEY §5.1:
        # the reference has no tracing subsystem; here it is first-class)
        td = cfg.train_data or {}
        text_is_trainable = ("text" in trainable) or ("text_lora"
                                                      in trainable)
        if not cfg.two_pass_loss and not text_is_trainable:
            pass1 = "none"
        elif text_is_trainable:
            pass1 = "frame1"
        else:
            pass1 = "full"
        timer = StepTimer(flops_per_step=unet3d_flops_per_step(
            unet_config, batch=global_batch_size,
            frames=td.get("n_sample_frames", 16),
            height=td.get("height", 256), width=td.get("width", 256),
            pass1=pass1))
        profile_dir = os.path.join(output_dir, "profile")

        def current_params(prefer_ema: bool = True):
            """Host snapshot of the weights to save/sample: the EMA shadow
            when use_ema (standard diffusers export semantics), else the
            live trainable subtree."""
            src = (state.ema if (cfg.use_ema and state.ema is not None
                                 and prefer_ema) else state.trainable)
            host_trainable = jax.device_get(src)
            return {
                "unet": merge(unet_frozen,
                              host_trainable.get("unet", {})),
                "text": merge(text_frozen,
                              host_trainable.get("text", {})),
                "vae": vae_params,
            }, {
                "unet_lora": host_trainable.get("unet_lora"),
                "unet_sites": unet_sites,
                "text_lora": host_trainable.get("text_lora"),
                "text_sites": text_sites,
            }

        # loop EPOCHS until max_train_steps is reached, not a precomputed
        # epoch count: bucket batching can legitimately yield fewer batches
        # than len(loader) (per-bucket drop_last), and a fixed range() would
        # end the run silently short of max_train_steps
        epoch = 0
        # periodic saves overlap disk writes with training: the diffusers
        # pipeline layout goes through a one-in-flight background thread
        # (params already host-snapshotted), the TrainState through orbax's
        # async commit
        state_saver = train_state_io.AsyncTrainStateSaver()
        pipe_saver = OneInFlight(name="t2v-save-pipe")
        # graceful preemption (save_on_preemption, beyond the reference):
        # TPU-pod preemption delivers SIGTERM with a short grace window.
        # The handler only flips an event; the loop finishes the in-flight
        # step, writes a resumable checkpoint-<step>, and returns through
        # the normal join/close path.  Ctrl-C (SIGINT) keeps Python's
        # default abort semantics.  Handlers are installable only from the
        # main thread (tests driving main() from worker threads skip this).
        stop_event = threading.Event()
        last_ckpt_step = -1
        prev_sigterm = None

        def _on_preempt(signum, frame):
            logger.warning(
                f"received signal {signum}: finishing the current step, "
                "then checkpointing and stopping")
            stop_event.set()

        if (cfg.save_on_preemption
                and threading.current_thread() is threading.main_thread()):
            prev_sigterm = signal.signal(signal.SIGTERM, _on_preempt)
        # join/close the async savers on EVERY exit path: if the loop
        # raises (data error, Ctrl-C, the empty-epoch ValueError), an
        # in-flight background write would otherwise never be joined, a
        # captured background-save exception silently lost, and the
        # orbax checkpointer never closed (ADVICE r3)
        try:
            while (global_step < cfg.max_train_steps
                   and not stop_event.is_set()):
                epoch_batches = 0
                for step, batch in enumerate(train_dataloader):
                    epoch_batches += 1
                    if should_skip_resume_step(cfg, epoch, step):
                        continue
                    last_prompt = batch["text_prompt"][0]
                    device_batch = {
                        "pixel_values": _put_global_batch(
                            np.asarray(batch["pixel_values"], np.float32),
                            data_sharding),
                        "prompt_ids": _put_global_batch(
                            np.asarray(batch["prompt_ids"]), ids_sharding),
                    }
                    # profiler window counts steps since THIS run started (a
                    # resumed run's global_step never passes small thresholds)
                    if cfg.profile_steps and run_steps == 1:
                        jax.profiler.start_trace(profile_dir)
                    if jax.process_count() > 1 and run_steps == 0:
                        _aot_compile_and_barrier(jit_step, state, frozen,
                                                 vae_params_d, device_batch)
                    state, metrics = jit_step(state, frozen, vae_params_d,
                                              device_batch)
                    # window-mean train_loss, reference train.py:855-890: the
                    # logged scalar is the accumulation-window mean of the
                    # (global-batch-mean) loss.  Kept as device arrays -- no
                    # host sync until logging.
                    window_losses.append(metrics["loss"])
                    micro_step += 1
                    run_steps += 1
                    if (cfg.profile_steps
                            and run_steps == 1 + cfg.profile_steps):
                        jax.block_until_ready(metrics["loss"])
                        jax.profiler.stop_trace()
                        logger.info(f"profiler trace written to {profile_dir}")
                    timer.tick()

                    # reference semantics: global_step counts OPTIMIZER updates
                    # (accelerator.sync_gradients, train.py:886-890), one per
                    # gradient_accumulation_steps micro-batches
                    if micro_step % cfg.gradient_accumulation_steps != 0:
                        continue
                    global_step += 1
                    train_loss = (jnp.mean(jnp.stack(window_losses))
                                  if window_losses else metrics["loss"])
                    window_losses = []

                    # reference logs train_loss at every optimizer step
                    # (accelerator.log, reference train.py:889); buffer the
                    # device scalar and flush on the %10 boundary so the host
                    # never blocks mid-window (a device_get here would cap the
                    # async dispatch depth at ~1 step)
                    pending_losses.append((global_step, train_loss))

                    if global_step % 10 == 0 or global_step == 1:
                        m = jax.device_get(metrics)
                        if writer is not None:
                            for gs, tl in pending_losses:
                                writer.add_scalar(
                                    "train_loss", float(jax.device_get(tl)), gs)
                        pending_losses = []
                        stats = timer.stats()
                        # skip_nonfinite_updates: dropped micro-batches defer
                        # the accumulation window, so global_step (a window
                        # counter) over-labels true optimizer updates by the
                        # drop count -- surface it so the drift is visible
                        drops = ""
                        if "notfinite_drops" in m:
                            n_drops = int(m["notfinite_drops"])
                            if n_drops:
                                drops = f" nonfinite_drops={n_drops}"
                        logger.info(
                            f"step {global_step} "
                            f"loss={float(jax.device_get(train_loss)):.4f} "
                            f"grad_norm={float(m['grad_norm']):.3f} "
                            f"({stats['step_time_s']:.2f}s/step, "
                            f"mfu={stats['mfu']:.1%}){drops}")
                        if writer is not None:
                            writer.add_scalar("grad_norm",
                                              float(m["grad_norm"]), global_step)
                            writer.add_scalar("steps_per_sec",
                                              stats["steps_per_sec"], global_step)
                            writer.add_scalar("mfu", stats["mfu"], global_step)

                    if global_step % cfg.checkpointing_steps == 0 and is_main:
                        params_now, lora_now = current_params()
                        pipe_saver.submit(
                            save_pipe, cfg, output_dir, global_step,
                            cfg.pretrained_model_path, models, params_now,
                            lora_now, lora_manager, True,
                            context=f"checkpoint-{global_step} pipeline "
                                    "save")
                        state_saver.save(
                            os.path.join(output_dir,
                                         f"checkpoint-{global_step}"), state)
                        prune_checkpoints(output_dir,
                                          cfg.checkpoints_total_limit,
                                          in_flight_step=global_step)
                        last_ckpt_step = global_step

                    if is_main and should_sample(global_step,
                                                 cfg.validation_steps,
                                                 cfg.validation_data):
                        params_now, lora_now = current_params()
                        sample_params = dict(params_now)
                        if (lora_manager.use_lora
                                and lora_now["unet_lora"] is not None):
                            sample_params["unet"] = collapse_lora(
                                params_now["unet"], lora_now["unet_lora"],
                                unet_sites, cfg.lora_version)
                        if (lora_manager.use_lora
                                and lora_now["text_lora"] is not None):
                            sample_params["text"] = collapse_lora(
                                params_now["text"], lora_now["text_lora"],
                                text_sites, cfg.lora_version)
                        pipe = TextToVideoSDPipeline(
                            unet=UNet3DConditionModel(
                                config=unet_config, dtype=compute_dtype,
                                attention_backend=backend),
                            unet_params=sample_params["unet"],
                            vae=vae, vae_params=vae_params,
                            text_encoder=text_encoder,
                            text_params=sample_params["text"],
                            tokenizer=tokenizer,
                            scheduler_config=scheduler_config)
                        vd = cfg.validation_data
                        prompt = (last_prompt if not vd.get("prompt")
                                  else vd["prompt"])
                        frames = pipe(
                            prompt, width=vd.get("width", 256),
                            height=vd.get("height", 256),
                            num_frames=vd.get("num_frames", 16),
                            num_inference_steps=vd.get("num_inference_steps",
                                                       25),
                            guidance_scale=vd.get("guidance_scale", 9.0))
                        save_name = (f"{global_step}_dataset-"
                                     f"{batch['dataset'][0]}_{prompt[:60]}")
                        out_file = f"{output_dir}/samples/{save_name}.mp4"
                        export_to_video(frames[0], out_file,
                                        cfg.train_data.get("fps", 8))
                        logger.info(f"Saved a new sample to {out_file}")
                        # opt-in quality metric beside the sample (the
                        # reference's validation loop is eyeball-only,
                        # reference train.py:908-958): CLIP-score the
                        # sampled clip against its prompt
                        if vd.get("compute_clip_score"):
                            if clip_scorer is None:
                                from ..eval import CLIPScorer
                                clip_scorer = CLIPScorer(
                                    vd["clip_model_path"])
                            cs = clip_scorer.score_frames(frames[0], prompt)
                            logger.info(
                                f"clip_score={cs:.3f} at step {global_step} "
                                f"({prompt[:60]!r})")
                            if writer is not None:
                                writer.add_scalar("clip_score", cs,
                                                  global_step)

                    if (global_step >= cfg.max_train_steps
                            or stop_event.is_set()):
                        break
                epoch += 1
                if epoch_batches == 0:
                    raise ValueError(
                        "the train dataloader yielded no batches this epoch "
                        "(dataset smaller than the global batch size, or every "
                        "bucket below batch size); reduce train_batch_size or "
                        "enable extend_dataset")
            if (stop_event.is_set() and is_main and global_step > 0
                    and global_step != last_ckpt_step):
                # the preemption checkpoint: resumable TrainState + the
                # diffusers pipeline snapshot, exactly what the periodic
                # path writes; the savers are joined on the return path
                # below, inside the preemption grace window
                logger.warning(
                    f"graceful stop at step {global_step}: writing "
                    f"checkpoint-{global_step} before exit")
                params_now, lora_now = current_params()
                pipe_saver.submit(
                    save_pipe, cfg, output_dir, global_step,
                    cfg.pretrained_model_path, models, params_now,
                    lora_now, lora_manager, True,
                    context=f"preemption checkpoint-{global_step} "
                            "pipeline save")
                state_saver.save(
                    os.path.join(output_dir,
                                 f"checkpoint-{global_step}"), state)
                prune_checkpoints(output_dir, cfg.checkpoints_total_limit,
                                  in_flight_step=global_step)
        except BaseException:
            # already propagating an error: a secondary saver-shutdown
            # failure must not mask it -- log and re-raise the original
            for closer in (pipe_saver.join, state_saver.wait,
                           state_saver.close):
                try:
                    closer()
                except Exception as join_exc:
                    logger.warning(
                        f"async saver shutdown error while handling a "
                        f"training failure: {join_exc}")
            raise
        finally:
            if prev_sigterm is not None:
                signal.signal(signal.SIGTERM, prev_sigterm)

        # join any in-flight async writes before the run returns (a caller
        # may immediately re-open the checkpoint dir to resume).  A join
        # error (a failed background pipeline save) must not abandon the
        # other saver mid-write: close everything, then re-raise the first
        # failure.
        shutdown_exc = None
        for closer in (pipe_saver.join, state_saver.wait, state_saver.close):
            try:
                closer()
            except BaseException as e:
                if shutdown_exc is None:
                    shutdown_exc = e
                else:
                    logger.warning(f"async saver shutdown error: {e}")
        if shutdown_exc is not None:
            raise shutdown_exc
        if is_main and not stop_event.is_set():
            # end-of-training export only (reference train.py:963-970
            # equivalent).  On preemption the resumable checkpoint above is
            # already durable — a second synchronous multi-GB export here
            # would burn the SIGTERM grace window and could be SIGKILLed
            # mid-write, leaving a torn pipeline dir at the run root.
            params_now, lora_now = current_params()
            save_pipe(cfg, output_dir, global_step,
                      cfg.pretrained_model_path, models, params_now,
                      lora_now, lora_manager, is_checkpoint=False)
    if writer is not None:
        for gs, tl in pending_losses:
            writer.add_scalar("train_loss", float(jax.device_get(tl)), gs)
        writer.close()
    return output_dir
