"""Train-step variant benchmark on the real chip: isolates the cost of
gradient checkpointing, attention backend, and the reference's two-pass
loss at the headline workload (256x256x16f LoRA, bf16, cached latents).

Run: PYTHONPATH=/root/repo python benchmarks/step_bench.py [--quick]
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def build(grad_ckpt: bool, backend: str, frames: int = 16,
          remat_policy: str = "nothing", two_pass: bool = True,
          fused_groupnorm: bool = False, latent_hw=(32, 32),
          lora_branch: bool = True, batch: int = 1,
          text_lora: bool = False, split: bool = False,
          use_ema: bool = False, skip_nonfinite: int = 0,
          lora_version: str = "cloneofsimo", raw_latents: bool = False):
    from text_to_video_finetuning_tpu.lora.handler import LoraHandler
    from text_to_video_finetuning_tpu.models import (
        CLIPTextModel, UNET3D_MS_1_7B_CONFIG, UNet3DConditionModel,
        CLIP_MS_TEXT_CONFIG)
    from text_to_video_finetuning_tpu.schedulers.ddpm import (
        DDPMScheduler, SchedulerConfig)
    from text_to_video_finetuning_tpu.training import (
        TrainState, TrainStepConfig, make_split_train_step, make_train_step)
    from text_to_video_finetuning_tpu.training.optim import (get_lr_schedule,
                                                             get_optimizer)

    lh, lw = latent_hw
    ucfg = UNET3D_MS_1_7B_CONFIG
    unet = UNet3DConditionModel(config=ucfg, dtype=jnp.bfloat16,
                                gradient_checkpointing=grad_ckpt,
                                remat_policy=remat_policy,
                                fused_groupnorm=fused_groupnorm,
                                attention_backend=backend)
    clip = CLIPTextModel(config=CLIP_MS_TEXT_CONFIG, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)

    def zeros_like_shape(tree):
        return jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), tree)

    unet_params = zeros_like_shape(jax.eval_shape(
        lambda r: unet.init(
            r, jnp.zeros((1, 4, frames, lh, lw), jnp.bfloat16),
            jnp.array([1]),
            jnp.zeros((1, 77, ucfg.cross_attention_dim), jnp.bfloat16)
        )["params"], rng))
    text_params = zeros_like_shape(jax.eval_shape(
        lambda r: clip.init(r, jnp.zeros((1, 77), jnp.int32))["params"],
        rng))

    # stable_lora mirrors its shipped preset (stable_lora_config.yaml):
    # rank 32, Transformer2DModel + ResnetBlock2D
    unet_targets = (["Transformer2DModel", "ResnetBlock2D"]
                    if lora_version == "stable_lora"
                    else ["Transformer2DModel", "TransformerTemporalModel",
                          "ResnetBlock2D"])
    lora_rank = 32 if lora_version == "stable_lora" else 16
    handler = LoraHandler(version=lora_version, use_unet_lora=True,
                          use_text_lora=text_lora,
                          unet_replace_modules=unet_targets)
    unet_lora, unet_sites, _ = handler.add_lora_to_model(
        True, "unet", ucfg, r=lora_rank, rng=rng)

    trainable = {"unet_lora": unet_lora}
    text_sites = ()
    if text_lora:
        # the reference's hybrid config (lora_training_config.yaml): text
        # LoRA makes pass 1 the cheap frame-1 trainable-text pass
        t_lora, text_sites, _ = handler.add_lora_to_model(
            True, "text_encoder", CLIP_MS_TEXT_CONFIG, r=lora_rank, rng=rng)
        trainable["text_lora"] = t_lora
    # frozen params in bf16 (reference casts frozen models to half,
    # train.py:680-686): halves their HBM read traffic per UNet pass
    frozen = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16),
        {"unet": unet_params, "text": text_params})
    optimizer = get_optimizer(get_lr_schedule("constant", 5e-6, 0, 100))
    if skip_nonfinite:
        # same composition as the engine (engine.py): the guard wraps
        # OUTSIDE so one NaN micro-gradient can't poison any state
        import optax
        optimizer = optax.apply_if_finite(
            optimizer, max_consecutive_errors=skip_nonfinite)
    vae = None
    vae_params = None
    if raw_latents:
        # cache_latents=False: the reference's #2 device hot loop, the
        # in-step per-frame VAE encode (train.py:339-347) at full SD-VAE
        # geometry
        from text_to_video_finetuning_tpu.models import AutoencoderKL
        from text_to_video_finetuning_tpu.models.vae import VAE_SD_CONFIG
        vae = AutoencoderKL(config=VAE_SD_CONFIG, dtype=jnp.bfloat16)
        vae_params = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16),
            zeros_like_shape(jax.eval_shape(
                lambda r: vae.init(
                    {"params": r, "gaussian": r},
                    jnp.zeros((1, 3, lh * 8, lw * 8), jnp.bfloat16)
                )["params"], rng)))
    step_cfg = TrainStepConfig(
        unet=unet, text_encoder=clip, vae=vae,
        scheduler=DDPMScheduler(SchedulerConfig()),
        unet_sites=tuple(unet_sites), text_sites=tuple(text_sites),
        lora_version=lora_version,
        lora_branch=lora_branch,
        cache_latents=not raw_latents, use_offset_noise=False,
        two_pass=two_pass,
        ema_decay=0.9999 if use_ema else 0.0, ema_every=1)
    state = TrainState(step=jnp.zeros((), jnp.int32), trainable=trainable,
                       opt_state=optimizer.init(trainable), rng=rng,
                       ema=(jax.tree_util.tree_map(jnp.copy, trainable)
                            if use_ema else None))
    if raw_latents:
        pixel_values = jnp.zeros((batch, frames, 3, lh * 8, lw * 8),
                                 jnp.bfloat16)   # (B, F, C, H, W) raw video
    else:
        pixel_values = jnp.zeros((batch, 4, frames, lh, lw), jnp.bfloat16)
    batch_tree = {
        "pixel_values": pixel_values,
        "prompt_ids": jnp.zeros((batch, 77), jnp.int32),
    }
    if split:
        jit_step = make_split_train_step(step_cfg, optimizer)  # pre-jitted
    else:
        jit_step = jax.jit(make_train_step(step_cfg, optimizer),
                           donate_argnums=(0,))
    return jit_step, state, frozen, vae_params, batch_tree


def run(jit_step, state, frozen, vae_params, batch_tree, n=8):
    # float() readback drains the queue; block_until_ready on the tunneled
    # TPU can return before all dispatched steps execute
    state, metrics = jit_step(state, frozen, vae_params, batch_tree)
    float(metrics["loss"])
    t0 = time.perf_counter()
    for _ in range(n):
        state, metrics = jit_step(state, frozen, vae_params, batch_tree)
    float(metrics["loss"])
    return (time.perf_counter() - t0) / n


def main():
    from text_to_video_finetuning_tpu.utils.compile_cache import (
        enable_persistent_compile_cache)
    enable_persistent_compile_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--variants", nargs="*", default=None)
    p.add_argument("--mem", action="store_true",
                   help="AOT-compile only and print the XLA memory "
                        "analysis (peak HBM bound) instead of timing; "
                        "rides the persistent compile cache")
    args = p.parse_args()
    variants = [
        ("remat+auto", dict(grad_ckpt=True, backend="auto")),
        ("remat-convouts+auto", dict(grad_ckpt=True, backend="auto",
                                     remat_policy="conv_outs")),
        ("remat-convattn+auto", dict(grad_ckpt=True, backend="auto",
                                     remat_policy="conv_attn")),
        ("remat-convouts-skiplow+auto",
         dict(grad_ckpt=True, backend="auto",
              remat_policy="conv_outs+skiplow")),
        ("remat-convattn-skiplow+auto",
         dict(grad_ckpt=True, backend="auto",
              remat_policy="conv_attn+skiplow")),
        # only the highest-res level remats (3 deepest saved outright)
        ("remat-convattn-skiplow3+auto",
         dict(grad_ckpt=True, backend="auto",
              remat_policy="conv_attn+skiplow3")),
        ("remat-convattndense-skiplow3+auto",
         dict(grad_ckpt=True, backend="auto",
              remat_policy="conv_attn_dense+skiplow3")),
        # LoRA branch form vs merged overlay (round 3): branch avoids the
        # full weight-grad convolutions for LoRA'd kernels
        ("branch-convattndense-skiplow3",
         dict(grad_ckpt=True, backend="auto", lora_branch=True,
              remat_policy="conv_attn_dense+skiplow3")),
        ("overlay-convattndense-skiplow3",
         dict(grad_ckpt=True, backend="auto", lora_branch=False,
              remat_policy="conv_attn_dense+skiplow3")),
        # stable_lora (loralib) at its preset geometry (rank 32,
        # Transformer2DModel+ResnetBlock2D): branch form
        # (_stable_conv_branch masked-kernel factorization) vs the merged
        # overlay -- the round-4 verdict's unmeasured A/B
        ("stable-branch-convattndense-skiplow3",
         dict(grad_ckpt=True, backend="auto", lora_version="stable_lora",
              lora_branch=True, remat_policy="conv_attn_dense+skiplow3")),
        ("stable-overlay-convattndense-skiplow3",
         dict(grad_ckpt=True, backend="auto", lora_version="stable_lora",
              lora_branch=False, remat_policy="conv_attn_dense+skiplow3")),
        # per-chip batch scaling at the headline LoRA workload (VERDICT r4
        # ask #4): per-SAMPLE throughput vs batch
        ("batch2-convattndense-skiplow3",
         dict(grad_ckpt=True, backend="auto", batch=2,
              remat_policy="conv_attn_dense+skiplow3")),
        ("batch4-convattndense-skiplow3",
         dict(grad_ckpt=True, backend="auto", batch=4,
              remat_policy="conv_attn_dense+skiplow3")),
        ("batch8-convattndense-skiplow3",
         dict(grad_ckpt=True, backend="auto", batch=8,
              remat_policy="conv_attn_dense+skiplow3")),
        # split-compile fallbacks: the fused batch>1 16f graph can exceed
        # the remote compile helper's memory (same failure mode as
        # 16f-hires); each split pass is half the scheduling problem
        ("batch2-split-convattndense-skiplow3",
         dict(grad_ckpt=True, backend="auto", batch=2, split=True,
              remat_policy="conv_attn_dense+skiplow3")),
        ("batch4-split-convattndense-skiplow3",
         dict(grad_ckpt=True, backend="auto", batch=4, split=True,
              remat_policy="conv_attn_dense+skiplow3")),
        ("batch8-split-convattndense-skiplow3",
         dict(grad_ckpt=True, backend="auto", batch=8, split=True,
              remat_policy="conv_attn_dense+skiplow3")),
        # batch scaling at the presets' own 8-frame geometry (safely
        # inside compile-helper capacity; complements the 16f rows)
        ("batch2-8f-convattndense-skiplow3",
         dict(grad_ckpt=True, backend="auto", batch=2, frames=8,
              remat_policy="conv_attn_dense+skiplow3")),
        ("batch4-8f-convattndense-skiplow3",
         dict(grad_ckpt=True, backend="auto", batch=4, frames=8,
              remat_policy="conv_attn_dense+skiplow3")),
        ("batch8-8f-convattndense-skiplow3",
         dict(grad_ckpt=True, backend="auto", batch=8, frames=8,
              remat_policy="conv_attn_dense+skiplow3")),
        ("batch1-8f-convattndense-skiplow3",
         dict(grad_ckpt=True, backend="auto", batch=1, frames=8,
              remat_policy="conv_attn_dense+skiplow3")),
        # cache_latents=False: in-step per-frame VAE encode (the
        # reference's #2 device hot loop, train.py:339-347) at the 256px
        # headline -- the never-measured raw-video training path
        ("rawlatents-convattndense-skiplow3",
         dict(grad_ckpt=True, backend="auto", raw_latents=True,
              remat_policy="conv_attn_dense+skiplow3")),
        # fused GN stacked on the winning policy: GN stat passes are 23
        # ms/step at 463 GB/s in the trace -- the one-pass kernel removes
        # the separate stats read
        ("fusedgn-convattn-skiplow+auto",
         dict(grad_ckpt=True, backend="auto",
              remat_policy="conv_attn+skiplow", fused_groupnorm=True)),
        ("remat-convdots+auto", dict(grad_ckpt=True, backend="auto",
                                     remat_policy="conv_dots")),
        ("remat-dots+auto", dict(grad_ckpt=True, backend="auto",
                                 remat_policy="dots")),
        ("remat+xla", dict(grad_ckpt=True, backend="xla")),
        ("remat+pallas", dict(grad_ckpt=True, backend="pallas")),
        ("noremat+auto", dict(grad_ckpt=False, backend="auto")),
        ("singlepass+auto", dict(grad_ckpt=True, backend="auto",
                                 two_pass=False)),
        ("fusedgn+auto", dict(grad_ckpt=True, backend="auto",
                              fused_groupnorm=True)),
        # 576x320 (latent 72x40): the regime VERDICT asks fused GN to be
        # measured at -- larger spatial extent, stats re-read matters more
        ("hires-base+auto", dict(grad_ckpt=True, backend="auto",
                                 remat_policy="conv_outs", frames=8,
                                 latent_hw=(40, 72))),
        ("hires-fusedgn+auto", dict(grad_ckpt=True, backend="auto",
                                    remat_policy="conv_outs", frames=8,
                                    latent_hw=(40, 72),
                                    fused_groupnorm=True)),
        # --- 576x320 TRAINING sweep (reference README's suggested
        # ZeroScope finetune geometry, README.md:160-170 region).  2880
        # spatial tokens/frame is the shape where the Pallas flash kernel
        # measured ~4x over XLA in the microbench; the backend A/B below
        # shows whether that survives in the full training step.
        ("hires16-convattndense-skiplow3",
         dict(grad_ckpt=True, backend="auto", frames=16,
              latent_hw=(40, 72),
              remat_policy="conv_attn_dense+skiplow3")),
        ("hires16-convattn-skiplow3",
         dict(grad_ckpt=True, backend="auto", frames=16,
              latent_hw=(40, 72), remat_policy="conv_attn+skiplow3")),
        ("hires16-convattn-skiplow",
         dict(grad_ckpt=True, backend="auto", frames=16,
              latent_hw=(40, 72), remat_policy="conv_attn+skiplow")),
        ("hires16-convouts-skiplow",
         dict(grad_ckpt=True, backend="auto", frames=16,
              latent_hw=(40, 72), remat_policy="conv_outs+skiplow")),
        ("hires16-convouts",
         dict(grad_ckpt=True, backend="auto", frames=16,
              latent_hw=(40, 72), remat_policy="conv_outs")),
        ("hires16-xla",
         dict(grad_ckpt=True, backend="xla", frames=16,
              latent_hw=(40, 72),
              remat_policy="conv_attn_dense+skiplow3")),
        ("hires16-pallas",
         dict(grad_ckpt=True, backend="pallas", frames=16,
              latent_hw=(40, 72),
              remat_policy="conv_attn_dense+skiplow3")),
        ("hires16-fusedgn",
         dict(grad_ckpt=True, backend="auto", frames=16,
              latent_hw=(40, 72),
              remat_policy="conv_attn_dense+skiplow3",
              fused_groupnorm=True)),
        ("hires16-noremat",
         dict(grad_ckpt=False, backend="auto", frames=16,
              latent_hw=(40, 72))),
        ("hires16-nothing",
         dict(grad_ckpt=True, backend="auto", frames=16,
              latent_hw=(40, 72), remat_policy="nothing")),
        ("hires16-singlepass",
         dict(grad_ckpt=True, backend="auto", frames=16,
              latent_hw=(40, 72), remat_policy="conv_attn+skiplow",
              two_pass=False)),
        # split-compile two-pass (make_split_train_step): each loss pass is
        # its own XLA program, halving the compile-helper's scheduling
        # problem -- the fused 16f two-pass graph crashes it (rows above)
        ("hires16-split-convattn-skiplow",
         dict(grad_ckpt=True, backend="auto", frames=16,
              latent_hw=(40, 72), remat_policy="conv_attn+skiplow",
              split=True)),
        # reference hybrid config shape (text LoRA): pass 1 is the cheap
        # frame-1 trainable-text pass
        ("hires16-hybrid-split-convattn-skiplow",
         dict(grad_ckpt=True, backend="auto", frames=16,
              latent_hw=(40, 72), remat_policy="conv_attn+skiplow",
              split=True, text_lora=True)),
        ("hires16-hybrid-nothing",
         dict(grad_ckpt=True, backend="auto", frames=16,
              latent_hw=(40, 72), remat_policy="nothing",
              text_lora=True)),
        # split overhead control at the 256px headline geometry
        ("split-convattndense-skiplow3",
         dict(grad_ckpt=True, backend="auto",
              remat_policy="conv_attn_dense+skiplow3", split=True)),
        # production knobs at the 256px headline workload (VERDICT r3
        # weak#2): EMA shadow (doubles trainable-tree HBM, one extra blend
        # over the LoRA tree) and the apply_if_finite guard (a global
        # isfinite reduction over the grads) -- measured deltas vs the
        # headline row in RESULTS.md
        ("ema-convattndense-skiplow3",
         dict(grad_ckpt=True, backend="auto",
              remat_policy="conv_attn_dense+skiplow3", use_ema=True)),
        ("guard-convattndense-skiplow3",
         dict(grad_ckpt=True, backend="auto",
              remat_policy="conv_attn_dense+skiplow3", skip_nonfinite=3)),
        ("ema-guard-convattndense-skiplow3",
         dict(grad_ckpt=True, backend="auto",
              remat_policy="conv_attn_dense+skiplow3", use_ema=True,
              skip_nonfinite=3)),
        ("hires8-convattndense-skiplow3",
         dict(grad_ckpt=True, backend="auto", frames=8,
              latent_hw=(40, 72),
              remat_policy="conv_attn_dense+skiplow3")),
        ("hires8-convattn-skiplow",
         dict(grad_ckpt=True, backend="auto", frames=8,
              latent_hw=(40, 72), remat_policy="conv_attn+skiplow")),
        ("hires8-convattn",
         dict(grad_ckpt=True, backend="auto", frames=8,
              latent_hw=(40, 72), remat_policy="conv_attn")),
        ("hires8-convouts-skiplow",
         dict(grad_ckpt=True, backend="auto", frames=8,
              latent_hw=(40, 72), remat_policy="conv_outs+skiplow")),
        ("hires8-xla",
         dict(grad_ckpt=True, backend="xla", frames=8,
              latent_hw=(40, 72), remat_policy="conv_attn+skiplow")),
    ]
    if args.variants:
        variants = [v for v in variants if v[0] in args.variants]
    print(f"backend: {jax.default_backend()} "
          f"{jax.devices()[0].device_kind}")
    for name, kw in variants:
        try:
            if args.mem:
                print({"variant": name, **mem_analysis(*build(**kw))})
            else:
                t = run(*build(**kw))
                print({"variant": name, "step_ms": round(t * 1e3, 1),
                       "steps_per_s": round(1.0 / t, 3)})
        except Exception as e:
            print({"variant": name, "error": str(e)[:160]})


def mem_dict(mem, extra_resident_bytes: int = 0) -> dict:
    """XLA memory_analysis -> the peak-HBM accounting dict shared by
    step_bench and preset_bench (one formula, fixed in one place).
    Donated state aliases into the output: aliased bytes are counted in
    BOTH args and outputs but occupy HBM once."""
    args_b = int(mem.argument_size_in_bytes)
    out_b = int(mem.output_size_in_bytes)
    tmp_b = int(mem.temp_size_in_bytes)
    alias_b = int(getattr(mem, "alias_size_in_bytes", 0))
    peak = args_b + out_b + tmp_b - alias_b + int(extra_resident_bytes)
    return dict(xla_argument_gib=round(args_b / 2**30, 3),
                xla_output_gib=round(out_b / 2**30, 3),
                xla_temp_gib=round(tmp_b / 2**30, 3),
                xla_alias_gib=round(alias_b / 2**30, 3),
                peak_gib=round(peak / 2**30, 2),
                peak_source="xla_memory_analysis")


def mem_analysis(jit_step, state, frozen, vae_params, batch_tree):
    """Peak-HBM bound from XLA's compiled-executable memory analysis
    (argument + temp + unaliased output; donated state aliases out).
    Lowers on abstract shapes so nothing executes on the chip.

    Split-compile steps (make_split_train_step) have no single program:
    the peak is bounded by the largest gradient program PLUS everything
    device-resident that is NOT that program's argument -- one gradient
    tree (pass 0's grads stay live while pass 1 executes; grad dtypes
    follow the trainable leaves) and the optimizer state + EMA shadow the
    deferred apply program will consume.  The fused path counts those in
    its argument bytes, so this keeps split and fused rows comparable."""
    abstract = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
        (state, frozen, vae_params, batch_tree))
    if hasattr(jit_step, "lower"):
        mem = jit_step.lower(*abstract).compile().memory_analysis()
        return mem_dict(mem)

    def tree_bytes(tree):
        return sum(int(np.prod(x.shape)) * jnp.dtype(x.dtype).itemsize
                   for x in jax.tree_util.tree_leaves(tree))

    a_state, a_frozen, a_vae, a_batch = abstract
    resident = tree_bytes(a_state.trainable) + tree_bytes(a_state.opt_state)
    if getattr(a_state, "ema", None) is not None:
        resident += tree_bytes(a_state.ema)
    mems = [prog.lower(a_state.trainable, a_frozen, a_vae, a_batch,
                       a_state.rng).compile().memory_analysis()
            for prog in jit_step.grad_programs]
    worst = max(mems, key=lambda m: (
        int(m.argument_size_in_bytes) + int(m.output_size_in_bytes)
        + int(m.temp_size_in_bytes)
        - int(getattr(m, "alias_size_in_bytes", 0))))
    out = mem_dict(worst, extra_resident_bytes=resident)
    out["peak_source"] = "xla_memory_analysis (split: max grad program " \
                         "+ resident grads/opt-state/ema)"
    return out


if __name__ == "__main__":
    main()
