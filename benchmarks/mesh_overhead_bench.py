"""Mesh-sharded sampler OVERHEAD bound on the virtual 8-CPU mesh.

Only one real TPU chip is reachable in this environment, so the sharded
sampler's ICI behavior cannot be measured here.  What CAN be bounded is
everything the mesh path ADDS that is not inter-chip traffic: input
resharding (device_put to NamedShardings), the collective ops' own
dispatch/schedule structure, and the sharded single-dispatch VAE decode —
by timing the same generate() call off-mesh vs on dp2×tp2×sp2 over
8 virtual CPU devices at a tiny geometry where UNet compute is small and
the wrapper costs dominate.  The delta is an upper bound on the per-call
mesh overhead (on real hardware, collectives also ride 400+ GB/s ICI
instead of host memcpys, and the compute is 100x larger — both shrink
the RELATIVE overhead further).

Run: PYTHONPATH=/root/repo python benchmarks/mesh_overhead_bench.py
(forces CPU; see docs/parallelism.md "Multi-chip inference").
"""

import os

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=8"
                           ).strip()
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import json  # noqa: E402
import time  # noqa: E402


def build_tiny_pipeline(out: str):
    import jax.numpy as jnp
    from text_to_video_finetuning_tpu.models import (
        AutoencoderKL, CLIPTextModel, UNet3DConditionModel,
        micro_unet_config, tiny_clip_config, tiny_vae_config)
    from text_to_video_finetuning_tpu.schedulers.ddpm import SchedulerConfig
    from text_to_video_finetuning_tpu.utils import checkpoint as ckpt
    from text_to_video_finetuning_tpu.utils.simple_tokenizer import (
        write_minimal_clip_tokenizer)
    key = jax.random.PRNGKey(0)
    ucfg = micro_unet_config()
    unet = UNet3DConditionModel(config=ucfg)
    uparams = jax.jit(unet.init)(
        key, jnp.ones((1, 4, 2, 16, 16)), jnp.array([1]),
        jnp.ones((1, 77, ucfg.cross_attention_dim)))["params"]
    vcfg = tiny_vae_config()
    vae = AutoencoderKL(config=vcfg)
    vparams = jax.jit(vae.init)({"params": key, "gaussian": key},
                                jnp.ones((1, 3, 32, 32)))["params"]
    ccfg = tiny_clip_config(vocab_size=512,
                            hidden_size=ucfg.cross_attention_dim,
                            intermediate_size=ucfg.cross_attention_dim * 2)
    clip = CLIPTextModel(config=ccfg)
    cparams = jax.jit(clip.init)(key, jnp.ones((1, 77), jnp.int32))["params"]
    tok_dir = os.path.join(out, "tokenizer")
    write_minimal_clip_tokenizer(tok_dir, vocab_size_floor=512)
    ckpt.save_pipeline(out, unet=(ucfg, uparams), vae=(vcfg, vparams),
                       text_encoder=(ccfg, cparams),
                       scheduler_config=SchedulerConfig(),
                       tokenizer_dir=tok_dir)


def time_generate(pipe, n=6, **kw):
    from text_to_video_finetuning_tpu.pipelines.inference import generate
    generate(pipe, "a cat on a hill", **kw)           # compile
    t0 = time.perf_counter()
    for i in range(n):
        generate(pipe, "a cat on a hill", **kw)
    return (time.perf_counter() - t0) / n


def main():
    import tempfile
    from text_to_video_finetuning_tpu.parallel import MeshConfig, make_mesh
    from text_to_video_finetuning_tpu.pipelines.inference import (
        initialize_pipeline)

    d = tempfile.mkdtemp(prefix="t2v_meshbench_")
    build_tiny_pipeline(d)
    kw = dict(width=32, height=32, num_frames=8, window_size=4,
              num_steps=10, guidance_scale=7.5, seed=11)

    pipe = initialize_pipeline(d, half=False)
    t_single = time_generate(pipe, **kw)

    mesh = make_mesh(MeshConfig(dp=2, fsdp=1, tp=2, sp=2))
    pipe_m = initialize_pipeline(d, half=False, mesh=mesh)
    t_mesh = time_generate(pipe_m, **kw)

    print(json.dumps({
        "t_single_ms": round(t_single * 1e3, 1),
        "t_mesh_dp2tp2sp2_ms": round(t_mesh * 1e3, 1),
        "overhead_ms_per_call": round((t_mesh - t_single) * 1e3, 1),
        "note": "upper bound: virtual CPU devices, tiny model; on real "
                "chips compute is ~100x larger and collectives ride ICI",
    }))


if __name__ == "__main__":
    main()
