"""Model-layer unit tests: shapes, invariants, reference semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from text_to_video_finetuning_tpu.models import (
    AutoencoderKL, CLIPTextModel, UNet3DConditionModel, micro_unet_config,
    tiny_clip_config, tiny_unet_config, tiny_vae_config)
from text_to_video_finetuning_tpu.models.embeddings import (
    get_timestep_embedding)


def test_timestep_embedding_matches_reference_semantics():
    """flip_sin_to_cos=True, shift=0 (diffusers Timesteps as constructed at
    reference models/unet_3d_condition.py:138)."""
    t = jnp.array([0, 10, 999])
    emb = get_timestep_embedding(t, 320)
    assert emb.shape == (3, 320)
    # t=0: cos half = 1, sin half = 0, flipped => first half cos(0)=1
    np.testing.assert_allclose(emb[0, :160], np.ones(160), atol=1e-6)
    np.testing.assert_allclose(emb[0, 160:], np.zeros(160), atol=1e-6)


@pytest.fixture(scope="module")
def tiny_unet(rng):
    cfg = tiny_unet_config()
    unet = UNet3DConditionModel(config=cfg)
    sample = jnp.zeros((2, 4, 4, 16, 16))
    text = jnp.zeros((2, 77, cfg.cross_attention_dim))
    params = jax.jit(unet.init)(rng, sample, jnp.array([1, 2]), text)["params"]
    return cfg, unet, params


def test_unet_forward_shape(tiny_unet, rng):
    cfg, unet, params = tiny_unet
    sample = jax.random.normal(rng, (2, 4, 4, 16, 16))
    text = jax.random.normal(rng, (2, 77, cfg.cross_attention_dim))
    out = unet.apply({"params": params}, sample, jnp.array([3, 7]), text)
    assert out.shape == (2, 4, 4, 16, 16)
    assert jnp.all(jnp.isfinite(out))


def test_unet_single_frame_skips_temporal(tiny_unet, rng):
    """Single-frame inputs skip temporal modules entirely
    (reference models/unet_3d_blocks.py:25-28); with TemporalConvLayer's
    zero-initialized conv4 the multi-frame temporal convs are identity at
    init, so replicating one frame must give the single-frame output."""
    cfg, unet, params = tiny_unet
    frame = jax.random.normal(rng, (1, 4, 1, 16, 16))
    text = jax.random.normal(rng, (1, 77, cfg.cross_attention_dim))
    out1 = unet.apply({"params": params}, frame, jnp.array([5]), text)
    assert out1.shape == (1, 4, 1, 16, 16)


def test_unet_gradient_checkpointing_matches(rng):
    cfg = micro_unet_config()
    sample = jax.random.normal(rng, (1, 4, 2, 16, 16))
    text = jax.random.normal(rng, (1, 77, cfg.cross_attention_dim))
    base = UNet3DConditionModel(config=cfg, gradient_checkpointing=False)
    remat = UNet3DConditionModel(config=cfg, gradient_checkpointing=True)
    params = jax.jit(base.init)(rng, sample, jnp.array([1]), text)["params"]
    out_a = base.apply({"params": params}, sample, jnp.array([1]), text)
    out_b = remat.apply({"params": params}, sample, jnp.array([1]), text)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b),
                               atol=1e-5)

    def loss_a(p):
        return jnp.sum(base.apply({"params": p}, sample, jnp.array([1]),
                                  text) ** 2)

    def loss_b(p):
        return jnp.sum(remat.apply({"params": p}, sample, jnp.array([1]),
                                   text) ** 2)
    ga = jax.grad(loss_a)(params)
    gb = jax.grad(loss_b)(params)
    for a, b in zip(jax.tree_util.tree_leaves(ga),
                    jax.tree_util.tree_leaves(gb)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_remat_policies_same_gradients(rng):
    """Every remat saveable-set (incl. the +skiplowN per-level disable) is
    a pure scheduling choice: gradients must match save-nothing remat."""
    cfg = micro_unet_config()
    sample = jax.random.normal(rng, (1, 4, 2, 16, 16))
    text = jax.random.normal(rng, (1, 77, cfg.cross_attention_dim))
    base = UNet3DConditionModel(config=cfg, gradient_checkpointing=True)
    params = jax.jit(base.init)(rng, sample, jnp.array([1]), text)["params"]

    def grads(model):
        def loss(p):
            return jnp.sum(model.apply({"params": p}, sample,
                                       jnp.array([1]), text) ** 2)
        return jax.tree_util.tree_leaves(jax.grad(loss)(params))

    ref = grads(base)
    for pol in ["conv_attn", "conv_attn_dense+skiplow3"]:
        got = grads(UNet3DConditionModel(config=cfg,
                                         gradient_checkpointing=True,
                                         remat_policy=pol))
        for a, b in zip(ref, got):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4, err_msg=pol)


def test_vae_roundtrip_shapes(rng):
    cfg = tiny_vae_config()
    vae = AutoencoderKL(config=cfg)
    px = jax.random.normal(rng, (2, 3, 32, 32))
    params = jax.jit(vae.init)({"params": rng, "gaussian": rng}, px)["params"]
    lat = vae.apply({"params": params}, px, rng=rng,
                    method=AutoencoderKL.encode)
    assert lat.shape == (2, 4, 16, 16)
    rec = vae.apply({"params": params}, lat, method=AutoencoderKL.decode)
    assert rec.shape == (2, 3, 32, 32)
    # mode (sample=False) is deterministic
    m1 = vae.apply({"params": params}, px, sample=False,
                   method=AutoencoderKL.encode)
    m2 = vae.apply({"params": params}, px, sample=False,
                   method=AutoencoderKL.encode)
    np.testing.assert_array_equal(np.asarray(m1), np.asarray(m2))


def test_clip_causal_masking(rng):
    """A token can only influence later positions (causal attention)."""
    cfg = tiny_clip_config()
    clip = CLIPTextModel(config=cfg)
    ids = jnp.ones((1, 77), jnp.int32)
    params = jax.jit(clip.init)(rng, ids)["params"]
    out1 = clip.apply({"params": params}, ids)
    ids2 = ids.at[0, 50].set(7)
    out2 = clip.apply({"params": params}, ids2)
    # positions before 50 unchanged, position >= 50 changed
    np.testing.assert_allclose(np.asarray(out1[0, :50]),
                               np.asarray(out2[0, :50]), atol=1e-6)
    assert not np.allclose(np.asarray(out1[0, 50:]),
                           np.asarray(out2[0, 50:]))


import pytest


@pytest.mark.parametrize("policy", ["dots", "conv_outs", "conv_dots"])
def test_remat_policies_match_no_remat_grads(policy):
    """Every remat saveable-set is a pure memory/recompute tradeoff: the
    gradients must equal the unrematerialized model's."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from text_to_video_finetuning_tpu.models.unet3d import (
        UNet3DConditionModel, micro_unet_config)

    cfg = micro_unet_config()
    rng = jax.random.PRNGKey(0)
    sample = jax.random.normal(rng, (1, 4, 2, 8, 8))
    text = jax.random.normal(rng, (1, 7, cfg.cross_attention_dim))
    t = jnp.array([3])

    base = UNet3DConditionModel(config=cfg)
    params = jax.jit(base.init)(rng, sample, t, text)["params"]

    def loss(model):
        def f(p):
            out = model.apply({"params": p}, sample, t, text)
            return jnp.mean(out ** 2)
        return f

    g_ref = jax.jit(jax.grad(loss(base)))(params)
    rem = UNet3DConditionModel(config=cfg, gradient_checkpointing=True,
                               remat_policy=policy)
    g_rem = jax.jit(jax.grad(loss(rem)))(params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a),
                                                np.asarray(b),
                                                atol=1e-5, rtol=1e-4),
        g_ref, g_rem)


def test_mesh_from_string_parses_and_rejects():
    """CLI mesh syntax for t2v-inference/t2v-serve --mesh: axis=N pairs
    build a Mesh over the virtual devices; typos fail fast with the valid
    axis set; empty means single-device (None)."""
    from text_to_video_finetuning_tpu.parallel import mesh_from_string

    mesh = mesh_from_string("dp=2, sp=4")
    assert dict(mesh.shape) == {"dp": 2, "fsdp": 1, "tp": 1, "sp": 4}
    # omitted dp absorbs the remaining devices
    mesh = mesh_from_string("sp=2")
    assert dict(mesh.shape) == {"dp": 4, "fsdp": 1, "tp": 1, "sp": 2}
    # fully explicit spec smaller than the host uses a device subset
    mesh = mesh_from_string("dp=2,sp=2")
    assert mesh.devices.size == 4
    assert mesh_from_string("") is None
    assert mesh_from_string("  ") is None
    with pytest.raises(ValueError, match="bad mesh spec"):
        mesh_from_string("dq=2")
    with pytest.raises(ValueError, match="bad mesh spec"):
        mesh_from_string("dp")
    with pytest.raises(ValueError, match="needs 16 devices"):
        mesh_from_string("dp=16")
    # inferred dp goes through the same ValueError validation as explicit
    # specs (no bare assert: must survive python -O and read like a CLI
    # error, not a traceback into numpy reshape)
    with pytest.raises(ValueError, match="not divisible"):
        mesh_from_string("sp=3")   # 8 devices not divisible by sp=3
    # explicit spec whose product undershoots the host still runs on a
    # subset (documented behavior): dp=3,sp=2 -> 6 of 8 devices
    assert mesh_from_string("dp=3,sp=2").devices.size == 6
    # non-integer and non-positive sizes fail with the helpful message,
    # not a bare int() traceback or a confusing reshape error (ADVICE r4)
    with pytest.raises(ValueError, match="must be an integer"):
        mesh_from_string("dp=x")
    with pytest.raises(ValueError, match="must be >= 1"):
        mesh_from_string("dp=0")
    with pytest.raises(ValueError, match="must be >= 1"):
        mesh_from_string("fsdp=-2")

