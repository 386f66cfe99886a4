"""LoRA subsystem: overlay math, site selection, formats, negation."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax.traverse_util import flatten_dict

from text_to_video_finetuning_tpu.lora import (
    LoraHandler, enumerate_text_encoder_sites, enumerate_unet_sites,
    select_sites)
from text_to_video_finetuning_tpu.lora import formats
from text_to_video_finetuning_tpu.lora.overlay import (apply_lora,
                                                       init_lora_params)
from text_to_video_finetuning_tpu.models import (UNet3DConditionModel,
                                                 tiny_clip_config,
                                                 tiny_unet_config)
from text_to_video_finetuning_tpu.training.trainable import select_trainable


@pytest.fixture(scope="module")
def unet_setup(rng):
    cfg = tiny_unet_config()
    unet = UNet3DConditionModel(config=cfg)
    sample = jnp.zeros((1, 4, 2, 16, 16))
    text = jnp.zeros((1, 77, cfg.cross_attention_dim))
    params = jax.jit(unet.init)(rng, sample, jnp.array([1]), text)["params"]
    return cfg, unet, params, sample, text


def test_all_sites_exist_with_matching_shapes(unet_setup):
    cfg, _, params, _, _ = unet_setup
    flat = flatten_dict(params)
    for s in enumerate_unet_sites(cfg):
        kernel = flat[s.flax_path + ("kernel",)]
        if s.kind == "linear":
            assert kernel.shape == (s.in_features, s.out_features), s
        elif s.kind == "conv2d":
            assert kernel.shape == (s.kernel_size, s.kernel_size,
                                    s.in_features, s.out_features), s
        else:
            assert kernel.shape == (s.kernel_size, 1, 1, s.in_features,
                                    s.out_features), s


def test_cloneofsimo_overlay_equals_branch_math(unet_setup, rng):
    """W_eff x == base(x) + up(down(x)) for conv composition: validate the
    overlay against an explicit two-conv branch on a conv2d site."""
    cfg, unet, params, sample, text = unet_setup
    sites = select_sites(enumerate_unet_sites(cfg), ["ResnetBlock2D"])
    lora = init_lora_params(rng, sites, rank=4)
    # give 'up' nonzero values so the delta is nontrivial
    lora = jax.tree_util.tree_map(
        lambda x: jnp.ones_like(x) * 0.01 if x.ndim >= 2 else x, lora)

    eff = apply_lora(params, lora, sites, "cloneofsimo")
    site = next(s for s in sites if s.kind == "conv2d")
    flat_base = flatten_dict(params)
    flat_eff = flatten_dict(eff)
    flat_lora = flatten_dict(lora)
    down = flat_lora[site.flax_path + ("down",)]   # (r, in, k, k)
    up = flat_lora[site.flax_path + ("up",)]       # (out, r, 1, 1)

    x = jax.random.normal(rng, (2, 8, 8, site.in_features))
    k_eff = flat_eff[site.flax_path + ("kernel",)]
    k_base = flat_base[site.flax_path + ("kernel",)]
    pad = [(site.kernel_size // 2,) * 2] * 2

    def conv(inp, kern, padding):
        return jax.lax.conv_general_dilated(
            inp, kern, (1, 1), padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    y_eff = conv(x, k_eff, pad)
    k_down = jnp.transpose(down, (2, 3, 1, 0))     # (k,k,in,r)
    k_up = jnp.transpose(up, (2, 3, 1, 0))         # (1,1,r,out)
    y_branch = conv(x, k_base, pad) + conv(conv(x, k_down, pad), k_up,
                                           [(0, 0), (0, 0)])
    np.testing.assert_allclose(np.asarray(y_eff), np.asarray(y_branch),
                               atol=1e-4)


def test_branch_collection_matches_overlay_full_model(unet_setup, rng):
    """The branch execution path (models/lora_layers.py, 'lora' variable
    collection, reference utils/lora.py:57-62 semantics) must match the
    merged overlay numerically through the FULL tiny UNet -- loss AND
    gradients wrt the lora tree, for linear + conv2d + conv3d sites, with
    and without (weight-)dropout."""
    from text_to_video_finetuning_tpu.lora.overlay import (
        prepare_branch_collection)
    cfg, unet, params, sample, text = unet_setup
    sites = select_sites(
        enumerate_unet_sites(cfg),
        ["ResnetBlock2D", "TemporalConvLayer", "CrossAttention"])
    assert {s.kind for s in sites} == {"linear", "conv2d", "conv3d"}
    k1, k2, k3, kd = jax.random.split(rng, 4)
    lora = init_lora_params(k1, sites, rank=4)
    leaves, treedef = jax.tree_util.tree_flatten(lora)
    keys = jax.random.split(k1, len(leaves))
    lora = jax.tree_util.tree_unflatten(
        treedef, [jax.random.normal(k, l.shape) * 0.05
                  for k, l in zip(keys, leaves)])
    sample_r = jax.random.normal(k2, sample.shape)
    text_r = jax.random.normal(k3, text.shape)

    for drop_rng, rate in ((None, 0.0), (kd, 0.3)):
        def loss_overlay(l):
            eff = apply_lora(params, l, sites, "cloneofsimo",
                             dropout_rng=drop_rng, dropout_rate=rate)
            out = unet.apply({"params": eff}, sample_r, jnp.array([1]),
                             text_r)
            return jnp.sum(out.astype(jnp.float32) ** 2)

        def loss_branch(l):
            col = prepare_branch_collection(l, sites, dropout_rng=drop_rng,
                                            dropout_rate=rate)
            out = unet.apply({"params": params, "lora": col}, sample_r,
                             jnp.array([1]), text_r)
            return jnp.sum(out.astype(jnp.float32) ** 2)

        la, ga = jax.value_and_grad(loss_overlay)(lora)
        lb, gb = jax.value_and_grad(loss_branch)(lora)
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=1e-4)
        for a, b in zip(jax.tree_util.tree_leaves(ga),
                        jax.tree_util.tree_leaves(gb)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-4, rtol=5e-3)


def test_stable_branch_collection_matches_overlay_full_model(unet_setup,
                                                             rng):
    """loralib (stable_lora) branch execution must match the merged
    overlay through the FULL tiny UNet -- loss AND gradients wrt the lora
    tree, for linear + conv2d + conv3d sites, with and without dropout.

    The conv equivalence is the load-bearing claim: the masked-kernel
    factorization (models/lora_layers.py::_stable_conv_branch) must equal
    the merged `(B @ A).view(W.shape) * scaling` delta (reference
    stable_lora/lora.py:190-197), including the Conv3d mean-over-k view."""
    from text_to_video_finetuning_tpu.lora.overlay import (
        prepare_branch_collection)
    cfg, unet, params, sample, text = unet_setup
    sites = select_sites(
        enumerate_unet_sites(cfg),
        ["ResnetBlock2D", "TemporalConvLayer", "CrossAttention"])
    assert {s.kind for s in sites} == {"linear", "conv2d", "conv3d"}
    k1, k2, k3, kd = jax.random.split(rng, 4)
    lora = init_lora_params(k1, sites, rank=4, version="stable_lora")
    leaves, treedef = jax.tree_util.tree_flatten(lora)
    keys = jax.random.split(k1, len(leaves))
    lora = jax.tree_util.tree_unflatten(
        treedef, [jax.random.normal(k, l.shape) * 0.05
                  for k, l in zip(keys, leaves)])
    sample_r = jax.random.normal(k2, sample.shape)
    text_r = jax.random.normal(k3, text.shape)
    alpha_over_r = 0.5   # exercise the loralib alpha/r scaling too

    for drop_rng, rate in ((None, 0.0), (kd, 0.3)):
        def loss_overlay(l):
            eff = apply_lora(params, l, sites, "stable_lora",
                             alpha_over_r=alpha_over_r,
                             dropout_rng=drop_rng, dropout_rate=rate)
            out = unet.apply({"params": eff}, sample_r, jnp.array([1]),
                             text_r)
            return jnp.sum(out.astype(jnp.float32) ** 2)

        def loss_branch(l):
            col = prepare_branch_collection(l, sites, dropout_rng=drop_rng,
                                            dropout_rate=rate,
                                            version="stable_lora",
                                            alpha_over_r=alpha_over_r)
            out = unet.apply({"params": params, "lora": col}, sample_r,
                             jnp.array([1]), text_r)
            return jnp.sum(out.astype(jnp.float32) ** 2)

        la, ga = jax.value_and_grad(loss_overlay)(lora)
        lb, gb = jax.value_and_grad(loss_branch)(lora)
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   rtol=1e-4)
        for a, b in zip(jax.tree_util.tree_leaves(ga),
                        jax.tree_util.tree_leaves(gb)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=5e-4, rtol=5e-3)


def test_stable_branch_text_encoder_with_embedding_fold(rng):
    """stable_lora text-encoder branch mode: linear sites run as branches,
    EMBEDDING sites (loralib CLIPTextEmbeddings, no branch layer) are
    folded via apply_lora(only_kinds={'embedding'}) -- together they must
    reproduce the full merged overlay, values and grads."""
    from text_to_video_finetuning_tpu.lora.overlay import (
        prepare_branch_collection)
    from text_to_video_finetuning_tpu.models import CLIPTextModel

    cfg = tiny_clip_config()
    clip = CLIPTextModel(config=cfg)
    ids = jnp.array([[3, 5, 7, 2] + [0] * 73], jnp.int32)
    params = jax.jit(clip.init)(rng, ids)["params"]
    from text_to_video_finetuning_tpu.lora.handler import STABLE_SEARCH
    sites = select_sites(enumerate_text_encoder_sites(cfg),
                         ["CLIPAttention", "CLIPTextEmbeddings"],
                         search_classes=STABLE_SEARCH)
    assert {s.kind for s in sites} == {"linear", "embedding"}
    lora = init_lora_params(rng, sites, rank=4, version="stable_lora")
    leaves, treedef = jax.tree_util.tree_flatten(lora)
    keys = jax.random.split(rng, len(leaves))
    lora = jax.tree_util.tree_unflatten(
        treedef, [jax.random.normal(k, l.shape) * 0.05
                  for k, l in zip(keys, leaves)])

    def loss_overlay(l):
        eff = apply_lora(params, l, sites, "stable_lora")
        return jnp.sum(clip.apply({"params": eff}, ids) ** 2)

    def loss_branch(l):
        eff = apply_lora(params, l, sites, "stable_lora",
                         only_kinds=frozenset({"embedding"}))
        col = prepare_branch_collection(l, sites, version="stable_lora")
        return jnp.sum(clip.apply({"params": eff, "lora": col}, ids) ** 2)

    la, ga = jax.value_and_grad(loss_overlay)(lora)
    lb, gb = jax.value_and_grad(loss_branch)(lora)
    np.testing.assert_allclose(np.asarray(la), np.asarray(lb), rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(ga),
                    jax.tree_util.tree_leaves(gb)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=5e-3)


def test_zero_init_is_identity(unet_setup, rng):
    cfg, unet, params, sample, text = unet_setup
    for version in ("cloneofsimo", "stable_lora"):
        handler = LoraHandler(version=version, use_unet_lora=True,
                              unet_replace_modules=["Transformer2DModel"])
        lora, sites, _ = handler.add_lora_to_model(True, "unet", cfg, r=4,
                                                   rng=rng)
        eff = apply_lora(params, lora, sites, version)
        out_a = unet.apply({"params": params}, sample, jnp.array([1]), text)
        out_b = unet.apply({"params": eff}, sample, jnp.array([1]), text)
        np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b),
                                   atol=1e-6)


def test_pt_format_roundtrip(tmp_path, unet_setup, rng):
    cfg, _, _, _, _ = unet_setup
    handler = LoraHandler(version="cloneofsimo", use_unet_lora=True,
                          unet_replace_modules=["ResnetBlock2D",
                                                "Transformer2DModel"])
    lora, sites, _ = handler.add_lora_to_model(True, "unet", cfg, r=4,
                                               rng=rng)
    path = str(tmp_path / "300_unet.pt")
    formats.save_lora_pt(lora, sites, path)
    lora2 = formats.load_lora_pt(path, sites)
    for a, b in zip(jax.tree_util.tree_leaves(lora),
                    jax.tree_util.tree_leaves(lora2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)

    # the .pt list interoperates with torch directly
    import torch
    weights = torch.load(path, weights_only=True)
    assert len(weights) == 2 * len(sites)
    assert weights[0].dtype == torch.float32


def test_stable_lora_webui_export(tmp_path, unet_setup, rng):
    cfg, _, _, _, _ = unet_setup
    handler = LoraHandler(version="stable_lora", use_unet_lora=True,
                          save_for_webui=True,
                          unet_replace_modules=["Transformer2DModel"])
    lora, sites, _ = handler.add_lora_to_model(True, "unet", cfg, r=4,
                                               rng=rng)
    handler.save_lora_weights(str(tmp_path), 42, unet_lora=lora,
                              unet_sites=sites)
    lora_dir = tmp_path / "lora"
    full = list((lora_dir / "full_weights").glob("*.safetensors"))
    webui = list(lora_dir.glob("webui_*.safetensors"))
    assert len(full) == 1 and len(webui) == 1
    # webui keys are CompVis-style
    from safetensors import safe_open
    with safe_open(str(webui[0]), framework="numpy") as f:
        keys = list(f.keys())
    assert all(k.startswith(("input_blocks", "middle_block",
                             "output_blocks", "time_embed", "out."))
               for k in keys), keys[:5]


def test_negation_excludes_lora_sites(unet_setup, rng):
    """Co-training semantics (reference train.py:195-202): base params at
    LoRA'd child names are excluded from the trainable set unless 'temp'
    is in the name."""
    cfg, _, params, _, _ = unet_setup
    handler = LoraHandler(version="cloneofsimo", use_unet_lora=True,
                          unet_replace_modules=["Transformer2DModel"])
    _, _, negation = handler.add_lora_to_model(True, "unet", cfg, r=4,
                                               rng=rng)
    trainable, frozen = select_trainable(params, "unet",
                                         ["attn1", "temp_attentions"],
                                         negation)
    t_keys = {".".join(k) for k in flatten_dict(trainable)}
    # attn1 spatial to_q is negated (to_q in negation list)
    assert not any("attentions_0.transformer_blocks_0.attn1.to_q" in k
                   and "temp" not in k for k in t_keys)
    # temporal attn1 survives ('temp' in name)
    assert any("temp_attentions_0.transformer_blocks_0.attn1.to_q" in k
               for k in t_keys)


def test_text_encoder_sites(rng):
    cfg = tiny_clip_config()
    sites = enumerate_text_encoder_sites(cfg)
    sel = select_sites(sites, ["CLIPAttention"], ("linear",))
    assert len(sel) == cfg.num_hidden_layers * 4
    # loralib registration order: k, v, q, out
    assert sel[0].torch_name.endswith("self_attn.k_proj")
    assert sel[3].torch_name.endswith("self_attn.out_proj")


def test_safetensors_safeloras_roundtrip(tmp_path, unet_setup, rng):
    """cloneofsimo .safetensors layout ({name}:{i}:up/down + metadata,
    reference utils/lora.py:597-629) roundtrips exactly (fp16 storage)."""
    cfg, _, _, _, _ = unet_setup
    sites = select_sites(enumerate_unet_sites(cfg), ["Transformer2DModel"])
    lora = init_lora_params(rng, sites, rank=4)
    lora = jax.tree_util.tree_map(
        lambda x: jax.random.normal(rng, x.shape) * 0.01, lora)
    path = str(tmp_path / "lora.safetensors")
    formats.save_safeloras({"unet": (lora, sites, {"Transformer2DModel"})},
                           path)
    loaded = formats.load_safeloras_into(path, {"unet": sites})["unet"]
    for a, b in zip(jax.tree_util.tree_leaves(lora),
                    jax.tree_util.tree_leaves(loaded)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-3)


def test_stable_lora_full_weights_load_roundtrip(tmp_path, unet_setup, rng):
    """stable_lora full_weights save -> handler load (resume path,
    reference utils/lora_handler.py:125-148 + stable_lora load_lora)."""
    cfg, _, _, _, _ = unet_setup
    handler = LoraHandler(version="stable_lora", use_unet_lora=True,
                          unet_replace_modules=["Transformer2DModel"])
    lora, sites, _ = handler.add_lora_to_model(True, "unet", cfg, r=4,
                                               rng=rng)
    lora = jax.tree_util.tree_map(
        lambda x: jax.random.normal(rng, x.shape) * 0.02, lora)
    handler.save_lora_weights(str(tmp_path), 7, unet_lora=lora,
                              unet_sites=sites)
    full = glob_one(tmp_path / "lora" / "full_weights", "*_unet.safetensors")
    loaded = handler.load_lora_file(str(full), sites)
    for a, b in zip(jax.tree_util.tree_leaves(lora),
                    jax.tree_util.tree_leaves(loaded)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def glob_one(directory, pattern):
    import glob as globmod
    matches = globmod.glob(str(directory / pattern))
    assert len(matches) == 1, matches
    return matches[0]


def test_lora_resume_via_lora_path(tmp_path, unet_setup, rng):
    """add_lora_to_model with lora_path resumes from the saved .pt
    (reference README.md:135-139 lora resume)."""
    cfg, _, _, _, _ = unet_setup
    handler = LoraHandler(version="cloneofsimo", use_unet_lora=True,
                          unet_replace_modules=["Transformer2DModel"])
    lora, sites, _ = handler.add_lora_to_model(True, "unet", cfg, r=4,
                                               rng=rng)
    lora = jax.tree_util.tree_map(
        lambda x: jax.random.normal(rng, x.shape) * 0.05, lora)
    handler.save_lora_weights(str(tmp_path), 9, unet_lora=lora,
                              unet_sites=sites)
    lora2, _, _ = handler.add_lora_to_model(
        True, "unet", cfg, lora_path=str(tmp_path / "lora"), r=4, rng=rng)
    for a, b in zip(jax.tree_util.tree_leaves(lora),
                    jax.tree_util.tree_leaves(lora2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


# -- merging (lora/merge.py; the reference's "What you cannot do") -----------

def _rand_like(tree, key, scale=0.05):
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    keys = jax.random.split(key, len(leaves))
    return jax.tree_util.tree_unflatten(
        treedef, [jax.random.normal(k, l.shape) * scale
                  for k, l in zip(keys, leaves)])


def test_merge_lora_trees_exact_cloneofsimo(unet_setup, rng):
    """Weighted merge by rank concatenation == sequential weighted applies
    (sum of deltas), for every site kind the UNet has."""
    from text_to_video_finetuning_tpu.lora.merge import merge_lora_trees
    cfg, _, params, _, _ = unet_setup
    sites = select_sites(enumerate_unet_sites(cfg), ["UNet3DConditionModel"])
    k1, k2 = jax.random.split(rng)
    t1 = _rand_like(init_lora_params(k1, sites, 4), k1)
    t2 = _rand_like(init_lora_params(k2, sites, 3), k2)

    merged = merge_lora_trees([t1, t2], [0.7, 0.3])
    eff_seq = apply_lora(apply_lora(params, t1, sites, scale=0.7),
                         t2, sites, scale=0.3)
    eff_m = apply_lora(params, merged, sites)
    for a, b in zip(jax.tree_util.tree_leaves(eff_seq),
                    jax.tree_util.tree_leaves(eff_m)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_merge_lora_trees_exact_stable(unet_setup, rng):
    from text_to_video_finetuning_tpu.lora.merge import merge_lora_trees
    cfg, _, params, _, _ = unet_setup
    sites = select_sites(enumerate_unet_sites(cfg), ["Transformer2DModel"],
                         ("linear", "conv2d", "conv3d"))
    k1, k2 = jax.random.split(rng)
    t1 = _rand_like(init_lora_params(k1, sites, 4, "stable_lora"), k1)
    t2 = _rand_like(init_lora_params(k2, sites, 4, "stable_lora"), k2)

    merged = merge_lora_trees([t1, t2], [0.6, 0.4])
    # _delta_stable has no runtime scale knob; fold the weights into `up`
    scale_up = lambda t, w: jax.tree_util.tree_map_with_path(
        lambda p, x: x * w if p[-1].key == "up" else x, t)
    eff_seq = apply_lora(
        apply_lora(params, scale_up(t1, 0.6), sites, "stable_lora",
                   alpha_over_r=0.5),
        scale_up(t2, 0.4), sites, "stable_lora", alpha_over_r=0.5)
    eff_m = apply_lora(params, merged, sites, "stable_lora",
                       alpha_over_r=0.5)
    for a, b in zip(jax.tree_util.tree_leaves(eff_seq),
                    jax.tree_util.tree_leaves(eff_m)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_truncate_lora_rank_exact_when_rank_covers(unet_setup, rng):
    """SVD compression back to r is exact when the merged delta's true rank
    is <= r (here: two scaled copies of the same rank-4 LoRA)."""
    from text_to_video_finetuning_tpu.lora.merge import (merge_lora_trees,
                                                         truncate_lora_rank)
    cfg, _, params, _, _ = unet_setup
    sites = select_sites(enumerate_unet_sites(cfg), ["CrossAttention"])
    t1 = _rand_like(init_lora_params(rng, sites, 4), rng)
    merged = merge_lora_trees([t1, t1], [0.25, 0.75])     # rank 8, true 4
    squeezed = truncate_lora_rank(merged, sites, 4)
    flat = flatten_dict(squeezed)
    assert all(flat[s.flax_path + ("down",)].shape[0] == 4 for s in sites)
    eff_exact = apply_lora(params, t1, sites)             # weights sum to 1
    eff_sq = apply_lora(params, squeezed, sites)
    for a, b in zip(jax.tree_util.tree_leaves(eff_exact),
                    jax.tree_util.tree_leaves(eff_sq)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_merge_lora_cli_roundtrip(tmp_path, tiny_pipeline_dir, rng):
    """t2v-merge-lora end-to-end: two .pt files in, merged .pt out, loadable
    and equal to the in-memory merge."""
    from text_to_video_finetuning_tpu.cli import merge_lora_main
    from text_to_video_finetuning_tpu.lora.merge import merge_lora_trees
    from text_to_video_finetuning_tpu.utils import checkpoint as ckpt
    cfg = ckpt.load_unet_config(os.path.join(str(tiny_pipeline_dir), "unet"))
    handler = LoraHandler(version="cloneofsimo", use_unet_lora=True)
    sites = handler.unet_sites(cfg)
    k1, k2 = jax.random.split(rng)
    t1 = _rand_like(init_lora_params(k1, sites, 4), k1)
    t2 = _rand_like(init_lora_params(k2, sites, 4), k2)
    p1, p2 = str(tmp_path / "a_unet.pt"), str(tmp_path / "b_unet.pt")
    formats.save_lora_pt(t1, sites, p1)
    formats.save_lora_pt(t2, sites, p2)

    out = str(tmp_path / "merged_unet.pt")
    merge_lora_main([p1, p2, "-o", out, "-m", str(tiny_pipeline_dir),
                     "-w", "0.5", "0.5"])
    loaded = formats.load_lora_pt(out, sites)
    expect = merge_lora_trees([t1, t2], [0.5, 0.5])
    for a, b in zip(jax.tree_util.tree_leaves(expect),
                    jax.tree_util.tree_leaves(loaded)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_bake_lora_cli(tmp_path, tiny_pipeline_dir, rng):
    """t2v-bake-lora: merged pipeline on disk == collapse_lora of the base
    (reference utils/lora.py:781-816 semantics, standalone-model export)."""
    from text_to_video_finetuning_tpu.cli import bake_lora_main
    from text_to_video_finetuning_tpu.lora.overlay import collapse_lora
    from text_to_video_finetuning_tpu.utils import checkpoint as ckpt
    cfg, base = ckpt.load_unet(os.path.join(str(tiny_pipeline_dir), "unet"))
    handler = LoraHandler(version="cloneofsimo", use_unet_lora=True)
    sites = handler.unet_sites(cfg)
    lora = _rand_like(init_lora_params(rng, sites, 4), rng)
    lora_dir = tmp_path / "loras"
    lora_dir.mkdir()
    formats.save_lora_pt(lora, sites, str(lora_dir / "9_unet.pt"))

    out = str(tmp_path / "baked")
    bake_lora_main(["-m", str(tiny_pipeline_dir), "-lP", str(lora_dir),
                    "-o", out, "-lS", "1.0"])
    assert os.path.exists(os.path.join(out, "model_index.json"))
    _, baked = ckpt.load_unet(os.path.join(out, "unet"))
    expect = collapse_lora(base, lora, sites)
    for a, b in zip(jax.tree_util.tree_leaves(expect),
                    jax.tree_util.tree_leaves(baked)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_merge_lora_cli_safetensors_and_text_encoder(tmp_path,
                                                     tiny_pipeline_dir, rng):
    """The two CLI branches the .pt roundtrip misses: cloneofsimo merge to
    .safetensors (save_safeloras layout, loadable via handler) and the
    text_encoder site set."""
    from text_to_video_finetuning_tpu.cli import merge_lora_main
    from text_to_video_finetuning_tpu.lora.merge import merge_lora_trees
    from text_to_video_finetuning_tpu.utils import checkpoint as ckpt

    # unet merge -> .safetensors
    cfg = ckpt.load_unet_config(os.path.join(str(tiny_pipeline_dir), "unet"))
    handler = LoraHandler(version="cloneofsimo", use_unet_lora=True)
    sites = handler.unet_sites(cfg)
    k1, k2 = jax.random.split(rng)
    t1 = _rand_like(init_lora_params(k1, sites, 4), k1)
    t2 = _rand_like(init_lora_params(k2, sites, 4), k2)
    p1, p2 = str(tmp_path / "a_unet.pt"), str(tmp_path / "b_unet.pt")
    formats.save_lora_pt(t1, sites, p1)
    formats.save_lora_pt(t2, sites, p2)
    out = str(tmp_path / "merged_unet.safetensors")
    merge_lora_main([p1, p2, "-o", out, "-m", str(tiny_pipeline_dir)])
    loaded = handler.load_lora_file(out, sites)
    expect = merge_lora_trees([t1, t2])
    for a, b in zip(jax.tree_util.tree_leaves(expect),
                    jax.tree_util.tree_leaves(loaded)):
        # safeloras stores fp16 (formats.py:94-95, reference layout)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-4)

    # text_encoder merge -> .pt (site enumeration goes through the CLIP
    # config / CLIPEncoderLayer default target path in the CLI)
    clip_cfg = ckpt.load_clip_config(
        os.path.join(str(tiny_pipeline_dir), "text_encoder"))
    te_handler = LoraHandler(version="cloneofsimo", use_text_lora=True,
                             text_encoder_replace_modules=["CLIPEncoderLayer"])
    te_sites = te_handler.text_encoder_sites(clip_cfg)
    u1 = _rand_like(init_lora_params(k1, te_sites, 4), k2)
    q1 = str(tmp_path / "a_text_encoder.pt")
    formats.save_lora_pt(u1, te_sites, q1)
    out2 = str(tmp_path / "m_text_encoder.pt")
    merge_lora_main([q1, q1, "-o", out2, "-m", str(tiny_pipeline_dir),
                     "-k", "text_encoder", "-w", "0.5", "0.5"])
    expect2 = merge_lora_trees([u1, u1], [0.5, 0.5])        # rank 8
    loaded2 = formats.load_lora_pt(out2, te_sites)
    for a, b in zip(jax.tree_util.tree_leaves(expect2),
                    jax.tree_util.tree_leaves(loaded2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
