"""Textual-inversion embeds + runtime LoRA scale.

Reference surface: safeloras embed sidecars and
`apply_learned_embed_in_clip` (reference utils/lora.py:597-631,1099-1156),
`tune_lora_scale` (reference utils/lora.py:1077-1081)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.fixture()
def clip_setup(tmp_path):
    from transformers import CLIPTokenizer
    from text_to_video_finetuning_tpu.models.clip_text import (
        CLIPTextModel, tiny_clip_config)
    from text_to_video_finetuning_tpu.utils.simple_tokenizer import (
        write_minimal_clip_tokenizer)
    tok_dir = str(tmp_path / "tok")
    write_minimal_clip_tokenizer(tok_dir, vocab_size_floor=512)
    tokenizer = CLIPTokenizer.from_pretrained(tok_dir)
    cfg = tiny_clip_config(vocab_size=len(tokenizer))
    model = CLIPTextModel(config=cfg)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.ones((1, 77), jnp.int32))["params"]
    return tokenizer, cfg, model, params


def test_embeds_roundtrip_through_safeloras(clip_setup, tmp_path):
    """save_safeloras(embeds=...) -> load -> apply: tokenizer gains the
    token and the embedding row holds the learned vector."""
    from text_to_video_finetuning_tpu.lora.embeds import (
        apply_learned_embeds_in_clip, load_learned_embeds)
    from text_to_video_finetuning_tpu.lora.formats import save_safeloras

    tokenizer, cfg, model, params = clip_setup
    vec = np.arange(cfg.hidden_size, dtype=np.float32) / cfg.hidden_size
    path = str(tmp_path / "lora.safetensors")
    save_safeloras({}, path, embeds={"<mytok>": vec})

    embeds = load_learned_embeds(path)
    assert list(embeds) == ["<mytok>"]
    old_vocab = len(tokenizer)
    new_params, applied = apply_learned_embeds_in_clip(
        embeds, params, tokenizer)
    assert applied == ["<mytok>"]
    assert len(tokenizer) == old_vocab + 1
    token_id = tokenizer.convert_tokens_to_ids("<mytok>")
    table = np.asarray(new_params["token_embedding"]["embedding"])
    np.testing.assert_allclose(table[token_id], vec, atol=0)

    # the grown table still drives the encoder (row reachable end-to-end);
    # the module config must grow with the tokenizer, as in
    # pipelines/inference.initialize_pipeline
    import dataclasses
    from text_to_video_finetuning_tpu.models.clip_text import CLIPTextModel
    grown = CLIPTextModel(config=dataclasses.replace(
        cfg, vocab_size=len(tokenizer)))
    ids = tokenizer("<mytok>", padding="max_length", max_length=77,
                    truncation=True, return_tensors="np").input_ids
    assert (ids == token_id).any()
    out = grown.apply({"params": new_params}, jnp.asarray(ids))
    assert np.isfinite(np.asarray(out)).all()


def test_embeds_ti_pt_sidecar(clip_setup, tmp_path):
    import torch
    from text_to_video_finetuning_tpu.lora.embeds import load_learned_embeds
    tokenizer, cfg, model, params = clip_setup
    vec = np.ones(cfg.hidden_size, np.float32) * 0.5
    path = str(tmp_path / "lora.ti.pt")
    torch.save({"<sks>": torch.from_numpy(vec)}, path)
    embeds = load_learned_embeds(path)
    np.testing.assert_allclose(embeds["<sks>"], vec)


def test_embeds_collision_rename_and_idempotent(clip_setup):
    from text_to_video_finetuning_tpu.lora.embeds import (
        apply_learned_embeds_in_clip)
    tokenizer, cfg, model, params = clip_setup
    v1 = np.full(cfg.hidden_size, 0.25, np.float32)
    v2 = np.full(cfg.hidden_size, 0.75, np.float32)
    params, applied1 = apply_learned_embeds_in_clip({"<t>": v1}, params,
                                                    tokenizer)
    assert applied1 == ["<t>"]
    # non-idempotent: second add renames (reference utils/lora.py:1119-1125)
    params, applied2 = apply_learned_embeds_in_clip({"<t>": v2}, params,
                                                    tokenizer)
    assert applied2 == ["<t-1>"]
    # idempotent: overwrites the original row in place
    v3 = np.full(cfg.hidden_size, -0.5, np.float32)
    params, applied3 = apply_learned_embeds_in_clip(
        {"<t>": v3}, params, tokenizer, idempotent=True)
    assert applied3 == ["<t>"]
    tid = tokenizer.convert_tokens_to_ids("<t>")
    table = np.asarray(params["token_embedding"]["embedding"])
    np.testing.assert_allclose(table[tid], v3)


def test_lora_scale_zero_is_base_model():
    """tune_lora_scale(0) parity: collapse at alpha=0 returns the base
    params exactly; alpha scales the delta linearly."""
    from text_to_video_finetuning_tpu.lora.overlay import (collapse_lora,
                                                           init_lora_params)
    from text_to_video_finetuning_tpu.lora.sites import (
        enumerate_unet_sites, select_sites)
    from text_to_video_finetuning_tpu.models.unet3d import micro_unet_config

    cfg = micro_unet_config()
    sites = select_sites(enumerate_unet_sites(cfg),
                         {"CrossAttention"})[:4]
    rng = jax.random.PRNGKey(1)
    lora = init_lora_params(rng, sites, rank=2)
    # make up nonzero so the delta is nonzero
    lora = jax.tree_util.tree_map(
        lambda x: x + 0.1 if x.ndim else x, lora)

    base = {}
    from flax.traverse_util import unflatten_dict
    flat = {}
    for s in sites:
        flat[s.flax_path + ("kernel",)] = jnp.ones(
            (s.in_features, s.out_features)) * 0.3
    base = unflatten_dict(flat)

    from flax.traverse_util import flatten_dict
    at0 = collapse_lora(base, lora, sites, alpha=0.0)
    for (k, a), (_, b) in zip(flatten_dict(at0).items(),
                              flatten_dict(base).items()):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)

    at1 = collapse_lora(base, lora, sites, alpha=1.0)
    at2 = collapse_lora(base, lora, sites, alpha=2.0)
    for k in flatten_dict(base):
        d1 = np.asarray(flatten_dict(at1)[k]) - np.asarray(
            flatten_dict(base)[k])
        d2 = np.asarray(flatten_dict(at2)[k]) - np.asarray(
            flatten_dict(base)[k])
        np.testing.assert_allclose(d2, 2 * d1, rtol=1e-5, atol=1e-6)


def test_initialize_pipeline_applies_embeds_and_scale(tiny_pipeline_dir,
                                                      tmp_path):
    """inject_inferable_lora-equivalent path: a lora_path dir holding an
    embeds-only safeloras file grows the pipeline tokenizer/text encoder
    (reference patch_pipe + apply_learned_embed_in_clip,
    utils/lora.py:1190-1222)."""
    from text_to_video_finetuning_tpu.lora.formats import save_safeloras
    from text_to_video_finetuning_tpu.pipelines.inference import (
        initialize_pipeline)

    lora_dir = tmp_path / "lora"
    lora_dir.mkdir()
    # hidden size of the tiny pipeline's text encoder = cross_attention_dim
    pipe_plain = initialize_pipeline(tiny_pipeline_dir, half=False)
    hidden = pipe_plain.text_params["token_embedding"]["embedding"].shape[1]
    base_vocab = len(pipe_plain.tokenizer)
    vec = np.full((hidden,), 0.125, np.float32)
    save_safeloras({}, str(lora_dir / "embeds.safetensors"),
                   embeds={"<newtok>": vec})

    pipe = initialize_pipeline(tiny_pipeline_dir, half=False,
                               lora_path=str(lora_dir), lora_scale=0.5)
    assert len(pipe.tokenizer) == base_vocab + 1
    tid = pipe.tokenizer.convert_tokens_to_ids("<newtok>")
    table = np.asarray(pipe.text_params["token_embedding"]["embedding"])
    np.testing.assert_allclose(table[tid], vec)
    assert pipe.text_encoder.config.vocab_size == base_vocab + 1
