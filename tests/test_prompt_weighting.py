"""Compel-parity prompt weighting: span weights (+nesting, +/- suffixes),
blends, conjunctions, >77-token chunking (reference inference.py:298-301)."""

import numpy as np
import pytest

import jax.numpy as jnp

from text_to_video_finetuning_tpu.utils.prompt_weighting import (
    _parse_compound, encode_weighted_prompt, parse_weighted_prompt)


@pytest.fixture(scope="module")
def pipe(tiny_pipeline_dir):
    from text_to_video_finetuning_tpu.pipelines.inference import (
        initialize_pipeline)
    return initialize_pipeline(tiny_pipeline_dir, half=False)


def test_parse_basic_and_suffixes():
    assert parse_weighted_prompt("a (b)1.5 c") == [
        ("a ", 1.0), ("b", 1.5), (" c", 1.0)]
    assert parse_weighted_prompt("(b)") == [("b", 1.1)]
    assert parse_weighted_prompt("[b]") == [("b", 0.9)]
    frags = parse_weighted_prompt("(b)++")
    assert frags[0][0] == "b"
    np.testing.assert_allclose(frags[0][1], 1.1 ** 2)
    frags = parse_weighted_prompt("(b)-")
    np.testing.assert_allclose(frags[0][1], 0.9)


def test_parse_nested_weights_multiply():
    frags = parse_weighted_prompt("(a (b)1.5)2.0")
    d = dict(frags)
    np.testing.assert_allclose(d["a "], 2.0)
    np.testing.assert_allclose(d["b"], 3.0)


def test_parse_explicit_zero_weight():
    # compel: (text)0 nulls the span; 0 must not fall back to the 1.1
    # paren default (falsy-zero regression)
    assert parse_weighted_prompt("(zero)0 x") == [
        ("zero", 0.0), (" x", 1.0)]


def test_parse_unmatched_paren_keeps_text():
    # unbalanced opener: compel treats a stray '(' as literal text (the
    # character is KEPT) -- the remainder keeps the ENCLOSING weight (1.0
    # at top level), it does NOT get the 1.1 span up-weight
    assert parse_weighted_prompt("a photo (c. 1920") == [
        ("a photo ", 1.0), ("(", 1.0), ("c. 1920", 1.0)]
    # nested unmatched opener: the outer '(' (whose closer was consumed by
    # the inner span) is literal; the inner balanced span keeps its weight
    assert parse_weighted_prompt("(big (oops)") == [("(", 1.0),
                                                    ("big ", 1.0),
                                                    ("oops", 1.1)]


def test_parse_compound_forms():
    op, parts, weights = _parse_compound(
        '("a cat", "a dog").blend(0.7, 0.3)')
    assert op == "blend" and parts == ["a cat", "a dog"]
    assert weights == [0.7, 0.3]
    op, parts, weights = _parse_compound('("x", "y").and()')
    assert op == "and" and parts == ["x", "y"]
    assert _parse_compound("just a prompt") is None


def test_long_prompt_chunks(pipe):
    short = encode_weighted_prompt(pipe, ["a cat"])
    assert short.shape[1] == 77
    long_prompt = " ".join(["cat"] * 120)   # > 75 tokens
    n_tokens = len(pipe.tokenizer(long_prompt,
                                  add_special_tokens=False).input_ids)
    windows = -(-n_tokens // 75)            # ceil over the 75-token payload
    assert windows > 1
    long = encode_weighted_prompt(pipe, [long_prompt])
    assert long.shape[1] == 77 * windows
    # batch mixing short+long pads the short one
    both = encode_weighted_prompt(pipe, ["a cat", long_prompt])
    assert both.shape == (2, 77 * windows, short.shape[-1])
    np.testing.assert_allclose(np.asarray(both[0, :77]),
                               np.asarray(short[0]), atol=1e-6)


def test_blend_of_identical_prompts_is_identity(pipe):
    base = encode_weighted_prompt(pipe, ["a cat"])
    blend = encode_weighted_prompt(
        pipe, ['("a cat", "a cat").blend(0.25, 0.75)'])
    np.testing.assert_allclose(np.asarray(blend), np.asarray(base),
                               atol=1e-5)


def test_blend_is_weighted_mix(pipe):
    a = np.asarray(encode_weighted_prompt(pipe, ["a cat"]))
    b = np.asarray(encode_weighted_prompt(pipe, ["a dog"]))
    mix = np.asarray(encode_weighted_prompt(
        pipe, ['("a cat", "a dog").blend(0.6, 0.4)']))
    np.testing.assert_allclose(mix, 0.6 * a + 0.4 * b, atol=1e-5)


def test_and_concatenates(pipe):
    a = np.asarray(encode_weighted_prompt(pipe, ["a cat"]))
    b = np.asarray(encode_weighted_prompt(pipe, ["a dog"]))
    both = np.asarray(encode_weighted_prompt(pipe, ['("a cat", "a dog")'
                                                    '.and()']))
    assert both.shape[1] == 154
    np.testing.assert_allclose(both[0, :77], a[0], atol=1e-6)
    np.testing.assert_allclose(both[0, 77:], b[0], atol=1e-6)


def test_and_applies_weights(pipe):
    a = np.asarray(encode_weighted_prompt(pipe, ["a cat"]))
    b = np.asarray(encode_weighted_prompt(pipe, ["a dog"]))
    both = np.asarray(encode_weighted_prompt(
        pipe, ['("a cat", "a dog").and(0.25, 1.0)']))
    np.testing.assert_allclose(both[0, :77], 0.25 * a[0], atol=1e-6)
    np.testing.assert_allclose(both[0, 77:], b[0], atol=1e-6)


def test_cfg_pads_uncond_to_long_prompt(pipe):
    long_prompt = " ".join(["cat"] * 120)
    cond = encode_weighted_prompt(pipe, [long_prompt])
    out = pipe.encode_prompt("ignored", None, True, prompt_embeds=cond)
    assert out.shape == (2, cond.shape[1], cond.shape[2])


def test_weighting_changes_embedding(pipe):
    a = np.asarray(encode_weighted_prompt(pipe, ["a cat"]))
    w = np.asarray(encode_weighted_prompt(pipe, ["a (cat)1.8"]))
    assert not np.allclose(a, w)
