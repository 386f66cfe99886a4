"""Weighted-prompt encoding: the compel equivalent.

Behavioral spec: the reference conditions inference on compel-weighted
embeddings (`compel(prompt)`, reference inference.py:298-301).  Covered
compel semantics:

* `(text)weight` / `(text)` = x1.1, `[text]` = x0.9 -- span weights scale
  the tokens' embeddings, renormalized to preserve the sequence norm.
* `(text)+` / `(text)++` / `(text)-` suffix forms (1.1**n / 0.9**n) and
  nested parentheses (weights multiply).
* blends: `("prompt a", "prompt b").blend(0.7, 0.3)` -- linear mix of the
  sub-prompt embeddings (weights normalized, compel's default).
* conjunction: `("prompt a", "prompt b").and()` -- embeddings concatenated
  along the sequence axis.
* long prompts: token sequences beyond the 77-token CLIP window are split
  into windows, each encoded with its own BOS/EOS, and concatenated
  (compel truncate_long_prompts=False behavior).
"""

from __future__ import annotations

import re
from typing import List, Tuple

import jax.numpy as jnp
import numpy as np

_WEIGHT_SUFFIX_RE = re.compile(r"^([\d.]+)|^(\++)|^(-+)")
_QUOTED_RE = re.compile(r'"((?:[^"\\]|\\.)*)"')
_COMPOUND_RE = re.compile(
    r'^\s*\((?P<parts>.*)\)\s*\.\s*(?P<op>blend|and)\s*'
    r'\(\s*(?P<args>[^)]*)\)\s*$', re.S)


def parse_weighted_prompt(prompt: str) -> List[Tuple[str, float]]:
    """-> [(fragment, weight)] with nesting and +/- suffixes; plain text
    has weight 1.0."""
    out: List[Tuple[str, float]] = []

    def emit(text, weight):
        if text:
            out.append((text, weight))

    def walk(s: str, pos: int, weight: float, closer: str) -> int:
        plain_start = pos
        while pos < len(s):
            ch = s[pos]
            if closer and ch == closer:
                emit(s[plain_start:pos], weight)
                return pos + 1
            if ch in "([":
                emit(s[plain_start:pos], weight)
                inner_close = ")" if ch == "(" else "]"
                base = 1.1 if ch == "(" else 0.9
                # find matching close to look at the suffix afterwards
                end, matched = _walk_span(s, pos + 1, inner_close)
                if not matched:
                    # unmatched opener: compel treats a stray '('/'[' as
                    # literal text -- keep the character itself and emit the
                    # remainder at the ENCLOSING weight, not the span's
                    # up/down weight (CLIP's tokenizer splits punctuation,
                    # so a standalone bracket fragment tokenizes the same)
                    emit(ch, weight)
                    walk_inner(s[pos + 1:end], weight)
                    pos = end
                    plain_start = pos
                    continue
                suffix_mult, consumed = _parse_suffix(s, end)
                inner_weight = (weight * suffix_mult
                                if suffix_mult is not None
                                else weight * base)
                walk_inner(s[pos + 1:end - 1], inner_weight)
                pos = end + consumed
                plain_start = pos
                continue
            pos += 1
        emit(s[plain_start:pos], weight)
        return pos

    def walk_inner(fragment: str, weight: float):
        # recursive parse of the span content at the accumulated weight
        sub = parse_weighted_prompt(fragment)
        for text, w in sub:
            emit(text, weight * w)

    def _walk_span(s: str, pos: int, closer: str):
        """Return (index one past the matching closer, matched?)."""
        opener = "(" if closer == ")" else "["
        depth = 1
        while pos < len(s):
            if s[pos] == opener:
                depth += 1
            elif s[pos] == closer:
                depth -= 1
                if depth == 0:
                    return pos + 1, True
            pos += 1
        return pos, False

    def _parse_suffix(s: str, pos: int):
        """Weight suffix after a closed span: number, '+'*n, or '-'*n.
        Returns (multiplier or None, chars consumed)."""
        m = _WEIGHT_SUFFIX_RE.match(s[pos:])
        if not m:
            return None, 0
        if m.group(1):
            try:
                return float(m.group(1)), len(m.group(1))
            except ValueError:
                return None, 0
        if m.group(2):
            return 1.1 ** len(m.group(2)), len(m.group(2))
        return 0.9 ** len(m.group(3)), len(m.group(3))

    walk(prompt, 0, 1.0, "")
    return [(t, w) for t, w in out if t.strip() != ""]


def _tokenize_weighted(tokenizer, prompt: str):
    """-> (ids, weights) unbounded-length lists (no special tokens)."""
    ids: List[int] = []
    weights: List[float] = []
    for text, weight in parse_weighted_prompt(prompt):
        frag_ids = tokenizer(text.strip(),
                             add_special_tokens=False).input_ids
        ids += frag_ids
        weights += [weight] * len(frag_ids)
    return ids, weights


def _encode_flat(pipe, prompt: str) -> jnp.ndarray:
    """Encode one (possibly >77-token) weighted prompt -> (L, D) with
    L = 77 * n_windows."""
    tokenizer = pipe.tokenizer
    max_len = tokenizer.model_max_length
    cap = max_len - 2
    bos, eos = tokenizer.bos_token_id, tokenizer.eos_token_id

    ids, weights = _tokenize_weighted(tokenizer, prompt)
    if not ids:
        ids, weights = [], []
    chunks_ids, chunks_w = [], []
    for i in range(0, max(len(ids), 1), cap):
        c_ids = ids[i:i + cap]
        c_w = weights[i:i + cap]
        c_ids = [bos] + c_ids + [eos] * (max_len - 1 - len(c_ids))
        c_w = [1.0] + c_w + [1.0] * (max_len - 1 - len(c_w))
        chunks_ids.append(c_ids)
        chunks_w.append(c_w)

    token_ids = np.asarray(chunks_ids, dtype=np.int32)     # (k, 77)
    w = np.asarray(chunks_w, dtype=np.float32)             # (k, 77)
    embeds = pipe._encode_text(pipe.text_params, jnp.asarray(token_ids))

    if not np.allclose(w, 1.0):
        # compel-style: scale token embeddings, then restore the per-window
        # mean magnitude so overall conditioning strength is unchanged
        previous_mean = jnp.mean(jnp.abs(embeds), axis=(-2, -1),
                                 keepdims=True)
        embeds = embeds * jnp.asarray(w)[:, :, None]
        current_mean = jnp.mean(jnp.abs(embeds), axis=(-2, -1),
                                keepdims=True)
        embeds = embeds * (previous_mean / current_mean)
    return embeds.reshape(-1, embeds.shape[-1])             # (k*77, D)


def _parse_compound(prompt: str):
    """Detect `("a", "b").blend(w...)` / `("a", "b").and()` at top level.
    Returns (op, [parts], [weights]) or None."""
    m = _COMPOUND_RE.match(prompt)
    if not m:
        return None
    parts = [p.replace('\\"', '"')
             for p in _QUOTED_RE.findall(m.group("parts"))]
    if not parts:
        return None
    op = m.group("op")
    args = [a.strip() for a in m.group("args").split(",") if a.strip()]
    weights = [float(a) for a in args] if args else [1.0] * len(parts)
    if len(weights) < len(parts):
        weights += [1.0] * (len(parts) - len(weights))
    return op, parts, weights[:len(parts)]


def pad_with_empty(e: jnp.ndarray, target_len: int,
                   empty: jnp.ndarray) -> jnp.ndarray:
    """Pad a (L, D) embedding to target_len rows with repeated
    encoded-empty 77-token windows (compel's long-prompt alignment)."""
    if e.shape[0] >= target_len:
        return e
    reps = -(-(target_len - e.shape[0]) // empty.shape[0])
    pad = jnp.concatenate([empty] * reps, axis=0)
    return jnp.concatenate([e, pad[:target_len - e.shape[0]]], axis=0)


def _encode_one(pipe, prompt: str) -> jnp.ndarray:
    compound = _parse_compound(prompt)
    if compound is None:
        return _encode_flat(pipe, prompt)
    op, parts, weights = compound
    encoded = [_encode_flat(pipe, p) for p in parts]
    if op == "and":
        # weighted conjunction: compel scales each sub-prompt's embedding
        # by its weight before concatenating along the sequence axis
        if any(w != 1.0 for w in weights):
            encoded = [w * e for w, e in zip(weights, encoded)]
        return jnp.concatenate(encoded, axis=0)
    # blend: pad to the longest, normalized weighted sum (compel default)
    max_l = max(e.shape[0] for e in encoded)
    empty = _encode_flat(pipe, "")
    padded = [pad_with_empty(e, max_l, empty) for e in encoded]
    total = sum(abs(w) for w in weights) or 1.0
    norm_w = [w / total for w in weights]
    return sum(w * e for w, e in zip(norm_w, padded))


def encode_weighted_prompt(pipe, prompts: List[str]) -> jnp.ndarray:
    """-> (B, L, D) embeddings, L = 77 * max window count in the batch."""
    encoded = [_encode_one(pipe, p) for p in prompts]
    max_l = max(e.shape[0] for e in encoded)
    if any(e.shape[0] != max_l for e in encoded):
        empty = _encode_flat(pipe, "")
        encoded = [pad_with_empty(e, max_l, empty) for e in encoded]
    return jnp.stack(encoded)
