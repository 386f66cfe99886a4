"""Weighted-prompt encoding: the compel equivalent.

Behavioral spec: the reference conditions inference on compel-weighted
embeddings (`compel(prompt)`, reference inference.py:300-301).  Compel's
core semantics are reimplemented: `(text)weight` / `(text)` = x1.1 /
`[text]` = x0.9 spans scale their tokens' embeddings relative to the
empty-string baseline, renormalized to preserve the overall embedding norm.
"""

from __future__ import annotations

import re
from typing import List, Tuple

import jax.numpy as jnp
import numpy as np

_ATTN_RE = re.compile(r"""
\(([^()]+)\)(?:([\d.]+))?   # (text)weight or (text)
|\[([^\[\]]+)\]             # [text]
""", re.X)


def parse_weighted_prompt(prompt: str) -> List[Tuple[str, float]]:
    """-> [(fragment, weight)]; plain text has weight 1.0."""
    out: List[Tuple[str, float]] = []
    pos = 0
    for m in _ATTN_RE.finditer(prompt):
        if m.start() > pos:
            out.append((prompt[pos:m.start()], 1.0))
        if m.group(1) is not None:
            weight = float(m.group(2)) if m.group(2) else 1.1
            out.append((m.group(1), weight))
        else:
            out.append((m.group(3), 0.9))
        pos = m.end()
    if pos < len(prompt):
        out.append((prompt[pos:], 1.0))
    return [(t, w) for t, w in out if t]


def encode_weighted_prompt(pipe, prompts: List[str]) -> jnp.ndarray:
    """-> (B, 77, D) embeddings with per-token weights applied."""
    tokenizer = pipe.tokenizer
    max_len = tokenizer.model_max_length
    all_ids, all_weights = [], []
    for prompt in prompts:
        fragments = parse_weighted_prompt(prompt)
        ids: List[int] = []
        weights: List[float] = []
        for text, weight in fragments:
            frag_ids = tokenizer(text.strip(),
                                 add_special_tokens=False).input_ids
            ids += frag_ids
            weights += [weight] * len(frag_ids)
        ids = ids[: max_len - 2]
        weights = weights[: max_len - 2]
        bos, eos = tokenizer.bos_token_id, tokenizer.eos_token_id
        ids = [bos] + ids + [eos] * (max_len - 1 - len(ids))
        weights = [1.0] + weights + [1.0] * (max_len - 1 - len(weights))
        all_ids.append(ids)
        all_weights.append(weights)

    token_ids = np.asarray(all_ids, dtype=np.int32)
    weights = np.asarray(all_weights, dtype=np.float32)
    embeds = pipe._encode_text(pipe.text_params, jnp.asarray(token_ids))

    if np.allclose(weights, 1.0):
        return embeds
    # compel-style: scale token embeddings, then restore the per-sequence
    # mean norm so overall conditioning magnitude is unchanged
    previous_mean = jnp.mean(jnp.abs(embeds), axis=(-2, -1), keepdims=True)
    embeds = embeds * jnp.asarray(weights)[:, :, None]
    current_mean = jnp.mean(jnp.abs(embeds), axis=(-2, -1), keepdims=True)
    return embeds * (previous_mean / current_mean)
