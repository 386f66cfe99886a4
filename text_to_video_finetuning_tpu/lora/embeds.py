"""Textual-inversion learned embeddings: load + apply into CLIP.

Behavioral spec: `apply_learned_embed_in_clip` / `load_learned_embed_in_clip`
(reference utils/lora.py:1099-1156) and the safeloras embed sidecar
(reference utils/lora.py:597-631, parse_safeloras_embeds).  The reference
mutates the live torch text encoder; here the flax param tree is grown
functionally and the (mutable, pure-Python) tokenizer gains the new tokens.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Union

import numpy as np

from flax.traverse_util import flatten_dict, unflatten_dict


def load_learned_embeds(path: str) -> Dict[str, np.ndarray]:
    """Load a {token: embedding} dict from a torch `.ti.pt` file
    (reference utils/lora.py:1139-1149) or a safeloras `.safetensors`
    (embed entries flagged `<embed>` in metadata, reference
    utils/lora.py:660-689)."""
    if path.endswith(".pt"):
        import torch
        d = torch.load(path, map_location="cpu", weights_only=True)
        return {k: np.asarray(v, dtype=np.float32) for k, v in d.items()}
    from .formats import parse_safeloras
    try:
        _, embeds = parse_safeloras(path)
    except Exception:
        # not a safeloras file (e.g. a kohya/webui LoRA whose metadata is
        # not the safeloras JSON scheme) -- it simply carries no embeds
        return {}
    return {k: np.asarray(v, dtype=np.float32) for k, v in embeds.items()}


def apply_learned_embeds_in_clip(
        learned_embeds: Dict[str, np.ndarray], text_params: Dict, tokenizer,
        token: Optional[Union[str, List[str]]] = None,
        idempotent: bool = False):
    """Add each learned token to `tokenizer`, grow the token-embedding
    table, and write the learned rows.

    Returns (new_text_params, applied_token_names).  Mirrors the reference's
    collision behavior (reference utils/lora.py:1099-1134): non-idempotent
    mode renames `<tok>` to `<to-1>`-style variants until the tokenizer
    accepts it; idempotent mode overwrites the existing token's row.
    """
    if isinstance(token, str):
        trained_tokens = [token]
    elif isinstance(token, (list, tuple)):
        if len(learned_embeds) != len(token):
            raise ValueError("number of tokens and embeds must match")
        trained_tokens = list(token)
    else:
        trained_tokens = list(learned_embeds.keys())

    flat = dict(flatten_dict(text_params))
    table_key = ("token_embedding", "embedding")
    # owned host copy: the in-place row writes below must never alias the
    # caller's (possibly read-only, jax-backed) table
    table = np.array(flat[table_key])
    hidden = table.shape[1]

    applied = []
    for tok in trained_tokens:
        embed = np.asarray(learned_embeds[tok],
                           dtype=table.dtype).reshape(-1)
        if embed.shape[0] != hidden:
            raise ValueError(
                f"embedding for {tok!r} has dim {embed.shape[0]}, text "
                f"encoder hidden size is {hidden}")
        num_added = tokenizer.add_tokens(tok)
        i = 1
        if not idempotent:
            while num_added == 0:
                tok = f"{tok[:-1]}-{i}>"
                num_added = tokenizer.add_tokens(tok)
                i += 1
        # resize (reference text_encoder.resize_token_embeddings)
        new_size = len(tokenizer)
        if new_size > table.shape[0]:
            pad = np.zeros((new_size - table.shape[0], hidden), table.dtype)
            table = np.concatenate([table, pad], axis=0)
        token_id = tokenizer.convert_tokens_to_ids(tok)
        table[token_id] = embed
        applied.append(tok)

    flat[table_key] = table
    return unflatten_dict(flat), applied
