"""Generate a minimal-but-valid CLIP tokenizer directory.

The real `text-to-video-ms-1.7b` ships its CLIP BPE tokenizer in the
pipeline dir; in hermetic test/bench environments (no network) we emit a
character-level CLIP tokenizer (byte vocab, zero merges) that
`transformers.CLIPTokenizer` loads natively. Token IDs differ from the real
vocabulary, but every framework path (fixed 77-token padding, bos/eos
semantics, prompt weighting) behaves identically.
"""

from __future__ import annotations

import json
import os


def write_minimal_clip_tokenizer(out_dir: str, vocab_size_floor: int = 512):
    os.makedirs(out_dir, exist_ok=True)
    chars = [chr(c) for c in range(32, 127)]
    vocab = {}
    for ch in chars:
        vocab.setdefault(ch, len(vocab))
    for ch in chars:
        vocab.setdefault(ch + "</w>", len(vocab))
    i = 0
    while len(vocab) < vocab_size_floor - 2:
        vocab.setdefault(f"<unused{i}>", len(vocab))
        i += 1
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)

    with open(os.path.join(out_dir, "vocab.json"), "w") as f:
        json.dump(vocab, f)
    with open(os.path.join(out_dir, "merges.txt"), "w") as f:
        f.write("#version: 0.2\n")
    with open(os.path.join(out_dir, "tokenizer_config.json"), "w") as f:
        json.dump({
            "model_max_length": 77,
            "bos_token": "<|startoftext|>",
            "eos_token": "<|endoftext|>",
            "unk_token": "<|endoftext|>",
            "pad_token": "<|endoftext|>",
            "tokenizer_class": "CLIPTokenizer",
        }, f)
    with open(os.path.join(out_dir, "special_tokens_map.json"), "w") as f:
        json.dump({
            "bos_token": "<|startoftext|>",
            "eos_token": "<|endoftext|>",
            "unk_token": "<|endoftext|>",
            "pad_token": "<|endoftext|>",
        }, f)
    return len(vocab)
