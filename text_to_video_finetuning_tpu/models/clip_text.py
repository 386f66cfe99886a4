"""CLIP text encoder, TPU-native flax implementation.

Behavioral spec: the transformers `CLIPTextModel` the reference loads
(reference train.py:121) and calls as `text_encoder(token_ids)[0]`
(reference train.py:790) to get the last hidden state. Causal-masked
transformer over 77 BPE tokens; ModelScope's text encoder is the
OpenCLIP-H-derived 1024-wide model (gelu activation).

The tokenizer itself is pure Python; we reuse `transformers.CLIPTokenizer`
at the data layer (reference utils/dataset.py get_prompt_ids semantics).
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn

from .lora_layers import LoraDense
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_hidden_layers: int = 23
    num_attention_heads: int = 16
    max_position_embeddings: int = 77
    hidden_act: str = "gelu"       # "gelu" (OpenCLIP) or "quick_gelu" (SD1.x)
    layer_norm_eps: float = 1e-5
    eos_token_id: int = 49407


CLIP_MS_TEXT_CONFIG = CLIPTextConfig()


def tiny_clip_config(**overrides) -> CLIPTextConfig:
    base = dict(vocab_size=1000, hidden_size=32, intermediate_size=64,
                num_hidden_layers=2, num_attention_heads=4,
                max_position_embeddings=77)
    base.update(overrides)
    return CLIPTextConfig(**base)


def _act(name: str):
    if name == "quick_gelu":
        return lambda x: x * nn.sigmoid(1.702 * x)
    if name == "gelu":
        return lambda x: nn.gelu(x, approximate=False)
    raise ValueError(f"unknown activation {name}")


class CLIPAttention(nn.Module):
    config: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_states, causal_mask):
        cfg = self.config
        heads = cfg.num_attention_heads
        head_dim = cfg.hidden_size // heads
        scale = head_dim ** -0.5
        b, s, _ = hidden_states.shape

        q = LoraDense(cfg.hidden_size, dtype=self.dtype,
                     name="q_proj")(hidden_states) * scale
        k = LoraDense(cfg.hidden_size, dtype=self.dtype,
                     name="k_proj")(hidden_states)
        v = LoraDense(cfg.hidden_size, dtype=self.dtype,
                     name="v_proj")(hidden_states)

        q = q.reshape(b, s, heads, head_dim)
        k = k.reshape(b, s, heads, head_dim)
        v = v.reshape(b, s, heads, head_dim)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        logits = logits + causal_mask
        weights = nn.softmax(logits.astype(jnp.float32), axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", weights.astype(v.dtype), v,
                         preferred_element_type=jnp.float32)
        out = out.astype(hidden_states.dtype).reshape(b, s, cfg.hidden_size)
        return LoraDense(cfg.hidden_size, dtype=self.dtype,
                        name="out_proj")(out)


class CLIPEncoderLayer(nn.Module):
    config: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, hidden_states, causal_mask):
        cfg = self.config
        residual = hidden_states
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="layer_norm1")(hidden_states)
        h = CLIPAttention(cfg, dtype=self.dtype, name="self_attn")(
            h, causal_mask)
        hidden_states = residual + h

        residual = hidden_states
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                         name="layer_norm2")(hidden_states)
        h = LoraDense(cfg.intermediate_size, dtype=self.dtype, name="fc1")(h)
        h = _act(cfg.hidden_act)(h)
        h = LoraDense(cfg.hidden_size, dtype=self.dtype, name="fc2")(h)
        return residual + h


class CLIPTextModel(nn.Module):
    config: CLIPTextConfig = CLIP_MS_TEXT_CONFIG
    dtype: jnp.dtype = jnp.float32
    # per-layer remat, the analog of the reference's
    # text_encoder.gradient_checkpointing_enable()
    # (text_encoder_gradient_checkpointing, configs/v2/train_config.yaml:55)
    gradient_checkpointing: bool = False

    @nn.compact
    def __call__(self, input_ids, output_hidden_states: bool = False):
        """input_ids (B, S) -> last_hidden_state (B, S, hidden); optionally
        also the tuple of all hidden states (for clip-skip/penultimate use)."""
        cfg = self.config
        b, s = input_ids.shape

        token_emb = nn.Embed(cfg.vocab_size, cfg.hidden_size,
                             dtype=self.dtype,
                             name="token_embedding")(input_ids)
        positions = jnp.arange(s)[None, :]
        pos_emb = nn.Embed(cfg.max_position_embeddings, cfg.hidden_size,
                           dtype=self.dtype,
                           name="position_embedding")(positions)
        hidden_states = token_emb + pos_emb

        causal_mask = jnp.triu(
            jnp.full((s, s), -1e9, dtype=jnp.float32), k=1)[None, None]

        layer_cls = CLIPEncoderLayer
        if self.gradient_checkpointing:
            layer_cls = nn.remat(CLIPEncoderLayer)
        all_hidden = [hidden_states]
        for i in range(cfg.num_hidden_layers):
            hidden_states = layer_cls(
                cfg, dtype=self.dtype, name=f"layers_{i}")(
                    hidden_states, causal_mask)
            all_hidden.append(hidden_states)

        last = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                            name="final_layer_norm")(hidden_states)
        if output_hidden_states:
            return last, tuple(all_hidden)
        return last
