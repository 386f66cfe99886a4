"""CLIP vision tower + full dual-encoder CLIP model, TPU-native flax.

Behavioral spec: `transformers.CLIPModel` (ViT image encoder + text
encoder + linear projections + learned logit scale), the standard scorer
behind CLIP-score generation-quality metrics.  The reference has NO
quality metric at all -- its only quality loop is eyeballing validation
mp4s written during training (reference train.py:908-958); this module is
the measurement backbone that closes that gap (BASELINE north star:
"CLIP-score parity on generated clips").

Loads openai/clip-* checkpoints (e.g. clip-vit-base-patch32,
clip-vit-large-patch14) from a LOCAL transformers model directory,
mirroring the loader pattern of models/clip_text.py + utils/checkpoint.py.

TPU notes: the ViT is one big batched matmul stack (patchify conv is a
single stride=patch conv that XLA lowers onto the MXU); scoring runs all
frames of a clip as one batch; everything is jit-compatible with static
shapes.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..models.clip_text import (CLIPEncoderLayer, CLIPTextConfig,
                                CLIPTextModel)


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    image_size: int = 224
    patch_size: int = 32
    num_channels: int = 3
    hidden_act: str = "quick_gelu"
    layer_norm_eps: float = 1e-5
    projection_dim: int = 512


def tiny_clip_vision_config(**overrides) -> CLIPVisionConfig:
    base = dict(hidden_size=32, intermediate_size=64, num_hidden_layers=2,
                num_attention_heads=4, image_size=32, patch_size=8,
                projection_dim=16)
    base.update(overrides)
    return CLIPVisionConfig(**base)


class CLIPVisionModel(nn.Module):
    """ViT image encoder: patchify conv -> [CLS] + patches + learned
    positions -> pre-LN -> non-causal transformer -> post-LN pooled CLS.

    Input images are NHWC float32, already CLIP-preprocessed (resized /
    cropped to `image_size`, normalized with the CLIP mean/std)."""
    config: CLIPVisionConfig
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixel_values):
        cfg = self.config
        b = pixel_values.shape[0]
        # patchify: a single strided conv, one MXU matmul per image
        patches = nn.Conv(
            cfg.hidden_size,
            kernel_size=(cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size),
            padding="VALID", use_bias=False, dtype=self.dtype,
            name="patch_embedding")(pixel_values.astype(self.dtype))
        patches = patches.reshape(b, -1, cfg.hidden_size)  # (B, P, H)
        n_patches = patches.shape[1]

        class_embedding = self.param(
            "class_embedding", nn.initializers.normal(0.02),
            (cfg.hidden_size,))
        cls = jnp.broadcast_to(class_embedding.astype(self.dtype),
                               (b, 1, cfg.hidden_size))
        hidden_states = jnp.concatenate([cls, patches], axis=1)

        positions = jnp.arange(n_patches + 1)[None, :]
        pos_emb = nn.Embed(n_patches + 1, cfg.hidden_size, dtype=self.dtype,
                           name="position_embedding")(positions)
        hidden_states = hidden_states + pos_emb

        # transformers names this "pre_layrnorm" (upstream typo preserved
        # in every shipped checkpoint's state dict)
        hidden_states = nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                                     dtype=self.dtype,
                                     name="pre_layrnorm")(hidden_states)

        # reuse the text encoder's layer (identical block); vision
        # attention is bidirectional -- zero additive mask
        no_mask = jnp.zeros((1, 1, 1, 1), jnp.float32)
        text_like_cfg = CLIPTextConfig(
            vocab_size=1, hidden_size=cfg.hidden_size,
            intermediate_size=cfg.intermediate_size,
            num_hidden_layers=cfg.num_hidden_layers,
            num_attention_heads=cfg.num_attention_heads,
            hidden_act=cfg.hidden_act, layer_norm_eps=cfg.layer_norm_eps)
        for i in range(cfg.num_hidden_layers):
            hidden_states = CLIPEncoderLayer(
                text_like_cfg, dtype=self.dtype, name=f"layers_{i}")(
                    hidden_states, no_mask)

        pooled = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=self.dtype,
                              name="post_layernorm")(hidden_states[:, 0])
        return pooled


class CLIPDualEncoder(nn.Module):
    """transformers.CLIPModel equivalent: projected, L2-normalized image
    and text embeddings on a shared space (the CLIP-score geometry)."""
    vision_config: CLIPVisionConfig
    text_config: CLIPTextConfig
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.vision_model = CLIPVisionModel(self.vision_config,
                                            dtype=self.dtype)
        self.text_model = CLIPTextModel(self.text_config, dtype=self.dtype)
        self.visual_projection = nn.Dense(
            self.vision_config.projection_dim, use_bias=False,
            dtype=self.dtype)
        self.text_projection = nn.Dense(
            self.vision_config.projection_dim, use_bias=False,
            dtype=self.dtype)
        self.logit_scale = self.param("logit_scale",
                                      nn.initializers.constant(2.6592), ())

    def encode_image(self, pixel_values):
        """(B, H, W, C) preprocessed -> L2-normalized (B, proj_dim)."""
        pooled = self.vision_model(pixel_values)
        emb = self.visual_projection(pooled)
        return emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)

    def encode_text(self, input_ids):
        """(B, 77) token ids -> L2-normalized (B, proj_dim).

        Pooling matches transformers CLIPTextTransformer: checkpoints with
        the historical eos_token_id=2 config (every openai/clip-* release)
        pool at argmax(input_ids) -- EOT is the largest BPE id -- newer
        configs pool at the first true EOS position."""
        last = self.text_model(input_ids)
        if self.text_config.eos_token_id == 2:
            pos = jnp.argmax(input_ids, axis=-1)
        else:
            pos = jnp.argmax(
                (input_ids == self.text_config.eos_token_id).astype(
                    jnp.int32), axis=-1)
        pooled = jnp.take_along_axis(last, pos[:, None, None],
                                     axis=1)[:, 0]
        emb = self.text_projection(pooled)
        return emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)

    def __call__(self, pixel_values, input_ids):
        """Cosine similarity matrix (B_img, B_txt), scaled by 100 (the
        CLIP-score convention; the trained logit_scale is exposed in
        params for contrastive use but the metric uses the fixed 100)."""
        img = self.encode_image(pixel_values)
        txt = self.encode_text(input_ids)
        return 100.0 * img @ txt.T


# -- checkpoint import --------------------------------------------------------

# CLIP image preprocessing constants (openai/CLIP preprocess pipeline)
CLIP_IMAGE_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_IMAGE_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def load_clip_vision_config(cfg: Dict[str, Any]) -> CLIPVisionConfig:
    return CLIPVisionConfig(
        hidden_size=cfg.get("hidden_size", 768),
        intermediate_size=cfg.get("intermediate_size", 3072),
        num_hidden_layers=cfg.get("num_hidden_layers", 12),
        num_attention_heads=cfg.get("num_attention_heads", 12),
        image_size=cfg.get("image_size", 224),
        patch_size=cfg.get("patch_size", 32),
        num_channels=cfg.get("num_channels", 3),
        hidden_act=cfg.get("hidden_act", "quick_gelu"),
        layer_norm_eps=cfg.get("layer_norm_eps", 1e-5),
        projection_dim=cfg.get("projection_dim", 512),
    )


def _text_config_from_dict(cfg: Dict[str, Any]) -> CLIPTextConfig:
    return CLIPTextConfig(
        vocab_size=cfg.get("vocab_size", 49408),
        hidden_size=cfg.get("hidden_size", 512),
        intermediate_size=cfg.get("intermediate_size", 2048),
        num_hidden_layers=cfg.get("num_hidden_layers", 12),
        num_attention_heads=cfg.get("num_attention_heads", 8),
        max_position_embeddings=cfg.get("max_position_embeddings", 77),
        hidden_act=cfg.get("hidden_act", "quick_gelu"),
        layer_norm_eps=cfg.get("layer_norm_eps", 1e-5),
        # transformers' default; openai/clip-* checkpoints carry the
        # historical explicit 2, which selects argmax(ids) pooling
        eos_token_id=cfg.get("eos_token_id", 49407),
    )


def _convert_vision_tower(sd: Dict[str, np.ndarray], prefix: str) -> Dict:
    """Map the VISION tower's torch keys (vision_model.*) to a flax params
    subtree.  The text tower delegates to utils/checkpoint.state_dict_to_flax
    (one converter to keep in sync); only the vision-specific bits live
    here: patchify conv to HWIO and the bare `class_embedding` Parameter.
    Layout rules otherwise match utils/torch_names.py (Linear weight
    transposed, norms weight->scale, Embed weight->embedding)."""
    from flax.traverse_util import unflatten_dict
    flat = {}
    for key, arr in sd.items():
        if not key.startswith(prefix):
            continue
        name = key[len(prefix):]
        if name.endswith("position_ids"):
            continue  # transformers buffer
        name = (name.replace("embeddings.", "").replace("encoder.", "")
                .replace(".mlp.fc", ".fc"))
        if name == "class_embedding":
            flat[("class_embedding",)] = arr
            continue
        module_name, leaf = name.rsplit(".", 1)
        parts = []
        toks = module_name.split(".")
        i = 0
        while i < len(toks):
            if (toks[i] == "layers" and i + 1 < len(toks)
                    and toks[i + 1].isdigit()):
                parts.append(f"layers_{toks[i + 1]}")
                i += 2
            else:
                parts.append(toks[i])
                i += 1
        fpath = tuple(parts)
        if leaf == "weight":
            if fpath[-1] in ("token_embedding", "position_embedding"):
                flat[fpath + ("embedding",)] = arr
            elif arr.ndim == 1:
                flat[fpath + ("scale",)] = arr
            elif arr.ndim == 2:
                flat[fpath + ("kernel",)] = arr.T
            elif arr.ndim == 4:
                flat[fpath + ("kernel",)] = arr.transpose(2, 3, 1, 0)
            else:
                raise ValueError(f"bad weight ndim for {key}: {arr.ndim}")
        elif leaf == "bias":
            flat[fpath + ("bias",)] = arr
        else:
            raise ValueError(f"unexpected leaf in {key}")
    return unflatten_dict(flat)


def load_clip_model(model_dir: str) -> Tuple[CLIPDualEncoder, Dict]:
    """Load a transformers CLIPModel directory (config.json with
    text_config/vision_config + model.safetensors|pytorch_model.bin) into
    (CLIPDualEncoder, params).  Tokenizer files in the same dir are read
    separately by the scorer."""
    with open(os.path.join(model_dir, "config.json")) as f:
        cfg = json.load(f)
    if "vision_config" not in cfg:
        raise ValueError(
            f"{model_dir}/config.json has no vision_config: t2v-eval needs "
            "a FULL CLIP model (e.g. openai/clip-vit-base-patch32), not a "
            "text-encoder-only directory")
    vision_cfg = load_clip_vision_config(cfg["vision_config"])
    text_cfg = _text_config_from_dict(cfg["text_config"])

    from ..utils.checkpoint import _read_state_dict, state_dict_to_flax
    sd = _read_state_dict(model_dir)

    params = {
        "vision_model": _convert_vision_tower(sd, "vision_model."),
        # the text tower is exactly models/clip_text.py's tree: reuse the
        # pipeline converter rather than a parallel key-mapping
        "text_model": state_dict_to_flax(
            {k: v for k, v in sd.items() if k.startswith("text_model.")},
            "text_encoder"),
        "visual_projection": {"kernel": sd["visual_projection.weight"].T},
        "text_projection": {"kernel": sd["text_projection.weight"].T},
        "logit_scale": sd["logit_scale"],
    }
    model = CLIPDualEncoder(vision_config=vision_cfg, text_config=text_cfg)
    return model, params
