"""LoRA checkpoint serialization: byte-compatible with the reference.

* cloneofsimo `.pt`: flat list [up0, down0, up1, down1, ...] of fp32 torch
  tensors in modules() site order (reference utils/lora.py:570-582).
* cloneofsimo `.safetensors`: keys `{model}:{i}:up/down` + metadata with
  target sets and ranks (reference utils/lora.py:597-629).
* stable_lora full weights: safetensors state dict of
  `<module>.lora_A`/`.lora_B` fp32 (reference stable_lora/lora.py:330-340);
  webui export re-keys through the CompVis converter at fp16
  (reference stable_lora/lora.py:342-361).

Tensors are stored in torch layout (see overlay.py docstring), so interop
with reference-produced files needs no transposition.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence

import numpy as np

from flax.traverse_util import flatten_dict, unflatten_dict

from .sites import LoraSite

EMBED_FLAG = "<embed>"


def _to_numpy(x) -> np.ndarray:
    # copy: jax arrays view read-only buffers, which torch.from_numpy rejects
    return np.array(x, dtype=np.float32)


# -- cloneofsimo .pt -------------------------------------------------------

def save_lora_pt(lora_params: Dict, sites: Sequence[LoraSite], path: str):
    """Flat [up, down, ...] fp32 list, torch.save format."""
    import torch
    flat = flatten_dict(lora_params)
    weights = []
    for site in sites:
        up = flat.get(site.flax_path + ("up",))
        down = flat.get(site.flax_path + ("down",))
        if up is None:
            continue
        weights.append(torch.from_numpy(_to_numpy(up)))
        weights.append(torch.from_numpy(_to_numpy(down)))
    torch.save(weights, path)


def load_lora_pt(path: str, sites: Sequence[LoraSite]) -> Dict:
    """Load a reference-format .pt list back into the lora pytree.
    The list order must correspond to `sites` (same target set and rank)."""
    import torch
    weights = torch.load(path, map_location="cpu", weights_only=True)
    flat = {}
    idx = 0
    for site in sites:
        if idx + 2 > len(weights):
            break
        up = np.asarray(weights[idx].float().numpy())
        down = np.asarray(weights[idx + 1].float().numpy())
        idx += 2
        flat[site.flax_path + ("up",)] = up
        flat[site.flax_path + ("down",)] = down
    if idx != len(weights):
        raise ValueError(
            f"LoRA file has {len(weights)} tensors but sites consume {idx}; "
            "target_replace_module/rank mismatch?")
    return unflatten_dict(flat)


# -- cloneofsimo .safetensors ---------------------------------------------

def save_safeloras(modelmap: Dict[str, tuple], outpath: str,
                   embeds: Optional[Dict[str, np.ndarray]] = None):
    """modelmap: {model_name: (lora_params, sites, target_replace_set)}.
    Layout per reference utils/lora.py:597-629 (`{name}:{i}:up/down`)."""
    from safetensors.numpy import save_file
    weights, metadata = {}, {}
    for name, (lora_params, sites, target_set) in modelmap.items():
        metadata[name] = json.dumps(sorted(target_set))
        flat = flatten_dict(lora_params)
        i = 0
        for site in sites:
            up = flat.get(site.flax_path + ("up",))
            down = flat.get(site.flax_path + ("down",))
            if up is None:
                continue
            rank = down.shape[0]
            metadata[f"{name}:{i}:rank"] = str(rank)
            weights[f"{name}:{i}:up"] = _to_numpy(up).astype(np.float16)
            weights[f"{name}:{i}:down"] = _to_numpy(down).astype(np.float16)
            i += 1
    for token, tensor in (embeds or {}).items():
        metadata[token] = EMBED_FLAG
        weights[token] = np.asarray(tensor)
    save_file(weights, outpath, metadata=metadata)


def parse_safeloras(path: str):
    """-> {model_name: (weights list [up,down,...], ranks, target_set)} and
    {token: embed tensor}."""
    from safetensors import safe_open
    loras, embeds = {}, {}
    with safe_open(path, framework="numpy") as f:
        metadata = f.metadata() or {}
        keys = list(f.keys())
        for name, meta in metadata.items():
            if ":" in name:
                continue
            if meta == EMBED_FLAG:
                embeds[name] = f.get_tensor(name)
                continue
            target_set = set(json.loads(meta))
            idx = 0
            weights, ranks = [], []
            while f"{name}:{idx}:up" in keys:
                weights.append(f.get_tensor(f"{name}:{idx}:up"))
                weights.append(f.get_tensor(f"{name}:{idx}:down"))
                ranks.append(int(metadata.get(f"{name}:{idx}:rank", 4)))
                idx += 1
            loras[name] = (weights, ranks, target_set)
    return loras, embeds


def load_safeloras_into(path: str, sites_by_model: Dict[str, Sequence[LoraSite]]):
    """-> {model_name: lora pytree} matching each model's site order."""
    loras, _ = parse_safeloras(path)
    out = {}
    for name, (weights, _ranks, _targets) in loras.items():
        if name not in sites_by_model:
            continue
        flat = {}
        idx = 0
        for site in sites_by_model[name]:
            if idx + 2 > len(weights):
                break
            flat[site.flax_path + ("up",)] = weights[idx].astype(np.float32)
            flat[site.flax_path + ("down",)] = weights[idx + 1].astype(
                np.float32)
            idx += 2
        out[name] = unflatten_dict(flat)
    return out


# -- stable_lora (loralib state dict) --------------------------------------

def stable_lora_state_dict(lora_params: Dict, sites: Sequence[LoraSite],
                           bias: str = "none") -> Dict[str, np.ndarray]:
    """torch-style state dict {module.lora_A/B: tensor} in fp32
    (loralib.lora_state_dict semantics, bias='none')."""
    flat = flatten_dict(lora_params)
    sd = {}
    for site in sites:
        down = flat.get(site.flax_path + ("down",))
        if down is None:
            continue
        up = flat[site.flax_path + ("up",)]
        sd[f"{site.torch_name}.lora_A"] = _to_numpy(down)
        sd[f"{site.torch_name}.lora_B"] = _to_numpy(up)
    return sd


def save_stable_lora(unet_lora: Optional[Dict], unet_sites,
                     text_lora: Optional[Dict], text_sites,
                     output_dir: str, lora_filename: str,
                     save_text_weights: bool, save_for_webui: bool,
                     only_webui: bool, metadata: Optional[Dict[str, str]],
                     unet_dict_converter, text_dict_converter):
    """Reference save layout (reference stable_lora/lora.py:304-367):
    full_weights/{name}_unet.safetensors (+_text_encoder) fp32 and
    webui_{name}.safetensors fp16 with CompVis keys."""
    from safetensors.numpy import save_file
    ext = ".safetensors"
    if not only_webui:
        full_dir = os.path.join(output_dir, "full_weights")
        os.makedirs(full_dir, exist_ok=True)
        for suffix, lora, sites in (
                ("_unet", unet_lora, unet_sites),
                ("_text_encoder",
                 text_lora if save_text_weights else None, text_sites)):
            if lora is None:
                continue
            sd = stable_lora_state_dict(lora, sites)
            save_file(sd, os.path.join(
                full_dir, f"{lora_filename}{suffix}{ext}"))

    if save_for_webui and unet_lora is not None:
        sd = stable_lora_state_dict(unet_lora, unet_sites)
        webui_dict = unet_dict_converter(sd, strict_mapping=True)
        if save_text_weights and text_lora is not None:
            text_sd = stable_lora_state_dict(text_lora, text_sites)
            webui_dict.update(text_dict_converter(text_sd))
        webui_dict = {k: np.asarray(v, dtype=np.float16)
                      for k, v in webui_dict.items()}
        save_file(webui_dict,
                  os.path.join(output_dir, f"webui_{lora_filename}{ext}"),
                  metadata=metadata)


def load_stable_lora(path: str, sites: Sequence[LoraSite]) -> Dict:
    """Load full_weights safetensors back into a lora pytree."""
    from safetensors import safe_open
    flat = {}
    with safe_open(path, framework="numpy") as f:
        keys = set(f.keys())
        for site in sites:
            ka, kb = f"{site.torch_name}.lora_A", f"{site.torch_name}.lora_B"
            if ka in keys:
                flat[site.flax_path + ("down",)] = f.get_tensor(ka).astype(
                    np.float32)
                flat[site.flax_path + ("up",)] = f.get_tensor(kb).astype(
                    np.float32)
    return unflatten_dict(flat)
