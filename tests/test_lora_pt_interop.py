"""Order-sensitive cloneofsimo `.pt` interop proof.

The reference serializes LoRA weights as a flat [up, down, ...] list in
torch modules() iteration order (`save_lora_weight` via
`extract_lora_ups_down` via `_find_modules_v2`,
reference utils/lora.py:269-313,529-582).  These tests replicate that
exact mechanism over live torch modules -- the vendored torch UNet
(tests/torch_ref/unet3d.py, registration-order-faithful) and the REAL
transformers CLIPTextModel -- generate a `.pt` the way the reference
does, and load it through `enumerate_*_sites` + `load_lora_pt`,
asserting the site sequence matches name-for-name.  If site enumeration
ever drifts from torch registration order, these fail."""

import numpy as np
import torch
import torch.nn as nn

from text_to_video_finetuning_tpu.lora.formats import load_lora_pt
from text_to_video_finetuning_tpu.lora.sites import (
    enumerate_text_encoder_sites, enumerate_unet_sites, select_sites)

from torch_ref import unet3d as tref
import pytest


# torch-golden / e2e-compile heavy: excluded by the fast
# profile `pytest -m "not slow"` (see pytest.ini)
pytestmark = pytest.mark.slow

def find_modules(model, ancestor_classes, search_classes):
    """The reference's _find_modules_v2 mechanics
    (reference utils/lora.py:269-313): iterate ancestors in modules()
    order, then each ancestor's matching children in named_modules()
    order."""
    qualified = {id(m): n for n, m in model.named_modules()}
    ancestors = [m for m in model.modules()
                 if m.__class__.__name__ in ancestor_classes]
    found, seen = [], set()
    for anc in ancestors:
        for _name, module in anc.named_modules():
            if isinstance(module, search_classes) and id(module) not in seen:
                seen.add(id(module))
                found.append((qualified[id(module)], module))
    return found


def fake_lora_pt(found, r, path):
    """Build the flat [up, down, ...] list exactly as save_lora_weight
    would for LoraInjected wrappers (reference utils/lora.py:57-210:
    linear up (out,r)/down (r,in); conv2d down keeps the conv's kernel,
    up is 1x1; conv3d down keeps (kt,kh,kw), up is 1x1x1)."""
    weights = []
    for i, (_name, m) in enumerate(found):
        if isinstance(m, nn.Linear):
            up = torch.full((m.out_features, r), float(2 * i))
            down = torch.full((r, m.in_features), float(2 * i + 1))
        elif isinstance(m, nn.Conv3d):
            up = torch.full((m.out_channels, r, 1, 1, 1), float(2 * i))
            down = torch.full((r, m.in_channels) + m.kernel_size,
                              float(2 * i + 1))
        else:  # Conv2d
            up = torch.full((m.out_channels, r, 1, 1), float(2 * i))
            down = torch.full((r, m.in_channels) + m.kernel_size,
                              float(2 * i + 1))
        weights += [up, down]
    torch.save(weights, path)
    return weights


def _check_roundtrip(found, sites, r, tmp_path, name):
    # 1. the site sequence must match torch iteration name-for-name
    torch_names = [n for n, _ in found]
    site_names = [s.torch_name for s in sites]
    assert site_names == torch_names

    # 2. a reference-format .pt loads positionally into the right slots
    pt = str(tmp_path / f"{name}.pt")
    fake_lora_pt(found, r, pt)
    lora = load_lora_pt(pt, sites)
    from flax.traverse_util import flatten_dict
    flat = flatten_dict(lora)
    for i, site in enumerate(sites):
        up = np.asarray(flat[site.flax_path + ("up",)])
        down = np.asarray(flat[site.flax_path + ("down",)])
        assert float(up.flat[0]) == 2 * i and float(down.flat[0]) == 2 * i + 1
        assert up.shape[0] == site.out_features
        assert down.shape[1] == site.in_features


def test_unet_pt_interop_all_modules(tmp_path):
    """Ancestor {UNet3DConditionModel} = full-tree order: the strongest
    check (inter-block and intra-block ordering, incl. up-before-mid)."""
    from text_to_video_finetuning_tpu.models.unet3d import micro_unet_config
    cfg = micro_unet_config()
    model = tref.UNet3DConditionModel(cfg)
    found = find_modules(model, {"UNet3DConditionModel"},
                         (nn.Linear, nn.Conv2d, nn.Conv3d))
    sites = select_sites(enumerate_unet_sites(cfg),
                         {"UNet3DConditionModel"})
    _check_roundtrip(found, sites, 4, tmp_path, "unet_all")


def test_unet_pt_interop_tiny_full_topology(tmp_path):
    from text_to_video_finetuning_tpu.models.unet3d import tiny_unet_config
    cfg = tiny_unet_config()
    model = tref.UNet3DConditionModel(cfg)
    found = find_modules(model, {"UNet3DConditionModel"},
                         (nn.Linear, nn.Conv2d, nn.Conv3d))
    sites = select_sites(enumerate_unet_sites(cfg),
                         {"UNet3DConditionModel"})
    _check_roundtrip(found, sites, 4, tmp_path, "unet_tiny")


def test_unet_pt_interop_extended_targets(tmp_path):
    """UNET_EXTENDED_TARGET_REPLACE = {ResnetBlock2D, CrossAttention,
    Attention, GEGLU} (reference utils/lora.py:241), ancestor-grouped
    iteration."""
    from text_to_video_finetuning_tpu.models.unet3d import tiny_unet_config
    cfg = tiny_unet_config()
    model = tref.UNet3DConditionModel(cfg)
    targets = {"ResnetBlock2D", "CrossAttention", "Attention", "GEGLU"}
    found = find_modules(model, targets,
                         (nn.Linear, nn.Conv2d, nn.Conv3d))
    sites = select_sites(enumerate_unet_sites(cfg), targets)
    _check_roundtrip(found, sites, 4, tmp_path, "unet_ext")


def test_text_encoder_pt_interop_real_transformers(tmp_path):
    """Against the REAL transformers CLIPTextModel (what the reference
    injects into, reference train.py:571 + utils/lora.py:243)."""
    from transformers import CLIPTextConfig as HFConfig
    from transformers import CLIPTextModel as HFModel
    from text_to_video_finetuning_tpu.models.clip_text import CLIPTextConfig
    hf_cfg = HFConfig(vocab_size=128, hidden_size=32, intermediate_size=64,
                      num_hidden_layers=2, num_attention_heads=4,
                      max_position_embeddings=77)
    model = HFModel(hf_cfg)
    found = find_modules(model, {"CLIPAttention"}, (nn.Linear,))

    cfg = CLIPTextConfig(vocab_size=128, hidden_size=32,
                         intermediate_size=64, num_hidden_layers=2,
                         num_attention_heads=4)
    sites = select_sites(enumerate_text_encoder_sites(cfg),
                         {"CLIPAttention"})
    _check_roundtrip(found, sites, 4, tmp_path, "text")
