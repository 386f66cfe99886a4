"""LoRA target-site enumeration in torch-registration order.

The reference finds LoRA targets by ancestor-class search over live torch
modules (`_find_modules_v2`, reference utils/lora.py:269-313) and serializes
cloneofsimo checkpoints as a flat [up, down, up, down, ...] list in
`model.modules()` iteration order (reference utils/lora.py:570-582).  The
TPU-native equivalent is a static walk over the model CONFIG that yields the
same sites in the same order, so `.pt` checkpoints interoperate byte-for-byte.

Key ordering fact reproduced here: the reference UNet registers `up_blocks`
(the empty ModuleList) BEFORE `mid_block`
(reference models/unet_3d_condition.py:155-156,186), so torch `modules()`
yields up-block sites before mid-block sites.
"""

from __future__ import annotations

import dataclasses
from typing import List, Sequence, Tuple

from ..models.clip_text import CLIPTextConfig
from ..models.unet3d import UNet3DConfig

Path = Tuple[str, ...]

# torch class-name aliases: newer diffusers renamed CrossAttention->Attention
_CLASS_ALIASES = {"Attention": "CrossAttention"}


@dataclasses.dataclass(frozen=True)
class LoraSite:
    torch_name: str          # torch dotted module name, e.g. ...attn1.to_q
    flax_path: Path          # path in the flax params tree (module, no leaf)
    kind: str                # linear | conv2d | conv3d | embedding
    classes: Tuple[str, ...]  # ancestor class names root->leaf
    in_features: int
    out_features: int
    kernel_size: int = 1     # spatial k for convs (temporal k for conv3d)


def _resnet_sites(prefix: str, fpath: Path, classes, in_ch, out_ch,
                  temb_dim):
    c = classes + ("ResnetBlock2D",)
    sites = [
        LoraSite(f"{prefix}.conv1", fpath + ("conv1",), "conv2d", c,
                 in_ch, out_ch, 3),
        LoraSite(f"{prefix}.time_emb_proj", fpath + ("time_emb_proj",),
                 "linear", c, temb_dim, out_ch),
        LoraSite(f"{prefix}.conv2", fpath + ("conv2",), "conv2d", c,
                 out_ch, out_ch, 3),
    ]
    if in_ch != out_ch:
        sites.append(LoraSite(f"{prefix}.conv_shortcut",
                              fpath + ("conv_shortcut",), "conv2d", c,
                              in_ch, out_ch, 1))
    return sites


def _temp_conv_sites(prefix: str, fpath: Path, classes, dim):
    c = classes + ("TemporalConvLayer",)
    # torch names follow the nn.Sequential layout (convN.2 / convN.3)
    return [
        LoraSite(f"{prefix}.conv1.2", fpath + ("conv1",), "conv3d", c,
                 dim, dim, 3),
        LoraSite(f"{prefix}.conv2.3", fpath + ("conv2",), "conv3d", c,
                 dim, dim, 3),
        LoraSite(f"{prefix}.conv3.3", fpath + ("conv3",), "conv3d", c,
                 dim, dim, 3),
        LoraSite(f"{prefix}.conv4.3", fpath + ("conv4",), "conv3d", c,
                 dim, dim, 3),
    ]


def _attention_sites(prefix: str, fpath: Path, classes, query_dim, inner_dim,
                     kv_dim):
    c = classes + ("CrossAttention",)
    return [
        LoraSite(f"{prefix}.to_q", fpath + ("to_q",), "linear", c,
                 query_dim, inner_dim),
        LoraSite(f"{prefix}.to_k", fpath + ("to_k",), "linear", c,
                 kv_dim, inner_dim),
        LoraSite(f"{prefix}.to_v", fpath + ("to_v",), "linear", c,
                 kv_dim, inner_dim),
        LoraSite(f"{prefix}.to_out.0", fpath + ("to_out_0",), "linear", c,
                 inner_dim, query_dim),
    ]


def _transformer_block_sites(prefix: str, fpath: Path, classes, dim,
                             cross_dim, double_self: bool):
    """BasicTransformerBlock registration order: attn1, ff, attn2
    (diffusers attention.py of the 0.15 era)."""
    c = classes + ("BasicTransformerBlock",)
    sites = []
    sites += _attention_sites(f"{prefix}.attn1", fpath + ("attn1",), c,
                              dim, dim, dim)
    cff = c + ("FeedForward",)
    sites.append(LoraSite(f"{prefix}.ff.net.0.proj",
                          fpath + ("ff", "net_0", "proj"), "linear",
                          cff + ("GEGLU",), dim, dim * 8))
    sites.append(LoraSite(f"{prefix}.ff.net.2", fpath + ("ff", "net_2"),
                          "linear", cff, dim * 4, dim))
    kv = dim if double_self else cross_dim
    sites += _attention_sites(f"{prefix}.attn2", fpath + ("attn2",), c,
                              dim, dim, kv)
    return sites


def _transformer2d_sites(prefix: str, fpath: Path, classes, channels,
                         cross_dim):
    c = classes + ("Transformer2DModel",)
    sites = [LoraSite(f"{prefix}.proj_in", fpath + ("proj_in",), "linear", c,
                      channels, channels)]
    sites += _transformer_block_sites(
        f"{prefix}.transformer_blocks.0", fpath + ("transformer_blocks_0",),
        c, channels, cross_dim, double_self=False)
    sites.append(LoraSite(f"{prefix}.proj_out", fpath + ("proj_out",),
                          "linear", c, channels, channels))
    return sites


def _temporal_transformer_sites(prefix: str, fpath: Path, classes, channels,
                                inner_dim):
    c = classes + ("TransformerTemporalModel",)
    sites = [LoraSite(f"{prefix}.proj_in", fpath + ("proj_in",), "linear", c,
                      channels, inner_dim)]
    sites += _transformer_block_sites(
        f"{prefix}.transformer_blocks.0", fpath + ("transformer_blocks_0",),
        c, inner_dim, inner_dim, double_self=True)
    sites.append(LoraSite(f"{prefix}.proj_out", fpath + ("proj_out",),
                          "linear", c, inner_dim, channels))
    return sites


def enumerate_unet_sites(cfg: UNet3DConfig) -> List[LoraSite]:
    """All Linear/Conv sites of the UNet in torch modules() order."""
    root = ("UNet3DConditionModel",)
    temb_dim = cfg.block_out_channels[0] * 4
    sites: List[LoraSite] = []

    sites.append(LoraSite("conv_in", ("conv_in",), "conv2d", root,
                          cfg.in_channels, cfg.block_out_channels[0], 3))
    # time_embedding (TimestepEmbedding): linear_1, linear_2
    c = root + ("TimestepEmbedding",)
    sites.append(LoraSite("time_embedding.linear_1",
                          ("time_embedding", "linear_1"), "linear", c,
                          cfg.block_out_channels[0], temb_dim))
    sites.append(LoraSite("time_embedding.linear_2",
                          ("time_embedding", "linear_2"), "linear", c,
                          temb_dim, temb_dim))
    # transformer_in: inner dim 8 heads * attention_head_dim
    sites += _temporal_transformer_sites(
        "transformer_in", ("transformer_in",), root,
        cfg.block_out_channels[0], 8 * cfg.attention_head_dim)

    # down blocks
    output_channel = cfg.block_out_channels[0]
    for i, block_type in enumerate(cfg.down_block_types):
        input_channel = output_channel
        output_channel = cfg.block_out_channels[i]
        is_final = i == len(cfg.block_out_channels) - 1
        bname, bpath = f"down_blocks.{i}", (f"down_blocks_{i}",)
        bc = root + (block_type,)
        rs, tc, at, ta = [], [], [], []
        for j in range(cfg.layers_per_block):
            in_ch = input_channel if j == 0 else output_channel
            rs += _resnet_sites(f"{bname}.resnets.{j}",
                                bpath + (f"resnets_{j}",), bc, in_ch,
                                output_channel, temb_dim)
            tc += _temp_conv_sites(f"{bname}.temp_convs.{j}",
                                   bpath + (f"temp_convs_{j}",), bc,
                                   output_channel)
            if block_type == "CrossAttnDownBlock3D":
                at += _transformer2d_sites(
                    f"{bname}.attentions.{j}", bpath + (f"attentions_{j}",),
                    bc, output_channel, cfg.cross_attention_dim)
                ta += _temporal_transformer_sites(
                    f"{bname}.temp_attentions.{j}",
                    bpath + (f"temp_attentions_{j}",), bc, output_channel,
                    output_channel)
        sites += rs + tc + at + ta
        if not is_final:
            sites.append(LoraSite(
                f"{bname}.downsamplers.0.conv",
                bpath + ("downsamplers_0", "conv"), "conv2d",
                bc + ("Downsample2D",), output_channel, output_channel, 3))

    # up blocks come BEFORE mid block in torch modules() order
    up_sites: List[LoraSite] = []
    reversed_channels = list(reversed(cfg.block_out_channels))
    output_channel = reversed_channels[0]
    for i, block_type in enumerate(cfg.up_block_types):
        is_final = i == len(cfg.block_out_channels) - 1
        prev_output_channel = output_channel
        output_channel = reversed_channels[i]
        input_channel = reversed_channels[
            min(i + 1, len(cfg.block_out_channels) - 1)]
        bname, bpath = f"up_blocks.{i}", (f"up_blocks_{i}",)
        bc = root + (block_type,)
        rs, tc, at, ta = [], [], [], []
        n_layers = cfg.layers_per_block + 1
        for j in range(n_layers):
            res_skip = input_channel if j == n_layers - 1 else output_channel
            res_in = prev_output_channel if j == 0 else output_channel
            rs += _resnet_sites(f"{bname}.resnets.{j}",
                                bpath + (f"resnets_{j}",), bc,
                                res_in + res_skip, output_channel, temb_dim)
            tc += _temp_conv_sites(f"{bname}.temp_convs.{j}",
                                   bpath + (f"temp_convs_{j}",), bc,
                                   output_channel)
            if block_type == "CrossAttnUpBlock3D":
                at += _transformer2d_sites(
                    f"{bname}.attentions.{j}", bpath + (f"attentions_{j}",),
                    bc, output_channel, cfg.cross_attention_dim)
                ta += _temporal_transformer_sites(
                    f"{bname}.temp_attentions.{j}",
                    bpath + (f"temp_attentions_{j}",), bc, output_channel,
                    output_channel)
        up_sites += rs + tc + at + ta
        if not is_final:
            up_sites.append(LoraSite(
                f"{bname}.upsamplers.0.conv",
                bpath + ("upsamplers_0", "conv"), "conv2d",
                bc + ("Upsample2D",), output_channel, output_channel, 3))
    sites += up_sites

    # mid block
    mid_ch = cfg.block_out_channels[-1]
    bc = root + ("UNetMidBlock3DCrossAttn",)
    rs = _resnet_sites("mid_block.resnets.0", ("mid_block", "resnets_0"), bc,
                       mid_ch, mid_ch, temb_dim)
    rs += _resnet_sites("mid_block.resnets.1", ("mid_block", "resnets_1"),
                        bc, mid_ch, mid_ch, temb_dim)
    tc = _temp_conv_sites("mid_block.temp_convs.0",
                          ("mid_block", "temp_convs_0"), bc, mid_ch)
    tc += _temp_conv_sites("mid_block.temp_convs.1",
                           ("mid_block", "temp_convs_1"), bc, mid_ch)
    at = _transformer2d_sites("mid_block.attentions.0",
                              ("mid_block", "attentions_0"), bc, mid_ch,
                              cfg.cross_attention_dim)
    ta = _temporal_transformer_sites("mid_block.temp_attentions.0",
                                     ("mid_block", "temp_attentions_0"), bc,
                                     mid_ch, mid_ch)
    sites += rs + tc + at + ta

    sites.append(LoraSite("conv_out", ("conv_out",), "conv2d", root,
                          cfg.block_out_channels[0], cfg.out_channels, 3))
    return sites


def enumerate_text_encoder_sites(cfg: CLIPTextConfig) -> List[LoraSite]:
    """All Linear/Embedding sites of the CLIP text model in torch
    modules() order (transformers CLIPAttention registers k,v,q,out)."""
    root = ("CLIPTextModel", "CLIPTextTransformer")
    sites: List[LoraSite] = []
    ec = root + ("CLIPTextEmbeddings",)
    sites.append(LoraSite("text_model.embeddings.token_embedding",
                          ("token_embedding",), "embedding", ec,
                          cfg.vocab_size, cfg.hidden_size))
    sites.append(LoraSite("text_model.embeddings.position_embedding",
                          ("position_embedding",), "embedding", ec,
                          cfg.max_position_embeddings, cfg.hidden_size))
    for i in range(cfg.num_hidden_layers):
        lc = root + ("CLIPEncoder", "CLIPEncoderLayer")
        base = f"text_model.encoder.layers.{i}"
        fpath = (f"layers_{i}",)
        ac = lc + ("CLIPAttention",)
        for proj in ("k_proj", "v_proj", "q_proj", "out_proj"):
            sites.append(LoraSite(f"{base}.self_attn.{proj}",
                                  fpath + ("self_attn", proj), "linear", ac,
                                  cfg.hidden_size, cfg.hidden_size))
        mc = lc + ("CLIPMLP",)
        sites.append(LoraSite(f"{base}.mlp.fc1", fpath + ("fc1",), "linear",
                              mc, cfg.hidden_size, cfg.intermediate_size))
        sites.append(LoraSite(f"{base}.mlp.fc2", fpath + ("fc2",), "linear",
                              mc, cfg.intermediate_size, cfg.hidden_size))
    return sites


def select_sites(sites: Sequence[LoraSite], target_modules,
                 search_classes=("linear", "conv2d", "conv3d")):
    """Ancestor-class selection with first-visit dedupe, mirroring
    `_find_modules_v2` + injection semantics (reference utils/lora.py:269-313).

    `target_modules` entries may be torch class names (e.g. 'ResnetBlock2D')
    or dotted substrings (e.g. 'attn1.to_out') matched on the torch name.
    """
    targets = {_CLASS_ALIASES.get(t, t) for t in target_modules}
    selected, seen = [], set()
    for site in sites:
        if site.kind not in search_classes:
            continue
        classes = tuple(_CLASS_ALIASES.get(c, c) for c in site.classes)
        matched = any(c in targets for c in classes) or any(
            "." in t and t in site.torch_name for t in targets)
        if matched and site.torch_name not in seen:
            seen.add(site.torch_name)
            selected.append(site)
    return selected
