"""Checkpoint interop: flax<->torch state-dict round trips and pipeline
directory save/load identity for all three models."""

import numpy as np
import pytest

import jax


@pytest.mark.parametrize("kind", ["unet", "vae", "text_encoder"])
def test_state_dict_roundtrip_identity(tiny_pipeline_dir, kind):
    """flax -> torch layout -> flax must be the identity (validates
    torch_names forward+inverse key mapping and tensor transposes)."""
    from text_to_video_finetuning_tpu.utils.checkpoint import (
        flax_to_state_dict, state_dict_to_flax)
    from text_to_video_finetuning_tpu.utils import checkpoint as ckpt
    import os
    loader = {"unet": ckpt.load_unet, "vae": ckpt.load_vae,
              "text_encoder": ckpt.load_text_encoder}[kind]
    subdir = {"unet": "unet", "vae": "vae",
              "text_encoder": "text_encoder"}[kind]
    _cfg, params = loader(os.path.join(tiny_pipeline_dir, subdir))

    sd = flax_to_state_dict(params, kind)
    back = state_dict_to_flax(sd, kind)

    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = dict(jax.tree_util.tree_leaves_with_path(back))
    assert len(flat_a) == len(flat_b)
    for path, leaf in flat_a:
        np.testing.assert_allclose(np.asarray(leaf),
                                   np.asarray(flat_b[path]), atol=0,
                                   err_msg=str(path))


def test_saved_unet_loads_in_torch(tiny_pipeline_dir):
    """The saved diffusers-layout safetensors must be loadable by torch
    with diffusers-convention keys/shapes (weight interop both ways)."""
    import os
    from safetensors import safe_open
    p = os.path.join(tiny_pipeline_dir, "unet",
                     "diffusion_pytorch_model.safetensors")
    with safe_open(p, framework="pt") as f:
        keys = list(f.keys())
        conv_in = f.get_tensor("conv_in.weight")
    assert "conv_in.weight" in keys
    assert "time_embedding.linear_1.weight" in keys
    assert any(k.startswith("down_blocks.0.attentions.0.") for k in keys)
    # torch conv layout (out, in, kh, kw)
    assert conv_in.shape[1] == 4 and conv_in.shape[2] == 3
