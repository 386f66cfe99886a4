"""Golden parity: our flax CLIP text encoder vs the actual transformers
torch CLIPTextModel (the model the reference loads, reference train.py:121),
weight-converted through utils/checkpoint.state_dict_to_flax.

This is the strongest correctness check available in this environment
(diffusers is not installed, so the UNet/VAE have no torch goldens)."""

import numpy as np
import pytest


# torch-golden / e2e-compile heavy: excluded by the fast
# profile `pytest -m "not slow"` (see pytest.ini)
pytestmark = pytest.mark.slow

@pytest.fixture(scope="module")
def torch_clip():
    import torch
    from transformers import CLIPTextConfig as HFConfig
    from transformers import CLIPTextModel as HFModel
    torch.manual_seed(0)
    hf_cfg = HFConfig(
        vocab_size=512, hidden_size=64, intermediate_size=128,
        num_hidden_layers=3, num_attention_heads=4,
        max_position_embeddings=77, hidden_act="gelu")
    model = HFModel(hf_cfg).eval()
    return hf_cfg, model


def test_clip_matches_transformers(torch_clip):
    import torch
    from text_to_video_finetuning_tpu.models.clip_text import (CLIPTextConfig,
                                                               CLIPTextModel)
    from text_to_video_finetuning_tpu.utils.checkpoint import (
        state_dict_to_flax)

    hf_cfg, hf_model = torch_clip
    sd = {k: v.detach().numpy() for k, v in hf_model.state_dict().items()}
    params = state_dict_to_flax(sd, "text_encoder")

    cfg = CLIPTextConfig(
        vocab_size=hf_cfg.vocab_size, hidden_size=hf_cfg.hidden_size,
        intermediate_size=hf_cfg.intermediate_size,
        num_hidden_layers=hf_cfg.num_hidden_layers,
        num_attention_heads=hf_cfg.num_attention_heads,
        max_position_embeddings=hf_cfg.max_position_embeddings,
        hidden_act="gelu")
    model = CLIPTextModel(config=cfg)

    rng = np.random.RandomState(0)
    ids = rng.randint(0, hf_cfg.vocab_size, (2, 77)).astype(np.int32)

    with torch.no_grad():
        ref = hf_model(torch.from_numpy(ids.astype(np.int64))
                       ).last_hidden_state.numpy()
    import jax.numpy as jnp
    ours = np.asarray(model.apply({"params": params}, jnp.asarray(ids)))

    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-4)


def test_clip_hidden_states_match_transformers(torch_clip):
    """Penultimate hidden state (clip-skip path) also matches."""
    import torch
    from text_to_video_finetuning_tpu.models.clip_text import (CLIPTextConfig,
                                                               CLIPTextModel)
    from text_to_video_finetuning_tpu.utils.checkpoint import (
        state_dict_to_flax)

    hf_cfg, hf_model = torch_clip
    sd = {k: v.detach().numpy() for k, v in hf_model.state_dict().items()}
    params = state_dict_to_flax(sd, "text_encoder")
    cfg = CLIPTextConfig(
        vocab_size=hf_cfg.vocab_size, hidden_size=hf_cfg.hidden_size,
        intermediate_size=hf_cfg.intermediate_size,
        num_hidden_layers=hf_cfg.num_hidden_layers,
        num_attention_heads=hf_cfg.num_attention_heads,
        max_position_embeddings=hf_cfg.max_position_embeddings,
        hidden_act="gelu")
    model = CLIPTextModel(config=cfg)

    ids = np.ones((1, 77), np.int32) * 5
    with torch.no_grad():
        ref = hf_model(torch.from_numpy(ids.astype(np.int64)),
                       output_hidden_states=True).hidden_states
    import jax.numpy as jnp
    _, ours_all = model.apply({"params": params}, jnp.asarray(ids),
                              output_hidden_states=True)
    assert len(ours_all) == len(ref)
    np.testing.assert_allclose(np.asarray(ours_all[-2]),
                               ref[-2].numpy(), atol=2e-5, rtol=1e-4)
