"""t2v-verify-checkpoint: first-contact validation kit (VERDICT r3 #4).

Covers repo-written artifacts (must validate clean) and synthetically
corrupted/reordered ones (must fail with an actionable diagnosis) for all
three reference LoRA formats plus the diffusers pipeline layout.
"""

import os
import shutil

import numpy as np
import pytest

from text_to_video_finetuning_tpu.utils.verify_checkpoint import (
    Report, main as verify_main, verify_lora_pt, verify_lora_safetensors,
    verify_pipeline)


def _cfgs(pipeline_dir):
    from text_to_video_finetuning_tpu.utils import checkpoint as ckpt
    return (ckpt.load_unet_config(os.path.join(pipeline_dir, "unet")),
            ckpt.load_clip_config(os.path.join(pipeline_dir,
                                               "text_encoder")))


def _failures(report):
    return [m for lv, m in report.lines if lv == "FAIL"]


def test_pipeline_dir_validates_clean_with_smoke(tiny_pipeline_dir):
    report = Report()
    verify_pipeline(tiny_pipeline_dir, report, smoke=True)
    assert report.ok(), _failures(report)
    msgs = " ".join(m for _, m in report.lines)
    assert "smoke forward ok" in msgs
    assert "all" in msgs and "params match" in msgs


def test_pipeline_dir_detects_corruption(tiny_pipeline_dir, tmp_path):
    """A dropped tensor, a shape edit, and a foreign key are each named in
    the failure output."""
    from safetensors.numpy import load_file, save_file

    d = str(tmp_path / "pipe")
    shutil.copytree(tiny_pipeline_dir, d)
    st = os.path.join(d, "unet", "diffusion_pytorch_model.safetensors")
    sd = load_file(st)
    victim = sorted(sd)[0]
    dropped = dict(sd)
    dropped.pop(victim)
    dropped["conv_in.bogus_extra"] = np.zeros((3,), np.float32)
    k2 = sorted(sd)[1]
    dropped[k2] = np.zeros((1,) + tuple(dropped[k2].shape), np.float32)
    save_file(dropped, st)

    report = Report()
    verify_pipeline(d, report, smoke=False)
    assert not report.ok()
    text = " ".join(_failures(report))
    assert "MISSING" in text
    assert "bogus_extra" in text or "UNEXPECTED" in text

    # cli entry returns nonzero
    assert verify_main([d]) == 1
    assert verify_main([tiny_pipeline_dir]) == 0


def test_single_model_dir_and_unrecognized(tiny_pipeline_dir, tmp_path):
    report = Report()
    verify_pipeline(os.path.join(tiny_pipeline_dir, "vae"), report)
    assert report.ok(), _failures(report)

    report = Report()
    verify_pipeline(str(tmp_path), report)
    assert not report.ok()


@pytest.fixture()
def tiny_lora(tiny_pipeline_dir):
    """(sites, lora pytree) for the tiny UNet with the reference's default
    Transformer2DModel target set."""
    import jax

    from text_to_video_finetuning_tpu.lora.overlay import init_lora_params
    from text_to_video_finetuning_tpu.lora.sites import (
        enumerate_unet_sites, select_sites)

    unet_cfg, _ = _cfgs(tiny_pipeline_dir)
    sites = select_sites(enumerate_unet_sites(unet_cfg),
                         ("Transformer2DModel",))
    assert sites
    lora = init_lora_params(jax.random.PRNGKey(0), sites, 4, "cloneofsimo")
    return unet_cfg, sites, lora


def test_lora_pt_match_and_reorder(tiny_pipeline_dir, tiny_lora, tmp_path):
    import torch

    from text_to_video_finetuning_tpu.lora.formats import save_lora_pt

    unet_cfg, sites, lora = tiny_lora
    path = str(tmp_path / "lora.pt")
    save_lora_pt(lora, sites, path)

    report = Report()
    verify_lora_pt(path, report, _cfgs(tiny_pipeline_dir))
    assert report.ok(), _failures(report)
    assert any("Transformer2DModel" in m for _, m in report.lines)

    # swapped up/down inside one pair: shape diagnosis names the pair/site
    weights = torch.load(path, map_location="cpu", weights_only=True)
    weights[2], weights[3] = weights[3], weights[2]
    bad = str(tmp_path / "swapped.pt")
    torch.save(weights, bad)
    report = Report()
    verify_lora_pt(bad, report, _cfgs(tiny_pipeline_dir))
    assert not report.ok()
    assert any("pair 1" in m for m in _failures(report))

    # truncated list: count diagnosis
    torch.save(weights[:-2], str(tmp_path / "short.pt"))
    report = Report()
    verify_lora_pt(str(tmp_path / "short.pt"), report,
                   _cfgs(tiny_pipeline_dir))
    assert not report.ok()

    # odd count
    torch.save(weights[:-1], str(tmp_path / "odd.pt"))
    report = Report()
    verify_lora_pt(str(tmp_path / "odd.pt"), report,
                   _cfgs(tiny_pipeline_dir))
    assert any("odd tensor count" in m for m in _failures(report))

    # a dict payload (foreign ecosystem) is identified, not crashed on
    torch.save({"some.key": weights[0]}, str(tmp_path / "dict.pt"))
    report = Report()
    verify_lora_pt(str(tmp_path / "dict.pt"), report,
                   _cfgs(tiny_pipeline_dir))
    assert any("flat [up, down" in m for m in _failures(report))


def test_lora_safeloras_and_stable(tiny_pipeline_dir, tiny_lora, tmp_path):
    from safetensors.numpy import load_file, save_file

    from text_to_video_finetuning_tpu.lora.formats import (
        save_safeloras, stable_lora_state_dict)

    unet_cfg, sites, lora = tiny_lora
    cfgs = _cfgs(tiny_pipeline_dir)

    # cloneofsimo safeloras: clean file validates; count mismatch fails
    sl = str(tmp_path / "lora.safetensors")
    save_safeloras({"unet": (lora, sites, {"Transformer2DModel"})}, sl)
    report = Report()
    verify_lora_safetensors(sl, report, cfgs)
    assert report.ok(), _failures(report)

    sd = load_file(sl)
    with __import__("safetensors").safe_open(sl, framework="numpy") as f:
        meta = f.metadata()
    last = (len(sites) - 1)
    sd.pop(f"unet:{last}:up"), sd.pop(f"unet:{last}:down")
    trunc = str(tmp_path / "trunc.safetensors")
    save_file(sd, trunc, metadata=meta)
    report = Report()
    verify_lora_safetensors(trunc, report, cfgs)
    assert not report.ok()
    assert any("pairs" in m for m in _failures(report))

    # stable_lora full_weights: clean validates; renamed module fails
    import jax
    from text_to_video_finetuning_tpu.lora.overlay import init_lora_params
    stable = init_lora_params(jax.random.PRNGKey(0), sites, 4, "stable_lora")
    sd = stable_lora_state_dict(stable, sites)
    fw = str(tmp_path / "full_unet.safetensors")
    save_file(sd, fw)
    report = Report()
    verify_lora_safetensors(fw, report, cfgs)
    assert report.ok(), _failures(report)

    a_key = next(k for k in sd if k.endswith(".lora_A"))
    sd["not.a.real.module.lora_A"] = sd.pop(a_key)
    bad = str(tmp_path / "renamed.safetensors")
    save_file(sd, bad)
    report = Report()
    verify_lora_safetensors(bad, report, cfgs)
    assert not report.ok()
    assert any("not.a.real.module" in m for m in _failures(report))
    assert any("missing lora_A or lora_B" in m for m in _failures(report))


def test_lora_pt_explicit_targets_and_model_path(tiny_pipeline_dir,
                                                 tiny_lora, tmp_path):
    """--target_modules overrides candidate search; --model_path supplies
    non-default geometry (the tiny fixture IS non-default, so the default
    ms-1.7b geometry must fail on it)."""
    from text_to_video_finetuning_tpu.lora.formats import save_lora_pt

    _, sites, lora = tiny_lora
    path = str(tmp_path / "lora.pt")
    save_lora_pt(lora, sites, path)

    assert verify_main([path, "--model_path", tiny_pipeline_dir,
                        "--target_modules", "Transformer2DModel"]) == 0
    # wrong explicit target set -> diagnosis, nonzero exit
    assert verify_main([path, "--model_path", tiny_pipeline_dir,
                        "--target_modules", "ResnetBlock2D"]) == 1
    # full-size default geometry cannot match the tiny file
    assert verify_main([path]) == 1
