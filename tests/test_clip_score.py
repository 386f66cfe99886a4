"""CLIP-score eval subsystem: flax dual encoder vs transformers CLIPModel
goldens, preprocessing parity, t2v-eval CLI, in-train validation scoring.

The reference has no quality metric (its validation loop is eyeball-only,
reference train.py:908-958); these tests pin the measurement backbone for
the north star's "CLIP-score parity" clause.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow   # torch goldens + e2e compiles


@pytest.fixture(scope="session")
def tiny_clip_model_dir(tmp_path_factory):
    """A saved transformers CLIPModel dir (vision + text + projections +
    tokenizer) at tiny geometry, the t2v-eval input format."""
    import torch
    from transformers import (CLIPConfig, CLIPTextConfig, CLIPVisionConfig,
                              CLIPModel)

    from text_to_video_finetuning_tpu.utils.simple_tokenizer import (
        write_minimal_clip_tokenizer)

    out = str(tmp_path_factory.mktemp("clip_model"))
    vc = CLIPVisionConfig(hidden_size=32, intermediate_size=64,
                          num_hidden_layers=2, num_attention_heads=4,
                          image_size=32, patch_size=8, projection_dim=16)
    # eos 511 = the minimal tokenizer's <|endoftext|> AND the largest BPE
    # id -- same property as real CLIP vocab (eos 49407), so both pooling
    # paths select the same position on real tokenizer output
    tc = CLIPTextConfig(vocab_size=512, hidden_size=32,
                        intermediate_size=64, num_hidden_layers=2,
                        num_attention_heads=4, max_position_embeddings=77,
                        projection_dim=16, eos_token_id=511,
                        bos_token_id=510)
    torch.manual_seed(0)
    model = CLIPModel(CLIPConfig(text_config=tc.to_dict(),
                                 vision_config=vc.to_dict(),
                                 projection_dim=16)).eval()
    model.save_pretrained(out)
    write_minimal_clip_tokenizer(out, vocab_size_floor=512)
    return out


def _torch_model(model_dir):
    from transformers import CLIPModel
    return CLIPModel.from_pretrained(model_dir).eval()


def test_clip_dual_encoder_golden(tiny_clip_model_dir):
    """Embeddings and the 100*cos similarity matrix match transformers
    CLIPModel bit-for-bit (same preprocessed pixels, same ids)."""
    import torch

    from text_to_video_finetuning_tpu.eval import load_clip_model
    from text_to_video_finetuning_tpu.eval.clip_vision import CLIPDualEncoder

    model, params = load_clip_model(tiny_clip_model_dir)
    t_model = _torch_model(tiny_clip_model_dir)

    rng = np.random.RandomState(0)
    img = (rng.rand(3, 32, 32, 3).astype(np.float32)) * 2 - 1
    ids = rng.randint(1, 509, (2, 77)).astype(np.int32)
    ids[:, 0] = 510
    ids[:, 40] = 511   # eos mid-sequence: pooling position test
    with torch.no_grad():
        t_out = t_model(pixel_values=torch.tensor(img.transpose(0, 3, 1, 2)),
                        input_ids=torch.tensor(ids, dtype=torch.long))
    f_img = np.asarray(model.apply({"params": params}, jnp.asarray(img),
                                   method=CLIPDualEncoder.encode_image))
    f_txt = np.asarray(model.apply({"params": params}, jnp.asarray(ids),
                                   method=CLIPDualEncoder.encode_text))
    np.testing.assert_allclose(f_img, t_out.image_embeds.numpy(), atol=1e-5)
    np.testing.assert_allclose(f_txt, t_out.text_embeds.numpy(), atol=1e-5)

    sims = np.asarray(model.apply({"params": params}, jnp.asarray(img),
                                  jnp.asarray(ids)))
    want = 100.0 * (t_out.image_embeds.numpy()
                    @ t_out.text_embeds.numpy().T)
    np.testing.assert_allclose(sims, want, atol=1e-3)


def test_clip_text_pooling_eos2_variant(tiny_clip_model_dir, tmp_path):
    """openai/clip-* checkpoints carry the historical eos_token_id=2
    config, which transformers maps to argmax(input_ids) pooling; verify
    our branch matches torch on that path too."""
    import torch
    from transformers import CLIPModel

    from text_to_video_finetuning_tpu.eval import load_clip_model
    from text_to_video_finetuning_tpu.eval.clip_vision import CLIPDualEncoder

    d = str(tmp_path / "clip_eos2")
    t_model = CLIPModel.from_pretrained(tiny_clip_model_dir)
    t_model.config.text_config.eos_token_id = 2
    t_model.text_model.eos_token_id = 2
    t_model.save_pretrained(d)
    t_model = CLIPModel.from_pretrained(d).eval()
    assert t_model.config.text_config.eos_token_id == 2

    model, params = load_clip_model(d)
    assert model.text_config.eos_token_id == 2
    rng = np.random.RandomState(1)
    ids = rng.randint(1, 400, (2, 77)).astype(np.int32)
    ids[0, 33] = 450   # max id NOT at the end and != eos token
    ids[1, 70] = 480
    with torch.no_grad():
        t_txt = t_model.get_text_features(
            input_ids=torch.tensor(ids, dtype=torch.long))
        t_txt = torch.nn.functional.normalize(t_txt, dim=-1).numpy()
    f_txt = np.asarray(model.apply({"params": params}, jnp.asarray(ids),
                                   method=CLIPDualEncoder.encode_text))
    np.testing.assert_allclose(f_txt, t_txt, atol=1e-5)


def test_preprocess_matches_clip_image_processor():
    """Crop+normalize are exact vs transformers CLIPImageProcessor; the
    bicubic resize differs only by the PIL-vs-XLA kernel (documented,
    bounded)."""
    from transformers import CLIPImageProcessor

    from text_to_video_finetuning_tpu.eval import preprocess_frames

    proc = CLIPImageProcessor(size={"shortest_edge": 32},
                              crop_size={"height": 32, "width": 32})
    rng = np.random.RandomState(0)

    # identity-size input: no resize -> bit-exact
    frames = rng.randint(0, 256, (2, 32, 32, 3), np.uint8)
    want = proc(images=list(frames), return_tensors="np")["pixel_values"]
    got = np.asarray(preprocess_frames(frames, 32)).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=1e-6)

    # rectangular downscale: shortest-side resize + center crop, kernel
    # tolerance in normalized units
    x, y = np.meshgrid(np.linspace(0, 4, 64), np.linspace(0, 3, 48))
    img = ((np.sin(x) * np.cos(y) * 0.5 + 0.5) * 255).astype(np.uint8)
    img = np.stack([img, img // 2, 255 - img], -1)
    want = proc(images=[img], return_tensors="np")["pixel_values"]
    got = np.asarray(preprocess_frames(img[None], 32)).transpose(0, 3, 1, 2)
    assert got.shape == want.shape == (1, 3, 32, 32)
    assert np.abs(got - want).mean() < 0.08
    assert np.abs(got - want).max() < 0.5


def test_scorer_and_eval_cli(tiny_clip_model_dir, tmp_path):
    """CLIPScorer.score_video + evaluate_directory + the t2v-eval CLI over
    real mp4s; scores agree with a hand-computed torch reference within
    the preprocessing tolerance; prompt resolution covers the sidecar,
    map, and engine sample-name conventions."""
    import cv2
    import torch

    from text_to_video_finetuning_tpu.eval import CLIPScorer
    from text_to_video_finetuning_tpu.eval.clip_score import main as eval_exit
    from text_to_video_finetuning_tpu.eval.clip_score import run as eval_main

    def write_mp4(path, seed, frames=6):
        w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 8,
                            (32, 32))
        r = np.random.RandomState(seed)
        base = r.randint(0, 255, (32, 32, 3), np.uint8)
        for i in range(frames):
            w.write(np.roll(base, i, axis=0))
        w.release()

    d = tmp_path / "clips"
    d.mkdir()
    v1 = str(d / "a.mp4")
    write_mp4(v1, 0)
    with open(str(d / "a.txt"), "w") as f:       # sidecar prompt
        f.write("a noisy scrolling pattern")
    v2 = str(d / "120_dataset-single_video_a cat walking.mp4")
    write_mp4(v2, 1)                              # engine sample naming

    scorer = CLIPScorer(tiny_clip_model_dir)
    s1 = scorer.score_video(v1, "a noisy scrolling pattern")
    assert 0.0 <= s1 <= 100.0

    # torch reference score on the SAME decoded frames
    from text_to_video_finetuning_tpu.data.video import VideoReader
    frames = VideoReader(v1).get_batch(range(6))
    t_model = _torch_model(tiny_clip_model_dir)
    from transformers import CLIPImageProcessor, CLIPTokenizer
    proc = CLIPImageProcessor(size={"shortest_edge": 32},
                              crop_size={"height": 32, "width": 32})
    tok = CLIPTokenizer.from_pretrained(tiny_clip_model_dir)
    with torch.no_grad():
        pix = proc(images=list(np.asarray(frames)),
                   return_tensors="pt")["pixel_values"]
        ids = tok(["a noisy scrolling pattern"], padding="max_length",
                  max_length=77, truncation=True, return_tensors="pt")
        t_img = torch.nn.functional.normalize(
            t_model.get_image_features(pixel_values=pix), dim=-1)
        t_txt = torch.nn.functional.normalize(
            t_model.get_text_features(input_ids=ids["input_ids"]), dim=-1)
        want = float(torch.clamp(100.0 * (t_img @ t_txt.T)[:, 0],
                                 min=0).mean())
    assert abs(s1 - want) < 1.0   # resize-kernel tolerance, 0-100 scale

    # CLI over the directory: sidecar + filename-convention prompts
    json_out = str(tmp_path / "scores.json")
    records, mean = eval_main(["--clip_model", tiny_clip_model_dir,
                               "--video_dir", str(d),
                               "--json_out", json_out])
    assert len(records) == 2
    by_name = {os.path.basename(r["video"]): r for r in records}
    assert by_name["a.mp4"]["prompt"] == "a noisy scrolling pattern"
    assert by_name[os.path.basename(v2)]["prompt"] == "a cat walking"
    assert abs(by_name["a.mp4"]["clip_score"] - s1) < 1e-3
    with open(json_out) as f:
        blob = json.load(f)
    assert blob["mean_clip_score"] == pytest.approx(mean)
    # the console script wraps main() in sys.exit(): all-scored -> status 0
    assert eval_exit(["--clip_model", tiny_clip_model_dir,
                      "--video_dir", str(d)]) == 0

    # a corrupt clip yields a per-clip error record (and exit status 1),
    # not an aborted run
    bad = str(d / "truncated.mp4")
    with open(bad, "wb") as f:
        f.write(b"\x00\x01not-an-mp4")
    with open(str(d / "truncated.txt"), "w") as f:
        f.write("a prompt")
    records_bad, _ = eval_main(["--clip_model", tiny_clip_model_dir,
                                "--video_dir", str(d)])
    by_bad = {os.path.basename(r["video"]): r for r in records_bad}
    assert "error" in by_bad["truncated.mp4"]
    assert "clip_score" in by_bad["a.mp4"]   # good clips still scored
    os.remove(bad)
    os.remove(str(d / "truncated.txt"))

    # prompts_file map wins over conventions; missing prompt -> error rec
    pf = str(tmp_path / "prompts.json")
    with open(pf, "w") as f:
        json.dump({"a.mp4": "override prompt"}, f)
    v3 = str(d / "no_prompt_here.mp4")
    write_mp4(v3, 2)
    records, _ = eval_main(["--clip_model", tiny_clip_model_dir,
                            "--video_dir", str(d), "--prompts_file", pf])
    by_name = {os.path.basename(r["video"]): r for r in records}
    assert by_name["a.mp4"]["prompt"] == "override prompt"
    assert "error" in by_name["no_prompt_here.mp4"]


def test_engine_logs_clip_score(tiny_pipeline_dir, tiny_video,
                                tiny_clip_model_dir, tmp_path, caplog):
    """validation_data.compute_clip_score logs the score beside the sample
    mp4 through the REAL engine validation loop."""
    import logging

    from text_to_video_finetuning_tpu.training.engine import main
    from tests.test_train_e2e import _base_config

    cfg = _base_config(
        tiny_pipeline_dir, tiny_video, tmp_path,
        max_train_steps=1, validation_steps=1,
        validation_data=dict(sample_preview=True, prompt="a test video",
                             width=32, height=32, num_frames=4,
                             num_inference_steps=2,
                             compute_clip_score=True,
                             clip_model_path=tiny_clip_model_dir))
    with caplog.at_level(logging.INFO, logger="t2v_tpu"):
        out_dir = main(**cfg)
    msgs = [r.message for r in caplog.records if "clip_score=" in r.message]
    assert msgs, "no clip_score log line from the validation loop"
    score = float(msgs[0].split("clip_score=")[1].split()[0])
    assert 0.0 <= score <= 100.0
    assert any(f.endswith(".mp4") for f in
               os.listdir(os.path.join(out_dir, "samples")))

    # misconfiguration surfaces before training starts
    bad = _base_config(
        tiny_pipeline_dir, tiny_video, tmp_path,
        output_dir=str(tmp_path / "out2"),
        validation_data=dict(sample_preview=True,
                             compute_clip_score=True))
    with pytest.raises(ValueError, match="clip_model_path"):
        main(**bad)

    # an unusable dir (no config.json) also fails NOW, not at step N
    empty = tmp_path / "not_a_clip_model"
    empty.mkdir()
    bad2 = _base_config(
        tiny_pipeline_dir, tiny_video, tmp_path,
        output_dir=str(tmp_path / "out3"),
        validation_data=dict(sample_preview=True, compute_clip_score=True,
                             clip_model_path=str(empty)))
    with pytest.raises(ValueError, match="config.json"):
        main(**bad2)
