"""Data layer: bucketing table, normalization, datasets, loader semantics
(padding + host sharding), native kernel parity, video export."""

import os

import numpy as np
import pytest


# -- bucketing (reference utils/bucketing.py:3-33) ---------------------------

@pytest.mark.parametrize("tw,th,w,h", [
    (256, 256, 1920, 1080),   # wide video
    (256, 256, 1080, 1920),   # tall video
    (256, 256, 256, 256),     # exact
    (512, 512, 640, 480),
])
def test_sensible_buckets_properties(tw, th, w, h):
    from text_to_video_finetuning_tpu.data.bucketing import sensible_buckets
    bw, bh = sensible_buckets(tw, th, w, h)
    assert bw >= 192 and bh >= 192           # min bucket (reference :28-30)
    assert bw % 64 == 0 and bh % 64 == 0     # bucket grid
    if w > h:
        assert bw >= bh
    elif h > w:
        assert bh >= bw


def test_sensible_buckets_square_passthrough():
    from text_to_video_finetuning_tpu.data.bucketing import sensible_buckets
    assert sensible_buckets(256, 256, 512, 512) == (256, 256)


# -- normalization ------------------------------------------------------------

def test_normalize_input_uint8_mean_std():
    from text_to_video_finetuning_tpu.data.datasets import normalize_input
    x = np.full((2, 3, 4, 4), 255, np.uint8)
    out = normalize_input(x)
    np.testing.assert_allclose(out, 1.0, atol=1e-6)
    out0 = normalize_input(np.zeros((2, 3, 4, 4), np.uint8))
    np.testing.assert_allclose(out0, -1.0, atol=1e-6)


def test_native_normalize_matches_numpy():
    from text_to_video_finetuning_tpu.data import native
    rng = np.random.RandomState(0)
    frames = rng.randint(0, 256, (3, 16, 24, 3), np.uint8)
    got = native.normalize_u8_hwc_to_fchw(frames)
    ref = (frames.astype(np.float32) / 255.0 - 0.5) / 0.5
    ref = ref.transpose(0, 3, 1, 2)
    assert got.shape == (3, 3, 16, 24)
    np.testing.assert_allclose(got, ref, atol=1e-6)


# -- loader -------------------------------------------------------------------

class _RangeDataset:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {"x": np.full((2,), i, np.int32), "name": str(i)}


def test_loader_pad_last_wraps_around():
    from text_to_video_finetuning_tpu.data.loader import DataLoader
    loader = DataLoader(_RangeDataset(5), batch_size=8, shuffle=False,
                        num_workers=0, pad_last=True)
    batches = list(loader)
    assert len(batches) == 1
    ids = batches[0]["x"][:, 0].tolist()
    assert ids == [0, 1, 2, 3, 4, 0, 1, 2]     # wrap-around pad


def test_loader_host_sharding_disjoint_and_complete():
    """Each host's shards concatenate to the full global batch in order."""
    from text_to_video_finetuning_tpu.data.loader import DataLoader
    n_hosts, global_bs = 4, 8
    per_host = []
    for k in range(n_hosts):
        loader = DataLoader(_RangeDataset(16), batch_size=global_bs,
                            shuffle=True, seed=3, num_workers=0,
                            pad_last=True, num_shards=n_hosts,
                            shard_index=k)
        per_host.append([b["x"][:, 0].tolist() for b in loader])
    full = DataLoader(_RangeDataset(16), batch_size=global_bs, shuffle=True,
                      seed=3, num_workers=0, pad_last=True)
    full_batches = [b["x"][:, 0].tolist() for b in full]
    for bi, fb in enumerate(full_batches):
        got = sum((per_host[k][bi] for k in range(n_hosts)), [])
        assert got == fb
        assert all(len(per_host[k][bi]) == global_bs // n_hosts
                   for k in range(n_hosts))


def test_loader_threaded_prefetch_order():
    from text_to_video_finetuning_tpu.data.loader import DataLoader
    loader = DataLoader(_RangeDataset(12), batch_size=4, shuffle=False,
                        num_workers=2)
    seen = [b["x"][:, 0].tolist() for b in loader]
    assert seen == [[0, 1, 2, 3], [4, 5, 6, 7], [8, 9, 10, 11]]


# -- datasets -----------------------------------------------------------------

def test_single_video_dataset_static_shapes(tiny_video):
    from transformers import CLIPTokenizer
    from text_to_video_finetuning_tpu.data.datasets import SingleVideoDataset
    from text_to_video_finetuning_tpu.utils.simple_tokenizer import (
        write_minimal_clip_tokenizer)
    tok_dir = os.path.join(os.path.dirname(tiny_video), "tok")
    write_minimal_clip_tokenizer(tok_dir, vocab_size_floor=512)
    tok = CLIPTokenizer.from_pretrained(tok_dir)
    ds = SingleVideoDataset(tokenizer=tok, width=32, height=32,
                            n_sample_frames=4,
                            single_video_path=tiny_video,
                            single_video_prompt="test")
    assert len(ds) == 5    # 23 sampled indices -> 5 full 4-frame chunks
    shapes = {ds[i]["pixel_values"].shape for i in range(len(ds))}
    assert shapes == {(4, 3, 32, 32)}
    item = ds[0]
    assert item["prompt_ids"].shape == (1, 77)
    assert item["dataset"] == "single_video"
    assert item["pixel_values"].min() >= -1.0
    assert item["pixel_values"].max() <= 1.0


def test_video_folder_dataset_caption_and_fps(tiny_video):
    from transformers import CLIPTokenizer
    from text_to_video_finetuning_tpu.data.datasets import VideoFolderDataset
    from text_to_video_finetuning_tpu.utils.simple_tokenizer import (
        write_minimal_clip_tokenizer)
    d = os.path.dirname(tiny_video)
    tok_dir = os.path.join(d, "tok")
    write_minimal_clip_tokenizer(tok_dir, vocab_size_floor=512)
    tok = CLIPTokenizer.from_pretrained(tok_dir)
    ds = VideoFolderDataset(tokenizer=tok, width=32, height=32,
                            n_sample_frames=4, fps=4, path=d,
                            fallback_prompt="fallback")
    assert len(ds) == 1
    item = ds[0]
    # sibling .txt caption is read (conftest writes clip.txt)
    assert "moving noise" in item["text_prompt"]
    assert item["pixel_values"].shape == (4, 3, 32, 32)


def test_image_dataset(tmp_path):
    from PIL import Image
    from transformers import CLIPTokenizer
    from text_to_video_finetuning_tpu.data.datasets import ImageDataset
    from text_to_video_finetuning_tpu.utils.simple_tokenizer import (
        write_minimal_clip_tokenizer)
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    Image.fromarray(np.zeros((48, 64, 3), np.uint8)).save(
        str(img_dir / "a.png"))
    with open(str(img_dir / "a.txt"), "w") as f:
        f.write("an image caption")
    tok_dir = str(tmp_path / "tok")
    write_minimal_clip_tokenizer(tok_dir, vocab_size_floor=512)
    tok = CLIPTokenizer.from_pretrained(tok_dir)
    ds = ImageDataset(tokenizer=tok, width=32, height=32,
                      image_dir=str(img_dir), use_caption=True)
    assert len(ds) == 1
    item = ds[0]
    assert item["pixel_values"].shape == (1, 3, 32, 32)   # F=1
    assert item["text_prompt"] == "an image caption"


def test_json_dataset(tmp_path, tiny_video):
    import json as jsonlib
    from transformers import CLIPTokenizer
    from text_to_video_finetuning_tpu.data.datasets import VideoJsonDataset
    from text_to_video_finetuning_tpu.utils.simple_tokenizer import (
        write_minimal_clip_tokenizer)
    meta = {"name": "t", "data": [
        {"video_path": tiny_video, "num_frames": 24, "data": [
            {"frame_index": 0, "prompt": "chunk one"},
            {"frame_index": 8, "prompt": "chunk two"},
        ]}]}
    jpath = str(tmp_path / "data.json")
    with open(jpath, "w") as f:
        jsonlib.dump(meta, f)
    tok_dir = str(tmp_path / "tok")
    write_minimal_clip_tokenizer(tok_dir, vocab_size_floor=512)
    tok = CLIPTokenizer.from_pretrained(tok_dir)
    ds = VideoJsonDataset(tokenizer=tok, width=32, height=32,
                          n_sample_frames=4, json_path=jpath)
    assert len(ds) == 2
    item = ds[1]
    assert item["text_prompt"] == "chunk two"
    assert item["pixel_values"].shape == (4, 3, 32, 32)


def test_cached_dataset_roundtrip(tmp_path):
    from text_to_video_finetuning_tpu.data.datasets import CachedDataset
    cache = tmp_path / "cache"
    cache.mkdir()
    np.savez(str(cache / "cached_0.npz"),
             pixel_values=np.ones((4, 2, 4, 4), np.float32),
             prompt_ids=np.ones((1, 77), np.int32),
             text_prompt="hello", dataset="json")
    # reference-format torch .pt cache interop
    import torch
    torch.save({"pixel_values": torch.zeros(4, 2, 4, 4),
                "prompt_ids": torch.ones(1, 77, dtype=torch.int32),
                "text_prompt": "world", "dataset": "json"},
               str(cache / "cached_1.pt"))
    ds = CachedDataset(cache_dir=str(cache))
    assert len(ds) == 2
    a, b = ds[0], ds[1]
    assert a["text_prompt"] == "hello" and b["text_prompt"] == "world"
    assert a["pixel_values"].shape == b["pixel_values"].shape


def test_extend_datasets(tmp_path, tiny_video):
    from transformers import CLIPTokenizer
    from text_to_video_finetuning_tpu.data.datasets import (
        SingleVideoDataset, VideoFolderDataset, extend_datasets)
    from text_to_video_finetuning_tpu.utils.simple_tokenizer import (
        write_minimal_clip_tokenizer)
    tok_dir = str(tmp_path / "tok")
    write_minimal_clip_tokenizer(tok_dir, vocab_size_floor=512)
    tok = CLIPTokenizer.from_pretrained(tok_dir)
    d = os.path.dirname(tiny_video)
    sv = SingleVideoDataset(tokenizer=tok, width=32, height=32,
                            n_sample_frames=4, single_video_path=tiny_video,
                            single_video_prompt="p")
    vf = VideoFolderDataset(tokenizer=tok, width=32, height=32,
                            n_sample_frames=4, fps=4, path=d)
    assert len(sv) > len(vf)
    extend_datasets([sv, vf], ["video_files"], extend=True)
    assert len(vf) == len(sv)


# -- video export -------------------------------------------------------------

def test_export_to_video_roundtrip(tmp_path):
    from text_to_video_finetuning_tpu.data.video import (VideoReader,
                                                         export_to_video)
    frames = np.random.RandomState(0).randint(
        0, 255, (8, 32, 32, 3), np.uint8)   # (F, H, W, C), reference layout
    out = str(tmp_path / "out.mp4")
    export_to_video(frames, out, fps=8)
    assert os.path.exists(out) and os.path.getsize(out) > 0
    vr = VideoReader(out)
    assert len(vr) == 8
    assert vr.get_avg_fps() == pytest.approx(8, abs=1)


def test_t2vc_cache_parity_with_npz(tmp_path):
    """The native T2VC latent-cache container (native/dataio.cpp:92-186)
    roundtrips identically to the .npz path through CachedDataset."""
    import numpy as np
    from text_to_video_finetuning_tpu.data import native
    from text_to_video_finetuning_tpu.data.datasets import CachedDataset

    rng = np.random.RandomState(0)
    lat = rng.randn(4, 3, 8, 8).astype(np.float32)
    ids = rng.randint(0, 500, (77,)).astype(np.int32)
    prompt = "a test prompt with unicode éè"

    d_npz = tmp_path / "npz"
    d_t2vc = tmp_path / "t2vc"
    d_npz.mkdir(), d_t2vc.mkdir()
    np.savez(str(d_npz / "cached_0.npz"), pixel_values=lat, prompt_ids=ids,
             text_prompt=prompt, dataset="cached")
    assert native.cache_write_item(str(d_t2vc / "cached_0.t2vc"), lat, ids,
                                   prompt)

    a = CachedDataset(cache_dir=str(d_npz))[0]
    b = CachedDataset(cache_dir=str(d_t2vc))[0]
    np.testing.assert_array_equal(a["pixel_values"], b["pixel_values"])
    np.testing.assert_array_equal(a["prompt_ids"], b["prompt_ids"])
    assert a["text_prompt"] == b["text_prompt"] == prompt


def test_t2vc_numpy_fallback_reader(tmp_path, monkeypatch):
    """The pure-numpy writer/reader produce the same bytes/values as the
    native path (works with no compiler)."""
    import numpy as np
    from text_to_video_finetuning_tpu.data import native

    lat = np.arange(24, dtype=np.float32).reshape(2, 3, 2, 2)
    ids = np.arange(7, dtype=np.int32)
    p_native = str(tmp_path / "a.t2vc")
    p_numpy = str(tmp_path / "b.t2vc")
    native.cache_write_item(p_native, lat, ids, "hello")
    monkeypatch.setattr(native, "_load", lambda: None)
    native.cache_write_item(p_numpy, lat, ids, "hello")
    with open(p_native, "rb") as f1, open(p_numpy, "rb") as f2:
        assert f1.read() == f2.read()
    item = native.cache_read_item(p_numpy)
    np.testing.assert_array_equal(item["pixel_values"], lat)
    np.testing.assert_array_equal(item["prompt_ids"], ids)
    assert item["text_prompt"] == "hello"


def test_normalize_u8_to_pm1_matches_numpy():
    import numpy as np
    from text_to_video_finetuning_tpu.data import native
    x = np.random.RandomState(1).randint(0, 256, (3, 4, 5, 3), np.uint8)
    out = native.normalize_u8_to_pm1(x)
    np.testing.assert_allclose(out, x.astype(np.float32) / 127.5 - 1.0,
                               atol=1e-6)
