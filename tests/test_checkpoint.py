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


def test_async_train_state_saver_roundtrip(tmp_path):
    """AsyncTrainStateSaver writes in the background; after wait() the
    state restores bit-exact through the same load_train_state path the
    engine uses on --resume_from_checkpoint (utils/train_state_io.py).
    Two back-to-back saves exercise the at-most-one-in-flight join."""
    from text_to_video_finetuning_tpu.utils import train_state_io

    state = {"step": jax.numpy.asarray(7),
             "params": {"w": jax.numpy.arange(12, dtype="float32")
                        .reshape(3, 4)},
             "mu": {"w": jax.numpy.full((3, 4), 0.25, dtype="float32")}}
    saver = train_state_io.AsyncTrainStateSaver()
    d1, d2 = str(tmp_path / "ckpt-1"), str(tmp_path / "ckpt-2")
    saver.save(d1, state)
    # second save must first join the in-flight first write
    state2 = jax.tree_util.tree_map(lambda x: x + 1, state)
    saver.save(d2, state2)
    saver.wait()
    saver.close()
    assert train_state_io.has_train_state(d1)
    assert train_state_io.has_train_state(d2)
    template = jax.tree_util.tree_map(lambda x: x * 0, state)
    r1 = train_state_io.load_train_state(d1, template)
    r2 = train_state_io.load_train_state(d2, template)
    for got, want in ((r1, state), (r2, state2)):
        flat_g = jax.tree_util.tree_leaves(got)
        flat_w = jax.tree_util.tree_leaves(want)
        for g, w in zip(flat_g, flat_w):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_one_in_flight_orders_and_raises():
    """OneInFlight serializes tasks (a submit joins the previous write) and
    re-raises a background failure on the caller thread -- fail-fast, the
    engine's error policy (utils/background.py)."""
    import time
    from text_to_video_finetuning_tpu.utils.background import OneInFlight

    order = []
    w = OneInFlight()
    w.submit(lambda: (time.sleep(0.2), order.append("first")))
    w.submit(lambda: order.append("second"))  # must join "first" before run
    w.join()
    assert order == ["first", "second"]

    def boom():
        raise RuntimeError("disk full")

    w.submit(boom)
    with pytest.raises(RuntimeError, match="disk full"):
        w.join()
    # the worker is reusable after a failure
    w.submit(lambda: order.append("third"))
    w.join()
    assert order[-1] == "third"


def test_prune_checkpoints_keeps_newest_and_in_flight(tmp_path):
    """checkpoints_total_limit semantics (diffusers-style, beyond the
    reference which keeps every checkpoint): newest `limit` dirs survive,
    the in-flight dir is never pruned, non-checkpoint entries untouched."""
    import os
    from text_to_video_finetuning_tpu.training.engine import \
        prune_checkpoints

    for s in (100, 200, 300, 400):
        os.makedirs(tmp_path / f"checkpoint-{s}" / "unet")
    os.makedirs(tmp_path / "samples")
    (tmp_path / "checkpoint-bogus").mkdir()  # unparseable: ignored

    prune_checkpoints(str(tmp_path), limit=2, in_flight_step=400)
    left = sorted(p.name for p in tmp_path.iterdir())
    assert "checkpoint-300" in left and "checkpoint-400" in left
    assert "checkpoint-100" not in left and "checkpoint-200" not in left
    assert "samples" in left and "checkpoint-bogus" in left

    # limit=None / 0 keeps everything (reference behavior)
    prune_checkpoints(str(tmp_path), limit=None, in_flight_step=400)
    prune_checkpoints(str(tmp_path), limit=0, in_flight_step=400)
    assert (tmp_path / "checkpoint-300").is_dir()

    # the in-flight dir survives even when older than the newest `limit`
    os.makedirs(tmp_path / "checkpoint-500")
    os.makedirs(tmp_path / "checkpoint-600")
    prune_checkpoints(str(tmp_path), limit=1, in_flight_step=300)
    assert (tmp_path / "checkpoint-300").is_dir()
    assert (tmp_path / "checkpoint-600").is_dir()
    assert not (tmp_path / "checkpoint-400").exists()


def test_train_state_restore_bridges_ema_presence_mismatch(tmp_path):
    """use_ema on/off changes the TrainState tree structure (the ema
    field); load_train_state bridges a presence mismatch instead of
    surfacing orbax's opaque structure error (ADVICE r3):
    - resume WITHOUT->WITH ema: the shadow is seeded from the restored
      trainable params;
    - resume WITH->WITHOUT: the stored shadow is dropped;
    - a genuine structure mismatch still raises, with a targeted message."""
    import dataclasses

    from text_to_video_finetuning_tpu.training import TrainState
    from text_to_video_finetuning_tpu.utils import train_state_io

    trainable = {"unet": {"w": jax.numpy.arange(6, dtype="float32")}}
    base = TrainState(step=jax.numpy.asarray(5, "int32"),
                      trainable=trainable,
                      opt_state={"mu": {"unet": {"w": jax.numpy.ones(6)}}},
                      rng=jax.random.PRNGKey(3), ema=None)

    # saved WITHOUT ema, resumed WITH use_ema: shadow seeded from trainable
    d1 = str(tmp_path / "ckpt-no-ema")
    train_state_io.save_train_state(d1, base)
    template_ema = dataclasses.replace(
        base,
        trainable=jax.tree_util.tree_map(lambda x: x * 0, trainable),
        ema=jax.tree_util.tree_map(lambda x: x * 0, trainable))
    restored = train_state_io.load_train_state(d1, template_ema)
    assert restored.ema is not None
    np.testing.assert_array_equal(np.asarray(restored.ema["unet"]["w"]),
                                  np.asarray(trainable["unet"]["w"]))
    np.testing.assert_array_equal(np.asarray(restored.trainable["unet"]["w"]),
                                  np.asarray(trainable["unet"]["w"]))

    # saved WITH ema, resumed with use_ema off: shadow discarded
    with_ema = dataclasses.replace(
        base, ema=jax.tree_util.tree_map(lambda x: x + 10, trainable))
    d2 = str(tmp_path / "ckpt-ema")
    train_state_io.save_train_state(d2, with_ema)
    restored2 = train_state_io.load_train_state(
        d2, dataclasses.replace(template_ema, ema=None))
    assert restored2.ema is None
    np.testing.assert_array_equal(
        np.asarray(restored2.trainable["unet"]["w"]),
        np.asarray(trainable["unet"]["w"]))

    # the bridge decides from the checkpoint's own tree metadata, not by
    # retrying on failure (ADVICE r3 follow-up: a corrupt checkpoint must
    # not be re-read and re-labelled as a settings mismatch)
    import os
    ema_idx = [f.name for f in dataclasses.fields(TrainState)].index("ema")
    assert train_state_io._checkpoint_has_ema(
        os.path.join(d1, "train_state"), ema_idx) is False
    assert train_state_io._checkpoint_has_ema(
        os.path.join(d2, "train_state"), ema_idx) is True
    assert train_state_io._checkpoint_has_ema(
        str(tmp_path / "nonexistent"), ema_idx) is None

    # a genuinely different tree (ema presence MATCHES) fails with orbax's
    # real structure error after a single restore attempt -- not the old
    # misleading "keep settings consistent" RuntimeError relabel
    bad_template = dataclasses.replace(
        base, trainable={"unet": {"w": jax.numpy.zeros(6),
                                  "extra": jax.numpy.zeros(2)}})
    with pytest.raises(Exception) as excinfo:
        train_state_io.load_train_state(d1, bad_template)
    assert "use_ema on/off mismatch" not in str(excinfo.value)


def test_one_in_flight_context_labels_failure():
    """submit(context=...) pins a background failure to the task that
    failed (the exception only re-raises at the NEXT submit/join, up to a
    checkpoint interval later -- ADVICE r3)."""
    import traceback

    from text_to_video_finetuning_tpu.utils.background import OneInFlight

    w = OneInFlight()

    def boom():
        raise RuntimeError("disk full")

    w.submit(boom, context="checkpoint-500 pipeline save")
    with pytest.raises(RuntimeError) as exc_info:
        w.join()
    rendered = "".join(traceback.format_exception(exc_info.value))
    assert "checkpoint-500 pipeline save" in rendered
