"""Serving-mode tests: dynamic batching semantics (fast, model-free) and
an end-to-end HTTP round trip over the tiny pipeline (slow).

The reference has no serving mode (its inference.py:336-435 is one-shot);
these pin OUR contract: same-signature coalescing, FIFO fairness across
signatures, per-request error isolation, and the HTTP surface."""

import json
import os
import threading
import time
import urllib.error
import urllib.request

import numpy as np
import pytest

from text_to_video_finetuning_tpu.serving import (BatchingWorker,
                                                  GenerationRequest,
                                                  request_batch_key,
                                                  request_compile_key)


def _drain(worker, pendings, timeout=30.0):
    for p in pendings:
        assert p.done.wait(timeout=timeout), "request never completed"


def test_batch_key_groups_compile_signatures():
    a = GenerationRequest(prompt="x", width=64, height=64, num_frames=8)
    b = GenerationRequest(prompt="y", width=64, height=64, num_frames=8)
    c = GenerationRequest(prompt="x", width=64, height=64, num_frames=16)
    d = GenerationRequest(prompt="x", width=64, height=64, num_frames=8,
                          guidance_scale=1.0)
    assert request_batch_key(a) == request_batch_key(b)
    assert request_batch_key(a) != request_batch_key(c)
    assert request_batch_key(a) != request_batch_key(d)
    # window_size=None resolves to num_frames: explicit equal window matches
    e = GenerationRequest(prompt="x", width=64, height=64, num_frames=8,
                          window_size=8)
    assert request_batch_key(a) == request_batch_key(e)


def test_worker_coalesces_same_signature_requests():
    calls = []
    gate = threading.Event()

    def run_batch(requests):
        gate.wait(timeout=10)       # hold the first dispatch so the rest queue
        calls.append([r.prompt for r in requests])
        return [np.zeros((3, 2, 4, 4), np.float32) for _ in requests]

    w = BatchingWorker(run_batch, max_batch=4, batch_window_ms=200)
    try:
        first = w.submit(GenerationRequest(prompt="p0"))
        time.sleep(0.05)
        rest = [w.submit(GenerationRequest(prompt=f"p{i}"))
                for i in range(1, 4)]
        gate.set()
        _drain(w, [first] + rest)
        # first ran alone or gathered some of the rest within its window;
        # everything completed, nothing errored, and no batch mixed keys
        assert sorted(p for c in calls for p in c) == ["p0", "p1", "p2", "p3"]
        assert all(p.error is None for p in [first] + rest)
        stats = w.snapshot()
        assert stats["requests"] == 4
        assert stats["batches"] <= 4
        # the three queued-behind requests share one signature, so they
        # coalesce into a single batch once the gate opens
        assert stats["max_batch_seen"] >= 3
    finally:
        w.shutdown()


def test_worker_trims_ragged_batch_to_warmed_size():
    """A gathered batch whose size has no compiled program shrinks to the
    largest warmed size; the extras lead the next cycle.  Guards against
    the measured mid-traffic B=3 compile collapse (RESULTS.md round 5)."""
    calls = []
    gate = threading.Event()

    def run_batch(requests):
        gate.wait(timeout=10)
        calls.append(len(requests))
        return [np.zeros((3, 2, 4, 4), np.float32) for _ in requests]

    w = BatchingWorker(run_batch, max_batch=8, batch_window_ms=300)
    try:
        key = request_compile_key(GenerationRequest(prompt="p"))
        w.note_warm(key, 1)
        w.note_warm(key, 2)
        first = w.submit(GenerationRequest(prompt="p0"))
        time.sleep(0.05)
        rest = [w.submit(GenerationRequest(prompt=f"p{i}"))
                for i in range(1, 3)]
        gate.set()
        _drain(w, [first] + rest)
        # 3 gathered (any split the gather window produced), but every
        # dispatched size is warmed — never the un-warmed 3
        assert sum(calls) == 3
        assert all(c in (1, 2) for c in calls)
        assert all(p.error is None for p in [first] + rest)
    finally:
        w.shutdown()


def test_worker_full_batch_dispatches_even_unwarmed():
    """The steady-state shape (== max_batch) is worth its one-time
    compile: a full batch is never trimmed, and its size is noted warm."""
    calls = []
    gate = threading.Event()

    def run_batch(requests):
        gate.wait(timeout=10)
        calls.append(len(requests))
        return [np.zeros((3, 2, 4, 4), np.float32) for _ in requests]

    w = BatchingWorker(run_batch, max_batch=3, batch_window_ms=300)
    try:
        key = request_compile_key(GenerationRequest(prompt="p"))
        w.note_warm(key, 1)
        first = w.submit(GenerationRequest(prompt="p0"))
        time.sleep(0.05)
        rest = [w.submit(GenerationRequest(prompt=f"p{i}"))
                for i in range(1, 3)]
        gate.set()
        _drain(w, [first] + rest)
        assert sum(calls) == 3
        # either the window gathered all 3 (full batch → dispatched as-is)
        # or it split; a split can only produce warmed sizes (1) or fulls
        assert all(c in (1, 3) for c in calls)
        assert 3 in w._warm[key] or calls == [1, 1, 1]
    finally:
        w.shutdown()


def test_worker_separates_mismatched_signatures():
    calls = []

    def run_batch(requests):
        keys = {request_batch_key(r) for r in requests}
        assert len(keys) == 1, "a batch mixed signatures"
        calls.append(len(requests))
        return [np.zeros((3, 2, 4, 4), np.float32) for _ in requests]

    w = BatchingWorker(run_batch, max_batch=8, batch_window_ms=150)
    try:
        small = [GenerationRequest(prompt=f"s{i}", num_frames=8)
                 for i in range(2)]
        large = [GenerationRequest(prompt=f"l{i}", num_frames=16)
                 for i in range(2)]
        pendings = [w.submit(r) for r in
                    [small[0], large[0], small[1], large[1]]]
        _drain(w, pendings)
        assert all(p.error is None for p in pendings)
        assert w.snapshot()["requests"] == 4
    finally:
        w.shutdown()


def test_worker_no_batch_runs_alone():
    def run_batch(requests):
        assert len(requests) == 1
        return [np.zeros((3, 2, 4, 4), np.float32)]

    w = BatchingWorker(run_batch, max_batch=8, batch_window_ms=100)
    try:
        pendings = [w.submit(GenerationRequest(prompt=f"p{i}", no_batch=True))
                    for i in range(3)]
        _drain(w, pendings)
        assert w.snapshot()["batches"] == 3
    finally:
        w.shutdown()


def test_init_video_requests_run_alone():
    """img2img requests carry per-request pixels, so they never coalesce."""
    def run_batch(requests):
        assert len(requests) == 1
        return [np.zeros((3, 2, 4, 4), np.float32)]

    w = BatchingWorker(run_batch, max_batch=8, batch_window_ms=100)
    try:
        reqs = [GenerationRequest(prompt=f"p{i}", init_video_base64="AAAA")
                for i in range(2)]
        pendings = [w.submit(r) for r in reqs]
        _drain(w, pendings)
        assert w.snapshot()["batches"] == 2
    finally:
        w.shutdown()


def test_worker_pipelines_dispatch_ahead_of_readback():
    """The two-stage pipeline dispatches batch N+1 BEFORE blocking on
    batch N's finisher — the overlap is deterministic worker behavior,
    not a client-concurrency accident (round-4 verdict #5)."""
    order = []
    second_submitted = threading.Event()

    def dispatch(requests):
        idx = requests[0].prompt
        order.append(f"dispatch:{idx}")
        if idx == "0":
            # hold the worker inside dispatch(0) until request 1 is
            # queued, so the loop's zero-timeout poll must see it
            assert second_submitted.wait(5)

        def finisher():
            order.append(f"finish:{idx}")
            return [np.zeros((3, 2, 4, 4), np.float32)]

        return finisher

    w = BatchingWorker(lambda reqs: dispatch(reqs)(), max_batch=1,
                       batch_window_ms=0, dispatch_batch=dispatch)
    try:
        p0 = w.submit(GenerationRequest(prompt="0", no_batch=True))
        p1 = w.submit(GenerationRequest(prompt="1", no_batch=True))
        second_submitted.set()
        _drain(w, [p0, p1])
        assert order == ["dispatch:0", "dispatch:1", "finish:0", "finish:1"]
        assert p0.error is None and p1.error is None
        assert p0.video is not None and p1.video is not None
    finally:
        w.shutdown()


def test_worker_finishes_stage_before_unwarmed_dispatch():
    """A dispatch that will COMPILE (its (signature, size) is not warm)
    must not hold the staged batch's finished videos hostage: the worker
    finishes the stage first, then dispatches.  Guards the
    finished-work-behind-a-150s-compile hazard (round-5 review)."""
    order = []
    second_submitted = threading.Event()

    def dispatch(requests):
        idx = requests[0].prompt
        order.append(f"dispatch:{idx}")
        if idx == "0":
            assert second_submitted.wait(5)

        def finisher():
            order.append(f"finish:{idx}")
            return [np.zeros((3, 2, 4, 4), np.float32)]

        return finisher

    w = BatchingWorker(lambda reqs: dispatch(reqs)(), max_batch=1,
                       batch_window_ms=0, dispatch_batch=dispatch)
    try:
        p0 = w.submit(GenerationRequest(prompt="0", no_batch=True))
        # DIFFERENT signature -> (key, 1) is unwarmed when it dispatches
        p1 = w.submit(GenerationRequest(prompt="1", no_batch=True,
                                        num_frames=8))
        second_submitted.set()
        _drain(w, [p0, p1])
        # the unwarmed dispatch:1 happens AFTER finish:0 released batch 0
        # (contrast test_worker_pipelines_dispatch_ahead_of_readback, where
        # matching signatures keep the dispatch-ahead overlap)
        assert order == ["dispatch:0", "finish:0", "dispatch:1", "finish:1"]
        assert p0.error is None and p1.error is None
    finally:
        w.shutdown()


def test_worker_overlap_survives_per_request_negative_prompts():
    """Warmth is keyed on the COMPILE key: a distinct negative_prompt
    changes the batch key but not the compiled program, so the
    dispatch-ahead overlap must persist across such requests instead of
    settling the stage before every dispatch (round-5 review)."""
    order = []
    second_submitted = threading.Event()

    def dispatch(requests):
        idx = requests[0].prompt
        order.append(f"dispatch:{idx}")
        if idx == "0":
            assert second_submitted.wait(5)

        def finisher():
            order.append(f"finish:{idx}")
            return [np.zeros((3, 2, 4, 4), np.float32)]

        return finisher

    w = BatchingWorker(lambda reqs: dispatch(reqs)(), max_batch=1,
                       batch_window_ms=0, dispatch_batch=dispatch)
    try:
        p0 = w.submit(GenerationRequest(prompt="0", no_batch=True,
                                        negative_prompt="blurry"))
        p1 = w.submit(GenerationRequest(prompt="1", no_batch=True,
                                        negative_prompt="grainy"))
        second_submitted.set()
        _drain(w, [p0, p1])
        # same geometry → same compiled program → overlap retained even
        # though the batch keys differ on negative_prompt
        assert order == ["dispatch:0", "dispatch:1", "finish:0", "finish:1"]
        assert p0.error is None and p1.error is None
    finally:
        w.shutdown()


def test_worker_default_wrapper_warms_only_on_success():
    """A worker built without dispatch_batch runs synchronously; a batch
    size is recorded as warm (trim target) only after run_batch SUCCEEDS —
    a failed batch must not teach trim_to_warm a size that never compiled
    (round-5 review)."""
    def run_batch(requests):
        if requests[0].prompt == "boom":
            raise RuntimeError("kaput")
        return [np.zeros((3, 2, 4, 4), np.float32) for _ in requests]

    w = BatchingWorker(run_batch, max_batch=4, batch_window_ms=0)
    try:
        key = request_compile_key(GenerationRequest(prompt="boom"))
        bad = w.submit(GenerationRequest(prompt="boom"))
        _drain(w, [bad])
        assert bad.error and "kaput" in bad.error
        assert 1 not in w._warm.get(key, set())
        good = w.submit(GenerationRequest(prompt="fine"))
        _drain(w, [good])
        assert good.error is None
        assert 1 in w._warm.get(key, set())
    finally:
        w.shutdown()


def test_worker_isolates_errors_per_batch():
    def run_batch(requests):
        if requests[0].prompt == "boom":
            raise RuntimeError("kaput")
        return [np.zeros((3, 2, 4, 4), np.float32) for _ in requests]

    w = BatchingWorker(run_batch, max_batch=1)
    try:
        bad = w.submit(GenerationRequest(prompt="boom"))
        good = w.submit(GenerationRequest(prompt="fine"))
        _drain(w, [bad, good])
        assert bad.error and "kaput" in bad.error
        assert good.error is None and good.video is not None
        assert w.snapshot()["errors"] == 1
    finally:
        w.shutdown()


def test_max_queue_backpressure():
    """max_queue bounds ACCEPTED-but-unfinished requests (queued +
    gathering + dispatched): overflow submits raise ServerOverloaded
    (mapped to HTTP 503), completions free capacity, and the stats
    snapshot exposes queue_depth + a rejected counter.  Rationale: one
    full-size dispatch holds the chip for seconds (RESULTS.md serving),
    so an unbounded queue turns a burst into minutes of tail latency."""
    from text_to_video_finetuning_tpu.serving.server import (
        BatchingWorker, ServerOverloaded)

    release = threading.Event()

    def slow_batch(reqs):
        release.wait(timeout=30)
        return [np.zeros((3, 2, 8, 8), np.float32)] * len(reqs)

    w = BatchingWorker(slow_batch, max_batch=1, batch_window_ms=0,
                       max_queue=2)
    try:
        p1 = w.submit(GenerationRequest(prompt="a"))
        p2 = w.submit(GenerationRequest(prompt="b"))
        with pytest.raises(ServerOverloaded, match="max_queue=2"):
            w.submit(GenerationRequest(prompt="c"))
        snap = w.snapshot()
        assert snap["rejected"] == 1 and snap["queue_depth"] == 2
        release.set()
        _drain(w, [p1, p2])
        # completions freed capacity; the rejected request was never queued
        p3 = w.submit(GenerationRequest(prompt="d"))
        _drain(w, [p3])
        snap = w.snapshot()
        assert snap["queue_depth"] == 0 and snap["requests"] == 3
    finally:
        release.set()
        w.shutdown()


def test_warmup_precompiles_each_batch_shape(tmp_path):
    """warmup(batch_sizes=...) must dispatch exactly one batch per distinct
    size (ascending, deduped, clamped to max_batch), bypassing the gather
    window — each batch size is its own XLA program, and an unwarmed shape
    compiles mid-traffic (benchmarks/RESULTS.md round 4)."""
    from text_to_video_finetuning_tpu.serving import T2VServer

    server = T2VServer(model="<fake>", port=0, output_dir=str(tmp_path),
                       max_batch=4, pipe=object())
    sizes = []

    def fake_generate(pipe, prompts, **kwargs):
        sizes.append(len(prompts))
        return [np.zeros((3, 2, 8, 8), np.float32)] * len(prompts)

    server._generate = fake_generate
    try:
        req = GenerationRequest(prompt="warmup", num_frames=8, num_steps=2)
        out = server.warmup(req, batch_sizes=(4, 2, 0, 2, 8))
        assert out is req
        assert sizes == [1, 2, 4]   # 0 -> clamp 1; 8 -> max_batch; deduped
        # the worker saw none of it: warmup bypasses the batching queue
        assert server.worker.snapshot()["requests"] == 0
        # default: one batch-1 dispatch at the server's default signature
        sizes.clear()
        d = server.warmup()
        assert sizes == [1] and d.num_steps == 25 and d.num_frames == 16
    finally:
        server.shutdown()


def test_drain_finishes_inflight_and_rejects_new(tmp_path):
    """drain_and_shutdown (t2v-serve's SIGTERM path): in-flight requests
    complete (a full-size dispatch holds the chip for seconds; killing it
    wastes the work), NEW requests and /healthz get 503 while draining,
    and serve_forever returns once drained — the serving side of
    training's save_on_preemption."""
    from text_to_video_finetuning_tpu.serving import T2VServer

    server = T2VServer(model="<fake>", port=0, output_dir=str(tmp_path),
                       max_batch=1, batch_window_ms=0, pipe=object())
    release = threading.Event()

    def slow_generate(pipe, prompts, **kwargs):
        release.wait(timeout=30)
        return [np.zeros((3, 2, 8, 8), np.float32)] * len(prompts)

    server._generate = slow_generate
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    base = f"http://{server.host}:{server.port}"
    body = json.dumps({"prompt": "x", "width": 8, "height": 8,
                       "num_frames": 2, "window_size": 2,
                       "num_steps": 1}).encode()

    def post():
        try:
            r = urllib.request.urlopen(urllib.request.Request(
                base + "/generate", data=body,
                headers={"Content-Type": "application/json"}), timeout=30)
            return r.status
        except urllib.error.HTTPError as e:
            return e.code

    results = {}
    t1 = threading.Thread(target=lambda: results.update(inflight=post()))
    t1.start()
    for _ in range(200):                      # worker picked the request up
        if server.worker.snapshot()["queue_depth"] == 1:
            break
        time.sleep(0.02)
    assert server.worker.snapshot()["queue_depth"] == 1

    server.request_drain(timeout_s=30)
    assert server._draining.wait(timeout=5)
    assert post() == 503                      # new traffic shed
    try:
        urllib.request.urlopen(base + "/healthz", timeout=5)
        raise AssertionError("healthz should be 503 while draining")
    except urllib.error.HTTPError as e:
        assert e.code == 503
        assert json.loads(e.read())["status"] == "draining"

    release.set()                             # let the in-flight finish
    t1.join(timeout=30)
    assert results["inflight"] == 200
    thread.join(timeout=30)                   # drained -> server exited
    assert not thread.is_alive()


# ---------------------------------------------------------------------------
# End-to-end HTTP over the tiny pipeline (compiles the scan sampler: slow)
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_serve_http_end_to_end(tiny_pipeline_dir, tmp_path):
    from text_to_video_finetuning_tpu.serving import T2VServer

    server = T2VServer(model=str(tiny_pipeline_dir), port=0,
                       output_dir=str(tmp_path / "out"), max_batch=2,
                       batch_window_ms=1000, request_timeout_s=600)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    base = f"http://{server.host}:{server.port}"

    def post(payload, expect=200):
        req = urllib.request.Request(
            f"{base}/generate", data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"})
        try:
            with urllib.request.urlopen(req, timeout=600) as r:
                return r.status, json.loads(r.read())
        except urllib.error.HTTPError as e:
            return e.code, json.loads(e.read())

    try:
        with urllib.request.urlopen(f"{base}/healthz", timeout=30) as r:
            health = json.loads(r.read())
        assert health["status"] == "ok"

        payload = dict(prompt="a cat", width=32, height=32, num_frames=4,
                       num_steps=2, guidance_scale=7.5, seed=3,
                       vae_batch_size=2)

        # two concurrent same-signature requests -> coalesced into one batch
        results = {}

        def call(name, p):
            results[name] = post(p)

        t1 = threading.Thread(target=call, args=("a", payload))
        t2 = threading.Thread(
            target=call, args=("b", dict(payload, prompt="a dog")))
        t1.start(); t2.start(); t1.join(); t2.join()
        for name in ("a", "b"):
            code, body = results[name]
            assert code == 200, body
            assert body["num_frames"] == 4
            # coalescing is observable per request (VERDICT r3): both
            # requests shared one dispatch, sampled from the head's seed
            assert body["coalesced"] == 2, body
            assert body["seed_used"] == payload["seed"], body
            # the tiny fixture VAE upsamples x2 (2 blocks) while latents
            # are prepared at //8, so decoded H/W != requested 32 here;
            # the server reports the DECODED geometry
            assert body["width"] == body["height"] > 0
            assert os.path.exists(body["path"])
        with urllib.request.urlopen(f"{base}/stats", timeout=30) as r:
            stats = json.loads(r.read())
        assert stats["requests"] == 2
        assert stats["max_batch_seen"] == 2, \
            "concurrent same-signature requests were not coalesced"

        # return_video round trip
        code, body = post(dict(payload, prompt="a bird",
                               return_video=True))
        assert code == 200 and len(body["video_base64"]) > 0

        # img2img: round-trip an init video through base64; LaMa ckpt is
        # absent in this env so remove_watermark exercises the identity
        # gating path (tests/test_inference.py pins that behavior)
        import base64 as b64
        with open(body_path := body["path"], "rb") as f:
            init_b64 = b64.b64encode(f.read()).decode()
        code, body = post(dict(payload, prompt="a fish",
                               init_video_base64=init_b64, init_weight=0.4,
                               remove_watermark=True))
        assert code == 200, body
        assert body["num_frames"] == 4

        # validation errors surface as 400s
        code, body = post(dict(payload, prompt=""))
        assert code == 400
        code, body = post(dict(payload, num_frames=6, window_size=4))
        assert code == 400 and "divide" in body["error"]
        code, body = post(dict(payload, bogus_field=1))
        assert code == 400 and "bogus_field" in body["error"]
    finally:
        server.shutdown()
        thread.join(timeout=10)
