"""True multi-process (simulated multi-host) engine run.

Everything else in the suite runs jax.process_count() == 1 with 8 virtual
devices in ONE process; this spawns TWO OS processes of 4 devices each
joined through `jax.distributed` (Gloo collectives over localhost), i.e.
the real DCN code path: env-var cluster bring-up
(engine.maybe_init_distributed), broadcast run directory
(engine.create_output_folders), per-host DataLoader shards,
`make_array_from_process_local_data` batch assembly, and process-0-gated
artifact writes.  Reference analog: torch.distributed NCCL launch
(reference train.py:518-523) + DistributedSampler sharding.
"""

import json
import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

_WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "mp_worker.py")


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_engine_run(tiny_pipeline_dir, tiny_video, tmp_path):
    cfg = dict(
        pretrained_model_path=str(tiny_pipeline_dir),
        output_dir=str(tmp_path / "out"),
        dataset_types=["single_video"],
        train_data=dict(
            single_video_path=str(tiny_video),
            single_video_prompt="a test video",
            n_sample_frames=4,
            width=32, height=32,
            fps=8,
        ),
        validation_data=dict(sample_preview=False),
        train_batch_size=1,       # x dp=8 -> global 8, 4 rows per host
        max_train_steps=3,
        learning_rate=1e-4,
        trainable_modules=["attn1", "attn2"],
        mixed_precision=None,
        seed=7,
        checkpointing_steps=1000,
        validation_steps=1000,
        gradient_checkpointing=False,
    )
    cfg_path = str(tmp_path / "mp_config.json")
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)

    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update(
            JAX_COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
            JAX_NUM_PROCESSES="2",
            JAX_PROCESS_ID=str(pid),
        )
        # file-backed output, NOT PIPE: communicate() drains the workers
        # sequentially, so a chatty second worker can fill its 64 KiB pipe
        # and block inside a collective the first worker is waiting on --
        # a deadlock that only resolves at the 1500 s timeout
        out_f = open(tmp_path / f"worker{pid}.out", "w+")
        err_f = open(tmp_path / f"worker{pid}.err", "w+")
        procs.append((subprocess.Popen(
            [sys.executable, "-u", _WORKER, cfg_path],
            env=env, stdout=out_f, stderr=err_f, text=True),
            out_f, err_f))

    outs = []
    for p, out_f, err_f in procs:
        try:
            p.wait(timeout=1500)
        except subprocess.TimeoutExpired:
            for q, _, _ in procs:
                q.kill()
            raise
        out_f.seek(0)
        err_f.seek(0)
        out, err = out_f.read(), err_f.read()
        out_f.close()
        err_f.close()
        assert p.returncode == 0, f"worker failed:\n{out}\n{err[-4000:]}"
        outs.append((out, err))

    results = []
    for out, _ in outs:
        lines = [l for l in out.splitlines() if l.startswith("MPRESULT ")]
        assert lines, f"no MPRESULT line in worker stdout:\n{out}"
        results.append(json.loads(lines[-1][len("MPRESULT "):]))

    by_idx = {r["process_index"]: r for r in results}
    assert set(by_idx) == {0, 1}
    for r in results:
        assert r["process_count"] == 2
        assert r["device_count"] == 8
        assert r["local_device_count"] == 4
    # both hosts agreed on the broadcast run directory
    assert by_idx[0]["out_dir"] == by_idx[1]["out_dir"]
    # process-0-gated artifact writes: saved pipeline exists exactly once
    out_dir = by_idx[0]["out_dir"]
    assert os.path.exists(os.path.join(out_dir, "model_index.json"))
    assert os.path.exists(os.path.join(
        out_dir, "unet", "diffusion_pytorch_model.safetensors"))
    assert os.path.exists(os.path.join(out_dir, "config.yaml"))
