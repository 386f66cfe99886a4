"""Subprocess worker for tests/test_multiprocess.py: one simulated host.

Each worker owns 4 virtual CPU devices and joins a 2-process
`jax.distributed` cluster through the engine's own `maybe_init_distributed`
env-var path (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
JAX_PROCESS_ID), then runs the full training engine -- the DCN analog of
the reference's NCCL process-group launch (reference train.py:518-523).

Not a test module; invoked as `python mp_worker.py <config.json>`.
"""

import json
import os
import sys

# each simulated host owns 4 of the 8 global devices
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# the axon sitecustomize stomps jax_platforms AFTER env vars are read
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def main():
    with open(sys.argv[1]) as f:
        cfg = json.load(f)
    from text_to_video_finetuning_tpu.training.engine import main as train
    out_dir = train(**cfg)
    # one machine-readable line for the parent test
    print("MPRESULT " + json.dumps({
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "device_count": jax.device_count(),
        "local_device_count": jax.local_device_count(),
        "out_dir": out_dir,
    }), flush=True)


if __name__ == "__main__":
    main()
