"""Shared script bootstrap: sys.path setup + CLI override parsing.

The scripts keep the reference's hydra-style CLI surface
(`python scripts/train.py experiment=p2p_fusion checkpoint=latest
+image_file=...`); overrides go straight to the config engine's compose().
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# the axon TPU sitecustomize force-registers jax_platforms=axon; honor an
# explicit JAX_PLATFORMS env (e.g. CPU smoke runs)
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])


def _maybe_launch_and_init() -> None:
    """Multi-process launch for every entry point — the torchrun/`setup_ddp`
    equivalent (reference misc/shared_utils.py:205-230 wires DDP init into
    every script the same way).

    Two modes:
    - `P3_LAUNCH=N python scripts/train.py ...` — this process becomes the
      launcher: it re-execs the identical command N times with the
      coordinator env wired (single-host convenience, e.g. N CPU workers or
      one process per local accelerator), waits, and exits with the combined
      status.
    - Externally-launched fleets (SLURM / GKE / one command per host) set
      `P3_NUM_PROCESSES`, `P3_PROCESS_ID`, and `P3_COORDINATOR=<host:port>`
      per process; each entry point then calls `jax.distributed.initialize`
      before any device is touched, and the trainers' mesh spans all hosts.

    Rank responsibilities downstream: checkpoint writes and run logging are
    process-0-only (utils/checkpoint.py, utils/experiment_log.py); loaders
    iterate disjoint shards (data/loader.py); val predictions merge via
    all_gather_objects so every rank reaches identical best-metric decisions.
    """
    import subprocess

    n_launch = int(os.environ.pop("P3_LAUNCH", "0") or 0)
    if n_launch > 1:
        port = 21000 + os.getpid() % 20000
        procs = []
        for i in range(n_launch):
            env = dict(
                os.environ,
                P3_NUM_PROCESSES=str(n_launch),
                P3_PROCESS_ID=str(i),
                P3_COORDINATOR=f"127.0.0.1:{port}",
            )
            procs.append(subprocess.Popen([sys.executable] + sys.argv, env=env))
        rc = 0
        for p in procs:
            rc |= p.wait()
        sys.exit(rc)
    n = int(os.environ.get("P3_NUM_PROCESSES", "1") or 1)
    if n > 1:
        jax.distributed.initialize(
            coordinator_address=os.environ.get("P3_COORDINATOR", "127.0.0.1:21234"),
            num_processes=n,
            process_id=int(os.environ.get("P3_PROCESS_ID", "0")),
        )


_maybe_launch_and_init()

from pixelspointspolygons_tpu.config import compose  # noqa: E402


def compose_from_argv(defaults: list[str] | None = None):
    """Compose from CLI overrides; `defaults` are prepended so explicit CLI
    arguments win."""
    return compose(list(defaults or []) + sys.argv[1:])
