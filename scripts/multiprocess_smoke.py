"""True multi-process validation (VERDICT r2 missing #6): run N real python
processes under `jax.distributed`, each owning its own device(s), and exercise
the full distributed surface the single-process tests can only simulate:

- global 1-D data mesh spanning both processes' devices,
- per-process disjoint loader sharding (data/loader.py:52-89 — the
  DistributedSampler equivalent),
- a jitted sharded train step where each process contributes only its local
  batch shard (shard_batch's make_array_from_process_local_data path),
- cross-process `all_gather_objects` of COCO prediction lists
  (the reference's dist.all_gather_object, trainer_pix2poly.py:419-426).

Launch (one line, CPU backend, Gloo collectives):

    python scripts/multiprocess_smoke.py --launch [N]

which spawns N (default 2) copies of itself:

    JAX_PLATFORMS=cpu python scripts/multiprocess_smoke.py <pid> <N> <port>

Prints "MULTIPROC OK rank=i" from every rank on success. A pytest wrapper
(tests/test_multiprocess.py) runs the launcher and asserts both ranks pass.
"""

from __future__ import annotations

import os
import subprocess
import sys


def launch(n: int = 2, port: int | None = None) -> int:
    if port is None:
        port = 20000 + os.getpid() % 20000  # avoid clashes between concurrent runs
    env = dict(
        os.environ,
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=2",
    )
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), str(i), str(n), str(port)],
            env=env,
        )
        for i in range(n)
    ]
    rc = 0
    for p in procs:
        rc |= p.wait()
    return rc


def worker(pid: int, nproc: int, port: int) -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}", num_processes=nproc, process_id=pid
    )
    assert jax.process_count() == nproc

    import numpy as np

    import __graft_entry__ as g
    from pixelspointspolygons_tpu.parallel import (
        all_gather_objects,
        make_mesh,
        replicate,
        shard_batch,
    )
    from pixelspointspolygons_tpu.train import (
        create_train_state,
        linear_warmup_decay,
        make_optimizer,
        make_train_step,
    )
    from pixelspointspolygons_tpu.data.loader import Loader

    mesh = make_mesh()  # global: nproc × local devices
    n_global = int(np.prod(mesh.devices.shape))

    # --- per-process disjoint loader shard (DistributedSampler semantics) ---
    class _FakeDS:
        def __len__(self):
            return 10

    loader = Loader(_FakeDS(), batch_size=2, shuffle=True, seed=0)
    assert loader.process_index == pid and loader.process_count == nproc
    idxs = loader._order()
    covers = all_gather_objects(sorted(map(int, idxs)))
    if pid == 0:
        flat = sorted(i for chunk in covers for i in chunk)
        assert set(flat) == set(range(10)), f"shards don't cover dataset: {flat}"

    # --- sharded train step: each process feeds its local slice ------------
    import jax.numpy as jnp

    model = g._tiny_cfg_model()
    B_local = 2 * jax.local_device_count()
    rng = np.random.RandomState(pid)
    local_batch = {
        "images": rng.rand(B_local, 16, 16, 3).astype(np.float32),
        "lidar": rng.uniform(0, 16, (B_local, 64, 3)).astype(np.float32),
        "lidar_mask": np.ones((B_local, 64), bool),
        "y": np.full((B_local, model.max_len), model.pad_idx, np.int32),
        "y_perm": np.eye(model.max_num_vertices, dtype=np.float32)[None].repeat(B_local, 0),
    }
    local_batch["y"][:, 0] = 32
    local_batch["y"][:, 1] = 33

    variables = jax.device_get(
        model.init(
            jax.random.PRNGKey(0),
            {k: jnp.asarray(v[:1]) for k, v in local_batch.items() if k != "y" and k != "y_perm"},
            jnp.asarray(local_batch["y"][:1, :-1]),
        )
    )
    tx = make_optimizer("adamw", linear_warmup_decay(3e-4, 100))
    state = replicate(create_train_state(model, variables, tx), mesh)
    step = make_train_step(model, vertex_w=1.0, perm_w=10.0, pad_idx=model.pad_idx)
    sharded = shard_batch(local_batch, mesh)
    assert sharded["images"].shape[0] == B_local * nproc, sharded["images"].shape
    from jax.sharding import NamedSharding, PartitionSpec as P

    key = jax.device_put(jax.random.PRNGKey(0), NamedSharding(mesh, P()))
    state, metrics = step(state, sharded, key)
    loss = float(np.asarray(jax.device_get(metrics["loss"])))
    assert np.isfinite(loss)

    # --- cross-process COCO gather -----------------------------------------
    preds = [{"image_id": pid * 100 + k, "score": 1.0} for k in range(pid + 1)]
    gathered = all_gather_objects(preds)
    assert len(gathered) == nproc
    assert [len(c) for c in gathered] == list(range(1, nproc + 1))

    # one atomic write: both ranks share the parent's stdout pipe, and two
    # buffered print()s can interleave mid-line, breaking the test's parse
    os.write(1, f"MULTIPROC OK rank={pid} devices={n_global} loss={loss:.4f}\n".encode())


if __name__ == "__main__":
    if "--launch" in sys.argv:
        i = sys.argv.index("--launch")
        n = int(sys.argv[i + 1]) if len(sys.argv) > i + 1 else 2
        raise SystemExit(launch(n))
    worker(int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]))
