"""Same-chip reference-algorithm baselines (VERDICT r3 missing #4 / next #5).

bench.py measures the Pix2Poly decode algorithm against a reference-shaped
comparator; this script does the equivalent for FFL and HiSup so every model
family has a MEASURED same-chip algorithmic speedup instead of an argued one:

- FFL: the reference polygonizes with a per-ring zero-padded TensorPoly and
  runs one 500-step gradient loop per image, images sequential
  (/root/reference/pixelspointspolygons/predict/predictor_ffl.py:61-63,
  ffl_submodules/polygonize_acm.py:162-220).  The probe reproduces that shape
  on this chip with the SAME jitted ACM kernel: each ring padded to a fixed
  1024-vertex slot, ring-count padded to a multiple of 16 (bounds jit shapes;
  the torch reference pays no compile but also gets no fusion), one
  `acm_optimize` call per image.  The production path instead flat-packs the
  whole batch's rings into one {4k,16k,64k}-bucketed array and optimizes them
  all in a single call (predict/ffl_polygonize.py:106-152).

- HiSup: the reference polygonizes per image on the host — mask contours,
  per-contour junction snapping, a python loop over images
  (/root/reference/pixelspointspolygons/models/hisup/model_hisup.py 'test'
  branch + misc polygon utils).  The probe runs the SAME jitted NMS/top-k
  head per image at batch 1 sequentially + the host tracing per image; the
  production path batches the device half across the mini-batch
  (models/hisup/model.py:253-288).

Both probes produce the same polygons as the production path (same kernels,
same post-processing) — only the batching/packing strategy differs, which is
exactly the algorithmic delta being measured.

Usage (TPU):  python scripts/bench_baselines.py
  env: BENCH_BATCH (default 16), BENCH_REPEATS (default 5),
       BENCH_MODELS=ffl,hisup, BENCH_ACM_STEPS (default from config)
Writes/merges `vs_baseline` rows into BENCH_TABLE.json under
<family>.reference_probe and prints a summary table.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

from _common import compose_from_argv  # noqa: F401 (sys.path side effect)

import numpy as np

B = int(os.environ.get("BENCH_BATCH", 16))
REPEATS = int(os.environ.get("BENCH_REPEATS", 5))
DTYPE = os.environ.get("BENCH_DTYPE", "bfloat16")

MODELS = os.environ.get("BENCH_MODELS", "ffl,hisup").split(",")


def trimmed_stats(samples: list[float]) -> tuple[float, float]:
    """Median + spread over the middle-3-of-5 (bench.py's tunnel-noise-robust
    statistic): a single tunnel hiccup repeat must not dominate the spread."""
    s = sorted(samples)
    if len(s) >= 5:
        s = s[1:-1]
    med = statistics.median(s)
    spread = 100.0 * (max(s) - min(s)) / med if med else 0.0
    return med, spread


def timed(fn, repeats=REPEATS, iters=2) -> tuple[float, float]:
    fn()  # warmup/compile
    reps = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(iters):
            fn()
        reps.append((time.perf_counter() - t0) / iters)
    return trimmed_stats(reps)


def _cfg(experiment: str):
    from pixelspointspolygons_tpu.config import compose
    from pixelspointspolygons_tpu.data.synthetic import ensure_synthetic_dataset

    cfg = compose(
        [
            f"experiment={experiment}",
            "dataset=synthetic",
            "run_type=debug",
            f"run_type.batch_size={B}",
            f"run_type.train_subset={B}",
            f"run_type.val_subset={B}",
            "run_type.log_to_wandb=false",
            f"host.compute_dtype={DTYPE}",
        ]
        + [a for a in sys.argv[1:] if "=" in a]
    )
    ensure_synthetic_dataset(cfg)
    return cfg


# --------------------------------------------------------------------------
# FFL: production batched-bucketized vs reference per-image per-ring-padded
# --------------------------------------------------------------------------

RING_SLOT = 1024  # the reference's per-ring pad (tensorpoly pads to max ring len;
# round-2's fixed pad used the same 1024 worst case)
RING_COUNT_PAD = 16


def _pack_per_ring(rings: list[tuple[np.ndarray, bool]]):
    """Reference TensorPoly shape: every ring in its own fixed slot."""
    n_rings = max(len(rings), 1)
    R = ((n_rings + RING_COUNT_PAD - 1) // RING_COUNT_PAD) * RING_COUNT_PAD
    N = R * RING_SLOT
    pos = np.zeros((N, 2), np.float32)
    vmask = np.zeros((N,), bool)
    next_idx = np.arange(N, dtype=np.int32)
    point_batch = np.zeros((N,), np.int32)  # single image
    pinned = np.zeros((N,), bool)
    for r, (ring, closed) in enumerate(rings):
        ring = np.asarray(ring[:RING_SLOT], np.float32)
        n = len(ring)
        if n < (3 if closed else 2):
            continue
        s = r * RING_SLOT
        pos[s : s + n] = ring
        vmask[s : s + n] = True
        if closed:
            next_idx[s : s + n] = s + (np.arange(n) + 1) % n
        else:
            next_idx[s : s + n - 1] = s + np.arange(1, n)
            pinned[s] = pinned[s + n - 1] = True
    return pos, vmask, next_idx, point_batch, pinned


def bench_ffl() -> dict:
    import jax.numpy as jnp

    from pixelspointspolygons_tpu.predict.ffl_polygonize import (
        Polygonizer,
        acm_optimize,
        extract_contours_flagged,
    )
    from pixelspointspolygons_tpu.train.trainer_ffl import FFLTrainer

    cfg = _cfg("ffl_image")
    trainer = FFLTrainer(cfg)
    trainer.setup()
    trainer.maybe_resume()  # honors init_weights_from=<ckpt> for trained-weight probes
    batch = next(iter(trainer.val_loader))
    variables = {"params": trainer.state.params}
    if trainer.state.batch_stats is not None:
        variables["batch_stats"] = trainer.state.batch_stats

    # forward through the production predictor path (channel-first host
    # arrays, f16 tunnel shipping — predictor_ffl.py:37-59)
    from pixelspointspolygons_tpu.parallel import shard_batch

    inputs = {k: batch[k] for k in ("images", "lidar", "lidar_mask") if k in batch}
    inputs = shard_batch(inputs, trainer._predictor.mesh)
    out = trainer._predictor._forward(variables, inputs)
    seg = np.asarray(out["seg"], np.float32)  # (B, Cs, H, W)
    crossfield = np.asarray(out["crossfield"], np.float32)  # (B, 4, H, W)

    poly_cfg = cfg.experiment.polygonization
    steps = int(os.environ.get("BENCH_ACM_STEPS", poly_cfg.acm_method.steps))
    polygonizer = Polygonizer(
        poly_cfg, seg_threshold=float(cfg.experiment.model.eval.seg_threshold)
    )

    # --- production: whole batch, flat bucketized, one optimize call --------
    def production():
        polygonizer(seg, crossfield)

    prod_t, prod_spread = timed(production, iters=1)

    # --- reference shape: per image, per-ring slots, sequential -------------
    init_level = float(poly_cfg.common_params.init_data_level)
    contours = [extract_contours_flagged(seg[b, 0], init_level) for b in range(len(seg))]
    packs = [_pack_per_ring(c) for c in contours]
    inds = [jnp.asarray(seg[b : b + 1, 0]) for b in range(len(seg))]
    cf = [jnp.asarray(crossfield[b : b + 1]) for b in range(len(seg))]

    def reference_shape():
        for (pos, vmask, nxt, pb, pin), ind, c in zip(packs, inds, cf):
            out_pos = acm_optimize(
                jnp.asarray(pos),
                jnp.asarray(vmask),
                jnp.asarray(nxt),
                jnp.asarray(pb),
                ind,
                c,
                jnp.asarray(pin),
                steps=steps,
            )
            np.asarray(out_pos)  # host sync per image, like the reference

    ref_t, ref_spread = timed(reference_shape, iters=1)
    return {
        "tiles": B,
        "acm_steps": steps,
        "production_tiles_per_s": B / prod_t,
        "production_spread_pct": round(prod_spread, 1),
        "reference_shape_tiles_per_s": B / ref_t,
        "reference_spread_pct": round(ref_spread, 1),
        "vs_baseline": ref_t / prod_t,
        "note": (
            "production = whole-batch flat bucketized ACM (one jit call); "
            "reference shape = per-image per-ring-1024-padded ACM, sequential "
            "(predictor_ffl.py:61-63, polygonize_acm.py:162-220); production "
            "number here includes host contour extraction + corner split, the "
            "probe times only the optimization loop — the ratio is therefore "
            "a LOWER bound on the algorithmic speedup"
        ),
    }


# --------------------------------------------------------------------------
# HiSup: production batched device head vs per-image sequential
# --------------------------------------------------------------------------


def bench_hisup() -> dict:
    import jax
    import jax.numpy as jnp

    from pixelspointspolygons_tpu.train.trainer_hisup import HiSupTrainer

    cfg = _cfg("hisup_image")
    trainer = HiSupTrainer(cfg)
    trainer.setup()
    trainer.maybe_resume()  # honors init_weights_from=<ckpt> for trained-weight probes
    batch = next(iter(trainer.val_loader))
    variables = {"params": trainer.state.params}
    if trainer.state.batch_stats is not None:
        variables["batch_stats"] = trainer.state.batch_stats

    predictor = trainer._predictor

    def production():
        predictor.predict_batch(variables, batch)

    prod_t, prod_spread = timed(production, iters=1)

    # reference shape: one image at a time through the SAME path (the
    # reference's test branch polygonizes per image in a python loop)
    singles = [
        {k: v[i : i + 1] for k, v in batch.items() if hasattr(v, "__getitem__")}
        for i in range(B)
    ]

    def reference_shape():
        for s in singles:
            predictor.predict_batch(variables, s, reference_mirror=True)

    ref_t, ref_spread = timed(reference_shape, iters=1)
    return {
        "tiles": B,
        "production_tiles_per_s": B / prod_t,
        "production_spread_pct": round(prod_spread, 1),
        "reference_shape_tiles_per_s": B / ref_t,
        "reference_spread_pct": round(ref_spread, 1),
        "vs_baseline": ref_t / prod_t,
        "note": (
            "production = mini-batched jitted NMS/top-k + bbox-cropped "
            "vectorized host tracing; reference shape = batch 1, images "
            "sequential, full-tile loop-per-point tracing mirroring "
            "models/hisup/polygon.py (output-identical — tests/test_hisup.py "
            "pins mirror == production)"
        ),
    }


def main() -> None:
    import jax

    results = {}
    for name in MODELS:
        name = name.strip()
        print(f"probing {name} ...", file=sys.stderr)
        try:
            results[name] = bench_ffl() if name == "ffl" else bench_hisup()
        except Exception as e:
            results[name] = {"error": f"{type(e).__name__}: {e}"}
            print(f"  {name} failed: {e}", file=sys.stderr)

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH_TABLE.json"
    )
    table = {}
    if os.path.isfile(path):
        with open(path) as f:
            table = json.load(f)
    allow_tiny = os.environ.get("BENCH_ALLOW_TINY") == "1"
    for name, row in results.items():
        # a probe from <8 tiles is not evidence (VERDICT r4 weak #1: a 2-tile
        # HiSup probe produced a 180× discrepancy vs the production row) —
        # refuse to publish it unless explicitly forced
        if "error" not in row and B < 8 and not allow_tiny:
            print(
                f"  NOT writing {name}.reference_probe: BENCH_BATCH={B} < 8 "
                "tiles (set BENCH_ALLOW_TINY=1 to force)",
                file=sys.stderr,
            )
            continue
        row = dict(row, tiles=B) if "error" not in row else row
        table.setdefault(name, {})["reference_probe"] = row
    with open(path, "w") as f:
        json.dump(table, f, indent=2)

    print("\n| family | production tiles/s | reference-shape tiles/s | vs_baseline |")
    print("|---|---|---|---|")
    for name, r in results.items():
        if "error" in r:
            print(f"| {name} | error: {r['error']} | | |")
        else:
            print(
                f"| {name} | {r['production_tiles_per_s']:.2f} | "
                f"{r['reference_shape_tiles_per_s']:.2f} | {r['vs_baseline']:.1f}x |"
            )
    print(f"\nmerged into {path}")


if __name__ == "__main__":
    main()
