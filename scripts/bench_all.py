"""Full performance table: {pix2poly, hisup, ffl} × {train step/s,
e2e predict tiles/s, MFU} on the current jax backend, with run-to-run spread.

This is the broadened perf harness VERDICT round 1 asked for (item 2):
`bench.py` keeps the one-JSON-line driver contract for the headline metric;
this script measures every model family end to end (forward + autoregressive
decode / junction polygonization / ACM polygonization) at production size and
estimates single-chip MFU from the XLA-compiled flop counts
(`fn.lower(...).compile().cost_analysis()`).

Usage (TPU):  python scripts/bench_all.py
        CPU:  JAX_PLATFORMS=cpu BENCH_BATCH=2 BENCH_SUBSET=4 python scripts/bench_all.py
Writes BENCH_TABLE.json at the repo root and prints a markdown table.

The reference's only perf metric is prediction wall-clock per image
(predict/predictor_pix2poly.py:52-54); train step/s and MFU have no reference
counterpart but are required TPU-utilization evidence.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

from _common import compose_from_argv  # noqa: F401 (sys.path side effect)

import numpy as np

# One compute-dtype policy across bench.py and bench_all.py: bf16 (the TPU
# production inference/training dtype; params stay f32). Override with
# BENCH_DTYPE=float32 to measure the f32 path — MFU is then computed against
# the f32 peak so utilization numbers stay self-consistent (VERDICT r2 #3).
DTYPE = os.environ.get("BENCH_DTYPE", "bfloat16")
# v5e (v5 lite) per-chip peaks; f32 runs the MXU at half rate.
PEAK_BY_DTYPE = {"bfloat16": 197e12, "float32": 98.5e12}
PEAK_FLOPS = (
    float(os.environ["PEAK_TFLOPS"]) * 1e12
    if os.environ.get("PEAK_TFLOPS")
    else PEAK_BY_DTYPE.get(DTYPE, 197e12)
)

B = int(os.environ.get("BENCH_BATCH", 16))
SUBSET = int(os.environ.get("BENCH_SUBSET", 32))
REPEATS = int(os.environ.get("BENCH_REPEATS", 5))
ITERS = int(os.environ.get("BENCH_ITERS", 10))
# comma list of batch sizes for the pix2poly decode scaling study ("" = skip)
P2P_BATCH_SCAN = os.environ.get("BENCH_P2P_BATCH_SCAN", "")

EXPERIMENTS = {
    "pix2poly": "p2p_image",
    "hisup": "hisup_image",
    "ffl": "ffl_image",
}
if os.environ.get("BENCH_MODELS"):
    sel = set(os.environ["BENCH_MODELS"].split(","))
    EXPERIMENTS = {k: v for k, v in EXPERIMENTS.items() if k in sel}


def _sync(tree) -> None:
    """Materialize one leaf — the only trustworthy sync on the axon tunnel."""
    import jax

    leaves = jax.tree_util.tree_leaves(tree)
    if leaves:
        np.asarray(leaves[0])


def timed(fn, repeats=REPEATS, iters=ITERS) -> tuple[float, float]:
    """Trimmed median seconds per call over `repeats` batches of `iters`.

    Spread is max-min over the middle-3-of-5 repeats (bench.py's statistic):
    the axon tunnel occasionally stalls a single repeat by 10-50% while the
    median is unaffected, so the untrimmed spread reported ±50% numbers that
    were pure transport noise (VERDICT r3 weak #3)."""
    fn()  # warmup/compile
    meds = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        for _ in range(iters):
            fn()
        meds.append((time.perf_counter() - t0) / iters)
    trimmed = sorted(meds)[1:-1] if len(meds) >= 5 else sorted(meds)
    med = statistics.median(trimmed)
    spread = 100.0 * (max(trimmed) - min(trimmed)) / med if med else 0.0
    return med, spread


def step_flops(jitted, *args) -> float | None:
    try:
        cost = jitted.lower(*args).compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        return float(cost.get("flops", 0.0)) or None
    except Exception:
        return None


def bench_family(name: str, experiment: str) -> dict:
    import jax

    from pixelspointspolygons_tpu.config import compose
    from pixelspointspolygons_tpu.data.synthetic import ensure_synthetic_dataset

    overrides = [
        f"experiment={experiment}",
        "dataset=synthetic",
        "run_type=debug",
        f"run_type.batch_size={B}",
        f"run_type.train_subset={max(SUBSET, B)}",
        f"run_type.val_subset={max(SUBSET, B)}",
        "run_type.log_to_wandb=false",
        f"host.compute_dtype={DTYPE}",
    ] + [a for a in sys.argv[1:] if "=" in a]
    cfg = compose(overrides)
    ensure_synthetic_dataset(cfg)

    if name == "pix2poly":
        from pixelspointspolygons_tpu.train.trainer_pix2poly import Pix2PolyTrainer

        trainer = Pix2PolyTrainer(cfg)
    elif name == "hisup":
        from pixelspointspolygons_tpu.train.trainer_hisup import HiSupTrainer

        trainer = HiSupTrainer(cfg)
    else:
        from pixelspointspolygons_tpu.train.trainer_ffl import FFLTrainer

        trainer = FFLTrainer(cfg)
    trainer.setup()

    from pixelspointspolygons_tpu.parallel.mesh import device_prefetch

    if name == "ffl":
        from pixelspointspolygons_tpu.train.trainer_ffl import FFL_BATCH_KEYS

        it = ({k: v for k, v in b.items() if k in FFL_BATCH_KEYS} for b in trainer.train_loader)
    else:
        it = iter(trainer.train_loader)
    batch = next(iter(device_prefetch(it, trainer.mesh)))

    # --- train step ---------------------------------------------------------
    rng = jax.random.PRNGKey(0)
    if name == "pix2poly":
        step_args = lambda: (trainer.state, batch, rng)
    elif name == "hisup":
        step_args = lambda: (trainer.state, batch)
    else:
        weights = trainer._epoch_weights(0)
        step_args = lambda: (trainer.state, batch, weights)

    flops = step_flops(trainer._train_step, *step_args())

    def one_step():
        trainer.state, metrics = trainer._train_step(*step_args())
        _sync(metrics)

    step_t, step_spread = timed(one_step)
    row = {
        "train_step_s": step_t,
        "train_steps_per_s": 1.0 / step_t,
        "train_tiles_per_s": B / step_t,
        "train_spread_pct": round(step_spread, 1),
    }
    if flops:
        row["train_step_tflops"] = flops / 1e12
        row["mfu_pct"] = round(100.0 * flops / step_t / PEAK_FLOPS, 2)

    # --- e2e prediction (forward + full polygonization) ---------------------
    variables = {"params": trainer.state.params}
    if trainer.state.batch_stats is not None:
        variables["batch_stats"] = trainer.state.batch_stats

    def one_predict():
        out = trainer._predictor.predict_batch(variables, batch)
        # predict_batch already materializes on host (returns python polygons)
        return out

    pred_t, pred_spread = timed(one_predict, repeats=REPEATS, iters=max(ITERS // 2, 1))
    row.update(
        {
            "predict_tiles_per_s": B / pred_t,
            "predict_s_per_image": pred_t / B,
            "predict_spread_pct": round(pred_spread, 1),
        }
    )
    ckpt = cfg.get("checkpoint")
    if ckpt:
        row["checkpoint"] = str(ckpt)  # trained weights (trainer.maybe_resume)

    # --- pix2poly decode batch-size scaling (latency-bound AR decode) -------
    if name == "pix2poly" and P2P_BATCH_SCAN:
        from pixelspointspolygons_tpu.models.pix2poly import greedy_generate

        tok = trainer.tokenizer
        model = trainer.model
        gen = jax.jit(
            lambda v, b: greedy_generate(
                model, v, b, bos_code=tok.BOS_code, generation_steps=tok.max_len - 1
            )
        )
        rng_np = np.random.RandomState(0)
        S = int(cfg.experiment.encoder.in_size)
        scan = {}
        for bsz in [int(x) for x in P2P_BATCH_SCAN.split(",")]:
            import jax.numpy as jnp

            bb = {"images": jnp.asarray(rng_np.rand(bsz, S, S, 3).astype(np.float32))}
            t, spread = timed(lambda: _sync(gen(variables, bb)[0]))
            scan[str(bsz)] = {
                "decode_s_per_batch": t,
                "decode_tiles_per_s": bsz / t,
                "spread_pct": round(spread, 1),
            }
        row["decode_batch_scan"] = scan
    return row


def main() -> None:
    import jax

    results = {
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "batch": B,
        "compute_dtype": DTYPE,
        "peak_tflops": PEAK_FLOPS / 1e12,
    }
    for name, experiment in EXPERIMENTS.items():
        print(f"benchmarking {name} ({experiment}) ...", file=sys.stderr)
        try:
            results[name] = bench_family(name, experiment)
        except Exception as e:
            results[name] = {"error": f"{type(e).__name__}: {e}"}
            print(f"  {name} failed: {e}", file=sys.stderr)

    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH_TABLE.json")
    if os.path.isfile(out):  # merge so per-family runs accumulate one table
        try:
            with open(out) as f:
                prev = json.load(f)
            if (
                prev.get("backend") == results["backend"]
                and prev.get("batch") == results["batch"]
                and prev.get("compute_dtype") == results["compute_dtype"]
            ):
                results = {**prev, **results}
        except Exception:
            pass
    with open(out, "w") as f:
        json.dump(results, f, indent=2)

    cols = ["train_tiles_per_s", "mfu_pct", "predict_tiles_per_s", "train_spread_pct", "predict_spread_pct"]
    print(f"\n| model | {' | '.join(cols)} |")
    print("|" + "---|" * (len(cols) + 1))
    for name in EXPERIMENTS:
        r = results.get(name, {})
        vals = [f"{r[c]:.2f}" if isinstance(r.get(c), float) else str(r.get(c, "—")) for c in cols]
        print(f"| {name} | {' | '.join(vals)} |")
    print(f"\nwrote {out}")


if __name__ == "__main__":
    main()
