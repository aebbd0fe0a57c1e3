"""Time predict_dataset end-to-end (double-buffered decode -> host assembly)
with trained weights and warm compile: runs the full pipeline twice in one
process and reports the SECOND pass (first pass pays the one-time remote jit
compile, which in-process caching then absorbs — the production regime for
any multi-tile job).  VERDICT r3 weak #4: measure the decode->predict gap.

Usage: python scripts/measure_predict_e2e.py experiment=p2p_lidar \
         dataset=synthetic run_type=release experiment.name=p2p_lidar_xl \
         checkpoint=best_val_iou [evaluation.batch_size=32] [...]
"""

import json
import time

from _common import compose_from_argv


def main() -> None:
    cfg = compose_from_argv()
    from predict import get_predictor  # scripts/predict.py dispatch

    predictor = get_predictor(cfg)
    split = cfg.evaluation.split
    t0 = time.time()
    predictor.predict_dataset(split)
    cold = time.time() - t0
    times = []
    for _ in range(3):
        t0 = time.time()
        predictor.predict_dataset(split)
        times.append(time.time() - t0)
    n = int(cfg.experiment.dataset.get(f"num_{split}") or 0)
    if not n:
        # num_{split} only exists on the synthetic dataset config; real
        # datasets (p3/inria) report the actual tile count of the split
        from pixelspointspolygons_tpu.data.dataset import P3Dataset

        n = len(P3Dataset(cfg, split, eval_mode=True))
    warm = sorted(times)[len(times) // 2]
    print(json.dumps({
        "experiment": str(cfg.experiment.name),
        "split": split,
        "tiles": n,
        "cold_s": round(cold, 2),
        "warm_s_median": round(warm, 2),
        "warm_tiles_per_s": round(n / warm, 2) if n else None,
        "spread_pct": round(100 * (max(times) - min(times)) / warm, 1),
        "batch_size": cfg.evaluation.get("batch_size"),
        "checkpoint": str(cfg.get("checkpoint") or ""),
    }))


if __name__ == "__main__":
    main()
