"""LiDAR-density ablation: FFL-lidar runs over max_num_points_per_voxel ∈
{4..512} (reference scripts/lidar_density_ablation.py:19-29)."""

import sys

import pandas as pd

from _common import compose
from predict import get_predictor

DENSITIES = [4, 8, 16, 32, 64, 128, 256, 512]


def predict_all(extra_overrides):
    from pixelspointspolygons_tpu.eval import Evaluator

    rows = []
    for mnv in DENSITIES:
        overrides = [
            f"experiment=lidar_density_ablation{mnv}",
            "evaluation=test",
            "checkpoint=best_val_iou",
        ] + extra_overrides
        cfg = compose(overrides)
        try:
            predictor = get_predictor(cfg)
            pred_file = predictor.predict_dataset(cfg.evaluation.split)
            evaluator = Evaluator(cfg)
            evaluator.load_gt()
            evaluator.load_predictions(pred_file)
            results = evaluator.evaluate()
        except FileNotFoundError as e:
            print(f"[skip] mnv={mnv}: {e}")
            continue
        rows.append({"max_num_points_per_voxel": mnv, **results})
    return pd.DataFrame(rows)


def main() -> None:
    df = predict_all(sys.argv[1:])
    print(df.to_string())
    df.to_csv("lidar_density_ablation.csv", index=False)


if __name__ == "__main__":
    main()
