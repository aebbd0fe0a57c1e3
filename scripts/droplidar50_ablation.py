"""LiDAR-dropout robustness ablation (reference scripts/droplidar50_ablation.py):
fusion model trained with lidar_dropout=0.5 evaluated with and without lidar."""

import sys

import pandas as pd

from _common import compose
from predict import get_predictor

VARIANTS = [
    ("with_lidar", []),
    ("no_lidar", ["+drop_all_lidar=true"]),
]


def main() -> None:
    from pixelspointspolygons_tpu.eval import Evaluator

    rows = []
    for name, extra in VARIANTS:
        overrides = [
            "experiment=p2p_fusion",
            "experiment.lidar_dropout=0.5",
            "evaluation=test",
            "checkpoint=best_val_iou",
        ] + extra + sys.argv[1:]
        cfg = compose(overrides)
        try:
            predictor = get_predictor(cfg)
            pred_file = predictor.predict_dataset(cfg.evaluation.split)
            ev = Evaluator(cfg)
            ev.load_gt()
            ev.load_predictions(pred_file)
            rows.append({"variant": name, **ev.evaluate()})
        except FileNotFoundError as e:
            print(f"[skip] {name}: {e}")
    df = pd.DataFrame(rows)
    print(df.to_string())
    df.to_csv("droplidar50_ablation.csv", index=False)


if __name__ == "__main__":
    main()
