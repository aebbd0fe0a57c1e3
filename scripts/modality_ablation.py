"""Modality ablation: predict + evaluate the 3 models × 3 modalities grid and
collect a DataFrame (reference scripts/modality_ablation.py:22-52).

Usage: python scripts/modality_ablation.py [evaluation=test] [run_type=debug] [...]
"""

import sys

import pandas as pd

from _common import compose
from predict import get_predictor

EXPERIMENTS = [
    "p2p_image",
    "p2p_lidar",
    "p2p_fusion",
    "hisup_image",
    "hisup_lidar",
    "hisup_fusion",
    "ffl_image",
    "ffl_lidar",
    "ffl_fusion",
]


def predict_all(extra_overrides):
    from pixelspointspolygons_tpu.eval import Evaluator

    rows = []
    for exp in EXPERIMENTS:
        overrides = [f"experiment={exp}", "evaluation=test", "checkpoint=best_val_iou"]
        overrides += extra_overrides
        cfg = compose(overrides)
        try:
            predictor = get_predictor(cfg)
            pred_file = predictor.predict_dataset(cfg.evaluation.split)
            evaluator = Evaluator(cfg)
            evaluator.load_gt()
            evaluator.load_predictions(pred_file)
            results = evaluator.evaluate()
        except FileNotFoundError as e:
            print(f"[skip] {exp}: {e}")
            continue
        rows.append({"experiment": exp, **results})
    return pd.DataFrame(rows)


def main() -> None:
    df = predict_all(sys.argv[1:])
    print(df.to_string())
    df.to_csv("modality_ablation.csv", index=False)


if __name__ == "__main__":
    main()
