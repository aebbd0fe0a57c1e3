"""Fusion models evaluated on country=all test split
(reference scripts/all_countries.py:21-28)."""

import sys

import pandas as pd

from _common import compose
from predict import get_predictor

EXPERIMENTS = ["p2p_fusion", "hisup_fusion", "ffl_fusion"]


def predict_and_evaluate(extra_overrides):
    from pixelspointspolygons_tpu.eval import Evaluator

    rows = []
    for exp in EXPERIMENTS:
        overrides = [
            f"experiment={exp}",
            "experiment.dataset.country=all",
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
            print(f"[skip] {exp}: {e}")
            continue
        rows.append({"experiment": exp, **results})
    return pd.DataFrame(rows)


def main() -> None:
    df = predict_and_evaluate(sys.argv[1:])
    print(df.to_string())
    df.to_csv("all_countries.csv", index=False)


if __name__ == "__main__":
    main()
