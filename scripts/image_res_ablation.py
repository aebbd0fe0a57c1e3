"""Image-resolution ablation: predict+evaluate FFL-image at 224 vs 512
(reference scripts/image_res_ablation.py)."""

import sys

import pandas as pd

from _common import compose
from predict import get_predictor

CONFIGS = [
    ("ffl_image", ["experiment.encoder.in_size=224"]),
    ("ffl_image", ["encoder=unetresnet101", "experiment.encoder.in_size=512"]),
]


def main() -> None:
    from pixelspointspolygons_tpu.eval import Evaluator

    rows = []
    for exp, extra in CONFIGS:
        overrides = [f"experiment={exp}", "evaluation=test", "checkpoint=best_val_iou"]
        overrides += extra + sys.argv[1:]
        cfg = compose(overrides)
        try:
            predictor = get_predictor(cfg)
            pred_file = predictor.predict_dataset(cfg.evaluation.split)
            ev = Evaluator(cfg)
            ev.load_gt()
            ev.load_predictions(pred_file)
            rows.append({"experiment": exp, "in_size": cfg.experiment.encoder.in_size, **ev.evaluate()})
        except FileNotFoundError as e:
            print(f"[skip] {exp}: {e}")
    df = pd.DataFrame(rows)
    print(df.to_string())
    df.to_csv("image_res_ablation.csv", index=False)


if __name__ == "__main__":
    main()
