"""DINOv2-encoder ablation for Pix2Poly (reference scripts/dino_v2_ablation.py):
vit (DINO/8) vs vit_dinov2 (DINOv2/14)."""

import sys

import pandas as pd

from _common import compose
from predict import get_predictor

ENCODERS = ["vit", "vit_dinov2"]


def main() -> None:
    from pixelspointspolygons_tpu.eval import Evaluator

    rows = []
    for enc in ENCODERS:
        overrides = [
            "experiment=p2p_image",
            f"encoder={enc}",
            "evaluation=test",
            "checkpoint=best_val_iou",
        ] + sys.argv[1:]
        cfg = compose(overrides)
        try:
            predictor = get_predictor(cfg)
            pred_file = predictor.predict_dataset(cfg.evaluation.split)
            ev = Evaluator(cfg)
            ev.load_gt()
            ev.load_predictions(pred_file)
            rows.append({"encoder": enc, **ev.evaluate()})
        except FileNotFoundError as e:
            print(f"[skip] {enc}: {e}")
    df = pd.DataFrame(rows)
    print(df.to_string())
    df.to_csv("dino_v2_ablation.csv", index=False)


if __name__ == "__main__":
    main()
