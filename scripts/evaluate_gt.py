"""GT self-evaluation sanity harness (reference scripts/evaluate_gt.py +
config/evaluation/gt_eval.yaml): feed the ground-truth annotations back
through the whole metric battery as if they were predictions. A healthy
metric stack must report AP=AP50=1, IoU=C-IoU=1, POLIS=Chamfer=Hausdorff=0,
MTA=0 — anything else is a bug in the metrics, not the model.

Usage:
    python scripts/evaluate_gt.py experiment=debug dataset=synthetic evaluation=gt_eval
"""

import json

from _common import compose_from_argv


def gt_as_predictions(ann_file: str) -> list[dict]:
    with open(ann_file) as f:
        gt = json.load(f)
    preds = []
    for ann in gt.get("annotations", []):
        preds.append(
            {
                "image_id": ann["image_id"],
                "category_id": ann.get("category_id", 100),
                "segmentation": ann["segmentation"],
                "bbox": ann.get("bbox"),
                "area": ann.get("area"),
                "score": 1.0,
            }
        )
    return preds


def main() -> None:
    cfg = compose_from_argv(["evaluation=gt_eval"])
    from pixelspointspolygons_tpu.eval import Evaluator

    split = cfg.evaluation.split
    ann_file = cfg.experiment.dataset.annotations[split]

    evaluator = Evaluator(cfg)
    evaluator.load_gt(ann_file)
    evaluator.coco_dt = evaluator.coco_gt.load_res(gt_as_predictions(ann_file))
    results = evaluator.evaluate()
    evaluator.to_csv(results)

    print({k: (round(v, 4) if isinstance(v, float) else v) for k, v in results.items()})
    problems = []
    for k, want, tol in (
        ("AP", 1.0, 1e-6),
        ("AP50", 1.0, 1e-6),
        ("IoU", 1.0, 1e-6),
        ("C-IoU", 1.0, 1e-6),
        ("polis", 0.0, 1e-6),
        ("chamfer", 0.0, 1e-6),
        ("hausdorff", 0.0, 1e-6),
        ("mta", 0.0, 1e-6),
    ):
        if k in results and abs(results[k] - want) > tol:
            problems.append(f"{k}={results[k]:.6f} (want {want})")
    if problems:
        raise SystemExit("GT self-eval NOT perfect: " + ", ".join(problems))
    print("GT self-eval perfect ✓")


if __name__ == "__main__":
    main()
