"""Evaluate an existing prediction json (reference scripts/evaluate.py:11-35).

Usage: python scripts/evaluate.py experiment=p2p_image evaluation=test checkpoint=best_val_iou
"""

from _common import compose_from_argv


def main() -> None:
    cfg = compose_from_argv()
    from pixelspointspolygons_tpu.eval import Evaluator

    evaluator = Evaluator(cfg)
    evaluator.load_gt()
    evaluator.load_predictions()
    results = evaluator.evaluate()
    evaluator.to_csv(results)
    print({k: (round(v, 4) if isinstance(v, float) else v) for k, v in results.items()})


if __name__ == "__main__":
    main()
