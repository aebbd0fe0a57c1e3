"""Predict a split and immediately evaluate it, writing metrics CSV
(reference scripts/predict.py:9-46).

Usage: python scripts/predict.py experiment=p2p_image evaluation=test checkpoint=best_val_iou
"""

from _common import compose_from_argv


def get_predictor(cfg):
    name = cfg.experiment.model.name
    if name == "pix2poly":
        from pixelspointspolygons_tpu.predict import Pix2PolyPredictor

        return Pix2PolyPredictor(cfg)
    if name == "hisup":
        from pixelspointspolygons_tpu.predict.predictor_hisup import HiSupPredictor

        return HiSupPredictor(cfg)
    if name == "ffl":
        from pixelspointspolygons_tpu.predict.predictor_ffl import FFLPredictor

        return FFLPredictor(cfg)
    raise NotImplementedError(f"model {name!r}")


def main() -> None:
    cfg = compose_from_argv()
    predictor = get_predictor(cfg)
    pred_file = predictor.predict_dataset(cfg.evaluation.split)

    from pixelspointspolygons_tpu.eval import Evaluator

    evaluator = Evaluator(cfg)
    evaluator.load_gt()
    evaluator.load_predictions(pred_file)
    results = evaluator.evaluate()
    evaluator.to_csv(results)
    print({k: (round(v, 4) if isinstance(v, float) else v) for k, v in results.items()})

    from pixelspointspolygons_tpu.parallel import sync_processes

    sync_processes("p3_predict_end")


if __name__ == "__main__":
    main()
