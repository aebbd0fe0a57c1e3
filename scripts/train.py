"""Train a model (reference scripts/train.py:7-22: dispatch on
cfg.experiment.model.name).

Usage: python scripts/train.py experiment=p2p_image run_type=debug [...]
"""

from _common import compose_from_argv


def main() -> None:
    cfg = compose_from_argv()
    name = cfg.experiment.model.name
    if name == "pix2poly":
        from pixelspointspolygons_tpu.train.trainer_pix2poly import Pix2PolyTrainer

        trainer = Pix2PolyTrainer(cfg)
    elif name == "hisup":
        from pixelspointspolygons_tpu.train.trainer_hisup import HiSupTrainer

        trainer = HiSupTrainer(cfg)
    elif name == "ffl":
        from pixelspointspolygons_tpu.train.trainer_ffl import FFLTrainer

        trainer = FFLTrainer(cfg)
    else:
        raise NotImplementedError(f"model {name!r}")
    trainer.train()


if __name__ == "__main__":
    main()
