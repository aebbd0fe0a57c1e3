"""Single-tile demo prediction (reference scripts/predict_demo.py:9-53).

Usage: python scripts/predict_demo.py experiment=p2p_image checkpoint=latest \
       +image_file=/path/tile.tif [+lidar_file=/path/tile.las]
Writes prediction_<model>_<modality>.png.
"""

from _common import compose_from_argv
from predict import get_predictor


def main() -> None:
    cfg = compose_from_argv()
    predictor = get_predictor(cfg)
    enc = cfg.experiment.encoder
    modality = (
        "fusion"
        if enc.use_images and enc.use_lidar
        else ("image" if enc.use_images else "lidar")
    )
    out_file = f"prediction_{cfg.experiment.model.name}_{modality}.png"
    polys = predictor.predict_file(
        image_file=cfg.get("image_file"),
        lidar_file=cfg.get("lidar_file"),
        out_file=out_file,
    )
    print(f"predicted {len(polys)} polygons → {out_file}")


if __name__ == "__main__":
    main()
