"""Offline FFL GT preprocessing (reference data_preprocess/ffl/preprocess_ffl.py):
per-tile rasterized interior/edge/vertex + distances + sizes + angle field,
cached as .npz, plus per-split stats (class_freq).

The online dataset (pixelspointspolygons_tpu/data/dataset.py) computes the
same GT lazily with an on-disk cache; this script fills that cache ahead of
time with a process pool and writes the stats file — useful before long
training runs.

Usage: python data_preprocess/ffl/preprocess_ffl.py experiment=ffl_image [splits]
"""

import multiprocessing as mp
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

from pixelspointspolygons_tpu.config import compose  # noqa: E402
from pixelspointspolygons_tpu.data.dataset import P3Dataset  # noqa: E402
from pixelspointspolygons_tpu.data.synthetic import ensure_synthetic_dataset  # noqa: E402


def _process_one(args):
    cfg_overrides, split, idx = args
    cfg = compose(cfg_overrides)
    ds = P3Dataset(cfg, split)
    info = ds.coco.imgs[ds.tile_ids[idx]]
    gt = ds._ffl_gt(info)  # computes + caches
    interior_frac = float((gt["gt_polygons_image"][..., 0] > 0).mean())
    return interior_frac


def main() -> None:
    overrides = sys.argv[1:] or ["experiment=ffl_image"]
    if not any(o.startswith("model=") for o in overrides):
        overrides = overrides + ["model=ffl"]
    cfg = compose(overrides)
    ensure_synthetic_dataset(cfg)
    for split in ("train", "val", "test"):
        ds = P3Dataset(cfg, split)
        n = len(ds)
        args = [(overrides, split, i) for i in range(n)]
        with mp.Pool(min(8, os.cpu_count() or 1)) as pool:
            fracs = list(pool.imap_unordered(_process_one, args, chunksize=4))
        freq = float(np.mean(fracs)) if fracs else 0.1
        stats_path = cfg.experiment.dataset.ffl_stats[split]
        os.makedirs(os.path.dirname(stats_path), exist_ok=True)
        np.savez(stats_path, class_freq=np.array([1.0 - freq, freq], np.float32))
        print(f"{split}: cached FFL GT for {n} tiles, class_freq={freq:.4f}")


if __name__ == "__main__":
    main()
