"""Collect best checkpoints of the experiment grid into one directory tree
(reference scripts/gather_pretrained_models.py)."""

import os
import shutil
import sys

from _common import compose

EXPERIMENTS = [
    "p2p_image", "p2p_lidar", "p2p_fusion",
    "hisup_image", "hisup_lidar", "hisup_fusion",
    "ffl_image", "ffl_lidar", "ffl_fusion",
]


def main() -> None:
    out_root = "gathered_pretrained"
    for exp in EXPERIMENTS:
        cfg = compose([f"experiment={exp}"] + sys.argv[1:])
        src = os.path.join(cfg.output_dir, "checkpoints", "best_val_iou")
        if not os.path.isdir(src):
            print(f"[skip] {exp}: no best_val_iou checkpoint")
            continue
        dst = os.path.join(out_root, exp, "best_val_iou")
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        shutil.copytree(src, dst, dirs_exist_ok=True)
        print(f"gathered {exp} → {dst}")


if __name__ == "__main__":
    main()
