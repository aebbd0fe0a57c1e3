#!/usr/bin/env python
"""One-time repair of pre-existing synthetic datasets whose COCO indices
carried a self-inconsistent lidar georeference.

Older `write_synthetic_dataset` stamped `top_left=[0, size]` while saving the
lidar npz in PIXEL coords (y = row, downward).  The loader's reference-exact
world->pixel conversion (dataset.py `_lidar`, reference p3_coco.py:82-84)
then computed row = height - (y - size)/res, which clips EVERY point to
row==height — all lidar models trained on those packs saw points collapsed
onto a single row (no y signal at all).

New datasets are written in world coords with `top_left=[0, 0]` (see
synthetic.py).  For datasets already on disk we cannot cheaply rewrite tens
of thousands of npz files, so this script instead DROPS the `top_left` /
`res_x` keys from the annotation JSONs: the loader then uses the npz pixel
coords verbatim, which is exactly what the generator produced.

It also deletes every device-cache pack that baked lidar through the broken
conversion (`*_l.npz` / `*_il.npz`); they are rebuilt lazily on next use.
"""
import glob
import json
import os
import sys

ROOT = sys.argv[1] if len(sys.argv) > 1 else "data/synthetic"

fixed, caches = 0, 0
for ann in sorted(glob.glob(os.path.join(ROOT, "*", "annotations_*.json"))):
    with open(ann) as f:
        coco = json.load(f)
    dirty = False
    for img in coco.get("images", []):
        # only legacy pixel-coord datasets carry the bad [0, size] stamp
        tl = img.get("top_left")
        if tl is not None and tuple(tl) == (0.0, float(img["height"])):
            img.pop("top_left", None)
            img.pop("res_x", None)
            dirty = True
    if dirty:
        with open(ann, "w") as f:
            json.dump(coco, f)
        fixed += 1
        print(f"repaired {ann}")

for pat in ("*_l.npz", "*_il.npz"):
    for pack in sorted(glob.glob(os.path.join(ROOT, "*", pat))):
        os.remove(pack)
        caches += 1
        print(f"deleted stale lidar cache pack {pack}")

print(f"done: {fixed} annotation files repaired, {caches} cache packs deleted")
