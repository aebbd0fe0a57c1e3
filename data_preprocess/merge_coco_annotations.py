"""Merge several COCO annotation files into one, remapping image/annotation
ids with running offsets (capability parity with reference
data_preprocess/merge_coco_annotations.py:15-58).

    python data_preprocess/merge_coco_annotations.py out.json in1.json in2.json ...
"""

from __future__ import annotations

import argparse
import json


def merge_coco_annotations(input_files: list[str], output_file: str | None = None) -> dict:
    merged: dict = {"images": [], "annotations": [], "categories": []}
    cat_ids: set | None = None
    img_offset = ann_offset = 0
    for path in input_files:
        with open(path) as f:
            data = json.load(f)
        cats = data.get("categories", [])
        if cat_ids is None:
            merged["categories"] = cats
            cat_ids = {c["id"] for c in cats}
        elif {c["id"] for c in cats} != cat_ids:
            raise ValueError(f"category ids in {path} don't match the others")
        id_map = {}
        for img in data.get("images", []):
            new_id = img["id"] + img_offset
            id_map[img["id"]] = new_id
            merged["images"].append({**img, "id": new_id})
        for ann in data.get("annotations", []):
            merged["annotations"].append(
                {**ann, "id": ann["id"] + ann_offset, "image_id": id_map[ann["image_id"]]}
            )
        if merged["images"]:
            img_offset = max(i["id"] for i in merged["images"]) + 1
        if merged["annotations"]:
            ann_offset = max(a["id"] for a in merged["annotations"]) + 1
    if output_file:
        with open(output_file, "w") as f:
            json.dump(merged, f)
        print(f"merged {len(input_files)} files → {output_file} "
              f"({len(merged['images'])} images, {len(merged['annotations'])} annotations)")
    return merged


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("output")
    ap.add_argument("inputs", nargs="+")
    a = ap.parse_args()
    merge_coco_annotations(a.inputs, a.output)


if __name__ == "__main__":
    main()
