"""Harvest the trained (model x modality) grid's metrics CSVs into one
markdown table + a combined CSV snapshot (reference: the paper's Tab. 2
modality-ablation grid, produced by scripts/modality_ablation.py:22-35 +
eval CSVs; here the runs are the synthetic-xl proofs).

Usage: python scripts/collect_grid.py [--split val] [--out docs/results_round4]
"""

from __future__ import annotations

import argparse
import csv
import os

RUNS = [
    # (model-dir, run-name, model, modality, live train tiles, alt) — alt =
    # (csv template, its train tiles, its run label): a committed results CSV
    # used when the live run dir is gone (container restarts wipe outputs/),
    # carrying ITS OWN provenance so a fallback row is never mislabeled with
    # the live run's name/tile count (or vice versa).
    ("pix2poly", "p2p_image_xxl", "Pix2Poly", "image", 16384,
     ("docs/results_round4/p2p_image_xxl_{split}.csv", 16384, "p2p_image_xxl")),
    ("pix2poly", "p2p_lidar_xl", "Pix2Poly", "lidar", 2048,
     ("docs/results_round4/p2p_lidar_xl_{split}.csv", 2048, "p2p_lidar_xl")),
    ("pix2poly", "p2p_fusion_xl", "Pix2Poly", "fusion", 2048,
     ("docs/results_round4/p2p_fusion_xl_{split}.csv", 2048, "p2p_fusion_xl")),
    ("hisup", "hisup_image_xl", "HiSup", "image", 2048,
     ("docs/results_round3/hisup_{split}.csv", 256, "hisup_image")),
    ("hisup", "hisup_lidar_xl", "HiSup", "lidar", 2048, None),
    ("hisup", "hisup_fusion_xl", "HiSup", "fusion", 2048,
     ("docs/results_round4/hisup_fusion_xl_{split}.csv", 2048, "hisup_fusion_xl")),
    ("ffl", "ffl_image_xl", "FFL", "image", 2048,
     ("docs/results_round3/ffl_xl_{split}.csv", 2048, "ffl_image_xl")),
    ("ffl", "ffl_lidar_xl", "FFL", "lidar", 2048,
     ("docs/results_round4/ffl_lidar_xl_{split}.csv", 2048, "ffl_lidar_xl")),
    ("ffl", "ffl_fusion_xl", "FFL", "fusion", 2048, None),
]

COLS = ["IoU", "C-IoU", "NR", "AP", "AP50", "AR100", "bAP", "polis", "chamfer", "mta", "num_polygons"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--split", default="val")
    ap.add_argument("--out", default="docs/results_round4")
    ap.add_argument("--root", default="outputs/Synthetic_output")
    ap.add_argument("--splice", default="", help="markdown file with a <!-- GRID_TABLE --> marker to replace")
    args = ap.parse_args()

    rows = []
    for mdir, name, model, modality, ntrain, alt in RUNS:
        run_label = name
        path = os.path.join(args.root, mdir, "224", name, "results", f"metrics_{args.split}.csv")
        if not os.path.exists(path) and alt:
            path, ntrain, run_label = alt[0].format(split=args.split), alt[1], alt[2]
        if not os.path.exists(path):
            rows.append({"model": model, "modality": modality, "run": name, "status": "missing"})
            continue
        with open(path) as f:
            # last row = most recent eval of this run
            recs = list(csv.DictReader(f))
        rec = recs[-1]
        row = {"model": model, "modality": modality, "run": run_label, "train_tiles": ntrain}
        for c in COLS:
            v = rec.get(c, "")
            try:
                row[c] = round(float(v), 4)
            except (TypeError, ValueError):
                row[c] = v
        rows.append(row)

    os.makedirs(args.out, exist_ok=True)
    out_csv = os.path.join(args.out, f"grid_{args.split}.csv")
    keys = ["model", "modality", "run", "train_tiles", *COLS, "status"]
    with open(out_csv, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=keys, extrasaction="ignore")
        w.writeheader()
        w.writerows(rows)

    hdr = ["model", "modality", "train_tiles", "IoU", "C-IoU", "NR", "AP", "AP50", "mta"]
    lines = ["| " + " | ".join(hdr) + " |", "|" + "---|" * len(hdr)]
    for r in rows:
        cells = [str(r.get(k, "—")) for k in hdr]
        if r.get("status") == "missing":
            cells = [r["model"], r["modality"]] + ["—"] * (len(hdr) - 2)
        lines.append("| " + " | ".join(cells) + " |")
    table = "\n".join(lines)
    print(f"## 3x3 trained grid — synthetic {args.split} split\n")
    print(table)
    print(f"\nwrote {out_csv}")

    if args.splice:
        import re

        with open(args.splice) as f:
            doc = f.read()
        pattern = re.compile(r"<!-- GRID_TABLE -->.*?(<!-- /GRID_TABLE -->|\Z)", re.S)
        if not pattern.search(doc):
            print(f"WARNING: no <!-- GRID_TABLE --> marker in {args.splice}; not spliced")
        else:
            repl = "<!-- GRID_TABLE -->\n" + table + "\n<!-- /GRID_TABLE -->"
            doc = pattern.sub(lambda m: repl, doc, count=1)
            with open(args.splice, "w") as f:
                f.write(doc)
            print(f"spliced table into {args.splice}")


if __name__ == "__main__":
    main()
