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

# Each grid cell is a CANDIDATE CHAIN tried in order — every candidate
# carries its own provenance (path template, train tiles, run label) so a
# fallback row is never mislabeled with another run's name/tile count.
# "live:<mdir>/<name>" expands to the run's metrics CSV under --root
# (container restarts wipe outputs/, hence the committed docs/ fallbacks).
RUNS = [
    ("Pix2Poly", "image", [
        ("live:pix2poly/p2p_image_xxl", 16384, "p2p_image_xxl"),
        ("docs/results_round4/p2p_image_xxl_{split}.csv", 16384, "p2p_image_xxl"),
    ]),
    ("Pix2Poly", "lidar", [
        ("live:pix2poly/p2p_lidar_xxl6", 6144, "p2p_lidar_xxl6"),
        ("docs/results_round5/p2p_lidar_xxl6_{split}.csv", 6144, "p2p_lidar_xxl6"),
        ("live:pix2poly/p2p_lidar_xl", 2048, "p2p_lidar_xl"),
        ("docs/results_round5/p2p_lidar_xl_{split}.csv", 2048, "p2p_lidar_xl"),
        ("docs/results_round4/p2p_lidar_xl_{split}.csv", 2048, "p2p_lidar_xl"),
    ]),
    ("Pix2Poly", "fusion", [
        ("live:pix2poly/p2p_fusion_xxl6", 6144, "p2p_fusion_xxl6"),
        ("docs/results_round5/p2p_fusion_xxl6_{split}.csv", 6144, "p2p_fusion_xxl6"),
        ("live:pix2poly/p2p_fusion_xl", 2048, "p2p_fusion_xl"),
        ("docs/results_round5/p2p_fusion_xl_{split}.csv", 2048, "p2p_fusion_xl"),
        ("docs/results_round4/p2p_fusion_xl_{split}.csv", 2048, "p2p_fusion_xl"),
    ]),
    ("HiSup", "image", [
        ("live:hisup/hisup_image_xl", 2048, "hisup_image_xl"),
        ("docs/results_round5/hisup_image_xl_{split}.csv", 2048, "hisup_image_xl"),
        ("docs/results_round3/hisup_{split}.csv", 256, "hisup_image"),
    ]),
    ("HiSup", "lidar", [
        ("live:hisup/hisup_lidar_xl", 2048, "hisup_lidar_xl"),
        ("docs/results_round5/hisup_lidar_xl_{split}.csv", 2048, "hisup_lidar_xl"),
    ]),
    ("HiSup", "fusion", [
        ("live:hisup/hisup_fusion_xl", 2048, "hisup_fusion_xl"),
        ("docs/results_round5/hisup_fusion_xl_{split}.csv", 2048, "hisup_fusion_xl"),
        ("docs/results_round4/hisup_fusion_xl_{split}.csv", 2048, "hisup_fusion_xl"),
    ]),
    ("FFL", "image", [
        ("live:ffl/ffl_image_xl", 2048, "ffl_image_xl"),
        ("docs/results_round3/ffl_xl_{split}.csv", 2048, "ffl_image_xl"),
    ]),
    ("FFL", "lidar", [
        ("live:ffl/ffl_lidar_xl", 2048, "ffl_lidar_xl"),
        ("docs/results_round5/ffl_lidar_xl_{split}.csv", 2048, "ffl_lidar_xl"),
        ("docs/results_round4/ffl_lidar_xl_{split}.csv", 2048, "ffl_lidar_xl"),
    ]),
    ("FFL", "fusion", [
        ("live:ffl/ffl_fusion_xl", 2048, "ffl_fusion_xl"),
        ("docs/results_round5/ffl_fusion_xl_{split}.csv", 2048, "ffl_fusion_xl"),
    ]),
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
    for model, modality, candidates in RUNS:
        path = None
        ntrain = run_label = None
        for tmpl, nt, label in candidates:
            if tmpl.startswith("live:"):
                mdir, name = tmpl[len("live:"):].split("/")
                p = os.path.join(args.root, mdir, "224", name, "results",
                                 f"metrics_{args.split}.csv")
            else:
                p = tmpl.format(split=args.split)
            if os.path.exists(p):
                path, ntrain, run_label = p, nt, label
                break
        if path is None:
            rows.append({"model": model, "modality": modality,
                         "run": candidates[0][2], "status": "missing"})
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
