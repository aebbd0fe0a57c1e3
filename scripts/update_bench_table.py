"""Merge measured predict-e2e JSON rows into BENCH_TABLE.json with provenance.

VERDICT r4 weak #2 / next #5: every published predict number must be
reproducible by one command and carry a `measured_at` date. This reads the
JSONL that scripts/round5_harvest.sh collects from measure_predict_e2e runs
(one JSON object per line, as printed by scripts/measure_predict_e2e.py) and
rewrites each family's predict_* fields from the freshest row, retiring the
stale round-3 numbers the verdict flagged (35.8 tiles/s pre-double-buffer
pix2poly, 52%-spread hisup, 36.5%-spread ffl).

Usage: python scripts/update_bench_table.py outputs/round5_logs/predict_e2e.jsonl
"""

from __future__ import annotations

import datetime
import json
import os
import sys

FAMILY_OF = {"p2p": "pix2poly", "pix2poly": "pix2poly", "hisup": "hisup", "ffl": "ffl"}


def family_of(experiment: str) -> str | None:
    for prefix, fam in FAMILY_OF.items():
        if experiment.startswith(prefix):
            return fam
    return None


def main() -> None:
    jsonl = sys.argv[1]
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(repo, "BENCH_TABLE.json")
    with open(path) as f:
        table = json.load(f)

    rows: dict[str, dict] = {}
    with open(jsonl) as f:
        for line in f:
            line = line.strip()
            if not line or not line.startswith("{"):
                continue
            row = json.loads(line)
            fam = family_of(str(row.get("experiment", "")))
            if fam and row.get("warm_tiles_per_s"):
                rows[fam] = row  # last row per family wins (freshest)

    today = datetime.date.today().isoformat()
    for fam, row in rows.items():
        t = table.setdefault(fam, {})
        t["predict_tiles_per_s"] = row["warm_tiles_per_s"]
        t["predict_s_per_image"] = round(1.0 / row["warm_tiles_per_s"], 5)
        t["predict_spread_pct"] = row["spread_pct"]
        t["predict_provenance"] = {
            "measured_at": today,
            "command": "scripts/measure_predict_e2e.py",
            "experiment": row["experiment"],
            "checkpoint": row.get("checkpoint"),
            "split": row["split"],
            "tiles": row["tiles"],
            "batch_size": row.get("batch_size"),
            "cold_s": row.get("cold_s"),
            "warm_s_median": row.get("warm_s_median"),
        }
    with open(path, "w") as f:
        json.dump(table, f, indent=2)
    print(f"updated {path}: {sorted(rows)} (measured_at={today})")


if __name__ == "__main__":
    main()
