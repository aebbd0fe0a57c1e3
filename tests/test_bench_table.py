"""update_bench_table merges measure_predict_e2e rows into BENCH_TABLE.json
with dated provenance (VERDICT r4 weak #2: stale rows masquerading as
current)."""

import json
import os
import subprocess
import sys


def test_merge_rows(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # fake repo layout: script resolves BENCH_TABLE.json relative to itself,
    # so run it from a copied script dir
    scripts = tmp_path / "scripts"
    scripts.mkdir()
    src = os.path.join(repo, "scripts", "update_bench_table.py")
    (scripts / "update_bench_table.py").write_text(open(src).read())
    table = {"pix2poly": {"predict_tiles_per_s": 35.8}, "ffl": {}}
    (tmp_path / "BENCH_TABLE.json").write_text(json.dumps(table))
    rows = [
        {"experiment": "p2p_lidar_xl", "split": "val", "tiles": 32,
         "warm_tiles_per_s": 88.5, "warm_s_median": 0.36, "spread_pct": 3.2,
         "batch_size": 128, "checkpoint": "latest", "cold_s": 200.0},
        {"experiment": "ffl_lidar_xl", "split": "val", "tiles": 32,
         "warm_tiles_per_s": 12.5, "warm_s_median": 2.56, "spread_pct": 8.0,
         "batch_size": 32, "checkpoint": "best_val_iou", "cold_s": 100.0},
        "not json — ignored",
    ]
    jsonl = tmp_path / "e2e.jsonl"
    jsonl.write_text("\n".join(r if isinstance(r, str) else json.dumps(r) for r in rows))
    out = subprocess.run(
        [sys.executable, str(scripts / "update_bench_table.py"), str(jsonl)],
        capture_output=True, text=True,
    )
    assert out.returncode == 0, out.stderr
    got = json.loads((tmp_path / "BENCH_TABLE.json").read_text())
    assert got["pix2poly"]["predict_tiles_per_s"] == 88.5
    prov = got["pix2poly"]["predict_provenance"]
    assert prov["checkpoint"] == "latest" and prov["batch_size"] == 128
    assert prov["measured_at"]  # dated
    assert got["ffl"]["predict_tiles_per_s"] == 12.5
