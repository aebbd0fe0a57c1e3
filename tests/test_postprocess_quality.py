"""Regression floors for polygonization quality via the postprocess oracle:
perfect (GT-derived) inputs through the FULL pipelines must stay above these
IoU / C-IoU / NR floors. Measured ceilings: at 64px ACM 0.94/0.78/0.83,
HiSup 0.91/0.78/0.86, Pix2Poly assembly 0.90/0.81/0.90; ASM (skeleton-based,
needs resolution) at the production 224px: 0.84/0.76/0.86. Floors leave ~0.05
headroom for platform noise."""

import subprocess
import sys
import json
import os

import pytest


def _run_oracle(*args: str) -> dict:
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    # earlier tests in the same suite process export P3_*_ROOT pointing at
    # their tiny tmp fixtures (e.g. test_device_cache's 8-tile 64px split);
    # the oracle must score the repo-default synthetic dataset, not whichever
    # fixture ran last (this made the floors flaky-by-test-order)
    env.pop("P3_DATASET_ROOT", None)
    env.pop("P3_MODEL_ROOT", None)
    out = subprocess.run(
        [sys.executable, "scripts/postprocess_oracle.py", *args],
        capture_output=True,
        text=True,
        env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        timeout=540,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return json.loads(out.stdout[out.stdout.index("{") :])


@pytest.mark.slow
def test_postprocess_oracle_floors():
    report = _run_oracle(
        "model=all",
        "n=6",
        "experiment.encoder.in_size=64",
        "experiment.polygonization.method=[acm]",
    )
    acm = report["ffl.acm.tol_1"]
    hisup = report["hisup"]
    p2p = report["pix2poly"]
    assert acm["IoU"] > 0.88 and acm["C-IoU"] > 0.70 and acm["NR"] > 0.75, acm
    assert hisup["IoU"] > 0.85 and hisup["C-IoU"] > 0.70 and hisup["NR"] > 0.78, hisup
    assert p2p["IoU"] > 0.85 and p2p["C-IoU"] > 0.75 and p2p["NR"] > 0.85, p2p


@pytest.mark.slow
def test_asm_oracle_floor_224():
    """ASM regressed catastrophically before commit bce1524 fixed it (oracle
    IoU 0.47→0.86); this floor keeps it from silently regressing back
    (VERDICT r2 next-step #5). Skeleton extraction needs real resolution, so
    the floor is pinned at the production 224px, smaller n for runtime."""
    report = _run_oracle("model=ffl", "n=4", "experiment.polygonization.method=[asm]")
    asm = report["ffl.asm.tol_1"]
    assert asm["IoU"] > 0.78 and asm["C-IoU"] > 0.65 and asm["NR"] > 0.78, asm
