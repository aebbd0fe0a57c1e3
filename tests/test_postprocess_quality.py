"""Regression floors for polygonization quality via the postprocess oracle:
perfect (GT-derived) inputs through the FULL pipelines must stay above these
IoU / C-IoU / NR floors (measured values at 64px: ACM 0.94/0.78/0.83,
HiSup 0.91/0.78/0.86 — floors leave ~0.05 headroom for platform noise)."""

import subprocess
import sys
import json
import os

import pytest


@pytest.mark.slow
def test_postprocess_oracle_floors():
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        [
            sys.executable,
            "scripts/postprocess_oracle.py",
            "model=all",
            "n=6",
            "experiment.encoder.in_size=64",
            "experiment.polygonization.method=[acm]",
        ],
        capture_output=True,
        text=True,
        env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        timeout=540,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    report = json.loads(out.stdout[out.stdout.index("{") :])
    acm = report["ffl.acm.tol_1"]
    hisup = report["hisup"]
    assert acm["IoU"] > 0.88 and acm["C-IoU"] > 0.70 and acm["NR"] > 0.75, acm
    assert hisup["IoU"] > 0.85 and hisup["C-IoU"] > 0.70 and hisup["NR"] > 0.78, hisup
