"""Shared script bootstrap: sys.path setup + CLI override parsing.

The scripts keep the reference's hydra-style CLI surface
(`python scripts/train.py experiment=p2p_fusion checkpoint=latest
+image_file=...`); overrides go straight to the config engine's compose().
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# the axon TPU sitecustomize force-registers jax_platforms=axon; honor an
# explicit JAX_PLATFORMS env (e.g. CPU smoke runs)
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

from pixelspointspolygons_tpu.config import compose  # noqa: E402


def compose_from_argv(defaults: list[str] | None = None):
    """Compose from CLI overrides; `defaults` are prepended so explicit CLI
    arguments win."""
    return compose(list(defaults or []) + sys.argv[1:])
