"""Pre-generate a synthetic dataset version and prebuild device-cache packs
on the host CPU while the TPU is busy training another cell.

The packs are persisted npz files keyed by shape-relevant config
(`device_cache._cache_path`), written atomically (tmp+rename), so a training
run that later asks for the same pack loads it instead of paying the build
inside its chip box. Run with JAX_PLATFORMS=cpu; pack building is pure host
numpy (P3Dataset raw loaders + tokenizer).

Usage: python scripts/prebuild_caches.py <exp> <split> [<split>...] [overrides...]
"""

import sys

from _common import compose_from_argv  # noqa: F401 (sets cpu platform)


def main() -> None:
    exp = sys.argv[1]
    splits = [a for a in sys.argv[2:] if a in ("train", "val", "test")]
    sys.argv = [sys.argv[0]] + [a for a in sys.argv[2:] if a not in ("train", "val", "test")]
    cfg = compose_from_argv([f"experiment={exp}", "dataset=synthetic", "run_type=release"])

    from pixelspointspolygons_tpu.data.synthetic import ensure_synthetic_dataset

    ensure_synthetic_dataset(cfg)

    model = cfg.experiment.model.name
    for split in splits:
        if model == "pix2poly":
            from pixelspointspolygons_tpu.data.device_cache import build_p2p_cache_arrays
            from pixelspointspolygons_tpu.models.pix2poly.tokenizer import Tokenizer

            arrays = build_p2p_cache_arrays(cfg, split, Tokenizer(cfg))
        elif model == "hisup":
            from pixelspointspolygons_tpu.data.device_cache import build_hisup_cache_arrays

            arrays = build_hisup_cache_arrays(cfg, split)
        else:
            from pixelspointspolygons_tpu.data.device_cache import build_ffl_cache_arrays

            arrays, _ = build_ffl_cache_arrays(cfg, split)
        n = next(iter(arrays.values())).shape[0] if arrays else 0
        print(f"PREBUILT {exp} {split}: {n} rows", flush=True)


if __name__ == "__main__":
    main()
