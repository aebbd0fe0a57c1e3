"""Dataset fetcher (reference scripts/download_dataset.py uses HF
snapshot_download). This environment has no network egress, so this script
either uses huggingface_hub when reachable or generates the self-contained
synthetic dataset so the full pipeline stays runnable."""

import sys

from _common import compose


def main() -> None:
    cfg = compose(sys.argv[1:])
    try:
        from huggingface_hub import snapshot_download  # type: ignore

        snapshot_download(
            repo_id="rsi/PixelsPointsPolygons",
            repo_type="dataset",
            local_dir=cfg.host.dataset_root,
        )
        print(f"downloaded P3 dataset to {cfg.host.dataset_root}")
        return
    except Exception as e:
        print(f"[offline] dataset download unavailable ({type(e).__name__}); "
              "generating the synthetic dataset instead")
    cfg = compose(["dataset=synthetic"] + sys.argv[1:])
    from pixelspointspolygons_tpu.data import write_synthetic_dataset

    write_synthetic_dataset(cfg)
    print(f"synthetic dataset written under {cfg.experiment.dataset.in_path}")


if __name__ == "__main__":
    main()
