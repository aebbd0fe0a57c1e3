"""Pretrained-weights fetcher (reference scripts/download_pretrained.py).
No egress in this environment → prints guidance when HF is unreachable."""

import sys

from _common import compose


def main() -> None:
    cfg = compose(sys.argv[1:])
    try:
        from huggingface_hub import snapshot_download  # type: ignore

        snapshot_download(
            repo_id="rsi/PixelsPointsPolygons",
            repo_type="model",
            local_dir=cfg.host.model_root,
        )
        print(f"downloaded pretrained checkpoints to {cfg.host.model_root}")
    except Exception as e:
        print(
            f"[offline] pretrained download unavailable ({type(e).__name__}). "
            "Train checkpoints locally with scripts/train.py; they restore via "
            "checkpoint=<best_val_iou|best_val_loss|latest|epoch_N>."
        )


if __name__ == "__main__":
    main()
