"""Pretrained-weights fetcher (reference scripts/download_pretrained.py).
No egress in this environment → prints guidance when HF is unreachable.

`--from-pth <file.pth>` skips the download and instead smoke-tests real-
checkpoint ingestion: builds the configured model, runs
`apply_pretrained_encoder` with the given file wired into the encoder config,
and reports loaded/skipped tensor counts. Use it to validate a locally
provided timm-DINO / DINOv2 / HRNetV2-W48 .pth before training:

    python scripts/download_pretrained.py --from-pth weights.pth experiment=p2p_image
"""

import sys

from _common import compose


def smoke_from_pth(pth_file: str, overrides: list) -> None:
    import jax
    import jax.numpy as jnp

    cfg = compose(overrides)
    enc = cfg.experiment.encoder
    # wire the file into whichever slot the encoder family reads
    if enc.name in ("hrnet", "fusion_hrnet"):
        enc.hrnet = {"pretrained": True, "checkpoint_file": pth_file}
    else:
        enc.vit = {"pretrained": True, "checkpoint_file": pth_file}

    from pixelspointspolygons_tpu.utils.logger import make_logger
    from pixelspointspolygons_tpu.utils.pretrained import apply_pretrained_encoder

    logger = make_logger("from-pth")
    name = cfg.experiment.model.name
    S = int(enc.in_size)
    rng = jax.random.PRNGKey(0)
    inputs = {"images": jnp.zeros((1, S, S, 3), jnp.float32)}
    if bool(enc.get("use_lidar")):
        n = int(enc.get("max_num_points") or 1024)
        inputs["lidar"] = jnp.zeros((1, n, 3), jnp.float32)
        inputs["lidar_mask"] = jnp.zeros((1, n), bool)

    if name == "pix2poly":
        from pixelspointspolygons_tpu.models.pix2poly import Tokenizer, build_pix2poly

        tok = Tokenizer(cfg)  # writes pad_idx/max_len back into cfg
        model = build_pix2poly(cfg, tok)
        y = jnp.zeros((1, tok.max_len - 1), jnp.int32)
        variables = model.init(rng, inputs, y)
    elif name == "hisup":
        from pixelspointspolygons_tpu.models.hisup.model import build_hisup

        variables = build_hisup(cfg).init(rng, inputs)
    else:
        from pixelspointspolygons_tpu.models.ffl.model import build_ffl

        variables = build_ffl(cfg).init(rng, inputs)

    new = apply_pretrained_encoder(cfg, variables, logger)
    changed = sum(
        int(not (a == b).all())
        for a, b in zip(jax.tree.leaves(variables), jax.tree.leaves(new))
    )
    total = len(jax.tree.leaves(variables))
    logger.info(f"from-pth smoke OK: {changed}/{total} leaves updated from {pth_file}")
    if changed == 0:
        raise SystemExit("no tensors were loaded — wrong checkpoint for this encoder?")


def main() -> None:
    args = sys.argv[1:]
    if "--from-pth" in args:
        i = args.index("--from-pth")
        pth = args[i + 1]
        smoke_from_pth(pth, args[:i] + args[i + 2 :])
        return
    cfg = compose(args)
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
