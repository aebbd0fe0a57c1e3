"""Visual smoke test: round-trip GT token sequences + permutation matrices
through the polygon assembler and plot them over the tiles
(reference scripts/test_wireframe_loader.py:10-40). Writes wireframe_debug/*.png.
"""

import numpy as np

from _common import compose_from_argv


def main() -> None:
    cfg = compose_from_argv()
    from pixelspointspolygons_tpu.data import P3Dataset, ensure_synthetic_dataset
    from pixelspointspolygons_tpu.models.pix2poly import Tokenizer
    from pixelspointspolygons_tpu.predict.predictor_pix2poly import (
        permutations_to_polygons,
    )
    from pixelspointspolygons_tpu.utils.visualization import plot_polygons

    ensure_synthetic_dataset(cfg)
    tok = Tokenizer(cfg)
    ds = P3Dataset(cfg, "val", tokenizer=tok)
    n = min(len(ds), 8)
    for i in range(n):
        item = ds.get_item(i, np.random.RandomState(0))
        coords = tok.decode(item["y"])  # (V, 2) (y, x)
        nmax = tok.max_num_vertices
        vertices = np.zeros((1, nmax, 2), np.float32)
        nv = min(len(coords), nmax)
        vertices[0, :nv] = coords[:nv, ::-1]
        perm = item["y_perm"][None].astype(np.float64)
        polys = permutations_to_polygons(perm, vertices)[0]
        image = None
        if "images" in item:
            img = item["images"]
            image = (img - img.min()) / max(img.max() - img.min(), 1e-6)
        plot_polygons(polys, f"wireframe_debug/tile_{i}.png", image=image)
        print(f"tile {i}: {nv} vertices → {len(polys)} polygons")


if __name__ == "__main__":
    main()
