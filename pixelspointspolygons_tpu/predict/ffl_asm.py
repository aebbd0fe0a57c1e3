"""FFL Active Skeleton Model (ASM) polygonization.

TPU-first rebuild of reference predict/ffl/polygonize_asm.py (1156 LoC):

- edge-probability map from seg gradients (+ edge channel when present,
  get_skeleton :512-578) → morphological skeletonization (Zhang-Suen
  thinning replaces skimage.skeletonize) → skeleton GRAPH of paths between
  junction/tip nodes (replaces skan.Skeleton);
- the TensorSkeleton optimization (:361-420: RMSprop + ExponentialLR over a
  step-interpolated coefficient schedule) becomes a `lax.scan` over a FLAT
  shared node-position array with padded path-index arrays — shared junction
  nodes receive summed gradients exactly like the reference's flat pos;
- loss = data + length + align with `jnp.interp` step schedules — matching
  the reference's EFFECTIVE total (its curvature/corner/junction terms are
  computed but commented out of total_loss, polygonize_asm.py:345-350 /
  SURVEY §7.4); tips (degree-1 nodes) stay pinned;
- polygon reconstruction: corner-split + Douglas-Peucker per path, then
  planar-arrangement face extraction (half-edge CCW traversal) — the
  shapely `polygonize_full` equivalent, followed by min-area and
  seg-probability filtering.
"""

from __future__ import annotations

import math
from functools import partial

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.bilinear import bilinear_interpolate
from ..ops.crossfield import framefield_align_error
from .ffl_polygonize import (
    c0c2_to_uv_lazy,
    detect_corners,
    douglas_peucker,
    mean_prob_in_ring,
    ring_area,
)

MAX_NODES = 65536  # hard cap on skeleton nodes per device batch (drops logged)
# coarse buckets (min 4096, ×4 growth → at most 3 jit shapes): each extra
# shape costs a 1-5 min compile on the axon remote-compile tunnel
MIN_BUCKET = 4096
BUCKET_GROWTH = 4


def _bucket(n: int) -> int:
    b = MIN_BUCKET
    while b < n:
        b *= BUCKET_GROWTH
    return b


# --------------------------------------------------------------------------
# host: skeletonization + graph extraction
# --------------------------------------------------------------------------


def zhang_suen_skeletonize(mask: np.ndarray) -> np.ndarray:
    """Binary thinning to a 1-px skeleton (skimage.morphology.skeletonize
    equivalent)."""
    img = (mask > 0).astype(np.uint8)
    changed = True
    while changed:
        changed = False
        for step in (0, 1):
            p = np.pad(img, 1)
            P2 = p[:-2, 1:-1]
            P3 = p[:-2, 2:]
            P4 = p[1:-1, 2:]
            P5 = p[2:, 2:]
            P6 = p[2:, 1:-1]
            P7 = p[2:, :-2]
            P8 = p[1:-1, :-2]
            P9 = p[:-2, :-2]
            ring = [P2, P3, P4, P5, P6, P7, P8, P9]
            B = sum(ring)
            A = sum(
                ((ring[i] == 0) & (ring[(i + 1) % 8] == 1)).astype(np.uint8)
                for i in range(8)
            )
            if step == 0:
                c1 = (P2 * P4 * P6) == 0
                c2 = (P4 * P6 * P8) == 0
            else:
                c1 = (P2 * P4 * P8) == 0
                c2 = (P2 * P6 * P8) == 0
            cond = (img == 1) & (2 <= B) & (B <= 6) & (A == 1) & c1 & c2
            if cond.any():
                img[cond] = 0
                changed = True
    return img


_NB8 = [(-1, -1), (-1, 0), (-1, 1), (0, -1), (0, 1), (1, -1), (1, 0), (1, 1)]


def skeleton_to_paths(skel: np.ndarray):
    """Trace the skeleton into (nodes (N,2) float (y,x), paths: list of node-
    index lists). Like skan's Skeleton graph: adjacent junction pixels
    (degree ≥ 3) are CLUSTERED into a single junction node (centroid), paths
    run junction/tip → junction/tip through degree-2 chains, and pure cycles
    come back closed (first == last index)."""
    ys, xs = np.nonzero(skel)
    coords = list(zip(ys.tolist(), xs.tolist()))
    index = {c: i for i, c in enumerate(coords)}
    nbrs: list[list[int]] = [[] for _ in coords]
    for i, (y, x) in enumerate(coords):
        for dy, dx in _NB8:
            j = index.get((y + dy, x + dx))
            if j is None:
                continue
            # triangle reduction: drop a diagonal adjacency when a shared
            # 4-neighbor bridges the two pixels — thinning leaves thick
            # corners whose spurious diagonals otherwise read as junctions
            if dy and dx and ((y, x + dx) in index or (y + dy, x) in index):
                continue
            nbrs[i].append(j)
    deg = np.array([len(n) for n in nbrs]) if coords else np.zeros((0,), int)

    is_junc = deg >= 3
    # cluster adjacent junction pixels
    cluster_of = {}
    clusters: list[list[int]] = []
    for i in np.nonzero(is_junc)[0]:
        if i in cluster_of:
            continue
        stack = [int(i)]
        cid = len(clusters)
        members = []
        while stack:
            p = stack.pop()
            if p in cluster_of:
                continue
            cluster_of[p] = cid
            members.append(p)
            for n in nbrs[p]:
                if is_junc[n] and n not in cluster_of:
                    stack.append(n)
        clusters.append(members)

    nodes: list = []  # (y, x) positions
    node_of_pixel: dict[int, int] = {}
    for members in clusters:
        pts = np.array([coords[m] for m in members], np.float64)
        nid = len(nodes)
        nodes.append(pts.mean(axis=0))
        for m in members:
            node_of_pixel[m] = nid
    for i, c in enumerate(coords):
        if i not in node_of_pixel:
            node_of_pixel[i] = len(nodes)
            nodes.append(np.asarray(c, np.float64))

    terminal = set(np.nonzero(is_junc | (deg == 1))[0].tolist())
    visited: set[tuple[int, int]] = set()
    paths: list[list[int]] = []

    def walk(start_px: int, nxt_px: int) -> list[int] | None:
        path_px = [start_px, nxt_px]
        prev, cur = start_px, nxt_px
        while cur not in terminal:
            options = [n for n in nbrs[cur] if n != prev and (cur, n) not in visited]
            if not options:
                break
            nxt2 = options[0]
            visited.add((cur, nxt2))
            visited.add((nxt2, cur))
            path_px.append(nxt2)
            prev, cur = cur, nxt2
            if cur == start_px:
                break
        # map pixels to nodes, collapsing consecutive same-cluster nodes
        path = []
        for p in path_px:
            nid = node_of_pixel[p]
            if not path or path[-1] != nid:
                path.append(nid)
        return path if len(path) >= 2 else None

    for e in sorted(terminal):
        for n in nbrs[e]:
            if (e, n) in visited:
                continue
            # skip intra-cluster hops
            if is_junc[e] and is_junc[n] and cluster_of.get(e) == cluster_of.get(n):
                visited.add((e, n))
                visited.add((n, e))
                continue
            visited.add((e, n))
            visited.add((n, e))
            p = walk(e, n)
            if p:
                paths.append(p)
    # remaining pure cycles
    for i in range(len(coords)):
        if deg[i] != 2:
            continue
        for n in nbrs[i]:
            if (i, n) not in visited:
                visited.add((i, n))
                visited.add((n, i))
                p = walk(i, n)
                if p:
                    paths.append(p)
    nodes_arr = np.stack(nodes) if nodes else np.zeros((0, 2))
    return nodes_arr, paths


def edge_probability_map(
    seg: np.ndarray, has_edge_channel: bool, data_level: float = 0.5
) -> np.ndarray:
    """(Cs, H, W) seg → edge prob map.

    Reference semantics (compute_skeletons, polygonize_asm.py:659-667):
    BINARIZE the interior channel at data_level FIRST, then take the Scharr
    gradient norm of the binary mask (scaled so a clean step edge reaches 1)
    — taking gradients of the soft prob map instead gives a weak (~0.6 max),
    fragmented edge band whose skeleton breaks into tiny paths."""
    interior = (seg[0] > data_level).astype(np.float32)
    gx = cv2.Scharr(interior, cv2.CV_32F, 1, 0) / 16.0
    gy = cv2.Scharr(interior, cv2.CV_32F, 0, 1) / 16.0
    em = 2.0 * np.sqrt(gx**2 + gy**2)  # kornia-normalized-grad x2 (:662)
    if has_edge_channel and seg.shape[0] > 1:
        em = em + seg[1]
    return np.clip(em, 0.0, 1.0)


# --------------------------------------------------------------------------
# packing (flat shared nodes + padded path indices)
# --------------------------------------------------------------------------


def pack_skeletons(per_sample: list[tuple[np.ndarray, list[list[int]]]]):
    """Flat bucketized packing (same redesign as the ACM path): shared nodes
    in one (N, 2) array, path edges as explicit flat (edge_a, edge_b) index
    pairs (TensorSkeleton's CSR paths, tensorskeleton.py:44-192, re-expressed
    as gathers). Returns (pos, node_batch, node_valid, pinned, edge_a,
    edge_b, edge_valid, paths_meta [(global node-idx list, batch)], dropped).
    N and E are padded to power-of-two buckets — the old fixed
    16384-node / 1024×256-path pad did ~20× excess work per step."""
    chunks, metas, dropped = [], [], 0
    n_nodes = 0
    pinned_chunks = []
    for b, (nodes, paths) in enumerate(per_sample):
        if n_nodes + len(nodes) > MAX_NODES:
            dropped += len(paths)
            continue
        base = n_nodes
        counts = np.zeros(len(nodes), int)
        for p in paths:
            counts[p[0]] += 1
            counts[p[-1]] += 1
            for q in p[1:-1]:
                counts[q] += 2
            metas.append(([i + base for i in p], b))
        chunks.append((np.asarray(nodes, np.float32), b))
        pinned_chunks.append(counts == 1)  # degree-1 tips pinned
        n_nodes += len(nodes)

    N = _bucket(max(n_nodes, 1))
    pos = np.zeros((N, 2), np.float32)
    node_batch = np.zeros((N,), np.int32)
    node_valid = np.zeros((N,), bool)
    pinned = np.zeros((N,), bool)
    off = 0
    for (nodes, b), tips in zip(chunks, pinned_chunks):
        pos[off : off + len(nodes)] = nodes
        node_batch[off : off + len(nodes)] = b
        node_valid[off : off + len(nodes)] = True
        pinned[off : off + len(nodes)] = tips
        off += len(nodes)

    ea, eb = [], []
    for idx, _b in metas:
        ea.extend(idx[:-1])
        eb.extend(idx[1:])
    E = _bucket(max(len(ea), 1))
    edge_a = np.zeros((E,), np.int32)
    edge_b = np.zeros((E,), np.int32)
    edge_valid = np.zeros((E,), bool)
    edge_a[: len(ea)] = ea
    edge_b[: len(eb)] = eb
    edge_valid[: len(ea)] = True
    return pos, node_batch, node_valid, pinned, edge_a, edge_b, edge_valid, metas, dropped


# --------------------------------------------------------------------------
# device: optimization
# --------------------------------------------------------------------------


def _asm_loss(pos, edge_a, edge_b, edge_valid, node_batch, node_valid, indicator, c0c2, coefs):
    H, W = indicator.shape[1], indicator.shape[2]
    pa = pos[edge_a]  # (E, 2)
    pb = pos[edge_b]
    tangents = pb - pa
    norms = jnp.sqrt(jnp.sum(tangents * tangents, axis=-1) + 1e-12)  # safe at 0 (padded edges)
    emask = (edge_valid & (norms > 0.1)).astype(jnp.float32)

    mid = (pa + pb) / 2
    mi = jnp.clip(jnp.round(mid[..., 0]).astype(jnp.int32), 0, H - 1)
    mj = jnp.clip(jnp.round(mid[..., 1]).astype(jnp.int32), 0, W - 1)
    bidx = node_batch[edge_a]
    cf = c0c2[bidx, :, mi, mj]
    c0 = jax.lax.complex(cf[..., 0], cf[..., 1])
    c2 = jax.lax.complex(cf[..., 2], cf[..., 3])
    zn = tangents / (norms[..., None] + 1e-6)
    z = jax.lax.complex(zn[..., 0], zn[..., 1])
    align_loss = (framefield_align_error(c0, c2, z) * emask).sum()

    vals = bilinear_interpolate(indicator[:, None], pos, node_batch)[:, 0]
    level_loss = (((vals - coefs["data_level"]) ** 2) * node_valid).sum()

    length_loss = ((norms * emask) ** 2).sum()

    return (
        coefs["data"] * level_loss
        + coefs["length"] * length_loss
        + coefs["crossfield"] * align_loss
    )


@partial(jax.jit, static_argnames=("steps",))
def asm_optimize(
    pos,
    node_batch,
    node_valid,
    pinned,
    edge_a,
    edge_b,
    edge_valid,
    indicator,
    c0c2,
    step_thresholds,
    data_sched,
    length_sched,
    crossfield_sched,
    *,
    steps: int = 300,
    lr: float = 0.1,
    gamma: float = 0.995,
    data_level: float = 0.5,
):
    """RMSprop (torch defaults α=0.99, eps=1e-8) + exponential LR decay."""
    free = (~pinned).astype(jnp.float32)[:, None]

    def body(carry, it):
        p, v = carry
        coefs = {
            "data": jnp.interp(it.astype(jnp.float32), step_thresholds, data_sched),
            "length": jnp.interp(it.astype(jnp.float32), step_thresholds, length_sched),
            "crossfield": jnp.interp(
                it.astype(jnp.float32), step_thresholds, crossfield_sched
            ),
            "data_level": data_level,
        }
        g = jax.grad(
            lambda q: _asm_loss(
                q, edge_a, edge_b, edge_valid, node_batch, node_valid, indicator, c0c2, coefs
            )
        )(p)
        v = 0.99 * v + 0.01 * g * g
        step_lr = lr * gamma ** it.astype(jnp.float32)
        p = p - step_lr * g / (jnp.sqrt(v) + 1e-8) * free
        return (p, v), None

    (pos_out, _), _ = jax.lax.scan(
        body, (pos, jnp.zeros_like(pos)), jnp.arange(steps)
    )
    return pos_out


# --------------------------------------------------------------------------
# host: polygon reconstruction (planar faces from polylines)
# --------------------------------------------------------------------------


def faces_from_polylines(polylines: list[np.ndarray]) -> list[np.ndarray]:
    """shapely polygonize_full equivalent: split the polyline arrangement
    into faces via half-edge traversal (turn most-CCW at each node)."""
    key = lambda pt: (round(pt[0] * 4) / 4, round(pt[1] * 4) / 4)
    node_ids: dict = {}
    nodes: list[np.ndarray] = []
    edges: set[tuple[int, int]] = set()
    for pl in polylines:
        prev = None
        for pt in pl:
            k = key(pt)
            if k not in node_ids:
                node_ids[k] = len(nodes)
                nodes.append(np.asarray(pt, np.float64))
            cur = node_ids[k]
            if prev is not None and prev != cur:
                edges.add((prev, cur))
                edges.add((cur, prev))
            prev = cur
    out_edges: dict[int, list[int]] = {}
    for a, b in edges:
        out_edges.setdefault(a, []).append(b)
    # sort outgoing edges by angle
    for a in out_edges:
        out_edges[a].sort(
            key=lambda b: math.atan2(nodes[b][0] - nodes[a][0], nodes[b][1] - nodes[a][1])
        )
    visited: set[tuple[int, int]] = set()
    faces = []
    for a0, b0 in edges:
        if (a0, b0) in visited:
            continue
        face = []
        a, b = a0, b0
        while True:
            visited.add((a, b))
            face.append(a)
            # find reverse edge (b, a) in b's sorted out list, take next CW
            lst = out_edges[b]
            i = lst.index(a)
            nxt = lst[(i - 1) % len(lst)]
            a, b = b, nxt
            if (a, b) == (a0, b0) or len(face) > 10 * len(nodes) + 10:
                break
        if len(face) >= 3:
            ring = np.stack([nodes[i] for i in face])
            # keep only CCW-in-ij faces (interior faces); signed shoelace
            y, x = ring[:, 0], ring[:, 1]
            signed = 0.5 * (np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))
            if signed > 1e-9:
                faces.append(ring)
    return faces


# --------------------------------------------------------------------------
# the method
# --------------------------------------------------------------------------


def asm_polygonize(poly_cfg, seg: np.ndarray, crossfield: np.ndarray) -> dict:
    """seg (B, Cs, H, W), crossfield (B, 4, H, W) numpy →
    {tol: per-sample polygon lists ((V,2) xy open rings)}."""
    mc = poly_cfg.asm_method
    B = seg.shape[0]
    init_method = str(mc.get("init_method", "skeleton"))

    per_sample = []
    for b in range(B):
        if init_method == "skeleton":
            em = edge_probability_map(
                seg[b], has_edge_channel=seg.shape[1] > 1,
                data_level=float(mc.data_level),
            )
            mask = (em > float(mc.data_level)).astype(np.uint8)
            # pad (edge mode) + binary closing before thinning so border
            # pixels survive and 1-px gaps close (get_skeleton :521-525)
            pad = 2
            mask = np.pad(mask, pad, mode="edge")
            kernel = cv2.getStructuringElement(cv2.MORPH_RECT, (3, 3))
            mask = cv2.morphologyEx(mask, cv2.MORPH_CLOSE, kernel)
            skel = zhang_suen_skeletonize(mask.astype(bool))[pad:-pad, pad:-pad]
            nodes, paths = skeleton_to_paths(skel)
        else:  # marching-squares fallback (:581-640)
            from .ffl_polygonize import extract_contours

            rings = extract_contours(seg[b, 0], float(mc.data_level))
            nodes_list, paths = [], []
            off = 0
            for r in rings:
                nodes_list.append(r)
                paths.append(list(range(off, off + len(r))) + [off])
                off += len(r)
            nodes = (
                np.concatenate(nodes_list, axis=0) if nodes_list else np.zeros((0, 2))
            )
        per_sample.append((nodes, paths))

    pos, node_batch, node_valid, pinned, edge_a, edge_b, edge_valid, paths_meta, dropped = (
        pack_skeletons(per_sample)
    )
    if dropped:
        import logging

        logging.getLogger("Polygonizer").warning(f"ASM dropped {dropped} paths (capacity)")

    coefs = mc.loss_params.coefs
    thresholds = np.asarray([float(t) for t in coefs.step_thresholds], np.float32)
    steps = int(thresholds[-1])
    if paths_meta:
        pos_opt = asm_optimize(
            jnp.asarray(pos),
            jnp.asarray(node_batch),
            jnp.asarray(node_valid),
            jnp.asarray(pinned),
            jnp.asarray(edge_a),
            jnp.asarray(edge_b),
            jnp.asarray(edge_valid),
            jnp.asarray(seg[:, 0]),
            jnp.asarray(crossfield),
            jnp.asarray(thresholds),
            jnp.asarray([float(v) for v in coefs.data], dtype=jnp.float32),
            jnp.asarray([float(v) for v in coefs.length], dtype=jnp.float32),
            jnp.asarray([float(v) for v in coefs.crossfield], dtype=jnp.float32),
            steps=steps,
            lr=float(mc.lr),
            gamma=float(mc.gamma),
            data_level=float(mc.data_level),
        )
        pos = np.asarray(pos_opt)

    out = {}
    uv_cache: dict = {}
    for tol in list(mc.tolerance):
        per_out: list[list[np.ndarray]] = [[] for _ in range(B)]
        for b in range(B):
            # collect this sample's simplified polylines
            polylines = []
            for first, pb in paths_meta:
                if len(first) < 2 or pb != b:
                    continue
                pts = pos[first]
                if b not in uv_cache:
                    uv_cache[b] = c0c2_to_uv_lazy(crossfield[b])
                u, v = uv_cache[b]
                closed = len(first) > 2 and first[0] == first[-1]
                if closed:
                    ring = pts[:-1]
                    corners = detect_corners(ring, u, v)
                    from .ffl_polygonize import simplify_ring_with_corners

                    simp = simplify_ring_with_corners(ring, corners, float(tol))
                    simp = np.concatenate([simp, simp[:1]], axis=0)
                else:
                    simp = douglas_peucker(pts, float(tol))
                polylines.append(simp)
            # border-ring union so border-crossing buildings close
            # (reference shapely_postprocess, polygonize_acm.py:288-306 —
            # shared with the ACM path)
            from .ffl_polygonize import polygonize_with_border

            faces = polygonize_with_border(polylines, seg.shape[2], seg.shape[3])
            kept = []
            for ring in faces:
                if ring_area(ring) < float(mc.min_area):
                    continue
                if mean_prob_in_ring(ring, seg[b, 0]) < float(mc.seg_threshold):
                    continue
                kept.append(ring[:, ::-1].copy())  # → (x, y)
            per_out[b] = kept
        out[f"tol_{tol}"] = per_out
    return out
