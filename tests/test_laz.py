"""Native LASzip codec: round-trip vs the .las reader, real-COPC decode.

Covers the reference's LiDAR decode capability (laspy[lazrs] at
datasets/p3_coco.py:78) — COPC .laz is the only format the real P3 dataset
ships LiDAR in.
"""

import os

import numpy as np
import pytest

from pixelspointspolygons_tpu.native import laz

REAL_COPC = "/root/reference/demo_data/lidar0_CH_val.copc.laz"

pytestmark = pytest.mark.skipif(not laz.available(), reason="no native codec")


def _cloud(n=20000, seed=0, multi=True):
    rng = np.random.default_rng(seed)
    xyz = np.cumsum(rng.integers(-300, 300, size=(n, 3)), axis=0) * 0.01
    xyz += np.array([2_600_000.0, 1_200_000.0, 400.0])
    attrs = {}
    if multi == "degenerate":
        # combos real sensors never emit but files may carry: (0,0) — what the
        # P3 tiles themselves store — plus r>n and the full 0..15 range; these
        # walk every row/col of the 16x16 return-context tables
        attrs["number_of_returns"] = rng.integers(0, 16, size=n).astype(np.uint8)
        attrs["return_number"] = rng.integers(0, 16, size=n).astype(np.uint8)
    elif multi:
        nret = rng.integers(1, 6, size=n).astype(np.uint8)
        attrs["number_of_returns"] = nret
        attrs["return_number"] = (rng.integers(0, 15, size=n) % nret + 1).astype(
            np.uint8
        )
    attrs["intensity"] = rng.integers(0, 65535, size=n).astype(np.uint16)
    attrs["classification"] = rng.integers(0, 32, size=n).astype(np.uint8)
    attrs["gps_time"] = np.sort(rng.random(n) * 1e5) + 3e5
    return xyz, attrs


@pytest.mark.parametrize("multi", [False, True, "degenerate"])
@pytest.mark.parametrize("chunk_size", [777, 50000])
def test_roundtrip_exact(tmp_path, multi, chunk_size):
    xyz, attrs = _cloud(multi=multi)
    p = str(tmp_path / "t.laz")
    nbytes = laz.write_laz(p, xyz, chunk_size=chunk_size, **attrs)
    assert 0 < nbytes < xyz.shape[0] * 30  # actually compresses
    out = laz.read_laz(p, attributes=True)
    # coordinates are grid-quantized at scale 0.01 by the writer
    np.testing.assert_allclose(out["xyz"], xyz, atol=0.0051)
    np.testing.assert_array_equal(out["intensity"], attrs["intensity"])
    np.testing.assert_array_equal(out["classification"], attrs["classification"])
    np.testing.assert_array_equal(out["gps_time"], attrs["gps_time"])
    if multi:
        np.testing.assert_array_equal(out["return_number"], attrs["return_number"])
        np.testing.assert_array_equal(
            out["number_of_returns"], attrs["number_of_returns"]
        )


def test_roundtrip_matches_las_reader(tmp_path):
    """The .laz decode agrees with the independent uncompressed-.las reader."""
    from pixelspointspolygons_tpu.data.dataset import load_las_points

    xyz, _ = _cloud(n=5000, seed=3)
    scale = np.array([0.01, 0.01, 0.01])
    offset = np.floor(xyz.min(axis=0))
    XYZ = np.round((xyz - offset) / scale).astype(np.int32)

    # hand-write an uncompressed LAS 1.4 / point-format-6 file
    las = str(tmp_path / "t.las")
    hdr = bytearray(375)
    hdr[:4] = b"LASF"
    hdr[24:26] = bytes([1, 4])
    hdr[94:96] = (375).to_bytes(2, "little")
    hdr[96:100] = (375).to_bytes(4, "little")
    hdr[104] = 6
    hdr[105:107] = (30).to_bytes(2, "little")
    hdr[131:155] = scale.tobytes()
    hdr[155:179] = offset.tobytes()
    hdr[247:255] = len(xyz).to_bytes(8, "little")
    recs = np.zeros((len(xyz), 30), np.uint8)
    recs[:, :12] = XYZ.astype("<i4").view(np.uint8).reshape(len(xyz), 12)
    with open(las, "wb") as f:
        f.write(bytes(hdr))
        f.write(recs.tobytes())

    lazp = str(tmp_path / "t.laz")
    laz.write_laz(lazp, xyz, scale=scale, offset=offset)
    np.testing.assert_allclose(laz.read_laz(lazp), load_las_points(las), atol=1e-9)


def test_load_lidar_file_dispatches_laz(tmp_path):
    from pixelspointspolygons_tpu.data.dataset import load_lidar_file

    xyz, _ = _cloud(n=2000, seed=7)
    p = str(tmp_path / "tile.copc.laz")
    laz.write_laz(p, xyz)
    np.testing.assert_allclose(load_lidar_file(p), xyz, atol=0.0051)


@pytest.mark.skipif(not os.path.isfile(REAL_COPC), reason="no real COPC tile")
def test_real_copc_tile_decodes_exactly():
    """Decode a real COPC tile (written by lazperf/untwine): the point count
    and the exact min/max of every axis must match the LAS header."""
    out = laz.read_laz(REAL_COPC, attributes=True)
    xyz = out["xyz"]
    assert xyz.shape == (39641, 3)
    np.testing.assert_allclose(
        xyz.min(axis=0), [2611856.01, 1265355.91, 280.82], atol=1e-6
    )
    np.testing.assert_allclose(
        xyz.max(axis=0), [2611911.99, 1265411.89, 311.52], atol=1e-6
    )
    # P3 COPC tiles strip attributes
    assert out["number_of_returns"].max() == 0
    assert out["classification"].max() == 0


def test_bbox_guard_rejects_corrupt_decode(tmp_path):
    """A file whose header bbox disagrees with its points is refused."""
    xyz, _ = _cloud(n=1000, seed=11)
    p = str(tmp_path / "t.laz")
    laz.write_laz(p, xyz)
    raw = bytearray(open(p, "rb").read())
    # shrink the header max_x far below the real extent
    import struct

    raw[179:187] = struct.pack("<d", xyz[:, 0].min() + 1.0)
    bad = str(tmp_path / "bad.laz")
    open(bad, "wb").write(bytes(raw))
    with pytest.raises(ValueError, match="bbox"):
        laz.read_laz(bad)
