"""Minimal pure-Python EXR reader (CoFusion depth path)."""
import os
import struct
import zlib

import numpy as np

from xrdslam_tpu.utils.exr import read_exr, read_exr_depth, write_exr


def test_exr_none_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    d = {"Z": rng.uniform(0, 5, (13, 17)).astype(np.float32),
         "A": rng.uniform(size=(13, 17)).astype(np.float32)}
    p = str(tmp_path / "t.exr")
    write_exr(p, d)
    r = read_exr(p)
    np.testing.assert_allclose(r["Z"], d["Z"])
    np.testing.assert_allclose(r["A"], d["A"])
    np.testing.assert_allclose(read_exr_depth(p), d["Z"])


def _zips_file(path, z):
    """Hand-crafted ZIPS-compressed single-channel FLOAT EXR."""
    H, W = z.shape

    def predict(raw):
        arr = np.frombuffer(raw, np.uint8).astype(np.int64)
        half = (len(arr) + 1) // 2
        inter = np.empty_like(arr)
        inter[:half] = arr[0::2]
        inter[half:] = arr[1::2]
        out = np.empty_like(inter)
        out[0] = inter[0]
        out[1:] = (np.diff(inter) + 128) % 256
        return out.astype(np.uint8).tobytes()

    def attr(n, t, data):
        return (n.encode() + b"\0" + t.encode() + b"\0"
                + struct.pack("<i", len(data)) + data)

    chl = b"Z\0" + struct.pack("<i", 2) + b"\0\0\0\0" + struct.pack("<ii", 1, 1) + b"\0"
    box = struct.pack("<4i", 0, 0, W - 1, H - 1)
    hdr = (attr("channels", "chlist", chl)
           + attr("compression", "compression", b"\x02")
           + attr("dataWindow", "box2i", box)
           + attr("displayWindow", "box2i", box)
           + attr("lineOrder", "lineOrder", b"\0")
           + attr("pixelAspectRatio", "float", struct.pack("<f", 1.0))
           + attr("screenWindowCenter", "v2f", struct.pack("<ff", 0, 0))
           + attr("screenWindowWidth", "float", struct.pack("<f", 1.0)) + b"\0")
    head = struct.pack("<iI", 0x01312F76, 2) + hdr
    chunks, offs = [], []
    off = len(head) + 8 * H
    for y in range(H):
        comp = zlib.compress(predict(z[y].tobytes()))
        assert len(comp) < W * 4
        chunks.append(struct.pack("<ii", y, len(comp)) + comp)
        offs.append(off)
        off += 8 + len(comp)
    with open(path, "wb") as f:
        f.write(head)
        f.write(struct.pack(f"<{H}Q", *offs))
        for c in chunks:
            f.write(c)


def test_exr_zips(tmp_path):
    z = np.tile(np.linspace(0, 3, 256, dtype=np.float32), (4, 1))
    p = str(tmp_path / "z.exr")
    _zips_file(p, z)
    np.testing.assert_allclose(read_exr_depth(p), z, atol=1e-6)
