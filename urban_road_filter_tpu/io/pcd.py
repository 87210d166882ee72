"""PCD (Point Cloud Data) file I/O.

Replaces the reference's PCL/rosbag input path (SURVEY.md section 0) with a
dependency-free reader/writer for the PCD v0.7 format (ascii and binary),
plus NPZ scan-sequence helpers for the replay harness.  A native C++ fast
path (runtime.native) parses binary PCD about an order of magnitude faster;
this module transparently uses it when the extension is built.
"""

from __future__ import annotations

import io
import os
from typing import Iterator, Sequence

import numpy as np

__all__ = ["read_pcd", "write_pcd", "write_scan_sequence", "read_scan_sequence"]

_FIELD_DTYPES = {("F", 4): "f4", ("F", 8): "f8",
                 ("I", 1): "i1", ("I", 2): "i2", ("I", 4): "i4",
                 ("U", 1): "u1", ("U", 2): "u2", ("U", 4): "u4"}


def _parse_header(f) -> dict:
    hdr: dict = {}
    while True:
        line = f.readline()
        if not line:
            raise ValueError("truncated PCD header")
        if isinstance(line, bytes):
            line = line.decode("ascii", "replace")
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        key, _, rest = line.partition(" ")
        hdr[key.upper()] = rest.split()
        if key.upper() == "DATA":
            hdr["DATA"] = rest.strip()
            return hdr


def read_pcd(path: str | os.PathLike, use_native: bool = True) -> np.ndarray:
    """Read a PCD file -> (N, 4) float32 [x, y, z, intensity].

    Missing intensity fields are zero-filled.  Supports ascii and binary
    DATA (binary_compressed is rejected with a clear error)."""
    if use_native:
        try:
            from urban_road_filter_tpu.runtime.native import read_pcd_native

            out = read_pcd_native(str(path))
            if out is not None:
                return out
        except Exception:
            pass  # fall through to the Python reader

    with open(path, "rb") as f:
        hdr = _parse_header(f)
        fields = hdr.get("FIELDS", [])
        sizes = [int(s) for s in hdr.get("SIZE", [])]
        types = hdr.get("TYPE", [])
        counts = [int(c) for c in hdr.get("COUNT", ["1"] * len(fields))]
        if "POINTS" in hdr:
            n = int(hdr["POINTS"][0])
        else:  # spec-legal: WIDTH x HEIGHT without POINTS
            n = int(hdr.get("WIDTH", ["0"])[0]) * int(hdr.get("HEIGHT", ["1"])[0])
        data_kind = hdr["DATA"]

        dtype_fields = []
        for name, size, typ, cnt in zip(fields, sizes, types, counts):
            base = _FIELD_DTYPES.get((typ, size))
            if base is None:
                raise ValueError(f"unsupported PCD field type {typ}{size}")
            if cnt == 1:
                dtype_fields.append((name, base))
            else:
                dtype_fields.append((name, base, (cnt,)))
        dt = np.dtype(dtype_fields)

        if data_kind == "ascii":
            raw = np.loadtxt(io.StringIO(f.read().decode("ascii", "replace")),
                             dtype=np.float64, ndmin=2)
            rec = np.zeros(raw.shape[0], dt)
            col = 0
            for name, size, typ, cnt in zip(fields, sizes, types, counts):
                take = raw[:, col:col + cnt]
                rec[name] = take[:, 0] if cnt == 1 else take
                col += cnt
        elif data_kind == "binary":
            rec = np.frombuffer(f.read(n * dt.itemsize), dtype=dt, count=n)
        else:
            raise ValueError(f"PCD DATA kind {data_kind!r} not supported "
                             "(decompress binary_compressed first)")

    out = np.zeros((rec.shape[0], 4), np.float32)
    for i, name in enumerate(("x", "y", "z")):
        if name in rec.dtype.names:
            out[:, i] = rec[name].astype(np.float32)
    for cand in ("intensity", "i", "reflectivity"):
        if cand in (rec.dtype.names or ()):
            out[:, 3] = np.asarray(rec[cand], np.float32).reshape(rec.shape[0], -1)[:, 0]
            break
    return out


def write_pcd(path: str | os.PathLike, points: np.ndarray,
              binary: bool = True) -> None:
    """Write (N, >=3) points as PCD v0.7 x/y/z/intensity."""
    pts = np.zeros((len(points), 4), np.float32)
    pts[:, :min(4, points.shape[1])] = points[:, :4]
    n = len(pts)
    header = (
        "# .PCD v0.7 - Point Cloud Data file format\n"
        "VERSION 0.7\nFIELDS x y z intensity\nSIZE 4 4 4 4\nTYPE F F F F\n"
        f"COUNT 1 1 1 1\nWIDTH {n}\nHEIGHT 1\nVIEWPOINT 0 0 0 1 0 0 0\n"
        f"POINTS {n}\nDATA {'binary' if binary else 'ascii'}\n")
    with open(path, "wb") as f:
        f.write(header.encode("ascii"))
        if binary:
            f.write(np.ascontiguousarray(pts).tobytes())
        else:
            np.savetxt(f, pts, fmt="%.6f")


def write_scan_sequence(path: str | os.PathLike, scans: Sequence[np.ndarray]) -> None:
    """NPZ scan sequence: the rosbag replacement for the replay harness."""
    np.savez_compressed(path, **{f"scan_{i:06d}": s for i, s in enumerate(scans)})


def read_scan_sequence(path: str | os.PathLike) -> Iterator[np.ndarray]:
    with np.load(path) as z:
        for key in sorted(z.files):
            yield z[key]
