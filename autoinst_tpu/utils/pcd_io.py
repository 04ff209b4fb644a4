"""Binary .pcd reader/writer (PCL format), replacing Open3D file IO.

Writes FIELDS x y z rgb with the PCL packed-uint32 color convention, which
is also what Open3D emits, so artifacts interoperate with standard tooling.
Reference IO call sites: point_cloud_utils.py:65-75, ncuts_utils.py:207-223.
"""

from __future__ import annotations

import os

import numpy as np

from autoinst_tpu.utils.pointcloud import PointCloud


def write_pcd_file(path: str, pcd: PointCloud):
    n = len(pcd)
    with_color = pcd.has_colors()
    fields = "x y z rgb" if with_color else "x y z"
    sizes = "4 4 4 4" if with_color else "4 4 4"
    types = "F F F U" if with_color else "F F F"
    counts = "1 1 1 1" if with_color else "1 1 1"
    header = (
        "# .PCD v0.7 - Point Cloud Data file format\n"
        "VERSION 0.7\n"
        f"FIELDS {fields}\n"
        f"SIZE {sizes}\n"
        f"TYPE {types}\n"
        f"COUNT {counts}\n"
        f"WIDTH {n}\n"
        "HEIGHT 1\n"
        "VIEWPOINT 0 0 0 1 0 0 0\n"
        f"POINTS {n}\n"
        "DATA binary\n"
    )
    xyz = pcd.points.astype(np.float32)
    if with_color:
        rgb8 = np.clip(np.round(pcd.colors * 255.0), 0, 255).astype(np.uint32)
        packed = (rgb8[:, 0] << 16) | (rgb8[:, 1] << 8) | rgb8[:, 2]
        body = np.zeros((n, 4), np.float32)
        body[:, :3] = xyz
        body[:, 3] = packed.view(np.float32)
    else:
        body = xyz
    with open(path, "wb") as fh:
        fh.write(header.encode())
        fh.write(body.tobytes())


def read_pcd_file(path: str) -> PointCloud:
    with open(path, "rb") as fh:
        raw = fh.read()
    end = raw.index(b"DATA binary\n") + len(b"DATA binary\n")
    header = raw[:end].decode().splitlines()
    meta = {}
    for line in header:
        key = line.split(" ", 1)[0]
        meta[key] = line.split(" ", 1)[1] if " " in line else ""
    fields = meta["FIELDS"].split()
    n = int(meta["POINTS"])
    body = np.frombuffer(raw[end:], np.float32,
                         count=n * len(fields)).reshape(n, len(fields))
    points = body[:, :3].astype(np.float64)
    colors = None
    if "rgb" in fields:
        packed = body[:, fields.index("rgb")].view(np.uint32)
        colors = np.stack([(packed >> 16) & 0xFF, (packed >> 8) & 0xFF,
                           packed & 0xFF], axis=1).astype(np.float64) / 255.0
    return PointCloud(points, colors)


def write_pcd(folder: str, name: str, pcd: PointCloud, seq=None, cur_idx=None):
    """Reference naming contract (point_cloud_utils.py:65-75)."""
    out_fn = os.path.join(folder, f"{name}{seq}_{cur_idx}.pcd")
    if seq is None:
        out_fn = os.path.join(folder, name)
    write_pcd_file(out_fn, pcd)


def get_merge_pcds(out_folder: str) -> list[PointCloud]:
    """Load all chunk .pcds of a map, sorted by filename
    (reference ncuts_utils.py:207-223)."""
    files = sorted(f for f in os.listdir(out_folder) if f.endswith(".pcd"))
    return [read_pcd_file(os.path.join(out_folder, f)) for f in files]
