"""ctypes binding for the C++ concentric-zone ground segmentation
(native/ground_seg.cc), the host twin of ground/patchwork.py."""

from __future__ import annotations

import ctypes

import numpy as np

from autoinst_tpu.hostops.grid_nn import _load_native


def ground_segment_native(points: np.ndarray, sensor_height: float = 1.723,
                          th_seeds: float = 0.5, th_dist: float = 0.125,
                          uprightness_thr: float = 0.707,
                          num_iter: int = 3) -> np.ndarray | None:
    """Boolean ground mask via the C++ kernel; None if the lib is absent."""
    lib = _load_native()
    if lib is None:
        return None
    if not hasattr(lib, "_ground_configured"):
        lib.ground_segment.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
            ctypes.c_double, ctypes.c_double, ctypes.c_double,
            ctypes.c_double, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.ground_segment.restype = None
        lib._ground_configured = True
    pts = np.ascontiguousarray(points[:, :3], np.float64)
    out = np.zeros(len(pts), np.uint8)
    lib.ground_segment(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), len(pts),
        ctypes.c_double(sensor_height), ctypes.c_double(th_seeds),
        ctypes.c_double(th_dist), ctypes.c_double(uprightness_thr),
        ctypes.c_int(num_iter),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out.astype(bool)
