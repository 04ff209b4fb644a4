"""jit-able array substrate: geometry, voxel ops, neighbors, affinity, eigensolvers."""

from autoinst_tpu.ops.geometry import (
    make_transform,
    transform_points,
    correct_kitti_scan_calibration,
)
from autoinst_tpu.ops.voxel import voxel_downsample, voxel_keys
from autoinst_tpu.ops.neighbors import (
    nn1_bruteforce,
    radius_mean_pool,
    statistical_inlier_mask,
)
