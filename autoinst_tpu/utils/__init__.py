"""Host utilities: point-cloud container, pcd IO, colors, profiling."""

from autoinst_tpu.utils.pointcloud import PointCloud
from autoinst_tpu.utils.colors import (generate_random_colors,
                                       generate_random_colors_map)
