"""Irregular host-side kernels (numpy + optional C++ fast paths).

Map-scale work (tens of millions of points) with dynamic output shapes:
voxel-grid downsampling of whole maps and grid-hash exact 1-NN for label
transfer. The per-chunk static-shape equivalents live in autoinst_tpu.ops
and run on device.
"""

from autoinst_tpu.hostops.voxel_np import voxel_downsample_np
from autoinst_tpu.hostops.grid_nn import grid_nn1
