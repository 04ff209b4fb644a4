"""autoinst_tpu: a TPU-native unsupervised LiDAR instance segmentation framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of AutoInst
(artonson/autoinst, IROS 2024): map aggregation, ground removal, chunking,
affinity-graph construction, recursive normalized cuts, chunk merging,
instance metrics, and MaskPLS self-training -- all designed TPU-first.

Layering (bottom to top):
  ops/        jit-able array substrate: geometry, voxelization, neighbors,
              pairwise affinity (Pallas), batched eigensolvers
  hostops/    irregular host-side kernels (numpy + optional C++ via ctypes):
              grid-hash 1-NN, voxel downsample over huge maps, pcd IO
  datasets/   KITTI odometry reader, filter chain, feature caches, stage cache
  ground/     Patchwork++-style concentric-zone ground segmentation (JAX)
  ncuts/      affinity fusion + recursive normalized-cut solver (device batched)
  metrics/    AP/P/R/F1, S_assoc, panoptic PQ suite (host numpy, parity-exact)
  models/     MaskPLS (sparse-conv backbone + masked transformer decoder),
              TARL and DINOv2 feature extractors, all in JAX/Flax
  parallel/   mesh construction + shardings for multi-chip SPMD
  pipeline/   the public run_pipeline/config API surface
"""

__version__ = "0.1.0"

import jax as _jax

# Geometry, affinity and eigensolver math is float32 and relies on true f32
# matmuls; TPU's default bf16 MXU passes lose ~3 decimal digits, which is
# fatal for pose round-trips and Laplacian spectra. Model code that wants
# MXU-native speed uses explicit bfloat16 dtypes, which this flag does not
# affect.
_jax.config.update("jax_default_matmul_precision", "highest")
