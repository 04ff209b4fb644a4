"""MaskPLS in JAX: sparse MinkUNet backbone + masked transformer decoder.

TPU-native replacement for the reference's MinkowskiEngine/torch stack
(reference: self-training/mask_pls/). Sparse convolutions run as
gather + GEMM over host-precomputed coordinate plans; everything else is
pure jit-compiled Flax.
"""
