"""Normalized-cut instance segmentation core (batched TPU spectral solver)."""

from autoinst_tpu.ncuts.solver import ncut_threshold_sweep, recursive_ncut
