"""Ground-plane segmentation (Patchwork++-style, jit-compiled)."""

from autoinst_tpu.ground.patchwork import GroundConfig, estimate_ground
