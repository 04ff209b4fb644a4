"""DINOv2 dense feature extractor (Flax ViT-S/14 with reduced stride)."""

from autoinst_tpu.models.dino.vit import ViTDenseExtractor
