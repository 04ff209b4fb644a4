"""TARL point-feature extractor (JAX MinkUNet, 96-d output)."""

from autoinst_tpu.models.tarl.extractor import TarlExtractor
