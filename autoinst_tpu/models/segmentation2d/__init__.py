"""2D mask generators: SLIC superpixels + pluggable SAM adapter."""

from autoinst_tpu.models.segmentation2d.slic import slic_superpixels
from autoinst_tpu.models.segmentation2d.adapter import MaskAdapter
