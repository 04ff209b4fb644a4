from autoinst_tpu.models.segmentation2d.sam.model import (Sam, SamConfig,
                                                          tiny_config,
                                                          vit_b_config,
                                                          vit_l_config)
from autoinst_tpu.models.segmentation2d.sam.amg import SamMaskGenerator
from autoinst_tpu.models.segmentation2d.sam.convert import (
    convert_sam_state_dict, load_torch_checkpoint)
