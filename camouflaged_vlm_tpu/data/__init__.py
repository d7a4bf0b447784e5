from .ovcamo import (
    TRAIN_CLASS_NAMES,
    TEST_CLASS_NAMES,
    OVCamoIndex,
    OVCamoSample,
)
from .transforms import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    OPENAI_CLIP_MEAN,
    OPENAI_CLIP_STD,
    sam_image_transform,
    clip_image_transform,
    clip_ones_alpha,
    mask_to_target,
)
from .loader import EvalSample, iter_eval_batches, iter_train_batches
