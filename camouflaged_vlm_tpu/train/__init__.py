from .losses import (
    bce_with_logits,
    balanced_bce_with_logits,
    soft_iou_loss,
    soft_dice_loss,
    edge_dice_loss,
    segmentation_loss,
)
from .optim import make_optimizer, cosine_epoch_schedule, trainable_mask
from .train_step import (
    SCANNED_BATCH_KEYS,
    TrainState,
    make_train_step,
    create_train_state,
)
from .maple import (
    MAPLE_TRAINABLE_SUBTREES,
    make_maple_optimizer,
    make_maple_train_step,
)
