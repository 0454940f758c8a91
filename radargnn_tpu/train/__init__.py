from radargnn_tpu.train.losses import (  # noqa: F401
    weighted_cross_entropy, masked_huber_box_loss, detection_loss,
    adapt_bb_orientation_angle, invert_bb_orientation_angle_adaption,
)
from radargnn_tpu.train.trainer import Trainer, TrainState, set_seeds  # noqa: F401
