"""Training: losses and the sharded train step.

The reference ships pre-trained blobs and cannot train
(SURVEY.md: no training framework). Since its weights are unrecoverable
(.MISSING_LARGE_BLOBS), this framework provides the training path needed
to produce equivalents: YOLO detection loss + MultiBin orientation loss,
optax optimizers, dp x tp sharded train steps.
"""

from .losses import multibin_loss, yolo_loss  # noqa: F401
from .trainer import TrainState, make_train_step  # noqa: F401
