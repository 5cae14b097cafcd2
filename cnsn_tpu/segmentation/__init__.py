from .backbone import SegResNet, seg_resnet50
from .fcn import FCNCNSN, FCNHead, fcn_baseline, fcn_cnsn
from .train_seg import (SegStepFns, SegTrainState, make_seg_optimizer,
                        masked_cross_entropy, seg_metrics)

__all__ = [
    "SegResNet", "seg_resnet50", "FCNCNSN", "FCNHead", "fcn_baseline",
    "fcn_cnsn", "SegStepFns", "SegTrainState", "make_seg_optimizer",
    "masked_cross_entropy", "seg_metrics",
]
