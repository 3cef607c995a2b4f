from .utils import weight_reduce_loss, reduce_loss
from .cross_entropy_loss import (binary_cross_entropy, cross_entropy,
                                 softmax_cross_entropy, CrossEntropyLoss)
from .smooth_l1_loss import (smooth_l1_loss, l1_loss, balanced_l1_loss,
                             SmoothL1Loss, L1Loss, BalancedL1Loss)
from .focal_loss import (sigmoid_focal_loss, py_focal_loss_with_prob,
                         gaussian_focal_loss, FocalLoss, GaussianFocalLoss)
from .iou_loss import (iou_loss, giou_loss, diou_loss, ciou_loss,
                       bounded_iou_loss, IoULoss, GIoULoss, BoundedIoULoss)
from .accuracy import accuracy
from .gan_loss import gan_lsgan_loss, cycle_consistency_loss
from .gfocal_loss import (quality_focal_loss, distribution_focal_loss,
                          varifocal_loss, QualityFocalLoss,
                          DistributionFocalLoss, VarifocalLoss)
from .extra_losses import (seesaw_ce_loss, dice_loss, ae_loss,
                           knowledge_distillation_kl_div_loss, mse_loss,
                           isr_p_weights, carl_weights)

__all__ = [
    'weight_reduce_loss', 'reduce_loss', 'binary_cross_entropy',
    'cross_entropy', 'softmax_cross_entropy', 'CrossEntropyLoss',
    'smooth_l1_loss', 'l1_loss', 'balanced_l1_loss', 'SmoothL1Loss',
    'L1Loss', 'BalancedL1Loss', 'sigmoid_focal_loss',
    'py_focal_loss_with_prob', 'gaussian_focal_loss', 'FocalLoss',
    'GaussianFocalLoss', 'iou_loss', 'giou_loss', 'diou_loss', 'ciou_loss',
    'IoULoss', 'GIoULoss', 'bounded_iou_loss', 'BoundedIoULoss',
    'accuracy', 'gan_lsgan_loss',
    'cycle_consistency_loss', 'quality_focal_loss',
    'distribution_focal_loss', 'varifocal_loss', 'QualityFocalLoss',
    'DistributionFocalLoss', 'VarifocalLoss',
    'seesaw_ce_loss', 'dice_loss', 'ae_loss',
    'knowledge_distillation_kl_div_loss', 'mse_loss', 'isr_p_weights',
    'carl_weights'
]
