from .bbox_head import Shared2FCBBoxHead
from .standard_roi_head import (RoITrainConfig, RoITestConfig, sample_rois,
                                bbox_loss, extract_roi_feats,
                                roi_head_predict, SampledRoIs)

__all__ = ['Shared2FCBBoxHead', 'RoITrainConfig', 'RoITestConfig',
           'sample_rois', 'bbox_loss', 'extract_roi_feats',
           'roi_head_predict', 'SampledRoIs']
