from .box_ops import (
    TO_REMOVE,
    box_area,
    box_iou,
    clip_boxes_to_image,
    decode_boxes,
    encode_boxes,
    small_box_mask,
)
from .losses import (
    binary_cross_entropy_with_logits,
    sigmoid_focal_loss,
    smooth_l1_loss,
    softmax_cross_entropy,
)
from .matcher import BELOW_LOW_QUALITY, BETWEEN_THRESHOLDS, match_proposals
from .nms import (
    batched_nms_mask,
    multiclass_nms_mask,
    nms_mask,
    nms_numpy,
    nms_topk,
)
from .roi_align import roi_align, roi_pool
from .sampler import sample_masks, sample_topk_indices
