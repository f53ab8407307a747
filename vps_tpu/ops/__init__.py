from vps_tpu.ops.box import (  # noqa: F401
    bbox2delta,
    delta2bbox,
    bbox_overlaps,
    bbox_flip,
    clip_boxes,
    bbox_area,
)
from vps_tpu.ops.anchors import AnchorGenerator, grid_anchors, valid_flags  # noqa: F401
from vps_tpu.ops.nms import nms, soft_nms, batched_nms, multiclass_nms  # noqa: F401
from vps_tpu.ops.warp import flow_warp, grid_sample, resample2d, channel_norm  # noqa: F401
from vps_tpu.ops.correlation import correlation  # noqa: F401
from vps_tpu.ops.roi_align import roi_align, multilevel_roi_align  # noqa: F401
from vps_tpu.ops.roi_pool import roi_pool, deform_roi_pool  # noqa: F401
from vps_tpu.ops.deform_conv import deform_conv2d  # noqa: F401
from vps_tpu.ops.masked_conv import masked_conv2d  # noqa: F401
from vps_tpu.ops.losses import (  # noqa: F401
    sigmoid_focal_loss,
    smooth_l1_loss,
    softmax_cross_entropy,
    binary_cross_entropy_with_logits,
    accuracy,
    mse_loss,
    balanced_l1_loss,
    iou_loss,
    bounded_iou_loss,
    giou_loss,
    ghm_c_loss,
    ghm_r_loss,
)
from vps_tpu.ops.mask import crop_and_resize_masks, paste_masks  # noqa: F401
