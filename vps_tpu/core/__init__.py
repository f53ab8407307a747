from vps_tpu.core.assigner import (  # noqa: F401
    approx_max_iou_assign,
    max_iou_assign,
    point_assign,
)
from vps_tpu.core.sampler import (  # noqa: F401
    combined_sample,
    instance_balanced_sample,
    iou_balanced_neg_sample,
    ohem_sample,
    pseudo_sample,
    random_sample,
)
from vps_tpu.core.targets import (  # noqa: F401
    anchor_target,
    proposal_target,
    SampledRois,
)
