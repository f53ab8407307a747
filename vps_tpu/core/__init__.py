from vps_tpu.core.assigner import max_iou_assign  # noqa: F401
from vps_tpu.core.sampler import random_sample  # noqa: F401
from vps_tpu.core.targets import (  # noqa: F401
    anchor_target,
    proposal_target,
    SampledRois,
)
