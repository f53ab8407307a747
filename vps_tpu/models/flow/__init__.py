from vps_tpu.models.flow.liteflow import LiteFlowNetCorr  # noqa: F401
from vps_tpu.models.flow.tcea import TCEAFusion  # noqa: F401
from vps_tpu.models.flow.flownet2 import (  # noqa: F401
    FlowNet2,
    FlowNetC,
    FlowNetS,
    FlowNetSD,
    FlowNetFusion,
)
