from vps_tpu.eval.pq import PQStat  # noqa: F401
from vps_tpu.eval.vpq import vpq_compute, vpq_eval_all  # noqa: F401
from vps_tpu.eval.unified import (  # noqa: F401
    get_unified_pan_result,
    encode_panoptic_video,
)
