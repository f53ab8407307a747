from vps_tpu.models.detectors.panoptic import (  # noqa: F401
    PanopticFuseTrack,
    PanopticFuse,
    PanopticTrack,
    TrackState,
    empty_track_state,
    predict_video,
    run_video_streams,
)
from vps_tpu.models.detectors.single_stage import RetinaNet, FCOS  # noqa: F401
from vps_tpu.models.detectors.cascade import (  # noqa: F401
    CascadeRCNN,
    HybridTaskCascade,
)
from vps_tpu.models.detectors.two_stage import (  # noqa: F401
    FasterRCNN,
    MaskRCNN,
    FastRCNN,
    RPN,
    DoubleHeadRCNN,
    MaskScoringRCNN,
    GridRCNN,
)
