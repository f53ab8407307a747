from vps_tpu.models.detectors.panoptic import (  # noqa: F401
    PanopticFuseTrack,
    PanopticFuse,
    PanopticTrack,
    TrackState,
    empty_track_state,
)
