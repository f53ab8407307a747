from vps_tpu.models import layers  # noqa: F401
from vps_tpu.models.resnet import ResNet, ResNeXt  # noqa: F401
from vps_tpu.models.hrnet import HRNet  # noqa: F401
from vps_tpu.models.ssd_vgg import SSDVGG  # noqa: F401
from vps_tpu.models.fpn import FPN, HRFPN  # noqa: F401
from vps_tpu.models.rpn_head import RPNHead  # noqa: F401
from vps_tpu.models.anchor_heads import RetinaHead, SSDHead, FCOSHead  # noqa: F401
from vps_tpu.models.ga_heads import (  # noqa: F401
    GARPNHead,
    GARetinaHead,
    GuidedAnchorHead,
)
from vps_tpu.models.reppoints import RepPointsHead  # noqa: F401
from vps_tpu.models.bbox_head import (  # noqa: F401
    DoubleConvFCBBoxHead,
    SharedFCBBoxHead,
)
from vps_tpu.models.mask_head import FCNMaskHead  # noqa: F401
from vps_tpu.models.mask_heads import (  # noqa: F401
    FusedSemanticHead,
    GridHead,
    HTCMaskHead,
    MaskIoUHead,
)
from vps_tpu.models.resnet import ResLayer  # noqa: F401
from vps_tpu.models.panoptic_fpn import UPSNetFPN  # noqa: F401
from vps_tpu.models.track_head import TrackHead  # noqa: F401
from vps_tpu.models.builder import build_detector  # noqa: F401
from vps_tpu.models import detectors  # noqa: F401  (registers DETECTORS)
