from vps_tpu.data.coco import CocoIndex  # noqa: F401
from vps_tpu.data.dataset import CityscapesVPSDataset, build_dataset  # noqa: F401
from vps_tpu.data.loader import build_loader  # noqa: F401
from vps_tpu.data.xml_style import VOCDataset, WIDERFaceDataset, XMLDataset  # noqa: F401
