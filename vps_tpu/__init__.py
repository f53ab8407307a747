"""vps_tpu — a TPU-native (JAX/XLA/Pallas) video panoptic segmentation framework.

Built from scratch with the capabilities of VPSNet (mcahny/vps, CVPR 2020):
two-stage detection (ResNet-FPN, RPN, box/mask heads), UPSNet-style panoptic
fusion with a deformable-conv semantic head, flow-guided temporal feature
aggregation (FlowNet2 + LiteFlowNet correlation + TCEA attention), and a
MaskTrack-style re-identification head — all designed static-shape-first for
XLA, with Pallas kernels for the gather-heavy ops and `jax.sharding` / `pjit`
for scale-out instead of NCCL DDP.
"""

__version__ = "0.1.0"

from vps_tpu.registry import Registry, build_from_cfg  # noqa: F401
from vps_tpu.config import Config  # noqa: F401
