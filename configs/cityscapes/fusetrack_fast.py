# VPSNet-FuseTrack fast-inference preset: identical recipe/data to
# fusetrack.py with the documented TPU speed/accuracy tradeoffs applied
# (see PERF.md and vps_tpu.zoo.fast_overrides): nearest-neighbour DCN
# sampling in the semantic head and sample_num=1 RoIAlign. The exact
# pipeline is gather-index-bound on TPU; this preset cuts the two largest
# index consumers ~4x.
_base_ = "fusetrack.py"

from vps_tpu import zoo

model = zoo.fast_overrides(zoo.fusetrack_model_cfg(depth=50))
work_dir = "./work_dirs/cityscapes_vps/fusetrack_fast"
