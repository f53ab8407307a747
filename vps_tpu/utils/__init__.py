from vps_tpu.utils.checkpoint import save_checkpoint, load_checkpoint  # noqa: F401
from vps_tpu.utils.logging import get_root_logger, set_random_seed  # noqa: F401
