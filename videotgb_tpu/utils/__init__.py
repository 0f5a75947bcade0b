from videotgb_tpu.utils.logging import get_logger, print_config_tree
from videotgb_tpu.utils.rng import RngStream

__all__ = ["get_logger", "print_config_tree", "RngStream"]
