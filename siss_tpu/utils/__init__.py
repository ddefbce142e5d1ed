from siss_tpu.utils.tracker import Tracker
from siss_tpu.utils.checkpoint import CheckpointManager

__all__ = ["Tracker", "CheckpointManager"]
