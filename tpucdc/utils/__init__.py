"""L8 utils: checkpointing, logging, profiling (SURVEY.md C23, C24, §5.1)."""

from tpucdc.utils.checkpoint import CheckpointManager
from tpucdc.utils.logging import MetricLogger
from tpucdc.utils.profiling import profile_trace, timed_block

__all__ = ["CheckpointManager", "MetricLogger", "profile_trace", "timed_block"]
