from tpu_audio.utils.logging import get_logger, log_rtf, log_timing
from tpu_audio.utils.profiling import Profiler

__all__ = ["get_logger", "log_timing", "log_rtf", "Profiler"]
