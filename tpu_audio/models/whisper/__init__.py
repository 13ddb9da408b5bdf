from tpu_audio.models.whisper.config import WhisperConfig
from tpu_audio.models.whisper.pipeline import WhisperPipeline

__all__ = ["WhisperConfig", "WhisperPipeline"]
