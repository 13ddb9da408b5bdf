from tpu_audio.models.kokoro.config import KokoroConfig

__all__ = ["KokoroConfig"]
