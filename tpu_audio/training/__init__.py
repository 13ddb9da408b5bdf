from tpu_audio.training.whisper import make_train_step

__all__ = ["make_train_step"]
