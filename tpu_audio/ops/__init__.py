from tpu_audio.ops import frontends, mel_filters, stft, windows

__all__ = ["frontends", "mel_filters", "stft", "windows"]
