"""tpu-audio: a TPU-native speech framework (JAX/XLA/Pallas/pjit).

Built from scratch with the capabilities of the mlx-swift-audio reference
(speech-to-text, eight TTS engines, neural audio codecs, streaming synthesis),
re-designed TPU-first: fused mel-spectrogram kernels, shape-static on-device
token loops with KV caches, chunked streaming with explicit carried state,
and device-mesh parallelism via jax.sharding.

Public entry points mirror the reference factories
(reference: package/Protocols/TTSEngine.swift:113, STTEngine.swift:74):

    from tpu_audio import STT, TTS
    engine = STT.whisper(model="tiny")
    result = engine.transcribe("clip.wav")
"""

__version__ = "0.1.0"

from tpu_audio.utils.runtime import enable_compilation_cache as _enable_cache

_enable_cache()
del _enable_cache

_LAZY = {
    "STT": "tpu_audio.api.stt",
    "TTS": "tpu_audio.api.tts",
    "AudioResult": "tpu_audio.api.results",
    "TranscriptionResult": "tpu_audio.api.results",
    "StreamingGranularity": "tpu_audio.api.tts",
    "AudioSamplePlayer": "tpu_audio.api.player",
    "AudioFilePlayer": "tpu_audio.api.player",
    "PlaybackController": "tpu_audio.api.playback",
}


def __getattr__(name):
    if name in _LAZY:
        import importlib

        mod = importlib.import_module(_LAZY[name])
        return getattr(mod, name)
    raise AttributeError(f"module 'tpu_audio' has no attribute {name!r}")


__all__ = list(_LAZY) + ["__version__"]
