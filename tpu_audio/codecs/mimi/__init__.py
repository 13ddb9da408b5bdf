from tpu_audio.codecs.mimi.model import MimiConfig, decode, encode, init_params

__all__ = ["MimiConfig", "decode", "encode", "init_params"]
