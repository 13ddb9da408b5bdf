from tpu_audio.codecs.snac.model import SNACConfig, decode_codes, init_params

__all__ = ["SNACConfig", "decode_codes", "init_params"]
