from tpu_audio.codecs.dac.model import (DACConfig, decode_codes, encode,
                                        init_params)

__all__ = ["DACConfig", "encode", "decode_codes", "init_params"]
