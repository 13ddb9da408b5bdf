from tpu_audio.codecs.snac.model import (SNACConfig, decode_codes,
                                         decode_latent, embed_codes,
                                         init_params)

__all__ = ["SNACConfig", "decode_codes", "decode_latent", "embed_codes",
           "init_params"]
