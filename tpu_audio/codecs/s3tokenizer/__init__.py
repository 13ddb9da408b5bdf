from tpu_audio.codecs.s3tokenizer.model import (S3TokenizerConfig, init_params,
                                                quantize)

__all__ = ["S3TokenizerConfig", "init_params", "quantize"]
