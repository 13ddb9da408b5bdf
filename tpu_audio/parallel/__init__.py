from tpu_audio.parallel.mesh import make_mesh
from tpu_audio.parallel.shardings import (param_shardings, transformer_rules,
                                          whisper_rules)

__all__ = ["make_mesh", "param_shardings", "whisper_rules", "transformer_rules"]
