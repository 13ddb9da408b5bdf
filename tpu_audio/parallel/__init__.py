from tpu_audio.parallel.mesh import make_mesh
from tpu_audio.parallel.shardings import (flow_rules, param_shardings,
                                          shard_tree, transformer_rules,
                                          whisper_rules)

__all__ = ["make_mesh", "param_shardings", "shard_tree", "whisper_rules",
           "transformer_rules", "flow_rules"]
