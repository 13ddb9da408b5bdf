"""S3Tokenizer checkpoint conversion (mlx-community/S3TokenizerV{2,3}).

The checkpoints are MLX module-tree dumps, so key names already match this
framework's tree; only the conv layouts differ: MLX Conv1d stores
(O, K, I/groups) and this framework uses (K, I/groups, O). Round-3 fix:
the chatterbox / cosyvoice loaders previously unflattened these
checkpoints without the transpose, which the loader-manifest suite caught
as a shape mismatch on every conv weight.
"""

from __future__ import annotations

from tpu_audio.utils import pytree


def convert(flat: dict) -> dict:
    out = {}
    for k, v in flat.items():
        if v.ndim == 3 and k.endswith(".weight"):
            v = v.transpose(1, 2, 0)  # MLX (O, K, I) → (K, I, O)
        out[k] = v
    return pytree.unflatten(out)
