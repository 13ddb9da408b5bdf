"""Sequence parallelism for long-audio encoding.

SURVEY §2C/§5.7: the reference caps sequence length algorithmically (30 s
Whisper windows); for very long single-shot encodes the TPU build shards
the mel TIME axis across devices and lets GSPMD insert the all-to-alls
around attention (Ulysses-style through sharding constraints): activations
are sharded (…, T/sp, D) in the convs/MLPs and resharded over heads inside
attention automatically.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpu_audio.models.whisper import model as wmodel


def encode_sequence_parallel(params, cfg, mel: jax.Array, mesh: Mesh,
                             axis: str = "tp") -> jax.Array:
    """Whisper encoder with the frame axis sharded over `axis`.

    mel (B, 3000, n_mels) → features (B, 1500, D), time-sharded in,
    time-sharded out; attention internally reshards (GSPMD all-to-all).
    """
    in_shard = NamedSharding(mesh, P(None, axis, None))

    def run(params, mel):
        mel = jax.lax.with_sharding_constraint(mel, in_shard)
        feats = wmodel.encode(params, cfg, mel)
        return jax.lax.with_sharding_constraint(feats, in_shard)

    return jax.jit(run)(params, mel)
