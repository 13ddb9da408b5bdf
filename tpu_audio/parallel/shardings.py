"""Param-tree sharding rules (megatron-style TP + DP batch).

Rules are (path-regex, PartitionSpec) pairs matched against flattened param
paths; stacked scan-layers get their leading layer axis automatically
prepended as unsharded. Column-parallel: q/k/v, gate/up, fc1 shard the
output dim; row-parallel: o, down, fc2 shard the input dim, and XLA GSPMD
inserts the psum on their outputs.
"""

from __future__ import annotations

import re

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpu_audio.utils import pytree

# (regex on flat path, spec for the LAST ndims of the leaf)
transformer_rules: list[tuple[str, P]] = [
    (r"\.attn\.([qkv]|qkv)\.weight$", P("tp", None)),
    (r"\.attn\.([qkv]|qkv)\.bias$", P("tp")),
    (r"\.attn\.o\.weight$", P(None, "tp")),
    (r"\.mlp\.(gate|up|gateup|fc1)\.weight$", P("tp", None)),
    (r"\.mlp\.(gate|up|gateup|fc1)\.bias$", P("tp")),
    (r"\.mlp\.(down|fc2)\.weight$", P(None, "tp")),
    (r"(embed|token_embedding|lm_head)\.weight$", P(None, None)),
]

# S3Gen / CosyVoice flow graphs (conformer encoder + CFM estimator /
# CosyVoice3 DiT) — the non-LM stages of the TTS serving unit (the
# reference's S3Token2Wav, Codec/S3Gen/S3Gen.swift:240-343). Attention and
# FFN projections shard megatron-style over tp; the conv stacks (HiFT
# vocoder, U-Net res blocks, CAMPPlus) stay replicated — they are
# dispatch-bound at tiny channel counts (docs/BENCHMARKS.md "S3Gen at
# production sizes"), so sharding them buys collectives, not time.
flow_rules: list[tuple[str, P]] = [
    # ESPnet rel-pos conformer attention (Transformer/Attention.swift)
    (r"\.self_attn\.linear_[qkv]\.weight$", P("tp", None)),
    (r"\.self_attn\.linear_[qkv]\.bias$", P("tp")),
    (r"\.self_attn\.linear_pos\.weight$", P("tp", None)),
    (r"\.self_attn\.pos_bias_[uv]$", P("tp", None)),
    (r"\.self_attn\.linear_out\.weight$", P(None, "tp")),
    (r"\.feed_forward\.w_1\.weight$", P("tp", None)),
    (r"\.feed_forward\.w_1\.bias$", P("tp")),
    (r"\.feed_forward\.w_2\.weight$", P(None, "tp")),
    # Matcha-estimator / DiT transformer blocks (MatchaTransformer.swift,
    # Flow/DiT.swift — to_q/to_k/to_v/to_out naming)
    (r"\.attn\.(q|k|v|to_q|to_k|to_v)\.weight$", P("tp", None)),
    (r"\.attn\.(q|k|v|to_q|to_k|to_v)\.bias$", P("tp")),
    (r"\.attn\.(o|to_out)\.weight$", P(None, "tp")),
    (r"\.ff\.fc1\.weight$", P("tp", None)),
    (r"\.ff\.fc1\.bias$", P("tp")),
    (r"\.ff\.fc2\.weight$", P(None, "tp")),
]

whisper_rules: list[tuple[str, P]] = transformer_rules + [
    (r"\.cross_attn\.[qkv]\.weight$", P("tp", None)),
    (r"\.cross_attn\.[qkv]\.bias$", P("tp")),
    (r"\.cross_attn\.o\.weight$", P(None, "tp")),
    (r"conv[12]\.weight$", P(None, None, "tp")),
    (r"conv[12]\.bias$", P("tp")),
]


def _spec_for(path: str, leaf, rules, layer_prefixes: tuple[str, ...]) -> P:
    ndim = getattr(leaf, "ndim", 0)
    stacked = any(p in path for p in layer_prefixes)
    for pat, spec in rules:
        if re.search(pat, path):
            parts = list(spec)
            if stacked:
                parts = [None] + parts
            # pad/crop to leaf rank
            while len(parts) < ndim:
                parts.append(None)
            parts = parts[:ndim]
            return P(*parts)
    return P(*([None] * ndim))


def param_shardings(tree, mesh: Mesh, rules=None,
                    layer_prefixes: tuple[str, ...] = ("blocks", "layers")):
    """Return a pytree of NamedSharding matching `tree`."""
    rules = rules if rules is not None else transformer_rules
    flat = pytree.flatten(tree)
    specs = {k: NamedSharding(mesh, _spec_for(k, v, rules, layer_prefixes))
             for k, v in flat.items()}
    return pytree.unflatten(specs)


def shard_tree(tree, mesh: Mesh, rules=None, **kw):
    shardings = param_shardings(tree, mesh, rules, **kw)
    return jax.tree_util.tree_map(jax.device_put, tree, shardings)
