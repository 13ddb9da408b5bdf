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
    (r"\.attn\.[qkv]\.weight$", P("tp", None)),
    (r"\.attn\.[qkv]\.bias$", P("tp")),
    (r"\.attn\.o\.weight$", P(None, "tp")),
    (r"\.mlp\.(gate|up|fc1)\.weight$", P("tp", None)),
    (r"\.mlp\.(gate|up|fc1)\.bias$", P("tp")),
    (r"\.mlp\.(down|fc2)\.weight$", P(None, "tp")),
    (r"(embed|token_embedding|lm_head)\.weight$", P(None, None)),
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
