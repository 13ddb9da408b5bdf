"""Param-tree helpers.

Model parameters throughout the framework are plain nested dicts of
jnp arrays ("param trees"): trivially shardable with NamedSharding,
loadable from safetensors by key path, and friendly to lax.scan layer
stacking.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np


def flatten(tree: dict, prefix: str = "", sep: str = ".") -> dict[str, Any]:
    """Nested dict → {'a.b.c': leaf} flat dict."""
    out: dict[str, Any] = {}
    for k, v in tree.items():
        key = f"{prefix}{sep}{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(flatten(v, key, sep))
        else:
            out[key] = v
    return out


def unflatten(flat: dict[str, Any], sep: str = ".") -> dict:
    """{'a.b.c': leaf} → nested dict."""
    tree: dict = {}
    for key, v in flat.items():
        parts = key.split(sep)
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def param_count(tree) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(tree))


def cast(tree, dtype) -> Any:
    """Cast floating leaves to dtype, leave integer leaves untouched."""
    def _cast(x):
        if jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x
    return jax.tree_util.tree_map(_cast, tree)


def stack_layers(layer_trees: list[dict]) -> dict:
    """Stack N per-layer param trees into one tree with a leading (N, ...) axis
    on every leaf — the layout consumed by lax.scan-over-layers blocks."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layer_trees)


def map_leaves_with_path(fn: Callable[[str, Any], Any], tree: dict) -> dict:
    return unflatten({k: fn(k, v) for k, v in flatten(tree).items()})
