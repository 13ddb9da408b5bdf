"""Tensor-parallel serving of QUANTIZED transformer stacks via shard_map.

GSPMD cannot partition the Pallas quant matmuls (custom calls), so the
NamedSharding/jit path replicates quantized leaves (see
parallel/shardings.py). This module provides the megatron layout the
TPU-native way instead: `shard_map` over a (dp=1, tp=N) mesh, where each
device holds its weight shard and runs the int8/int4 kernels on LOCAL
shapes, with explicit `lax.psum` after the row-parallel o/down projections
(nn/transformer.forward_hidden(axis_name=...)).

Layout (megatron, SURVEY §2C):
  - column-parallel (qkv / gate / up / fc1): output channels sharded.
    Fused qkv and gateup leaves are ROW-PERMUTED at load so each shard's
    block is [q_s | k_s | v_s] (resp. [gate_s | up_s]) — a plain
    block-shard of the fused axis would hand shard boundaries that cut
    across the q/k/v sub-matrices.
  - row-parallel (o / down / fc2): input channels sharded; the kernels
    produce f32 partials (activation scale sx is per-shard — exact,
    because y = Σ_shards (acc·sx_shard)·s8[o] distributes over shards),
    summed by the psum in forward_hidden.
  - attention: heads sharded (the per-shard `local_config` divides
    n_heads/kv_heads by tp); the KV cache is per-device local.
  - embed / lm_head / norms: replicated (every device computes identical
    logits, samples with the same key, and emits the same token).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

COL_NAMES = ("qkv", "q", "k", "v", "gate", "up", "gateup", "fc1")
ROW_NAMES = ("o", "down", "fc2")
_WEIGHT_KEYS = ("weight", "weight_i8", "weight_q4p", "weight_q4s",
                "weight_q4", "weight_q8")


def local_config(cfg, tp: int):
    """Per-shard config: heads divided by tp; head_dim pinned so `hd`
    (derived from dim/n_heads when unset) stays the true head size."""
    if cfg.n_heads % tp or cfg.kv_heads % tp or cfg.hidden_dim % tp:
        raise ValueError(f"n_heads {cfg.n_heads} / kv {cfg.kv_heads} / "
                         f"hidden {cfg.hidden_dim} not divisible by tp={tp}")
    return dataclasses.replace(
        cfg, n_heads=cfg.n_heads // tp, n_kv_heads=cfg.kv_heads // tp,
        head_dim=cfg.hd, hidden_dim=cfg.hidden_dim // tp)


def _fused_perm(sections: list[int], tp: int) -> np.ndarray:
    """Row permutation turning [A|B|...] (each section split into tp equal
    parts) into [A_0|B_0|...|A_1|B_1|...] so a block-shard of the result
    gives shard s the rows [A_s|B_s|...]."""
    offs = np.cumsum([0] + sections)
    idx = []
    for s in range(tp):
        for sec, off in zip(sections, offs):
            per = sec // tp
            idx.append(np.arange(off + s * per, off + (s + 1) * per))
    return np.concatenate(idx)


def _permute_leaf(leaf: dict, perm: np.ndarray) -> dict:
    out = {}
    for k, v in leaf.items():
        if k in _WEIGHT_KEYS or k in ("scales", "biases", "scale_i8",
                                          "scales_sg"):
            out[k] = jnp.asarray(np.asarray(v)[..., perm, :])
        elif k == "bias":
            out[k] = jnp.asarray(np.asarray(v)[..., perm])
        else:
            out[k] = v
    return out


def permute_fused(layers_tree: dict, cfg, tp: int) -> dict:
    """Apply the shard-contiguity permutation to fused qkv/gateup leaves
    (host-side, once at load). Unfused leaves shard cleanly as-is."""
    out = dict(layers_tree)
    attn = dict(layers_tree.get("attn", {}))
    if "qkv" in attn:
        hd = cfg.hd
        perm = _fused_perm([cfg.n_heads * hd, cfg.kv_heads * hd,
                            cfg.kv_heads * hd], tp)
        attn["qkv"] = _permute_leaf(attn["qkv"], perm)
        out["attn"] = attn
    mlp = dict(layers_tree.get("mlp", {}))
    if "gateup" in mlp:
        perm = _fused_perm([cfg.hidden_dim, cfg.hidden_dim], tp)
        mlp["gateup"] = _permute_leaf(mlp["gateup"], perm)
        out["mlp"] = mlp
    return out


def _leaf_specs(leaf: dict, kind: str) -> dict:
    """PartitionSpecs for one (stacked, rank-3-weight) linear leaf-dict."""
    specs = {}
    for k, v in leaf.items():
        nd = getattr(v, "ndim", 0)
        if kind == "col":
            if k in _WEIGHT_KEYS or k in ("scales", "biases", "scale_i8",
                                          "scales_sg"):
                specs[k] = P(*([None] * (nd - 2)), "tp", None)
            elif k == "bias":
                specs[k] = P(*([None] * (nd - 1)), "tp")
            else:
                specs[k] = P(*([None] * nd))
        else:  # row-parallel: shard the input (last) axis
            if k in _WEIGHT_KEYS or k in ("scales", "biases", "scales_sg"):
                specs[k] = P(*([None] * (nd - 1)), "tp")
            elif k == "bias":
                raise ValueError(
                    "row-parallel bias unsupported under TP-quant (would "
                    "be psum-multiplied); fold it into the checkpoint or "
                    "serve this model unquantized under TP")
            else:  # scale_i8 (O, 1): per-output-channel, replicated
                specs[k] = P(*([None] * nd))
    return specs


def param_specs(params: dict) -> dict:
    """PartitionSpec pytree for the whole param tree (shard_map in_specs).

    Matches dict structure exactly; norms/embeddings replicated."""

    def repl(v):
        return P(*([None] * getattr(v, "ndim", 0)))

    def rec(d, in_layers):
        out = {}
        for k, v in d.items():
            if isinstance(v, dict):
                if in_layers and k in COL_NAMES and _is_linear_leaf(v):
                    out[k] = _leaf_specs(v, "col")
                elif in_layers and k in ROW_NAMES and _is_linear_leaf(v):
                    out[k] = _leaf_specs(v, "row")
                else:
                    out[k] = rec(v, in_layers or k == "layers")
            else:
                out[k] = repl(v)
        return out

    return rec(params, False)


def _is_linear_leaf(d: dict) -> bool:
    return any(k in d for k in _WEIGHT_KEYS)


def shard_params(params: dict, cfg, mesh: Mesh) -> tuple[dict, dict]:
    """Permute fused leaves, compute specs, place shards. Returns
    (sharded params, spec pytree for shard_map in_specs)."""
    tp = mesh.shape["tp"]
    params = dict(params)
    params["layers"] = permute_fused(params["layers"], cfg, tp)
    specs = param_specs(params)
    placed = jax.tree_util.tree_map(
        lambda v, s: jax.device_put(v, NamedSharding(mesh, s)),
        params, specs)
    return placed, specs


def check_tp_quant_supported(params: dict, cfg, tp: int) -> None:
    """Fail fast on shapes the per-shard kernels cannot serve."""
    local_config(cfg, tp)  # raises on indivisible heads/hidden
    if cfg.dim % tp:
        raise ValueError(f"dim {cfg.dim} not divisible by tp={tp}")
    lay = params.get("layers", {})
    for sub in ("attn", "mlp"):
        for name, leaf in lay.get(sub, {}).items():
            if name in ROW_NAMES and isinstance(leaf, dict) \
                    and "bias" in leaf:
                raise ValueError(f"{sub}.{name} has a bias — unsupported "
                                 "row-parallel under TP-quant")
