"""Safetensors loading + key-remap/sanitize machinery.

Every model's static load() in the reference follows the same shape —
snapshot → loadArrays(safetensors) → sanitize key remaps/transposes →
quantize-aware update (package/STT/Whisper/WhisperModel.swift:144-214,
package/TTS/Chatterbox/ChatterboxModel.swift:223-343). Here the sanitize
step is a list of (regex, replacement) rules plus per-key transforms, and
the result is a nested param tree ready for the functional models.
"""

from __future__ import annotations

import glob
import json
import os
import re
from typing import Callable

import jax.numpy as jnp
import numpy as np

from tpu_audio.utils import pytree
from tpu_audio.utils.logging import get_logger

_log = get_logger("model")


def load_safetensors_dir(path: str) -> dict[str, np.ndarray]:
    """Load all *.safetensors under a directory into one flat dict."""
    from safetensors import safe_open

    files = sorted(glob.glob(os.path.join(path, "*.safetensors")))
    if not files:
        raise FileNotFoundError(f"no .safetensors files in {path}")
    flat: dict[str, np.ndarray] = {}
    for f in files:
        with safe_open(f, framework="numpy") as sf:
            for k in sf.keys():
                flat[k] = sf.get_tensor(k)
    return flat


def load_config_json(path: str) -> dict:
    with open(os.path.join(path, "config.json")) as f:
        return json.load(f)


def apply_rules(flat: dict[str, np.ndarray],
                rules: list[tuple[str, str]],
                transforms: dict[str, Callable] | None = None,
                drop: list[str] | None = None) -> dict[str, np.ndarray]:
    """Rename keys by regex rules applied IN SEQUENCE (a key may be
    rewritten by several rules — e.g. HF layouts need the 'model.' strip,
    the layers rename AND the per-projection rename), apply per-key
    transforms (matched on the NEW key by regex), drop unwanted keys."""
    out = {}
    drop_res = [re.compile(d) for d in (drop or [])]
    transform_res = [(re.compile(k), fn) for k, fn in (transforms or {}).items()]
    for key, val in flat.items():
        if any(d.search(key) for d in drop_res):
            continue
        new_key = key
        for pat, repl in rules:
            new_key = re.sub(pat, repl, new_key)
        for pat, fn in transform_res:
            if pat.search(new_key):
                val = fn(val)
        out[new_key] = val
    return out


def stack_numbered_layers(flat: dict[str, np.ndarray], prefix: str) -> dict:
    """Collect '{prefix}.{i}.rest' keys into a tree with leaves stacked on a
    leading layer axis (the lax.scan layout), plus all remaining keys.

    Returns the full nested tree.
    """
    layer_re = re.compile(rf"^{re.escape(prefix)}\.(\d+)\.(.+)$")
    per_layer: dict[int, dict] = {}
    rest = {}
    for k, v in flat.items():
        m = layer_re.match(k)
        if m:
            per_layer.setdefault(int(m.group(1)), {})[m.group(2)] = v
        else:
            rest[k] = v
    tree = pytree.unflatten(rest)
    if per_layer:
        n = max(per_layer) + 1
        layer_trees = [pytree.unflatten(per_layer[i]) for i in range(n)]
        stacked = pytree.stack_layers(layer_trees)
        node = tree
        parts = prefix.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = stacked
    return tree


# leaf names that may legitimately differ between a checkpoint and
# init_params (fp "weight" ↔ quantized triples/pairs)
LEAF_NAMES = {
    "weight", "bias", "weight_q4", "weight_q8", "weight_i8", "scales",
    "biases", "scale_i8", "weight_v", "weight_g", "alpha", "codebook",
    "running_mean", "running_var", "num_batches_tracked",
}


def module_prefixes(keys) -> set[str]:
    """Flat param keys → module-prefix set ('enc.blocks.attn.q.weight' →
    'enc.blocks.attn.q'); non-standard leaves stay whole keys."""
    mods = set()
    for k in keys:
        head, _, leaf = k.rpartition(".")
        mods.add(head if leaf in LEAF_NAMES and head else k)
    return mods


def validate_tree(loaded, init_fn, name: str = "model",
                  check_shapes: bool = True) -> None:
    """Launch-day loader hardening: compare a sanitized checkpoint tree
    against the model's own init_params schema (via jax.eval_shape — no
    allocation), raising ModelLoadError on missing/unexpected modules or
    shape drift instead of silently producing garbage audio.

    Quantized checkpoints pass because comparison is at MODULE granularity
    (a module may carry {weight} or {weight_q4, scales, biases}); shapes
    are checked only for identically-named fp leaves.
    """
    import jax

    from tpu_audio.api.errors import ModelLoadError

    expected = jax.eval_shape(init_fn)
    want = {k: tuple(v.shape) for k, v in pytree.flatten(expected).items()}
    got = {k: tuple(v.shape) for k, v in pytree.flatten(loaded).items()}

    missing = sorted(module_prefixes(want) - module_prefixes(got))
    unexpected = sorted(module_prefixes(got) - module_prefixes(want))
    problems = []
    if missing:
        problems.append(f"{len(missing)} missing modules, e.g. {missing[:5]}")
    if unexpected:
        problems.append(
            f"{len(unexpected)} unexpected keys left after sanitize, "
            f"e.g. {unexpected[:5]}")
    if check_shapes:
        bad = [f"{k}: checkpoint {got[k]} vs model {want[k]}"
               for k in sorted(set(got) & set(want)) if got[k] != want[k]]
        if bad:
            problems.append(f"{len(bad)} shape mismatches, e.g. {bad[:5]}")
    if problems:
        raise ModelLoadError(name, "; ".join(problems))


def to_device(tree, dtype=None):
    """numpy tree → jnp tree, casting float leaves to dtype if given."""
    def conv(x):
        arr = jnp.asarray(x)
        if dtype is not None and jnp.issubdtype(arr.dtype, jnp.floating):
            arr = arr.astype(dtype)
        return arr
    import jax

    return jax.tree_util.tree_map(conv, tree)


def summarize(tree, name: str = "model") -> None:
    _log.info("%s: %.1fM params", name, pytree.param_count(tree) / 1e6)
