"""Kokoro checkpoint loading (mlx-community/Kokoro-82M-bf16).

Mirrors the reference's key remaps (package/TTS/Kokoro/TTSEngine/
KokoroWeightLoader.swift:13-172): duration_proj.linear_layer→duration_proj,
predictor.text_encoder.lstms.{2i}→lstm{i} / .{2i+1}→norm{i},
text_encoder.cnn.N.0→conv / .1→norm, plus conv-layout transposes into this
framework's (K, I, O) convention and LSTM key mapping
(weight_ih_l0 → wx, weight_hh_l0 → wh, *_reverse → bwd).
"""

from __future__ import annotations

import re

import jax.numpy as jnp
import numpy as np

from tpu_audio.models.kokoro.config import KokoroConfig
from tpu_audio.utils import hub, pytree, weights

REPO = "mlx-community/Kokoro-82M-bf16"
WEIGHTS_FILE = "kokoro-v1_0.safetensors"

_RULES = [
    (r"duration_proj\.linear_layer\.", "duration_proj."),
    (r"\.gamma$", ".weight"),
    (r"\.beta$", ".bias"),
]


def _remap_key(key: str) -> str | None:
    if "position_ids" in key:
        return None
    for pat, repl in _RULES:
        key = re.sub(pat, repl, key)
    # predictor.text_encoder.lstms.N → lstm{N//2} / norm{N//2}
    m = re.match(r"^(predictor\.text_encoder)\.lstms\.(\d+)\.(.+)$", key)
    if m:
        idx = int(m.group(2))
        name = f"lstm{idx // 2}" if idx % 2 == 0 else f"norm{idx // 2}"
        key = f"{m.group(1)}.{name}.{m.group(3)}"
    # text_encoder.cnn.N.{0,1} → conv/norm
    m = re.match(r"^(text_encoder\.cnn\.\d+)\.([01])\.(.+)$", key)
    if m:
        key = f"{m.group(1)}.{'conv' if m.group(2) == '0' else 'norm'}.{m.group(3)}"
    # LSTM params: weight_ih_l0→fwd.wx etc.
    m = re.match(r"^(.*)\.(weight|bias)_(ih|hh)_l0(_reverse)?$", key)
    if m:
        direction = "bwd" if m.group(4) else "fwd"
        kind = ("wx" if m.group(3) == "ih" else "wh") if m.group(2) == "weight" \
            else ("bias_ih" if m.group(3) == "ih" else "bias_hh")
        key = f"{m.group(1)}.{direction}.{kind}"
    return key


def _fix_conv_layout(key: str, v: np.ndarray) -> np.ndarray:
    """Map the MLX checkpoint conv layouts to (K, I, O).

    mlx-community/Kokoro-82M stores MLX layouts deterministically: Conv1d
    as (O, K, I), transposed convs (ups / predictor pools) as (I, K, O).
    Round-3 fix: the previous shape-based MLX-vs-torch heuristic
    misrouted convs whose kernel exceeds their input channels (F0_conv /
    N_conv are K=3, I=1 even at production scale) — caught by the
    loader-manifest suite."""
    if v.ndim != 3:
        return v
    if re.search(r"\.(ups|pool)\.", key) or key.endswith("pool.weight_v"):
        return v.transpose(1, 0, 2)  # (I, K, O) → (K, I, O)
    return v.transpose(1, 2, 0)  # (O, K, I) → (K, I, O)


def convert(flat_np: dict) -> dict:
    """Pure checkpoint-layout → model-tree conversion (no IO), so the
    loader-manifest tests can lock the remap rules offline."""
    out = {}
    for k, v in flat_np.items():
        nk = _remap_key(k)
        if nk is None:
            continue
        out[nk] = _fix_conv_layout(nk, v)
    return pytree.unflatten(out)


def load(repo: str | None = None, dtype=jnp.float32):
    path = hub.snapshot(repo or REPO, matching=[WEIGHTS_FILE, "config.json",
                                               "voices/*"])
    tree = convert(weights.load_safetensors_dir(path))
    params = weights.to_device(tree, dtype=dtype)
    return params, KokoroConfig(), path
