"""Marvis checkpoint loading.

Repos: Marvis-AI/marvis-tts-{100m,250m}-v0.2-MLX-6bit (backbone + depth
decoder + embeddings/heads; config.json carries flavors or an explicit
depth_decoder_config — reference MarvisModel.swift:17-260) and the Mimi
weights from kyutai/moshiko-pytorch-bf16 (Mimi.swift:242).
"""

from __future__ import annotations

import jax.numpy as jnp

from tpu_audio.codecs.mimi.model import MimiConfig
from tpu_audio.models.marvis.model import MarvisConfig
from tpu_audio.nn import load_llama, transformer
from tpu_audio.utils import hub, pytree, weights
from tpu_audio.utils.tokenizer import load_tokenizer

MIMI_REPO = "kyutai/moshiko-pytorch-bf16"
MIMI_FILE = "tokenizer-e351c8d8-checkpoint125.safetensors"

_SUB_RULES = load_llama._RULES + [
    (r"^layers\.", "layers."),
    (r"\.sa_norm\.", ".ln1."),  # torchtune naming variants
    (r"\.mlp_norm\.", ".ln2."),
    (r"\.attn\.q_proj\.", ".attn.q."),
    (r"\.attn\.k_proj\.", ".attn.k."),
    (r"\.attn\.v_proj\.", ".attn.v."),
    (r"\.attn\.output_proj\.", ".attn.o."),
    (r"\.mlp\.w1\.", ".mlp.gate."),
    (r"\.mlp\.w3\.", ".mlp.up."),
    (r"\.mlp\.w2\.", ".mlp.down."),
]


def _convert_stack(flat: dict) -> dict:
    flat = weights.apply_rules(flat, _SUB_RULES, drop=[r"rotary", r"rope"])
    flat = load_llama.fold_quantized(flat)
    return weights.stack_numbered_layers(flat, "layers")


def backbone_config_from_flavor(flavor: str) -> transformer.TransformerConfig:
    table = {
        "llama-1B": dict(dim=2048, n_layers=16, n_heads=32, n_kv_heads=8,
                         hidden_dim=8192),
        "llama-100M": dict(dim=1024, n_layers=4, n_heads=8, n_kv_heads=2,
                           hidden_dim=8192),
        "llama-250M": dict(dim=1024, n_layers=16, n_heads=16, n_kv_heads=8,
                           hidden_dim=4096),
        "llama-60M": dict(dim=512, n_layers=4, n_heads=8, n_kv_heads=2,
                          hidden_dim=2048),
    }
    d = table[flavor]
    return transformer.TransformerConfig(
        rope_theta=500000.0,
        rope_scaling={"rope_type": "llama3", "factor": 32.0,
                      "low_freq_factor": 1.0, "high_freq_factor": 4.0,
                      "original_max_position_embeddings": 8192}, **d)


def load(repo: str, dtype=jnp.bfloat16):
    path = hub.snapshot(repo, matching=["*.safetensors", "config.json",
                                        "tokenizer.json"])
    raw_cfg = weights.load_config_json(path)
    bb_cfg = backbone_config_from_flavor(
        raw_cfg.get("backbone_flavor", "llama-250M"))
    dec_cfg = backbone_config_from_flavor(
        raw_cfg.get("decoder_flavor", "llama-100M"))
    cfg = MarvisConfig(
        backbone=bb_cfg, decoder=dec_cfg,
        text_vocab_size=raw_cfg.get("text_vocab_size", 128256),
        audio_vocab_size=raw_cfg.get("audio_vocab_size", 2048),
        n_codebooks=raw_cfg.get("audio_num_codebooks", 32))

    flat = weights.load_safetensors_dir(path)
    bb = {k[len("backbone."):]: v for k, v in flat.items()
          if k.startswith("backbone.")}
    dec = {k[len("decoder."):]: v for k, v in flat.items()
           if k.startswith("decoder.")}
    rest = {k: v for k, v in flat.items()
            if not k.startswith(("backbone.", "decoder."))}
    params = {
        "backbone": _convert_stack(bb),
        "decoder": _convert_stack(dec),
        **pytree.unflatten(load_llama.fold_quantized(rest)),
    }
    params = weights.to_device(params, dtype=dtype)

    mimi_path = hub.snapshot(MIMI_REPO, matching=[MIMI_FILE])
    mimi_params, mimi_cfg = load_mimi_dir(mimi_path)
    return params, cfg, load_tokenizer(path), mimi_params, mimi_cfg


def load_mimi_dir(path: str, dtype=jnp.float32):
    tree = convert_mimi(weights.load_safetensors_dir(path))
    return weights.to_device(tree, dtype=dtype), MimiConfig()


def convert_mimi(flat: dict) -> dict:
    """Pure kyutai-Mimi layout → codecs/mimi tree (no IO). Torch conv
    weights (O, I, K) → (K, I, O); transposed convs (I, O, K) → (K, I, O)."""
    import re

    out = {}
    for k, v in flat.items():
        nk = k
        nk = re.sub(r"\.conv\.conv\.", ".", nk)
        nk = re.sub(r"\.convtr\.convtr\.", ".", nk)
        nk = re.sub(r"^encoder\.model\.", "encoder.layers.", nk)
        nk = re.sub(r"^decoder\.model\.", "decoder.layers.", nk)
        if v.ndim == 3:
            if "convtr" in k or ".upsample." in k:
                if v.shape[1] == 1:  # depthwise (C, 1, K) → (K, 1, C)
                    v = v.transpose(2, 1, 0)
                else:
                    v = v.transpose(2, 0, 1)  # dense (I, O, K) → (K, I, O)
            else:
                v = v.transpose(2, 1, 0)
        out[nk] = v
    return pytree.unflatten(out)
