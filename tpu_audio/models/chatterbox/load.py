"""Chatterbox checkpoint loading.

Reference: package/TTS/Chatterbox/ChatterboxModel.swift:140-377 — one
unified Module routing t3.*/s3gen.*/ve.* weight prefixes, with CAMPPlus
x-vector renames + conv transposes (:223-343), plus the S3TokenizerV2
auxiliary repo. Repos: mlx-community/Chatterbox-TTS-{fp16,8bit,4bit}.
"""

from __future__ import annotations

import re


from tpu_audio.codecs import s3tokenizer
from tpu_audio.codecs.s3gen import model as s3gen
from tpu_audio.models.chatterbox import t3 as t3mod
from tpu_audio.models.chatterbox import voice_encoder as ve
from tpu_audio.nn import load_llama
from tpu_audio.utils import hub, pytree, weights
from tpu_audio.utils.tokenizer import load_tokenizer

REPOS = {"fp16": "mlx-community/Chatterbox-TTS-fp16",
         "8bit": "mlx-community/Chatterbox-TTS-8bit",
         "4bit": "mlx-community/Chatterbox-TTS-4bit"}
S3TOK_REPO = "mlx-community/S3TokenizerV2"


def _split_prefixes(flat: dict) -> dict[str, dict]:
    groups: dict[str, dict] = {"t3": {}, "s3gen": {}, "ve": {}, "other": {}}
    for k, v in flat.items():
        for p in ("t3", "s3gen", "ve"):
            if k.startswith(p + "."):
                groups[p][k[len(p) + 1:]] = v
                break
        else:
            groups["other"][k] = v
    return groups


def _convert_t3(flat: dict) -> dict:
    rules = [(r"^tfmr\.model\.", "tfmr.")] + [
        (p.replace("^model", r"^tfmr(\.model)?"), "tfmr." + r)
        for p, r in load_llama._RULES if p.startswith("^model")
    ] + load_llama._RULES
    flat = weights.apply_rules(flat, rules, drop=[r"rotary"])
    flat = load_llama.fold_quantized(flat)
    return weights.stack_numbered_layers(flat, "tfmr.layers")


def _convert_conv_layouts(flat: dict) -> dict:
    out = {}
    for k, v in flat.items():
        if v.ndim == 3 and (".weight" in k or k.endswith("weight_v")):
            v = v.transpose(2, 1, 0)  # torch (O, I, K) → (K, I, O)
            if re.search(r"\.(ups|convT|up_layer)\.", k):
                v = v.transpose(0, 2, 1)
        out[k] = v
    return out


def load(variant: str = "fp16"):
    path = hub.snapshot(REPOS[variant], matching=["*.safetensors",
                                                  "config.json",
                                                  "tokenizer.json"])
    flat = weights.load_safetensors_dir(path)
    groups = _split_prefixes(flat)

    t3_params = weights.to_device(_convert_t3(groups["t3"]))
    t3_cfg = t3mod.T3Config()

    s3_flat = _convert_conv_layouts(groups["s3gen"])
    s3_params = weights.to_device(pytree.unflatten(s3_flat))
    s3_cfg = s3gen.S3GenConfig()

    ve_params = weights.to_device(pytree.unflatten(groups["ve"]))
    ve_cfg = ve.VoiceEncConfig()

    tok_path = hub.snapshot(S3TOK_REPO, matching=["*.safetensors",
                                                  "config.json"])
    tok_flat = weights.load_safetensors_dir(tok_path)
    from tpu_audio.codecs.s3tokenizer import load as s3tok_load
    tok_params = weights.to_device(s3tok_load.convert(tok_flat))
    tok_cfg = s3tokenizer.S3TokenizerConfig()

    return (t3_params, t3_cfg, s3_params, s3_cfg, tok_params, tok_cfg,
            ve_params, ve_cfg, load_tokenizer(path))
