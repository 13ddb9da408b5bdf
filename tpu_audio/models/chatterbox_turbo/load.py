"""Chatterbox Turbo checkpoint loading
(mlx-community/Chatterbox-TTS-Turbo-* — ChatterboxTurboModel.swift:96-105)."""

from __future__ import annotations

import re


from tpu_audio.codecs import s3tokenizer
from tpu_audio.codecs.s3gen import model as s3gen
from tpu_audio.models.chatterbox import voice_encoder as ve
from tpu_audio.models.chatterbox.load import (S3TOK_REPO, _convert_conv_layouts,
                                              _split_prefixes)
from tpu_audio.models.chatterbox_turbo import model as turbo
from tpu_audio.nn import load_llama
from tpu_audio.utils import hub, pytree, weights
from tpu_audio.utils.tokenizer import load_tokenizer

REPOS = {"fp16": "mlx-community/Chatterbox-TTS-Turbo-fp16",
         "8bit": "mlx-community/Chatterbox-TTS-Turbo-8bit",
         "4bit": "mlx-community/Chatterbox-TTS-Turbo-4bit"}


def load(variant: str = "fp16"):
    path = hub.snapshot(REPOS[variant], matching=["*.safetensors",
                                                  "config.json",
                                                  "tokenizer.json"])
    flat = weights.load_safetensors_dir(path)
    groups = _split_prefixes(flat)

    t3_flat = {re.sub(r"^tfmr\.", "", k): v for k, v in groups["t3"].items()}
    gpt_keys = {k: v for k, v in t3_flat.items()
                if k.startswith(("h.", "wte.", "wpe.", "ln_f."))}
    rest = {("tfmr." + k if not k.startswith(("h.", "wte.", "wpe.", "ln_f."))
             else k): v
            for k, v in t3_flat.items() if k not in gpt_keys}
    tree = load_llama.convert_gpt2(gpt_keys)
    wpe = tree.pop("pos_embed", None)
    t3_params = {"tfmr": tree, **pytree.unflatten(rest)}
    if wpe is not None:
        t3_params["wpe"] = wpe
    t3_params = weights.to_device(t3_params)

    s3_params = weights.to_device(pytree.unflatten(
        _convert_conv_layouts(groups["s3gen"])))
    ve_params = weights.to_device(pytree.unflatten(groups["ve"]))

    tok_path = hub.snapshot(S3TOK_REPO, matching=["*.safetensors",
                                                  "config.json"])
    from tpu_audio.codecs.s3tokenizer import load as s3tok_load
    tok_params = weights.to_device(s3tok_load.convert(
        weights.load_safetensors_dir(tok_path)))

    return (t3_params, turbo.T3TurboConfig(), s3_params, s3gen.S3GenConfig(),
            tok_params, s3tokenizer.S3TokenizerConfig(),
            ve_params, ve.VoiceEncConfig(), load_tokenizer(path))
