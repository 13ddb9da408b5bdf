"""CosyVoice3 checkpoint loading (mlx-community/Fun-CosyVoice3-0.5B-2512-4bit
+ S3TokenizerV3 — Config/CosyVoice3Config.swift:442)."""

from __future__ import annotations

import re


from tpu_audio.codecs import s3tokenizer
from tpu_audio.models.cosyvoice2 import lm as lm_mod
from tpu_audio.models.cosyvoice3 import model as cv3
from tpu_audio.nn import load_llama
from tpu_audio.utils import hub, pytree, weights
from tpu_audio.utils.tokenizer import load_tokenizer

REPO = "mlx-community/Fun-CosyVoice3-0.5B-2512-4bit"
S3TOK_V3_REPO = "mlx-community/S3TokenizerV3"


def _remap_flow_key(k: str) -> str | None:
    """Checkpoint flow.* naming (the MLX port mirrors upstream CosyVoice:
    decoder.estimator.transformer_blocks_N..., CosyVoice3TTS.swift:291-300)
    → tpu_audio tree naming. None = computed at runtime, drop."""
    if "rotary_embed" in k:
        return None
    k = re.sub(r"^decoder\.estimator\.", "decoder_estimator.", k)
    k = re.sub(r"transformer_blocks[._](\d+)\.", r"blocks.\1.", k)
    k = k.replace(".attn.to_out_0.", ".attn.to_out.")
    k = k.replace(".attn.to_out.0.", ".attn.to_out.")
    k = k.replace(".ff.ff_0_0.", ".ff.fc1.")
    k = k.replace(".ff.ff.0.0.", ".ff.fc1.")
    k = k.replace(".ff.ff_2.", ".ff.fc2.")
    k = k.replace(".ff.ff.2.", ".ff.fc2.")
    k = k.replace(".input_embed.conv_pos_embed.", ".input_embed.")
    k = k.replace(".norm_out.linear.", ".final_norm.linear.")
    # affine-free LayerNorms (attn_norm.norm / ff_norm / norm_out.norm)
    # carry no weights; anything that still slipped through is dropped
    if re.search(r"\.(ff_norm|attn_norm\.norm|final_norm\.norm)\.", k):
        return None
    return k


def convert(flat: dict) -> tuple[dict, dict]:
    """Pure checkpoint layout → (lm_params, flow_params) trees (no IO)."""
    lm_flat, flow_flat = {}, {}
    for k, v in flat.items():
        if k.startswith(("llm.", "llm_", "speech_embedding.")):
            lm_flat[re.sub(r"^llm\.llm\.", "llm.", k)] = v
        elif k.startswith("flow."):
            nk = _remap_flow_key(k[len("flow."):])
            if nk is not None:
                flow_flat[nk] = v
        elif k.startswith("hift."):
            flow_flat["mel2wav." + k[len("hift."):]] = v

    inner = {k[len("llm."):]: v for k, v in lm_flat.items()
             if k.startswith("llm.")}
    rest = {k: v for k, v in lm_flat.items() if not k.startswith("llm.")}
    lm_params = {"llm": load_llama.convert_llama(inner),
                 **pytree.unflatten(rest)}

    out = {}
    for k, v in flow_flat.items():
        if v.ndim == 3:
            v = v.transpose(2, 1, 0)
            if re.search(r"\.(ups|convT|up_layer)\.", k):
                v = v.transpose(0, 2, 1)
        out[k] = v
    return lm_params, pytree.unflatten(out)


def load(repo: str = REPO):
    path = hub.snapshot(repo, matching=["*.safetensors", "config.json",
                                        "tokenizer.json"])
    lm_params, flow_params = convert(weights.load_safetensors_dir(path))
    lm_params = weights.to_device(lm_params)
    flow_params = weights.to_device(flow_params)

    tok_path = hub.snapshot(S3TOK_V3_REPO, matching=["*.safetensors",
                                                     "config.json"])
    from tpu_audio.codecs.s3tokenizer import load as s3tok_load
    tok_params = weights.to_device(s3tok_load.convert(
        weights.load_safetensors_dir(tok_path)))

    return (lm_params, lm_mod.CosyLMConfig(), flow_params,
            cv3.CV3FlowConfig(), tok_params,
            s3tokenizer.S3TokenizerConfig(), load_tokenizer(path))
