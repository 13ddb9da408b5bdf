"""Fun-ASR checkpoint loading (variants nano/mlt_nano × q4/q8/fp16 —
Config/FunASRConfig.swift:11-73). Weight groups: encoder.* (SenseVoice),
adaptor.*, llm.* (Qwen3); conv sanitize mirrors FunASRModel.swift:207-233."""

from __future__ import annotations

import re


from tpu_audio.models.funasr import model as fmodel
from tpu_audio.nn import load_llama
from tpu_audio.utils import hub, pytree, weights
from tpu_audio.utils.tokenizer import load_tokenizer


def convert(flat: dict) -> dict:
    """Pure checkpoint-layout → {encoder, adaptor, llm} tree (no IO)."""
    enc, adp, llm = {}, {}, {}
    for k, v in flat.items():
        if v.ndim == 3 and "fsmn" in k:
            v = v.transpose(2, 1, 0)  # torch depthwise (O, 1, K) → (K, 1, O)
        if k.startswith("encoder."):
            enc[k[len("encoder."):]] = v
        elif k.startswith(("adaptor.", "audio_adaptor.")):
            adp[k.split(".", 1)[1]] = v
        elif k.startswith(("llm.", "model.")):
            llm[k] = v
    llm_inner = {re.sub(r"^llm\.", "", k): v for k, v in llm.items()}
    return {
        "encoder": pytree.unflatten(enc),
        "adaptor": pytree.unflatten(adp),
        "llm": load_llama.convert_llama(load_llama.fold_quantized(llm_inner)),
    }


def load(repo: str):
    path = hub.snapshot(repo, matching=["*.safetensors", "config.json",
                                        "tokenizer.json"])
    params = convert(weights.load_safetensors_dir(path))
    raw = weights.load_config_json(path)
    llm_cfg = (load_llama.config_from_hf(raw.get("llm_config", raw))
               if "hidden_size" in raw or "llm_config" in raw
               else fmodel.QWEN3_06B)
    cfg = fmodel.FunASRConfig(llm=llm_cfg)
    return weights.to_device(params), cfg, load_tokenizer(path)
