"""Whisper checkpoint loading (mlx-community and HF-transformers layouts).

Reference load path: package/STT/Whisper/WhisperModel.swift:144-214 —
snapshot(repo) → config.json → safetensors → sanitize → optional quantized
update. Key remaps cover:
  - openai/mlx layout: encoder.blocks.N.attn.{query,key,value,out}, mlp1/2,
    attn_ln/mlp_ln, decoder cross_attn..., token_embedding,
    positional_embedding
  - HF layout: model.encoder.layers.N.self_attn.{q,k,v,out}_proj, fc1/fc2,
    self_attn_layer_norm, ...

Conv weights: mlx stores (O, K, I) → transpose (1, 2, 0); HF/torch stores
(O, I, K) → transpose (2, 1, 0); both land in this framework's (K, I, O).
"""

from __future__ import annotations


import jax.numpy as jnp
import numpy as np

from tpu_audio.models.whisper.config import WhisperConfig
from tpu_audio.models.whisper.tokenizer import WhisperTokenizer
from tpu_audio.utils import hub, weights

# Model matrix — parity with the reference's WhisperModelSize ×
# WhisperQuantization map (package/Models/TranscriptionResult.swift:166-272):
# repoId = "mlx-community/whisper-{size}-{fp16|8bit|4bit}", sizes covering
# multilingual tiny..large-v3-turbo plus English-only .en variants.
SIZES = ("tiny", "base", "small", "medium", "large-v3", "large-v3-turbo",
         "tiny.en", "base.en", "small.en", "medium.en")
# "w8a8" = q8 checkpoint requantized at load to the per-channel int8
# serving format: int8-MXU encoder GEMMs, stacked scalar-prefetch int8
# decoder weights, int8 tied lm_head, and (via the engine) the int8
# cross-KV decode state
QUANTIZATIONS = ("fp16", "q8", "q4", "w8a8")
_QUANT_SUFFIX = {"fp16": "fp16", "q8": "8bit", "q4": "4bit"}

# overrides for classic mlx-community repo names known to host these weights
REPOS = {
    ("tiny", "fp16"): "mlx-community/whisper-tiny-mlx-fp32",
    ("tiny", "q4"): "mlx-community/whisper-tiny-mlx-q4",
    ("base", "fp16"): "mlx-community/whisper-base-mlx",
    ("base", "q4"): "mlx-community/whisper-base-mlx-q4",
    ("small", "fp16"): "mlx-community/whisper-small-mlx",
    ("medium", "fp16"): "mlx-community/whisper-medium-mlx",
    ("large-v3", "fp16"): "mlx-community/whisper-large-v3-mlx",
    ("large-v3", "q4"): "mlx-community/whisper-large-v3-mlx-4bit",
    ("large-v3-turbo", "fp16"): "mlx-community/whisper-large-v3-turbo",
    ("large-v3-turbo", "q4"): "mlx-community/whisper-large-v3-turbo-q4",
    ("tiny.en", "fp16"): "mlx-community/whisper-tiny.en-mlx",
    ("base.en", "fp16"): "mlx-community/whisper-base.en-mlx",
    ("small.en", "fp16"): "mlx-community/whisper-small.en-mlx",
    ("medium.en", "fp16"): "mlx-community/whisper-medium.en-mlx",
}


def repo_for(model: str, quantization: str = "fp16") -> str:
    """Resolve a (size, quantization) pair to a HF repo id, mirroring the
    reference's WhisperModelSize.repoId(quantization:)."""
    if (model, quantization) in REPOS:
        return REPOS[(model, quantization)]
    if model not in SIZES:
        raise ValueError(f"unknown whisper size {model!r}; one of {SIZES}")
    if quantization not in _QUANT_SUFFIX:
        raise ValueError(f"unknown quantization {quantization!r}; "
                         f"one of {QUANTIZATIONS}")
    return f"mlx-community/whisper-{model}-{_QUANT_SUFFIX[quantization]}"

_MLX_RULES = [
    (r"\.attn\.query\.", ".attn.q."),
    (r"\.attn\.key\.", ".attn.k."),
    (r"\.attn\.value\.", ".attn.v."),
    (r"\.attn\.out\.", ".attn.o."),
    (r"\.cross_attn\.query\.", ".cross_attn.q."),
    (r"\.cross_attn\.key\.", ".cross_attn.k."),
    (r"\.cross_attn\.value\.", ".cross_attn.v."),
    (r"\.cross_attn\.out\.", ".cross_attn.o."),
    (r"\.attn_ln\.", ".ln1."),
    (r"\.cross_attn_ln\.", ".ln_cross."),
    (r"\.mlp_ln\.", ".ln2."),
    (r"\.mlp1\.", ".mlp.fc1."),
    (r"\.mlp2\.", ".mlp.fc2."),
]

_HF_RULES = [
    (r"^model\.", ""),
    (r"^proj_out\.", "decoder.token_embedding."),
    (r"encoder\.layers\.", "encoder.blocks."),
    (r"decoder\.layers\.", "decoder.blocks."),
    (r"\.self_attn\.q_proj\.", ".attn.q."),
    (r"\.self_attn\.k_proj\.", ".attn.k."),
    (r"\.self_attn\.v_proj\.", ".attn.v."),
    (r"\.self_attn\.out_proj\.", ".attn.o."),
    (r"\.encoder_attn\.q_proj\.", ".cross_attn.q."),
    (r"\.encoder_attn\.k_proj\.", ".cross_attn.k."),
    (r"\.encoder_attn\.v_proj\.", ".cross_attn.v."),
    (r"\.encoder_attn\.out_proj\.", ".cross_attn.o."),
    (r"\.self_attn_layer_norm\.", ".ln1."),
    (r"\.encoder_attn_layer_norm\.", ".ln_cross."),
    (r"\.final_layer_norm\.", ".ln2."),
    (r"\.fc1\.", ".mlp.fc1."),
    (r"\.fc2\.", ".mlp.fc2."),
    (r"encoder\.layer_norm\.", "encoder.ln_post."),
    (r"decoder\.layer_norm\.", "decoder.ln."),
    (r"decoder\.embed_tokens\.", "decoder.token_embedding."),
    (r"decoder\.embed_positions\.weight", "decoder.positional_embedding"),
]


def load(model: str = "tiny", quantization: str = "fp16",
         repo: str | None = None, dtype=jnp.float32):
    """Returns (params, config, tokenizer, pipeline-ready).

    quantization "w8a8" is a SERVING format, not a checkpoint format: the
    q8 checkpoint (reference serves q8 encoders too,
    WhisperModel.swift:190-196) is loaded, then the ENCODER blocks are
    requantized to per-channel int8 so their large-M GEMMs run s8×s8 on
    the int8 MXU (2× bf16 throughput); the decoder keeps the checkpoint's
    group-affine format (see serve_tree_int8 for why)."""
    serve_int8 = quantization == "w8a8"
    ckpt_q = "q8" if serve_int8 else quantization
    repo = repo or repo_for(model, ckpt_q)
    path = hub.snapshot(repo, matching=["*.safetensors", "config.json",
                                        "*.tiktoken"])
    cfg = WhisperConfig.from_dict(weights.load_config_json(path))
    flat = weights.load_safetensors_dir(path)
    tree = sanitize(flat)

    import functools

    import jax

    from tpu_audio.models.whisper import model as wmodel

    weights.validate_tree(
        tree, functools.partial(wmodel.init_params, jax.random.PRNGKey(0),
                                cfg), name=repo)
    if serve_int8:
        tree = serve_tree_int8(tree)
    params = weights.to_device(tree, dtype=dtype)
    # eager main-thread Mosaic probe so the fused-encoder gate is settled
    # before any serving graph traces (see model.warm_fused_probes)
    wmodel.warm_fused_probes(cfg, int8=serve_int8, dtype=dtype)

    tok = WhisperTokenizer.load(path, multilingual=cfg.is_multilingual,
                                num_languages=cfg.num_languages)
    return params, cfg, tok


def serve_tree_int8(tree: dict, decoder: bool = True,
                    encoder: bool = True) -> dict:
    """Requantize a loaded whisper tree (group-affine q8/q4 or fp leaves)
    to the per-channel int8 W8A8 serving format.

    Encoder: its GEMMs are large-M and run as pure-XLA s8×s8 dots on the
    int8 MXU (2× bf16 peak). Decoder (round 3): the per-step GEMMs now ride
    the STACKED scalar-prefetch int8 kernel — decode_step pulls the (L,O,I)
    int8 arrays out of the scan and indexes them in the kernel's block
    index_map, so the scan-slice HBM-copy problem that kept the decoder in
    checkpoint format no longer applies. The tied token embedding also
    quantizes: the lm_head becomes an int8 dot and the input gather
    dequantizes rows on the fly. Convs / norms / positions stay fp."""
    from tpu_audio.ops import quant

    out = {**tree}
    if encoder:
        enc = quant.requantize_tree_int8(tree["encoder"], fuse=False)
        out["encoder"] = quant.quantize_tree_int8(
            enc, predicate=lambda k, v: "blocks" in k)
    if decoder:
        dec = quant.requantize_tree_int8(tree["decoder"], fuse=False)
        dec = quant.quantize_tree_int8(
            dec, predicate=lambda k, v: "blocks" in k
            or k == "token_embedding.weight")
        out["decoder"] = dec
    return out


def sanitize(flat: dict) -> dict:
    """Flat checkpoint dict (MLX or HF layout) → whisper param tree.

    Pure key/array transformation (no IO) so loader-manifest tests can
    validate the remap rules against init_params without network access."""
    is_hf = any(k.startswith(("model.encoder", "model.decoder")) for k in flat)
    rules = _HF_RULES if is_hf else _MLX_RULES

    def conv_fix(v):
        if v.ndim == 3:
            return v.transpose(2, 1, 0) if is_hf else v.transpose(1, 2, 0)
        return v

    flat = weights.apply_rules(
        flat, rules,
        transforms={r"encoder\.conv[12]\.weight": conv_fix},
        # encoder positions are deterministic sinusoids — recomputed, not
        # loaded (checkpoints still ship them)
        drop=[r"\.rotary_emb\.", r"alignment_heads",
              r"^(model\.)?encoder\.(positional_embedding|embed_positions)"])
    # quantized checkpoints: map mlx "weight"+".scales"/".biases" triples
    flat = _fold_quantized(flat)

    from tpu_audio.utils import pytree

    tree = weights.stack_numbered_layers(flat, "encoder.blocks")
    return weights.stack_numbered_layers(pytree.flatten(tree),
                                         "decoder.blocks")


def _fold_quantized(flat: dict) -> dict:
    """MLX quantized checkpoints store weight (packed u32) + scales + biases
    under the same prefix; rename packed weight per bit width."""
    out = dict(flat)
    for k in list(flat):
        if k.endswith(".scales"):
            prefix = k[: -len(".scales")]
            wkey = prefix + ".weight"
            if wkey in out and out[wkey].dtype == np.uint32:
                packed = out.pop(wkey)
                in_features = out[k].shape[-1] * 64  # group size 64
                per = packed.shape[-1] and in_features // packed.shape[-1]
                bits = 32 // per
                out[f"{prefix}.weight_q{bits}"] = packed
    return out
