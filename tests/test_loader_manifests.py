"""Loader key-manifest hardening tests (VERDICT r1 #6 / advisor finding).

The checkpoint remap rules were written in a zero-egress environment; these
tests lock them against each model's own init_params schema: a synthetic
flat dict in the SOURCE layout (MLX / HF key naming, as enumerated by the
reference's sanitize functions, e.g. WhisperModel.swift:144-214) must map
EXACTLY onto the model tree — every rule fires, nothing is missing, no
unexpected key slips through — and validate_tree must reject corrupted
manifests. On launch day a layout mismatch is then a clear ModelLoadError,
not silent garbage audio.
"""

import functools

import jax
import numpy as np
import pytest

from tpu_audio.utils import pytree, weights


def _expected(init_fn):
    sh = jax.eval_shape(init_fn)
    return {k: tuple(v.shape) for k, v in pytree.flatten(sh).items()}


# ---------------------------------------------------------------- whisper

# inverse naming table: our tree leaf → MLX / HF checkpoint key fragments
_W_MLX = [
    (".attn.q.", ".attn.query."), (".attn.k.", ".attn.key."),
    (".attn.v.", ".attn.value."), (".attn.o.", ".attn.out."),
    (".cross_attn.q.", ".cross_attn.query."),
    (".cross_attn.k.", ".cross_attn.key."),
    (".cross_attn.v.", ".cross_attn.value."),
    (".cross_attn.o.", ".cross_attn.out."),
    (".ln1.", ".attn_ln."), (".ln_cross.", ".cross_attn_ln."),
    (".ln2.", ".mlp_ln."), (".mlp.fc1.", ".mlp1."), (".mlp.fc2.", ".mlp2."),
]

_W_HF = [
    (".attn.q.", ".self_attn.q_proj."), (".attn.k.", ".self_attn.k_proj."),
    (".attn.v.", ".self_attn.v_proj."), (".attn.o.", ".self_attn.out_proj."),
    (".cross_attn.q.", ".encoder_attn.q_proj."),
    (".cross_attn.k.", ".encoder_attn.k_proj."),
    (".cross_attn.v.", ".encoder_attn.v_proj."),
    (".cross_attn.o.", ".encoder_attn.out_proj."),
    (".ln1.", ".self_attn_layer_norm."),
    (".ln_cross.", ".encoder_attn_layer_norm."),
    (".ln2.", ".final_layer_norm."),
    (".mlp.fc1.", ".fc1."), (".mlp.fc2.", ".fc2."),
    ("encoder.ln_post.", "encoder.layer_norm."),
    ("decoder.ln.", "decoder.layer_norm."),
    ("decoder.token_embedding.", "decoder.embed_tokens."),
]


def _tiny_whisper_cfg():
    from tpu_audio.models.whisper.config import WhisperConfig

    return WhisperConfig(n_audio_state=64, n_audio_head=4, n_audio_layer=2,
                         n_text_state=64, n_text_head=4, n_text_layer=2,
                         n_text_ctx=32)


def _whisper_manifest(layout: str) -> dict:
    """Synthetic source-layout checkpoint for the tiny config."""
    cfg = _tiny_whisper_cfg()
    from tpu_audio.models.whisper import model as wmodel

    exp = _expected(functools.partial(wmodel.init_params,
                                      jax.random.PRNGKey(0), cfg))
    flat = {}
    for k, shape in exp.items():
        # un-stack the scan layer axis back to numbered keys
        keys = [k]
        if ".blocks." in k:
            n = shape[0]
            shape = shape[1:]
            side = k.split(".blocks.")[0]
            rest = k.split(".blocks.")[1]
            keys = [f"{side}.blocks.{i}.{rest}" for i in range(n)]
        for kk in keys:
            src = kk
            table = _W_MLX if layout == "mlx" else _W_HF
            for ours, theirs in table:
                src = src.replace(ours, theirs)
            sshape = shape
            if "conv" in kk and len(shape) == 3:
                kio = shape  # ours: (K, I, O)
                sshape = ((kio[2], kio[1], kio[0]) if layout == "hf"
                          else (kio[2], kio[0], kio[1]))  # torch OIK / mlx OKI
            if layout == "hf":
                if src == "decoder.positional_embedding":
                    src = "decoder.embed_positions.weight"
                if not src.startswith("proj_out"):
                    src = "model." + src
            flat[src] = np.zeros(sshape, np.float32)
    # real checkpoints also carry the (recomputed) encoder sinusoids
    if layout == "mlx":
        flat["encoder.positional_embedding"] = np.zeros((1500, 64), np.float32)
    else:
        flat["model.encoder.embed_positions.weight"] = np.zeros(
            (1500, 64), np.float32)
    return flat


class TestWhisperManifest:
    @pytest.mark.parametrize("layout", ["mlx", "hf"])
    def test_manifest_maps_exactly(self, layout):
        from tpu_audio.models.whisper import load as wload
        from tpu_audio.models.whisper import model as wmodel

        cfg = _tiny_whisper_cfg()
        tree = wload.sanitize(_whisper_manifest(layout))
        weights.validate_tree(
            tree, functools.partial(wmodel.init_params,
                                    jax.random.PRNGKey(0), cfg),
            name=f"whisper-{layout}")

    def test_unexpected_key_rejected(self):
        from tpu_audio.api.errors import ModelLoadError
        from tpu_audio.models.whisper import load as wload
        from tpu_audio.models.whisper import model as wmodel

        cfg = _tiny_whisper_cfg()
        flat = _whisper_manifest("mlx")
        flat["encoder.adapter.weight"] = np.zeros((64, 64), np.float32)
        tree = wload.sanitize(flat)
        with pytest.raises(ModelLoadError, match="unexpected"):
            weights.validate_tree(
                tree, functools.partial(wmodel.init_params,
                                        jax.random.PRNGKey(0), cfg),
                name="whisper-corrupt")

    def test_missing_module_rejected(self):
        from tpu_audio.api.errors import ModelLoadError
        from tpu_audio.models.whisper import load as wload
        from tpu_audio.models.whisper import model as wmodel

        cfg = _tiny_whisper_cfg()
        flat = _whisper_manifest("mlx")
        del flat["decoder.token_embedding.weight"]
        tree = wload.sanitize(flat)
        with pytest.raises(ModelLoadError, match="missing"):
            weights.validate_tree(
                tree, functools.partial(wmodel.init_params,
                                        jax.random.PRNGKey(0), cfg),
                name="whisper-corrupt")

    def test_shape_drift_rejected(self):
        from tpu_audio.api.errors import ModelLoadError
        from tpu_audio.models.whisper import load as wload
        from tpu_audio.models.whisper import model as wmodel

        cfg = _tiny_whisper_cfg()
        flat = _whisper_manifest("mlx")
        flat["decoder.ln.weight"] = np.zeros((128,), np.float32)
        tree = wload.sanitize(flat)
        with pytest.raises(ModelLoadError, match="shape"):
            weights.validate_tree(
                tree, functools.partial(wmodel.init_params,
                                        jax.random.PRNGKey(0), cfg),
                name="whisper-corrupt")

    def test_quantized_manifest_passes(self):
        """q4 checkpoints replace linear weights with uint32+scales+biases
        triples; module-granularity validation must accept them."""
        from tpu_audio.models.whisper import load as wload
        from tpu_audio.models.whisper import model as wmodel
        from tpu_audio.ops import quant

        cfg = _tiny_whisper_cfg()
        flat = _whisper_manifest("mlx")
        for k in list(flat):
            if k.endswith("mlp1.weight"):
                o, i = flat[k].shape
                if i % 64:
                    continue
                prefix = k[: -len(".weight")]
                q = quant.quantize_array(
                    np.zeros((o, i), np.float32), bits=4)
                del flat[k]
                flat[prefix + ".weight"] = q["weight_q4"]
                flat[prefix + ".scales"] = q["scales"]
                flat[prefix + ".biases"] = q["biases"]
        tree = wload.sanitize(flat)
        weights.validate_tree(
            tree, functools.partial(wmodel.init_params,
                                    jax.random.PRNGKey(0), cfg),
            name="whisper-q4")


# ---------------------------------------------------------------- llama LM

_L_INV = [
    (".attn.q_norm.", ".self_attn.q_norm."),
    (".attn.k_norm.", ".self_attn.k_norm."),
    (".attn.q.", ".self_attn.q_proj."), (".attn.k.", ".self_attn.k_proj."),
    (".attn.v.", ".self_attn.v_proj."), (".attn.o.", ".self_attn.o_proj."),
    (".mlp.gate.", ".mlp.gate_proj."), (".mlp.up.", ".mlp.up_proj."),
    (".mlp.down.", ".mlp.down_proj."),
    (".ln1.", ".input_layernorm."), (".ln2.", ".post_attention_layernorm."),
]


def _llama_manifest(cfg, quant_bits: int | None = None) -> dict:
    from tpu_audio.nn import transformer
    from tpu_audio.ops import quant

    exp = _expected(functools.partial(transformer.init_params,
                                      jax.random.PRNGKey(0), cfg))
    flat = {}
    for k, shape in exp.items():
        keys = [k]
        if k.startswith("layers."):
            n = shape[0]
            shape = shape[1:]
            rest = k[len("layers."):]
            keys = [f"layers.{i}.{rest}" for i in range(n)]
        for kk in keys:
            src = kk
            if src.startswith("layers."):
                src = "model." + src
            elif src.startswith("embed."):
                src = "model.embed_tokens." + src[len("embed."):]
            elif src.startswith("norm."):
                src = "model.norm." + src[len("norm."):]
            for ours, theirs in _L_INV:
                src = src.replace(ours, theirs)
            if (quant_bits and src.endswith(".weight")
                    and len(shape) == 2 and shape[1] % 64 == 0
                    and "layernorm" not in src and "norm." not in src):
                q = quant.quantize_array(np.zeros(shape, np.float32),
                                         bits=quant_bits)
                prefix = src[: -len(".weight")]
                flat[prefix + ".weight"] = q[f"weight_q{quant_bits}"]
                flat[prefix + ".scales"] = q["scales"]
                flat[prefix + ".biases"] = q["biases"]
            else:
                flat[src] = np.zeros(shape, np.float32)
    return flat


class TestLlamaManifest:
    CFG_KW = dict(dim=64, n_layers=2, n_heads=4, n_kv_heads=2,
                  hidden_dim=128, vocab_size=256)

    def test_fp_manifest_maps_exactly(self):
        from tpu_audio.nn import load_llama, transformer

        cfg = transformer.TransformerConfig(**self.CFG_KW)
        tree = load_llama.convert_llama(_llama_manifest(cfg))
        weights.validate_tree(
            tree, functools.partial(transformer.init_params,
                                    jax.random.PRNGKey(0), cfg),
            name="llama-fp")

    def test_q4_manifest_maps_exactly(self):
        """MLX 4-bit exports (the Orpheus serving checkpoint layout,
        OrpheusWeightLoader.swift:31)."""
        from tpu_audio.nn import load_llama, transformer

        cfg = transformer.TransformerConfig(**self.CFG_KW)
        tree = load_llama.convert_llama(_llama_manifest(cfg, quant_bits=4))
        weights.validate_tree(
            tree, functools.partial(transformer.init_params,
                                    jax.random.PRNGKey(0), cfg),
            name="llama-q4")

    def test_qwen3_qk_norm_manifest(self):
        from tpu_audio.nn import load_llama, transformer

        cfg = transformer.TransformerConfig(qk_norm=True, **self.CFG_KW)
        tree = load_llama.convert_llama(_llama_manifest(cfg))
        weights.validate_tree(
            tree, functools.partial(transformer.init_params,
                                    jax.random.PRNGKey(0), cfg),
            name="qwen3")

    def test_extra_key_rejected(self):
        from tpu_audio.api.errors import ModelLoadError
        from tpu_audio.nn import load_llama, transformer

        cfg = transformer.TransformerConfig(**self.CFG_KW)
        flat = _llama_manifest(cfg)
        flat["model.mm_projector.weight"] = np.zeros((64, 64), np.float32)
        tree = load_llama.convert_llama(flat)
        with pytest.raises(ModelLoadError, match="unexpected"):
            weights.validate_tree(
                tree, functools.partial(transformer.init_params,
                                        jax.random.PRNGKey(0), cfg),
                name="llama-corrupt")
