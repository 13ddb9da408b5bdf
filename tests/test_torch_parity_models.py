"""FULL-MODEL numerical parity against torch/HF-transformers implementations.

Round-1 verdict: the fidelity gate was self-referential — DSP parity was
checked against the author's own NumPy re-derivation only. These tests load
IDENTICAL random weights into an independent external implementation
(HF transformers, torch CPU) and into this framework, and require the whole
forward graph to agree to fp32 tolerance:

  - Whisper encoder+decoder logits   vs WhisperForConditionalGeneration
  - Llama (incl. llama3-scaled rope), Qwen2, Qwen3, GPT-2  vs torch CausalLMs
    (one shared nn/transformer stack backs 7 engines — SURVEY §2A#18)
  - Mimi codec encode (token-exact) + decode (waveform)  vs MimiModel

This catches convention drift the primitive-level tests (test_torch_parity)
can't: rope layout, qkv bias handling, norm placement, causal-conv padding,
codebook math, gelu variants (the gelu_new GPT-2 mismatch was found by the
GPT-2 test here).
"""

import re

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

pytestmark = pytest.mark.slow  # engine e2e / parity / mesh

ATOL = 5e-5  # fp32 forward accumulation across a full model


def _np(sd):
    return {k: v.float().numpy() for k, v in sd.items()}


# ------------------------------------------------------------------ whisper

def test_whisper_full_model_vs_torch():
    from transformers import WhisperConfig as TWhisperConfig
    from transformers import WhisperForConditionalGeneration

    from tpu_audio.models.whisper import load as wload
    from tpu_audio.models.whisper import model as wmodel
    from tpu_audio.models.whisper.config import WhisperConfig
    from tpu_audio.nn import layers

    tcfg = TWhisperConfig(
        vocab_size=128, num_mel_bins=8, d_model=32,
        encoder_layers=2, encoder_attention_heads=4, encoder_ffn_dim=64,
        decoder_layers=2, decoder_attention_heads=4, decoder_ffn_dim=64,
        max_source_positions=1500, max_target_positions=48,
        activation_function="gelu", dropout=0.0,
        pad_token_id=0, bos_token_id=1, eos_token_id=2,
        decoder_start_token_id=1)
    torch.manual_seed(0)
    tm = WhisperForConditionalGeneration(tcfg).eval()

    cfg = WhisperConfig(n_mels=8, n_audio_ctx=1500, n_audio_state=32,
                        n_audio_head=4, n_audio_layer=2, n_vocab=128,
                        n_text_ctx=48, n_text_state=32, n_text_head=4,
                        n_text_layer=2)

    # HF's encoder positions are a learned table (random at init); the
    # real checkpoints hold sinusoids, which this framework recomputes —
    # pin torch to the same sinusoids.
    sin = np.asarray(layers.sinusoidal_positions(1500, 32), np.float32)
    with torch.no_grad():
        tm.model.encoder.embed_positions.weight.copy_(torch.from_numpy(sin))

    params = jax.tree_util.tree_map(jnp.asarray,
                                    wload.sanitize(_np(tm.state_dict())))

    rng = np.random.default_rng(1)
    mel = rng.standard_normal((1, 8, 3000)).astype(np.float32) * 0.5
    toks = rng.integers(0, 128, (1, 7)).astype(np.int64)

    with torch.no_grad():
        tenc = tm.model.encoder(
            torch.from_numpy(mel)).last_hidden_state.numpy()
        tlog = tm(input_features=torch.from_numpy(mel),
                  decoder_input_ids=torch.from_numpy(toks)).logits.numpy()

    feats = wmodel.encode(params, cfg, jnp.asarray(mel.transpose(0, 2, 1)))
    assert np.abs(np.asarray(feats) - tenc).max() < ATOL

    state = wmodel.init_state(params, cfg, feats)
    jlog, _ = wmodel.decode_step(params, cfg, jnp.asarray(toks, jnp.int32),
                                 state)
    assert np.abs(np.asarray(jlog) - tlog).max() < ATOL


# ------------------------------------------------------------------ LLM family

def _check_llm(tm, hf_cfg_dict, toks):
    from tpu_audio.nn import load_llama, transformer

    tm = tm.eval()
    tree = load_llama.convert_llama(_np(tm.state_dict()))
    cfg = load_llama.config_from_hf(hf_cfg_dict)
    if cfg.tie_word_embeddings:
        tree.pop("lm_head", None)
    tree = jax.tree_util.tree_map(jnp.asarray, tree)
    with torch.no_grad():
        tl = tm(torch.from_numpy(toks)).logits.numpy()
    cache = transformer.make_cache(cfg, toks.shape[0], 16, dtype=jnp.float32)
    jl, _ = transformer.forward(tree, cfg, jnp.asarray(toks, jnp.int32),
                                cache)
    assert np.abs(np.asarray(jl) - tl).max() < ATOL


@pytest.fixture
def toks():
    return np.random.default_rng(2).integers(0, 96, (2, 9)).astype(np.int64)


def test_llama_vs_torch(toks):
    from transformers import LlamaConfig, LlamaForCausalLM

    lc = LlamaConfig(vocab_size=96, hidden_size=32, intermediate_size=64,
                     num_hidden_layers=2, num_attention_heads=4,
                     num_key_value_heads=2, max_position_embeddings=64,
                     rope_theta=10000.0, tie_word_embeddings=False,
                     attention_dropout=0.0)
    torch.manual_seed(0)
    _check_llm(LlamaForCausalLM(lc), lc.to_dict(), toks)


def test_llama3_scaled_rope_vs_torch(toks):
    # the Orpheus-3B / Marvis backbone rope flavor
    from transformers import LlamaConfig, LlamaForCausalLM

    lc = LlamaConfig(vocab_size=96, hidden_size=32, intermediate_size=64,
                     num_hidden_layers=2, num_attention_heads=4,
                     num_key_value_heads=2, max_position_embeddings=64,
                     rope_theta=500000.0, tie_word_embeddings=True,
                     rope_scaling={"rope_type": "llama3", "factor": 8.0,
                                   "low_freq_factor": 1.0,
                                   "high_freq_factor": 4.0,
                                   "original_max_position_embeddings": 32})
    torch.manual_seed(1)
    _check_llm(LlamaForCausalLM(lc), lc.to_dict(), toks)


def test_qwen2_vs_torch(toks):
    # the CosyVoice2/3 LLM flavor (qkv bias)
    from transformers import Qwen2Config, Qwen2ForCausalLM

    qc = Qwen2Config(vocab_size=96, hidden_size=32, intermediate_size=64,
                     num_hidden_layers=2, num_attention_heads=4,
                     num_key_value_heads=2, max_position_embeddings=64,
                     tie_word_embeddings=True)
    torch.manual_seed(2)
    d = qc.to_dict()
    d["model_type"] = "qwen2"
    _check_llm(Qwen2ForCausalLM(qc), d, toks)


def test_qwen3_vs_torch(toks):
    # the Fun-ASR decoder flavor (q/k norm, explicit head_dim)
    from transformers import Qwen3Config, Qwen3ForCausalLM

    q3 = Qwen3Config(vocab_size=96, hidden_size=32, intermediate_size=64,
                     num_hidden_layers=2, num_attention_heads=4,
                     num_key_value_heads=2, head_dim=8,
                     max_position_embeddings=64, tie_word_embeddings=False)
    torch.manual_seed(3)
    d = q3.to_dict()
    d["model_type"] = "qwen3"
    _check_llm(Qwen3ForCausalLM(q3), d, toks)


def test_gpt2_vs_torch(toks):
    # the Chatterbox Turbo backbone: fused c_attn split, Conv1D transposes,
    # learned positions, gelu_new
    from transformers import GPT2Config, GPT2Model

    from tpu_audio.nn import load_llama, transformer

    gc = GPT2Config(vocab_size=96, n_positions=64, n_embd=32, n_layer=2,
                    n_head=4, resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0)
    torch.manual_seed(4)
    tm = GPT2Model(gc).eval()
    tree = jax.tree_util.tree_map(
        jnp.asarray, load_llama.convert_gpt2(_np(tm.state_dict())))
    cfg = transformer.TransformerConfig(
        dim=32, n_layers=2, n_heads=4, n_kv_heads=4, hidden_dim=128,
        vocab_size=96, mlp="gelu_new", norm="ln", pos_emb="learned",
        max_position_embeddings=64, tie_word_embeddings=True)
    with torch.no_grad():
        th = tm(torch.from_numpy(toks)).last_hidden_state.numpy()
    cache = transformer.make_cache(cfg, toks.shape[0], 16, dtype=jnp.float32)
    x = jnp.take(tree["embed"]["weight"], jnp.asarray(toks), axis=0)
    h, _ = transformer.forward_hidden(tree, cfg, x, cache)
    assert np.abs(np.asarray(h) - th).max() < ATOL


# ------------------------------------------------------------------ Mimi codec

def _map_mimi_keys(sd, n_ratios):
    """HF MimiModel state dict → this framework's codecs/mimi tree."""
    flat = {}
    for k, v in sd.items():
        v = v.float().numpy()
        nk = k
        for side in ("encoder", "decoder"):
            m = re.match(rf"^{side}\.layers\.(\d+)\.(.*)$", k)
            if not m:
                continue
            i, rest = int(m.group(1)), m.group(2)
            rest = (rest.replace("block.1.conv", "block.0")
                    .replace("block.3.conv", "block.1")
                    .replace("conv.", ""))
            # HF interleaves parameter-free ELU layers in the index space:
            # encoder: 0 init | per ratio: resblock, elu, conv | elu, final
            # decoder: 0 init | per ratio: elu, convtr, resblock | elu, final
            if i == 0:
                nk = f"{side}.init_conv1d.{rest}"
            elif i == 3 * n_ratios + 2:
                nk = f"{side}.final_conv1d.{rest}"
            elif side == "encoder":
                j, r = divmod(i - 1, 3)
                nk = f"encoder.layers.{2 * j + (0 if r == 0 else 1)}.{rest}"
            else:
                j, r = divmod(i - 2, 3)
                nk = f"decoder.layers.{2 * j + (0 if r == 0 else 1)}.{rest}"
        nk = nk.replace(".self_attn.q_proj.", ".self_attn.q.")
        nk = nk.replace(".self_attn.k_proj.", ".self_attn.k.")
        nk = nk.replace(".self_attn.v_proj.", ".self_attn.v.")
        nk = nk.replace(".self_attn.o_proj.", ".self_attn.o.")
        nk = nk.replace(".input_layernorm.", ".norm1.")
        nk = nk.replace(".post_attention_layernorm.", ".norm2.")
        nk = nk.replace(".self_attn_layer_scale.scale", ".gamma_1")
        nk = nk.replace(".mlp_layer_scale.scale", ".gamma_2")
        nk = nk.replace("quantizer.semantic_residual_vector_quantizer.",
                        "quantizer.rvq_first.")
        nk = nk.replace("quantizer.acoustic_residual_vector_quantizer.",
                        "quantizer.rvq_rest.")
        nk = re.sub(r"(rvq_(?:first|rest))\.layers\.", r"\1.vq.layers.", nk)
        nk = nk.replace(".codebook.embed_sum", ".codebook.embedding_sum")
        nk = nk.replace("upsample.conv.", "upsample.convtr.")
        if nk.endswith("initialized"):
            continue
        if v.ndim == 3:
            is_tr = ("upsample.convtr" in nk
                     or ("decoder.layers" in nk and "block" not in nk
                         and int(nk.split(".")[2]) % 2 == 0))
            if is_tr:
                # dense ConvTranspose (I, O, K) → (K, I, O); depthwise
                # (C, 1, K) → (K, 1, C)
                v = (v.transpose(2, 1, 0) if v.shape[1] == 1
                     else v.transpose(2, 0, 1))
            else:
                v = v.transpose(2, 1, 0)  # Conv1d (O, I, K) → (K, I, O)
        flat[nk] = v
    return flat


def test_mimi_codec_vs_torch():
    from transformers import MimiConfig as HFMimiConfig
    from transformers.models.mimi.modeling_mimi import MimiModel

    from tpu_audio.codecs.mimi import model as mm
    from tpu_audio.codecs.mimi.model import MimiConfig
    from tpu_audio.utils import pytree

    ratios = [4, 3, 2]
    hf = HFMimiConfig(
        sampling_rate=24000, frame_rate=500.0, audio_channels=1,
        hidden_size=32, num_filters=8, num_residual_layers=1,
        upsampling_ratios=ratios, codebook_size=64, codebook_dim=8,
        num_quantizers=4, num_semantic_quantizers=1,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        intermediate_size=64, head_dim=8, sliding_window=250,
        vector_quantization_hidden_dimension=8, upsample_groups=32,
        hidden_act="gelu_pytorch_tanh", norm_eps=1e-5,
        layer_scale_initial_scale=0.01, rope_theta=10000.0,
        use_causal_conv=True, pad_mode="constant", compress=2,
        kernel_size=7, last_kernel_size=3, residual_kernel_size=3,
        trim_right_ratio=1.0, use_cache=False)
    torch.manual_seed(0)
    tm = MimiModel(hf).eval()

    cfg = MimiConfig(sample_rate=24000, frame_rate=500.0, dimension=32,
                     n_filters=8, ratios=tuple(ratios), t_layers=2, t_heads=4,
                     t_ff=64, t_context=250, n_q=4, bins=64, q_dim=8)
    assert cfg.downsample_stride == 2

    flat = _map_mimi_keys(tm.state_dict(), len(ratios))
    tree = pytree.unflatten({k: jnp.asarray(v) for k, v in flat.items()})

    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(cfg.hop * 40) * 0.1).astype(np.float32)[None]
    with torch.no_grad():
        tcodes = tm.encode(torch.from_numpy(audio)[:, None]).audio_codes
    jcodes = np.asarray(mm.encode(tree, cfg, jnp.asarray(audio)))
    assert (tcodes.numpy() == jcodes).all(), "speech tokens diverge"

    codes = rng.integers(0, 64, (1, 4, 10)).astype(np.int64)
    with torch.no_grad():
        taudio = tm.decode(torch.from_numpy(codes)).audio_values.numpy()[:, 0]
    jaudio = np.asarray(mm.decode(tree, cfg, jnp.asarray(codes, jnp.int32)))
    assert taudio.shape == jaudio.shape
    assert np.abs(taudio - jaudio).max() < ATOL


# ------------------------------------------------------------------ DAC codec

def test_dac_codec_vs_torch():
    # OuteTTS's codec: weight-norm convs, snake activations, cosine RVQ
    from transformers import DacConfig
    from transformers.models.dac.modeling_dac import DacModel

    from tpu_audio.codecs.dac import model as dm
    from tpu_audio.codecs.dac.model import DACConfig
    from tpu_audio.utils import pytree

    hf = DacConfig(encoder_hidden_size=8, downsampling_ratios=[2, 4],
                   decoder_hidden_size=16, upsampling_ratios=[4, 2],
                   n_codebooks=2, codebook_size=32, codebook_dim=4,
                   sampling_rate=24000, hidden_size=16)
    torch.manual_seed(0)
    tm = DacModel(hf).eval()

    cfg = DACConfig(sampling_rate=24000, encoder_dim=8, encoder_rates=(2, 4),
                    decoder_dim=16, decoder_rates=(4, 2), n_codebooks=2,
                    codebook_size=32, codebook_dim=4, latent_dim=16)

    flat = {}
    for k, v in tm.state_dict().items():
        v = v.float().numpy()
        nk = (k.replace("encoder.conv1.", "encoder.conv_in.")
              .replace("encoder.snake1.", "encoder.snake_out.")
              .replace("encoder.conv2.", "encoder.conv_out.")
              .replace("decoder.conv1.", "decoder.conv_in.")
              .replace("decoder.snake1.", "decoder.snake_out.")
              .replace("decoder.conv2.", "decoder.conv_out."))
        m = re.match(r"^(encoder|decoder)\.block\.(\d+)\.(.*)$", nk)
        if m:
            side, i, rest = m.group(1), m.group(2), m.group(3)
            rest = re.sub(r"^res_unit(\d)\.",
                          lambda mm: f"residuals.{int(mm.group(1)) - 1}.",
                          rest)
            rest = re.sub(r"^snake1\.", "snake.", rest)
            rest = re.sub(r"^conv1\.", "conv.", rest)
            rest = re.sub(r"^conv_t1\.", "convT.", rest)
            nk = f"{side}.blocks.{i}.{rest}"
        nk = re.sub(r"^quantizer\.quantizers\.(\d+)\.", r"quantizer.\1.", nk)
        if v.ndim == 3 and nk.endswith("alpha"):
            v = v.transpose(0, 2, 1)  # (1, C, 1) → (1, 1, C)
        elif v.ndim == 3:
            # HF ships folded (plain) conv weights; this framework stores the
            # weight-norm (v, g) decomposition the mlx checkpoints use.
            # Re-decompose with the same norm axes the forward uses.
            if ".convT." in nk:
                v = v.transpose(2, 0, 1)  # (I, O, K) → (K, I, O)
                axes = (0, 2)  # per input channel (torch weight_norm dim=1)
            else:
                v = v.transpose(2, 1, 0)  # (O, I, K) → (K, I, O)
                axes = (0, 1)  # per output channel (torch weight_norm dim=0)
            flat[nk.replace(".weight", ".weight_g")] = np.linalg.norm(
                v, axis=axes, keepdims=True)
            flat[nk.replace(".weight", ".weight_v")] = v
            continue
        flat[nk] = v
    tree = pytree.unflatten({k: jnp.asarray(v) for k, v in flat.items()})

    rng = np.random.default_rng(0)
    audio = (rng.standard_normal(8 * 50) * 0.2).astype(np.float32)[None]
    with torch.no_grad():
        tcodes = tm.encode(torch.from_numpy(audio)[:, None]).audio_codes
    jcodes = np.asarray(dm.encode(tree, cfg, jnp.asarray(audio)))
    assert (tcodes.numpy() == jcodes).all(), "DAC codes diverge"

    codes = rng.integers(0, 32, (1, 2, 12)).astype(np.int64)
    with torch.no_grad():
        taud = tm.decode(
            audio_codes=torch.from_numpy(codes)).audio_values.numpy()
    jaud = np.asarray(dm.decode_codes(tree, cfg, jnp.asarray(codes,
                                                             jnp.int32)))
    assert taud.shape == jaud.shape
    assert np.abs(taud - jaud).max() < ATOL


# ------------------------------------------------------------------ ALBERT

def test_albert_vs_torch():
    # Kokoro's text encoder (layer-shared BERT; reference uses MLX's exact
    # erf gelu, so hidden_act="gelu" here, not HF's default gelu_new)
    from transformers import AlbertConfig as HFAlbertConfig
    from transformers import AlbertModel

    from tpu_audio.models.kokoro import albert
    from tpu_audio.models.kokoro.config import AlbertConfig
    from tpu_audio.utils import pytree

    hf = HFAlbertConfig(vocab_size=100, embedding_size=16, hidden_size=32,
                        num_hidden_layers=3, num_hidden_groups=1,
                        num_attention_heads=4, intermediate_size=64,
                        inner_group_num=1, hidden_act="gelu",
                        hidden_dropout_prob=0.0,
                        attention_probs_dropout_prob=0.0,
                        max_position_embeddings=64, type_vocab_size=2,
                        layer_norm_eps=1e-12)
    torch.manual_seed(0)
    tm = AlbertModel(hf, add_pooling_layer=False).eval()

    cfg = AlbertConfig(vocab_size=100, embedding_size=16, hidden_size=32,
                       num_hidden_layers=3, num_attention_heads=4,
                       intermediate_size=64, max_position_embeddings=64,
                       type_vocab_size=2, layer_norm_eps=1e-12)

    flat = {k: jnp.asarray(v.float().numpy())
            for k, v in tm.state_dict().items() if "position_ids" not in k}
    tree = pytree.unflatten(flat)

    rng = np.random.default_rng(0)
    ids = rng.integers(0, 100, (2, 11)).astype(np.int64)
    mask = np.ones((2, 11), np.int64)
    mask[1, 8:] = 0
    with torch.no_grad():
        th = tm(input_ids=torch.from_numpy(ids),
                attention_mask=torch.from_numpy(mask)
                ).last_hidden_state.numpy()
    jh = np.asarray(albert.forward(tree, cfg, jnp.asarray(ids, jnp.int32),
                                   jnp.asarray(mask, jnp.int32)))
    assert np.abs(jh - th)[mask.astype(bool)].max() < ATOL
