"""CosyVoice3 tests: DiT estimator, LM streaming, token-granularity engine."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_audio.codecs import s3tokenizer
from tpu_audio.codecs.s3gen import conformer, flow, hift
from tpu_audio.models.cosyvoice2 import lm as lm_mod
from tpu_audio.models.cosyvoice3 import dit
from tpu_audio.models.cosyvoice3 import model as cv3
from tpu_audio.models.cosyvoice3.engine import CosyVoice3Engine
from tpu_audio.nn import transformer

TINY_QWEN = transformer.TransformerConfig(
    dim=48, n_layers=2, n_heads=4, n_kv_heads=2, hidden_dim=96,
    vocab_size=400, attn_qkv_bias=True, tie_word_embeddings=True)
TINY_LM = lm_mod.CosyLMConfig(qwen=TINY_QWEN, llm_input_size=48,
                              speech_token_size=60)

TINY_DIT = dit.DiTConfig(mel_dim=16, dim=32, depth=2, heads=4, head_dim=8,
                         spk_dim=16, conv_pos_groups=4)

TINY_FLOW = cv3.CV3FlowConfig(
    vocab_size=64, input_dim=32, spk_dim=24, mel_dim=16,
    conformer=conformer.ConformerConfig(input_size=32, output_size=32,
                                        heads=4, linear_units=64,
                                        num_blocks=1, num_up_blocks=1),
    dit=TINY_DIT, cfm=flow.CFMConfig(n_timesteps=2),
    hift=hift.HiFTConfig(in_channels=16, base_channels=32,
                         upsample_rates=(4, 3), upsample_kernels=(8, 7),
                         source_resblock_kernels=(7, 11),
                         source_resblock_dilations=((1, 3, 5), (1, 3, 5)),
                         resblock_kernels=(3,),
                         resblock_dilations=((1, 3, 5),)))


@pytest.fixture(scope="module")
def lm_params():
    return lm_mod.init_params(jax.random.PRNGKey(0), TINY_LM)


@pytest.fixture(scope="module")
def flow_params():
    return cv3.init_params(jax.random.PRNGKey(1), TINY_FLOW)


class TestDiT:
    def test_forward_shapes(self, rng):
        params = dit.init_params(jax.random.PRNGKey(0), TINY_DIT)
        x = jnp.asarray(rng.standard_normal((2, 10, 16)), jnp.float32)
        v = dit.forward(params, TINY_DIT, x, jnp.asarray([10, 7]), x,
                        jnp.asarray([0.3, 0.3]), jnp.zeros((2, 16)), x)
        assert v.shape == (2, 10, 16)
        assert np.isfinite(np.asarray(v)).all()
        # masked frames are zero
        assert np.all(np.asarray(v[1, 7:]) == 0)

    def test_streaming_mask(self, rng):
        params = dit.init_params(jax.random.PRNGKey(0), TINY_DIT)
        x = jnp.asarray(rng.standard_normal((1, 8, 16)), jnp.float32)
        v = dit.forward(params, TINY_DIT, x, jnp.asarray([8]), x,
                        jnp.asarray([0.5]), jnp.zeros((1, 16)), x,
                        streaming=True)
        assert np.isfinite(np.asarray(v)).all()


class TestSilentFilter:
    def test_long_runs_dropped(self):
        toks = [5] + [1] * 8 + [7]
        out = cv3.filter_silent_tokens(toks)
        assert out == [5] + [1] * 5 + [7]

    def test_short_runs_kept(self):
        toks = [1, 2, 5, 28, 29]
        assert cv3.filter_silent_tokens(toks) == toks


class TestLMStreaming:
    def test_stream_matches_tokens(self, lm_params):
        gen = lm_mod.CosyLMGenerator(lm_params, TINY_LM, max_cache=256)
        streamer = lm_mod.CosyLMStreamer(gen, chunk=4)
        chunks = list(streamer.stream([5, 6, 7], [], [1, 2], seed=0,
                                      max_new=12))
        assert len(chunks) >= 1
        all_toks = [t for c in chunks for t in c]
        assert all(0 <= t < TINY_LM.speech_token_size for t in all_toks)


class TestCV3Synthesis:
    def test_stream_yields_audio(self, flow_params, rng):
        synth = cv3.CV3Synthesizer(flow_params, TINY_FLOW)
        token_chunks = [list(rng.integers(3, 60, 6)) for _ in range(3)]
        out = list(synth.stream(iter(token_chunks), [0, 1],
                                rng.standard_normal((4, 16)).astype(np.float32),
                                np.zeros((1, 24), np.float32), seed=0,
                                chunk_size=6))
        assert len(out) >= 1
        total = sum(len(a) for a in out)
        ups = TINY_FLOW.hift.upsample_scale
        assert total == 18 * 2 * ups  # all generated tokens → audio
        for a in out:
            assert np.isfinite(a).all()


class TestCV3Engine:
    def test_token_streaming_e2e(self, lm_params, flow_params):
        tok_cfg = s3tokenizer.S3TokenizerConfig(
            n_mels=128, n_audio_state=64, n_audio_head=4, n_audio_layer=1)
        tok_params = s3tokenizer.init_params(jax.random.PRNGKey(2), tok_cfg)
        eng = CosyVoice3Engine.from_params(
            lm_params, TINY_LM, flow_params, TINY_FLOW, tok_params, tok_cfg,
            max_cache=256, chunk=4)
        chunks = list(eng.generate_streaming("Hello there."))
        assert chunks[-1].is_final
        assert all(np.isfinite(c.samples).all() for c in chunks)

    def test_voice_conversion(self, lm_params, flow_params, rng):
        """synthesizeVC parity (CosyVoice3Model.swift:415-445): no LM —
        source tokens straight through flow+HiFT with target conditioning."""
        tok_cfg = s3tokenizer.S3TokenizerConfig(
            n_mels=128, n_audio_state=64, n_audio_head=4, n_audio_layer=1)
        tok_params = s3tokenizer.init_params(jax.random.PRNGKey(2), tok_cfg)
        eng = CosyVoice3Engine.from_params(
            lm_params, TINY_LM, flow_params, TINY_FLOW, tok_params, tok_cfg,
            max_cache=256, chunk=4)
        audio = (0.1 * np.sin(np.linspace(0, 400 * np.pi, 16000))
                 ).astype(np.float32)
        spk = eng.prepare_conditionals(audio, 16000, ref_text="reference")
        assert len(spk.speech_tokens) > 0
        out = eng.voice_conversion(audio, 16000)
        assert np.isfinite(out).all() and len(out) > 0
        # duration: one output sample per source token × ratio × upsample
        ups = TINY_FLOW.hift.upsample_scale * TINY_FLOW.token_mel_ratio
        assert len(out) % ups == 0

    def test_sentence_granularity(self, lm_params, flow_params):
        from tpu_audio.api.tts import StreamingGranularity

        tok_cfg = s3tokenizer.S3TokenizerConfig(
            n_mels=128, n_audio_state=64, n_audio_head=4, n_audio_layer=1)
        tok_params = s3tokenizer.init_params(jax.random.PRNGKey(2), tok_cfg)
        eng = CosyVoice3Engine.from_params(
            lm_params, TINY_LM, flow_params, TINY_FLOW, tok_params, tok_cfg,
            max_cache=256, chunk=4)
        res = eng.generate("Hi.",
                           granularity=StreamingGranularity.SENTENCE)
        assert np.isfinite(res.samples).all()
