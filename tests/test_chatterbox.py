"""Chatterbox tests: T3 CFG decode, perceiver, voice encoder, engine e2e."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_audio.codecs import s3tokenizer
from tpu_audio.codecs.s3gen import campplus, conformer, flow, hift
from tpu_audio.codecs.s3gen import model as s3gen
from tpu_audio.models.chatterbox import t3 as t3mod
from tpu_audio.models.chatterbox import voice_encoder as ve
from tpu_audio.models.chatterbox.engine import ChatterboxEngine, punc_norm
from tpu_audio.nn import transformer

pytestmark = pytest.mark.slow  # engine e2e / parity / mesh

TINY_T3 = t3mod.T3Config(
    llama=transformer.TransformerConfig(dim=64, n_layers=2, n_heads=4,
                                        n_kv_heads=4, hidden_dim=128),
    text_tokens_dict_size=300, speech_tokens_dict_size=80,
    start_speech_token=70, stop_speech_token=71, speaker_embed_size=32,
    perceiver_tokens=4, max_text_seq_len=128, max_mel_seq_len=256)

TINY_VE = ve.VoiceEncConfig(num_mels=40, ve_hidden_size=16,
                            speaker_embed_size=32, partial_frames=40,
                            partial_hop=20)


@pytest.fixture(scope="module")
def t3_params():
    return t3mod.init_params(jax.random.PRNGKey(0), TINY_T3)


class TestT3:
    def test_conditioning_shape(self, t3_params):
        spk = jnp.zeros((1, 32))
        toks = jnp.zeros((1, 10), jnp.int32)
        cond = t3mod.prepare_conditioning(t3_params, TINY_T3, spk, toks, 0.5)
        assert cond.shape == (1, 1 + 4 + 1, 64)

    def test_generate_stops_and_filters(self, t3_params):
        gen = t3mod.T3Generator(t3_params, TINY_T3, max_cache=256)
        cond = t3mod.prepare_conditioning(
            t3_params, TINY_T3, jnp.zeros((1, 32)),
            jnp.zeros((1, 6), jnp.int32), 0.5)
        out = gen.generate(cond, [255, 5, 6, 7, 0], max_new=24, seed=0)
        assert all(t < TINY_T3.start_speech_token for t in out)
        assert len(out) <= 24

    def test_text_bucket_exactness(self, t3_params):
        """Greedy-ish decode must not depend on the text padding bucket."""
        gen = t3mod.T3Generator(t3_params, TINY_T3, max_cache=256)
        cond = t3mod.prepare_conditioning(
            t3_params, TINY_T3, jnp.zeros((1, 32)), None, 0.5)
        sampler = t3mod.T3SamplerConfig(temperature=1e-4, cfg_weight=0.5)
        text = list(range(10, 30))
        o1 = gen.generate(cond, text, sampler=sampler, max_new=8, seed=1)
        gen2 = t3mod.T3Generator(t3_params, TINY_T3, max_cache=256)
        o2 = gen2.generate(cond, text + [0] * 0, sampler=sampler, max_new=8,
                           seed=1)
        assert o1 == o2
        # force a different bucket by monkeypatching bucket size
        n = len(text)
        pad64 = -(-n // 64) * 64
        toks = np.zeros(pad64, np.int32)
        toks[:n] = text
        fn = gen._fn(pad64, cond.shape[1], 8, sampler)
        buf, cnt = fn(t3_params, cond, jnp.asarray(toks), jnp.int32(n),
                      jax.random.PRNGKey(1))
        o3 = [int(t) for t in np.asarray(buf[: int(cnt)])
              if t < TINY_T3.start_speech_token]
        assert o1 == o3


class TestVoiceEncoder:
    def test_embed_utterance(self, rng):
        params = ve.init_params(jax.random.PRNGKey(0), TINY_VE)
        audio = rng.standard_normal(16000).astype(np.float32) * 0.1
        emb = ve.embed_utterance(params, TINY_VE, audio)
        assert emb.shape == (32,)
        np.testing.assert_allclose(float(jnp.linalg.norm(emb)), 1.0, atol=1e-5)


class TestPuncNorm:
    def test_capitalize_and_terminate(self):
        assert punc_norm("hello world") == "Hello world."

    def test_empty(self):
        assert "add some text" in punc_norm("")


class TestEngineEndToEnd:
    def test_generate(self, t3_params, rng):
        tok_cfg = s3tokenizer.S3TokenizerConfig(
            n_mels=128, n_audio_state=64, n_audio_head=4, n_audio_layer=1)
        tok_params = s3tokenizer.init_params(jax.random.PRNGKey(1), tok_cfg)
        s3_cfg = s3gen.S3GenConfig(
            vocab_size=80, input_dim=32, spk_dim=24, mel_dim=16,
            conformer=conformer.ConformerConfig(
                input_size=32, output_size=32, heads=4, linear_units=64,
                num_blocks=1, num_up_blocks=1),
            estimator=flow.EstimatorConfig(
                in_channels=16 * 4, out_channels=16, channels=32, n_blocks=1,
                num_mid_blocks=1, num_heads=4),
            cfm=flow.CFMConfig(n_timesteps=2),
            hift=hift.HiFTConfig(in_channels=16, base_channels=32,
                                 upsample_rates=(4, 3), upsample_kernels=(8, 7),
                                 source_resblock_kernels=(7, 11),
                                 source_resblock_dilations=((1, 3, 5), (1, 3, 5)),
                                 resblock_kernels=(3,),
                                 resblock_dilations=((1, 3, 5),)),
            campplus=campplus.CAMPPlusConfig(
                feat_dim=80, embedding_size=24, growth_rate=8, bn_size=2,
                init_channels=16, blocks=(2,), kernels=(3,), dilations=(1,)))
        s3_params = s3gen.init_params(jax.random.PRNGKey(2), s3_cfg)
        ve_params = ve.init_params(jax.random.PRNGKey(3), TINY_VE)

        eng = ChatterboxEngine.from_params(
            t3_params, TINY_T3, s3_params, s3_cfg, tok_params, tok_cfg,
            ve_params, TINY_VE, max_cache=256)
        res = eng.generate("Hi there.", max_new_tokens=12)
        assert res.sample_rate == 24000
        assert np.isfinite(res.samples).all()

    def test_prepare_conditionals(self, t3_params, rng):
        tok_cfg = s3tokenizer.S3TokenizerConfig(
            n_mels=128, n_audio_state=64, n_audio_head=4, n_audio_layer=1)
        tok_params = s3tokenizer.init_params(jax.random.PRNGKey(1), tok_cfg)
        s3_cfg = s3gen.S3GenConfig(
            vocab_size=80, input_dim=32, spk_dim=24, mel_dim=16,
            campplus=campplus.CAMPPlusConfig(
                feat_dim=80, embedding_size=24, growth_rate=8, bn_size=2,
                init_channels=16, blocks=(2,), kernels=(3,), dilations=(1,)))
        s3_params = s3gen.init_params(jax.random.PRNGKey(2), s3_cfg)
        ve_params = ve.init_params(jax.random.PRNGKey(3), TINY_VE)
        eng = ChatterboxEngine.from_params(
            t3_params, TINY_T3, s3_params, s3_cfg, tok_params, tok_cfg,
            ve_params, TINY_VE)
        audio = (0.1 * np.sin(np.linspace(0, 800 * np.pi, 24000))).astype(np.float32)
        cond = eng.prepare_conditionals(audio, 24000)
        assert cond.speaker_emb.shape == (1, 32)
        assert cond.embedding.shape == (1, 24)
        assert cond.prompt_mel.shape[1] == 2 * cond.prompt_tokens.shape[1]

    def test_conditioning_survives_unload(self, t3_params, rng):
        """Reference semantics (Protocols/TTSEngine.swift:68-73): unload()
        releases the model but keeps prepared speaker conditioning for
        fast reload."""
        tok_cfg = s3tokenizer.S3TokenizerConfig(
            n_mels=128, n_audio_state=64, n_audio_head=4, n_audio_layer=1)
        tok_params = s3tokenizer.init_params(jax.random.PRNGKey(1), tok_cfg)
        s3_cfg = s3gen.S3GenConfig(
            vocab_size=80, input_dim=32, spk_dim=24, mel_dim=16,
            campplus=campplus.CAMPPlusConfig(
                feat_dim=80, embedding_size=24, growth_rate=8, bn_size=2,
                init_channels=16, blocks=(2,), kernels=(3,), dilations=(1,)))
        s3_params = s3gen.init_params(jax.random.PRNGKey(2), s3_cfg)
        ve_params = ve.init_params(jax.random.PRNGKey(3), TINY_VE)
        eng = ChatterboxEngine.from_params(
            t3_params, TINY_T3, s3_params, s3_cfg, tok_params, tok_cfg,
            ve_params, TINY_VE)
        audio = (0.1 * np.sin(np.linspace(0, 800 * np.pi, 24000))
                 ).astype(np.float32)
        cond = eng.prepare_conditionals(audio, 24000)
        eng.unload()
        assert not eng.is_loaded
        assert eng.conditionals is cond  # speaker survives unload
