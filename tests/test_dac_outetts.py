"""DAC codec round-trip + OuteTTS grammar/engine tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_audio.codecs import dac
from tpu_audio.models.outetts import engine as oengine
from tpu_audio.models.outetts import features as ofeat
from tpu_audio.models.outetts import tokens as T
from tpu_audio.models.outetts.engine import OuteTTSEngine
from tpu_audio.models.outetts.tokens import (AudioFeatures, SpeakerProfile,
                                             WordData)
from tpu_audio.nn import transformer

pytestmark = pytest.mark.slow  # engine e2e / parity / mesh

TINY_DAC = dac.DACConfig(encoder_dim=8, encoder_rates=(2, 4, 5, 8),
                         decoder_dim=64, decoder_rates=(8, 5, 4, 2),
                         n_codebooks=2, codebook_size=32, codebook_dim=4,
                         latent_dim=128)


@pytest.fixture(scope="module")
def dac_params():
    return dac.init_params(jax.random.PRNGKey(0), TINY_DAC)


class TestDAC:
    def test_encode_decode_shapes(self, dac_params, rng):
        hop = TINY_DAC.hop  # 320
        audio = jnp.asarray(rng.standard_normal((1, hop * 5)), jnp.float32)
        codes = dac.encode(dac_params, TINY_DAC, audio)
        assert codes.shape == (1, 2, 5)
        recon = dac.decode_codes(dac_params, TINY_DAC, codes)
        assert recon.shape == (1, hop * 5)
        assert np.isfinite(np.asarray(recon)).all()

    def test_codes_in_range(self, dac_params, rng):
        audio = jnp.asarray(rng.standard_normal((1, TINY_DAC.hop * 3)), jnp.float32)
        codes = np.asarray(dac.encode(dac_params, TINY_DAC, audio))
        assert codes.min() >= 0 and codes.max() < TINY_DAC.codebook_size

    def test_quantize_reduces_residual(self, dac_params, rng):
        """Each RVQ stage should shrink the residual (random init: weakly)."""
        z = dac.model.encode_latent(dac_params, TINY_DAC,
                                    jnp.asarray(rng.standard_normal(
                                        (1, TINY_DAC.hop * 4)), jnp.float32))
        codes, z_q = dac.model.quantize(dac_params, TINY_DAC, z)
        assert z_q.shape == z.shape


class TestOuteTokens:
    def test_word_codes_grammar(self):
        w = WordData(word="hello", duration=0.24,
                     features=AudioFeatures(10, 20, 30), c1=[1, 2], c2=[3, 4])
        s = w.to_codes()
        assert s.startswith("<|word_start|>hello<|features|><|t_0.24|>")
        assert "<|energy_10|><|spectral_centroid_20|><|pitch_30|>" in s
        assert "<|code|><|c1_1|><|c2_3|><|c1_2|><|c2_4|><|word_end|>" in s

    def test_profile_roundtrip(self, tmp_path):
        p = SpeakerProfile(text="hi there",
                           words=[WordData("hi", 0.2, c1=[5], c2=[6])])
        path = p.save(str(tmp_path / "spk.json"))
        q = SpeakerProfile.load(path)
        assert q.text == "hi there"
        assert q.words[0].c1 == [5]

    def test_build_prompt_no_speaker(self):
        s = oengine.build_prompt("Hello  world…", None)
        assert s == ("<|im_start|><|text_start|>Hello world...<|text_end|>\n"
                     "<|audio_start|>\n")

    def test_build_prompt_with_speaker(self):
        spk = SpeakerProfile(text="reference", words=[
            WordData("reference", 0.5, c1=[1], c2=[2])])
        s = oengine.build_prompt("New text.", spk)
        assert "reference. New text." in s
        assert "<|c1_1|><|c2_2|>" in s

    def test_extract_codes(self):
        txt = "<|c1_7|><|c2_8|>junk<|c1_9|><|c2_10|><|c1_11|>"
        c1, c2 = oengine.extract_codes(txt)
        assert list(c1) == [7, 9] and list(c2) == [8, 10]


class TestFeatures:
    def test_pitch_detects_tone(self):
        sr = 24000
        t = np.arange(sr) / sr
        tone = np.sin(2 * np.pi * 220 * t).astype(np.float32)
        f0 = ofeat.pitch_autocorr(tone, sr)
        assert abs(f0 - 220) < 10

    def test_feature_buckets_in_range(self, rng):
        f = ofeat.extract_features(
            rng.standard_normal(24000).astype(np.float32) * 0.1, 24000)
        for v in (f.energy, f.spectral_centroid, f.pitch):
            assert 0 <= v <= 100


class TestOuteEngine:
    def test_end_to_end_random_weights(self, dac_params):
        cfg = transformer.TransformerConfig(
            dim=32, n_layers=2, n_heads=4, hidden_dim=64, vocab_size=512,
            tie_word_embeddings=True)
        lm_params = transformer.init_params(jax.random.PRNGKey(1), cfg)
        eng = OuteTTSEngine.from_params(lm_params, cfg, dac_params, TINY_DAC,
                                        max_cache=256)
        res = eng.generate("Hi.", max_new_tokens=16)
        assert res.sample_rate == 24000
        assert np.isfinite(res.samples).all()

    def test_generate_batch(self, dac_params):
        cfg = transformer.TransformerConfig(
            dim=32, n_layers=2, n_heads=4, hidden_dim=64, vocab_size=512,
            tie_word_embeddings=True)
        lm_params = transformer.init_params(jax.random.PRNGKey(1), cfg)
        eng = OuteTTSEngine.from_params(lm_params, cfg, dac_params, TINY_DAC,
                                        max_cache=256)
        results = eng.generate_batch(["Hi.", "Hello there."],
                                     max_new_tokens=16)
        assert len(results) == 2
        for r in results:
            assert r.sample_rate == 24000
            assert np.isfinite(r.samples).all()
        assert not eng.is_generating
