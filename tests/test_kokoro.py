"""Kokoro stack tests: masked static-shape parity, alignment, phonemizer,
end-to-end engine on random weights."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_audio.models.kokoro import model as kmodel
from tpu_audio.models.kokoro import phonemize, synth, voices
from tpu_audio.models.kokoro.config import AlbertConfig, KokoroConfig
from tpu_audio.models.kokoro.engine import KokoroEngine
from tpu_audio.nn import layers, lstm

pytestmark = pytest.mark.slow  # engine e2e / parity / mesh

TINY = KokoroConfig(
    albert=AlbertConfig(num_hidden_layers=2, num_attention_heads=2,
                        hidden_size=32, intermediate_size=64,
                        embedding_size=16),
    d_model=64, style_dim=32, max_dur=10,
    decoder_hidden=128, upsample_initial_channel=64,
    resblock_kernels=(3,), resblock_dilations=((1, 3, 5),),
    upsample_rates=(2, 2), upsample_kernels=(4, 4),
    istft_n_fft=8, istft_hop=2,
)


@pytest.fixture(scope="module")
def params():
    return kmodel.init_params(jax.random.PRNGKey(0), TINY)


class TestMaskedOps:
    def test_masked_bilstm_matches_exact(self, rng):
        p = kmodel._init_bilstm(jax.random.PRNGKey(1), 8, 4)
        x = rng.standard_normal((1, 20, 8)).astype(np.float32)
        exact = lstm.bilstm(p, jnp.asarray(x[:, :13]))
        padded = lstm.masked_bilstm(p, jnp.asarray(x), 13)
        np.testing.assert_allclose(np.asarray(padded[:, :13]),
                                   np.asarray(exact), atol=1e-5)
        assert np.all(np.asarray(padded[:, 13:]) == 0)

    def test_masked_instance_norm_matches_exact(self, rng):
        x = rng.standard_normal((1, 16, 4)).astype(np.float32)
        exact = layers.instance_norm(None, jnp.asarray(x[:, :11]))
        padded = layers.masked_instance_norm(jnp.asarray(x), 11)
        np.testing.assert_allclose(np.asarray(padded[:, :11]),
                                   np.asarray(exact), atol=1e-5)


class TestAlignment:
    def test_alignment_matrix(self):
        dur = jnp.asarray([[2, 3, 1, 0, 0]], jnp.int32)
        a = np.asarray(kmodel.alignment_matrix(dur, 8))
        assert a.shape == (5, 8)
        np.testing.assert_array_equal(a[:, :6].argmax(0), [0, 0, 1, 1, 1, 2])
        assert a[:, 6:].sum() == 0  # frames past total are unassigned
        assert (a.sum(0)[:6] == 1).all()


class TestStages:
    def test_stage1_shapes(self, params):
        tokens = jnp.zeros((1, synth.TOKEN_PAD), jnp.int32)
        style = jnp.zeros((1, TINY.style_dim))
        d, dur, t_en = jax.jit(
            lambda p, t: (
                kmodel.duration_encode(
                    p, TINY, kmodel.bert_duration_features(p, TINY, t, 7),
                    style, 7),
                None, None))(params, tokens)[0], None, None
        assert d.shape == (1, synth.TOKEN_PAD, TINY.d_model + TINY.style_dim)

    def test_frame_padding_parity(self, params, rng):
        """The core static-shape guarantee: two different frame paddings of
        the same sentence produce identical audio on the valid samples."""
        s = synth.KokoroSynthesizer(params, TINY)
        tok_ids = [43, 16, 53, 57, 53, 57, 60, 57]  # arbitrary real ids
        pack = voices.random_voice(0)[:, :, : 2 * TINY.style_dim]
        # directly exercise stage2 at two paddings
        tokens = np.zeros((1, synth.TOKEN_PAD), np.int32)
        ids = [0] + tok_ids + [0]
        tokens[0, : len(ids)] = ids
        style_sd = jnp.asarray(pack[len(tok_ids) - 1][:, TINY.style_dim:])
        style_dec = jnp.asarray(pack[len(tok_ids) - 1][:, : TINY.style_dim])
        d, durations, t_en = s._stage1(params, jnp.asarray(tokens),
                                       jnp.int32(len(ids)), style_sd,
                                       jnp.float32(1.0))
        total = int(np.asarray(durations).sum())
        key = jax.random.PRNGKey(0)
        a1 = s._stage2(total + 5)(params, d, t_en, durations, style_sd,
                                  style_dec, jnp.int32(total), key)
        a2 = s._stage2(total + 33)(params, d, t_en, durations, style_sd,
                                   style_dec, jnp.int32(total), key)
        n = total * TINY.samples_per_frame
        np.testing.assert_allclose(np.asarray(a1[:n]), np.asarray(a2[:n]),
                                   atol=2e-4)

    def test_synthesize_end_to_end(self, params):
        s = synth.KokoroSynthesizer(params, TINY)
        pack = voices.random_voice(1)[:, :, : 2 * TINY.style_dim]
        audio = s.synthesize([43, 44, 45, 46, 47], pack)
        assert audio.ndim == 1
        assert len(audio) % TINY.samples_per_frame == 0
        assert np.isfinite(audio).all()

    def test_speed_changes_length(self, params):
        s = synth.KokoroSynthesizer(params, TINY)
        pack = voices.random_voice(2)[:, :, : 2 * TINY.style_dim]
        ids = [43, 51, 57, 63, 58, 61, 54] * 4
        slow = s.synthesize(ids, pack, speed=0.5)
        fast = s.synthesize(ids, pack, speed=2.0)
        assert len(slow) > len(fast)


class TestPhonemizer:
    def test_tokenize_known_symbols(self):
        ids = phonemize.tokenize("ˈhəloʊ")
        assert ids == [156, 50, 83, 54, 57, 135]

    def test_unknown_symbols_dropped(self):
        assert phonemize.tokenize("h€lo") == [50, 54, 57]

    def test_rule_backend_produces_ids(self):
        p = phonemize.Phonemizer("en-us", None)
        ids = p.to_ids("hello world")
        assert len(ids) > 5
        assert all(0 < i < 178 for i in ids)

    def test_voice_registry(self):
        assert len(voices.VOICES) == 52
        assert voices.voice_language("af_heart") == "en-us"
        assert voices.voice_language("jf_alpha") == "ja"


class TestEngine:
    def test_generate(self, params):
        eng = KokoroEngine.from_params(
            params, TINY,
            voices.random_voice(3)[:, :, : 2 * TINY.style_dim])
        result = eng.generate("Hi there. This is a test.")
        assert result.sample_rate == 24000
        assert result.duration > 0
        assert np.isfinite(result.samples).all()

    def test_streaming_chunks(self, params):
        eng = KokoroEngine.from_params(
            params, TINY,
            voices.random_voice(4)[:, :, : 2 * TINY.style_dim])
        text = ("This is the first reasonably long sentence that stands "
                "alone nicely here. And here is the second one, also long "
                "enough to stay separate from it.")
        chunks = list(eng.generate_streaming(text))
        assert len(chunks) == 2
        assert chunks[-1].is_final
