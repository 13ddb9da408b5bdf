"""SNAC codec + Orpheus generation tests on tiny random models."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_audio.api.tts import StreamingGranularity
from tpu_audio.codecs import snac
from tpu_audio.models.orpheus import model as omodel
from tpu_audio.models.orpheus.engine import OrpheusEngine
from tpu_audio.nn import transformer
from tpu_audio.ops.sampling import SamplerConfig

pytestmark = pytest.mark.slow  # engine e2e / parity / mesh

TINY_SNAC = snac.SNACConfig(decoder_dim=64, decoder_rates=(4, 4, 2, 2),
                            latent_dim=32, codebook_size=64, codebook_dim=4,
                            vq_strides=(4, 2, 1))

TINY_LM = transformer.TransformerConfig(
    dim=64, n_layers=2, n_heads=4, n_kv_heads=2, hidden_dim=128,
    vocab_size=omodel.CODE_OFFSET + 7 * omodel.CODEBOOK_SIZE,
    tie_word_embeddings=True)


@pytest.fixture(scope="module")
def snac_params():
    return snac.init_params(jax.random.PRNGKey(0), TINY_SNAC)


class TestSNAC:
    def test_decode_shape(self, snac_params, rng):
        frames = 6  # stride-1 frames
        codes = [
            jnp.asarray(rng.integers(0, 64, (1, frames // 4 * 1 + 1))[..., : frames // 4 + (frames % 4 > 0)], jnp.int32),
            jnp.asarray(rng.integers(0, 64, (1, frames // 2)), jnp.int32),
            jnp.asarray(rng.integers(0, 64, (1, frames)), jnp.int32),
        ]
        # use consistent frame counts: 8 stride-1 frames → 2/4/8
        codes = [jnp.asarray(rng.integers(0, 64, (1, 2)), jnp.int32),
                 jnp.asarray(rng.integers(0, 64, (1, 4)), jnp.int32),
                 jnp.asarray(rng.integers(0, 64, (1, 8)), jnp.int32)]
        audio = snac.decode_codes(snac_params, TINY_SNAC, codes)
        assert audio.shape == (1, 8 * TINY_SNAC.hop)
        assert np.isfinite(np.asarray(audio)).all()
        assert np.abs(np.asarray(audio)).max() <= 1.0  # tanh output

    def test_embed_codes_strides(self, snac_params):
        codes = [jnp.zeros((1, 2), jnp.int32), jnp.zeros((1, 4), jnp.int32),
                 jnp.zeros((1, 8), jnp.int32)]
        z = snac.model.embed_codes(snac_params, TINY_SNAC, codes)
        assert z.shape == (1, 8, TINY_SNAC.latent_dim)


class TestParseFrames:
    def test_layer_assignment(self):
        base = omodel.CODE_OFFSET
        cb = omodel.CODEBOOK_SIZE
        frame = [base + 1, base + cb + 2, base + 2 * cb + 3, base + 3 * cb + 4,
                 base + 4 * cb + 5, base + 5 * cb + 6, base + 6 * cb + 7]
        tokens = [omodel.AUDIO_MARKER] + frame + [omodel.END_TOKEN]
        l1, l2, l3 = omodel.parse_frames(tokens)
        assert list(l1) == [1]
        assert list(l2) == [2, 5]
        assert list(l3) == [3, 4, 6, 7]

    def test_partial_frame_trimmed(self):
        base = omodel.CODE_OFFSET
        tokens = [base + i for i in range(10)]  # 10 tokens → 1 frame of 7
        l1, l2, l3 = omodel.parse_frames(tokens)
        assert len(l1) == 1 and len(l2) == 2 and len(l3) == 4

    def test_respects_last_marker(self):
        base = omodel.CODE_OFFSET
        tokens = ([base + 1] * 7 + [omodel.AUDIO_MARKER] + [base] * 7)
        l1, _, _ = omodel.parse_frames(tokens)
        assert list(l1) == [0]


class TestCausalLMGenerator:
    def test_left_pad_bucketing_is_exact(self):
        """Same prompt through two bucket sizes → same greedy tokens."""
        params = transformer.init_params(jax.random.PRNGKey(0), TINY_LM)
        prompt = list(range(10, 30))
        g1 = omodel.CausalLMGenerator(params, TINY_LM, max_cache=128)
        out1 = g1.generate(prompt, sampler=SamplerConfig(temperature=0.0),
                           eos_ids=(1,), max_new=12, bucket=32)
        out2 = g1.generate(prompt, sampler=SamplerConfig(temperature=0.0),
                           eos_ids=(1,), max_new=12, bucket=64)
        assert out1 == out2

    def test_generation_stops_on_eos(self):
        params = transformer.init_params(jax.random.PRNGKey(1), TINY_LM)
        g = omodel.CausalLMGenerator(params, TINY_LM, max_cache=128)
        out = g.generate([5, 6, 7], sampler=SamplerConfig(temperature=0.0),
                         eos_ids=(1,), max_new=16)
        assert len(out) <= 16

    def test_spanned_greedy_matches_single_loop(self):
        """should_stop (in-loop cancellation) path: greedy tokens identical
        to the single compiled loop, across span boundaries."""
        params = transformer.init_params(jax.random.PRNGKey(0), TINY_LM)
        g = omodel.CausalLMGenerator(params, TINY_LM, max_cache=128)
        kw = dict(sampler=SamplerConfig(temperature=0.0), eos_ids=(1,),
                  max_new=13)
        ref = g.generate([5, 6, 7], **kw)
        for span in (4, 5, 32):
            got = g.generate([5, 6, 7], should_stop=lambda: False,
                             span=span, **kw)
            assert got == ref, (span, got, ref)

    def test_spanned_stop_midway(self):
        """stop() between spans returns the partial output after at most
        one span of extra tokens."""
        params = transformer.init_params(jax.random.PRNGKey(0), TINY_LM)
        g = omodel.CausalLMGenerator(params, TINY_LM, max_cache=128)
        calls = []

        def stop_after_two():
            calls.append(1)
            return len(calls) > 2

        out = g.generate([5, 6, 7],
                         sampler=SamplerConfig(temperature=0.0),
                         eos_ids=(1,), max_new=64,
                         should_stop=stop_after_two, span=4)
        # 1 (prefill token) + 2 spans x 4 tokens max
        assert 1 <= len(out) <= 9



class TestOrpheusEngine:
    def test_end_to_end_random_weights(self):
        lm_params = transformer.init_params(jax.random.PRNGKey(2), TINY_LM)
        snac_params = snac.init_params(jax.random.PRNGKey(3), TINY_SNAC)
        eng = OrpheusEngine.from_params(lm_params, TINY_LM, snac_params,
                                        TINY_SNAC, max_cache=256)
        result = eng.generate("Hello there.", max_new_tokens=64)
        # random weights rarely emit valid code tokens; just require the
        # pipeline to complete with finite audio (possibly empty)
        assert result.sample_rate == 24000
        assert np.isfinite(result.samples).all()

    def test_voices_and_tags(self):
        assert "tara" in OrpheusEngine.voices
        assert "<laugh>" in OrpheusEngine.expression_tags

    def test_speculative_ngram_engine_matches_plain(self):
        """speculative="ngram" at temperature 0 produces byte-identical
        audio to the plain engine (greedy speculative is exact)."""
        lm_params = transformer.init_params(jax.random.PRNGKey(2), TINY_LM)
        snac_params = snac.init_params(jax.random.PRNGKey(3), TINY_SNAC)
        ref = OrpheusEngine.from_params(lm_params, TINY_LM, snac_params,
                                        TINY_SNAC, max_cache=256)
        ref.temperature = 0.0
        r0 = ref.generate("Hello there.", max_new_tokens=48)

        spec = OrpheusEngine.from_params(lm_params, TINY_LM, snac_params,
                                         TINY_SNAC, max_cache=256)
        spec.temperature = 0.0
        spec.speculative = "ngram"
        spec.gamma = 4
        r1 = spec.generate("Hello there.", max_new_tokens=48)
        assert r0.samples.shape == r1.samples.shape
        assert np.allclose(r0.samples, r1.samples, atol=1e-6)
        assert spec.lm.last_spec_stats["iterations"] >= 1

    def test_warmup_compiles_and_times(self):
        lm_params = transformer.init_params(jax.random.PRNGKey(2), TINY_LM)
        snac_params = snac.init_params(jax.random.PRNGKey(3), TINY_SNAC)
        eng = OrpheusEngine.from_params(lm_params, TINY_LM, snac_params,
                                        TINY_SNAC, max_cache=256)
        t = eng.warmup()
        assert set(t) == {"short"} and t["short"] > 0
        t2 = eng.warmup(full=True)
        assert {"short", "medium", "long"} <= set(t2)


def _frame_tokens(rng, frames: int) -> list[int]:
    """Valid 7-token SNAC frames (each slot in its own codebook page)."""
    base, cb = omodel.CODE_OFFSET, omodel.CODEBOOK_SIZE
    toks = []
    for _ in range(frames):
        vals = rng.integers(0, 64, 7)  # tiny codebook size 64
        toks.extend(base + page * cb + int(v)
                    for page, v in enumerate(vals))
    return toks


class TestTokenStreaming:
    def test_stream_spans_concat_matches_generate(self):
        """stream_spans is the spanned decode seen incrementally — the
        concatenated token stream equals generate() (greedy)."""
        params = transformer.init_params(jax.random.PRNGKey(0), TINY_LM)
        g = omodel.CausalLMGenerator(params, TINY_LM, max_cache=128)
        kw = dict(sampler=SamplerConfig(temperature=0.0), eos_ids=(1,),
                  max_new=13)
        ref = g.generate([5, 6, 7], **kw)
        got = []
        for span_toks in g.stream_spans([5, 6, 7], span=4, **kw):
            got.extend(span_toks)
        assert got == ref

    def test_pos_noise_is_window_invariant(self, snac_params, rng):
        """decode with noise_pos: a window of the stream produces the same
        samples as the same region of the full decode."""
        frames = 16  # stride-1 latents
        codes = [jnp.asarray(rng.integers(0, 64, (1, frames // s)),
                             jnp.int32) for s in (4, 2, 1)]
        key = jax.random.PRNGKey(7)
        full = np.asarray(snac.decode_codes(
            snac_params, TINY_SNAC, codes, key,
            noise_pos=jnp.int32(0))[0])
        off = 8
        sub = [c[:, off // s:] for c, s in zip(codes, (4, 2, 1))]
        win = np.asarray(snac.decode_codes(
            snac_params, TINY_SNAC, sub, key,
            noise_pos=jnp.int32(off))[0])
        # interior of the window (past the receptive field) must match
        hop = TINY_SNAC.hop
        rf = 12 * hop  # generous: RF is ~11 latents for the full config
        np.testing.assert_allclose(win[rf:], full[off * hop + rf:],
                                   atol=1e-5)

    def test_token_streaming_matches_one_shot(self):
        """Engine token-granularity streaming: concatenated chunks equal
        the one-shot decode of the full token sequence (position-stable
        noise + window context beyond the receptive field)."""
        rng = np.random.default_rng(11)
        lm_params = transformer.init_params(jax.random.PRNGKey(2), TINY_LM)
        snac_params = snac.init_params(jax.random.PRNGKey(3), TINY_SNAC)
        eng = OrpheusEngine.from_params(lm_params, TINY_LM, snac_params,
                                        TINY_SNAC, max_cache=256)
        toks = _frame_tokens(rng, 23)  # odd count: exercises the finalize

        def fake_spans(*a, **k):
            span = k.get("span", 28)
            for i in range(0, len(toks), span):
                yield toks[i: i + span]

        eng.lm.stream_spans = fake_spans
        chunks = list(eng.generate_streaming(
            "Hello there.", granularity=StreamingGranularity.TOKEN))
        assert chunks[-1].is_final
        assert sum(c.is_final for c in chunks) == 1
        got = np.concatenate([c.samples for c in chunks])
        ref = eng._decode_snac(omodel.parse_frames(toks), seed=0)
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, atol=1e-5)

    def test_token_streaming_multiple_emissions(self):
        """The stream yields audio before the LM finishes: more than one
        chunk for a long enough token stream."""
        rng = np.random.default_rng(5)
        lm_params = transformer.init_params(jax.random.PRNGKey(2), TINY_LM)
        snac_params = snac.init_params(jax.random.PRNGKey(3), TINY_SNAC)
        eng = OrpheusEngine.from_params(lm_params, TINY_LM, snac_params,
                                        TINY_SNAC, max_cache=256)
        toks = _frame_tokens(rng, 40)

        def fake_spans(*a, **k):
            for i in range(0, len(toks), 28):
                yield toks[i: i + 28]

        eng.lm.stream_spans = fake_spans
        chunks = list(eng.generate_streaming(
            "Hello.", granularity=StreamingGranularity.TOKEN))
        assert len(chunks) >= 3


class TestBatchGeneration:
    """Multi-stream serving: generate_batch decodes B prompts in one
    compiled loop; rows must match the same prompts decoded... with shared
    batch PRNG the bit-stream differs, so equivalence is checked at
    temperature 0 (greedy: batch rows == single-stream decode)."""

    def _engine(self):
        from tpu_audio.codecs import snac
        from tpu_audio.models.orpheus import model as omodel
        from tpu_audio.models.orpheus.engine import OrpheusEngine
        from tpu_audio.nn import transformer

        cfg = transformer.TransformerConfig(
            dim=64, n_layers=2, n_heads=8, n_kv_heads=8, hidden_dim=128,
            vocab_size=omodel.CODE_OFFSET + 7 * omodel.CODEBOOK_SIZE,
            tie_word_embeddings=True)
        snac_cfg = snac.SNACConfig(decoder_dim=64, decoder_rates=(4, 4, 2, 2),
                                   latent_dim=32, codebook_size=64,
                                   codebook_dim=4, vq_strides=(4, 2, 1))
        lm_params = transformer.init_params(jax.random.PRNGKey(2), cfg)
        snac_params = snac.init_params(jax.random.PRNGKey(3), snac_cfg)
        eng = OrpheusEngine.from_params(lm_params, cfg, snac_params,
                                        snac_cfg, max_cache=128)
        eng.temperature = 0.0
        return eng

    def test_batch_rows_match_greedy_single(self):
        from tpu_audio.models.orpheus import model as omodel
        from tpu_audio.models.orpheus.model import build_prompt_ids
        from tpu_audio.ops.sampling import SamplerConfig

        eng = self._engine()
        sampler = SamplerConfig(temperature=0.0, repetition_penalty=1.3,
                                repetition_window=omodel.REPETITION_WINDOW)
        texts = ["Hello there.", "A different longer sentence to pad."]
        prompts = [build_prompt_ids(eng.tokenizer.encode(f"tara: {t}"))
                   for t in texts]
        batch = eng.lm.generate_batch(prompts, sampler=sampler,
                                      eos_ids=(omodel.END_TOKEN,),
                                      max_new=24, seed=7)
        assert len(batch) == 2
        # bitwise batch==single can differ late in the stream (batch-size-
        # dependent float rounding flips argmax ties on random weights);
        # the prompt/mask plumbing must still agree over a prefix
        for ids, prompt in zip(batch, prompts):
            single = eng.lm.generate(prompt, sampler=sampler,
                                     eos_ids=(omodel.END_TOKEN,),
                                     max_new=24, seed=7)
            n = min(8, len(ids), len(single))
            assert ids[:n] == single[:n]

    def test_rows_independent_of_batch_partner(self):
        """Left-pad masking isolation: a row's output must not depend on
        which prompts share its batch (deterministic at temperature 0)."""
        from tpu_audio.models.orpheus import model as omodel
        from tpu_audio.models.orpheus.model import build_prompt_ids
        from tpu_audio.ops.sampling import SamplerConfig

        eng = self._engine()
        sampler = SamplerConfig(temperature=0.0, repetition_penalty=1.3,
                                repetition_window=omodel.REPETITION_WINDOW)
        mk = lambda t: build_prompt_ids(eng.tokenizer.encode(f"tara: {t}"))
        a, b, c = mk("Alpha."), mk("Beta beta beta."), mk("Gamma?")
        r1 = eng.lm.generate_batch([a, b], sampler=sampler,
                                   eos_ids=(omodel.END_TOKEN,),
                                   max_new=16, seed=3)
        r2 = eng.lm.generate_batch([a, c], sampler=sampler,
                                   eos_ids=(omodel.END_TOKEN,),
                                   max_new=16, seed=3)
        assert r1[0] == r2[0]

    def test_engine_generate_batch_audio(self):
        eng = self._engine()
        results = eng.generate_batch(["One.", "Two two."],
                                     max_new_tokens=28, seed=1)
        assert len(results) == 2
        for r in results:
            assert r.sample_rate == eng.sample_rate
            assert np.isfinite(r.samples).all()
        assert not eng.is_generating
        assert eng.generation_time > 0


class TestFusedGenerate:
    """CausalLMGenerator over the fused whole-stack kernel (FusedKVCache in
    _fn): greedy tokens must match the plain cache, in both kernel
    layouts (plain / grouped)."""

    CFG128 = transformer.TransformerConfig(
        dim=128, n_layers=2, n_heads=2, n_kv_heads=1, hidden_dim=512,
        vocab_size=300, tie_word_embeddings=True)

    def _check(self, monkeypatch, mode):
        import functools

        from tpu_audio.ops.pallas import fused_step

        params = transformer.fuse_fp_tree(
            transformer.init_params(jax.random.PRNGKey(0), self.CFG128))
        from tpu_audio.ops.sampling import SamplerConfig

        kw = dict(sampler=SamplerConfig(temperature=0.0), eos_ids=(299,),
                  max_new=10, seed=0)
        ref = omodel.CausalLMGenerator(params, self.CFG128,
                                       max_cache=128).generate([3, 5], **kw)

        monkeypatch.setattr(
            fused_step, "fused_decode_step",
            functools.partial(fused_step.fused_decode_step, interpret=True))
        monkeypatch.setattr(fused_step, "choose_mode",
                            lambda c, p, *a, **k: mode)
        got = omodel.CausalLMGenerator(params, self.CFG128,
                                       max_cache=128).generate([3, 5], **kw)
        assert got == ref, (mode, got, ref)

    def test_plain_layout(self, monkeypatch):
        self._check(monkeypatch, "plain")

    def test_grouped_layout(self, monkeypatch):
        self._check(monkeypatch, "grouped")

    def test_spanned_generate_fused(self, monkeypatch):
        """The spanned path (cancellation spans crossing the host between
        dispatches) must carry the FusedKVCache across spans and match the
        plain spanned output."""
        import functools

        from tpu_audio.ops.pallas import fused_step
        from tpu_audio.ops.sampling import SamplerConfig

        params = transformer.fuse_fp_tree(
            transformer.init_params(jax.random.PRNGKey(0), self.CFG128))
        kw = dict(sampler=SamplerConfig(temperature=0.0), eos_ids=(299,),
                  max_new=14, seed=0, span=5, should_stop=lambda: False)
        ref = omodel.CausalLMGenerator(params, self.CFG128,
                                       max_cache=128).generate([3, 5], **kw)

        monkeypatch.setattr(
            fused_step, "fused_decode_step",
            functools.partial(fused_step.fused_decode_step, interpret=True))
        monkeypatch.setattr(fused_step, "choose_mode",
                            lambda c, p, *a, **k: "plain")
        got = omodel.CausalLMGenerator(params, self.CFG128,
                                       max_cache=128).generate([3, 5], **kw)
        assert got == ref, (got, ref)
