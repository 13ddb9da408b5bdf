"""CosyVoice2 tests: LM generation, modes, voice conversion, engine e2e."""

import jax
import numpy as np
import pytest

from tpu_audio.codecs import s3tokenizer
from tpu_audio.codecs.s3gen import campplus, conformer, flow, hift
from tpu_audio.codecs.s3gen import model as s3gen
from tpu_audio.models.cosyvoice2 import lm as lm_mod
from tpu_audio.models.cosyvoice2.engine import CosyVoice2Engine
from tpu_audio.nn import transformer

pytestmark = pytest.mark.slow  # engine e2e / parity / mesh

TINY_QWEN = transformer.TransformerConfig(
    dim=48, n_layers=2, n_heads=4, n_kv_heads=2, hidden_dim=96,
    vocab_size=400, attn_qkv_bias=True, tie_word_embeddings=True)

TINY_LM = lm_mod.CosyLMConfig(qwen=TINY_QWEN, llm_input_size=48,
                              speech_token_size=60)


@pytest.fixture(scope="module")
def lm_params():
    return lm_mod.init_params(jax.random.PRNGKey(0), TINY_LM)


def tiny_s3():
    cfg = s3gen.S3GenConfig(
        vocab_size=64, input_dim=32, spk_dim=24, mel_dim=16,
        conformer=conformer.ConformerConfig(input_size=32, output_size=32,
                                            heads=4, linear_units=64,
                                            num_blocks=1, num_up_blocks=1),
        estimator=flow.EstimatorConfig(in_channels=64, out_channels=16,
                                       channels=32, n_blocks=1,
                                       num_mid_blocks=1, num_heads=4),
        cfm=flow.CFMConfig(n_timesteps=2),
        hift=hift.HiFTConfig(in_channels=16, base_channels=32,
                             upsample_rates=(4, 3), upsample_kernels=(8, 7),
                             source_resblock_kernels=(7, 11),
                             source_resblock_dilations=((1, 3, 5), (1, 3, 5)),
                             resblock_kernels=(3,),
                             resblock_dilations=((1, 3, 5),)),
        campplus=campplus.CAMPPlusConfig(feat_dim=80, embedding_size=24,
                                         growth_rate=8, bn_size=2,
                                         init_channels=16, blocks=(2,),
                                         kernels=(3,), dilations=(1,)))
    return cfg, s3gen.init_params(jax.random.PRNGKey(1), cfg)


class TestCosyLM:
    def test_generate_basic(self, lm_params):
        gen = lm_mod.CosyLMGenerator(lm_params, TINY_LM, max_cache=256)
        out = gen.generate([5, 6, 7, 8], [], [1, 2, 3], seed=0, max_new=16)
        assert all(0 <= t < TINY_LM.speech_token_size for t in out)

    def test_min_len_enforced(self, lm_params):
        gen = lm_mod.CosyLMGenerator(lm_params, TINY_LM, max_cache=256)
        text = list(range(10, 16))  # 6 tokens → min_len 12
        out = gen.generate(text, [], [], seed=3, max_new=64)
        assert len(out) >= int(len(text) * TINY_LM.min_token_text_ratio) - 1

    def test_prompt_conditioning_changes_output(self, lm_params):
        gen = lm_mod.CosyLMGenerator(lm_params, TINY_LM, max_cache=256)
        o1 = gen.generate([5, 6, 7], [], [1, 2, 3], seed=0, max_new=16)
        o2 = gen.generate([5, 6, 7], [], [40, 41, 42], seed=0, max_new=16)
        assert o1 != o2  # random weights: different prompts → different paths


class TestCosyLMFusedDecode:
    """The T=1 decode steps through the whole-stack fused kernel
    (FusedKVCache path) must reproduce the plain-cache greedy tokens.
    Kernel-eligible dims (dim 128, hd 64, hidden 512, Qwen2 qkv bias);
    the TPU gate is forced on and the kernel runs in interpret mode."""

    def test_greedy_generate_matches_plain(self, monkeypatch):
        import functools

        from tpu_audio.ops import sampling
        from tpu_audio.ops.pallas import fused_step

        qwen = transformer.TransformerConfig(
            dim=128, n_layers=2, n_heads=2, n_kv_heads=1, hidden_dim=512,
            vocab_size=400, attn_qkv_bias=True, tie_word_embeddings=True)
        cfg = lm_mod.CosyLMConfig(qwen=qwen, llm_input_size=128,
                                  speech_token_size=60)
        params = lm_mod.init_params(jax.random.PRNGKey(2), cfg)
        greedy = sampling.SamplerConfig(temperature=0.0)
        kw = dict(sampler=greedy, max_new=12, seed=0)

        plain = lm_mod.CosyLMGenerator(params, cfg, max_cache=128)
        ref = plain.generate([5, 6, 7], [1, 2], [3, 4], **kw)

        monkeypatch.setattr(
            fused_step, "fused_decode_step",
            functools.partial(fused_step.fused_decode_step, interpret=True))
        monkeypatch.setattr(
            fused_step, "supported",
            lambda c, p, b, *a, **k: b == 1 and "qkv" in p["layers"]["attn"])
        fused = lm_mod.CosyLMGenerator(params, cfg, max_cache=128)
        got = fused.generate([5, 6, 7], [1, 2], [3, 4], **kw)
        assert got == ref, (got, ref)

    def test_streamer_fused_matches_plain(self, monkeypatch):
        import functools

        from tpu_audio.ops import sampling
        from tpu_audio.ops.pallas import fused_step

        qwen = transformer.TransformerConfig(
            dim=128, n_layers=1, n_heads=2, n_kv_heads=1, hidden_dim=512,
            vocab_size=400, attn_qkv_bias=True, tie_word_embeddings=True)
        cfg = lm_mod.CosyLMConfig(qwen=qwen, llm_input_size=128,
                                  speech_token_size=60)
        params = lm_mod.init_params(jax.random.PRNGKey(3), cfg)
        greedy = sampling.SamplerConfig(temperature=0.0)

        def collect():
            gen = lm_mod.CosyLMGenerator(params, cfg, max_cache=128)
            streamer = lm_mod.CosyLMStreamer(gen, chunk=5)
            out = []
            for toks in streamer.stream([5, 6, 7], [1, 2], [3, 4],
                                        sampler=greedy, seed=0, max_new=12):
                out.extend(toks)
            return out

        ref = collect()
        monkeypatch.setattr(
            fused_step, "fused_decode_step",
            functools.partial(fused_step.fused_decode_step, interpret=True))
        monkeypatch.setattr(
            fused_step, "supported",
            lambda c, p, b, *a, **k: b == 1 and "qkv" in p["layers"]["attn"])
        got = collect()
        assert got == ref, (got, ref)


class TestEngine:
    def test_zero_shot_e2e(self, lm_params):
        s3_cfg, s3_params = tiny_s3()
        tok_cfg = s3tokenizer.S3TokenizerConfig(
            n_mels=128, n_audio_state=64, n_audio_head=4, n_audio_layer=1)
        tok_params = s3tokenizer.init_params(jax.random.PRNGKey(2), tok_cfg)
        eng = CosyVoice2Engine.from_params(
            lm_params, TINY_LM, s3_params, s3_cfg, tok_params, tok_cfg,
            max_cache=256)
        res = eng.generate("Hello.")
        assert res.sample_rate == 24000
        assert np.isfinite(res.samples).all()

    def test_prepare_conditionals_and_vc(self, lm_params, rng):
        s3_cfg, s3_params = tiny_s3()
        tok_cfg = s3tokenizer.S3TokenizerConfig(
            n_mels=128, n_audio_state=64, n_audio_head=4, n_audio_layer=1)
        tok_params = s3tokenizer.init_params(jax.random.PRNGKey(2), tok_cfg)
        eng = CosyVoice2Engine.from_params(
            lm_params, TINY_LM, s3_params, s3_cfg, tok_params, tok_cfg,
            max_cache=256)
        audio = (0.1 * np.sin(np.linspace(0, 400 * np.pi, 16000))).astype(np.float32)
        spk = eng.prepare_conditionals(audio, 16000, ref_text="reference")
        assert spk.embedding.shape == (1, 24)
        assert len(spk.speech_tokens) > 0
        # voice conversion path
        out = eng.voice_conversion(audio, 16000)
        assert np.isfinite(out).all() and len(out) > 0

    def test_instruct_mode(self, lm_params):
        s3_cfg, s3_params = tiny_s3()
        tok_cfg = s3tokenizer.S3TokenizerConfig(
            n_mels=128, n_audio_state=64, n_audio_head=4, n_audio_layer=1)
        tok_params = s3tokenizer.init_params(jax.random.PRNGKey(2), tok_cfg)
        eng = CosyVoice2Engine.from_params(
            lm_params, TINY_LM, s3_params, s3_cfg, tok_params, tok_cfg,
            max_cache=256)
        res = eng.generate("Hi.", mode="instruct", instruct_text="speak slowly")
        assert np.isfinite(res.samples).all()


class TestTokenStreaming:
    """CV2Synthesizer (models/cosyvoice2/streaming.py): the token-chunk
    streaming path added after round-3 TTFA measurement (sentence path
    p50 4.77 s vs <300 ms target)."""

    def test_synth_stream_yields_all_audio(self, rng):
        from tpu_audio.models.cosyvoice2.streaming import CV2Synthesizer

        s3_cfg, s3_params = tiny_s3()
        synth = CV2Synthesizer(s3_params, s3_cfg)
        token_chunks = [list(rng.integers(0, 60, 6)) for _ in range(3)]
        prompt_mel = rng.standard_normal((4, s3_cfg.mel_dim)).astype(
            np.float32)
        out = list(synth.stream(iter(token_chunks), [0, 1], prompt_mel,
                                np.zeros((1, s3_cfg.spk_dim), np.float32),
                                seed=0, chunk_size=6))
        assert len(out) == 3
        ups = s3_cfg.hift.upsample_scale
        assert sum(len(a) for a in out) == 18 * 2 * ups
        for a in out:
            assert np.isfinite(a).all()

    def test_bounded_window_rebase_matches_until_first_rebase(self, rng):
        """max_window_tokens: the sliding-window/mel-reprompt path must be
        byte-identical to the unbounded (reference-scheme) path for every
        chunk emitted BEFORE the first rebase, keep the sample-count
        invariant afterwards, and stay finite."""
        from tpu_audio.models.cosyvoice2.streaming import CV2Synthesizer

        s3_cfg, s3_params = tiny_s3()
        token_chunks = [list(rng.integers(0, 60, 6)) for _ in range(5)]
        prompt_mel = rng.standard_normal((4, s3_cfg.mel_dim)).astype(
            np.float32)
        spk = np.zeros((1, s3_cfg.spk_dim), np.float32)

        ref_synth = CV2Synthesizer(s3_params, s3_cfg,
                                   max_window_tokens=None)
        ref = list(ref_synth.stream(iter(token_chunks), [0, 1], prompt_mel,
                                    spk, seed=0, chunk_size=6))
        syn = CV2Synthesizer(s3_params, s3_cfg, max_window_tokens=16,
                             rebase_prompt_tokens=4)
        got = list(syn.stream(iter(token_chunks), [0, 1], prompt_mel,
                              spk, seed=0, chunk_size=6))
        assert len(got) == len(ref)
        assert all(len(g) == len(r) for g, r in zip(got, ref))
        # windows are 9 then 15 tokens → chunk 2 (21) is the first past
        # the 16 cap; chunks 0-1 precede any rebase and must be identical
        np.testing.assert_array_equal(got[0], ref[0])
        np.testing.assert_array_equal(got[1], ref[1])
        for g in got:
            assert np.isfinite(g).all()

    def test_bounded_window_flow_calls_stay_bounded(self, rng):
        """Flow windows never exceed max_window_tokens after warm-up (the
        O(max_window) per-chunk property for unbounded streams)."""
        from tpu_audio.models.cosyvoice2.streaming import CV2Synthesizer

        s3_cfg, s3_params = tiny_s3()
        token_chunks = [list(rng.integers(0, 60, 6)) for _ in range(8)]
        prompt_mel = rng.standard_normal((4, s3_cfg.mel_dim)).astype(
            np.float32)
        syn = CV2Synthesizer(s3_params, s3_cfg, max_window_tokens=12,
                             rebase_prompt_tokens=4)
        seen = []
        orig = syn._flow_fn

        def spy(t_pad, p_len, streaming):
            fn = orig(t_pad, p_len, streaming)

            def wrapped(params, tokens, tl, *a):
                seen.append(int(tl[0]))
                return fn(params, tokens, tl, *a)

            return wrapped

        syn._flow_fn = spy
        out = list(syn.stream(iter(token_chunks), [0, 1], prompt_mel,
                              np.zeros((1, s3_cfg.spk_dim), np.float32),
                              seed=0, chunk_size=6))
        assert sum(len(a) for a in out) == 48 * 2 * s3_cfg.hift.upsample_scale
        assert max(seen) <= 12 + 6  # one chunk of slack before a rebase fires
        assert any(s <= 12 for s in seen[2:])

    def test_engine_token_streaming_e2e(self, lm_params):
        s3_cfg, s3_params = tiny_s3()
        tok_cfg = s3tokenizer.S3TokenizerConfig(
            n_mels=128, n_audio_state=64, n_audio_head=4, n_audio_layer=1)
        tok_params = s3tokenizer.init_params(jax.random.PRNGKey(2), tok_cfg)
        eng = CosyVoice2Engine.from_params(
            lm_params, TINY_LM, s3_params, s3_cfg, tok_params, tok_cfg,
            max_cache=256)
        chunks = list(eng.generate_streaming("Hello there."))  # TOKEN default
        assert chunks[-1].is_final
        assert sum(c.is_final for c in chunks) == 1
        assert all(np.isfinite(c.samples).all() for c in chunks)
        assert sum(len(c.samples) for c in chunks) > 0

    def test_one_shot_uses_sentence_path(self, lm_params):
        """generate() must keep the single finalize-style flow pass (and
        the speculative LM option must thread through it)."""
        s3_cfg, s3_params = tiny_s3()
        tok_cfg = s3tokenizer.S3TokenizerConfig(
            n_mels=128, n_audio_state=64, n_audio_head=4, n_audio_layer=1)
        tok_params = s3tokenizer.init_params(jax.random.PRNGKey(2), tok_cfg)
        eng = CosyVoice2Engine.from_params(
            lm_params, TINY_LM, s3_params, s3_cfg, tok_params, tok_cfg,
            max_cache=256)
        eng.speculative = "ngram"
        res = eng.generate("Hello.")
        assert np.isfinite(res.samples).all()
        assert eng.lm.last_spec_stats["drafted"] > 0
        assert eng._synth is None  # token synthesizer untouched


class TestCosyLMSpeculative:
    def test_ngram_spec_records_stats_and_valid_tokens(self, lm_params):
        gen = lm_mod.CosyLMGenerator(lm_params, TINY_LM, max_cache=256)
        out = gen.generate([5, 6, 7, 8], [], [1, 2, 3, 1, 2, 3], seed=0,
                           max_new=32, speculative="ngram")
        assert all(0 <= t < TINY_LM.speech_token_size for t in out)
        st = gen.last_spec_stats
        assert st["drafted"] > 0 and 0.0 <= st["accept_rate"] <= 1.0

    def test_engine_threads_speculative(self, lm_params):
        from tpu_audio.codecs import s3tokenizer
        s3_cfg, s3_params = tiny_s3()
        tok_cfg = s3tokenizer.S3TokenizerConfig(
            n_mels=128, n_audio_state=64, n_audio_head=4, n_audio_layer=1)
        tok_params = s3tokenizer.init_params(jax.random.PRNGKey(2), tok_cfg)
        eng = CosyVoice2Engine.from_params(
            lm_params, TINY_LM, s3_params, s3_cfg, tok_params, tok_cfg,
            max_cache=256)
        eng.speculative = "ngram"
        res = eng.generate("Hello.")
        assert np.isfinite(res.samples).all()
        assert eng.lm.last_spec_stats["drafted"] > 0

    def test_spec_stream_greedy_identical_to_plain_stream(self, lm_params):
        """Chunked-speculative == chunked-plain on the deterministic slice:
        under greedy sampling the rejection loop must reproduce the exact
        argmax sequence, so the token streams are identical (VERDICT r4 #3
        'chunked-spec==chunked-plain distribution test')."""
        from tpu_audio.ops import sampling

        greedy = sampling.SamplerConfig(temperature=0.0)
        gen = lm_mod.CosyLMGenerator(lm_params, TINY_LM, max_cache=256)

        def collect(spec):
            streamer = lm_mod.CosyLMStreamer(gen, chunk=6, first_extra=2)
            out = []
            for toks in streamer.stream([5, 6, 7, 8], [1, 2], [3, 4, 3, 4],
                                        sampler=greedy, seed=0, max_new=24,
                                        speculative=spec, gamma=3):
                out.extend(toks)
            return out

        plain = collect(None)
        spec = collect("ngram")
        assert spec == plain, (spec, plain)
        st = gen.last_spec_stats
        assert st["drafted"] > 0 and 0.0 <= st["accept_rate"] <= 1.0

    def test_spec_stream_ras_valid_and_min_len(self, lm_params):
        """RAS-sampled speculative streaming: tokens in range, min-length
        EOS mask respected across span boundaries, stats accumulated."""
        gen = lm_mod.CosyLMGenerator(lm_params, TINY_LM, max_cache=256)
        streamer = lm_mod.CosyLMStreamer(gen, chunk=5)
        text = [10, 11, 12, 13, 14, 15]  # min_len = 12
        out = []
        for toks in streamer.stream(text, [], [1, 2, 3], seed=7,
                                    max_new=64, speculative="ngram"):
            out.extend(toks)
        assert all(0 <= t < TINY_LM.speech_token_size for t in out)
        assert len(out) >= int(
            len(text) * TINY_LM.min_token_text_ratio) - 1
        assert gen.last_spec_stats["iterations"] >= 1

    def test_engine_token_streaming_with_speculative(self, lm_params):
        """The default serving path (token granularity) must thread the
        speculative option end-to-end (VERDICT r4 weak #3)."""
        s3_cfg, s3_params = tiny_s3()
        tok_cfg = s3tokenizer.S3TokenizerConfig(
            n_mels=128, n_audio_state=64, n_audio_head=4, n_audio_layer=1)
        tok_params = s3tokenizer.init_params(jax.random.PRNGKey(2), tok_cfg)
        eng = CosyVoice2Engine.from_params(
            lm_params, TINY_LM, s3_params, s3_cfg, tok_params, tok_cfg,
            max_cache=256)
        eng.speculative = "ngram"
        chunks = list(eng.generate_streaming("Hello there."))
        assert chunks[-1].is_final
        assert sum(len(c.samples) for c in chunks) > 0
        assert all(np.isfinite(c.samples).all() for c in chunks)
        assert eng.lm.last_spec_stats["drafted"] > 0
