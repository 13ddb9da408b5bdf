"""Whisper stack tests on a tiny random-weight model.

Real-checkpoint accuracy can't run in this zero-egress environment; these
tests pin down everything that doesn't need trained weights: model shapes,
KV-cache decode consistency, timestamp-rule enforcement, tokenizer special
ids, segment parsing, quantization round-trip, and the full pipeline loop.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_audio.models.whisper import model as wmodel
from tpu_audio.models.whisper.config import WhisperConfig
from tpu_audio.models.whisper.decoding import SegmentDecoder, compression_ratio
from tpu_audio.models.whisper.pipeline import MelExtractor, WhisperPipeline
from tpu_audio.models.whisper.tokenizer import BPE, WhisperTokenizer

TINY = WhisperConfig(n_mels=80, n_audio_ctx=1500, n_audio_state=64,
                     n_audio_head=4, n_audio_layer=2, n_vocab=51865,
                     n_text_ctx=48, n_text_state=64, n_text_head=4,
                     n_text_layer=2)


def make_bpe() -> BPE:
    """Byte-level-only BPE: every single byte is a token (enough to exercise
    encode/decode and suppression-mask construction)."""
    ranks = {bytes([i]): i for i in range(256)}
    # add a couple of merges so BPE merging code runs
    ranks[b" -"] = 256
    ranks[b" '"] = 257
    ranks[b"th"] = 258
    ranks[b"the"] = 259
    return BPE(ranks)


@pytest.fixture(scope="module")
def tok():
    return WhisperTokenizer(make_bpe(), multilingual=True, num_languages=99)


@pytest.fixture(scope="module")
def tiny_model():
    params = wmodel.init_params(jax.random.PRNGKey(0), TINY)
    return params


class TestTokenizer:
    def test_special_ids_multilingual_99(self, tok):
        # reference values: WhisperTokenizer.swift:48-50
        assert tok.eot == 50257
        assert tok.sot == 50258
        assert tok.transcribe == 50359
        assert tok.translate == 50358
        assert tok.timestamp_begin == 50364
        assert tok.language_tokens["en"] == 50259

    def test_special_ids_100_languages(self):
        t = WhisperTokenizer(make_bpe(), multilingual=True, num_languages=100)
        assert t.transcribe == 50360
        assert t.timestamp_begin == 50365

    def test_english_only(self):
        t = WhisperTokenizer(make_bpe(), multilingual=False, num_languages=99)
        assert t.eot == 50256
        assert t.sot == 50257

    def test_encode_decode_roundtrip(self, tok):
        ids = tok.encode("the cat")
        assert tok.decode(ids) == "the cat"
        assert ids[0] == 259  # "the" merged

    def test_sot_sequence(self, tok):
        assert tok.sot_sequence("en", "transcribe") == [50258, 50259, 50359]
        assert tok.sot_sequence("es", "translate") == [50258, 50262, 50358]

    def test_decode_with_timestamps(self, tok):
        s = tok.decode_with_timestamps([tok.timestamp_begin,
                                        tok.timestamp_begin + 50])
        assert s == "<|0.00|><|1.00|>"

    def test_compression_ratio(self):
        assert compression_ratio("a" * 100) > compression_ratio(
            "the quick brown fox jumps over the lazy dog")


class TestModel:
    def test_encode_shape(self, tiny_model):
        mel = jnp.zeros((1, 3000, 80))
        feats = wmodel.encode(tiny_model, TINY, mel)
        assert feats.shape == (1, 1500, 64)

    def test_decode_cache_consistency(self, tiny_model):
        feats = wmodel.encode(tiny_model, TINY,
                              jax.random.normal(jax.random.PRNGKey(1),
                                                (1, 3000, 80)) * 0.1)
        tokens = jnp.array([[50258, 50259, 50359, 100, 200]], dtype=jnp.int32)
        st = wmodel.init_state(tiny_model, TINY, feats)
        full, _ = wmodel.decode_step(tiny_model, TINY, tokens, st)

        st = wmodel.init_state(tiny_model, TINY, feats)
        steps = []
        for i in range(5):
            lg, st = wmodel.decode_step(tiny_model, TINY, tokens[:, i:i+1], st)
            steps.append(lg[:, 0])
        np.testing.assert_allclose(np.asarray(full),
                                   np.asarray(jnp.stack(steps, 1)), atol=2e-4)

    def test_cross_qk_shapes(self, tiny_model):
        feats = wmodel.encode(tiny_model, TINY, jnp.zeros((1, 3000, 80)))
        tokens = jnp.zeros((1, 7), jnp.int32)
        logits, qks = wmodel.forward_cross_qk(tiny_model, TINY, tokens, feats)
        assert logits.shape == (1, 7, 51865)
        assert qks.shape == (2, 1, 4, 7, 1500)


class TestSegmentDecoder:
    @pytest.fixture(scope="class")
    def decoder(self, tiny_model, tok):
        return SegmentDecoder(tiny_model, TINY, tok)

    def test_greedy_decode_runs(self, decoder, tok):
        mel = np.random.default_rng(0).standard_normal((3000, 80)).astype(np.float32) * 0.1
        res = decoder.decode(mel, language="en", temperature=0.0)
        assert isinstance(res.tokens, list)
        assert 0 <= res.no_speech_prob <= 1
        # timestamp rule: first generated token must be a timestamp within
        # the initial window
        if res.tokens:
            assert res.tokens[0] >= tok.timestamp_begin
            assert res.tokens[0] <= tok.timestamp_begin + 50

    def test_timestamps_monotonic(self, decoder, tok):
        mel = np.random.default_rng(1).standard_normal((3000, 80)).astype(np.float32) * 0.1
        res = decoder.decode(mel, language="en", temperature=0.8)
        ts = [t for t in res.tokens if t >= tok.timestamp_begin]
        assert ts == sorted(ts)

    def test_decode_deterministic_at_zero_temp(self, decoder):
        mel = np.random.default_rng(2).standard_normal((3000, 80)).astype(np.float32) * 0.1
        r1 = decoder.decode(mel, temperature=0.0)
        r2 = decoder.decode(mel, temperature=0.0)
        assert r1.tokens == r2.tokens

    def test_no_timestamps_mode(self, decoder, tok):
        mel = np.zeros((3000, 80), np.float32)
        res = decoder.decode(mel, temperature=0.0, timestamps=False)
        assert all(t < tok.timestamp_begin for t in res.tokens)

    def test_detect_language(self, decoder, tok):
        mel = np.zeros((3000, 80), np.float32)
        lang, probs = decoder.detect_language(mel)
        assert lang in probs
        assert abs(sum(probs.values()) - 1.0) < 1e-3


class TestMelExtractor:
    def test_matches_frontend(self, rng):
        from tpu_audio.ops import frontends

        audio = rng.standard_normal(16000 * 2).astype(np.float32) * 0.1
        ext = MelExtractor(80)
        got = ext(audio, padding=480000)
        ref = np.asarray(frontends.whisper_log_mel(
            jnp.asarray(audio), n_mels=80, padding=480000))
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, atol=2e-4)


class TestPipeline:
    def test_transcribe_runs_end_to_end(self, tiny_model, tok, rng):
        pipe = WhisperPipeline(tiny_model, TINY, tok)
        audio = (0.1 * np.sin(2 * np.pi * 440 *
                              np.arange(16000 * 3) / 16000)).astype(np.float32)
        res = pipe.transcribe(audio, language="en",
                              temperature=(0.0,), timestamps=True)
        assert res.duration == pytest.approx(3.0)
        assert res.processing_time > 0
        assert isinstance(res.text, str)
        assert all(s.end >= s.start for s in res.segments)

    def test_transcribe_no_fallback_path(self, tiny_model, tok):
        pipe = WhisperPipeline(tiny_model, TINY, tok)
        audio = np.zeros(16000, np.float32)
        res = pipe.transcribe(audio, language="en", temperature=(0.0,),
                              no_speech_threshold=None,
                              condition_on_previous_text=False)
        assert res.language == "en"


class TestQuantization:
    def test_roundtrip_accuracy(self, rng):
        from tpu_audio.ops import quant

        w = rng.standard_normal((32, 128)).astype(np.float32)
        for bits in (4, 8):
            q = quant.quantize_array(w, bits=bits)
            deq = np.asarray(quant.dequantize(
                {k: jnp.asarray(v) for k, v in q.items()}))
            err = np.abs(deq - w).max()
            scale = (w.max() - w.min()) / ((1 << bits) - 1)
            assert err <= scale * 0.51 + 1e-6

    def test_quantized_linear(self, rng):
        from tpu_audio.nn import layers
        from tpu_audio.ops import quant

        w = rng.standard_normal((32, 128)).astype(np.float32) * 0.1
        x = rng.standard_normal((3, 128)).astype(np.float32)
        q = {k: jnp.asarray(v) for k, v in quant.quantize_array(w, bits=8).items()}
        got = np.asarray(layers.linear(q, jnp.asarray(x)))
        ref = x @ w.T
        assert np.abs(got - ref).max() < 0.05

    def test_quantize_tree(self, rng):
        from tpu_audio.ops import quant

        tree = {"a": {"weight": jnp.asarray(rng.standard_normal((16, 64)),
                                            jnp.float32)},
                "b": {"weight": jnp.asarray(rng.standard_normal((3,)), jnp.float32)}}
        qt = quant.quantize_tree(tree, bits=4)
        assert "weight_q4" in qt["a"]
        assert "weight" in qt["b"]  # 1-D leaf untouched


class TestQuantizedEmbedding:
    def test_dequantize_rows_matches_full(self, rng):
        import jax.numpy as jnp

        from tpu_audio.ops import quant

        w = rng.standard_normal((64, 128)).astype(np.float32)
        q = {k: jnp.asarray(v) for k, v in quant.quantize_array(w, bits=4).items()}
        ids = jnp.asarray([3, 17, 63])
        rows = np.asarray(quant.dequantize_rows(q, ids))
        full = np.asarray(quant.dequantize(q))[np.asarray(ids)]
        np.testing.assert_allclose(rows, full, atol=1e-6)


class TestWordTimestamps:
    def test_pipeline_word_timestamps(self, tiny_model, tok, rng):
        pipe = WhisperPipeline(tiny_model, TINY, tok)
        audio = (0.1 * rng.standard_normal(16000 * 2)).astype(np.float32)
        res = pipe.transcribe(audio, language="en", temperature=(0.0,),
                              word_timestamps=True,
                              condition_on_previous_text=False)
        for seg in res.segments:
            for w in seg.words or []:
                assert w.end >= w.start >= 0
                assert 0 <= w.probability <= 1

    def test_find_alignment_counts(self, tiny_model, tok, rng):
        from tpu_audio.models.whisper import timing

        mel = rng.standard_normal((3000, 80)).astype(np.float32) * 0.1
        text_tokens = tok.encode("the cat sat here")
        words, counts = timing.find_alignment(
            tiny_model, TINY, tok, mel, text_tokens, "en", 3000)
        assert len(words) == len(counts)
        assert sum(counts) <= len(text_tokens) + 1


class TestHallucinationFilter:
    """word_anomaly_score / is_segment_anomaly / filter_hallucinated_segments
    (reference WhisperTiming.swift:1010-1200)."""

    def _word(self, w="hello", start=0.0, end=0.5, p=0.9):
        from tpu_audio.api.results import Word

        return Word(word=w, start=start, end=end, probability=p)

    def test_anomaly_score_components(self):
        from tpu_audio.models.whisper import timing

        assert timing.word_anomaly_score(self._word(p=0.9, end=0.5)) == 0.0
        assert timing.word_anomaly_score(self._word(p=0.1, end=0.5)) == 1.0
        # very short word: (0.133 - 0.05) * 15
        s = timing.word_anomaly_score(self._word(end=0.05))
        assert abs(s - (0.133 - 0.05) * 15) < 1e-6
        # very long word: duration - 2
        assert abs(timing.word_anomaly_score(self._word(end=3.0)) - 1.0) < 1e-6

    def test_segment_anomaly(self):
        from tpu_audio.models.whisper import timing

        good = [self._word(start=i * 0.5, end=i * 0.5 + 0.4)
                for i in range(8)]
        assert not timing.is_segment_anomaly(good)
        bad = [self._word(p=0.05, start=i * 0.01, end=i * 0.01 + 0.005)
               for i in range(8)]
        assert timing.is_segment_anomaly(bad)
        assert not timing.is_segment_anomaly(None)
        assert not timing.is_segment_anomaly([self._word(w=".")])

    def test_filter_drops_isolated_anomaly(self):
        from tpu_audio.api.results import TranscriptionSegment
        from tpu_audio.models.whisper import timing

        def seg(sid, start, end, words):
            return TranscriptionSegment(id=sid, seek=0, start=start, end=end,
                                        text="x", tokens=[1], words=words)

        # anomalous segment at window start with long silence after
        bad_words = [self._word(p=0.01, start=0.5 + i * 0.01,
                                end=0.5 + i * 0.01 + 0.005) for i in range(4)]
        good_words = [self._word(start=20.0 + i * 0.5,
                                 end=20.4 + i * 0.5) for i in range(3)]
        segs = [seg(0, 0.5, 1.0, bad_words), seg(1, 20.0, 22.0, good_words)]
        out = timing.filter_hallucinated_segments(segs, 2.0, 30.0)
        assert len(out) == 1 and out[0].id == 1

        # same anomaly but speech directly adjacent → kept
        near = [self._word(start=1.1 + i * 0.5, end=1.5 + i * 0.5)
                for i in range(3)]
        segs2 = [seg(0, 2.4, 2.9, bad_words), seg(1, 3.0, 5.0, near)]
        out2 = timing.filter_hallucinated_segments(segs2, 2.0, 30.0)
        assert len(out2) == 2

    def test_threshold_none_keeps_all(self):
        from tpu_audio.models.whisper import timing

        assert timing.filter_hallucinated_segments([], 2.0, 30.0) == []


class TestModelMatrix:
    """Repo map parity with the reference's WhisperModelSize ×
    WhisperQuantization (TranscriptionResult.swift:166-272)."""

    def test_full_matrix_resolves(self):
        from tpu_audio.models.whisper.load import (QUANTIZATIONS, SIZES,
                                                   repo_for)

        # 3 checkpoint formats matching the reference enum + the w8a8
        # serving format (requantized q8, round 3)
        assert len(SIZES) == 10 and len(QUANTIZATIONS) == 4
        for m in SIZES:
            for q in QUANTIZATIONS:
                if q == "w8a8":
                    continue  # serving format: resolves via the q8 repo
                repo = repo_for(m, q)
                assert repo.startswith("mlx-community/whisper")

    def test_reference_naming_scheme(self):
        from tpu_audio.models.whisper.load import repo_for

        # non-overridden pairs follow repoId = whisper-{size}-{suffix}
        assert repo_for("medium", "q8") == "mlx-community/whisper-medium-8bit"
        assert repo_for("tiny.en", "q4") == "mlx-community/whisper-tiny.en-4bit"
        assert repo_for("large-v3", "q8") == "mlx-community/whisper-large-v3-8bit"

    def test_unknown_rejected(self):
        import pytest as _pytest

        from tpu_audio.models.whisper.load import repo_for

        with _pytest.raises(ValueError):
            repo_for("gigantic", "fp16")
        with _pytest.raises(ValueError):
            repo_for("tiny", "q2")


class TestInt8Quantization:
    """W8A8 serving format (ops/quant int8 + ops/pallas/int8_matmul):
    per-channel symmetric weights, per-row symmetric activations."""

    def test_quantize_int8_roundtrip(self, rng):
        from tpu_audio.ops import quant

        w = rng.standard_normal((32, 128)).astype(np.float32) * 0.1
        q = quant.quantize_array_int8(w)
        deq = np.asarray(q["weight_i8"], np.float32) * q["scale_i8"]
        per_row_scale = np.abs(w).max(axis=1, keepdims=True) / 127.0
        assert np.all(np.abs(deq - w) <= per_row_scale * 0.51 + 1e-7)

    def test_requantize_from_q4_cosine(self, rng):
        from tpu_audio.ops import quant

        w = rng.standard_normal((64, 256)).astype(np.float32) * 0.02
        q4 = {k: jnp.asarray(v) for k, v in quant.quantize_array(w, 4).items()}
        i8 = quant.requantize_int8(q4)
        a = np.asarray(quant.dequantize(q4)).ravel()
        b = (np.asarray(i8["weight_i8"], np.float32)
             * i8["scale_i8"]).ravel()
        cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert cos > 0.9999

    def test_int8_linear_matches_dequant(self, rng):
        from tpu_audio.nn import layers
        from tpu_audio.ops import quant

        w = rng.standard_normal((48, 128)).astype(np.float32) * 0.1
        x = rng.standard_normal((3, 128)).astype(np.float32)
        q = {k: jnp.asarray(v)
             for k, v in quant.quantize_array_int8(w).items()}
        got = np.asarray(layers.linear(q, jnp.asarray(x)))
        ref = x @ w.T
        assert np.abs(got - ref).max() < 0.05

    def test_int8_embedding_rows_and_head(self, rng):
        from tpu_audio.nn import layers
        from tpu_audio.ops import quant

        w = rng.standard_normal((64, 128)).astype(np.float32) * 0.05
        q = {k: jnp.asarray(v)
             for k, v in quant.quantize_array_int8(w).items()}
        ids = jnp.asarray([1, 5, 63])
        rows = np.asarray(layers.embedding(q, ids))
        np.testing.assert_allclose(
            rows, (np.asarray(q["weight_i8"], np.float32)
                   * np.asarray(q["scale_i8"]))[np.asarray(ids)], atol=1e-6)
        x = rng.standard_normal((2, 128)).astype(np.float32) * 0.1
        logits = np.asarray(layers.embedding_as_linear(q, jnp.asarray(x)))
        assert np.abs(logits - x @ (np.asarray(q["weight_i8"], np.float32)
                                    * q["scale_i8"]).T).max() < 1e-3

    def test_quantize_tree_int8_and_decode(self, rng):
        """End-to-end: int8-quantized shared transformer decodes sanely."""
        from tpu_audio.models.orpheus.model import CausalLMGenerator
        from tpu_audio.nn import transformer
        from tpu_audio.ops import quant
        from tpu_audio.ops.sampling import SamplerConfig

        cfg = transformer.TransformerConfig(
            dim=128, n_layers=2, n_heads=4, n_kv_heads=4, hidden_dim=256,
            vocab_size=128)
        params = transformer.init_params(jax.random.PRNGKey(0), cfg)
        qp = quant.quantize_tree_int8(params)
        assert "weight_i8" in qp["layers"]["attn"]["q"]
        kw = dict(sampler=SamplerConfig(temperature=0.0), eos_ids=(127,),
                  max_new=8, seed=0)
        ref = CausalLMGenerator(params, cfg, max_cache=64).generate([3, 9], **kw)
        got = CausalLMGenerator(qp, cfg, max_cache=64).generate([3, 9], **kw)
        # int8 per-channel is near-lossless: greedy tokens should mostly agree
        agree = sum(a == b for a, b in zip(ref, got)) / max(len(ref), 1)
        assert agree >= 0.7, (ref, got)

    def test_fused_int8_decode_identical(self, rng):
        """fuse_int8_tree (qkv/gateup concat) is bit-identical to unfused."""
        from tpu_audio.models.orpheus.model import CausalLMGenerator
        from tpu_audio.nn import transformer
        from tpu_audio.ops import quant
        from tpu_audio.ops.sampling import SamplerConfig

        cfg = transformer.TransformerConfig(
            dim=128, n_layers=2, n_heads=4, n_kv_heads=2, hidden_dim=256,
            vocab_size=128)
        params = transformer.init_params(jax.random.PRNGKey(5), cfg)
        qp = quant.quantize_tree_int8(params)
        fused = quant.fuse_int8_tree(qp)
        assert "qkv" in fused["layers"]["attn"]
        assert "gateup" in fused["layers"]["mlp"]
        kw = dict(sampler=SamplerConfig(temperature=0.0), eos_ids=(127,),
                  max_new=10, seed=0)
        a = CausalLMGenerator(qp, cfg, max_cache=64).generate([3, 9], **kw)
        b = CausalLMGenerator(fused, cfg, max_cache=64).generate([3, 9], **kw)
        assert a == b

    def test_requantize_tree_int8_from_q4(self, rng):
        """Full q4 checkpoint tree → fused int8 serving tree, decode runs."""
        from tpu_audio.models.orpheus.model import CausalLMGenerator
        from tpu_audio.nn import transformer
        from tpu_audio.ops import quant
        from tpu_audio.ops.sampling import SamplerConfig

        cfg = transformer.TransformerConfig(
            dim=128, n_layers=2, n_heads=4, n_kv_heads=4, hidden_dim=256,
            vocab_size=128)
        params = transformer.init_params(jax.random.PRNGKey(0), cfg)
        q4 = quant.quantize_tree(params, bits=4)
        i8 = quant.requantize_tree_int8(q4)
        assert "qkv" in i8["layers"]["attn"]
        assert "weight_i8" in i8["layers"]["attn"]["qkv"]
        kw = dict(sampler=SamplerConfig(temperature=0.0), eos_ids=(127,),
                  max_new=6, seed=0)
        out = CausalLMGenerator(i8, cfg, max_cache=64).generate([3, 9], **kw)
        assert all(0 <= t < 128 for t in out)
