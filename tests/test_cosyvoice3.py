"""CosyVoice3 tests: DiT estimator, LM streaming, token-granularity engine."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_audio.codecs import s3tokenizer
from tpu_audio.codecs.s3gen import flow, hift
from tpu_audio.models.cosyvoice2 import lm as lm_mod
from tpu_audio.models.cosyvoice3 import dit
from tpu_audio.models.cosyvoice3 import model as cv3
from tpu_audio.models.cosyvoice3.engine import CosyVoice3Engine
from tpu_audio.nn import transformer

pytestmark = pytest.mark.slow  # engine e2e / parity / mesh

TINY_QWEN = transformer.TransformerConfig(
    dim=48, n_layers=2, n_heads=4, n_kv_heads=2, hidden_dim=96,
    vocab_size=400, attn_qkv_bias=True, tie_word_embeddings=True)
TINY_LM = lm_mod.CosyLMConfig(qwen=TINY_QWEN, llm_input_size=48,
                              speech_token_size=60)

TINY_DIT = dit.DiTConfig(mel_dim=16, dim=32, depth=2, heads=4, head_dim=8,
                         mu_dim=16, spk_dim=16, conv_pos_groups=4)

TINY_FLOW = cv3.CV3FlowConfig(
    vocab_size=64, input_dim=32, spk_dim=24, mel_dim=16,
    dit=dit.DiTConfig(mel_dim=16, dim=32, depth=2, heads=4, head_dim=8,
                      mu_dim=32, spk_dim=16, conv_pos_groups=4),
    cfm=flow.CFMConfig(n_timesteps=2),
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


class TestChunkedDiT:
    """O(1) streaming flow: frozen per-timestep KV chunks are EXACTLY the
    full chunk-causal recompute when call boundaries align with
    static_chunk_size (VERDICT r1 #9)."""

    CFG = dit.DiTConfig(mel_dim=16, dim=32, depth=2, heads=4, head_dim=8,
                        mu_dim=16, spk_dim=16, conv_pos_groups=4,
                        static_chunk_size=4, num_left_chunks=2)

    def _inputs(self, rng, t):
        x = jnp.asarray(rng.standard_normal((1, t, 16)), jnp.float32)
        mu = jnp.asarray(rng.standard_normal((1, t, 16)), jnp.float32)
        cond = jnp.asarray(rng.standard_normal((1, t, 16)), jnp.float32)
        spk = jnp.asarray(rng.standard_normal((1, 16)), jnp.float32)
        return x, mu, cond, spk

    def test_single_chunk_matches_full(self, rng):
        params = dit.init_params(jax.random.PRNGKey(0), self.CFG)
        x, mu, cond, spk = self._inputs(rng, 8)
        t = jnp.asarray([0.3])
        full = dit.forward(params, self.CFG, x, jnp.asarray([8]), mu, t,
                           spk, cond, streaming=True)
        cache = dit.make_stream_cache(self.CFG, 1, 16)
        v, cache = dit.forward_chunk(params, self.CFG, x, mu, t, spk, cond,
                                     cache)
        np.testing.assert_allclose(np.asarray(v), np.asarray(full),
                                   atol=2e-5)
        assert int(cache.pos) == 8

    def test_aligned_chunks_match_full(self, rng):
        params = dit.init_params(jax.random.PRNGKey(0), self.CFG)
        x, mu, cond, spk = self._inputs(rng, 12)
        t = jnp.asarray([0.7])
        full = dit.forward(params, self.CFG, x, jnp.asarray([12]), mu, t,
                           spk, cond, streaming=True)
        cache = dit.make_stream_cache(self.CFG, 1, 16)
        outs = []
        for lo in (0, 4, 8):  # aligned to static_chunk_size=4
            v, cache = dit.forward_chunk(
                params, self.CFG, x[:, lo:lo + 4], mu[:, lo:lo + 4], t, spk,
                cond[:, lo:lo + 4], cache)
            outs.append(np.asarray(v))
        np.testing.assert_allclose(np.concatenate(outs, axis=1),
                                   np.asarray(full), atol=2e-5)

    def test_ragged_final_chunk_valid_mask(self, rng):
        params = dit.init_params(jax.random.PRNGKey(0), self.CFG)
        x, mu, cond, spk = self._inputs(rng, 8)
        t = jnp.asarray([0.5])
        full = dit.forward(params, self.CFG, x, jnp.asarray([6]), mu, t,
                           spk, cond, streaming=True)
        cache = dit.make_stream_cache(self.CFG, 1, 16)
        v1, cache = dit.forward_chunk(params, self.CFG, x[:, :4],
                                      mu[:, :4], t, spk, cond[:, :4], cache)
        v2, cache = dit.forward_chunk(params, self.CFG, x[:, 4:],
                                      mu[:, 4:], t, spk, cond[:, 4:], cache,
                                      valid_new=jnp.int32(2))
        got = np.concatenate([np.asarray(v1), np.asarray(v2)[:, :2]], axis=1)
        np.testing.assert_allclose(got, np.asarray(full)[:, :6], atol=2e-5)
        assert int(cache.pos) == 6

    def test_ring_roll_preserves_context(self, rng):
        """Rolling the cache by a static chunk leaves outputs identical to
        the unrolled (larger) cache when the dropped slots are out of the
        attention window anyway."""
        from tpu_audio.models.cosyvoice3.model import roll_stream_caches

        params = dit.init_params(jax.random.PRNGKey(0), self.CFG)
        x, mu, cond, spk = self._inputs(rng, 20)
        t = jnp.asarray([0.4])

        # big cache, no roll
        cache_a = dit.make_stream_cache(self.CFG, 1, 24)
        va = []
        for lo in range(0, 20, 4):
            v, cache_a = dit.forward_chunk(
                params, self.CFG, x[:, lo:lo + 4], mu[:, lo:lo + 4], t, spk,
                cond[:, lo:lo + 4], cache_a)
            va.append(np.asarray(v))

        # small cache (16 slots) with a manual roll before the last chunk;
        # stack a leading 1-axis so roll_stream_caches' (n, ...) layout fits
        cache_b = jax.tree_util.tree_map(
            lambda a: a[None], dit.make_stream_cache(self.CFG, 1, 16))
        vb = []
        base = 0
        for lo in range(0, 20, 4):
            if (lo - base) + 4 > 16:
                cache_b = roll_stream_caches(cache_b, jnp.int32(4))
                base += 4
            cb = jax.tree_util.tree_map(lambda a: a[0], cache_b)
            v, cb = dit.forward_chunk(
                params, self.CFG, x[:, lo:lo + 4], mu[:, lo:lo + 4], t, spk,
                cond[:, lo:lo + 4], cb)
            cache_b = jax.tree_util.tree_map(lambda a: a[None], cb)
            vb.append(np.asarray(v))
        np.testing.assert_allclose(np.concatenate(vb, 1),
                                   np.concatenate(va, 1), atol=2e-5)


class TestChunkedCFM:
    def test_single_chunk_matches_cfm_solve(self, rng):
        """cfm_solve_chunk over one all-covering chunk == flow.cfm_solve
        (streaming) with the same noise."""
        cfg = TINY_FLOW
        params = cv3.init_params(jax.random.PRNGKey(1), cfg)
        t = 8
        mu = jnp.asarray(rng.standard_normal((1, t, cfg.dit.mu_dim)),
                         jnp.float32)
        cond = jnp.asarray(rng.standard_normal((1, t, cfg.mel_dim)),
                           jnp.float32)
        emb = jnp.asarray(rng.standard_normal((1, cfg.dit.spk_dim)),
                          jnp.float32)
        key = jax.random.PRNGKey(3)
        z = jax.random.normal(key, (1, t, cfg.mel_dim), jnp.float32)
        # cfm_solve draws z with the same key/shape (out_dim=mel)

        def est(x_, ml, mu_, tt, spks_, cond_, stream):
            return dit.forward(params["decoder_estimator"], cfg.dit, x_, ml,
                               mu_, tt, spks_, cond_, stream)

        ref = flow.cfm_solve(est, cfg.cfm, mu, jnp.asarray([t]), emb, cond,
                             key, streaming=True, out_dim=cfg.mel_dim)
        caches = cv3.make_flow_stream_caches(cfg, 16)
        got, _ = cv3.cfm_solve_chunk(params, cfg, z, mu, emb, cond, caches)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=3e-5)


class TestO1FlowPolicy:
    """Auto-switch policy: full recompute below the threshold, cached flow
    (with horizon bootstrap) beyond it; forced True from the first chunk."""

    def _stream(self, flow_params, rng, **syn_kw):
        synth = cv3.CV3Synthesizer(flow_params, TINY_FLOW, **syn_kw)
        token_chunks = [list(rng.integers(3, 60, 6)) for _ in range(4)]
        out = list(synth.stream(iter(token_chunks), [0, 1],
                                rng.standard_normal((4, 16)).astype(
                                    np.float32),
                                np.zeros((1, 24), np.float32), seed=0,
                                chunk_size=6))
        return sum(len(a) for a in out), out

    def test_forced_o1_yields_full_audio(self, flow_params):
        rng = np.random.default_rng(0)
        total, out = self._stream(flow_params, rng, o1_flow=True)
        ups = TINY_FLOW.hift.upsample_scale
        assert total == 24 * 2 * ups
        assert all(np.isfinite(a).all() for a in out)

    def test_auto_switch_mid_stream(self, flow_params):
        """Tiny threshold forces the bootstrap path after the first full-
        recompute chunk."""
        rng = np.random.default_rng(1)
        total, out = self._stream(flow_params, rng, o1_flow="auto",
                                  o1_switch_frames=10)
        ups = TINY_FLOW.hift.upsample_scale
        assert total == 24 * 2 * ups
        assert all(np.isfinite(a).all() for a in out)

    def test_auto_stays_full_below_threshold(self, flow_params):
        rng = np.random.default_rng(2)
        total_auto, _ = self._stream(flow_params, rng, o1_flow="auto",
                                     o1_switch_frames=10_000)
        rng = np.random.default_rng(2)
        total_off, _ = self._stream(flow_params, rng, o1_flow=False)
        assert total_auto == total_off


class TestCV3EngineMesh:
    """DiT-family engine under a dp×tp mesh (VERDICT r3 weak-#6): token
    streaming must produce the same waveform as single-device."""

    def _engine(self, lm_params, flow_params, mesh=None):
        tok_cfg = s3tokenizer.S3TokenizerConfig(
            n_mels=128, n_audio_state=64, n_audio_head=4, n_audio_layer=1)
        tok_params = s3tokenizer.init_params(jax.random.PRNGKey(2), tok_cfg)
        return CosyVoice3Engine.from_params(
            lm_params, TINY_LM, flow_params, TINY_FLOW, tok_params, tok_cfg,
            max_cache=256, chunk=4, mesh=mesh)

    def test_waveform_parity_dp2_tp4(self, lm_params, flow_params):
        from tpu_audio.parallel import make_mesh

        ref = np.concatenate([c.samples for c in self._engine(
            lm_params, flow_params).generate_streaming("Hello there.")])
        got = np.concatenate([c.samples for c in self._engine(
            lm_params, flow_params,
            mesh=make_mesh(dp=2, tp=4)).generate_streaming("Hello there.")])
        assert ref.shape == got.shape
        assert np.allclose(ref, got, atol=1e-4)

    def test_dit_params_sharded(self, lm_params, flow_params):
        from tpu_audio.parallel import make_mesh

        eng = self._engine(lm_params, flow_params,
                           mesh=make_mesh(dp=2, tp=4))
        flat = __import__("tpu_audio.utils.pytree",
                          fromlist=["flatten"]).flatten(eng.flow_params)
        sharded = [k for k, v in flat.items()
                   if hasattr(v, "sharding")
                   and any(s == "tp" for s in (v.sharding.spec or ()))]
        assert sharded, "no DiT/flow leaves picked up tp sharding"
