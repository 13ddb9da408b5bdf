"""Mimi codec + Marvis dual-transformer tests on tiny random models."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_audio.codecs import mimi
from tpu_audio.models.marvis import model as mmodel
from tpu_audio.models.marvis.engine import MarvisEngine
from tpu_audio.nn import transformer

pytestmark = pytest.mark.slow  # engine e2e / parity / mesh

TINY_MIMI = mimi.MimiConfig(dimension=32, n_filters=4, ratios=(4, 3, 2),
                            t_layers=2, t_heads=4, t_ff=64, n_q=4, bins=16,
                            q_dim=8)

TINY_MARVIS = mmodel.MarvisConfig(
    backbone=transformer.TransformerConfig(dim=32, n_layers=2, n_heads=4,
                                           n_kv_heads=2, hidden_dim=64),
    decoder=transformer.TransformerConfig(dim=16, n_layers=1, n_heads=2,
                                          n_kv_heads=2, hidden_dim=32),
    text_vocab_size=300, audio_vocab_size=32, n_codebooks=4)


@pytest.fixture(scope="module")
def mimi_params():
    return mimi.init_params(jax.random.PRNGKey(0), TINY_MIMI)


@pytest.fixture(scope="module")
def marvis_params():
    return mmodel.init_params(jax.random.PRNGKey(1), TINY_MARVIS)


class TestMimi:
    def test_encode_decode_shapes(self, mimi_params, rng):
        hop = TINY_MIMI.hop  # 4*3*2*2 = 48
        audio = jnp.asarray(rng.standard_normal((1, hop * 6)), jnp.float32)
        codes = mimi.encode(mimi_params, TINY_MIMI, audio)
        assert codes.shape == (1, TINY_MIMI.n_q, 6)
        assert np.asarray(codes).min() >= 0
        assert np.asarray(codes).max() < TINY_MIMI.bins
        recon = mimi.decode(mimi_params, TINY_MIMI, codes)
        assert recon.shape == (1, hop * 6)
        assert np.isfinite(np.asarray(recon)).all()

    def test_decode_fewer_codebooks(self, mimi_params, rng):
        codes = jnp.asarray(rng.integers(0, 16, (1, 2, 5)), jnp.int32)
        recon = mimi.decode(mimi_params, TINY_MIMI, codes)
        assert recon.shape == (1, TINY_MIMI.hop * 5)

    def test_causal_streaming_equivalence(self, mimi_params, rng):
        """Causality: decoding a prefix gives the same audio as the prefix
        of decoding the whole sequence."""
        codes = jnp.asarray(rng.integers(0, 16, (1, 4, 8)), jnp.int32)
        full = np.asarray(mimi.decode(mimi_params, TINY_MIMI, codes))
        part = np.asarray(mimi.decode(mimi_params, TINY_MIMI, codes[:, :, :5]))
        np.testing.assert_allclose(part[0], full[0, : part.shape[1]],
                                   atol=1e-4)


class TestMarvis:
    def test_frame_step_shapes(self, marvis_params):
        cfg = TINY_MARVIS
        k = cfg.n_codebooks
        tokens = jnp.zeros((1, 5, k + 1), jnp.int32)
        mask = jnp.ones((1, 5, k + 1), jnp.bool_)
        cache = transformer.make_cache(cfg.backbone, 1, 32, dtype=jnp.float32)
        frame, cache2 = mmodel.frame_step(
            marvis_params, cfg, tokens, mask, cache, jax.random.PRNGKey(0),
            max_codebooks=k, temperature=0.9, top_k=8)
        assert frame.shape == (1, k)
        assert int(cache2.pos) == 5
        assert np.asarray(frame).min() >= 0
        assert np.asarray(frame).max() < cfg.audio_vocab_size

    def test_fewer_codebooks(self, marvis_params):
        cfg = TINY_MARVIS
        tokens = jnp.zeros((1, 3, cfg.n_codebooks + 1), jnp.int32)
        mask = jnp.ones_like(tokens, dtype=jnp.bool_)
        cache = transformer.make_cache(cfg.backbone, 1, 16, dtype=jnp.float32)
        frame, _ = mmodel.frame_step(
            marvis_params, cfg, tokens, mask, cache, jax.random.PRNGKey(1),
            max_codebooks=2, temperature=0.0, top_k=0)
        assert frame.shape == (1, 2)

    def test_engine_end_to_end(self, marvis_params, mimi_params):
        eng = MarvisEngine.from_params(marvis_params, TINY_MARVIS,
                                       mimi_params, TINY_MIMI, max_frames=6)
        eng.quality = "low"  # 8 codebooks, clipped to the model's 4
        assert eng.n_codebooks == 4
        res = eng.generate("Hello.")
        assert res.sample_rate == 24000
        assert np.isfinite(res.samples).all()

    def test_engine_w8a8(self, mimi_params):
        """quantization='w8a8' requantizes the backbone + depth-decoder
        stacks; the frame loop serves them through the shared stacked
        int8 path (XLA fallback on CPU). Dims must pass the int8
        eligibility gate (last dim % 128 == 0), so this uses a 128-wide
        config rather than the shared 32-wide TINY."""
        import jax as _jax

        cfg = mmodel.MarvisConfig(
            backbone=transformer.TransformerConfig(
                dim=128, n_layers=2, n_heads=4, n_kv_heads=2,
                hidden_dim=128),
            decoder=transformer.TransformerConfig(
                dim=128, n_layers=1, n_heads=2, n_kv_heads=2,
                hidden_dim=128),
            text_vocab_size=300, audio_vocab_size=32, n_codebooks=4)
        params = mmodel.init_params(_jax.random.PRNGKey(3), cfg)
        eng = MarvisEngine.from_params(params, cfg, mimi_params, TINY_MIMI,
                                       max_frames=6, quantization="w8a8")
        eng.quality = "low"
        from tpu_audio.utils import pytree

        flat = pytree.flatten(eng.params)
        assert any("weight_i8" in k for k in flat), \
            "backbone/decoder were not requantized"
        res = eng.generate("Hello.")
        assert np.isfinite(res.samples).all()

    def test_engine_streaming_chunks(self, marvis_params, mimi_params):
        from tpu_audio.api.tts import StreamingGranularity

        eng = MarvisEngine.from_params(marvis_params, TINY_MARVIS,
                                       mimi_params, TINY_MIMI, max_frames=8)
        eng.quality = "low"
        chunks = list(eng.generate_streaming(
            "Hi.", granularity=StreamingGranularity.FRAME))
        assert chunks[-1].is_final


class TestMarvisQuantizedKV:
    def test_engine_with_int8_kv(self, marvis_params, mimi_params):
        eng = MarvisEngine.from_params(marvis_params, TINY_MARVIS,
                                       mimi_params, TINY_MIMI, max_frames=6)
        eng.kv_quantized = True
        res = eng.generate("Hello.")
        assert res.sample_rate == 24000
        assert np.isfinite(res.samples).all()


class TestMimiStreamingDecoder:
    """Exact stateful streaming decode (reference MimiStreamingDecoder,
    Mimi.swift:213-241 + Conv.swift state machines): chunked output must
    equal the one-shot decode bit-for-bit."""

    def _run(self, cfg, params, codes, chunk):
        from tpu_audio.codecs.mimi import streaming

        n = codes.shape[-1]
        state = streaming.init_state(params, cfg, batch=1,
                                     chunk_frames=chunk)
        outs = []
        for s in range(0, n, chunk):
            audio, state = streaming.decode_stream(
                params, cfg, codes[:, :, s: s + chunk], state)
            outs.append(np.asarray(audio))
        return np.concatenate(outs, axis=-1)

    def test_chunked_equals_full(self, mimi_params, rng):
        codes = jnp.asarray(rng.integers(0, TINY_MIMI.bins,
                                         (1, TINY_MIMI.n_q, 12)), jnp.int32)
        full = np.asarray(mimi.decode(mimi_params, TINY_MIMI, codes))
        got = self._run(TINY_MIMI, mimi_params, codes, chunk=4)
        assert got.shape == full.shape
        np.testing.assert_allclose(got, full, atol=1e-4)

    def test_sliding_window_context(self, rng):
        """Chunks crossing the transformer context window still match the
        one-shot pass (whose mask enforces the same window)."""
        cfg = mimi.MimiConfig(dimension=32, n_filters=4, ratios=(4, 3, 2),
                              t_layers=2, t_heads=4, t_ff=64, n_q=2,
                              bins=16, q_dim=8, t_context=4)
        params = mimi.init_params(jax.random.PRNGKey(3), cfg)
        codes = jnp.asarray(rng.integers(0, cfg.bins, (1, cfg.n_q, 9)),
                            jnp.int32)
        full = np.asarray(mimi.decode(params, cfg, codes))
        got = self._run(cfg, params, codes, chunk=3)
        np.testing.assert_allclose(got, full, atol=1e-4)

    def test_single_frame_chunks(self, mimi_params, rng):
        codes = jnp.asarray(rng.integers(0, TINY_MIMI.bins,
                                         (1, TINY_MIMI.n_q, 5)), jnp.int32)
        full = np.asarray(mimi.decode(mimi_params, TINY_MIMI, codes))
        got = self._run(TINY_MIMI, mimi_params, codes, chunk=1)
        np.testing.assert_allclose(got, full, atol=1e-4)


class TestFusedDepthPath:
    """frame_step(depth_fused=True) — the whole-stack Pallas depth decode —
    must produce the same greedy frame as the XLA scan path. The kernel is
    TPU-gated, so route it through interpret mode here."""

    def _cfg(self):
        return mmodel.MarvisConfig(
            backbone=transformer.TransformerConfig(
                dim=128, n_layers=2, n_heads=4, n_kv_heads=2,
                hidden_dim=256),
            decoder=transformer.TransformerConfig(
                dim=128, n_layers=2, n_heads=2, n_kv_heads=1,
                hidden_dim=512),
            text_vocab_size=300, audio_vocab_size=64, n_codebooks=8)

    def test_greedy_frame_matches_scan_path(self, monkeypatch):
        import functools

        from tpu_audio.ops.pallas import fused_step

        monkeypatch.setattr(
            fused_step, "fused_decode_step",
            functools.partial(fused_step.fused_decode_step, interpret=True))

        cfg = self._cfg()
        params = mmodel.init_params(jax.random.PRNGKey(7), cfg)
        params = MarvisEngine._fuse(params)
        k = cfg.n_codebooks
        tokens = jnp.zeros((1, 5, k + 1), jnp.int32)
        mask = jnp.ones((1, 5, k + 1), jnp.bool_)

        frames = {}
        for fused in (False, True):
            cache = transformer.make_cache(cfg.backbone, 1, 32,
                                           dtype=jnp.float32)
            frame, cache2 = mmodel.frame_step(
                params, cfg, tokens, mask, cache, jax.random.PRNGKey(3),
                max_codebooks=k, temperature=0.0, top_k=0,
                depth_fused=fused)
            frames[fused] = np.asarray(frame)
            assert int(cache2.pos) == 5
        # greedy tokens from near-identical logits: allow at most one
        # near-tie flip across the 8 codebooks
        agree = (frames[True] == frames[False]).sum()
        assert agree >= k - 1, (agree, frames)

    def test_greedy_frame_matches_scan_path_int8(self, monkeypatch):
        """The w8a8 depth stack through the fused kernel (int8 codes,
        output scales) vs the same int8 tree through the XLA scan path."""
        import functools

        from tpu_audio.ops import quant
        from tpu_audio.ops.pallas import fused_step

        monkeypatch.setattr(
            fused_step, "fused_decode_step",
            functools.partial(fused_step.fused_decode_step, interpret=True))

        cfg = self._cfg()
        params = mmodel.init_params(jax.random.PRNGKey(9), cfg)
        params = dict(
            params,
            decoder=quant.fuse_int8_tree(
                quant.quantize_tree_int8(params["decoder"])),
            backbone=transformer.fuse_fp_tree(params["backbone"]))
        k = cfg.n_codebooks
        tokens = jnp.zeros((1, 4, k + 1), jnp.int32)
        mask = jnp.ones((1, 4, k + 1), jnp.bool_)
        frames = {}
        for fused in (False, True):
            cache = transformer.make_cache(cfg.backbone, 1, 16,
                                           dtype=jnp.float32)
            frame, _ = mmodel.frame_step(
                params, cfg, tokens, mask, cache, jax.random.PRNGKey(5),
                max_codebooks=k, temperature=0.0, top_k=0,
                depth_fused=fused)
            frames[fused] = np.asarray(frame)
        # int8-activation (XLA path) vs exact-activation (kernel): wider
        # rounding gap than fp, still near-total greedy agreement expected
        agree = (frames[True] == frames[False]).sum()
        assert agree >= k - 2, (agree, frames)

    def test_fused_backbone_frames_match_plain(self, monkeypatch):
        """frame_step_fused_bb (backbone + depth both through the kernel,
        left-pad masking via the start scalar, cache in kernel layout) must
        reproduce the plain path's greedy frames across a multi-frame
        rollout after a left-padded prefill."""
        import functools

        from tpu_audio.ops.pallas import fused_step

        monkeypatch.setattr(
            fused_step, "fused_decode_step",
            functools.partial(fused_step.fused_decode_step, interpret=True))

        cfg = self._cfg()
        params = mmodel.init_params(jax.random.PRNGKey(11), cfg)
        params = MarvisEngine._fuse(params)
        k = cfg.n_codebooks
        n, pad = 5, 8  # left-padded prompt: 3 pad slots
        tokens = np.zeros((1, pad, k + 1), np.int32)
        mask = np.zeros((1, pad, k + 1), bool)
        tokens[0, pad - n:, -1] = np.arange(10, 10 + n)
        mask[0, pad - n:, -1] = True
        s_max = 24
        slot = jnp.arange(s_max)
        extra = jnp.where(slot >= pad - n, 0.0, -1e30)[None, None, None, :]

        cache = transformer.make_cache(cfg.backbone, 1, s_max,
                                       dtype=jnp.float32)
        frame, cache = mmodel.frame_step(
            params, cfg, jnp.asarray(tokens), jnp.asarray(mask), cache,
            jax.random.PRNGKey(0), max_codebooks=k, temperature=0.0,
            top_k=0, extra_mask=extra, depth_fused=False)

        kc, vc, pos = mmodel.cache_to_fused(cache)
        start = jnp.int32(pad - n)
        f_plain = f_fused = frame
        agree, total = 0, 0
        for i in range(3):
            tok = jnp.concatenate(
                [f_plain, jnp.zeros((1, 1), jnp.int32)], axis=-1)[:, None]
            msk = jnp.concatenate(
                [jnp.ones((1, 1, k), jnp.bool_),
                 jnp.zeros((1, 1, 1), jnp.bool_)], axis=-1)
            f_plain, cache = mmodel.frame_step(
                params, cfg, tok, msk, cache, jax.random.PRNGKey(i + 1),
                max_codebooks=k, temperature=0.0, top_k=0, extra_mask=extra,
                depth_fused=False)
            tok_f = jnp.concatenate(
                [f_fused, jnp.zeros((1, 1), jnp.int32)], axis=-1)[:, None]
            f_fused, kc, vc = mmodel.frame_step_fused_bb(
                params, cfg, tok_f, msk, kc, vc, pos, start,
                jax.random.PRNGKey(i + 1), max_codebooks=k,
                temperature=0.0, top_k=0)
            pos = pos + 1
            agree += int((np.asarray(f_plain) == np.asarray(f_fused)).sum())
            total += k
        # greedy tokens from float-rounding-close logits; allow rare
        # near-tie flips (divergence compounds across frames if real)
        assert agree >= total - 2, (agree, total)
