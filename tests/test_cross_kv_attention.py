"""int8 cross-KV decode attention: kernel math (interpret mode) and the
Whisper DecoderStateQ8 integration.

The kernel's block-diagonal q / iota-masked PV formulation must reproduce
plain per-head softmax attention over the DEQUANTIZED K/V exactly (f32
class) — the int8 rounding itself is the only approximation, covered by
the decode_step cosine test.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpu_audio.ops.pallas import cross_kv_attention as ckv


def ref_attention(q, k8, v8, ks, vs, layer, t_valid):
    """Per-head f32 softmax attention over dequantized K/V."""
    b, h, hd = q.shape
    kf = (np.asarray(k8[layer], np.float32)
          * np.asarray(ks)[:, None, :])[:, :t_valid]
    vf = (np.asarray(v8[layer], np.float32)
          * np.asarray(vs)[:, None, :])[:, :t_valid]
    kf = kf.reshape(b, t_valid, h, hd)
    vf = vf.reshape(b, t_valid, h, hd)
    scores = np.einsum("bhd,bthd->bht", np.asarray(q, np.float32), kf)
    scores -= scores.max(-1, keepdims=True)
    w = np.exp(scores)
    w /= w.sum(-1, keepdims=True)
    return np.einsum("bht,bthd->bhd", w, vf)


class TestHeadGroup:
    def test_whisper_shapes(self):
        assert ckv.head_group(20, 64) == 10  # large-v3-turbo
        assert ckv.head_group(8, 64) == 8    # tiny: 8·64=512 ≤ 640
        assert ckv.head_group(6, 64) == 6    # base: 384 % 128 == 0

    def test_indivisible(self):
        assert ckv.head_group(5, 64) is None   # no g|5 with g·64 % 128 == 0
        assert ckv.head_group(3, 100) is None


class TestQuantizeRoundtrip:
    def test_scale_and_pad(self, rng):
        lyr, b, t, h, hd = 2, 3, 100, 4, 32
        ck = jnp.asarray(rng.standard_normal((lyr, b, t, h, hd)), jnp.float32)
        k8, ks, v8, vs = ckv.quantize_cross_kv(ck, ck * 0.5)
        assert k8.shape == (lyr, b, 128, h * hd) and k8.dtype == jnp.int8
        assert ks.shape == (lyr, b, h * hd)
        # dequant error bounded by half a quant step per channel
        rec = np.asarray(k8, np.float32)[:, :, :t] * np.asarray(ks)[:, :, None]
        err = np.abs(rec - np.asarray(ck).reshape(lyr, b, t, h * hd))
        assert err.max() <= float(np.asarray(ks).max()) * 0.51
        # padded rows are exactly zero
        assert np.all(np.asarray(k8)[:, :, t:] == 0)


class TestKernelInterpret:
    @pytest.mark.parametrize("b,h,hd,t", [(2, 4, 64, 100), (1, 8, 64, 300)])
    def test_matches_reference(self, rng, b, h, hd, t):
        lyr = 3
        ck = jnp.asarray(rng.standard_normal((lyr, b, t, h, hd)) * 0.3,
                         jnp.float32)
        cv = jnp.asarray(rng.standard_normal((lyr, b, t, h, hd)) * 0.5,
                         jnp.float32)
        k8, ks, v8, vs = ckv.quantize_cross_kv(ck, cv)
        q = jnp.asarray(rng.standard_normal((b, h, hd)) * 0.2, jnp.float32)
        for layer in (0, lyr - 1):
            got = np.asarray(ckv.cross_attention_decode(
                q, k8, v8, ks[layer], vs[layer], jnp.int32(layer),
                t_valid=t, n_heads=h, interpret=True))
            ref = ref_attention(q, k8, v8, ks[layer], vs[layer], layer, t)
            # bf16 dots inside the kernel vs f32 reference
            np.testing.assert_allclose(got, ref, atol=2e-2, rtol=2e-2)
            cos = (got * ref).sum() / (np.linalg.norm(got)
                                       * np.linalg.norm(ref) + 1e-12)
            assert cos > 0.999

    def test_padded_t_rows_ignored(self, rng):
        """t_valid < T_pad: padded key slots must not leak into softmax."""
        b, h, hd, t = 1, 4, 64, 64  # pads to 128
        ck = jnp.asarray(rng.standard_normal((1, b, t, h, hd)), jnp.float32)
        k8, ks, v8, vs = ckv.quantize_cross_kv(ck, ck)
        # poison the padded rows — the kernel must mask them out
        k8 = k8.at[:, :, t:].set(127)
        v8 = v8.at[:, :, t:].set(127)
        q = jnp.asarray(rng.standard_normal((b, h, hd)), jnp.float32)
        got = np.asarray(ckv.cross_attention_decode(
            q, k8, v8, ks[0], vs[0], jnp.int32(0), t_valid=t, n_heads=h,
            interpret=True))
        ref = ref_attention(q, k8, v8, ks[0], vs[0], 0, t)
        np.testing.assert_allclose(got, ref, atol=5e-2)  # bf16-dot class
        cos = (got * ref).sum() / (np.linalg.norm(got)
                                   * np.linalg.norm(ref) + 1e-12)
        assert cos > 0.999
        # sanity: poisoned pad rows WOULD shift the result if unmasked
        got_bad = np.asarray(ckv.cross_attention_decode(
            q, k8, v8, ks[0], vs[0], jnp.int32(0), t_valid=2 * t, n_heads=h,
            interpret=True))
        assert np.abs(got_bad - ref).max() > 0.1


class TestDecoderStateQ8:
    """decode_step with kv_int8: CPU runs the XLA dequant fallback — same
    int8 semantics as the kernel (which TestKernelInterpret pins), so this
    covers the state plumbing, prefill path, and accuracy class."""

    @pytest.fixture(scope="class")
    def setup(self):
        from tpu_audio.models.whisper import model as wmodel
        from tpu_audio.models.whisper.config import WhisperConfig

        cfg = WhisperConfig(n_mels=80, n_audio_ctx=64, n_audio_state=64,
                            n_audio_head=4, n_audio_layer=2, n_vocab=100,
                            n_text_ctx=32, n_text_state=64, n_text_head=4,
                            n_text_layer=2)
        params = wmodel.init_params(jax.random.PRNGKey(0), cfg)
        rng = np.random.default_rng(0)
        feats = jnp.asarray(rng.standard_normal(
            (2, cfg.n_audio_ctx, cfg.n_audio_state)) * 0.3, jnp.float32)
        return wmodel, cfg, params, feats

    def test_matches_bf16_state(self, setup):
        wmodel, cfg, params, feats = setup
        toks = jnp.asarray([[5, 7, 9], [3, 2, 8]], jnp.int32)
        s_fp = wmodel.init_state(params, cfg, feats, batch=2)
        s_q8 = wmodel.init_state(params, cfg, feats, batch=2, kv_int8=True)
        lg_fp, s_fp = wmodel.decode_step(params, cfg, toks, s_fp)  # prefill
        lg_q8, s_q8 = wmodel.decode_step(params, cfg, toks, s_q8)
        for _ in range(3):  # decode steps
            nxt = jnp.argmax(lg_fp[:, -1], axis=-1).astype(jnp.int32)
            lg_fp, s_fp = wmodel.decode_step(params, cfg, nxt[:, None], s_fp)
            lg_q8, s_q8 = wmodel.decode_step(params, cfg, nxt[:, None], s_q8)
            a = np.asarray(lg_fp[:, -1], np.float32).ravel()
            b = np.asarray(lg_q8[:, -1], np.float32).ravel()
            cos = (a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b)
                                   + 1e-12)
            assert cos > 0.999, cos
        assert int(s_q8.cache.pos) == int(s_fp.cache.pos) == 6

    def test_greedy_tokens_agree(self, setup):
        wmodel, cfg, params, feats = setup
        toks = jnp.asarray([[5, 7, 9], [3, 2, 8]], jnp.int32)

        def greedy(kv_int8):
            st = wmodel.init_state(params, cfg, feats, batch=2,
                                   kv_int8=kv_int8)
            lg, st = wmodel.decode_step(params, cfg, toks, st)
            out = []
            for _ in range(8):
                nxt = jnp.argmax(lg[:, -1], axis=-1).astype(jnp.int32)
                out.append(np.asarray(nxt))
                lg, st = wmodel.decode_step(params, cfg, nxt[:, None], st)
            return np.stack(out)

        match = (greedy(False) == greedy(True)).mean()
        assert match >= 0.9, match


class TestPipelineKvInt8:
    def test_transcribe_end_to_end(self):
        """WhisperPipeline(kv_int8=True) runs the full seek loop (CPU takes
        the XLA dequant path; the kernel itself is pinned in interpret
        mode above) and transcribes the same as the bf16-KV pipeline."""
        from tests.test_whisper import TINY, make_bpe
        from tpu_audio.models.whisper import model as wmodel
        from tpu_audio.models.whisper.pipeline import WhisperPipeline
        from tpu_audio.models.whisper.tokenizer import WhisperTokenizer

        tok = WhisperTokenizer(make_bpe(), multilingual=True,
                               num_languages=99)
        params = wmodel.init_params(jax.random.PRNGKey(0), TINY)
        audio = (0.1 * np.sin(2 * np.pi * 440 * np.arange(16000 * 2)
                              / 16000)).astype(np.float32)
        kw = dict(language="en", temperature=(0.0,), timestamps=True)
        res_q8 = WhisperPipeline(params, TINY, tok,
                                 kv_int8=True).transcribe(audio, **kw)
        res_fp = WhisperPipeline(params, TINY, tok).transcribe(audio, **kw)
        assert res_q8.duration == pytest.approx(2.0)
        assert isinstance(res_q8.text, str)
        # int8 rounding on near-tie random-weight logits may flip a token;
        # demand segment-structure agreement, not bit equality
        assert len(res_q8.segments) == len(res_fp.segments)
