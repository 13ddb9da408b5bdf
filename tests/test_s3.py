"""S3 stack tests: tokenizer FSQ, HiFT vocoder, flow matching, conformer,
CAMPPlus, end-to-end token2wav on tiny random models."""

import jax
import jax.numpy as jnp
import numpy as np

from tpu_audio.codecs import s3tokenizer
from tpu_audio.codecs.s3gen import campplus, conformer, flow, hift
from tpu_audio.codecs.s3gen import model as s3gen
import pytest

pytestmark = pytest.mark.slow  # engine e2e / parity / mesh

TINY_TOK = s3tokenizer.S3TokenizerConfig(
    n_mels=16, n_audio_state=64, n_audio_head=4, n_audio_layer=2)

TINY_HIFT = hift.HiFTConfig(in_channels=16, base_channels=32,
                            upsample_rates=(4, 3), upsample_kernels=(8, 7),
                            source_resblock_kernels=(7, 11),
                            source_resblock_dilations=((1, 3, 5), (1, 3, 5)),
                            resblock_kernels=(3,),
                            resblock_dilations=((1, 3, 5),))

TINY_CONF = conformer.ConformerConfig(input_size=32, output_size=32,
                                      heads=4, linear_units=64, num_blocks=2,
                                      num_up_blocks=1)

TINY_EST = flow.EstimatorConfig(in_channels=16 * 4, out_channels=16,
                                channels=32, n_blocks=1, num_mid_blocks=2,
                                num_heads=4)

TINY_CAMP = campplus.CAMPPlusConfig(feat_dim=16, embedding_size=24,
                                    growth_rate=8, bn_size=2,
                                    init_channels=16, blocks=(2, 2),
                                    kernels=(3, 3), dilations=(1, 2))


class TestS3Tokenizer:
    def test_quantize_shapes_and_range(self, rng):
        params = s3tokenizer.init_params(jax.random.PRNGKey(0), TINY_TOK)
        mel = jnp.asarray(rng.standard_normal((1, 40, 16)), jnp.float32)
        codes, code_len = s3tokenizer.quantize(params, TINY_TOK, mel,
                                               jnp.asarray([40]))
        assert codes.shape == (1, 10)  # stride 4 total
        assert int(code_len[0]) == 10
        c = np.asarray(codes)
        assert c.min() >= 0 and c.max() < 6561

    def test_fsq_determinism(self, rng):
        params = s3tokenizer.init_params(jax.random.PRNGKey(1), TINY_TOK)
        h = jnp.asarray(rng.standard_normal((1, 5, 64)), jnp.float32)
        c1 = s3tokenizer.model.fsq_encode(params, h)
        c2 = s3tokenizer.model.fsq_encode(params, h)
        np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))


class TestHiFT:
    def test_generate_shapes(self, rng):
        params = hift.init_params(jax.random.PRNGKey(0), TINY_HIFT)
        mel = jnp.asarray(rng.standard_normal((1, 20, 16)) * 0.1, jnp.float32)
        audio, source = hift.generate(params, TINY_HIFT, mel,
                                      jax.random.PRNGKey(1))
        assert audio.shape == (1, 20 * TINY_HIFT.upsample_scale)
        assert np.abs(np.asarray(audio)).max() <= TINY_HIFT.audio_limit + 1e-5
        assert source.shape[1] == 20 * TINY_HIFT.upsample_scale

    def test_source_cache_continuity(self, rng):
        params = hift.init_params(jax.random.PRNGKey(0), TINY_HIFT)
        mel = jnp.asarray(rng.standard_normal((1, 12, 16)) * 0.1, jnp.float32)
        _, source = hift.generate(params, TINY_HIFT, mel, jax.random.PRNGKey(1))
        audio2, _ = hift.generate(params, TINY_HIFT, mel, jax.random.PRNGKey(2),
                                  cache_source=source[:, :100])
        assert np.isfinite(np.asarray(audio2)).all()


class TestConformer:
    def test_forward_upsamples(self, rng):
        params = conformer.init_params(jax.random.PRNGKey(0), TINY_CONF)
        x = jnp.asarray(rng.standard_normal((1, 12, 32)), jnp.float32)
        y, lens = conformer.forward(params, TINY_CONF, x, jnp.asarray([10]))
        assert y.shape == (1, 24, 32)
        assert int(lens[0]) == 20

    def test_pos_emb_convention(self):
        """Round-3 lock: the reference builds POSITIVE positions [0, T)
        with sin/cos halves CONCATENATED and no rel-shift
        (Embedding.swift:17-85; createPE concatenates despite its
        "interleave" comment)."""
        pe = np.asarray(conformer._rel_pos_emb(4, 8))
        assert pe.shape == (1, 4, 8)
        np.testing.assert_allclose(pe[0, 0, :4], np.sin([0, 0, 0, 0]),
                                   atol=1e-7)
        np.testing.assert_allclose(pe[0, 0, 4:], np.cos([0, 0, 0, 0]),
                                   atol=1e-7)
        # position 1, first frequency: sin(1) in the SIN half
        assert abs(pe[0, 1, 0] - np.sin(1.0)) < 1e-6
        assert abs(pe[0, 1, 4] - np.cos(1.0)) < 1e-6


class TestFlow:
    def test_estimator_shapes(self, rng):
        params = flow.init_estimator(jax.random.PRNGKey(0), TINY_EST)
        x = jnp.asarray(rng.standard_normal((2, 10, 16)), jnp.float32)
        v = flow.estimator_forward(params, TINY_EST, x, jnp.asarray([10, 8]),
                                   x, jnp.asarray([0.5, 0.5]),
                                   spks=jnp.zeros((2, 16)),
                                   cond=jnp.zeros((2, 10, 16)))
        assert v.shape == (2, 10, 16)
        assert np.isfinite(np.asarray(v)).all()

    def test_cfm_integration(self, rng):
        params = flow.init_estimator(jax.random.PRNGKey(0), TINY_EST)
        cfm_cfg = flow.CFMConfig(n_timesteps=2)
        mu = jnp.asarray(rng.standard_normal((1, 8, 16)), jnp.float32)
        mel = flow.cfm_inference(params, TINY_EST, cfm_cfg, mu,
                                 jnp.asarray([8]), jnp.zeros((1, 16)),
                                 jnp.zeros((1, 8, 16)), jax.random.PRNGKey(2))
        assert mel.shape == (1, 8, 16)
        assert np.isfinite(np.asarray(mel)).all()


class TestCAMPPlus:
    def test_embed_shape(self, rng):
        params = campplus.init_params(jax.random.PRNGKey(0), TINY_CAMP)
        fbank = jnp.asarray(rng.standard_normal((1, 120, 16)), jnp.float32)
        emb = campplus.embed(params, TINY_CAMP, fbank)
        assert emb.shape == (1, 24)
        assert np.isfinite(np.asarray(emb)).all()


class TestS3GenEndToEnd:
    def test_token2wav(self, rng):
        cfg = s3gen.S3GenConfig(
            vocab_size=64, input_dim=32, spk_dim=24, mel_dim=16,
            conformer=TINY_CONF, estimator=TINY_EST,
            cfm=flow.CFMConfig(n_timesteps=2), hift=TINY_HIFT,
            campplus=TINY_CAMP)
        params = s3gen.init_params(jax.random.PRNGKey(0), cfg)
        tokens = jnp.asarray(rng.integers(0, 64, (1, 10)), jnp.int32)
        prompt_tokens = jnp.asarray(rng.integers(0, 64, (1, 4)), jnp.int32)
        prompt_mel = jnp.asarray(rng.standard_normal((1, 8, 16)) * 0.1,
                                 jnp.float32)
        emb = jnp.asarray(rng.standard_normal((1, 24)), jnp.float32)
        audio, start, valid = s3gen.token2wav(
            params, cfg, tokens, jnp.asarray([10]), prompt_tokens,
            jnp.asarray([4]), prompt_mel, jnp.asarray([8]), emb,
            jax.random.PRNGKey(3))
        ups = cfg.hift.upsample_scale
        assert audio.shape == (1, 28 * ups)  # (4+10)*2 mel frames
        assert int(start) == 8 * ups
        assert int(valid) == 20 * ups
        assert np.isfinite(np.asarray(audio)).all()


class TestVocodeWindow:
    """hift.vocode_window: O(1)-per-chunk streaming must reproduce the
    one-shot full pass (position-keyed noise + carried phase/source)."""

    def test_windowed_equals_full(self, rng):
        params = hift.init_params(jax.random.PRNGKey(0), TINY_HIFT)
        total = 80
        mel = jnp.asarray(rng.standard_normal((1, total, 16)) * 0.2,
                          jnp.float32)
        key = jax.random.PRNGKey(7)
        per = TINY_HIFT.upsample_scale
        full, _ = hift.generate(params, TINY_HIFT, mel, key)
        full = np.asarray(full)

        lb_max = hift.LOOKBACK_FRAMES
        nh = TINY_HIFT.nb_harmonics + 1
        phase = jnp.zeros((1, nh))
        tail = jnp.zeros((1, 0))
        voc = 0
        out = []
        for boundary in (40, total):
            lb = min(lb_max, voc)
            window = mel[:, voc - lb: boundary]
            audio_w, phase, src_w = hift.vocode_window(
                params, TINY_HIFT, window, key, phase,
                tail[:, tail.shape[1] - lb * per:], jnp.asarray(voc))
            out.append(np.asarray(audio_w[0, lb * per:]))
            new_lb = min(lb_max, boundary)
            tail = src_w[:, (lb + (boundary - voc) - new_lb) * per:]
            voc = boundary
        got = np.concatenate(out)
        assert got.shape == full[0].shape
        # Streamed audio differs from the full pass ONLY within the
        # receptive field of each mid-stream emit boundary (mel context was
        # cut there at emit time — the reference's streaming emit has the
        # same property). Everywhere else it is the full pass: chunk-1
        # interior, and ALL of chunk 2 (its 32-frame lookback carries exact
        # source/phase and complete left mel context; its right edge is the
        # true end, same as the full pass).
        np.testing.assert_allclose(got[: 30 * per], full[0, : 30 * per],
                                   atol=5e-3)
        np.testing.assert_allclose(got[40 * per:], full[0, 40 * per:],
                                   atol=5e-3)

    def test_phase_continuity_across_windows(self, rng):
        """End phase of window k == phase a full pass reaches at the same
        frame (mod 1)."""
        params = hift.init_params(jax.random.PRNGKey(0), TINY_HIFT)
        mel = jnp.asarray(rng.standard_normal((1, 24, 16)) * 0.2, jnp.float32)
        key = jax.random.PRNGKey(3)
        per = TINY_HIFT.upsample_scale
        nh = TINY_HIFT.nb_harmonics + 1

        f0 = hift.f0_predict(params["f0_predictor"], mel)
        f0_up = jnp.repeat(f0[..., None], per, axis=1)
        _, phase_full = hift.sine_source(params["m_source"], TINY_HIFT,
                                         f0_up, key)

        phase = jnp.zeros((1, nh))
        tail = jnp.zeros((1, 0))
        voc = 0
        for boundary in (12, 24):
            lb = min(hift.LOOKBACK_FRAMES, voc)
            window = mel[:, voc - lb: boundary]
            _, phase, src_w = hift.vocode_window(
                params, TINY_HIFT, window, key, phase,
                tail[:, tail.shape[1] - lb * per:], jnp.asarray(voc))
            new_lb = min(hift.LOOKBACK_FRAMES, boundary)
            tail = src_w[:, (lb + (boundary - voc) - new_lb) * per:]
            voc = boundary
        # 24 frames < lookback → windows had full context: exact match
        d = np.abs(np.asarray(phase) - np.asarray(phase_full))
        d = np.minimum(d, 1 - d)  # circular distance mod 1
        assert d.max() < 1e-3


class TestFlowCache:
    """ConditionalCFM 34-frame overlap cache (FlowMatching.swift:125-142)."""

    def test_cache_pins_noise_and_mu(self, rng):
        est_cfg = flow.EstimatorConfig(in_channels=16 * 4, out_channels=16,
                                       channels=32, n_blocks=1,
                                       num_mid_blocks=1, num_heads=2,
                                       static_chunk_size=8, num_left_chunks=1)
        cfm = flow.CFMConfig(n_timesteps=2)
        params = flow.init_estimator(jax.random.PRNGKey(0), est_cfg)
        p_len = 8  # == static_chunk_size: prompt fills attention chunk 0
        t1 = p_len + flow.OVERLAP_FRAMES + 8
        mu1 = jnp.asarray(rng.standard_normal((1, t1, 16)) * 0.1, jnp.float32)
        spk = jnp.asarray(rng.standard_normal((1, 16)) * 0.1, jnp.float32)
        cond = jnp.zeros((1, t1, 16))
        out1, cache = flow.cfm_inference(
            params, est_cfg, cfm, mu1, jnp.asarray([t1]), spk, cond,
            jax.random.PRNGKey(1), streaming=True, prompt_len=p_len,
            return_cache=True)
        assert out1.shape == (1, t1, 16)
        assert cache.shape == (1, p_len + flow.OVERLAP_FRAMES, 16, 2)
        # cached mu must be the prompt + trailing overlap of the input mu
        np.testing.assert_allclose(np.asarray(cache[:, :p_len, :, 1]),
                                   np.asarray(mu1[:, :p_len]), atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(cache[:, p_len:, :, 1]),
            np.asarray(mu1[:, -flow.OVERLAP_FRAMES:]), atol=1e-6)

        # next chunk window = [prompt | 34-frame overlap | new] (the
        # ConditionalCFM streaming contract). With the cache injected, the
        # pinned region's z/mu are fixed — so two runs with DIFFERENT rng
        # keys produce identical output wherever attention context is fully
        # pinned (the prompt fills chunk 0 exactly: p_len == chunk size 8).
        t2 = p_len + flow.OVERLAP_FRAMES + 10
        mu2 = jnp.concatenate(
            [mu1[:, :p_len], mu1[:, -flow.OVERLAP_FRAMES:],
             jnp.asarray(rng.standard_normal((1, 10, 16)) * 0.1,
                         jnp.float32)], axis=1)
        cond2 = jnp.zeros((1, t2, 16))
        out_a, cache_a = flow.cfm_inference(
            params, est_cfg, cfm, mu2, jnp.asarray([t2]), spk, cond2,
            jax.random.PRNGKey(99), streaming=True, prompt_len=p_len,
            flow_cache=cache, return_cache=True)
        out_b, _ = flow.cfm_inference(
            params, est_cfg, cfm, mu2, jnp.asarray([t2]), spk, cond2,
            jax.random.PRNGKey(1234), streaming=True, prompt_len=p_len,
            flow_cache=cache, return_cache=True)
        assert out_a.shape == (1, t2, 16)
        np.testing.assert_allclose(np.asarray(out_a[:, :p_len]),
                                   np.asarray(out_b[:, :p_len]), atol=1e-5)
        # the prompt z stays pinned across the whole stream
        np.testing.assert_allclose(np.asarray(cache_a[:, :p_len, :, 0]),
                                   np.asarray(cache[:, :p_len, :, 0]),
                                   atol=1e-6)
