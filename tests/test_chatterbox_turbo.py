"""Chatterbox Turbo tests: GPT-2 T3 generation + meanflow engine e2e."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_audio.codecs import s3tokenizer
from tpu_audio.codecs.s3gen import campplus, conformer, flow, hift
from tpu_audio.codecs.s3gen import model as s3gen
from tpu_audio.models.chatterbox import voice_encoder as ve
from tpu_audio.models.chatterbox_turbo import model as turbo
from tpu_audio.models.chatterbox_turbo.engine import ChatterboxTurboEngine
from tpu_audio.nn import transformer

pytestmark = pytest.mark.slow  # engine e2e / parity / mesh

TINY_T3 = turbo.T3TurboConfig(
    gpt2=transformer.TransformerConfig(dim=48, n_layers=2, n_heads=4,
                                       n_kv_heads=4, hidden_dim=96,
                                       mlp="gelu_new", norm="ln",
                                       pos_emb="none"),
    text_tokens_dict_size=300, speech_tokens_dict_size=80,
    start_speech_token=70, stop_speech_token=71, speaker_embed_size=32,
    max_positions=512)


@pytest.fixture(scope="module")
def t3_params():
    return turbo.init_params(jax.random.PRNGKey(0), TINY_T3)


class TestT3Turbo:
    def test_generate(self, t3_params):
        gen = turbo.T3TurboGenerator(t3_params, TINY_T3, max_cache=256)
        out = gen.generate(jnp.zeros((1, 32)), [5, 6, 7, 8], max_new=16)
        assert all(t < TINY_T3.start_speech_token for t in out)

    def test_bucket_consistency(self, t3_params):
        gen = turbo.T3TurboGenerator(t3_params, TINY_T3, max_cache=256)
        text = list(range(10, 26))
        s = turbo.TurboSampler(temperature=1e-4)
        o1 = gen.generate(jnp.zeros((1, 32)), text, sampler=s, max_new=8,
                          seed=1)
        fn = gen._fn(64, 8, s)  # force a bigger bucket
        toks = np.zeros(64, np.int32)
        toks[: len(text)] = text
        buf, cnt = fn(t3_params, jnp.zeros((1, 32)), jnp.asarray(toks),
                      jnp.int32(len(text)), jax.random.PRNGKey(1))
        o2 = [int(t) for t in np.asarray(buf[: int(cnt)])
              if t < TINY_T3.start_speech_token]
        assert o1 == o2


NEAR_GREEDY = turbo.TurboSampler(temperature=1e-4, top_p=1.0, min_p=0.0,
                                 repetition_penalty=1.0)


def _teacher_forced_tokens(params, cfg, spk_emb, text, n_steps):
    """Reference decode: every step re-runs the FULL sequence with
    consecutive positions 0..L-1 (GPT2.swift:239) and argmaxes the last
    logits. Catches any drift in the incremental loop's position ids."""
    from tpu_audio.nn import layers

    gcfg = cfg.gpt2
    out = []
    for _ in range(n_steps):
        cond = layers.linear(params["cond_enc"]["spkr_enc"],
                             spk_emb)[:, None, :]
        text_e = layers.embedding(params["text_emb"],
                                  jnp.asarray(text, jnp.int32)[None])
        seq = [cfg.start_speech_token] + out
        sp_e = layers.embedding(params["speech_emb"],
                                jnp.asarray(seq, jnp.int32)[None])
        x = jnp.concatenate([cond, text_e, sp_e], axis=1)
        L = x.shape[1]
        x = x + layers.embedding(params["wpe"], jnp.arange(L))[None]
        cache = transformer.make_cache(gcfg, 1, L)
        extra = jnp.zeros((1, 1, 1, L))
        h, _ = transformer.forward_hidden(params["tfmr"], gcfg, x, cache,
                                          extra)
        logits = layers.linear(params["speech_head"], h[0, -1])
        tok = int(jnp.argmax(logits))
        out.append(tok)
        if tok == cfg.stop_speech_token:
            break
    return out


class TestTurboPositions:
    def test_incremental_matches_teacher_forced(self, t3_params):
        """Regression: generated token j must be embedded at position
        n_text + 2 + j (prefill ends at n_text + 1). The decode loop used
        to skip position n_text + 2, shifting every generated token."""
        text = [5, 6, 7, 8, 9]
        spk = jnp.zeros((1, 32))
        ref = _teacher_forced_tokens(t3_params, TINY_T3, spk, text, 6)
        gen = turbo.T3TurboGenerator(t3_params, TINY_T3, max_cache=256)
        got_raw = gen._fn(32, 6, NEAR_GREEDY)(
            t3_params, spk,
            jnp.asarray(np.pad(text, (0, 27)).astype(np.int32)),
            jnp.int32(len(text)), jax.random.PRNGKey(0))
        got = [int(t) for t in np.asarray(got_raw[0][: int(got_raw[1])])]
        assert got == ref[: len(got)], (got, ref)


class TestT3TurboStreamer:
    def test_stream_matches_generate(self, t3_params):
        gen = turbo.T3TurboGenerator(t3_params, TINY_T3, max_cache=256)
        text = [5, 6, 7, 8]
        ref = gen.generate(jnp.zeros((1, 32)), text, sampler=NEAR_GREEDY,
                           max_new=12, seed=0)
        streamer = turbo.T3TurboStreamer(gen, chunk=5)
        got = []
        for toks in streamer.stream(jnp.zeros((1, 32)), text,
                                    sampler=NEAR_GREEDY, max_new=12, seed=0):
            got.extend(toks)
        assert got == ref, (got, ref)

    def test_chunk_boundaries_cover_all_tokens(self, t3_params):
        gen = turbo.T3TurboGenerator(t3_params, TINY_T3, max_cache=256)
        streamer = turbo.T3TurboStreamer(gen, chunk=3)
        chunks = list(streamer.stream(jnp.zeros((1, 32)), [5, 6, 7],
                                      max_new=10, seed=1))
        assert all(len(c) <= 3 for c in chunks)
        assert all(t < TINY_T3.start_speech_token
                   for c in chunks for t in c)


class TestMeanflow:
    def test_no_cfg_integration(self, rng):
        est_cfg = flow.EstimatorConfig(in_channels=64, out_channels=16,
                                       channels=32, n_blocks=1,
                                       num_mid_blocks=1, num_heads=4)
        params = flow.init_estimator(jax.random.PRNGKey(0), est_cfg)

        def est(x, ml, mu, t, spks, cond, stream, r=None):
            # no time_embed_mixer on this tiny init → t-only conditioning
            return flow.estimator_forward(params, est_cfg, x, ml, mu, t,
                                          spks, cond, stream)

        mu = jnp.asarray(rng.standard_normal((1, 6, 16)), jnp.float32)
        mel = turbo.meanflow_inference(est, mu, jnp.asarray([6]),
                                       jnp.zeros((1, 16)),
                                       jnp.zeros((1, 6, 16)),
                                       jax.random.PRNGKey(1), n_timesteps=2)
        assert mel.shape == (1, 6, 16)
        assert np.isfinite(np.asarray(mel)).all()


class TestTurboEngine:
    def _build_engine(self, t3_params):
        tok_cfg = s3tokenizer.S3TokenizerConfig(
            n_mels=128, n_audio_state=64, n_audio_head=4, n_audio_layer=1)
        tok_params = s3tokenizer.init_params(jax.random.PRNGKey(1), tok_cfg)
        s3_cfg = s3gen.S3GenConfig(
            vocab_size=80, input_dim=32, spk_dim=24, mel_dim=16,
            conformer=conformer.ConformerConfig(input_size=32, output_size=32,
                                                heads=4, linear_units=64,
                                                num_blocks=1, num_up_blocks=1),
            estimator=flow.EstimatorConfig(in_channels=64, out_channels=16,
                                           channels=32, n_blocks=1,
                                           num_mid_blocks=1, num_heads=4),
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
        s3_params = s3gen.init_params(jax.random.PRNGKey(2), s3_cfg)
        ve_params = ve.init_params(
            jax.random.PRNGKey(3),
            ve.VoiceEncConfig(num_mels=40, ve_hidden_size=16,
                              speaker_embed_size=32, partial_frames=40,
                              partial_hop=20))
        eng = ChatterboxTurboEngine.from_turbo_params(
            t3_params, TINY_T3, s3_params, s3_cfg, tok_params, tok_cfg,
            ve_params, ve.VoiceEncConfig(num_mels=40, ve_hidden_size=16,
                                         speaker_embed_size=32,
                                         partial_frames=40, partial_hop=20),
            max_cache=256)
        # the default conditional speaker_emb must match turbo's 32-dim
        eng.t3_cfg = TINY_T3  # for _default_conditionals sizing
        return eng

    def test_end_to_end(self, t3_params):
        eng = self._build_engine(t3_params)
        res = eng.generate("Hi there.", max_new_tokens=12)
        assert res.sample_rate == 24000
        assert np.isfinite(res.samples).all()

    def test_token_streaming_e2e(self, t3_params):
        eng = self._build_engine(t3_params)
        chunks = list(eng.generate_streaming("Hi there. And more words.",
                                             max_new_tokens=12))
        assert chunks[-1].is_final
        assert sum(c.is_final for c in chunks) == 1
        assert all(np.isfinite(c.samples).all() for c in chunks)
