"""Kokoro synthesis pipeline: two compiled stages with static shapes.

Stage 1 (token axis fixed at 512 — the model's hard 510-token context +
padding): ALBERT → duration encoder → durations, plus the text encoder.
Stage 2 (frame axis bucketed): alignment matmul → prosody → decoder →
vocoder. Durations cross the host once (a few hundred ints) to pick the
frame bucket; everything else stays on device. The reference instead runs
exact shapes eagerly with a host COO loop (KokoroTTS.swift:258-434).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from tpu_audio.models.kokoro import model as kmodel
from tpu_audio.models.kokoro.config import KokoroConfig

TOKEN_PAD = 512
FRAME_BUCKET = 240  # 6 s of 40 fps duration frames per bucket step


class KokoroSynthesizer:
    def __init__(self, params, cfg: KokoroConfig | None = None):
        self.params = params
        self.cfg = cfg or KokoroConfig()
        self._stage2_fns: dict[int, callable] = {}

        cfg_ = self.cfg

        @jax.jit
        def stage1(params, tokens, n_tokens, style_sd, speed):
            d_en = kmodel.bert_duration_features(params, cfg_, tokens, n_tokens)
            d = kmodel.duration_encode(params, cfg_, d_en, style_sd, n_tokens)
            durations = kmodel.predict_durations(params, cfg_, d, n_tokens, speed)
            t_en = kmodel.text_encode(params, cfg_, tokens, n_tokens)
            return d, durations, t_en

        self._stage1 = stage1

    def _stage2(self, frames_pad: int):
        if frames_pad in self._stage2_fns:
            return self._stage2_fns[frames_pad]
        cfg = self.cfg

        @jax.jit
        def stage2(params, d, t_en, durations, style_sd, style_dec,
                   total_frames, key):
            align = kmodel.alignment_matrix(durations, frames_pad)  # (T, F)
            en = jnp.einsum("btc,tf->bfc", d, align)
            f0, n_curve, _ = kmodel.f0n_predict(params, cfg, en, style_sd,
                                                total_frames)
            asr = jnp.einsum("btc,tf->bfc", t_en, align)
            audio = kmodel.decode(params, cfg, asr, f0, n_curve, style_dec,
                                  total_frames, key)
            return audio[0]

        self._stage2_fns[frames_pad] = stage2
        return stage2

    def synthesize(self, token_ids: list[int], voice_style: np.ndarray,
                   speed: float = 1.0, seed: int = 0) -> np.ndarray:
        """token_ids: phoneme ids (≤510). voice_style: (510, 1, 256) pack.
        Returns float32 audio at 24 kHz."""
        cfg = self.cfg
        ids = [0] + list(token_ids[: cfg.max_tokens]) + [0]
        n = len(ids)
        tokens = np.zeros((1, TOKEN_PAD), np.int32)
        tokens[0, :n] = ids

        # style vector indexed by token count (KokoroTTS.swift:296-300);
        # first style_dim channels condition the decoder, the rest prosody
        sd = cfg.style_dim
        ref_s = voice_style[min(len(token_ids) - 1, voice_style.shape[0] - 1)]
        style_sd = jnp.asarray(ref_s[:, sd: 2 * sd], jnp.float32)
        style_dec = jnp.asarray(ref_s[:, :sd], jnp.float32)

        d, durations, t_en = self._stage1(
            self.params, jnp.asarray(tokens), jnp.int32(n), style_sd,
            jnp.float32(speed))
        dur_host = np.asarray(durations[0])
        total = int(dur_host.sum())
        frames_pad = max(FRAME_BUCKET,
                         -(-total // FRAME_BUCKET) * FRAME_BUCKET)

        stage2 = self._stage2(frames_pad)
        audio = stage2(self.params, d, t_en, durations, style_sd, style_dec,
                       jnp.int32(total), jax.random.PRNGKey(seed))
        samples = total * self.cfg.samples_per_frame
        return np.asarray(audio[:samples], np.float32)
