"""VoiceEncoder: 3-layer LSTM speaker embedder over sliding mel partials.

Reference: package/TTS/Chatterbox/VoiceEncoder/VoiceEncoder.swift:52-160 +
ChatterboxLSTM.swift + VoiceEncoderMelspec.swift — 40-mel log spectrogram
partials (160 frames, hop 80), final LSTM hidden state → 256-d projection,
ReLU, L2 norm, mean over partials, L2 norm again.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from tpu_audio.nn import layers
from tpu_audio.ops import mel_filters, stft, windows


@dataclass(frozen=True)
class VoiceEncConfig:
    num_mels: int = 40
    sample_rate: int = 16000
    n_fft: int = 400
    hop: int = 160
    ve_hidden_size: int = 256
    speaker_embed_size: int = 256
    partial_frames: int = 160
    partial_hop: int = 80


def init_params(key, cfg: VoiceEncConfig, dtype=jnp.float32) -> dict:
    ks = iter(jax.random.split(key, 8))

    def lstm_layer(in_size):
        k1, k2 = jax.random.split(next(ks))
        s = 1.0 / np.sqrt(cfg.ve_hidden_size)
        return {
            "wx": jax.random.uniform(k1, (4 * cfg.ve_hidden_size, in_size),
                                     dtype, -s, s),
            "wh": jax.random.uniform(k2, (4 * cfg.ve_hidden_size,
                                          cfg.ve_hidden_size), dtype, -s, s),
            "bias_ih": jnp.zeros((4 * cfg.ve_hidden_size,), dtype),
            "bias_hh": jnp.zeros((4 * cfg.ve_hidden_size,), dtype),
        }

    return {
        "lstm": {"0": lstm_layer(cfg.num_mels),
                 "1": lstm_layer(cfg.ve_hidden_size),
                 "2": lstm_layer(cfg.ve_hidden_size)},
        "proj": layers.init_linear(next(ks), cfg.ve_hidden_size,
                                   cfg.speaker_embed_size, True, dtype),
    }


def melspec(audio: jax.Array, cfg: VoiceEncConfig) -> jax.Array:
    """VoiceEncoder's own mel front-end (40 mels, log, normalized)."""
    power = stft.stft_power(audio, windows.hann(cfg.n_fft, periodic=True),
                            cfg.n_fft, cfg.hop)
    fb = jnp.asarray(mel_filters.slaney(cfg.sample_rate, cfg.n_fft,
                                        cfg.num_mels))
    mel = jnp.matmul(power, fb.T)
    return jnp.log(jnp.maximum(mel, 1e-10))


def _lstm_final_h(p, x):
    from tpu_audio.nn import lstm as lstm_mod

    h = x
    for i in range(3):
        h = lstm_mod.lstm(p[str(i)], h)
    return h[:, -1]  # final hidden of last layer


def embed_partials(params, cfg: VoiceEncConfig, mels: jax.Array) -> jax.Array:
    """(B, partial_frames, num_mels) partials → L2-normed (B, E)."""
    h = _lstm_final_h(params["lstm"], mels)
    e = jax.nn.relu(layers.linear(params["proj"], h))
    return e / jnp.maximum(jnp.linalg.norm(e, axis=-1, keepdims=True), 1e-8)


def embed_utterance(params, cfg: VoiceEncConfig, audio: np.ndarray) -> jax.Array:
    """16 kHz waveform → speaker embedding (E,) via sliding partials."""
    mel = np.asarray(melspec(jnp.asarray(audio, jnp.float32), cfg))
    t = mel.shape[0]
    if t < cfg.partial_frames:
        mel = np.pad(mel, ((0, cfg.partial_frames - t), (0, 0)))
        t = cfg.partial_frames
    starts = list(range(0, max(1, t - cfg.partial_frames + 1),
                        cfg.partial_hop))
    partials = np.stack([mel[s: s + cfg.partial_frames] for s in starts])
    embs = embed_partials(params, cfg, jnp.asarray(partials))
    mean = jnp.mean(embs, axis=0)
    return mean / jnp.maximum(jnp.linalg.norm(mean), 1e-8)
