"""S3Gen: speech tokens → waveform (Chatterbox / CosyVoice family).

Reference: package/Codec/S3Gen/S3Gen.swift:67-343 + Flow.swift:75-154 —
S3Token2Mel: token embedding + x-vector-conditioned UpsampleConformer →
CFG flow matching over the causal U-Net estimator, with the reference
speaker's tokens/mel as prompt scaffold; S3Token2Wav adds the HiFT vocoder
and a 20 ms fade-in against prompt bleed.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp

from tpu_audio.codecs.s3gen import campplus, conformer, flow, hift
from tpu_audio.nn import layers

S3GEN_SR = 24000
TOKEN_RATE = 25  # speech tokens per second
MEL_RATE = 50  # flow output frames per second


@dataclass(frozen=True)
class S3GenConfig:
    vocab_size: int = 6561
    input_dim: int = 512
    spk_dim: int = 192
    mel_dim: int = 80
    conformer: conformer.ConformerConfig = field(
        default_factory=conformer.ConformerConfig)
    estimator: flow.EstimatorConfig = field(
        default_factory=flow.EstimatorConfig)
    cfm: flow.CFMConfig = field(default_factory=flow.CFMConfig)
    hift: hift.HiFTConfig = field(default_factory=hift.HiFTConfig)
    campplus: campplus.CAMPPlusConfig = field(
        default_factory=campplus.CAMPPlusConfig)
    pre_lookahead_len: int = 3
    token_mel_ratio: int = 2


def init_params(key, cfg: S3GenConfig, dtype=jnp.float32) -> dict:
    ks = jax.random.split(key, 8)
    return {
        "flow": {
            "input_embedding": layers.init_embedding(
                ks[0], cfg.vocab_size, cfg.input_dim, dtype),
            "spk_embed_affine_layer": layers.init_linear(
                ks[1], cfg.spk_dim, cfg.mel_dim, True, dtype),
            "encoder": conformer.init_params(ks[2], cfg.conformer, dtype),
            "encoder_proj": layers.init_linear(
                ks[3], cfg.conformer.output_size, cfg.mel_dim, True, dtype),
            "decoder_estimator": flow.init_estimator(ks[4], cfg.estimator,
                                                     dtype),
        },
        "mel2wav": hift.init_params(ks[5], cfg.hift, dtype),
        "speaker_encoder": campplus.init_params(ks[6], cfg.campplus, dtype),
    }


def flow_inference(params, cfg: S3GenConfig, tokens: jax.Array,
                   token_len, prompt_tokens: jax.Array, prompt_len,
                   prompt_mel: jax.Array, prompt_mel_len, embedding: jax.Array,
                   key, streaming: bool = False,
                   n_timesteps: int | None = None) -> tuple[jax.Array, jax.Array]:
    """CausalMaskedDiffWithXvec.inference (Flow.swift:75-154):
    concat prompt+target tokens → conformer (2× upsample) → project to mel
    dim → CFM with prompt-mel scaffold → drop the prompt frames.

    tokens (1, T), prompt_tokens (1, P), prompt_mel (1, P*2, 80),
    embedding (1, 192). Returns (mel (1, T*2, 80), valid frames)."""
    fp = params["flow"]
    # L2-normalize x-vector then affine to mel dim (Flow.swift prompt conds)
    emb = embedding / jnp.maximum(
        jnp.linalg.norm(embedding, axis=-1, keepdims=True), 1e-8)
    spks = layers.linear(fp["spk_embed_affine_layer"], emb)

    full_tokens = jnp.concatenate([prompt_tokens, tokens], axis=1)
    full_len = prompt_len + token_len
    x = layers.embedding(fp["input_embedding"],
                         jnp.clip(full_tokens, 0, cfg.vocab_size - 1))
    h, h_len = conformer.forward(fp["encoder"], cfg.conformer, x, full_len,
                                 streaming=streaming)
    mu = layers.linear(fp["encoder_proj"], h)

    t2 = mu.shape[1]
    # conditioning scaffold: prompt mel in the prompt region, zeros after
    cond = jnp.zeros((1, t2, cfg.mel_dim), mu.dtype)
    pm = prompt_mel[:, : min(prompt_mel.shape[1], t2)]
    cond = jax.lax.dynamic_update_slice(cond, pm.astype(mu.dtype), (0, 0, 0))
    frame_idx = jnp.arange(t2)
    cond = jnp.where((frame_idx < prompt_mel_len)[None, :, None], cond, 0)

    mel = flow.cfm_inference(fp["decoder_estimator"], cfg.estimator, cfg.cfm,
                             mu, h_len, spks, cond, key, streaming=streaming,
                             n_timesteps=n_timesteps)
    start = prompt_len[0] * cfg.token_mel_ratio
    valid = token_len[0] * cfg.token_mel_ratio
    return mel, (start, valid)


def token2wav(params, cfg: S3GenConfig, tokens, token_len, prompt_tokens,
              prompt_len, prompt_mel, prompt_mel_len, embedding, key,
              streaming: bool = False, n_timesteps: int | None = None):
    """Full S3Token2Wav pass. Returns (audio (1, samples), start, valid)."""
    k1, k2 = jax.random.split(key)
    mel, (start, valid) = flow_inference(
        params, cfg, tokens, token_len, prompt_tokens, prompt_len,
        prompt_mel, prompt_mel_len, embedding, k1, streaming, n_timesteps)
    audio, _ = hift.generate(params["mel2wav"], cfg.hift, mel, k2)
    sample_start = start * cfg.hift.upsample_scale
    sample_valid = valid * cfg.hift.upsample_scale
    return audio, sample_start, sample_valid


def fade_in(audio: jax.Array, sr: int = S3GEN_SR) -> jax.Array:
    """20 ms cosine fade-in against prompt bleed (S3Gen.swift:259-262)."""
    n_trim = sr // 50
    fade = (jnp.cos(jnp.linspace(jnp.pi, 0.0, n_trim)) + 1) / 2
    ramp = jnp.concatenate([jnp.zeros(n_trim), fade,
                            jnp.ones(max(0, audio.shape[-1] - 2 * n_trim))])
    return audio * ramp[: audio.shape[-1]]


def embed_ref_mel(params, cfg: S3GenConfig, ref_fbank: jax.Array) -> jax.Array:
    """CAMPPlus x-vector from mean-normalized Kaldi fbank (B, T, 80)."""
    return campplus.embed(params["speaker_encoder"], cfg.campplus, ref_fbank)
