"""Chatterbox-Turbo token-chunk streaming synthesis.

Reuses the CosyVoice2 streaming discipline (models/cosyvoice2/streaming.py:
full-window flow recompute under chunk-causal masks + O(1) incremental
HiFT) with the Turbo flow solve swapped in: meanflow few-step Euler WITHOUT
CFG (CBTFlowMatching.swift:51-74) over the S3Gen U-Net estimator. The
silence token (S3GenTurbo.swift:19, id 4299) is filtered from the incoming
token stream exactly as the one-shot _token2wav does.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpu_audio.codecs.s3gen import conformer
from tpu_audio.codecs.s3gen import flow as s3flow
from tpu_audio.models.chatterbox_turbo.model import (SILENCE_TOKEN,
                                                     meanflow_inference)
from tpu_audio.models.cosyvoice2.streaming import CV2Synthesizer
from tpu_audio.nn import layers


class TurboSynthesizer(CV2Synthesizer):
    """CV2Synthesizer with the no-CFG meanflow window in place of the CFM
    solve. `params` is the Turbo s3gen tree ({"flow": ..., "mel2wav": ...})."""

    def __init__(self, params, cfg, n_timesteps: int = 2):
        super().__init__(params, cfg)
        self.n_timesteps = n_timesteps

    def _flow_fn(self, t_pad: int, p_len: int, streaming: bool):
        key_ = (t_pad, p_len, streaming)
        if key_ not in self._flow_fns:
            cfg = self.cfg
            steps = self.n_timesteps

            @jax.jit
            def fn(params, tokens, tl, pt, pl, pm, pml, emb, key):
                fp = params["flow"]
                e = emb / jnp.maximum(
                    jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-8)
                spks = layers.linear(fp["spk_embed_affine_layer"], e)
                full = jnp.concatenate([pt, tokens], axis=1)
                full_len = pl + tl
                x = layers.embedding(fp["input_embedding"],
                                     jnp.clip(full, 0, cfg.vocab_size - 1))
                h, h_len = conformer.forward(fp["encoder"], cfg.conformer, x,
                                             full_len, streaming=streaming)
                mu = layers.linear(fp["encoder_proj"], h)
                t2 = mu.shape[1]
                cond = jnp.zeros((1, t2, cfg.mel_dim), mu.dtype)
                pmx = pm[:, : min(pm.shape[1], t2)]
                cond = jax.lax.dynamic_update_slice(
                    cond, pmx.astype(mu.dtype), (0, 0, 0))
                cond = jnp.where((jnp.arange(t2) < pml[0])[None, :, None],
                                 cond, 0)

                def est(x_, ml, mu_, t, spks_, cond_, stream, r=None):
                    # meanflow (t, r) conditioning when the checkpoint
                    # carries the mixer (CBTDecoder.swift:617-625)
                    if "time_embed_mixer" not in fp["decoder_estimator"]:
                        r = None
                    return s3flow.estimator_forward(
                        fp["decoder_estimator"], cfg.estimator, x_, ml, mu_,
                        t, spks_, cond_, stream, r=r)

                return meanflow_inference(est, mu, h_len, spks, cond, key,
                                          n_timesteps=steps,
                                          streaming=streaming)

            self._flow_fns[key_] = fn
        return self._flow_fns[key_]


def drop_silence(token_chunks):
    """Strip SILENCE_TOKEN from each incoming LM chunk (the one-shot path
    filters before flow, engine._token2wav)."""
    for chunk in token_chunks:
        kept = [t for t in chunk if t != SILENCE_TOKEN]
        if kept:
            yield kept
