"""Whisper fine-tuning step (capability the reference lacks entirely —
it is inference-only, SURVEY §5.4). Cross-entropy over decoder tokens with
teacher forcing, AdamW, pjit-ready: params follow parallel.shardings
(megatron TP), batches shard over dp.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from tpu_audio.models.whisper import model as wmodel
from tpu_audio.models.whisper.config import WhisperConfig


def loss_fn(params, cfg: WhisperConfig, mel, tokens_in, tokens_out, mask):
    """mel (B, 3000, n_mels); tokens (B, T); mask (B, T) 1 for real tokens."""
    feats = wmodel.encode(params, cfg, mel)
    logits, _ = wmodel.forward_cross_qk(params, cfg, tokens_in, feats)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32))
    nll = -jnp.take_along_axis(logp, tokens_out[..., None], axis=-1)[..., 0]
    return jnp.sum(nll * mask) / jnp.maximum(jnp.sum(mask), 1)


def make_train_step(cfg: WhisperConfig, optimizer=None):
    optimizer = optimizer or optax.adamw(1e-5, weight_decay=0.01)

    def init_opt(params):
        return optimizer.init(params)

    def train_step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(
            params, cfg, batch["mel"], batch["tokens_in"],
            batch["tokens_out"], batch["mask"])
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    return init_opt, train_step
