"""Generic on-device autoregressive decode loop.

The reference pipelines decode on the host with double-buffered asyncEval
(package/STT/FunASR/FunASRSTT.swift:244-269 and equivalents in Orpheus/T3/
Qwen2LM); on TPU the whole loop — forward, logit processing, sampling, stop
test — is a single compiled lax.while_loop with device-side state, so there
is no per-token host round-trip at all.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

import jax
import jax.numpy as jnp

from tpu_audio.ops.sampling import SamplerConfig, sample, update_recent


@dataclass
class DecodeResult:
    tokens: jax.Array  # (B, max_new) generated ids, padded with pad_id
    lengths: jax.Array  # (B,) number of valid tokens (excluding EOS)
    last_state: object  # final model state (e.g. KV cache)
    # carried sampling state, so a long decode can run as a chain of short
    # compiled spans with host stop-checks between them (in-loop
    # cancellation — ref T3.swift:250-253 checks inside the hot loop)
    recent: jax.Array | None = None  # (B, W) recent-token ring
    finished: jax.Array | None = None  # (B,) EOS reached
    last_token: jax.Array | None = None  # (B,) last emitted token


def decode_loop(
    key: jax.Array,
    step_fn: Callable,  # (last_tokens (B,1), state) -> (logits (B,V), state)
    state,
    first_token: jax.Array,  # (B,) the token that seeds generation (e.g. BOS)
    max_new_tokens: int,
    eos_ids: tuple[int, ...] | jax.Array,
    sampler: SamplerConfig = SamplerConfig(),
    logit_processor: Callable | None = None,  # (logits, step_idx, recent) -> logits
    token_postprocess: Callable | None = None,  # (token, step_idx) -> token
    min_tokens: int = 0,
    pad_id: int = 0,
    recent0: jax.Array | None = None,
    finished0: jax.Array | None = None,
    early_exit: bool = True,
) -> DecodeResult:
    """Sample up to max_new_tokens, stopping early when every batch row hit
    an EOS id. All shapes static; early exit via lax.while_loop.

    recent0/finished0 resume a previous span's sampling state (spanned
    decode for host-side cancellation).

    early_exit=False always runs all max_new_tokens steps (finished rows
    emit pad). Continuous batching needs this: the shared cache position
    must advance by exactly the span length so admission offsets stay
    aligned and no stale KV gap is left unwritten."""
    b = first_token.shape[0]
    eos = jnp.asarray(eos_ids, dtype=jnp.int32).reshape(1, -1)
    window = max(sampler.repetition_window, sampler.ras_window, 1)

    tokens_buf = jnp.full((b, max_new_tokens), pad_id, dtype=jnp.int32)
    if recent0 is None:
        # seed the repetition window with first_token so the plain and
        # spanned decode paths agree (the spanned path adds it explicitly)
        recent0 = update_recent(jnp.full((b, window), -1, dtype=jnp.int32),
                                first_token.astype(jnp.int32))
    if finished0 is None:
        finished0 = jnp.zeros((b,), dtype=jnp.bool_)

    def cond(carry):
        i, _, _, _, finished, _, _ = carry
        if not early_exit:
            return i < max_new_tokens
        return (i < max_new_tokens) & ~jnp.all(finished)

    def body(carry):
        i, tokens_buf, last, state, finished, recent, key = carry
        logits, state = step_fn(last[:, None], state)
        if logit_processor is not None:
            logits = logit_processor(logits, i, recent)
        if min_tokens > 0:
            below_min = i < min_tokens
            logits = jnp.where(
                below_min & jnp.isin(jnp.arange(logits.shape[-1]), eos[0])[None, :],
                -1e30, logits)
        key, sub = jax.random.split(key)
        tok = sample(sub, logits, sampler, recent).astype(jnp.int32)
        if token_postprocess is not None:
            tok = token_postprocess(tok, i)
        is_eos = jnp.any(tok[:, None] == eos, axis=-1)
        tok = jnp.where(finished, pad_id, tok)
        tokens_buf = jax.lax.dynamic_update_slice(tokens_buf, tok[:, None], (0, i))
        recent = update_recent(recent, jnp.where(is_eos | finished, -1, tok))
        finished = finished | is_eos
        return (i + 1, tokens_buf, tok, state, finished, recent, key)

    carry = (jnp.zeros((), jnp.int32), tokens_buf, first_token.astype(jnp.int32),
             state, finished0, recent0, key)
    (i, tokens_buf, last, state, finished, recent, _) = jax.lax.while_loop(
        cond, body, carry)

    eos_hit = jnp.any(tokens_buf[:, :, None] == eos[None], axis=-1)
    first_eos = jnp.argmax(eos_hit, axis=-1)
    lengths = jnp.where(jnp.any(eos_hit, axis=-1), first_eos,
                        jnp.minimum(i, max_new_tokens))
    return DecodeResult(tokens=tokens_buf, lengths=lengths, last_state=state,
                        recent=recent, finished=finished, last_token=last)
