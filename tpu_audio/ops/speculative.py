"""Speculative decoding: draft cheap tokens, verify in one target pass.

Single-stream LLM decode on TPU is HBM-bandwidth-bound — every generated
token streams the full weight set from HBM (W8A8 3B runs at 83% of the
bandwidth roofline, docs/BENCHMARKS.md), so the only remaining single-stream
latency lever is algorithmic: emit MORE than one token per weight pass.
This module verifies `gamma` drafted tokens in ONE chunked target forward
(T = gamma+1 costs the same HBM traffic as T = 1) using the
distribution-preserving rejection-sampling scheme of speculative sampling:

  accept draft x_i with prob min(1, p_i(x_i)/q_i(x_i)); on the first
  rejection sample from normalize(max(p_i - q_i, 0)); on full acceptance
  sample a bonus token from p_gamma.

The marginal distribution of every emitted token is EXACTLY the target
sampler's distribution — including the warped pipeline (repetition penalty,
temperature, top-k/top-p/min-p) and CosyVoice's repetition-aware resample,
both evaluated via ops/sampling.warped_probs with the correct speculated
recent-token windows.

Two draft sources:
  - a smaller same-vocab model (e.g. a 1B Llama drafting for the 3B
    Orpheus), run autoregressively with its own KV cache;
  - "prompt-lookup" n-gram self-drafting (no second model): propose the
    continuation of the most recent occurrence of the last bigram in the
    token history — effective on token streams with repetitive structure
    (speech-code frames), free otherwise (a missed iteration still emits
    one exactly-sampled token).

The whole loop — draft, verify, accept, KV-cache position rewind — is one
compiled `lax.while_loop`; no host round-trip per iteration.  Cache rewind
is free: caches are static rings with a scalar `pos`, so un-accepting
tokens is just carrying a smaller `pos` (stale slots are overwritten and
masked by the causal decode mask).

The reference has no equivalent; its latency engineering is host/GPU
double-buffering (package/TTS/Orpheus/TTSEngine/OrpheusTTS.swift:259-348).
Restriction: batch size 1 (per-row variable cache advance is incompatible
with the shared scalar cache position; batched serving uses
models/orpheus/model.py generate_batch instead).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Callable

import jax
import jax.numpy as jnp

from tpu_audio.ops.sampling import (SamplerConfig, apply_repetition_penalty,
                                    sample, update_recent, warped_probs)


@dataclass
class SpecResult:
    tokens: jax.Array     # (1, max_new + gamma + 1) ids, padded with pad_id
    lengths: jax.Array    # (1,) valid token count (exclusive of EOS, <= max_new)
    last_state: object    # final target cache
    iterations: jax.Array  # int32: speculative iterations run
    drafted: jax.Array     # int32: total tokens drafted
    accepted: jax.Array    # int32: total drafted tokens accepted
    # carried sampling state for spanned decode (chunked token-granularity
    # streaming runs the loop as a chain of short compiled spans; see
    # models/cosyvoice2/lm.py CosyLMStreamer speculative mode)
    emitted: jax.Array | None = None       # int32: tokens written, incl. overshoot
    finished: jax.Array | None = None      # bool: EOS reached
    last: jax.Array | None = None          # (1,) last emitted token
    second_last: jax.Array | None = None   # (1,) token before `last`
    recent: jax.Array | None = None        # (1, W) recent-token ring
    history: jax.Array | None = None       # (1, H) n-gram history incl. emits
    history_len: jax.Array | None = None   # int32


def _with_pos(cache, pos):
    return dataclasses.replace(cache, pos=pos)


def propose_ngram(hist: jax.Array, hist_len: jax.Array,
                  second_last: jax.Array, last: jax.Array,
                  gamma: int) -> jax.Array:
    """Prompt-lookup proposal: continuation of the most recent occurrence
    of (second_last, last) in the history; 1-gram fallback on `last`.
    hist (1, H) with valid tokens at [0, hist_len). Returns (1, gamma)."""
    h = hist[0]
    n = h.shape[0]
    idx = jnp.arange(n)
    prev = jnp.concatenate([jnp.full((1,), -1, h.dtype), h[:-1]])
    # only match positions that have a continuation inside the history
    in_range = (idx >= 1) & (idx < hist_len - 1)
    m2 = (h == last[0]) & (prev == second_last[0]) & in_range
    m1 = (h == last[0]) & (idx < hist_len - 1)
    j2 = jnp.max(jnp.where(m2, idx, -1))
    j1 = jnp.max(jnp.where(m1, idx, -1))
    j = jnp.where(j2 >= 0, j2, jnp.where(j1 >= 0, j1, hist_len - 1))
    return jax.lax.dynamic_slice(h, (j + 1,), (gamma,))[None]


def speculative_decode_loop(
    key: jax.Array,
    target_step: Callable,  # (tokens (1,T), cache) -> (logits (1,T,V) f32, cache)
    target_cache,
    first_token: jax.Array,   # (1,) token sampled from the target prefill
    second_last: jax.Array,   # (1,) last real prompt token
    max_new_tokens: int,
    gamma: int,
    eos_ids: tuple[int, ...],
    sampler: SamplerConfig = SamplerConfig(),
    pad_id: int = 0,
    draft_step: Callable | None = None,  # same signature; None => n-gram
    draft_cache=None,          # draft KV cache with pos == target.pos - 1
    history: jax.Array | None = None,   # (1, H) incl. prompt (n-gram mode)
    history_len: jax.Array | None = None,
    logit_processor: Callable | None = None,  # (logits, abs_idx, recent)
    recent0: jax.Array | None = None,   # (1, W) resume a prior span's window
    append_first_to_history: bool = True,  # False when resuming (first is
                                           # already the history's tail)
) -> SpecResult:
    """Generate up to max_new_tokens after `first_token` (first_token itself
    is NOT written to the output buffer, matching ops/decoding.decode_loop).

    Cache invariants at each iteration start (positions, not counts, of the
    next unwritten slot): target.pos = P (KV holds everything before
    `last`); draft.pos = P - 1 (everything before `second_last`'s slot, so
    the first 2-token draft step re-deposits second_last's KV identically
    and then writes `last`'s)."""
    assert first_token.shape[0] == 1, "speculative decode is single-stream"
    ngram = draft_step is None
    greedy = sampler.temperature == 0.0
    eos = jnp.asarray(eos_ids, jnp.int32).reshape(1, -1)
    window = max(sampler.repetition_window, sampler.ras_window, 1)
    buf_w = max_new_tokens + gamma + 1

    if history is None:
        history = jnp.zeros((1, 8), jnp.int32)
        history_len = jnp.zeros((), jnp.int32)
    if draft_cache is None:
        draft_cache = jnp.zeros((), jnp.int32)  # dummy carry leaf

    def probs_of(logits_1v, recent, abs_idx):
        """Warped sampling distribution (1, V) for one position.
        abs_idx: 0-based index of the token being sampled within the
        generated stream (for step-dependent logit processors, e.g. the
        CosyVoice min-length EOS mask)."""
        if logit_processor is not None:
            logits_1v = logit_processor(logits_1v, abs_idx, recent)
        if greedy:
            lg = logits_1v
            if sampler.repetition_penalty != 1.0:
                lg = apply_repetition_penalty(lg, recent,
                                              sampler.repetition_penalty)
            return jax.nn.one_hot(jnp.argmax(lg, axis=-1), lg.shape[-1],
                                  dtype=jnp.float32)
        return warped_probs(logits_1v, sampler, recent)

    def body(carry):
        (i_out, buf, last, second_last, t_cache, d_cache, recent, finished,
         key, hist, hist_len, iters, n_drafted, n_accepted) = carry

        # ---- propose gamma tokens + the recent-window chain they imply
        recents = [recent]
        q_rows = []
        if ngram:
            x = propose_ngram(hist, hist_len, second_last, last, gamma)
            for g in range(gamma):
                recents.append(update_recent(recents[-1], x[:, g]))
        else:
            toks = []
            d_in = jnp.stack([second_last, last], axis=1)  # (1, 2)
            for g in range(gamma):
                lg, d_cache = draft_step(d_in, d_cache)
                lg = lg[:, -1].astype(jnp.float32)
                if logit_processor is not None:
                    lg = logit_processor(lg, i_out + g, recents[-1])
                key, sub = jax.random.split(key)
                tok = sample(sub, lg, sampler, recents[-1]).astype(jnp.int32)
                toks.append(tok)
                if not greedy:
                    q_rows.append(warped_probs(lg, sampler, recents[-1]))
                recents.append(update_recent(recents[-1], tok))
                d_in = tok[:, None]
            x = jnp.stack(toks, axis=1)  # (1, gamma)

        # ---- one chunked target forward over [last, x_0..x_{gamma-1}]
        t_in = jnp.concatenate([last[:, None], x], axis=1)  # (1, gamma+1)
        t_logits, t_cache = target_step(t_in, t_cache)
        v = t_logits.shape[-1]
        p_rows = [probs_of(t_logits[:, i].astype(jnp.float32), recents[i],
                           i_out + i)
                  for i in range(gamma + 1)]
        p_stack = jnp.concatenate(p_rows, axis=0)  # (gamma+1, V)

        if ngram or greedy:
            q_stack = jax.nn.one_hot(x[0], v, dtype=jnp.float32)
        else:
            q_stack = jnp.concatenate(q_rows, axis=0)  # (gamma, V)
        q_stack = jnp.concatenate(
            [q_stack, jnp.zeros((1, v), jnp.float32)], axis=0)

        # ---- vectorized leading-accept count
        p_at = jnp.take_along_axis(p_stack[:gamma], x[0][:, None], 1)[:, 0]
        q_at = jnp.take_along_axis(q_stack[:gamma], x[0][:, None], 1)[:, 0]
        key, ku = jax.random.split(key)
        u = jax.random.uniform(ku, (gamma,))
        acc = (u * q_at < p_at).astype(jnp.int32)
        n_acc = jnp.sum(jnp.cumprod(acc))  # leading run of accepts

        # ---- the (n_acc+1)-th token: residual on rejection, bonus on full
        # acceptance — unified because q_stack[gamma] = 0 makes the
        # "residual" at the bonus position exactly p_gamma.
        p_sel = jax.lax.dynamic_index_in_dim(p_stack, n_acc, 0, False)
        q_sel = jax.lax.dynamic_index_in_dim(q_stack, n_acc, 0, False)
        res = jnp.maximum(p_sel - q_sel, 0.0)
        key, ke = jax.random.split(key)
        extra = jax.random.categorical(
            ke, jnp.where(res > 0, jnp.log(jnp.maximum(res, 1e-38)),
                          -jnp.inf)[None])[0].astype(jnp.int32)

        # ---- emitted block: x_0..x_{n_acc-1}, extra, pad...
        bidx = jnp.arange(gamma + 1)
        x_row = jnp.concatenate([x[0], jnp.zeros((1,), jnp.int32)])
        block = jnp.where(bidx < n_acc, x_row,
                          jnp.where(bidx == n_acc, extra, pad_id))
        emitted_eos = jnp.any((block[None] == eos.T) & (bidx <= n_acc)[None])
        finished = finished | emitted_eos

        buf = jax.lax.dynamic_update_slice(buf, block[None], (0, i_out))
        n_emit = n_acc + 1

        # ---- roll state forward to the accepted prefix
        x_ext = jnp.concatenate([last, x[0]])  # (gamma+1,)
        new_second_last = x_ext[n_acc][None]
        new_last = extra[None]
        recents_stack = jnp.stack(recents)  # (gamma+1, 1, W)
        new_recent = update_recent(
            jax.lax.dynamic_index_in_dim(recents_stack, n_acc, 0, False),
            new_last)
        p_t = t_cache.pos - (gamma + 1)  # position before this verify
        t_cache = _with_pos(t_cache, p_t + n_acc + 1)
        if not ngram:
            d_cache = _with_pos(d_cache, p_t + n_acc)
        if ngram:  # model mode carries the dummy history untouched
            hist = jax.lax.dynamic_update_slice(hist, block[None],
                                                (0, hist_len))
            hist_len = hist_len + n_emit

        return (i_out + n_emit, buf, new_last, new_second_last, t_cache,
                d_cache, new_recent, finished, key, hist, hist_len,
                iters + 1, n_drafted + gamma, n_accepted + n_acc)

    def cond(carry):
        i_out, _, _, _, _, _, _, finished, *_ = carry
        return (i_out < max_new_tokens) & ~finished

    if recent0 is None:
        recent0 = update_recent(jnp.full((1, window), -1, jnp.int32),
                                first_token.astype(jnp.int32))
    if append_first_to_history:
        hist0 = jax.lax.dynamic_update_slice(
            history, first_token[None].astype(jnp.int32), (0, history_len))
        hlen0 = history_len + 1
    else:
        hist0, hlen0 = history, history_len
    carry = (jnp.zeros((), jnp.int32),
             jnp.full((1, buf_w), pad_id, jnp.int32),
             first_token.astype(jnp.int32), second_last.astype(jnp.int32),
             target_cache, draft_cache, recent0,
             jnp.any(first_token[:, None] == eos, axis=-1)[0],
             key, hist0, hlen0,
             jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32),
             jnp.zeros((), jnp.int32))
    (i_out, buf, last, second_last_f, t_cache, _, recent_f, finished_f, _,
     hist_f, hlen_f, iters, n_drafted, n_accepted) = jax.lax.while_loop(
         cond, body, carry)

    eos_hit = jnp.any(buf[:, :, None] == eos[None], axis=-1)
    first_eos = jnp.argmax(eos_hit, axis=-1)
    lengths = jnp.where(jnp.any(eos_hit, axis=-1), first_eos, i_out)
    lengths = jnp.minimum(lengths, max_new_tokens)
    return SpecResult(tokens=buf, lengths=lengths, last_state=t_cache,
                      iterations=iters, drafted=n_drafted,
                      accepted=n_accepted, emitted=i_out,
                      finished=finished_f, last=last,
                      second_last=second_last_f, recent=recent_f,
                      history=hist_f, history_len=hlen_f)
