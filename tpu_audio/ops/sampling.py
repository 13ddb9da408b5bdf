"""Traced, shape-static sampling ops.

Every per-step trick the reference does in Swift host code (temperature /
top-k / top-p / min-p, windowed repetition penalty, repetition-aware
sampling, EOS rejection — e.g. package/TTS/OuteTTS/OuteTTS.swift:28-38,
package/TTS/Orpheus/TTSEngine/OrpheusTTS.swift:259-348,
package/TTS/CosyVoice2/LLM/Qwen2LM.swift:433-510) is re-expressed here as
pure jnp ops so it runs inside the compiled token loop — no host round-trip
per token.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

NEG_INF = -1e30


@dataclass(frozen=True)
class SamplerConfig:
    temperature: float = 1.0
    top_k: int = 0  # 0 = off
    top_p: float = 1.0
    min_p: float = 0.0
    repetition_penalty: float = 1.0
    repetition_window: int = 64
    # repetition-aware sampling (CosyVoice RAS): if the winning token occurred
    # more than `ras_max_repeats` times in the last `ras_window` tokens,
    # resample from the tail of the distribution.
    ras: bool = False
    ras_window: int = 10
    ras_max_repeats: int = 2


# vocab size above which the TPU approximate top-k unit replaces the exact
# full sort (recall 0.99 — indistinguishable for sampling, ~1 ms/step
# cheaper at 128k-token vocabs)
APPROX_TOPK_MIN_V = 8192


def _topk_values(logits: jax.Array, k: int) -> jax.Array:
    """Descending top-k values (B, k); approximate on large vocabs."""
    if logits.shape[-1] >= APPROX_TOPK_MIN_V:
        try:
            vals, _ = jax.lax.approx_max_k(logits, k, recall_target=0.99)
            return vals
        except Exception:
            pass
    return jax.lax.top_k(logits, k)[0]


def apply_top_k(logits: jax.Array, k: int) -> jax.Array:
    if k <= 0 or k >= logits.shape[-1]:
        return logits
    kth = _topk_values(logits, k)[..., -1:]
    return jnp.where(logits < kth, NEG_INF, logits)


# top-p head size for the large-vocab fast path: the nucleus cutoff is
# found within the top TOPP_HEAD values (exact as long as the true nucleus
# is smaller than the head, which holds overwhelmingly at p ≤ 0.95 on
# peaked LM distributions; otherwise truncation clips the extreme tail)
TOPP_HEAD = 256


def apply_top_p(logits: jax.Array, p: float) -> jax.Array:
    if p >= 1.0:
        return logits
    v = logits.shape[-1]
    if v >= APPROX_TOPK_MIN_V:
        # O(V) instead of O(V log V): head values via the TPU approx-top-k
        # unit; probabilities against the FULL softmax denominator
        vals = _topk_values(logits, min(TOPP_HEAD, v))  # descending
        lse = jax.nn.logsumexp(logits, axis=-1, keepdims=True)
        probs = jnp.exp(vals - lse)
        cum = jnp.cumsum(probs, axis=-1)
        keep = (cum - probs) < p
        kth = jnp.min(jnp.where(keep, vals, jnp.inf), axis=-1, keepdims=True)
        return jnp.where(logits < kth, NEG_INF, logits)
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # keep tokens whose cumulative mass *before* them is < p (always >= 1 token)
    keep_sorted = (cum - probs) < p
    kth = jnp.min(jnp.where(keep_sorted, sorted_logits, jnp.inf), axis=-1, keepdims=True)
    return jnp.where(logits < kth, NEG_INF, logits)


def apply_min_p(logits: jax.Array, min_p: float) -> jax.Array:
    if min_p <= 0.0:
        return logits
    probs = jax.nn.softmax(logits, axis=-1)
    cutoff = min_p * jnp.max(probs, axis=-1, keepdims=True)
    return jnp.where(probs < cutoff, NEG_INF, logits)


def apply_repetition_penalty(logits: jax.Array, recent: jax.Array,
                             penalty: float) -> jax.Array:
    """recent: (B, W) token ids with -1 padding. Divides positive / multiplies
    negative logits of recently seen tokens by `penalty`.

    Membership is a broadcast-compare reduce over the W-token window (XLA
    fuses it into one vocab pass) rather than a scatter — TPU scatters
    serialize; -1 pads never match any vocab index."""
    if penalty == 1.0:
        return logits
    v = logits.shape[-1]
    vocab_idx = jnp.arange(v, dtype=recent.dtype)
    seen = jnp.any(vocab_idx[None, :, None] == recent[:, None, :], axis=-1)
    penalized = jnp.where(logits > 0, logits / penalty, logits * penalty)
    return jnp.where(seen, penalized, logits)


def mask_tokens(logits: jax.Array, mask: jax.Array) -> jax.Array:
    """Additive suppression mask (V,) or (B, V): 0 = allowed, NEG_INF = banned."""
    return logits + mask


def warp_logits(logits: jax.Array, cfg: SamplerConfig,
                recent: jax.Array | None = None) -> jax.Array:
    """The full logit-warp pipeline (repetition penalty → temperature →
    top-k/top-p → min-p) as a pure function: categorical(warp_logits(...))
    is exactly the distribution `sample` draws from (before RAS).  Factored
    out so speculative decoding (ops/speculative.py) can evaluate the SAME
    warped distributions for draft and target — a requirement for
    distribution-preserving rejection sampling.

    Not valid for temperature == 0 (greedy has no distribution; callers
    special-case argmax)."""
    if cfg.repetition_penalty != 1.0 and recent is not None:
        logits = apply_repetition_penalty(logits, recent, cfg.repetition_penalty)
    logits = logits / cfg.temperature
    v = logits.shape[-1]
    if 0 < cfg.top_k < v and cfg.top_p < 1.0:
        # fused top-k∘top-p: below the k-th value everything is masked, so
        # the top-p cutoff computed WITHIN the top-k values is exactly the
        # sequential top_k-then-top_p composition — an O(k) sort instead of
        # an O(V log V) one over the full vocab.
        vals = _topk_values(logits, cfg.top_k)  # descending
        probs = jax.nn.softmax(vals, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        keep = (cum - probs) < cfg.top_p
        kth = jnp.min(jnp.where(keep, vals, jnp.inf), axis=-1, keepdims=True)
        logits = jnp.where(logits < kth, NEG_INF, logits)
    else:
        logits = apply_top_k(logits, cfg.top_k)
        logits = apply_top_p(logits, cfg.top_p)
    return apply_min_p(logits, cfg.min_p)


def warped_probs(logits: jax.Array, cfg: SamplerConfig,
                 recent: jax.Array | None = None) -> jax.Array:
    """Exact next-token probabilities (B, V) the sampler draws from,
    including the RAS two-stage resample marginalized in closed form.

    RAS (Qwen2LM.swift:462-478, `_ras_resample`) draws t ~ P, and if t
    occurred more than `ras_max_repeats` times in the recent window,
    redraws from P excluding t.  Marginalizing the two draws:

        P'(x) = P(x)·[ok(x)]  +  Σ_{t bad, t≠x} P(t) · P(x)/(1−P(t))
              = P(x)·([ok(x)] + S − [bad(x)]·P(x)/(1−P(x)))
        with S = Σ_{t bad} P(t)/(1−P(t))

    which sums to 1 (accepted mass Σ_ok P + resampled mass Σ_bad P)."""
    p = jax.nn.softmax(warp_logits(logits, cfg, recent), axis=-1)
    if not (cfg.ras and recent is not None):
        return p
    window = recent[:, -cfg.ras_window:]
    vocab_idx = jnp.arange(p.shape[-1], dtype=window.dtype)
    reps = jnp.sum(vocab_idx[:, None] == window[:, None, :], axis=-1)  # (B, V)
    bad = reps > cfg.ras_max_repeats
    ratio = p / jnp.maximum(1.0 - p, 1e-30)
    s = jnp.sum(jnp.where(bad, ratio, 0.0), axis=-1, keepdims=True)
    return p * (jnp.where(bad, 0.0, 1.0) + s - jnp.where(bad, ratio, 0.0))


def sample(key: jax.Array, logits: jax.Array, cfg: SamplerConfig,
           recent: jax.Array | None = None) -> jax.Array:
    """logits (B, V) → token ids (B,). Greedy when temperature == 0."""
    if cfg.temperature == 0.0:
        if cfg.repetition_penalty != 1.0 and recent is not None:
            logits = apply_repetition_penalty(logits, recent,
                                              cfg.repetition_penalty)
        return jnp.argmax(logits, axis=-1)
    logits = warp_logits(logits, cfg, recent)
    tok = jax.random.categorical(key, logits, axis=-1)
    if cfg.ras and recent is not None:
        tok = _ras_resample(key, logits, tok, recent, cfg)
    return tok


def _ras_resample(key, logits, tok, recent, cfg: SamplerConfig):
    """CosyVoice repetition-aware sampling: if `tok` repeats too much in the
    recent window, draw instead from the low-probability tail (top_k=1..all
    replaced by a uniform-over-remaining draw as in Qwen2LM.swift:462-478)."""
    window = recent[:, -cfg.ras_window:]
    reps = jnp.sum(window == tok[:, None], axis=-1)
    need_resample = reps > cfg.ras_max_repeats
    k2 = jax.random.fold_in(key, 1)
    # resample from the full softmax (temperature 1) excluding the repeated token
    excl = logits.at[jnp.arange(logits.shape[0]), tok].set(NEG_INF)
    alt = jax.random.categorical(k2, excl, axis=-1)
    return jnp.where(need_resample, alt, tok)


def update_recent(recent: jax.Array, token: jax.Array) -> jax.Array:
    """Shift the (B, W) recent-token ring left and append token (B,)."""
    return jnp.concatenate([recent[:, 1:], token[:, None]], axis=1)
