"""Whisper segment decoding: one compiled function per prompt-length bucket.

The reference's GreedyDecoder (package/STT/Whisper/WhisperDecoding.swift:
81-410) runs the token loop on the host with a `.item()` round-trip per
token; here the whole segment — encode, prefill, suppression masks,
timestamp rules, timestamp-probability heuristic, sampling, EOS stop — is a
single lax.while_loop on device. Temperature is a traced scalar so all
fallback temperatures share one executable; only the initial-token count is
a static bucket.

Timestamp rules follow openai-whisper's ApplyTimestampRules:
  - <|notimestamps|> suppressed; first generated token must be a timestamp
    (≤ max_initial_timestamp index 50)
  - after a timestamp pair: all timestamps suppressed; after text+timestamp:
    text suppressed (pairs must close)
  - timestamps are monotonically non-decreasing
  - if sum p(timestamps) > max p(text): force a timestamp
"""

from __future__ import annotations

import zlib
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from tpu_audio.models.whisper import model as wmodel
from tpu_audio.models.whisper.config import WhisperConfig
from tpu_audio.models.whisper.tokenizer import WhisperTokenizer

NEG_INF = float(np.finfo(np.float32).min)
MAX_INITIAL_TIMESTAMP_INDEX = 50


@dataclass
class DecodingResult:
    tokens: list = field(default_factory=list)
    text: str = ""
    avg_logprob: float = 0.0
    no_speech_prob: float = 0.0
    temperature: float = 0.0
    compression_ratio: float = 0.0


def compression_ratio(text: str) -> float:
    data = text.encode("utf-8")
    if not data:
        return 0.0
    return len(data) / len(zlib.compress(data))


def build_suppress_mask(tok: WhisperTokenizer, n_vocab: int) -> np.ndarray:
    """Static (V,) additive mask for always-suppressed tokens."""
    mask = np.zeros(n_vocab, np.float32)
    ids = list(tok.non_speech_tokens) + [
        tok.transcribe, tok.translate, tok.sot, tok.sot_prev, tok.sot_lm,
        tok.no_speech,
    ]
    for t in ids:
        if t < n_vocab:
            mask[t] = NEG_INF
    return mask


def build_blank_mask(tok: WhisperTokenizer, n_vocab: int) -> np.ndarray:
    """Extra first-step mask: blank and EOT suppressed."""
    mask = np.zeros(n_vocab, np.float32)
    for t in tok.encode(" ") + [tok.eot]:
        mask[t] = NEG_INF
    return mask


class SegmentDecoder:
    """Owns the jitted per-segment decode fns, bucketed by init-token count."""

    def __init__(self, params, cfg: WhisperConfig, tokenizer: WhisperTokenizer,
                 compute_dtype=jnp.float32, kv_int8: bool = False):
        self.params = params
        self.cfg = cfg
        self.tok = tokenizer
        self.dtype = compute_dtype
        # int8 cross-K/V serving state: halves the dominant per-step HBM
        # stream through the fused cross_kv_attention kernel (measured
        # 2.87 → 1.54 ms/step at batch 16, benchmarks/dec_profile.py)
        self.kv_int8 = kv_int8
        self.suppress_mask = build_suppress_mask(tokenizer, cfg.n_vocab)
        self.blank_mask = build_blank_mask(tokenizer, cfg.n_vocab)
        self._decode_fns: dict = {}

    # -------------------------------------------------------------- device fns

    def _make_decode_fn(self, n_init: int, timestamps: bool, sot_index: int):
        cfg, tok = self.cfg, self.tok
        ts_begin, eot = tok.timestamp_begin, tok.eot
        v = cfg.n_vocab
        max_gen = cfg.n_text_ctx - n_init
        base_mask = jnp.asarray(self.suppress_mask)
        blank_mask = jnp.asarray(self.blank_mask)
        vocab_idx = jnp.arange(v)

        if timestamps:
            base_mask = base_mask.at[tok.no_timestamps].set(NEG_INF)

        def run(params, mel, init_tokens, temperature, key):
            audio_features = wmodel.encode(params, cfg, mel[None])
            state = wmodel.init_state(params, cfg, audio_features,
                                      dtype=self.dtype,
                                      kv_int8=self.kv_int8)
            pre_logits, state = wmodel.decode_step(params, cfg,
                                                   init_tokens[None], state)
            pre_logits = pre_logits.astype(jnp.float32)
            no_speech_prob = jax.nn.softmax(pre_logits[0, sot_index])[tok.no_speech]

            tokens_buf = jnp.zeros((max_gen,), jnp.int32)

            def cond(c):
                return (c["i"] < max_gen) & ~c["finished"]

            def body(c):
                i = c["i"]
                is_first = i == 0

                def from_prefill(s):
                    return c["pre_logits"], s

                def from_step(s):
                    lg, s = wmodel.decode_step(
                        params, cfg, c["last"][None, None], s)
                    return lg[0, -1].astype(jnp.float32), s

                logits, state = jax.lax.cond(
                    is_first, from_prefill, from_step, c["state"])
                mask = base_mask + jnp.where(is_first, blank_mask, 0.0)

                if timestamps:
                    last_was_ts = (i >= 1) & (c["last"] >= ts_begin)
                    penult_was_ts = (i < 2) | (c["second_last"] >= ts_begin)
                    ts_mask = jnp.zeros((v,), jnp.float32)
                    # pair rules
                    ts_mask = jnp.where(
                        last_was_ts & penult_was_ts & (vocab_idx >= ts_begin),
                        NEG_INF, ts_mask)
                    ts_mask = jnp.where(
                        last_was_ts & ~penult_was_ts & (vocab_idx < eot),
                        NEG_INF, ts_mask)
                    # monotonicity
                    ts_seen = c["last_ts"] >= 0
                    cutoff = c["last_ts"] + jnp.where(
                        last_was_ts & ~penult_was_ts, 0, 1)
                    ts_mask = jnp.where(
                        ts_seen & (vocab_idx >= ts_begin) & (vocab_idx < cutoff),
                        NEG_INF, ts_mask)
                    # first token must be a timestamp within the initial window
                    ts_mask = jnp.where((i == 0) & (vocab_idx < ts_begin),
                                        NEG_INF, ts_mask)
                    ts_mask = jnp.where(
                        (i == 0) & (vocab_idx > ts_begin + MAX_INITIAL_TIMESTAMP_INDEX),
                        NEG_INF, ts_mask)
                    # probability heuristic on SUPPRESSED logits: openai-
                    # whisper applies ApplyTimestampRules after SuppressBlank/
                    # SuppressTokens and computes the logsumexp on logits that
                    # already carry the base + pair/monotonicity masks
                    logprobs = jax.nn.log_softmax(
                        logits + jnp.minimum(mask, ts_mask))
                    ts_lp = jax.nn.logsumexp(logprobs[ts_begin:])
                    max_text_lp = jnp.max(logprobs[:ts_begin])
                    force_ts = (i > 0) & (ts_lp > max_text_lp)
                    ts_mask = jnp.where(force_ts & (vocab_idx < ts_begin),
                                        NEG_INF, ts_mask)
                    mask = jnp.minimum(mask, ts_mask)

                masked = logits + mask
                key, sub = jax.random.split(c["key"])
                greedy = jnp.argmax(masked).astype(jnp.int32)
                sampled = jax.random.categorical(
                    sub, masked / jnp.maximum(temperature, 1e-6)).astype(jnp.int32)
                tok_next = jnp.where(temperature == 0.0, greedy, sampled)

                logprob = jax.nn.log_softmax(masked)[tok_next]
                not_eot = tok_next != eot
                sum_lp = c["sum_logprob"] + jnp.where(not_eot, logprob, 0.0)
                n_lp = c["n_logprob"] + jnp.where(not_eot, 1, 0)

                buf = c["tokens"].at[i].set(tok_next)
                last_ts = jnp.where(tok_next >= ts_begin, tok_next, c["last_ts"])
                return {
                    "i": i + 1, "tokens": buf, "last": tok_next,
                    "second_last": c["last"], "state": state,
                    "sum_logprob": sum_lp, "n_logprob": n_lp,
                    "finished": tok_next == eot, "last_ts": last_ts,
                    "key": key, "pre_logits": c["pre_logits"],
                }

            carry = {
                "i": jnp.zeros((), jnp.int32), "tokens": tokens_buf,
                "last": init_tokens[-1].astype(jnp.int32),
                "second_last": init_tokens[-2].astype(jnp.int32)
                if n_init >= 2 else jnp.zeros((), jnp.int32),
                "state": state,
                "sum_logprob": jnp.zeros((), jnp.float32),
                "n_logprob": jnp.zeros((), jnp.int32),
                "finished": jnp.zeros((), jnp.bool_),
                "last_ts": -jnp.ones((), jnp.int32),
                "key": key,
                "pre_logits": pre_logits[0, -1],
            }
            out = jax.lax.while_loop(cond, body, carry)
            return (out["tokens"], out["i"], out["sum_logprob"],
                    out["n_logprob"], no_speech_prob)

        return jax.jit(run)

    # -------------------------------------------------------------- host API

    def decode(self, mel: np.ndarray, *, language: str = "en",
               task: str = "transcribe", temperature: float = 0.0,
               timestamps: bool = True, prompt: list[int] | None = None,
               seed: int = 0) -> DecodingResult:
        """mel: (3000, n_mels) float32. Returns generated tokens and stats."""
        tok = self.tok
        tokens: list[int] = []
        if prompt:
            tokens.append(tok.sot_prev)
            tokens.extend(prompt)
        sot_index = len(tokens)
        tokens.extend(tok.sot_sequence(language, task))
        if not timestamps:
            tokens.append(tok.no_timestamps)

        n_init = len(tokens)
        fn_key = (n_init, timestamps, sot_index)
        if fn_key not in self._decode_fns:
            self._decode_fns[fn_key] = self._make_decode_fn(
                n_init, timestamps, sot_index)
        fn = self._decode_fns[fn_key]

        out_tokens, n, sum_lp, n_lp, ns_prob = fn(
            self.params,
            jnp.asarray(mel, dtype=jnp.float32),
            jnp.asarray(tokens, dtype=jnp.int32),
            jnp.float32(temperature),
            jax.random.PRNGKey(seed),
        )
        n = int(n)
        generated = [int(t) for t in np.asarray(out_tokens[:n])]
        if generated and generated[-1] == tok.eot:
            generated = generated[:-1]
        text = tok.decode(generated)
        n_lp = int(n_lp)
        return DecodingResult(
            tokens=generated, text=text,
            avg_logprob=float(sum_lp) / n_lp if n_lp else 0.0,
            no_speech_prob=float(ns_prob), temperature=temperature,
            compression_ratio=compression_ratio(text),
        )

    def detect_language(self, mel: np.ndarray) -> tuple[str, dict[str, float]]:
        """Single forward step over [sot] → language probabilities
        (reference: WhisperModel.detectLanguage, WhisperModel.swift:200-260)."""
        tok, cfg = self.tok, self.cfg
        lang_ids = np.asarray(sorted(tok.language_tokens.values()))

        @jax.jit
        def run(params, mel):
            feats = wmodel.encode(params, cfg, mel[None])
            state = wmodel.init_state(params, cfg, feats, dtype=self.dtype,
                                      kv_int8=self.kv_int8)
            logits, _ = wmodel.decode_step(
                params, cfg, jnp.asarray([[tok.sot]], jnp.int32), state)
            logits = logits[0, -1].astype(jnp.float32)
            mask = jnp.full((cfg.n_vocab,), NEG_INF).at[jnp.asarray(lang_ids)].set(0.0)
            return jax.nn.softmax(logits + mask)

        probs = np.asarray(run(self.params, jnp.asarray(mel, jnp.float32)))
        by_lang = {lang: float(probs[tid]) for lang, tid in tok.language_tokens.items()}
        best = max(by_lang, key=by_lang.get)
        return best, by_lang
