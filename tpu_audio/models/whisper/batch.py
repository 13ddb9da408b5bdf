"""Batched Whisper decoding: many 30 s windows through one compiled loop.

Serving-grade throughput path the single-stream reference cannot express
(SURVEY §2C: data parallelism is new TPU-side design): B windows decode in
one lax.while_loop with per-row suppression/timestamp state, per-row EOS,
and shared weights — HBM reads of the weights amortize across the batch,
which is exactly what a memory-bound decoder needs.

Used for offline/batch transcription of many clips (or many windows of one
long clip with fixed 30 s stride, the standard batched-whisper chunking);
the sequential seek loop (pipeline.py) remains the highest-accuracy path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tpu_audio.models.whisper import model as wmodel
from tpu_audio.models.whisper.config import WhisperConfig
from tpu_audio.models.whisper.decoding import (NEG_INF,
                                               MAX_INITIAL_TIMESTAMP_INDEX,
                                               DecodingResult,
                                               build_blank_mask,
                                               build_suppress_mask,
                                               compression_ratio)
from tpu_audio.models.whisper.tokenizer import WhisperTokenizer


class BatchSegmentDecoder:
    """Greedy/temperature decode of B mel windows at once."""

    def __init__(self, params, cfg: WhisperConfig, tokenizer: WhisperTokenizer,
                 batch_size: int = 8, compute_dtype=jnp.bfloat16,
                 kv_int8: bool = False):
        self.params = params
        self.cfg = cfg
        self.tok = tokenizer
        self.batch_size = batch_size
        self.dtype = compute_dtype
        # int8 cross-K/V serving state (fused cross_kv_attention kernel):
        # measured 2.87 → 1.54 ms/decode-step at batch 16
        self.kv_int8 = kv_int8
        self.suppress_mask = build_suppress_mask(tokenizer, cfg.n_vocab)
        self.blank_mask = build_blank_mask(tokenizer, cfg.n_vocab)
        self._fns = {}

    def _make_fn(self, n_init: int, timestamps: bool):
        cfg, tok = self.cfg, self.tok
        b = self.batch_size
        ts_begin, eot = tok.timestamp_begin, tok.eot
        v = cfg.n_vocab
        max_gen = cfg.n_text_ctx - n_init
        base_mask = jnp.asarray(self.suppress_mask)
        if timestamps:
            base_mask = base_mask.at[tok.no_timestamps].set(NEG_INF)
        blank_mask = jnp.asarray(self.blank_mask)
        vocab_idx = jnp.arange(v)

        def run(params, mels, init_tokens, temperature, key):
            feats = wmodel.encode(params, cfg, mels.astype(self.dtype))
            state = wmodel.init_state(params, cfg, feats, batch=b,
                                      dtype=self.dtype,
                                      kv_int8=self.kv_int8)
            pre_logits, state = wmodel.decode_step(params, cfg, init_tokens,
                                                   state)
            pre_logits = pre_logits.astype(jnp.float32)
            no_speech = jax.nn.softmax(
                pre_logits[:, n_init - len(tok.sot_sequence())],
                axis=-1)[:, tok.no_speech]

            def cond(c):
                return (c["i"] < max_gen) & ~jnp.all(c["finished"])

            def body(c):
                i = c["i"]
                is_first = i == 0

                def from_prefill(s):
                    return c["pre"], s

                def from_step(s):
                    lg, s = wmodel.decode_step(params, cfg, c["last"][:, None], s)
                    return lg[:, -1].astype(jnp.float32), s

                logits, state = jax.lax.cond(is_first, from_prefill,
                                             from_step, c["state"])
                mask = base_mask[None] + jnp.where(is_first, blank_mask, 0.0)[None]

                if timestamps:
                    last_was = (i >= 1) & (c["last"] >= ts_begin)
                    penult_was = (i < 2) | (c["second"] >= ts_begin)
                    tsm = jnp.zeros((b, v), jnp.float32)
                    tsm = jnp.where((last_was & penult_was)[:, None]
                                    & (vocab_idx >= ts_begin)[None], NEG_INF, tsm)
                    tsm = jnp.where((last_was & ~penult_was)[:, None]
                                    & (vocab_idx < eot)[None], NEG_INF, tsm)
                    ts_seen = c["last_ts"] >= 0
                    cutoff = c["last_ts"] + jnp.where(last_was & ~penult_was,
                                                      0, 1)
                    tsm = jnp.where(ts_seen[:, None]
                                    & (vocab_idx[None] >= ts_begin)
                                    & (vocab_idx[None] < cutoff[:, None]),
                                    NEG_INF, tsm)
                    tsm = jnp.where(is_first & (vocab_idx < ts_begin)[None],
                                    NEG_INF, tsm)
                    tsm = jnp.where(
                        is_first & (vocab_idx > ts_begin
                                    + MAX_INITIAL_TIMESTAMP_INDEX)[None],
                        NEG_INF, tsm)
                    # heuristic on suppressed logits (openai-whisper filter
                    # order: SuppressTokens before ApplyTimestampRules)
                    logprobs = jax.nn.log_softmax(
                        logits + jnp.minimum(mask, tsm), axis=-1)
                    ts_lp = jax.nn.logsumexp(logprobs[:, ts_begin:], axis=-1)
                    max_text = jnp.max(logprobs[:, :ts_begin], axis=-1)
                    force = (i > 0) & (ts_lp > max_text)
                    tsm = jnp.where(force[:, None] & (vocab_idx < ts_begin)[None],
                                    NEG_INF, tsm)
                    mask = jnp.minimum(mask, tsm)

                masked = logits + mask
                key, sub = jax.random.split(c["key"])
                greedy = jnp.argmax(masked, axis=-1).astype(jnp.int32)
                sampled = jax.random.categorical(
                    sub, masked / jnp.maximum(temperature, 1e-6),
                    axis=-1).astype(jnp.int32)
                tok_next = jnp.where(temperature == 0.0, greedy, sampled)
                tok_next = jnp.where(c["finished"], eot, tok_next)

                lp = jnp.take_along_axis(jax.nn.log_softmax(masked, axis=-1),
                                         tok_next[:, None], axis=-1)[:, 0]
                not_eot = (tok_next != eot) & ~c["finished"]
                sum_lp = c["sum_lp"] + jnp.where(not_eot, lp, 0.0)
                n_lp = c["n_lp"] + not_eot.astype(jnp.int32)

                buf = jax.lax.dynamic_update_slice(
                    c["buf"], tok_next[:, None], (0, i))
                last_ts = jnp.where(tok_next >= ts_begin, tok_next,
                                    c["last_ts"])
                return {
                    "i": i + 1, "buf": buf, "last": tok_next,
                    "second": c["last"], "state": state,
                    "finished": c["finished"] | (tok_next == eot),
                    "sum_lp": sum_lp, "n_lp": n_lp, "last_ts": last_ts,
                    "key": key, "pre": c["pre"],
                }

            carry = {
                "i": jnp.zeros((), jnp.int32),
                "buf": jnp.full((b, max_gen), eot, jnp.int32),
                "last": init_tokens[:, -1].astype(jnp.int32),
                "second": init_tokens[:, -2].astype(jnp.int32)
                if n_init >= 2 else jnp.zeros((b,), jnp.int32),
                "state": state,
                "finished": jnp.zeros((b,), jnp.bool_),
                "sum_lp": jnp.zeros((b,), jnp.float32),
                "n_lp": jnp.zeros((b,), jnp.int32),
                "last_ts": -jnp.ones((b,), jnp.int32),
                "key": key, "pre": pre_logits[:, -1],
            }
            out = jax.lax.while_loop(cond, body, carry)
            return out["buf"], out["sum_lp"], out["n_lp"], no_speech

        return jax.jit(run)

    def decode_batch(self, mels: np.ndarray, *, language: str = "en",
                     task: str = "transcribe", temperature: float = 0.0,
                     timestamps: bool = True, seed: int = 0
                     ) -> list[DecodingResult]:
        """mels (B, 3000, n_mels) → per-window DecodingResults."""
        tok = self.tok
        assert mels.shape[0] == self.batch_size
        tokens = tok.sot_sequence(language, task)
        if not timestamps:
            tokens = tokens + [tok.no_timestamps]
        n_init = len(tokens)
        key_ = (n_init, timestamps)
        if key_ not in self._fns:
            self._fns[key_] = self._make_fn(n_init, timestamps)
        init = jnp.asarray(np.tile(np.asarray(tokens, np.int32),
                                   (self.batch_size, 1)))
        buf, sum_lp, n_lp, ns = self._fns[key_](
            self.params, jnp.asarray(mels, jnp.float32), init,
            jnp.float32(temperature), jax.random.PRNGKey(seed))
        buf = np.asarray(buf)
        results = []
        for r in range(self.batch_size):
            row = list(buf[r])
            toks = []
            for t in row:
                if t == tok.eot:
                    break
                toks.append(int(t))
            text = tok.decode(toks)
            n = int(n_lp[r])
            results.append(DecodingResult(
                tokens=toks, text=text,
                avg_logprob=float(sum_lp[r]) / n if n else 0.0,
                no_speech_prob=float(ns[r]), temperature=temperature,
                compression_ratio=compression_ratio(text)))
        return results


def transcribe_windows(params, cfg, tokenizer, audios: list[np.ndarray],
                       batch_size: int = 8, **kw):
    """Fixed-stride batch transcription of many clips: split each clip into
    30 s windows, decode all windows in batches, reassemble per clip."""
    from tpu_audio.models.whisper.pipeline import (CHUNK_SAMPLES, MelExtractor,
                                                   N_FRAMES, _pad_frames)

    extractor = MelExtractor(cfg.n_mels)
    decoder = BatchSegmentDecoder(params, cfg, tokenizer, batch_size)

    windows = []
    owners = []
    for ci, audio in enumerate(audios):
        mel = extractor(np.asarray(audio, np.float32))
        content = mel.shape[0] - N_FRAMES
        for seek in range(0, max(content, 1), N_FRAMES):
            windows.append(_pad_frames(mel[seek: seek + N_FRAMES], N_FRAMES))
            owners.append(ci)

    texts = [[] for _ in audios]
    for start in range(0, len(windows), batch_size):
        group = windows[start: start + batch_size]
        while len(group) < batch_size:
            group.append(np.zeros_like(group[0]))
        res = decoder.decode_batch(np.stack(group), **kw)
        for j, r in enumerate(res[: len(windows[start: start + batch_size])]):
            idx = start + j
            if idx < len(owners):
                texts[owners[idx]].append(r.text)
    return ["".join(t).strip() for t in texts]
