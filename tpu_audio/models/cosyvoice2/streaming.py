"""CosyVoice2 token-chunk streaming: LM token chunks → incremental audio.

Round-3 measurement showed the sentence-granularity path pays the WHOLE
first sentence before any audio (TTFA p50 4.77 s vs the <300 ms target).
This module gives CosyVoice2 the same sub-sentence streaming CosyVoice3
already has (models/cosyvoice3/model.py CV3Synthesizer): the flow re-runs
over the accumulated token window with chunk-causal (streaming) masks —
every mask is causal at chunk granularity, so earlier frames are stable —
and the HiFT vocoder advances in O(1) per chunk via hift.vocode_window
with carried sine phase/source state.

Differences from CV3, by design:
  - the flow estimator is S3Gen's causal U-Net (codecs/s3gen/flow.py), not
    the DiT, so there is no frozen-KV O(1) flow variant — the window
    recompute IS the reference scheme (upstream CosyVoice2 stream=True
    re-runs token2mel on the grown window with token_hop_len=25 and
    pre-lookahead 3, matching Flow.swift:75-154's streaming masks);
  - no silent-token filter (that is a CosyVoice3Model.swift behavior);
  - the 20 ms anti-prompt-bleed fade-in is applied by the caller to the
    head of the first emitted chunk (s3gen.fade_in covers one-shot).

Reference provenance: package/TTS/CosyVoice2/CosyVoice2TTS.swift:370-787
(sentence synthesis + prompt scaffold), CosyVoice3Model.swift:605-649
(the chunk/lookahead streaming discipline this mirrors).
"""

from __future__ import annotations

from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np

from tpu_audio.codecs.s3gen import hift
from tpu_audio.codecs.s3gen import model as s3gen

CHUNK_SIZE = 25  # speech tokens per emitted audio chunk (1 s at 25 Hz)


class CV2Synthesizer:
    """Host orchestration of chunked CosyVoice2 synthesis.

    One jitted flow graph per (token-window bucket, streaming-flag) and one
    jitted vocoder window per (lookback, new-frames) shape; steady state
    hits a handful of compiled graphs regardless of utterance length.
    """

    def __init__(self, params, cfg: s3gen.S3GenConfig,
                 max_window_tokens: int = 150,
                 rebase_prompt_tokens: int = 50):
        """max_window_tokens: cap on the flow window (generated tokens per
        flow call). The reference re-runs token2mel over the FULL token
        prefix every chunk (CosyVoice2Model.swift:501 streaming=false on
        the grown window) — O(n²) over the stream and unbounded per-chunk
        latency. Here, once the window would exceed the cap, emitted
        tokens RETIRE: the last rebase_prompt_tokens of them (and their
        generated mel) become the next window's prompt scaffold — the
        same zero-shot prompt conditioning the flow is trained on — so
        per-chunk cost is O(max_window) for unbounded streams. Set
        max_window_tokens=None for the reference behavior."""
        self.params = params
        self.cfg = cfg
        self.max_window_tokens = max_window_tokens
        self.rebase_prompt_tokens = rebase_prompt_tokens
        self._flow_fns: dict = {}
        self._voc_fns: dict = {}

    def _flow_fn(self, t_pad: int, p_len: int, streaming: bool):
        key_ = (t_pad, p_len, streaming)
        if key_ not in self._flow_fns:
            cfg = self.cfg

            @jax.jit
            def fn(params, tokens, tl, pt, pl, pm, pml, emb, key):
                mel, _ = s3gen.flow_inference(params, cfg, tokens, tl, pt,
                                              pl, pm, pml, emb, key,
                                              streaming=streaming)
                return mel

            self._flow_fns[key_] = fn
        return self._flow_fns[key_]

    def _voc_fn(self, lb: int, n_new: int):
        key_ = (lb, n_new)
        if key_ not in self._voc_fns:
            cfg = self.cfg

            @jax.jit
            def fn(params, mel_, key, phase, source_tail, start_frame):
                return hift.vocode_window(params["mel2wav"], cfg.hift, mel_,
                                          key, phase, source_tail,
                                          start_frame)

            self._voc_fns[key_] = fn
        return self._voc_fns[key_]

    def stream(self, token_chunks: Iterator[list[int]],
               prompt_tokens: list[int], prompt_mel, embedding, *,
               seed: int = 0,
               chunk_size: int = CHUNK_SIZE) -> Iterator[np.ndarray]:
        """Consume LM speech-token chunks, yield incremental audio samples.

        prompt_tokens: the speaker's S3 tokens (the flow scaffold);
        prompt_mel (1, 2P', 80) or (2P', 80); embedding (1, 192).
        """
        cfg = self.cfg
        p_len0 = len(prompt_tokens)
        pm0 = np.asarray(prompt_mel, np.float32)
        if pm0.ndim == 3:
            pm0 = pm0[0]
        emb = jnp.asarray(embedding)
        lookahead = cfg.pre_lookahead_len
        mel_ratio = cfg.token_mel_ratio
        ups = cfg.hift.upsample_scale

        gen_tokens: list[int] = []
        emitted = 0  # generated tokens whose audio has been yielded
        done = False
        chunk_iter = iter(token_chunks)

        # rolling flow window [base, window_end): tokens before base have
        # retired into (cur_pt, cur_pm), the current prompt scaffold
        base = 0
        cur_pt = list(prompt_tokens)
        cur_pm = pm0
        # absolute mel stream: p_len0·ratio prompt frames, then generated
        # frames — the vocoder consumes this independent of flow windows
        mel_buf = np.zeros((0, cfg.mel_dim), np.float32)

        # incremental vocoder state (hift.vocode_window)
        nh = cfg.hift.nb_harmonics + 1
        phase = jnp.zeros((1, nh))
        source_tail = jnp.zeros((1, 0))
        voc_frames = 0  # absolute mel frames (incl. prompt) already vocoded
        voc_key = jax.random.PRNGKey(seed)

        while True:
            while (not done
                   and len(gen_tokens) < emitted + chunk_size + lookahead):
                try:
                    gen_tokens.extend(next(chunk_iter))
                except StopIteration:
                    done = True
            emit_upto = len(gen_tokens) if done else emitted + chunk_size
            if emit_upto <= emitted:
                break
            # the flow window covers emitted+chunk plus the pre-lookahead
            # context when it exists; the finalize pass (done) drops the
            # streaming masks, matching the reference finalize=true
            window_end = len(gen_tokens) if done else min(
                len(gen_tokens), emit_upto + lookahead)
            reb = self.rebase_prompt_tokens
            if (self.max_window_tokens is not None
                    and window_end - base > self.max_window_tokens
                    and emitted - reb >= base and emitted >= reb):
                # retire emitted tokens: their generated mel becomes the
                # next window's prompt (zero-shot continuation scaffold)
                base = emitted
                cur_pt = gen_tokens[base - reb: base]
                cur_pm = mel_buf[(p_len0 + base - reb) * mel_ratio:
                                 (p_len0 + base) * mel_ratio]
            p_len = len(cur_pt)
            n = window_end - base
            t_pad = max(32, -(-n // 32) * 32)
            toks = np.zeros((1, t_pad), np.int32)
            toks[0, :n] = gen_tokens[base:window_end]
            pt = jnp.asarray(np.asarray(cur_pt, np.int32)[None]) \
                if p_len else jnp.zeros((1, 0), jnp.int32)
            pm = jnp.asarray(cur_pm[None])
            valid_frames = (p_len0 + emit_upto) * mel_ratio
            lb = min(hift.LOOKBACK_FRAMES, voc_frames)
            n_new = valid_frames - voc_frames

            mel = self._flow_fn(t_pad, p_len, not done)(
                self.params, jnp.asarray(toks), jnp.asarray([n]), pt,
                jnp.asarray([p_len]), pm, jnp.asarray([pm.shape[1]]), emb,
                jax.random.PRNGKey(seed))
            mel_np = np.asarray(mel[0])
            # fold this window's mel into the absolute stream buffer
            need = (p_len0 + window_end) * mel_ratio
            if len(mel_buf) < need:
                mel_buf = np.vstack([mel_buf, np.zeros(
                    (need - len(mel_buf), cfg.mel_dim), np.float32)])
            if base == 0:  # first windows: keep the prompt-region mel too
                mel_buf[:p_len0 * mel_ratio] = \
                    mel_np[:p_len0 * mel_ratio]
            mel_buf[(p_len0 + base) * mel_ratio: need] = \
                mel_np[p_len * mel_ratio: (p_len + n) * mel_ratio]
            window = mel_buf[voc_frames - lb: valid_frames]

            audio_w, phase, source_w = self._voc_fn(lb, n_new)(
                self.params, jnp.asarray(window[None]), voc_key, phase,
                source_tail[:, source_tail.shape[1] - lb * ups:],
                jnp.asarray(voc_frames))
            new_audio = np.asarray(audio_w[0, lb * ups:], np.float32)
            new_lb = min(hift.LOOKBACK_FRAMES, valid_frames)
            source_tail = source_w[:, (lb + n_new - new_lb) * ups:]
            # skip the prompt-region samples (first chunk only)
            skip = max(0, p_len0 * mel_ratio - voc_frames)
            voc_frames = valid_frames
            new_audio = new_audio[skip * ups:]
            emitted = emit_upto
            if len(new_audio):
                yield new_audio
            if done:
                break
