"""Marvis TTS engine: frame-granularity streaming via Mimi.

Reference: package/TTS/Marvis/MarvisTTS.swift:25-523 + MarvisEngine.swift —
text prompt "[speaker]text" in the (K+1)-th frame column, per-sentence
frame loop with zero-frame EOS, 12.5 tok/s streaming interval, quality
levels low/8 medium/16 high/24 max/32 codebooks. Repos:
Marvis-AI/marvis-tts-{100m,250m}-v0.2-MLX-6bit + kyutai Mimi weights.
"""

from __future__ import annotations

import functools
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np

from tpu_audio.api.tts import AudioChunk, StreamingGranularity, TTSEngineBase
from tpu_audio.codecs import mimi
from tpu_audio.models.marvis import model as mmodel
from tpu_audio.nn import transformer
from tpu_audio.utils import constants
from tpu_audio.utils import text as textutils
from tpu_audio.utils.tokenizer import load_tokenizer

REPOS = {"100m": "Marvis-AI/marvis-tts-100m-v0.2-MLX-6bit",
         "250m": "Marvis-AI/marvis-tts-250m-v0.2-MLX-6bit"}


class MarvisEngine(TTSEngineBase):
    sample_rate = 24000
    supported_streaming_granularities = (StreamingGranularity.SENTENCE,
                                         StreamingGranularity.FRAME)
    default_streaming_granularity = StreamingGranularity.FRAME

    def __init__(self, quality: str = "high", model: str = "250m",
                 speaker: int = 0, temperature: float = 0.9, top_k: int = 50,
                 kv_quantized: bool = False, frame_span: int | None = None,
                 quantization: str | None = None):
        super().__init__()
        self.quality = quality
        self.model_size = model
        self.speaker = speaker
        self.temperature = temperature
        self.top_k = top_k
        # optional int8 KV cache (reference MarvisModel.swift:384-389)
        self.kv_quantized = kv_quantized
        # "w8a8" requantizes the backbone + depth-decoder stacks to the
        # per-channel int8 serving format: the 12.5 Hz frame loop re-reads
        # the depth decoder 31x per frame, so halving its bytes trims the
        # frame's HBM floor (the loop is partly op-issue-bound — see
        # docs/BENCHMARKS.md for the measured effect)
        self.quantization = quantization
        self.params = None
        self.cfg = mmodel.MarvisConfig()
        self.mimi_params = None
        self.mimi_cfg = mimi.MimiConfig()
        self.tokenizer = None
        self._frame_fns = {}
        self._mimi_fns = {}
        self.max_frames = 512  # 40 s cap per sentence
        # whole-stack fused Pallas depth decode (one kernel launch per
        # codebook instead of ~90 XLA ops) — resolved at load;
        # TPU_AUDIO_FUSED_DEPTH=0 disables for ablation
        self._depth_fused = False
        # and the backbone single-token frame step through the same kernel
        # (16 layers -> 1 launch; cache kept in the kernel's layout)
        self._bb_fused = False
        # frames generated per device dispatch (also the streaming decode
        # chunk): one host sync per span, EOS checked between spans.
        # Larger spans amortize the host round-trip (throughput) at the
        # cost of first-audio latency and cancel granularity.
        self.frame_span = frame_span or constants.streaming_interval_tokens(
            constants.DEFAULT_STREAMING_INTERVAL) or 6

    @property
    def n_codebooks(self) -> int:
        return min(constants.MARVIS_CODEBOOKS[self.quality],
                   self.cfg.n_codebooks)

    def load(self, progress_handler=None) -> None:
        if self.is_loaded:
            return
        from tpu_audio.models.marvis import load as mload

        (self.params, self.cfg, self.tokenizer,
         self.mimi_params, self.mimi_cfg) = mload.load(REPOS[self.model_size])
        self.params = self._quantize(self.params, self.quantization)
        self.params = self._fuse(self.params)
        self._tune_cfg()
        self._depth_fused, self._bb_fused = self._fused_supported(
            self.cfg, self.params, self.kv_quantized,
            self.max_frames, self.frame_span)
        self.is_loaded = True

    @staticmethod
    def _fused_supported(cfg, params, kv_quantized=False,
                         max_frames=512, frame_span=8):
        import os as _os

        from tpu_audio.ops.pallas import fused_step

        # probe at the REAL cache shapes each path serves: the depth ring
        # is fixed (mmodel.depth_ring_len, dtype = the embeddings' dtype =
        # last_h.dtype); the backbone ring varies per prompt bucket —
        # gated here at the engine's base bucket and RE-probed per bucket
        # in _fns before each span function commits to the kernel
        d_len = mmodel.depth_ring_len(cfg)
        emb_dtype = params["text_embeddings"]["weight"].dtype
        bb_len = mmodel.backbone_ring_len(32, max_frames, frame_span)
        depth = (_os.environ.get("TPU_AUDIO_FUSED_DEPTH", "1") != "0"
                 and fused_step.supported(cfg.decoder, params["decoder"], 1,
                                          d_len, emb_dtype)
                 and fused_step.probe_compile(cfg.decoder, params["decoder"],
                                              d_len, emb_dtype))
        bb = (depth and not kv_quantized
              and _os.environ.get("TPU_AUDIO_FUSED_BB", "1") != "0"
              and fused_step.supported(cfg.backbone, params["backbone"], 1,
                                       bb_len, jnp.float32)
              and fused_step.probe_compile(cfg.backbone, params["backbone"],
                                           bb_len, jnp.float32))
        return depth, bb

    @staticmethod
    def _quantize(params, quantization):
        if quantization is None:
            return params
        if quantization != "w8a8":
            raise ValueError(f"unsupported quantization {quantization!r}; "
                             "marvis serves bf16 or 'w8a8'")
        from tpu_audio.ops import quant

        def q(tree):
            # group-affine checkpoint leaves (6-bit MLX repos) repack via
            # requantize; fp leaves quantize per-channel directly
            t = quant.requantize_tree_int8(tree, fuse=False)
            t = quant.quantize_tree_int8(t)
            return quant.fuse_int8_tree(t)

        return dict(params, backbone=q(params["backbone"]),
                    decoder=q(params["decoder"]))

    def _tune_cfg(self):
        """Unroll the tiny depth decoder's layer scan (4 layers, 31
        sequential steps per frame — per-layer scan indexing is loop
        overhead at this size)."""
        import dataclasses

        if self.cfg.decoder.n_layers <= 8:
            self.cfg = dataclasses.replace(
                self.cfg, decoder=dataclasses.replace(
                    self.cfg.decoder,
                    scan_unroll=self.cfg.decoder.n_layers))

    @staticmethod
    def _fuse(params):
        """Fuse fp qkv/gateup leaves in both stacks: the 12.5 Hz frame
        loop is dispatch-latency-bound (31 sequential tiny depth steps),
        so fewer, larger GEMMs per step cut frame latency directly
        (quantized leaves pass through untouched)."""
        params = dict(params)
        for name in ("backbone", "decoder"):
            if name in params:
                params[name] = transformer.fuse_fp_tree(params[name])
        return params

    @classmethod
    def from_params(cls, params, cfg, mimi_params, mimi_cfg,
                    tokenizer=None, max_frames: int = 64,
                    quantization: str | None = None) -> "MarvisEngine":
        eng = cls(quantization=quantization)
        eng.params = cls._fuse(cls._quantize(params, quantization))
        eng.cfg = cfg
        eng._tune_cfg()
        eng.mimi_params = mimi_params
        eng.mimi_cfg = mimi_cfg
        eng.tokenizer = tokenizer or load_tokenizer(None)
        eng.max_frames = max_frames
        eng._depth_fused, eng._bb_fused = cls._fused_supported(
            eng.cfg, eng.params, eng.kv_quantized,
            eng.max_frames, eng.frame_span)
        eng.is_loaded = True
        return eng

    # ---------------------------------------------------------------- internals

    def _fns(self, prompt_pad: int, k: int, span: int | None = None):
        span = span or self.frame_span
        key_ = (prompt_pad, k, span)
        if key_ in self._frame_fns:
            return self._frame_fns[key_]
        cfg = self.cfg
        kk = cfg.n_codebooks

        step = functools.partial(mmodel.frame_step, cfg=cfg, max_codebooks=k,
                                 temperature=self.temperature,
                                 top_k=self.top_k,
                                 depth_fused=self._depth_fused)

        # 8-aligned ring: the fused backbone kernel takes (KVH, S, hd)
        # cache blocks whose sublane dim should stay tile-aligned
        s_max = mmodel.backbone_ring_len(prompt_pad, self.max_frames, span)
        # the kernel variant is per (ring length, dtype): re-gate THIS
        # bucket's shapes before committing the span graph to it (the
        # load-time _bb_fused only reflects the base bucket — a bucket
        # whose ring fits can use the kernel even if another didn't)
        bb_fused = self._depth_fused and not self.kv_quantized
        if bb_fused:
            import os as _os

            from tpu_audio.ops.pallas import fused_step

            bb_fused = (
                _os.environ.get("TPU_AUDIO_FUSED_BB", "1") != "0"
                and fused_step.supported(cfg.backbone,
                                         self.params["backbone"], 1,
                                         s_max, jnp.float32)
                and fused_step.probe_compile(
                    cfg.backbone, self.params["backbone"], s_max,
                    jnp.float32))

        @jax.jit
        def prefill(params, tokens, mask, pad_amount, key):
            cache = transformer.make_cache(
                cfg.backbone, 1, s_max,
                dtype=jnp.float32, quantized=self.kv_quantized)
            slot = jnp.arange(cache.max_len)
            extra = jnp.where(slot >= pad_amount, 0.0, -1e30)[None, None, None, :]
            frame, cache = step(params, tokens=tokens, mask=mask,
                                bb_cache=cache, key=key, extra_mask=extra)
            return frame, cache, extra

        def frame_tokens(frame):
            tokens = jnp.concatenate(
                [frame, jnp.zeros((1, 1), jnp.int32)], axis=-1)[:, None, :]
            mask = jnp.concatenate(
                [jnp.ones((1, 1, frame.shape[-1]), jnp.bool_),
                 jnp.zeros((1, 1, 1), jnp.bool_)], axis=-1)
            # pad mask/tokens to K+1 columns
            pad_cols = kk - frame.shape[-1]
            if pad_cols:
                tokens = jnp.concatenate(
                    [tokens[..., :-1],
                     jnp.zeros((1, 1, pad_cols), jnp.int32),
                     tokens[..., -1:]], axis=-1)
                mask = jnp.concatenate(
                    [mask[..., :-1], jnp.zeros((1, 1, pad_cols), jnp.bool_),
                     mask[..., -1:]], axis=-1)
            return tokens, mask

        def one_frame(params, frame, cache, extra, key):
            tokens, mask = frame_tokens(frame)
            return step(params, tokens=tokens, mask=mask, bb_cache=cache,
                        key=key, extra_mask=extra)

        if bb_fused:
            @jax.jit
            def span_fn(params, frame, state, extra, key):
                """Fully-fused span: backbone + depth both through the
                whole-stack kernel; the backbone cache rides the kernel's
                (L, KVH, S_pad, hd) layout across frames (state from
                cache_to_fused), left-pad masking via the start scalar."""
                kc, vc, pos, start = state

                def body(carry, k_):
                    f, kc, vc, pos = carry
                    tokens, mask = frame_tokens(f)
                    f2, kc, vc = mmodel.frame_step_fused_bb(
                        params, cfg, tokens, mask, kc, vc, pos, start, k_,
                        max_codebooks=k, temperature=self.temperature,
                        top_k=self.top_k)
                    return (f2, kc, vc, pos + 1), f2

                keys = jax.random.split(key, span)
                (last, kc, vc, pos), frames = jax.lax.scan(
                    body, (frame, kc, vc, pos), keys)
                return frames, last, (kc, vc, pos, start)
        else:
            @jax.jit
            def span_fn(params, frame, state, extra, key):
                """SPAN frames per dispatch via lax.scan — one host sync
                per span instead of per frame (the per-frame sync over the
                axon tunnel dominated generation: 50 round-trips for 4 s
                of audio)."""
                def body(carry, k_):
                    f, c = carry
                    f2, c = one_frame(params, f, c, extra, k_)
                    return (f2, c), f2
                keys = jax.random.split(key, span)
                (last, cache2), frames = jax.lax.scan(body, (frame, state),
                                                      keys)
                return frames, last, cache2

        self._frame_fns[key_] = (prefill, span_fn, bb_fused)
        return self._frame_fns[key_]

    def _tokenize_text(self, text: str):
        """Frame rows for the text prompt: id in the last column."""
        k = self.cfg.n_codebooks
        ids = self.tokenizer.encode(f"[{self.speaker}]{text}")
        t = len(ids)
        tokens = np.zeros((t, k + 1), np.int32)
        tokens[:, -1] = ids
        mask = np.zeros((t, k + 1), bool)
        mask[:, -1] = True
        return tokens, mask

    def _stream_dec_fn(self, chunk: int, k: int):
        """Jitted exact streaming Mimi decode (streaming.decode_stream)."""
        key_ = ("stream", chunk, k)
        if key_ not in self._mimi_fns:
            from tpu_audio.codecs.mimi import streaming

            cfg = self.mimi_cfg
            self._mimi_fns[key_] = jax.jit(
                lambda p, c, s: streaming.decode_stream(p, cfg, c, s))
        return self._mimi_fns[key_]

    def _decode_frames(self, frames: np.ndarray) -> np.ndarray:
        """(T, K_used) codes → audio; pad codebooks beyond K_used with 0."""
        t = frames.shape[0]
        if t == 0:
            return np.zeros(0, np.float32)
        bucket = -(-t // 8) * 8
        key_ = (bucket, frames.shape[1])
        if key_ not in self._mimi_fns:
            self._mimi_fns[key_] = jax.jit(
                lambda p, c: mimi.decode(p, self.mimi_cfg, c))
        codes = np.zeros((1, frames.shape[1], bucket), np.int32)
        codes[0, :, :t] = frames.T
        audio = self._mimi_fns[key_](self.mimi_params, jnp.asarray(codes))
        return np.asarray(audio[0][: t * self.mimi_cfg.hop], np.float32)

    # ---------------------------------------------------------------- synthesis

    def generate_streaming(self, text: str,
                           granularity: StreamingGranularity | None = None,
                           **kw) -> Iterator[AudioChunk]:
        if self.params is None:
            self.load()
        granularity = granularity or self.default_streaming_granularity
        k = self.n_codebooks
        stream_frames = constants.streaming_interval_tokens(
            constants.DEFAULT_STREAMING_INTERVAL) or 6
        # measured on chip (round 5): a longer one-shot span (18) is NOT
        # faster — RTF 0.253-0.270 vs 0.213-0.227 at span 6 — the frame
        # loop is device-compute-bound, not dispatch-bound, and the longer
        # ring hurts the fused backbone kernel's shapes. Keep one span.
        span = self.frame_span

        sentences = textutils.split_into_sentences(text)
        for si, sentence in enumerate(sentences):
            self._check_stopped()
            tokens, mask = self._tokenize_text(sentence)
            n = tokens.shape[0]
            pad = -(-n // 32) * 32
            tok_pad = np.zeros((1, pad, tokens.shape[1]), np.int32)
            mask_pad = np.zeros((1, pad, tokens.shape[1]), bool)
            tok_pad[0, pad - n:] = tokens
            mask_pad[0, pad - n:] = mask

            prefill, span_fn, bb_fused = self._fns(pad, k, span)
            key = jax.random.PRNGKey(si)
            key, sub = jax.random.split(key)
            frame, cache, extra = prefill(self.params, jnp.asarray(tok_pad),
                                          jnp.asarray(mask_pad),
                                          jnp.int32(pad - n), sub)
            if bb_fused:
                kc, vc, pos = mmodel.cache_to_fused(cache)
                state = (kc, vc, pos, jnp.int32(pad - n))
            else:
                state = cache
            frames = []
            pending = []
            streamed = granularity == StreamingGranularity.FRAME
            if streamed:
                from tpu_audio.codecs.mimi import streaming

                dec_state = streaming.init_state(self.mimi_params,
                                                 self.mimi_cfg, 1,
                                                 stream_frames)
                dec_fn = self._stream_dec_fn(stream_frames, k)
            f_host = np.asarray(frame[0])
            done = np.all(f_host == 0)
            span_host: list[np.ndarray] = [] if done else [f_host]
            while True:
                self._check_stopped()
                # keep the device busy: dispatch the next span before
                # consuming the frames already on the host
                if not done and len(frames) + len(span_host) < self.max_frames:
                    key, sub = jax.random.split(key)
                    nxt, frame, state = span_fn(self.params, frame, state,
                                                extra, sub)
                else:
                    nxt = None
                for f in span_host:
                    if np.all(f == 0):
                        done = True
                        break
                    frames.append(f)
                    pending.append(f)
                    if streamed and len(pending) >= stream_frames:
                        codes = np.stack(pending).T[None]  # (1, K, chunk)
                        audio, dec_state = dec_fn(self.mimi_params,
                                                  jnp.asarray(codes),
                                                  dec_state)
                        pending = []
                        yield AudioChunk(
                            samples=np.asarray(audio[0], np.float32),
                            sample_rate=self.sample_rate,
                            text=sentence, is_final=False)
                    if len(frames) >= self.max_frames:
                        done = True
                        break
                if nxt is None:
                    break
                span_host = list(np.asarray(nxt[:, 0]))  # one sync per span
                if done:
                    break

            if streamed:
                # final partial group: pad to the chunk, emit valid samples
                if pending:
                    codes = np.zeros((1, k, stream_frames), np.int32)
                    codes[0, :, : len(pending)] = np.stack(pending).T
                    audio, dec_state = dec_fn(self.mimi_params,
                                              jnp.asarray(codes), dec_state)
                    audio = np.asarray(
                        audio[0, : len(pending) * self.mimi_cfg.hop],
                        np.float32)
                else:
                    audio = np.zeros(0, np.float32)
            else:
                audio = self._decode_frames(np.stack(frames)) if frames else \
                    np.zeros(0, np.float32)
            yield AudioChunk(samples=audio, sample_rate=self.sample_rate,
                             text=sentence, is_final=si == len(sentences) - 1)
