"""Orpheus TTS engine: 8 voices + expression tags, sentence streaming.

Reference: package/TTS/Orpheus/OrpheusEngine.swift:9-28 (voices + tags
<laugh> <chuckle> <sigh> <cough> <sniffle> <groan> <yawn> <gasp>),
TTSEngine/OrpheusTTS.swift (per-sentence loop, temp 0.6 / topP 0.8).
Repos: mlx-community/orpheus-3b-0.1-ft-4bit + mlx-community/snac_24khz.
"""

from __future__ import annotations

import time

from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np

from tpu_audio.api.tts import AudioChunk, StreamingGranularity, TTSEngineBase
from tpu_audio.codecs import snac
from tpu_audio.models.orpheus import model as omodel
from tpu_audio.models.orpheus.model import (CausalLMGenerator, build_prompt_ids,
                                            parse_frames)
from tpu_audio.ops.sampling import SamplerConfig
from tpu_audio.utils import text as textutils
from tpu_audio.utils.tokenizer import load_tokenizer

LLM_REPO = "mlx-community/orpheus-3b-0.1-ft-4bit"
SNAC_REPO = "mlx-community/snac_24khz"


class OrpheusEngine(TTSEngineBase):
    sample_rate = omodel.SAMPLE_RATE
    supported_streaming_granularities = (StreamingGranularity.SENTENCE,
                                         StreamingGranularity.TOKEN)
    # token granularity is the serving default: first audio one LM span
    # (~4 frames) after prefill instead of after the whole first sentence
    # (the reference streams per sentence — OrpheusTTS.swift:201)
    default_streaming_granularity = StreamingGranularity.TOKEN
    voices = omodel.VOICES
    expression_tags = omodel.EXPRESSION_TAGS

    # sliding SNAC decode window (in 7-token frames = 4 latent frames):
    # left context ≥ the decoder's left receptive field (~11 latents),
    # right hold-back ≥ its right receptive field — samples inside the
    # window body are then bit-identical to the one-shot decode
    SNAC_CTX_FRAMES = 8
    SNAC_HOLD_FRAMES = 4
    # LM tokens per compiled span dispatch (4 frames). Round-5 on-chip
    # probe: span 42 (one dispatch to the 35 tokens first audio needs at
    # the real-checkpoint frame rate) measured WORSE — per-span overhead
    # scales with span (8.3 vs 7.7 ms/token end-to-end), eroding the
    # saved dispatch; 28 keeps the best measured latency.
    STREAM_SPAN = 28

    def __init__(self, voice: str = "tara", temperature: float = 0.6,
                 top_p: float = 0.8, quantization: str = "w8a8",
                 mesh=None, speculative=None, gamma: int = 8):
        """quantization: "w8a8" (default — per-channel int8 serving format,
        3B decode 6.1 ms/token vs 11.0 bf16 on v5e) requantizes the 4-bit
        checkpoint at load; "w4a8" repacks it losslessly for the int4→int8
        MXU kernel (0.5 B/weight); "q4" keeps the checkpoint's group-affine
        int4 (fused Pallas dequant kernel, 2.6× less HBM, bf16-parity
        speed).

        mesh: optional jax.sharding.Mesh with a "tp" axis — the 3B LM then
        serves tensor-parallel (megatron rules + head-sharded KV cache),
        token-identical to single-device decode (SURVEY §2C).

        speculative: None (off, bit-stable spanned decode with in-loop
        cancellation), "ngram" (prompt-lookup self-drafting — no second
        model), or a DraftModel (a small same-vocab LM, e.g. a distilled
        1B, drafting for the 3B). Speculative decoding emits up to
        gamma+1 tokens per 3B weight pass with every token distributed
        EXACTLY as the normal sampler (ops/speculative.py); cancellation
        is then checked between sentences rather than between spans."""
        super().__init__()
        self.voice = voice
        self.temperature = temperature
        self.top_p = top_p
        self.quantization = quantization
        self.mesh = mesh
        self.speculative = speculative
        self.gamma = gamma
        self.lm: CausalLMGenerator | None = None
        self.snac_params = None
        self.snac_cfg = snac.SNACConfig()
        self.tokenizer = None
        self._snac_fns = {}

    def load(self, progress_handler=None) -> None:
        if self.is_loaded:
            return
        from tpu_audio.models.orpheus import load as oload

        lm_params, cfg, tok, snac_params, snac_cfg = oload.load()
        if self.quantization == "w8a8":
            from tpu_audio.ops import quant

            lm_params = quant.requantize_tree_int8(lm_params)
        elif self.quantization == "w4a8":
            from tpu_audio.ops import quant

            lm_params = quant.repack_tree_w4a8(lm_params)
        self.lm = CausalLMGenerator(lm_params, cfg,
                                    max_cache=2048, pad_id=omodel.PAD_TOKEN,
                                    mesh=self.mesh)
        self.tokenizer = tok
        self.snac_params = snac_params
        self.snac_cfg = snac_cfg
        self.is_loaded = True

    @classmethod
    def from_params(cls, lm_params, cfg, snac_params,
                    snac_cfg=None, max_cache: int = 512,
                    mesh=None) -> "OrpheusEngine":
        eng = cls(mesh=mesh)
        eng.lm = CausalLMGenerator(lm_params, cfg, max_cache=max_cache,
                                   pad_id=omodel.PAD_TOKEN, mesh=mesh)
        eng.snac_params = snac_params
        eng.snac_cfg = snac_cfg or snac.SNACConfig()
        eng.tokenizer = load_tokenizer(None)
        eng.is_loaded = True
        return eng

    # ---------------------------------------------------------------- synthesis

    def _decode_snac(self, layers_: list[np.ndarray],
                     seed: int = 0) -> np.ndarray:
        frames = len(layers_[0])
        if frames == 0:
            return np.zeros(0, np.float32)
        bucket = max(8, -(-frames // 8) * 8)
        fn = self._snac_window_fn(bucket)
        pad = bucket - frames
        c = [np.pad(l, (0, pad * s)) for l, s in
             zip(layers_, (1, 2, 4))]
        audio = fn(self.snac_params, jnp.asarray(c[0][None]),
                   jnp.asarray(c[1][None]), jnp.asarray(c[2][None]),
                   jnp.int32(0), jax.random.PRNGKey(seed))
        # one 7-token frame = 4 stride-1 latent frames × hop samples
        valid = frames * self.snac_cfg.vq_strides[0] * self.snac_cfg.hop
        return np.asarray(audio[0][:valid], np.float32)

    def _snac_window_fn(self, frames: int):
        """One jitted decode per window size (frames). Noise is keyed by
        absolute latent position (snac._pos_noise), so a window decode is
        sample-identical to the one-shot decode over the same region."""
        if frames not in self._snac_fns:
            self._snac_fns[frames] = jax.jit(
                lambda p, c0, c1, c2, start_f, k: snac.decode_codes(
                    p, self.snac_cfg, [c0, c1, c2], k,
                    noise_pos=start_f * self.snac_cfg.vq_strides[0]))
        return self._snac_fns[frames]

    def _stream_snac_window(self, layers_: list[np.ndarray], start_f: int,
                            end_f: int, emit_from_f: int, emit_to_f: int,
                            seed: int) -> np.ndarray:
        """Decode frames [start_f, end_f) (zero-padding codes past the
        parsed length exactly like the one-shot bucket pad) and return the
        samples of [emit_from_f, emit_to_f)."""
        spf = self.snac_cfg.vq_strides[0] * self.snac_cfg.hop  # 2048
        w = end_f - start_f
        total = len(layers_[0])
        c = []
        for l, s in zip(layers_, (1, 2, 4)):
            seg = l[start_f * s: end_f * s]
            c.append(np.pad(seg, (0, w * s - len(seg))))
        audio = self._snac_window_fn(w)(
            self.snac_params, jnp.asarray(c[0][None]),
            jnp.asarray(c[1][None]), jnp.asarray(c[2][None]),
            jnp.int32(start_f), jax.random.PRNGKey(seed))
        lo = (emit_from_f - start_f) * spf
        hi = (emit_to_f - start_f) * spf
        return np.asarray(audio[0][lo:hi], np.float32)

    def generate_batch(self, texts: list[str],
                       max_new_tokens: int = omodel.MAX_TOKENS,
                       seed: int = 0) -> list["AudioResult"]:
        """Multi-stream synthesis: decode all texts in ONE compiled batch
        loop (weights stream once per step for the whole batch — measured
        ~7× aggregate throughput at batch 8 on the 3B model, i.e. ~7
        concurrent real-time streams per chip). Each text is synthesized
        whole (no per-sentence split); returns one AudioResult per text."""
        from tpu_audio.api.results import AudioResult

        if self.lm is None:
            self.load()
        self._stop_flag.clear()
        self.is_generating = True
        t0 = time.perf_counter()
        try:
            sampler = SamplerConfig(
                temperature=self.temperature, top_p=self.top_p,
                repetition_penalty=1.3,
                repetition_window=omodel.REPETITION_WINDOW)
            prompts = [build_prompt_ids(
                self.tokenizer.encode(f"{self.voice}: {t}")) for t in texts]
            outs = self.lm.generate_batch(
                prompts, sampler=sampler, eos_ids=(omodel.END_TOKEN,),
                max_new=max_new_tokens, seed=seed)
            results = []
            for ids in outs:
                audio = self._decode_snac(parse_frames(ids))
                results.append(AudioResult(
                    samples=audio, sample_rate=self.sample_rate,
                    processing_time=0.0))
        finally:
            self.is_generating = False
        self.generation_time = time.perf_counter() - t0
        for r in results:
            r.processing_time = self.generation_time
        return results

    def generate_streaming(self, text: str,
                           granularity: StreamingGranularity | None = None,
                           max_new_tokens: int = omodel.MAX_TOKENS,
                           **kw) -> Iterator[AudioChunk]:
        if self.lm is None:
            self.load()
        sampler = SamplerConfig(
            temperature=self.temperature, top_p=self.top_p,
            repetition_penalty=1.3,
            repetition_window=omodel.REPETITION_WINDOW)
        sentences = textutils.split_into_sentences(text)
        granularity = granularity or self.default_streaming_granularity
        if (granularity == StreamingGranularity.TOKEN
                and self.speculative is None):
            # speculative decoding emits variable-size accept runs; it
            # keeps the sentence path (where its throughput matters)
            yield from self._stream_tokens(sentences, sampler,
                                           max_new_tokens)
            return
        for si, sentence in enumerate(sentences):
            self._check_stopped()
            prompt = f"{self.voice}: {sentence}"
            ids = build_prompt_ids(self.tokenizer.encode(prompt))
            if self.speculative is not None:
                draft = (None if self.speculative == "ngram"
                         else self.speculative)
                generated = self.lm.generate_speculative(
                    ids, sampler=sampler, eos_ids=(omodel.END_TOKEN,),
                    max_new=max_new_tokens, seed=si, gamma=self.gamma,
                    draft=draft)
            else:
                generated = self.lm.generate(
                    ids, sampler=sampler, eos_ids=(omodel.END_TOKEN,),
                    max_new=max_new_tokens, seed=si,
                    should_stop=self._stop_flag.is_set)  # cancel between spans
            self._check_stopped()
            layers_ = parse_frames(generated)
            audio = self._decode_snac(layers_)
            yield AudioChunk(samples=audio, sample_rate=self.sample_rate,
                             text=sentence, is_final=si == len(sentences) - 1)

    def _stream_tokens(self, sentences: list[str], sampler: SamplerConfig,
                       max_new: int) -> Iterator[AudioChunk]:
        """Token-granularity streaming: compiled LM spans (STREAM_SPAN
        tokens ≈ 4 frames) → sliding-window SNAC decode. With
        position-stable noise and window context ≥ the decoder receptive
        field, the concatenated stream equals the one-shot decode of the
        same token sequence; the hold-back trades SNAC_HOLD_FRAMES
        (~340 ms) of extra buffering inside the window for that exactness,
        and first audio needs one prefill + one span dispatch instead of
        the whole sentence (TTFA 1.9 s → ~0.4 s measured on v5e)."""
        ctx, hold = self.SNAC_CTX_FRAMES, self.SNAC_HOLD_FRAMES
        pending: AudioChunk | None = None
        for si, sentence in enumerate(sentences):
            self._check_stopped()
            prompt = f"{self.voice}: {sentence}"
            ids = build_prompt_ids(self.tokenizer.encode(prompt))
            toks: list[int] = []
            emitted_f = 0

            def window(layers_, start_f, end_f, emit_to_f, seed):
                # multiple-of-8 window via LEFT extension (extra context
                # never changes the emitted samples; it reuses compiles)
                start_f = max(0, start_f)
                start_f = max(0, start_f - (-(end_f - start_f)) % 8)
                return self._stream_snac_window(layers_, start_f, end_f,
                                                emitted_f, emit_to_f, seed)

            for span_toks in self.lm.stream_spans(
                    ids, sampler=sampler, eos_ids=(omodel.END_TOKEN,),
                    max_new=max_new, seed=si, span=self.STREAM_SPAN,
                    should_stop=self._stop_flag.is_set):
                self._check_stopped()
                toks.extend(span_toks)
                layers_ = parse_frames(toks)
                decodable = len(layers_[0]) - hold
                if decodable <= emitted_f:
                    continue
                audio = window(layers_, emitted_f - ctx, len(layers_[0]),
                               decodable, si)
                emitted_f = decodable
                if len(audio):
                    if pending is not None:
                        yield pending
                    pending = AudioChunk(samples=audio,
                                         sample_rate=self.sample_rate,
                                         text=sentence, is_final=False)
            self._check_stopped()
            layers_ = parse_frames(toks)
            total = len(layers_[0])
            if total > emitted_f:
                # finalize: decode to the one-shot bucket end (same zero
                # pad at the same absolute positions as _decode_snac)
                audio = window(layers_, emitted_f - ctx,
                               max(8, -(-total // 8) * 8), total, si)
                emitted_f = total
                if len(audio):
                    if pending is not None:
                        yield pending
                    pending = AudioChunk(samples=audio,
                                         sample_rate=self.sample_rate,
                                         text=sentence, is_final=False)
        if pending is not None:
            yield AudioChunk(samples=pending.samples,
                             sample_rate=pending.sample_rate,
                             text=pending.text, is_final=True)
        else:
            yield AudioChunk(samples=np.zeros(0, np.float32),
                             sample_rate=self.sample_rate, text="",
                             is_final=True)
