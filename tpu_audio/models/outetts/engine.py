"""OuteTTS engine: Llama-1B → interleaved c1/c2 DAC codes → waveform.

Reference: package/TTS/OuteTTS/OuteTTS.swift:28-199 (sampler temp 0.4,
topP 0.9, topK 40, minP 0.05, repPen 1.1@64; repo
mlx-community/Llama-OuteTTS-1.0-1B-4bit), OuteTTSPromptProcessor.swift
(grammar, speaker merge, extraction), OuteTTSAudioProcessor.swift:363-455
(speaker creation from Whisper word timestamps + DAC encode).
"""

from __future__ import annotations

import re
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np

from tpu_audio.api.tts import AudioChunk, StreamingGranularity, TTSEngineBase
from tpu_audio.codecs import dac
from tpu_audio.models.orpheus.model import CausalLMGenerator
from tpu_audio.models.outetts import tokens as T
from tpu_audio.models.outetts.features import extract_features
from tpu_audio.models.outetts.tokens import SpeakerProfile, WordData
from tpu_audio.ops.sampling import SamplerConfig
from tpu_audio.utils import text as textutils
from tpu_audio.utils.tokenizer import load_tokenizer

LLM_REPO = "mlx-community/Llama-OuteTTS-1.0-1B-4bit"
DAC_REPO = "mlx-community/dac-speech-24khz-1.5kbps"

SAMPLER = SamplerConfig(temperature=0.4, top_p=0.9, top_k=40, min_p=0.05,
                        repetition_penalty=1.1, repetition_window=64)

_C1_RE = re.compile(r"<\|c1_(\d+)\|>")
_C2_RE = re.compile(r"<\|c2_(\d+)\|>")


def normalize_text(text: str) -> str:
    text = re.sub(r"\s+", " ", text).strip()
    for a, b in (("…", "..."), ("“", '"'), ("”", '"'), ("‘", "'"),
                 ("’", "'"), ("–", "-"), ("—", "-")):
        text = text.replace(a, b)
    return "".join(ch for ch in text if ord(ch) > 0x1F
                   and not (0x7F <= ord(ch) <= 0x9F))


def merge_speaker_text(input_text: str, speaker_text: str) -> tuple[str, str]:
    sp = speaker_text.strip()
    cjk = any(0x3040 <= ord(c) <= 0x30FF or 0x4E00 <= ord(c) <= 0x9FFF
              for c in sp)
    sep = "。" if cjk else ". "
    allowed = ("。", "？", "！", "?", "!") if sep == "。" else (".", "?", "!")
    rs = ""
    if sp:
        if not sp.endswith(allowed):
            rs = sep
        elif sep != "。":
            rs = " "
    return sp + rs + input_text.strip(), rs.strip()


def build_prompt(text: str, speaker: SpeakerProfile | None) -> str:
    text = normalize_text(text)
    if speaker is not None:
        merged, sep = merge_speaker_text(text, speaker.text)
        words = [WordData(**{**w.__dict__}) for w in speaker.words]
        if words:
            words[-1].word += sep
        prompt = (T.BOS + T.TEXT_START + merged + T.TEXT_END + "\n"
                  + T.AUDIO_START + "\n")
        prompt += "\n".join(w.to_codes() for w in words)
        if words:
            prompt += "\n"
        return prompt
    return (T.BOS + T.TEXT_START + text + T.TEXT_END + "\n"
            + T.AUDIO_START + "\n")


def extract_codes(generated_text: str) -> tuple[np.ndarray, np.ndarray]:
    """Pull paired c1/c2 code streams out of the generated token string."""
    c1 = [int(m) for m in _C1_RE.findall(generated_text)]
    c2 = [int(m) for m in _C2_RE.findall(generated_text)]
    n = min(len(c1), len(c2))
    return (np.asarray(c1[:n], np.int32), np.asarray(c2[:n], np.int32))


#: bundled default speaker profile (the reference ships
#: default_speaker.json as a package resource, Package.swift:42).
#: Generated from reference audio by tools/make_default_speaker.py —
#: profiles contain DAC codes of real audio, so the asset is produced on a
#: machine with network access (tools/validate_release.py runs it).
DEFAULT_SPEAKER_PATH = __file__.rsplit("/", 1)[0] + "/default_speaker.json"


def default_speaker() -> SpeakerProfile | None:
    """The bundled default voice, or None if the asset has not been
    generated on this machine yet (zero-egress build environments).

    When the asset is absent this is a LOUD degradation, not a silent
    one: the reference guarantees an out-of-the-box voice
    (Package.swift:42 ships default_speaker.json), so running
    unconditioned is a behavioral difference the user must see."""
    import os

    if not os.path.exists(DEFAULT_SPEAKER_PATH):
        from tpu_audio.utils import get_logger

        get_logger("tts").warning(
            "OuteTTS bundled default speaker asset is missing (%s): "
            "generation will run UNCONDITIONED (no voice cloning prompt), "
            "which does not match the reference's out-of-the-box voice. "
            "Generate it once with tools/make_default_speaker.py on a "
            "machine with network access, or pass an explicit "
            "SpeakerProfile / speaker=None to silence this warning.",
            DEFAULT_SPEAKER_PATH)
        return None
    return SpeakerProfile.load(DEFAULT_SPEAKER_PATH)


class OuteTTSEngine(TTSEngineBase):
    sample_rate = 24000
    supported_streaming_granularities = (StreamingGranularity.SENTENCE,)

    def __init__(self, speaker: "SpeakerProfile | str | None" = "default",
                 quantization: str = "w8a8", speculative=None,
                 gamma: int = 8):
        """speaker: a SpeakerProfile, the string "default" (bundled
        default_speaker.json, matching the reference's out-of-the-box
        voice; falls back to unconditioned prompts WITH a warning if the
        asset is absent), or None for explicit unconditioned prompts.

        quantization: "w8a8" (default) requantizes the 4-bit checkpoint
        to the per-channel int8 serving format at load (1B decode 2.66
        ms/token vs 5.6 bf16-parity q4); "w4a8" repacks losslessly for the
        int4→int8 MXU kernel; "q4" keeps the checkpoint layout.

        speculative: None, "ngram" (prompt-lookup self-drafting — strong
        on OuteTTS prompts, whose speaker profile embeds long c1/c2 code
        runs in the prompt itself) or a DraftModel; see OrpheusEngine."""
        super().__init__()
        self.speaker = (default_speaker() if speaker == "default"
                        else speaker)
        self.speculative = speculative
        self.gamma = gamma
        self.quantization = quantization
        self.lm: CausalLMGenerator | None = None
        self.tokenizer = None
        self.dac_params = None
        self.dac_cfg = dac.DACConfig()
        self._dac_fns = {}
        self._audio_end_id = None

    def load(self, progress_handler=None) -> None:
        if self.is_loaded:
            return
        from tpu_audio.nn import load_llama
        from tpu_audio.utils import hub

        path = hub.snapshot(LLM_REPO, matching=["*.safetensors", "config.json",
                                                "tokenizer.json"])
        params, cfg = load_llama.load_llama_dir(path)
        if self.quantization == "w8a8":
            from tpu_audio.ops import quant

            params = quant.requantize_tree_int8(params)
        elif self.quantization == "w4a8":
            from tpu_audio.ops import quant

            params = quant.repack_tree_w4a8(params)
        self.lm = CausalLMGenerator(params, cfg, max_cache=4096)
        self.tokenizer = load_tokenizer(path)
        dac_path = hub.snapshot(DAC_REPO, matching=["*.safetensors",
                                                    "config.json"])
        from tpu_audio.codecs.dac import load as dac_load

        self.dac_params, self.dac_cfg = dac_load.load_dir(dac_path)
        self.is_loaded = True

    @classmethod
    def from_params(cls, lm_params, cfg, dac_params, dac_cfg,
                    tokenizer=None, max_cache: int = 512) -> "OuteTTSEngine":
        eng = cls()
        eng.lm = CausalLMGenerator(lm_params, cfg, max_cache=max_cache)
        eng.tokenizer = tokenizer or load_tokenizer(None)
        eng.dac_params = dac_params
        eng.dac_cfg = dac_cfg
        eng.is_loaded = True
        return eng

    # ---------------------------------------------------------------- speaker

    def create_speaker(self, audio: np.ndarray, sample_rate: int,
                       transcript: str | None = None,
                       whisper_engine=None) -> SpeakerProfile:
        """Build a speaker profile from reference audio: Whisper word
        timestamps + per-word DAC codes + acoustic features
        (OuteTTSAudioProcessor.createSpeakerFromTranscription:363-455)."""
        from tpu_audio.ops.resample import resample

        if sample_rate != 16000:
            audio16 = resample(audio, sample_rate, 16000)
        else:
            audio16 = audio
        if whisper_engine is None:
            from tpu_audio.api.stt import STT

            whisper_engine = STT.whisper("tiny")
        result = whisper_engine.transcribe(audio16, word_timestamps=True)
        words = result.words

        audio24 = (resample(audio, sample_rate, 24000)
                   if sample_rate != 24000 else audio)
        profile_words = []
        hop = self.dac_cfg.hop
        for w in words:
            seg = audio24[int(w.start * 24000): int(w.end * 24000)]
            if len(seg) < hop:
                continue
            seg = seg[: len(seg) // hop * hop]
            codes = np.asarray(jax.jit(
                lambda p, a: dac.encode(p, self.dac_cfg, a))(
                    self.dac_params, jnp.asarray(seg[None])))
            profile_words.append(WordData(
                word=w.word, duration=round(w.end - w.start, 2),
                features=extract_features(seg, 24000),
                c1=[int(x) for x in codes[0, 0]],
                c2=[int(x) for x in codes[0, 1]]))
        return SpeakerProfile(
            text=transcript or result.text,
            words=profile_words,
            global_features=extract_features(audio24, 24000))

    # ---------------------------------------------------------------- synthesis

    def _decode_dac(self, c1: np.ndarray, c2: np.ndarray) -> np.ndarray:
        frames = len(c1)
        if frames == 0:
            return np.zeros(0, np.float32)
        bucket = -(-frames // 25) * 25
        if bucket not in self._dac_fns:
            self._dac_fns[bucket] = jax.jit(
                lambda p, c: dac.decode_codes(p, self.dac_cfg, c))
        codes = np.zeros((1, 2, bucket), np.int32)
        codes[0, 0, :frames] = c1
        codes[0, 1, :frames] = c2
        audio = self._dac_fns[bucket](self.dac_params, jnp.asarray(codes))
        return np.asarray(audio[0][: frames * self.dac_cfg.hop], np.float32)

    def generate_batch(self, texts: list[str], max_new_tokens: int = 2048,
                       seed: int = 0) -> list["AudioResult"]:
        """Multi-stream synthesis: one compiled batch decode for all texts
        (weights stream once per step for the whole batch — see
        OrpheusEngine.generate_batch). One AudioResult per text."""
        import time as _time

        from tpu_audio.api.results import AudioResult

        if self.lm is None:
            self.load()
        self._stop_flag.clear()
        self.is_generating = True
        t0 = _time.perf_counter()
        try:
            prompts = [self.tokenizer.encode(build_prompt(t, self.speaker))
                       for t in texts]
            outs = self.lm.generate_batch(
                prompts, sampler=SAMPLER, eos_ids=self._eos_ids(),
                max_new=max_new_tokens, seed=seed)
            results = []
            for ids in outs:
                c1, c2 = extract_codes(self.tokenizer.decode_raw(ids))
                audio = self._decode_dac(c1, c2)
                results.append(AudioResult(
                    samples=audio, sample_rate=self.sample_rate))
        finally:
            self.is_generating = False
        self.generation_time = _time.perf_counter() - t0
        for r in results:
            r.processing_time = self.generation_time
        return results

    def generate_streaming(self, text: str,
                           granularity: StreamingGranularity | None = None,
                           max_new_tokens: int = 2048,
                           **kw) -> Iterator[AudioChunk]:
        if self.lm is None:
            self.load()
        sentences = textutils.split_into_sentences(text)
        for si, sentence in enumerate(sentences):
            self._check_stopped()
            prompt = build_prompt(sentence, self.speaker)
            ids = self.tokenizer.encode(prompt)
            if self.speculative is not None:
                draft = (None if self.speculative == "ngram"
                         else self.speculative)
                generated = self.lm.generate_speculative(
                    ids, sampler=SAMPLER, eos_ids=self._eos_ids(),
                    max_new=max_new_tokens, seed=si, gamma=self.gamma,
                    draft=draft)
            else:
                generated = self.lm.generate(
                    ids, sampler=SAMPLER, eos_ids=self._eos_ids(),
                    max_new=max_new_tokens, seed=si,
                    should_stop=self._stop_flag.is_set)  # cancel between spans
            self._check_stopped()
            text_out = self.tokenizer.decode_raw(generated)
            c1, c2 = extract_codes(text_out)
            audio = self._decode_dac(c1, c2)
            yield AudioChunk(samples=audio, sample_rate=self.sample_rate,
                             text=sentence, is_final=si == len(sentences) - 1)

    def _eos_ids(self) -> tuple:
        if self._audio_end_id is None:
            ids = self.tokenizer.encode(T.AUDIO_END)
            self._audio_end_id = tuple(ids) if len(ids) == 1 else (2,)
        return self._audio_end_id
