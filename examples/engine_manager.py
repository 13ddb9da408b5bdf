"""EngineManager: one object multiplexing every TTS + STT engine.

Equivalent of the reference example apps' EngineManager
(examples/TTS App/App/Models/EngineManager.swift:11-85,
examples/STT App/App/Models/EngineManager.swift:10-62): lazy engine
construction, one active engine at a time, unload on switch.
"""

from __future__ import annotations

from tpu_audio import STT, TTS

TTS_ENGINES = {
    "kokoro": TTS.kokoro,
    "orpheus": TTS.orpheus,
    "marvis": TTS.marvis,
    "oute": TTS.oute,
    "chatterbox": TTS.chatterbox,
    "chatterbox_turbo": TTS.chatterbox_turbo,
    "cosyvoice2": TTS.cosyvoice2,
    "cosyvoice3": TTS.cosyvoice3,
}

STT_ENGINES = {
    "whisper": STT.whisper,
    "funasr": STT.fun_asr,
}


class EngineManager:
    def __init__(self):
        self._tts = {}
        self._stt = {}
        self.active_tts: str | None = None
        self.active_stt: str | None = None

    def tts(self, name: str, **kw):
        if name not in TTS_ENGINES:
            raise KeyError(f"unknown TTS engine {name!r}; "
                           f"choose from {sorted(TTS_ENGINES)}")
        if name not in self._tts:
            self._tts[name] = TTS_ENGINES[name](**kw)
        if self.active_tts not in (None, name) and \
                self.active_tts in self._tts:
            self._tts[self.active_tts].unload()
        self.active_tts = name
        return self._tts[name]

    def stt(self, name: str, **kw):
        if name not in STT_ENGINES:
            raise KeyError(f"unknown STT engine {name!r}; "
                           f"choose from {sorted(STT_ENGINES)}")
        if name not in self._stt:
            self._stt[name] = STT_ENGINES[name](**kw)
        if self.active_stt not in (None, name) and \
                self.active_stt in self._stt:
            self._stt[self.active_stt].unload()
        self.active_stt = name
        return self._stt[name]

    def cleanup(self):
        for eng in list(self._tts.values()) + list(self._stt.values()):
            eng.cleanup()
