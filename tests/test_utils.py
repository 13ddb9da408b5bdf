"""Text utils, trimmer, playback sinks, API value types."""

import numpy as np

from tpu_audio.api.results import Word
from tpu_audio.api.tts import AudioChunk
from tpu_audio.utils import text as textutils
from tpu_audio.utils import trimmer


class TestSentenceTokenizer:
    def test_basic_split_and_merge(self):
        out = textutils.split_into_sentences(
            "Hi. This is a much longer sentence that should stand by itself "
            "because it exceeds the minimum length threshold easily!")
        # short "Hi." merges forward
        assert len(out) == 1

    def test_long_sentences_stay_separate(self):
        s1 = "This is the first reasonably long sentence that stands alone nicely here."
        s2 = "And here is the second one, also long enough to stay separate from it."
        out = textutils.split_into_sentences(f"{s1} {s2}")
        assert out == [s1, s2]

    def test_max_length_respected(self):
        long = " ".join(["This is sentence number %d." % i for i in range(40)])
        out = textutils.split_into_sentences(long)
        assert all(len(c) <= 300 for c in out)
        assert len(out) > 1

    def test_cjk(self):
        out = textutils.split_into_sentences("你好。今天天气很好。我们去公园吧。")
        assert len(out) >= 1
        assert textutils.detect_script("你好今天") == "cjk"

    def test_indic(self):
        assert textutils.detect_script("नमस्ते दुनिया") == "indic"

    def test_empty(self):
        assert textutils.split_into_sentences("") == []
        assert textutils.split_into_sentences("   ") == []


class TestTextSplitter:
    def test_middle_out_priority(self):
        text = "First part is here. Second part follows after it for sure."
        first, second = textutils.split_at_punctuation_boundary(text)
        assert first.endswith(".")
        assert first + " " + second == text

    def test_comma_fallback(self):
        text = "no periods here, but commas exist, in this long string of words"
        parts = textutils.split_at_punctuation_boundary(text)
        assert parts is not None
        assert parts[0].endswith(",")

    def test_too_short(self):
        assert textutils.split_at_punctuation_boundary("short") is None

    def test_split_to_max_length(self):
        text = "A sentence. " * 30
        chunks = textutils.split_to_max_length(text, 80)
        assert all(len(c) <= 80 for c in chunks)
        assert "".join(c.replace(" ", "") for c in chunks) == text.replace(" ", "").strip()


class TestTrimmer:
    def test_trim_silence(self):
        sr = 16000
        sig = np.concatenate([
            np.zeros(sr // 2), 0.5 * np.sin(np.linspace(0, 800 * np.pi, sr)),
            np.zeros(sr // 2)]).astype(np.float32)
        trimmed, start, end = trimmer.trim_silence(sig, sr)
        assert start >= sr // 4
        assert end <= len(sig) - sr // 4
        assert len(trimmed) < len(sig)

    def test_trim_all_silence(self):
        out, s, e = trimmer.trim_silence(np.zeros(16000, np.float32), 16000)
        # silence relative to its own (zero) peak isn't trimmed to nothing —
        # matches librosa ref-max semantics: everything equals the peak
        assert e >= s

    def test_word_boundary_clipping(self):
        sr = 16000
        audio = np.ones(sr * 3, np.float32) * 0.1
        words = [Word("hello", 0.0, 0.5, 0.9), Word(" world", 0.6, 1.0, 0.9),
                 Word(" um", 1.1, 1.3, 0.1)]  # low-prob trailing
        res = trimmer.clip_at_word_boundary(audio, sr, words)
        # low-prob " um" dropped as hallucination, then 1 trailing word dropped
        assert res.clipped_at_word_boundary
        assert res.transcription == "hello"
        assert abs(res.trimmed_duration - 0.5) < 0.01

    def test_drop_hallucinated_long_word(self):
        words = [Word("a", 0.0, 0.2, 0.9), Word("b", 0.2, 3.0, 0.9)]
        out = trimmer.drop_hallucinated_words(words)
        assert len(out) == 1


class TestPlayback:
    def test_ring_buffer_sink_roundtrip(self):
        import threading

        from tpu_audio.api.playback import RingBufferSink

        sink = RingBufferSink(16000, capacity_seconds=2.0)
        data = np.random.default_rng(0).standard_normal(8000).astype(np.float32) * 0.1
        out = []
        def consume():
            got = 0
            while got < len(data):
                piece = sink.read(1024)
                got += len(piece)
                out.append(piece)
        t = threading.Thread(target=consume)
        t.start()
        sink.write(AudioChunk(samples=data, sample_rate=16000))
        t.join(timeout=5)
        result = np.concatenate(out)
        assert len(result) == len(data)
        # volume boost then clip applied
        np.testing.assert_allclose(result, np.clip(data * 1.25, -0.98, 0.98),
                                   atol=1e-6)

    def test_file_sink(self, tmp_path):
        from tpu_audio.api.playback import FileSink
        from tpu_audio.utils.audio_io import read_wav

        sink = FileSink(str(tmp_path / "o.wav"), 24000)
        sink.write(AudioChunk(samples=np.zeros(2400, np.float32), sample_rate=24000))
        path = sink.close()
        x, sr = read_wav(path)
        assert sr == 24000 and len(x) == 2400


class TestProviders:
    def test_tts_provider_flags(self):
        from tpu_audio.api.providers import TTSProvider

        assert TTSProvider.COSYVOICE2.info.supports_voice_conversion
        assert not TTSProvider.KOKORO.info.supports_reference_audio
        assert "token" in TTSProvider.COSYVOICE3.info.streaming_granularities

    def test_languages(self):
        from tpu_audio.api.voice import Language

        langs = Language.all()
        assert len(langs) == 100
        assert Language("en").name == "English"


class TestRecorder:
    def test_push_pull(self):
        from tpu_audio.utils.recorder import AudioRecorder

        rec = AudioRecorder(target_rate=16000)
        rec.push(np.zeros(24000, np.float32), sample_rate=24000)  # resamples
        assert abs(rec.duration - 1.0) < 0.01
        chunk = rec.pull(0.5)
        assert chunk is not None and len(chunk) == 8000
        assert rec.pull(1.0) is None
        assert len(rec.drain()) > 0


class TestStreamingWavWriter:
    def test_progressive_write_matches_oneshot(self, tmp_path, rng):
        from tpu_audio.utils.audio_io import (StreamingWavWriter, read_wav,
                                              write_wav)

        samples = rng.standard_normal(12000).astype(np.float32) * 0.3
        p1 = str(tmp_path / "stream.wav")
        with StreamingWavWriter(p1, 16000, dtype="float32") as w:
            for i in range(0, len(samples), 1000):
                w.write(samples[i: i + 1000])
        p2 = str(tmp_path / "oneshot.wav")
        write_wav(p2, samples, 16000, dtype="float32")
        a, sra = read_wav(p1)
        b, srb = read_wav(p2)
        assert sra == srb == 16000
        np.testing.assert_array_equal(a, b)

    def test_int16_header_sizes(self, tmp_path):
        from tpu_audio.utils.audio_io import StreamingWavWriter, read_wav

        p = str(tmp_path / "i16.wav")
        w = StreamingWavWriter(p, 24000, dtype="int16")
        w.write(np.ones(2400, np.float32) * 0.5)
        w.write(np.ones(2400, np.float32) * -0.5)
        w.close()
        x, sr = read_wav(p)
        assert sr == 24000 and len(x) == 4800
        assert abs(float(x[0]) - 0.5) < 1e-3


class TestValidateReleaseHarness:
    """tools/validate_release.py plumbing (the network-dependent gates are
    exercised on launch day; here the scorecard machinery and failure
    accounting are pinned)."""

    def _mod(self):
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "validate_release", "tools/validate_release.py")
        m = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(m)
        return m

    def test_scorecard_pass_fail_accounting(self):
        m = self._mod()
        card = m.Scorecard()
        card.run("fam", "ok", lambda: {"x": 1})
        card.run("fam", "bad", lambda: (_ for _ in ()).throw(ValueError("no")))
        assert [r["status"] for r in card.rows] == ["pass", "FAIL"]
        assert card.rows[0]["detail"] == {"x": 1}
        assert "ValueError" in card.rows[1]["error"]

    def test_word_set_gate(self):
        m = self._mod()
        assert m._word_set("Hello, WORLD!") == {"hello", "world"}
        ref = m._word_set(m.LJ_TRANSCRIPT)
        assert len(ref) > 10 and "rifle" in ref
