"""AudioSamplePlayer state-machine tests (headless clock backend).

Covers the reference AudioSamplePlayer semantics
(package/Audio/AudioSamplePlayer.swift:10-284): prebuffer gating, queued
count accounting, drain blocking, stop() releasing waiters, play() boost +
clip, and the PlayerSink streaming adapter. time_scale=0 makes the clock
consumer run as fast as the thread scheduler allows, so the suite stays
fast and deterministic.
"""

import threading
import time

import numpy as np
import pytest

from tpu_audio.api.player import AudioSamplePlayer
from tpu_audio.utils import constants


def make_player(**kw):
    kw.setdefault("backend", "clock")
    kw.setdefault("time_scale", 0.0)
    return AudioSamplePlayer(sample_rate=16000, **kw)


def wait_until(pred, timeout=5.0):
    t0 = time.time()
    while time.time() - t0 < timeout:
        if pred():
            return True
        time.sleep(0.002)
    return False


class TestEnqueueDrain:
    def test_enqueue_starts_and_drains(self):
        p = make_player()
        try:
            p.enqueue(np.ones(1600, np.float32) * 0.1)
            assert p.has_started_playback or p.queued_sample_count == 0
            p.await_drain(timeout=5.0)
            assert p.queued_sample_count == 0
            assert not p.is_playing
        finally:
            p.close()

    def test_prebuffer_gates_start(self):
        p = make_player()
        try:
            # 100 ms enqueued, 200 ms prebuffer → must NOT start
            p.enqueue(np.ones(1600, np.float32) * 0.1, prebuffer_seconds=0.2)
            time.sleep(0.05)
            assert not p.has_started_playback
            assert p.queued_sample_count == 1600  # nothing consumed yet
            # crossing the prebuffer threshold starts playback
            p.enqueue(np.ones(1600, np.float32) * 0.1, prebuffer_seconds=0.2)
            assert wait_until(lambda: p.queued_sample_count == 0)
        finally:
            p.close()

    def test_queued_count_decrements(self):
        p = make_player()
        try:
            p.enqueue(np.ones(8000, np.float32) * 0.1)
            assert wait_until(lambda: p.queued_sample_count == 0)
            p.await_drain(timeout=5.0)
            assert not p.is_playing
        finally:
            p.close()


class TestStop:
    def test_stop_releases_drain_waiters(self):
        p = make_player(time_scale=1.0)  # real-time: won't drain on its own
        try:
            p.enqueue(np.ones(16000, np.float32) * 0.1)  # 1 s of audio
            released = threading.Event()

            def waiter():
                p.await_drain(timeout=10.0)
                released.set()

            t = threading.Thread(target=waiter, daemon=True)
            t.start()
            time.sleep(0.05)
            assert not released.is_set()
            p.stop()
            assert released.wait(timeout=2.0)
            assert p.queued_sample_count == 0 and not p.is_playing
        finally:
            p.close()

    def test_enqueue_after_stop_restarts(self):
        p = make_player()
        try:
            p.enqueue(np.ones(800, np.float32) * 0.1)
            p.stop()
            p.enqueue(np.ones(800, np.float32) * 0.1)
            p.await_drain(timeout=5.0)
            assert p.queued_sample_count == 0
        finally:
            p.close()


class TestPlay:
    def test_play_blocks_until_done(self):
        p = make_player()
        try:
            t0 = time.time()
            p.play(np.ones(1600, np.float32) * 0.5)
            assert p.queued_sample_count == 0
            assert not p.is_playing
            assert time.time() - t0 < 5.0
        finally:
            p.close()

    def test_play_empty_is_noop(self):
        p = make_player()
        try:
            p.play(np.zeros(0, np.float32))
            assert not p.is_playing
        finally:
            p.close()


class TestBackendSelection:
    def test_clock_fallback_headless(self):
        # no sounddevice in this image → auto pick must not raise
        p = AudioSamplePlayer(sample_rate=16000, time_scale=0.0)
        assert p.backend in ("clock", "sounddevice")
        p.close()

    def test_null_backend_drains(self):
        p = AudioSamplePlayer(sample_rate=16000, backend="null")
        try:
            p.enqueue(np.ones(16000, np.float32) * 0.1)
            p.await_drain(timeout=5.0)
            assert p.queued_sample_count == 0
        finally:
            p.close()


class TestPlayerSink:
    def test_say_through_player_sink(self):
        """engine.say() with a PlayerSink plays (headless clock) and the
        result still carries the full audio."""
        from tpu_audio.api.playback import PlayerSink
        from tpu_audio.api.tts import (AudioChunk, StreamingGranularity,
                                       TTSEngineBase)

        class FakeEngine(TTSEngineBase):
            sample_rate = 16000
            supported_streaming_granularities = (
                StreamingGranularity.SENTENCE,)

            def load(self, progress_handler=None):
                self.is_loaded = True

            def generate_streaming(self, text, granularity=None, **kw):
                for i in range(3):
                    yield AudioChunk(
                        samples=np.ones(800, np.float32) * 0.1,
                        sample_rate=16000, text=text, is_final=i == 2)

        eng = FakeEngine()
        player = make_player()
        sink = PlayerSink(16000, player=player, prebuffer_seconds=0.0)
        res = eng.say("hi", sink=sink)
        assert res.audio.samples.shape == (2400,)
        assert player.queued_sample_count == 0
        assert not eng.is_playing
        player.close()


class TestEngineSerialization:
    """TTSEngineBase actor-equivalent contract: concurrent generations
    serialize on the engine lock; stop() stays lock-free."""

    def _engine(self):
        from tpu_audio.api.tts import (AudioChunk, StreamingGranularity,
                                       TTSEngineBase)

        class SlowEngine(TTSEngineBase):
            sample_rate = 16000

            def load(self, progress_handler=None):
                self.is_loaded = True

            def generate_streaming(self, text, granularity=None, **kw):
                for i in range(4):
                    self._check_stopped()
                    time.sleep(0.03)
                    yield AudioChunk(samples=np.ones(160, np.float32),
                                     sample_rate=16000, text=text,
                                     is_final=i == 3)

        return SlowEngine()

    def test_concurrent_generations_serialize(self):
        eng = self._engine()
        order = []

        def run(tag):
            for _ in eng.generate_streaming(tag):
                order.append(tag)

        t1 = threading.Thread(target=run, args=("a",))
        t2 = threading.Thread(target=run, args=("b",))
        t1.start()
        time.sleep(0.01)
        t2.start()
        t1.join(5)
        t2.join(5)
        # no interleaving: all of one stream before any of the other
        assert order == sorted(order, key=lambda x: order.index(x))
        a_last = max(i for i, t in enumerate(order) if t == order[0])
        b_first = min(i for i, t in enumerate(order) if t != order[0])
        assert a_last < b_first

    def test_stop_is_lock_free_mid_generation(self):
        from tpu_audio.api.tts import GenerationStopped

        eng = self._engine()
        stopped = threading.Event()

        def run():
            try:
                for _ in eng.generate_streaming("x"):
                    pass
            except GenerationStopped:
                stopped.set()

        t = threading.Thread(target=run)
        t.start()
        time.sleep(0.04)
        eng.stop()  # must not block on the generation lock
        t.join(5)
        assert stopped.is_set()


class TestAudioFilePlayer:
    """AudioFilePlayer parity (Audio/AudioFilePlayer.swift): load/play/
    pause/seek/stop with progress tracking, headless clock backend."""

    def _wav(self, tmp_path):
        from tpu_audio.utils.audio_io import write_wav

        path = str(tmp_path / "clip.wav")
        write_wav(path, np.ones(16000, np.float32) * 0.1, 16000)
        return path

    def test_load_play_to_end(self, tmp_path):
        from tpu_audio.api.player import AudioFilePlayer

        p = AudioFilePlayer(backend="clock", time_scale=0.0)
        p.load(self._wav(tmp_path))
        assert p.duration == pytest.approx(1.0, abs=0.01)
        p.play()
        assert wait_until(lambda: not p.is_playing)
        assert p.current_time == pytest.approx(p.duration, abs=0.05)
        p.stop()
        assert p.current_time == 0.0

    def test_pause_resume_and_seek(self, tmp_path):
        from tpu_audio.api.player import AudioFilePlayer

        p = AudioFilePlayer(backend="clock", time_scale=1.0)
        p.load(self._wav(tmp_path))
        p.play()
        time.sleep(0.08)
        p.pause()
        t1 = p.current_time
        assert 0 < t1 < 1.0
        time.sleep(0.05)
        assert p.current_time == t1  # paused: no progress
        p.seek(0.5)
        assert p.current_time == pytest.approx(0.5, abs=0.01)
        p.toggle_play_pause()
        assert p.is_playing
        p.stop()
