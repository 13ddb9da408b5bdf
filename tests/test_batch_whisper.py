"""Batched Whisper decode: parity with the single-segment decoder."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_audio.models.whisper import batch as wbatch
from tpu_audio.models.whisper import model as wmodel
from tpu_audio.models.whisper.config import WhisperConfig
from tpu_audio.models.whisper.decoding import SegmentDecoder
from tpu_audio.models.whisper.tokenizer import BPE, WhisperTokenizer

pytestmark = pytest.mark.slow  # engine e2e / parity / mesh

TINY = WhisperConfig(n_audio_state=64, n_audio_head=4, n_audio_layer=2,
                     n_text_state=64, n_text_head=4, n_text_layer=2,
                     n_text_ctx=32)


@pytest.fixture(scope="module")
def setup():
    params = wmodel.init_params(jax.random.PRNGKey(0), TINY)
    tok = WhisperTokenizer(BPE({bytes([i]): i for i in range(256)}), True, 99)
    return params, tok


class TestBatchDecoder:
    def test_matches_single_segment(self, setup, rng):
        params, tok = setup
        dec = wbatch.BatchSegmentDecoder(params, TINY, tok, batch_size=4,
                                         compute_dtype=jnp.float32)
        mels = rng.standard_normal((4, 3000, 80)).astype(np.float32) * 0.1
        batch_res = dec.decode_batch(mels, temperature=0.0)

        single = SegmentDecoder(params, TINY, tok)
        for r in range(4):
            ref = single.decode(mels[r], temperature=0.0)
            assert batch_res[r].tokens == ref.tokens, f"row {r} diverged"

    def test_kv_int8_batch_decode_runs(self, setup, rng):
        """kv_int8=True (int8 cross-K/V serving state; CPU takes the XLA
        dequant path) decodes end-to-end through the batch loop. Token-level
        parity is NOT asserted here: random tiny-model logits are near-ties,
        so the int8 rounding legitimately flips argmaxes and the sequences
        diverge — logit-level parity (cosine > 0.999) and real-shape greedy
        agreement are pinned in tests/test_cross_kv_attention.py and by
        bench.py's on-chip token-agreement check."""
        params, tok = setup
        mels = rng.standard_normal((2, 3000, 80)).astype(np.float32) * 0.1
        q8 = wbatch.BatchSegmentDecoder(params, TINY, tok, batch_size=2,
                                        compute_dtype=jnp.float32,
                                        kv_int8=True
                                        ).decode_batch(mels, temperature=0.0)
        assert len(q8) == 2
        for r in q8:
            assert len(r.tokens) > 0
            assert all(0 <= t_ < TINY.n_vocab for t_ in r.tokens)
            assert np.isfinite(r.avg_logprob)

    def test_transcribe_windows_multi_clip(self, setup):
        params, tok = setup
        texts = wbatch.transcribe_windows(
            params, TINY, tok,
            [np.zeros(16000 * 2, np.float32), np.zeros(16000 * 35, np.float32)],
            batch_size=4, temperature=0.0)
        assert len(texts) == 2
        assert all(isinstance(t, str) for t in texts)


def test_engine_transcribe_batch(setup):
    """Public-surface batch API: WhisperEngine.transcribe_batch wraps
    transcribe_windows (one text per clip, state flags maintained)."""
    from tpu_audio.api.stt import WhisperEngine
    from tpu_audio.models.whisper.pipeline import WhisperPipeline

    params, tok = setup
    eng = WhisperEngine.from_pipeline(WhisperPipeline(params, TINY, tok))
    rng = np.random.default_rng(0)
    clips = [rng.standard_normal(16000).astype(np.float32) * 0.05
             for _ in range(3)]
    texts = eng.transcribe_batch(clips, batch_size=2)
    assert len(texts) == 3
    assert all(isinstance(t, str) for t in texts)
    assert not eng.is_transcribing
    assert eng.transcription_time > 0
