"""Fused Pallas mel kernel: interpreter-mode parity on CPU (the real-TPU
run is exercised by bench.py / verification drives)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


class TestFusedMelInterpret:
    def test_parity_vs_xla_path(self, rng, monkeypatch):
        import jax.experimental.pallas as pl

        from tpu_audio.ops import frontends
        from tpu_audio.ops.pallas import fused_mel

        orig = pl.pallas_call

        def interp(*a, **k):
            k["interpret"] = True
            return orig(*a, **k)

        monkeypatch.setattr(pl, "pallas_call", interp)

        audio = (rng.standard_normal(480000) * 0.1).astype(np.float32)
        got = np.asarray(fused_mel.whisper_log_mel_pallas(
            jnp.asarray(audio), n_mels=80))
        ref = np.asarray(frontends.whisper_log_mel(jnp.asarray(audio),
                                                   n_mels=80))
        assert got.shape == ref.shape
        np.testing.assert_allclose(got, ref, atol=1e-4)
