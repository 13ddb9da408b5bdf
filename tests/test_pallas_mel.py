"""Fused Pallas mel kernel: interpreter-mode parity on CPU (the real-TPU
run is exercised by bench.py / verification drives)."""

import jax.numpy as jnp
import numpy as np


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


class TestQuantMatmulInterpret:
    def test_parity_vs_dequant(self, rng, monkeypatch):
        import jax.experimental.pallas as pl
        import jax.numpy as jnp

        from tpu_audio.ops import quant
        from tpu_audio.ops.pallas import quant_matmul as qmm

        orig = pl.pallas_call

        def interp(*a, **k):
            k["interpret"] = True
            return orig(*a, **k)

        monkeypatch.setattr(pl, "pallas_call", interp)

        w = rng.standard_normal((300, 256)).astype(np.float32) * 0.05
        q = {k: jnp.asarray(v) for k, v in quant.quantize_array(w, 4).items()}
        x = jnp.asarray(rng.standard_normal((3, 256)).astype(np.float32))
        got = np.asarray(qmm.quant_matmul(x, q["weight_q4"], q["scales"],
                                          q["biases"], bits=4))
        ref = np.asarray(x) @ np.asarray(quant.dequantize(q)).T
        np.testing.assert_allclose(got, ref, rtol=2e-2, atol=2e-3)

    def test_expand_tree(self, rng):
        import jax.numpy as jnp

        from tpu_audio.ops import quant

        w = rng.standard_normal((64, 128)).astype(np.float32)
        tree = {"layers": {"attn": {"q": {
            k: jnp.asarray(v) for k, v in quant.quantize_array(w, 4).items()
        }}}}
        out = quant.expand_tree_for_kernel(tree)  # identity since the
        # kernel expands scales in-kernel; loaders still call it
        assert "scales" in out["layers"]["attn"]["q"]
        assert "weight_q4" in out["layers"]["attn"]["q"]
