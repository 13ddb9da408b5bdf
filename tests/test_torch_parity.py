"""Independent cross-validation against torch (CPU).

Round-1's fidelity gates compared the JAX DSP against tests/ref_dsp.py —
a NumPy re-derivation by the same author, which can't catch a shared
misreading. torch is an INDEPENDENT implementation of the same primitives
(stft, conv1d, conv_transpose1d, group/layer norm, gelu), so agreement
here is real external evidence. Weights are random; tolerances are fp32.

Skipped automatically if torch is absent.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tpu_audio.nn import layers  # noqa: E402
from tpu_audio.ops import stft as stft_mod  # noqa: E402
from tpu_audio.ops import windows  # noqa: E402

pytestmark = pytest.mark.slow  # engine e2e / parity / mesh


class TestSTFT:
    def test_power_spectrum_matches_torch_stft(self, rng):
        n_fft, hop = 400, 160
        audio = rng.standard_normal(16000).astype(np.float32) * 0.1
        win = windows.hann(n_fft)
        ours = np.asarray(stft_mod.stft_power(jnp.asarray(audio),
                                              jnp.asarray(win), n_fft, hop))
        t = torch.stft(torch.from_numpy(audio), n_fft, hop_length=hop,
                       window=torch.from_numpy(np.asarray(win)),
                       center=True, pad_mode="reflect",
                       return_complex=True)
        ref = (t.abs() ** 2).numpy().T  # torch: (freq, frames) → (frames, freq)
        n = min(len(ours), ref.shape[0])
        np.testing.assert_allclose(ours[:n], ref[:n], rtol=1e-4, atol=1e-4)

    def test_hann_window_matches_torch(self):
        for periodic in (True, False):
            ours = np.asarray(windows.hann(400, periodic=periodic))
            ref = torch.hann_window(400, periodic=periodic).numpy()
            np.testing.assert_allclose(ours, ref, atol=1e-6)


class TestConvParity:
    def test_conv1d_matches_torch(self, rng):
        k, ci, co = 5, 8, 16
        w = rng.standard_normal((k, ci, co)).astype(np.float32) * 0.1
        b = rng.standard_normal(co).astype(np.float32) * 0.1
        x = rng.standard_normal((2, 37, ci)).astype(np.float32)
        for stride, pad, dil in ((1, 0, 1), (2, 2, 1), (1, 4, 2)):
            ours = np.asarray(layers.conv1d(
                {"weight": jnp.asarray(w), "bias": jnp.asarray(b)},
                jnp.asarray(x), stride=stride, padding=pad, dilation=dil))
            tw = torch.from_numpy(w.transpose(2, 1, 0))  # (K,I,O)→(O,I,K)
            ref = torch.nn.functional.conv1d(
                torch.from_numpy(x.transpose(0, 2, 1)), tw,
                torch.from_numpy(b), stride=stride, padding=pad,
                dilation=dil).numpy().transpose(0, 2, 1)
            np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)

    def test_grouped_conv1d_matches_torch(self, rng):
        k, c, groups = 7, 16, 4
        w = rng.standard_normal((k, c // groups, c)).astype(np.float32) * 0.1
        x = rng.standard_normal((1, 25, c)).astype(np.float32)
        ours = np.asarray(layers.conv1d({"weight": jnp.asarray(w)},
                                        jnp.asarray(x), padding=3,
                                        groups=groups))
        tw = torch.from_numpy(w.transpose(2, 1, 0))
        ref = torch.nn.functional.conv1d(
            torch.from_numpy(x.transpose(0, 2, 1)), tw, padding=3,
            groups=groups).numpy().transpose(0, 2, 1)
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)

    def test_conv_transpose1d_matches_torch(self, rng):
        """The trickiest layout in the codec vocoders (HiFT/DAC/SNAC ups)."""
        k, ci, co = 8, 12, 6
        # torch ConvTranspose1d weight: (in, out, K); ours: (K, I, O)
        wt = rng.standard_normal((ci, co, k)).astype(np.float32) * 0.1
        b = rng.standard_normal(co).astype(np.float32) * 0.1
        x = rng.standard_normal((1, 19, ci)).astype(np.float32)
        for stride, pad in ((4, 2), (2, 3), (1, 0)):
            ours = np.asarray(layers.conv_transpose1d(
                {"weight": jnp.asarray(wt.transpose(2, 0, 1)),
                 "bias": jnp.asarray(b)},
                jnp.asarray(x), stride=stride, padding=pad))
            ref = torch.nn.functional.conv_transpose1d(
                torch.from_numpy(x.transpose(0, 2, 1)),
                torch.from_numpy(wt), torch.from_numpy(b), stride=stride,
                padding=pad).numpy().transpose(0, 2, 1)
            np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


class TestNormActParity:
    def test_layer_norm_matches_torch(self, rng):
        d = 32
        w = rng.standard_normal(d).astype(np.float32)
        b = rng.standard_normal(d).astype(np.float32)
        x = rng.standard_normal((3, 7, d)).astype(np.float32)
        ours = np.asarray(layers.layer_norm(
            {"weight": jnp.asarray(w), "bias": jnp.asarray(b)},
            jnp.asarray(x)))
        ref = torch.nn.functional.layer_norm(
            torch.from_numpy(x), (d,), torch.from_numpy(w),
            torch.from_numpy(b)).numpy()
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)

    def test_group_norm_matches_torch(self, rng):
        c, g = 16, 4
        w = rng.standard_normal(c).astype(np.float32)
        b = rng.standard_normal(c).astype(np.float32)
        x = rng.standard_normal((2, 11, c)).astype(np.float32)
        ours = np.asarray(layers.group_norm(
            {"weight": jnp.asarray(w), "bias": jnp.asarray(b)},
            jnp.asarray(x), num_groups=g))
        ref = torch.nn.functional.group_norm(
            torch.from_numpy(x.transpose(0, 2, 1)), g, torch.from_numpy(w),
            torch.from_numpy(b)).numpy().transpose(0, 2, 1)
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)

    def test_gelu_variants_match_torch(self, rng):
        x = rng.standard_normal(128).astype(np.float32) * 3
        np.testing.assert_allclose(
            np.asarray(layers.gelu(jnp.asarray(x))),
            torch.nn.functional.gelu(torch.from_numpy(x)).numpy(),
            rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(jax.nn.gelu(jnp.asarray(x), approximate=True)),
            torch.nn.functional.gelu(torch.from_numpy(x),
                                     approximate="tanh").numpy(),
            rtol=1e-5, atol=1e-6)

    def test_silu_and_softmax_match_torch(self, rng):
        x = rng.standard_normal((4, 64)).astype(np.float32) * 2
        np.testing.assert_allclose(
            np.asarray(layers.silu(jnp.asarray(x))),
            torch.nn.functional.silu(torch.from_numpy(x)).numpy(),
            rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(jax.nn.softmax(jnp.asarray(x), axis=-1)),
            torch.softmax(torch.from_numpy(x), dim=-1).numpy(),
            rtol=1e-5, atol=1e-6)


class TestAttentionParity:
    def test_sdpa_matches_torch(self, rng):
        from tpu_audio.nn import attention

        b, t, h, d = 2, 9, 4, 16
        q = rng.standard_normal((b, t, h, d)).astype(np.float32)
        k = rng.standard_normal((b, t, h, d)).astype(np.float32)
        v = rng.standard_normal((b, t, h, d)).astype(np.float32)
        ours = np.asarray(attention.attend(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), None))
        tq = torch.from_numpy(q.transpose(0, 2, 1, 3))
        tk = torch.from_numpy(k.transpose(0, 2, 1, 3))
        tv = torch.from_numpy(v.transpose(0, 2, 1, 3))
        ref = torch.nn.functional.scaled_dot_product_attention(
            tq, tk, tv).numpy().transpose(0, 2, 1, 3)
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)

    def test_causal_sdpa_matches_torch(self, rng):
        from tpu_audio.nn import attention

        b, t, h, d = 1, 12, 2, 8
        q = rng.standard_normal((b, t, h, d)).astype(np.float32)
        k = rng.standard_normal((b, t, h, d)).astype(np.float32)
        v = rng.standard_normal((b, t, h, d)).astype(np.float32)
        mask = attention.causal_mask(t, t)
        ours = np.asarray(attention.attend(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), mask))
        ref = torch.nn.functional.scaled_dot_product_attention(
            torch.from_numpy(q.transpose(0, 2, 1, 3)),
            torch.from_numpy(k.transpose(0, 2, 1, 3)),
            torch.from_numpy(v.transpose(0, 2, 1, 3)),
            is_causal=True).numpy().transpose(0, 2, 1, 3)
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)
