"""Pallas kernel numerics in interpret mode (CPU).

The real kernels only engage on TPU (supported() gates the backend), so
these interpret-mode runs pin the kernel MATH in CI: block/grid indexing,
masking, padding and scale application — everything except Mosaic codegen.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpu_audio.ops.pallas.encoder_attention import encoder_attention
from tpu_audio.ops.pallas.int8_matmul import int8_matmul, quantize_rows


class TestInt8MatmulKernel:
    def test_exact_int32_accumulation(self, rng):
        b, i, o = 3, 256, 512
        x = jnp.asarray(rng.standard_normal((b, i)), jnp.float32) * 0.5
        w = jnp.asarray(rng.integers(-127, 128, (o, i)), jnp.int8)
        s = jnp.asarray(rng.uniform(0.001, 0.02, (o, 1)), jnp.float32)
        got = np.asarray(int8_matmul(x, w, s, block_o=256, interpret=True))
        xq, sx = quantize_rows(x)
        ref = (np.asarray(xq, np.int32) @ np.asarray(w, np.int32).T
               ).astype(np.float32) * np.asarray(sx) * np.asarray(s).T
        np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)

    def test_ragged_tail_rows(self, rng):
        """O not divisible by block_o: tail handled by the XLA int8 dot."""
        b, i, o = 2, 128, 300  # 300 = 256 + 44 tail
        x = jnp.asarray(rng.standard_normal((b, i)), jnp.float32)
        w = jnp.asarray(rng.integers(-127, 128, (o, i)), jnp.int8)
        s = jnp.asarray(rng.uniform(0.001, 0.02, (o, 1)), jnp.float32)
        got = np.asarray(int8_matmul(x, w, s, block_o=256, interpret=True))
        assert got.shape == (b, o)
        xq, sx = quantize_rows(x)
        ref = (np.asarray(xq, np.int32) @ np.asarray(w, np.int32).T
               ).astype(np.float32) * np.asarray(sx) * np.asarray(s).T
        np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)

    def test_quantize_rows_bounds(self, rng):
        x = jnp.asarray(rng.standard_normal((4, 64)), jnp.float32) * 10
        xq, sx = quantize_rows(x)
        assert int(jnp.max(jnp.abs(xq.astype(jnp.int32)))) <= 127
        rec = np.asarray(xq, np.float32) * np.asarray(sx)
        assert np.abs(rec - np.asarray(x)).max() <= float(sx.max()) * 0.51


class TestEncoderAttentionKernel:
    def _ref(self, q, k, v, scale):
        s = np.einsum("bqhd,bkhd->bhqk", np.asarray(q, np.float32),
                      np.asarray(k, np.float32)) * scale
        s = s - s.max(-1, keepdims=True)
        w = np.exp(s)
        w = w / w.sum(-1, keepdims=True)
        return np.einsum("bhqk,bkhd->bqhd", w, np.asarray(v, np.float32))

    def test_matches_reference_softmax(self, rng):
        b, t, h, d = 2, 640, 4, 64
        q = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.float32) * 0.3
        k = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.float32) * 0.3
        v = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.float32)
        got = np.asarray(encoder_attention(q, k, v, block_q=128,
                                           interpret=True))
        ref = self._ref(q, k, v, 1.0 / np.sqrt(d))
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)

    def test_ragged_t_masks_pad_keys(self, rng):
        """T=600 pads to 640; pad keys must not leak into the softmax."""
        b, t, h, d = 1, 600, 2, 64
        q = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.float32) * 0.3
        got = np.asarray(encoder_attention(q, q, q, block_q=128,
                                           interpret=True))
        ref = self._ref(q, q, q, 1.0 / np.sqrt(d))
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)

    def test_custom_scale(self, rng):
        b, t, h, d = 1, 512, 2, 64
        q = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.float32) * 0.3
        got = np.asarray(encoder_attention(q, q, q, block_q=256, scale=1.0,
                                           interpret=True))
        ref = self._ref(q, q, q, 1.0)
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)
