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


class TestInt8BigM:
    """Large-M W8A8 GEMM (int8_matmul_bigm): the int8-MXU encoder/prefill
    path. Exact vs the reference int8 semantics; close to the fp matmul."""

    def test_matches_int8_reference(self, rng):
        from tpu_audio.ops.pallas.int8_matmul import int8_matmul_bigm

        m, i, o = 300, 256, 384
        x = jnp.asarray(rng.standard_normal((m, i)), jnp.float32)
        w = jnp.asarray(rng.integers(-127, 128, (o, i)), jnp.int8)
        s = jnp.asarray(rng.uniform(0.001, 0.02, (o, 1)), jnp.float32)
        got = np.asarray(int8_matmul_bigm(x, w, s))
        xq, sx = quantize_rows(x)
        ref = (np.asarray(xq, np.int64) @ np.asarray(w, np.int64).T
               ).astype(np.float32) * np.asarray(sx) * np.asarray(s).T
        np.testing.assert_allclose(got, ref, rtol=1e-5)

    def test_close_to_fp_matmul(self, rng):
        """Activation-int8 rounding error stays small on encoder-like
        statistics (the accuracy basis for the w8a8 whisper encoder)."""
        from tpu_audio.ops.pallas.int8_matmul import int8_matmul_bigm
        from tpu_audio.ops.quant import quantize_array_int8

        m, i, o = 512, 1280, 1280
        x = jnp.asarray(rng.standard_normal((m, i)), jnp.float32)
        wf = rng.standard_normal((o, i)).astype(np.float32) * 0.02
        q = quantize_array_int8(wf)
        got = np.asarray(int8_matmul_bigm(x, jnp.asarray(q["weight_i8"]),
                                          jnp.asarray(q["scale_i8"])))
        ref = np.asarray(x) @ wf.T
        cos = (got * ref).sum() / (np.linalg.norm(got) * np.linalg.norm(ref))
        assert cos > 0.9995


class TestWhisperW8A8Serving:
    """serve_tree_int8: block matmul weights convert to per-channel int8,
    everything else stays fp, and the whisper forward still runs with
    logits close to the fp model."""

    def test_tree_structure_and_logit_cosine(self, rng):
        import jax as _jax

        from tpu_audio.models.whisper import load as wload
        from tpu_audio.models.whisper import model as wmodel
        from tpu_audio.models.whisper.config import WhisperConfig

        cfg = WhisperConfig(n_mels=80, n_audio_ctx=100, n_audio_state=128,
                            n_audio_head=4, n_audio_layer=2, n_vocab=1000,
                            n_text_ctx=24, n_text_state=128, n_text_head=4,
                            n_text_layer=2)
        params = wmodel.init_params(_jax.random.PRNGKey(0), cfg)
        qp = wload.serve_tree_int8(params)
        blk = qp["encoder"]["blocks"]
        assert "weight_i8" in blk["attn"]["q"]
        assert blk["attn"]["q"]["weight_i8"].shape[0] == 2  # stacked layers
        assert "weight" in qp["encoder"]["conv1"]  # convs stay fp
        # round 3: the decoder quantizes too (stacked scalar-prefetch
        # kernels removed the scan-slice copy objection), incl. the tied
        # embedding (int8 lm_head dot + row-dequant gather)
        assert "weight_i8" in qp["decoder"]["blocks"]["attn"]["q"]
        assert "weight_i8" in qp["decoder"]["blocks"]["cross_attn"]["k"]
        assert "weight_i8" in qp["decoder"]["token_embedding"]
        assert "weight" in qp["decoder"]["ln"]  # norms stay fp
        # decoder=False keeps the old encoder-only behavior
        enc_only = wload.serve_tree_int8(params, decoder=False)
        assert "weight" in enc_only["decoder"]["blocks"]["attn"]["q"]

        mel = jnp.asarray(rng.standard_normal((1, 200, 80)), jnp.float32) * .1
        ref_feats = np.asarray(wmodel.encode(params, cfg, mel))
        got_feats = np.asarray(wmodel.encode(qp, cfg, mel))
        cos = (ref_feats * got_feats).sum() / (
            np.linalg.norm(ref_feats) * np.linalg.norm(got_feats))
        assert cos > 0.999

        toks = jnp.asarray([[1, 2, 3]], jnp.int32)
        st_r = wmodel.init_state(params, cfg, jnp.asarray(ref_feats))
        st_q = wmodel.init_state(qp, cfg, jnp.asarray(got_feats))
        lr, st_r = wmodel.decode_step(params, cfg, toks, st_r)
        lq, st_q = wmodel.decode_step(qp, cfg, toks, st_q)
        a, b = np.asarray(lr).ravel(), np.asarray(lq).ravel()
        cos = (a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b))
        assert cos > 0.99, cos
        # single-token decode steps (the stacked-kernel path on TPU; the
        # exact-dequant fallback on CPU) stay aligned over a short rollout
        for _ in range(3):
            nxt = jnp.argmax(np.asarray(lr)[:, -1], axis=-1
                             ).astype(jnp.int32)[:, None]
            lr, st_r = wmodel.decode_step(params, cfg, nxt, st_r)
            lq, st_q = wmodel.decode_step(qp, cfg, nxt, st_q)
            a, b = np.asarray(lr).ravel(), np.asarray(lq).ravel()
            cos = (a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b))
            assert cos > 0.99, cos

    def test_kv_int8_composes_with_int8_decoder(self, rng):
        """The two serving options stack: int8 decoder weights + int8
        cross-KV state."""
        import jax as _jax

        from tpu_audio.models.whisper import load as wload
        from tpu_audio.models.whisper import model as wmodel
        from tpu_audio.models.whisper.config import WhisperConfig

        cfg = WhisperConfig(n_mels=80, n_audio_ctx=64, n_audio_state=128,
                            n_audio_head=4, n_audio_layer=1, n_vocab=500,
                            n_text_ctx=16, n_text_state=128, n_text_head=4,
                            n_text_layer=2)
        params = wmodel.init_params(_jax.random.PRNGKey(1), cfg)
        qp = wload.serve_tree_int8(params)
        feats = jnp.asarray(rng.standard_normal(
            (1, cfg.n_audio_ctx, cfg.n_audio_state)) * 0.3, jnp.float32)
        st_r = wmodel.init_state(params, cfg, feats)
        st_q = wmodel.init_state(qp, cfg, feats, kv_int8=True)
        toks = jnp.asarray([[3, 5]], jnp.int32)
        lr, st_r = wmodel.decode_step(params, cfg, toks, st_r)
        lq, st_q = wmodel.decode_step(qp, cfg, toks, st_q)
        for _ in range(3):
            nxt = jnp.argmax(np.asarray(lr)[:, -1], axis=-1
                             ).astype(jnp.int32)[:, None]
            lr, st_r = wmodel.decode_step(params, cfg, nxt, st_r)
            lq, st_q = wmodel.decode_step(qp, cfg, nxt, st_q)
            a, b = np.asarray(lr).ravel(), np.asarray(lq).ravel()
            cos = (a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b))
            assert cos > 0.99, cos


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

    @pytest.mark.parametrize("t", [600, 1100])
    def test_block_q_not_dividing_t_pad(self, rng, t):
        """Regression: with the default block_q=512 and t_pad not a
        multiple of it (600→640, 1100→1152), the grid used to cover only
        t_pad // 512 blocks, leaving the trailing q-rows uncomputed (NaN).
        The kernel now shrinks block_q to a divisor of t_pad."""
        b, h, d = 1, 2, 64
        q = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.float32) * 0.3
        got = np.asarray(encoder_attention(q, q, q, interpret=True))
        assert np.isfinite(got).all()
        ref = self._ref(q, q, q, 1.0 / np.sqrt(d))
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)

    def test_packed_pairs_match_plain(self, rng):
        """encoder_attention_packed (head pairs channel-concatenated to 128
        lanes, block-diagonal q built in-kernel) must match the plain
        kernel to float tolerance."""
        from tpu_audio.ops.pallas.encoder_attention import (
            encoder_attention_packed)

        b, t, h, d = 2, 600, 4, 64
        q = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.float32) * 0.3
        k = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.float32) * 0.3
        v = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.float32)
        ref = np.asarray(encoder_attention(q, k, v, interpret=True))

        def pack(x):
            xp = jnp.transpose(x, (0, 2, 1, 3)).reshape(b, h // 2, 2, t, d)
            return jnp.transpose(xp, (0, 1, 3, 2, 4)).reshape(
                b * h // 2, t, 2 * d)

        op = encoder_attention_packed(pack(q), pack(k), pack(v),
                                      interpret=True)
        ou = jnp.transpose(op.reshape(b, h // 2, t, 2, d),
                           (0, 1, 3, 2, 4)).reshape(b, h, t, d)
        ou = np.asarray(jnp.transpose(ou, (0, 2, 1, 3)))
        np.testing.assert_allclose(ou, ref, rtol=1e-5, atol=1e-6)

    def test_pre_bh_layout_identical(self, rng):
        """pre_bh=True (caller-supplied head-major layout) must match the
        (B, T, H, D) entry bit-for-bit."""
        b, t, h, d = 2, 600, 4, 64
        q = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.float32) * 0.3
        k = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.float32) * 0.3
        v = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.float32)
        a = encoder_attention(q, k, v, interpret=True)

        def bh(x):
            return jnp.transpose(x, (0, 2, 1, 3)).reshape(b * h, t, d)

        ob = encoder_attention(bh(q), bh(k), bh(v), interpret=True,
                               pre_bh=True)
        o2 = jnp.transpose(ob.reshape(b, h, t, d), (0, 2, 1, 3))
        assert float(jnp.max(jnp.abs(a - o2))) == 0.0

    def test_self_attention_packed_projection_algebra(self, rng, monkeypatch):
        """The whisper _self_attention pair-packed branch (weight reshapes
        to (g, 2, hd, d), pack einsums, output unpack) must match the plain
        XLA path. The kernel gate is TPU-only, so force it on and route the
        kernels through interpret mode."""
        import functools

        from tpu_audio.models.whisper import model as wmodel
        from tpu_audio.ops.pallas import encoder_attention as ea

        monkeypatch.setattr(ea, "supported", lambda q, k, m: True)
        monkeypatch.setattr(
            ea, "encoder_attention_packed",
            functools.partial(ea.encoder_attention_packed, interpret=True))
        monkeypatch.setattr(
            ea, "encoder_attention",
            functools.partial(ea.encoder_attention, interpret=True))

        b, t, h, d = 2, 600, 4, 256  # hd = 64 -> packed-eligible
        p = {
            name: {"weight": jnp.asarray(
                       rng.standard_normal((d, d)), jnp.float32) * 0.05,
                   "bias": jnp.asarray(
                       rng.standard_normal((d,)), jnp.float32) * 0.01}
            for name in ("q", "k", "v", "o")}
        x = jnp.asarray(rng.standard_normal((b, t, d)), jnp.float32) * 0.3

        monkeypatch.setattr(wmodel, "PACKED_ATTN", True)
        got = np.asarray(wmodel._self_attention(p, x, h))
        # plain reference: disable the kernel gate entirely
        monkeypatch.setattr(ea, "supported", lambda q, k, m: False)
        ref = np.asarray(wmodel._self_attention(p, x, h))
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)


class TestW4A8Matmul:
    """W4A8 kernel (ops/pallas/w4a8_matmul.py): packed int4 → in-kernel int8
    unpack → per-group MXU dots. Interpret mode pins the nibble packing,
    group-scale segmentation, k-accumulation grid, and the affine-bias term."""

    def _quantized(self, rng, o, i):
        from tpu_audio.ops import quant

        w = rng.standard_normal((o, i)).astype(np.float32) * 0.05
        qd = {k: jnp.asarray(v)
              for k, v in quant.quantize_array(w, bits=4, group=64).items()}
        return qd, quant.repack_w4a8(qd)

    def _reference(self, x, qd):
        """Exact kernel semantics: int8 activations on the scale term,
        exact f32 x on the group-bias term."""
        from tpu_audio.ops import quant
        from tpu_audio.ops.pallas.int8_matmul import quantize_rows

        i = x.shape[-1]
        g = i // 64
        xq, sx = quantize_rows(jnp.asarray(x))
        xdq = np.asarray(xq, np.float32) * np.asarray(sx)
        qv = np.asarray(quant.unpack_uint32(qd["weight_q4"], 4), np.float32)
        sfull = np.repeat(np.asarray(qd["scales"]), 64, axis=-1)
        return (xdq @ (qv * sfull).T
                + x.reshape(-1, g, 64).sum(-1) @ np.asarray(qd["biases"]).T)

    def test_matches_reference(self, rng):
        from tpu_audio.ops.pallas.w4a8_matmul import w4a8_matmul

        x = rng.standard_normal((3, 1024)).astype(np.float32)
        qd, p = self._quantized(rng, 512, 1024)
        got = np.asarray(w4a8_matmul(jnp.asarray(x), p["weight_q4p"],
                                     p["scales"], p["biases"], block_o=256,
                                     interpret=True))
        ref = self._reference(x, qd)
        assert np.abs(got - ref).max() < 1e-4 * np.abs(ref).max() + 1e-5

    def test_ragged_tail_rows(self, rng):
        from tpu_audio.ops.pallas.w4a8_matmul import w4a8_matmul

        x = rng.standard_normal((2, 1024)).astype(np.float32)
        qd, p = self._quantized(rng, 640, 1024)  # 640 = 2*256 + 128 tail
        got = np.asarray(w4a8_matmul(jnp.asarray(x), p["weight_q4p"],
                                     p["scales"], p["biases"], block_o=256,
                                     interpret=True))
        ref = self._reference(x, qd)
        assert got.shape == (2, 640)
        assert np.abs(got - ref).max() < 1e-4 * np.abs(ref).max() + 1e-5

    def test_repack_roundtrip(self, rng):
        from tpu_audio.ops import quant

        qd, p = self._quantized(rng, 128, 384)
        wa = np.asarray(quant.dequantize(qd))
        wb = np.asarray(quant.dequantize_w4a8(p))
        assert np.abs(wa - wb).max() < 1e-6

    def test_w4a8_linear_fallback_matches(self, rng):
        """Prefill-shaped inputs route to the XLA dequant path; same math
        up to activation-int8 rounding."""
        from tpu_audio.ops import quant

        qd, p = self._quantized(rng, 128, 256)
        x = rng.standard_normal((64, 256)).astype(np.float32)  # rows > 32
        y = np.asarray(quant.w4a8_linear(p, jnp.asarray(x)))
        wref = np.asarray(quant.dequantize(qd))
        assert np.abs(y - x @ wref.T).max() < 1e-4

    def test_fuse_w4a8_tree(self, rng):
        from tpu_audio.ops import quant

        _, q = self._quantized(rng, 128, 256)
        _, k = self._quantized(rng, 64, 256)
        _, v = self._quantized(rng, 64, 256)
        tree = {"attn": {"q": q, "k": k, "v": v}}
        fused = quant.fuse_w4a8_tree(tree)
        assert "qkv" in fused["attn"]
        wf = np.asarray(quant.dequantize_w4a8(fused["attn"]["qkv"]))
        ws = np.concatenate([np.asarray(quant.dequantize_w4a8(d))
                             for d in (q, k, v)], axis=0)
        assert np.abs(wf - ws).max() < 1e-6

    def test_small_pair_count_single_step(self, rng):
        """TP-sharded widths: p=12 pairs (I=1536) has no divisor that is a
        multiple of 8, so the kernel runs one k-step with sublane-padded
        scale planes (_pick_pps fallback)."""
        from tpu_audio.ops.pallas.w4a8_matmul import _pick_pps, w4a8_matmul

        assert _pick_pps(12, 24) == 12
        assert _pick_pps(6, 24) == 6
        x = rng.standard_normal((2, 1536)).astype(np.float32)
        qd, p = self._quantized(rng, 256, 1536)
        got = np.asarray(w4a8_matmul(jnp.asarray(x), p["weight_q4p"],
                                     p["scales"], p["biases"], block_o=256,
                                     interpret=True))
        ref = self._reference(x, qd)
        assert np.abs(got - ref).max() < 1e-4 * np.abs(ref).max() + 1e-5


class TestW4A8SuperGroup:
    """k=128 super-group W4A8 (VERDICT r2 #6): signed-int4 recode against
    one f32 scale per 256 columns; the kernel's nibble-plane dots double
    their contraction depth. Exact kernel semantics + bounded recode loss."""

    def _leaf(self, rng, o=128, i=512):
        from tpu_audio.ops import quant

        w = (rng.standard_normal((o, i)) * 0.02).astype(np.float32)
        ga = quant.quantize_array(w, bits=4, group=64)
        return w, {k: jnp.asarray(v) for k, v in ga.items()}

    def test_recode_cosine_vs_float(self, rng):
        """Both formats against the ORIGINAL float weights: the super-group
        recode may cost at most ~3x the group-affine quantization error
        (it re-quantizes already-quantized values at ~2x coarser step)."""
        from tpu_audio.ops import quant

        w, ga = self._leaf(rng)

        def cos(a, b):
            return (a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b))

        ga_deq = np.asarray(quant.dequantize(ga))
        sg = quant.requantize_w4a8_sg(ga)
        sg_deq = np.asarray(quant.dequantize_w4a8_sg(sg))
        c_ga, c_sg = cos(ga_deq, w), cos(sg_deq, w)
        assert c_sg > 0.985, (c_sg, c_ga)
        assert (1 - c_sg) <= 3.0 * (1 - c_ga), (c_sg, c_ga)
        # storage really is 0.5 B/weight + 1 f32 per 256 weights
        assert sg["weight_q4s"].size == w.size // 2
        assert sg["scales_sg"].size == w.size // 256

    def test_kernel_matches_reference_semantics(self, rng):
        from tpu_audio.ops import quant
        from tpu_audio.ops.pallas import w4a8_matmul as w4
        from tpu_audio.ops.pallas.int8_matmul import quantize_rows

        _, ga = self._leaf(rng, o=128, i=512)
        sg = quant.requantize_w4a8_sg(ga)
        x = jnp.asarray(rng.standard_normal((4, 512)), jnp.float32)
        got = np.asarray(w4.w4a8_sg_matmul(x, sg["weight_q4s"],
                                           sg["scales_sg"], block_o=128,
                                           interpret=True))
        xq, sx = quantize_rows(x)
        wref = np.asarray(quant.dequantize_w4a8_sg(sg))
        ref = (np.asarray(xq, np.float32) @ wref.T) * np.asarray(sx)
        np.testing.assert_allclose(got, ref, rtol=2e-5, atol=1e-5)

    def test_stacked_kernel_matches_plain(self, rng):
        from tpu_audio.ops import quant
        from tpu_audio.ops.pallas import w4a8_matmul as w4

        _, ga = self._leaf(rng, o=128, i=512)
        sg = quant.requantize_w4a8_sg(ga)
        wp_st = jnp.stack([sg["weight_q4s"], sg["weight_q4s"] ^ 1])
        s_st = jnp.stack([sg["scales_sg"], sg["scales_sg"] * 1.1])
        x = jnp.asarray(rng.standard_normal((2, 512)), jnp.float32)
        for l in (0, 1):
            got = np.asarray(w4.w4a8_sg_matmul_stacked(
                x, wp_st, s_st[l], jnp.int32(l), block_o=128,
                interpret=True))
            want = np.asarray(w4.w4a8_sg_matmul(
                x, wp_st[l], s_st[l], block_o=128, interpret=True))
            np.testing.assert_allclose(got, want, rtol=1e-6)

    def test_tree_requantize_and_decode(self, rng):
        """Whole-tree conversion: fused qkv/gateup leaves, CPU fallback
        decode close to the exact-dequant q4 decode."""
        from tpu_audio.models.orpheus.model import CausalLMGenerator
        from tpu_audio.nn import transformer
        from tpu_audio.ops import quant
        from tpu_audio.ops.sampling import SamplerConfig

        cfg = transformer.TransformerConfig(
            dim=256, n_layers=2, n_heads=4, n_kv_heads=2, hidden_dim=512,
            vocab_size=96, tie_word_embeddings=True)
        params = transformer.init_params(jax.random.PRNGKey(1), cfg)
        qp = jax.tree_util.tree_map(lambda x: x, params)
        for sub, names in (("attn", ("q", "k", "v", "o")),
                           ("mlp", ("gate", "up", "down"))):
            for name in names:
                w = np.asarray(params["layers"][sub][name]["weight"])
                qs = [quant.quantize_array(w[l], bits=4, group=64)
                      for l in range(w.shape[0])]
                stacked = {k: np.stack([q[k] for q in qs]) for k in qs[0]}
                qp["layers"][sub][name] = {k: jnp.asarray(v)
                                           for k, v in stacked.items()}
        ref_qp = quant.repack_tree_w4a8(
            jax.tree_util.tree_map(lambda x: x, qp))
        sg_qp = quant.requantize_tree_w4a8_sg(qp)
        assert "qkv" in sg_qp["layers"]["attn"]
        assert "weight_q4s" in sg_qp["layers"]["attn"]["qkv"]

        del CausalLMGenerator, SamplerConfig
        # random tiny LLMs have near-flat logits (argmax chains are not a
        # meaningful metric); require close LOGITS instead
        toks = jnp.asarray([[3, 5, 7]], jnp.int32)
        cache_a = transformer.make_cache(cfg, 1, 16, dtype=jnp.float32)
        ref_lg, _ = transformer.forward(ref_qp, cfg, toks, cache_a)
        cache_b = transformer.make_cache(cfg, 1, 16, dtype=jnp.float32)
        sg_lg, _ = transformer.forward(sg_qp, cfg, toks, cache_b)
        a = np.asarray(ref_lg).ravel()
        b = np.asarray(sg_lg).ravel()
        cos = (a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b))
        assert cos > 0.98, cos


class TestFusedDecodeStep:
    """Whole-stack single-token decode kernel (ops/pallas/fused_step.py).

    Interpret mode pins: grid phasing (attn, hidden blocks), the VMEM
    residual stream across grid steps, rope at prefetched positions, GQA
    masking against the (KVH, S_pad, hd) cache layout, gate/up dual views
    of the fused gateup array, and int8 output-scale application — against
    nn/transformer.forward_hidden run token by token."""

    def _cfg(self, **kw):
        from tpu_audio.nn import transformer

        base = dict(dim=128, n_layers=3, n_heads=2, n_kv_heads=1,
                    hidden_dim=1024, rope_theta=500000.0)
        base.update(kw)
        return transformer.TransformerConfig(**base)

    def _run_pair(self, rng, cfg, steps=5, quantize=False, s_pad=16,
                  grouped=False):
        from tpu_audio.nn import transformer
        from tpu_audio.ops import quant
        from tpu_audio.ops.pallas import fused_step

        params = transformer.init_params(jax.random.PRNGKey(0), cfg)
        fused = transformer.fuse_fp_tree(params)
        if quantize:
            lp = fused["layers"]
            for sub, name in (("attn", "qkv"), ("attn", "o"),
                              ("mlp", "gateup"), ("mlp", "down")):
                w = np.asarray(lp[sub][name]["weight"])
                qd = [quant.quantize_array_int8(w[i]) for i in range(len(w))]
                lp[sub][name] = {
                    "weight_i8": jnp.asarray(
                        np.stack([d["weight_i8"] for d in qd])),
                    "scale_i8": jnp.asarray(
                        np.stack([d["scale_i8"] for d in qd]))}
        stack = fused_step.prepare_stack(fused, cfg)

        # reference: the (possibly dequantized) weights through the XLA path
        ref_params = params
        if quantize:
            deq = jax.tree_util.tree_map(lambda x: x, params)
            for sub, names in (("attn", ("q", "k", "v", "o")),
                               ("mlp", ("gate", "up", "down"))):
                for n in names:
                    w = np.asarray(deq["layers"][sub][n]["weight"])
                    qd = [quant.quantize_array_int8(w[i])
                          for i in range(len(w))]
                    deq["layers"][sub][n]["weight"] = jnp.asarray(np.stack(
                        [d["weight_i8"].astype(np.float32) * d["scale_i8"]
                         for d in qd]))
            ref_params = deq

        inv_freq = cfg.inv_freq()
        xs = rng.standard_normal((steps, 1, cfg.dim)).astype(np.float32) * .5

        cache = transformer.make_cache(cfg, 1, s_pad, dtype=jnp.float32)
        kc = jnp.zeros((cfg.n_layers, cfg.kv_heads, s_pad, cfg.hd),
                       jnp.float32)
        vc = jnp.zeros_like(kc)
        got, ref = [], []
        for t in range(steps):
            x = jnp.asarray(xs[t])
            cos, sin = fused_step.make_cos_sin(t, inv_freq, cfg.hd)
            h, kc, vc = fused_step.fused_decode_step(
                x, t, cos, sin, stack, kc, vc, grouped=grouped,
                n_heads=cfg.n_heads, n_kv_heads=cfg.kv_heads, hd=cfg.hd,
                eps=cfg.norm_eps, interpret=True)
            got.append(np.asarray(h)[0])
            hr, cache = transformer.forward_hidden(
                ref_params, cfg, x[None], cache)
            ref.append(np.asarray(hr)[0, 0])
        return np.stack(got), np.stack(ref)

    def test_fp_matches_forward_hidden(self, rng):
        got, ref = self._run_pair(rng, self._cfg())
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)

    def test_fp_hd128_gqa4(self, rng):
        cfg = self._cfg(dim=256, n_heads=2, n_kv_heads=None, head_dim=128,
                        hidden_dim=512)
        got, ref = self._run_pair(rng, cfg, steps=4)
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)

    def test_single_hidden_block(self, rng):
        cfg = self._cfg(hidden_dim=512)
        got, ref = self._run_pair(rng, cfg, steps=3)
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)

    def test_grouped_layout_matches(self, rng):
        """The large-model grouped layout (per-kv-group attention
        phases, row-regrouped qkv, column-split wo with accumulated o
        partials) must match forward_hidden like the plain layout."""
        cfg = self._cfg(dim=256, n_heads=4, n_kv_heads=2, head_dim=64,
                        hidden_dim=1024)
        got, ref = self._run_pair(rng, cfg, steps=5, grouped=True)
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)

    def test_grouped_qwen2_bias_int8(self, rng):
        cfg = self._cfg(dim=128, n_heads=2, n_kv_heads=2, head_dim=64,
                        hidden_dim=512, attn_qkv_bias=True)
        got, ref = self._run_pair(rng, cfg, steps=4, grouped=True)
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)
        got, ref = self._run_pair(rng, self._cfg(), steps=4, quantize=True,
                                  grouped=True)
        a, b = got.ravel(), ref.ravel()
        cos = (a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b))
        assert cos > 0.999, cos

    def test_qwen2_qkv_bias(self, rng):
        """Qwen2-style stacks: qkv bias applied after the output scale,
        plus a hidden_dim (608) that needs a non-power-of-two block."""
        cfg = self._cfg(attn_qkv_bias=True, hidden_dim=608)
        got, ref = self._run_pair(rng, cfg, steps=4)
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)

    def test_qwen3_qk_norm(self, rng):
        """Qwen3-style per-head q/k rms-norm before rope."""
        cfg = self._cfg(qk_norm=True)
        got, ref = self._run_pair(rng, cfg, steps=4)
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)

    def test_int8_tracks_dequant_reference(self, rng):
        got, ref = self._run_pair(rng, self._cfg(), quantize=True)
        # int8 weights, exact activations: vs the dequantized-weight fp
        # reference only activation-free rounding differs
        a, b = got.ravel(), ref.ravel()
        cos = (a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b))
        assert cos > 0.999, cos

    def test_supported_gate(self):
        from tpu_audio.nn import transformer
        from tpu_audio.ops.pallas import fused_step

        cfg = self._cfg()
        params = transformer.fuse_fp_tree(
            transformer.init_params(jax.random.PRNGKey(0), cfg))
        # CPU backend → off regardless of structure
        assert not fused_step.supported(cfg, params, 1)


class TestFusedKVCache:
    """forward_hidden over ops/kvcache.FusedKVCache: prefill through the
    XLA layout view, single-token steps through the whole-stack kernel —
    hidden outputs must match the plain KVCache path with the equivalent
    additive left-pad mask."""

    def test_prefill_plus_steps_match_plain(self, rng, monkeypatch):
        import functools

        from tpu_audio.nn import transformer
        from tpu_audio.ops.pallas import fused_step

        monkeypatch.setattr(
            fused_step, "fused_decode_step",
            functools.partial(fused_step.fused_decode_step, interpret=True))

        cfg = transformer.TransformerConfig(
            dim=128, n_layers=2, n_heads=2, n_kv_heads=1, hidden_dim=512,
            attn_qkv_bias=True)  # Qwen2-shaped
        params = transformer.fuse_fp_tree(
            transformer.init_params(jax.random.PRNGKey(0), cfg))
        s_max, start = 24, 3
        x_pre = jnp.asarray(rng.standard_normal((1, 8, cfg.dim)) * .5,
                            jnp.float32)
        x_pre = x_pre.at[:, :start].set(0.0)

        plain = transformer.make_cache(cfg, 1, s_max, dtype=jnp.float32)
        slot = jnp.arange(s_max)
        extra = jnp.where(slot < start, -1e30, 0.0)[None, None, None, :]
        fused = transformer.make_fused_cache(cfg, s_max, jnp.float32,
                                             start=start)

        h_p, plain = transformer.forward_hidden(params, cfg, x_pre, plain,
                                                extra)
        h_f, fused = transformer.forward_hidden(params, cfg, x_pre, fused)
        np.testing.assert_allclose(np.asarray(h_f), np.asarray(h_p),
                                   rtol=2e-4, atol=2e-5)
        assert int(fused.pos) == 8

        for i in range(4):
            xt = jnp.asarray(rng.standard_normal((1, 1, cfg.dim)) * .5,
                             jnp.float32)
            h_p, plain = transformer.forward_hidden(params, cfg, xt, plain,
                                                    extra)
            h_f, fused = transformer.forward_hidden(params, cfg, xt, fused)
            np.testing.assert_allclose(np.asarray(h_f), np.asarray(h_p),
                                       rtol=5e-4, atol=5e-5)

    def test_pos_offset_matches_plain(self, rng, monkeypatch):
        """pos_offset (canonical rope positions for left-padded prompts)
        must shift the kernel's cos/sin exactly like the XLA path."""
        import functools

        from tpu_audio.nn import transformer
        from tpu_audio.ops.pallas import fused_step

        monkeypatch.setattr(
            fused_step, "fused_decode_step",
            functools.partial(fused_step.fused_decode_step, interpret=True))

        cfg = transformer.TransformerConfig(
            dim=128, n_layers=1, n_heads=2, n_kv_heads=2, hidden_dim=512)
        params = transformer.fuse_fp_tree(
            transformer.init_params(jax.random.PRNGKey(1), cfg))
        s_max, start = 16, 2
        off = jnp.asarray([start], jnp.int32)
        x_pre = jnp.asarray(rng.standard_normal((1, 6, cfg.dim)) * .5,
                            jnp.float32).at[:, :start].set(0.0)
        plain = transformer.make_cache(cfg, 1, s_max, dtype=jnp.float32)
        slot = jnp.arange(s_max)
        extra = jnp.where(slot < start, -1e30, 0.0)[None, None, None, :]
        fused = transformer.make_fused_cache(cfg, s_max, jnp.float32,
                                             start=start)
        h_p, plain = transformer.forward_hidden(params, cfg, x_pre, plain,
                                                extra, pos_offset=off)
        h_f, fused = transformer.forward_hidden(params, cfg, x_pre, fused,
                                                pos_offset=off)
        np.testing.assert_allclose(np.asarray(h_f), np.asarray(h_p),
                                   rtol=2e-4, atol=2e-5)
        xt = jnp.asarray(rng.standard_normal((1, 1, cfg.dim)) * .5,
                         jnp.float32)
        h_p, _ = transformer.forward_hidden(params, cfg, xt, plain, extra,
                                            pos_offset=off)
        h_f, _ = transformer.forward_hidden(params, cfg, xt, fused,
                                            pos_offset=off)
        np.testing.assert_allclose(np.asarray(h_f), np.asarray(h_p),
                                   rtol=5e-4, atol=5e-5)


class TestFusedWhisperStep:
    """Whole-decoder whisper step kernel (ops/pallas/fused_whisper_step.py):
    self-attention (scaled-key cache, online-softmax fresh term), int8
    cross-attention (scales folded into q / the output), LN/GELU MLPs and
    the final LN — vs the plain decode_step over a greedy rollout."""

    def _roll(self, fused: bool, monkeypatch, rng, quantize=True,
              cache_dtype=None):
        import functools

        import jax as _jax

        from tpu_audio.models.whisper import load as wload
        from tpu_audio.models.whisper import model as wmodel
        from tpu_audio.models.whisper.config import WhisperConfig
        from tpu_audio.ops.pallas import fused_whisper_step as fws

        cfg = WhisperConfig(n_mels=80, n_audio_ctx=64, n_audio_state=256,
                            n_audio_head=4, n_audio_layer=1, n_vocab=500,
                            n_text_ctx=16, n_text_state=256, n_text_head=4,
                            n_text_layer=2)
        params = wmodel.init_params(_jax.random.PRNGKey(1), cfg)
        if quantize:
            params = wload.serve_tree_int8(params, encoder=False)
        feats = jnp.asarray(rng.standard_normal(
            (1, cfg.n_audio_ctx, cfg.n_text_state)) * 0.3, jnp.float32)
        if fused:
            monkeypatch.setattr(
                fws, "fused_whisper_decode_step",
                functools.partial(fws.fused_whisper_decode_step,
                                  interpret=True))
            monkeypatch.setattr(fws, "decode_supported",
                                lambda c, p, *a, **k: True)
        else:
            monkeypatch.setattr(fws, "decode_supported",
                                lambda c, p, *a, **k: False)
        import jax.numpy as _jnp

        st = wmodel.init_state(params, cfg, feats, kv_int8=True,
                               dtype=cache_dtype or _jnp.float32)
        toks = jnp.asarray([[3]], jnp.int32)
        lg, st = wmodel.decode_step(params, cfg, toks, st)
        out = []
        for _ in range(6):
            nxt = int(np.asarray(lg)[0, -1].argmax())
            out.append(nxt)
            lg, st = wmodel.decode_step(
                params, cfg, jnp.asarray([[nxt]], jnp.int32), st)
        return out

    def test_greedy_rollout_matches_plain(self, rng, monkeypatch):
        ref = self._roll(False, monkeypatch, rng)
        rng2 = np.random.default_rng(42)
        got = self._roll(True, monkeypatch, rng2)
        agree = sum(a == b for a, b in zip(got, ref))
        assert agree >= len(ref) - 1, (got, ref)

    def test_bf16_cache(self, rng, monkeypatch):
        """The serving configuration (bf16 self-cache, int8 weights +
        cross-KV) through the kernel — the probe memo keys on the cache
        dtype so this exact variant is what runs on chip."""
        ref = self._roll(False, monkeypatch, rng, cache_dtype=jnp.bfloat16)
        rng2 = np.random.default_rng(42)
        got = self._roll(True, monkeypatch, rng2, cache_dtype=jnp.bfloat16)
        agree = sum(a == b for a, b in zip(got, ref))
        assert agree >= len(ref) - 1, (got, ref)

    def test_fp_decoder_weights(self, rng, monkeypatch):
        """fp decoder weights + int8 cross-KV through the kernel."""
        ref = self._roll(False, monkeypatch, rng, quantize=False)
        rng2 = np.random.default_rng(42)
        got = self._roll(True, monkeypatch, rng2, quantize=False)
        agree = sum(a == b for a, b in zip(got, ref))
        assert agree >= len(ref) - 1, (got, ref)


class TestFusedGateHelpers:
    def test_mode_from_shapes_boundaries(self):
        from tpu_audio.ops.pallas.fused_step import _mode_from_shapes

        # small model, short cache -> plain
        assert _mode_from_shapes(1024, 8, 2, 128, 4096, 1, 40, 4) == "plain"
        # 3B int8 at a 2048 cache -> grouped (plain attn blocks blow VMEM)
        assert _mode_from_shapes(3072, 24, 8, 128, 8192, 1,
                                 2048, 2) == "grouped"
        # 3B bf16 -> declined entirely
        assert _mode_from_shapes(3072, 24, 8, 128, 8192, 2, 2048, 2) is None
        # growing the cache can only demote the mode, never promote it
        small = _mode_from_shapes(1024, 16, 8, 64, 4096, 1, 64, 4)
        big = _mode_from_shapes(1024, 16, 8, 64, 4096, 1, 4096, 4)
        order = {None: 0, "grouped": 1, "plain": 2}
        assert order[big] <= order[small]

    def test_decode_cache_and_mask(self):
        from tpu_audio.nn import transformer
        from tpu_audio.ops.kvcache import FusedKVCache, KVCache

        cfg = transformer.TransformerConfig(
            dim=128, n_layers=2, n_heads=2, n_kv_heads=1, hidden_dim=512)
        cache, extra = transformer.decode_cache_and_mask(cfg, 32, 5, False)
        assert isinstance(cache, KVCache) and extra is not None
        # the mask hides exactly the slots below start
        m = np.asarray(extra)[0, 0, 0]
        assert (m[:5] < -1e29).all() and (m[5:] == 0).all()
        fcache, fextra = transformer.decode_cache_and_mask(cfg, 32, 5, True)
        assert isinstance(fcache, FusedKVCache) and fextra is None
        assert int(fcache.start) == 5 and fcache.max_len == 32


class TestProbesUnderTrace:
    """Compile probes must evaluate eagerly even when first invoked while
    ANOTHER function is being traced (whisper's encoder scan calls
    packed_probe at trace time). Under JAX's stackless tracing, jnp.zeros
    inside an active trace becomes a tracer of that trace, so a probe that
    doesn't shield itself with ensure_compile_time_eval raises
    TracerArrayConversionError — which its except clause then silently
    memoizes as False, disabling the kernel for the whole process
    (observed on chip: the whisper batch-16 headline fell 666x -> 485x).
    Kernels run in interpret mode so the probes can succeed on CPU."""

    def test_packed_probe_inside_jit_trace(self, monkeypatch):
        import functools

        from tpu_audio.ops.pallas import encoder_attention as ea

        monkeypatch.setattr(
            ea, "encoder_attention_packed",
            functools.partial(ea.encoder_attention_packed, interpret=True))
        monkeypatch.setattr(ea, "_PACKED_PROBE", {})
        seen = []

        @jax.jit
        def traced(x):
            seen.append(ea.packed_probe(64, jnp.float32))
            return x * 2

        traced(jnp.ones((2,)))
        assert seen == [True]
        assert ea._PACKED_PROBE[(64, "float32")] is True

    def test_fused_step_probe_inside_jit_trace(self, monkeypatch):
        import functools

        from tpu_audio.nn import transformer
        from tpu_audio.ops.pallas import fused_step

        monkeypatch.setattr(
            fused_step, "fused_decode_step",
            functools.partial(fused_step.fused_decode_step, interpret=True))
        monkeypatch.setattr(fused_step, "_PROBE_MEMO", {})
        # choose_mode gates on the TPU backend before the probe runs
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        cfg = transformer.TransformerConfig(
            dim=128, n_layers=2, n_heads=2, n_kv_heads=1, hidden_dim=512)
        params = transformer.fuse_fp_tree(
            transformer.init_params(jax.random.PRNGKey(0), cfg))
        seen = []

        @jax.jit
        def traced(x):
            seen.append(fused_step.probe_compile(cfg, params, max_len=16,
                                                 cache_dtype=jnp.float32))
            return x + 1

        traced(jnp.ones((2,)))
        assert seen == [True]
        assert list(fused_step._PROBE_MEMO.values()) == [True]

    def test_fused_step_probe_rope_scaling_dict(self, monkeypatch):
        """Llama-3.2 configs carry rope_scaling as a DICT — the probe memo
        key must not hash the config itself (regression: probe_compile
        raised TypeError for Orpheus-3B/OuteTTS-1B, crashing the decode
        path instead of gating it)."""
        import functools

        from tpu_audio.nn import transformer
        from tpu_audio.ops.pallas import fused_step

        monkeypatch.setattr(
            fused_step, "fused_decode_step",
            functools.partial(fused_step.fused_decode_step, interpret=True))
        monkeypatch.setattr(fused_step, "_PROBE_MEMO", {})
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        cfg = transformer.TransformerConfig(
            dim=128, n_layers=2, n_heads=2, n_kv_heads=1, hidden_dim=512,
            rope_scaling={"rope_type": "llama3", "factor": 32.0,
                          "low_freq_factor": 1.0, "high_freq_factor": 4.0,
                          "original_max_position_embeddings": 8192})
        params = transformer.fuse_fp_tree(
            transformer.init_params(jax.random.PRNGKey(0), cfg))
        ok = fused_step.probe_compile(cfg, params, max_len=16,
                                      cache_dtype=jnp.float32)
        assert ok is True
        # memoized under the repr key, second call hits the memo
        assert fused_step.probe_compile(cfg, params, max_len=16,
                                        cache_dtype=jnp.float32) is True
        assert list(fused_step._PROBE_MEMO.values()) == [True]

    def test_whisper_probe_inside_jit_trace(self, monkeypatch):
        import functools

        from tpu_audio.models.whisper.config import PRESETS
        from tpu_audio.ops.pallas import fused_whisper_step as fws

        monkeypatch.setattr(
            fws, "fused_whisper_decode_step",
            functools.partial(fws.fused_whisper_decode_step, interpret=True))
        monkeypatch.setattr(fws, "_PROBE_MEMO", {})
        # decode_supported gates on the TPU backend before the probe runs
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        cfg = PRESETS["base"]
        dec = {"blocks": {"attn": {"q": {"weight_i8": jnp.zeros(
                   (cfg.n_text_layer, 8, 8), jnp.int8)}}},
               "ln": {"weight": jnp.ones((cfg.n_text_state,), jnp.float32)}}
        seen = []

        @jax.jit
        def traced(x):
            seen.append(fws.decode_supported(cfg, dec,
                                             cache_dtype=jnp.float32))
            return x + 1

        traced(jnp.ones((2,)))
        assert seen == [True]
        assert list(fws._PROBE_MEMO.values()) == [True]


class TestFusedEncoderBlock:
    """ops/pallas/fused_encoder: LN+QKV-packed and attention+o-proj+LN
    launches must reproduce the plain XLA block phases (interpret mode)."""

    def _params(self, rng, d, n_heads, k_bias=True):
        def lin(o, i, bias=True):
            p = {"weight": jnp.asarray(rng.standard_normal((o, i)) * 0.05,
                                       jnp.float32)}
            if bias:
                p["bias"] = jnp.asarray(rng.standard_normal((o,)) * 0.05,
                                        jnp.float32)
            return p

        attn = {"q": lin(d, d), "k": lin(d, d, bias=k_bias),
                "v": lin(d, d), "o": lin(d, d)}
        ln1 = {"weight": jnp.asarray(1 + 0.1 * rng.standard_normal(d),
                                     jnp.float32),
               "bias": jnp.asarray(0.1 * rng.standard_normal(d), jnp.float32)}
        ln2 = {"weight": jnp.asarray(1 + 0.1 * rng.standard_normal(d),
                                     jnp.float32),
               "bias": jnp.asarray(0.1 * rng.standard_normal(d), jnp.float32)}
        return attn, ln1, ln2

    def _ref(self, attn, ln1, ln2, x, n_heads):
        from tpu_audio.nn import attention as attn_ops
        from tpu_audio.nn import layers

        b, t, d = x.shape
        hd = d // n_heads
        scale = hd ** -0.25
        hn = layers.layer_norm(ln1, x)
        q = layers.linear(attn["q"], hn).reshape(b, t, n_heads, hd) * scale
        k = layers.linear(attn["k"], hn).reshape(b, t, n_heads, hd) * scale
        v = layers.linear(attn["v"], hn).reshape(b, t, n_heads, hd)
        o = attn_ops.attend(q, k, v, None, q_scaled=True)
        y = x + layers.linear(attn["o"], o.reshape(b, t, d))
        return y, layers.layer_norm(ln2, y)

    @pytest.mark.parametrize("t,k_bias", [(512, True), (600, False)])
    def test_matches_plain_block_phases(self, rng, t, k_bias):
        from tpu_audio.ops.pallas import fused_encoder as fe

        b, d, n_heads = 2, 256, 4
        attn, ln1, ln2 = self._params(rng, d, n_heads, k_bias)
        x = jnp.asarray(rng.standard_normal((b, t, d)) * 0.3, jnp.float32)
        q, k, v = fe.ln_qkv_packed(x, ln1, attn, n_heads, block_t=128,
                                   interpret=True)
        assert q.shape == (b, n_heads // 2, -(-t // 128) * 128, 128)
        y, h = fe.attn_oproj_ln(q, k, v, x, attn["o"], ln2, t_valid=t,
                                block_q=128, interpret=True)
        ref_y, ref_h = self._ref(attn, ln1, ln2, x, n_heads)
        np.testing.assert_allclose(np.asarray(y), np.asarray(ref_y),
                                   rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(h), np.asarray(ref_h),
                                   rtol=2e-4, atol=2e-4)

    def test_packed_layout_matches_einsum_projection(self, rng):
        """The packed q/k/v layout must equal the pair-major einsum the
        production encoder used before (bgtxe ordering)."""
        from tpu_audio.ops.pallas import fused_encoder as fe

        b, t, d, n_heads = 1, 256, 256, 4
        g, hd = n_heads // 2, d // n_heads
        attn, ln1, _ = self._params(rng, d, n_heads)
        x = jnp.asarray(rng.standard_normal((b, t, d)) * 0.3, jnp.float32)
        from tpu_audio.nn import layers

        hn = layers.layer_norm(ln1, x)
        scale = hd ** -0.25
        wq = attn["q"]["weight"].reshape(g, 2, hd, d)
        bq = attn["q"]["bias"].reshape(g, 1, 2, hd)
        ref_q = (jnp.einsum("btd,gxed->bgtxe", hn, wq) + bq[None]).reshape(
            b, g, t, 2 * hd) * scale
        q, _, _ = fe.ln_qkv_packed(x, ln1, attn, n_heads, block_t=128,
                                   interpret=True)
        np.testing.assert_allclose(np.asarray(q[:, :, :t]),
                                   np.asarray(ref_q), rtol=2e-4, atol=2e-4)

    def test_supported_gate(self):
        from tpu_audio.ops.pallas import fused_encoder as fe

        x = jnp.zeros((1, 1500, 1280), jnp.bfloat16)
        attn = {"q": {"weight": jnp.zeros((1280, 1280), jnp.bfloat16)}}
        # CPU backend → gate must refuse regardless of shape
        assert fe.supported(x, attn, 20) in (False,)

    def test_encode_fused_matches_plain(self, rng, monkeypatch):
        """wmodel.encode with the fused-block path (interpret mode, gate
        forced open) must match the per-op encoder."""
        import functools

        from tpu_audio.models.whisper import model as wmodel
        from tpu_audio.models.whisper.config import WhisperConfig
        from tpu_audio.ops.pallas import fused_encoder as fe

        cfg = WhisperConfig(
            n_mels=80, n_audio_ctx=300, n_audio_state=256, n_audio_head=4,
            n_audio_layer=2, n_vocab=1000, n_text_ctx=16, n_text_state=256,
            n_text_head=4, n_text_layer=1)
        params = wmodel.init_params(jax.random.PRNGKey(0), cfg)
        mel = jnp.asarray(rng.standard_normal((1, 600, 80)) * 0.1,
                          jnp.float32)
        ref = np.asarray(wmodel.encode(params, cfg, mel))

        monkeypatch.setattr(
            fe, "ln_qkv_packed",
            functools.partial(fe.ln_qkv_packed, interpret=True))
        monkeypatch.setattr(
            fe, "attn_oproj_ln",
            functools.partial(fe.attn_oproj_ln, interpret=True))
        monkeypatch.setattr(fe, "probe", lambda *a, **k: True)
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
        monkeypatch.setattr(wmodel, "FUSED_ENC", True)
        # supported() requires T >= 512? n_audio_ctx=300 → lower the bar
        monkeypatch.setattr(fe, "supported",
                            lambda x, a, h: "weight" in a["q"])
        got = np.asarray(wmodel.encode(params, cfg, mel))
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


class TestFusedEncoderInt8:
    """w8a8 fused encoder chain: activation quantization inside the
    kernels must match the quantize_rows + s8-GEMM reference semantics,
    and the full int8 block must track the fp block."""

    def _fp_params(self, rng, d, ff, n_heads):
        def lin(o, i, bias=True):
            p = {"weight": jnp.asarray(rng.standard_normal((o, i)) * 0.05,
                                       jnp.float32)}
            if bias:
                p["bias"] = jnp.asarray(rng.standard_normal((o,)) * 0.05,
                                        jnp.float32)
            return p

        attn = {"q": lin(d, d), "k": lin(d, d, bias=False),
                "v": lin(d, d), "o": lin(d, d)}
        mlp = {"fc1": lin(ff, d), "fc2": lin(d, ff)}
        ln1 = {"weight": jnp.ones((d,), jnp.float32),
               "bias": jnp.zeros((d,), jnp.float32)}
        ln2 = {"weight": jnp.asarray(1 + 0.1 * rng.standard_normal(d),
                                     jnp.float32),
               "bias": jnp.asarray(0.1 * rng.standard_normal(d), jnp.float32)}
        return attn, mlp, ln1, ln2

    def _quantize(self, tree):
        from tpu_audio.ops import quant

        out = {}
        for name, p in tree.items():
            q = {k: jnp.asarray(v) for k, v in
                 quant.quantize_array_int8(np.asarray(p["weight"])).items()}
            if "bias" in p:
                q["bias"] = p["bias"]
            out[name] = q
        return out

    def test_ln_qkv_int8_matches_reference(self, rng):
        from tpu_audio.nn import layers
        from tpu_audio.ops.pallas import fused_encoder as fe
        from tpu_audio.ops.pallas.int8_matmul import quantize_rows

        b, t, d, n_heads = 1, 256, 256, 4
        hd, g = d // n_heads, n_heads // 2
        attn, _, ln1, _ = self._fp_params(rng, d, d * 2, n_heads)
        qattn = self._quantize(attn)
        x = jnp.asarray(rng.standard_normal((b, t, d)) * 0.3, jnp.float32)
        q, k, v = fe.ln_qkv_packed_int8(x, ln1, qattn, n_heads,
                                        block_t=128, interpret=True)
        # reference: same row quant, s8 dot, per-channel scales
        xn = layers.layer_norm(ln1, x).reshape(t, d)
        xq, sx = quantize_rows(xn)
        scale = hd ** -0.25

        def ref(name, s, bias):
            acc = jnp.dot(xq.astype(jnp.int32),
                          qattn[name]["weight_i8"].T.astype(jnp.int32))
            y = (acc.astype(jnp.float32) * sx
                 * qattn[name]["scale_i8"].reshape(1, -1) * s)
            if bias is not None:
                y = y + bias * s
            return y.reshape(b, t, g, 2 * hd).transpose(0, 2, 1, 3)

        np.testing.assert_allclose(
            np.asarray(q[:, :, :t]),
            np.asarray(ref("q", scale, attn["q"]["bias"])),
            rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(k[:, :, :t]), np.asarray(ref("k", scale, None)),
            rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(v[:, :, :t]),
            np.asarray(ref("v", 1.0, attn["v"]["bias"])),
            rtol=1e-4, atol=1e-5)

    def test_fc_chain_matches_reference(self, rng):
        from tpu_audio.nn import layers
        from tpu_audio.ops.pallas import fused_encoder as fe
        from tpu_audio.ops.pallas.int8_matmul import quantize_rows

        b, t, d, ff = 1, 200, 256, 512
        _, mlp, _, _ = self._fp_params(rng, d, ff, 4)
        qmlp = self._quantize(mlp)
        h = jnp.asarray(rng.standard_normal((b, t, d)) * 0.5, jnp.float32)
        y = jnp.asarray(rng.standard_normal((b, t, d)) * 0.5, jnp.float32)
        g_i8, sg = fe.fc1_gelu_int8(h, qmlp["fc1"], block_t=128,
                                    interpret=True)
        out = fe.fc2_residual_int8(g_i8, sg, y, qmlp["fc2"], block_t=128,
                                   interpret=True)
        # reference chain with identical quantization points
        hq, sh = quantize_rows(h.reshape(t, d))
        a = (jnp.dot(hq.astype(jnp.int32),
                     qmlp["fc1"]["weight_i8"].T.astype(jnp.int32))
             .astype(jnp.float32) * sh
             * qmlp["fc1"]["scale_i8"].reshape(1, -1)
             + mlp["fc1"]["bias"])
        # the kernel contract is the A&S rational erf gelu (Mosaic has no
        # erf lowering); exact gelu flips ~0.3% of int8 codes by one step
        from tpu_audio.ops.pallas.fused_whisper_step import _gelu

        a = _gelu(a)
        gq, sgr = quantize_rows(a)
        ref = (jnp.dot(gq.astype(jnp.int32),
                       qmlp["fc2"]["weight_i8"].T.astype(jnp.int32))
               .astype(jnp.float32) * sgr
               * qmlp["fc2"]["scale_i8"].reshape(1, -1)
               + mlp["fc2"]["bias"] + y.reshape(t, d))
        np.testing.assert_allclose(np.asarray(out[0]), np.asarray(ref),
                                   rtol=1e-4, atol=1e-4)

    def test_full_int8_block_tracks_fp(self, rng):
        from tpu_audio.ops.pallas import fused_encoder as fe

        b, t, d, ff, n_heads = 1, 256, 256, 512, 4
        attn, mlp, ln1, ln2 = self._fp_params(rng, d, ff, n_heads)
        qattn, qmlp = self._quantize(attn), self._quantize(mlp)
        x = jnp.asarray(rng.standard_normal((b, t, d)) * 0.3, jnp.float32)

        q, k, v = fe.ln_qkv_packed_int8(x, ln1, qattn, n_heads,
                                        block_t=128, interpret=True)
        y, h = fe.attn_oproj_ln_int8(q, k, v, x, qattn["o"], ln2,
                                     t_valid=t, block_q=128, interpret=True)
        g_i8, sg = fe.fc1_gelu_int8(h, qmlp["fc1"], block_t=128,
                                    interpret=True)
        got = np.asarray(fe.fc2_residual_int8(g_i8, sg, y, qmlp["fc2"],
                                              block_t=128, interpret=True))

        qf, kf, vf = fe.ln_qkv_packed(x, ln1, attn, n_heads, block_t=128,
                                      interpret=True)
        yf, hf = fe.attn_oproj_ln(qf, kf, vf, x, attn["o"], ln2,
                                  t_valid=t, block_q=128, interpret=True)
        from tpu_audio.nn import layers
        ref = np.asarray(yf + layers.linear(
            mlp["fc2"], layers.gelu(layers.linear(mlp["fc1"], hf))))
        a, bb = got.ravel(), ref.ravel()
        cos = float(a @ bb / (np.linalg.norm(a) * np.linalg.norm(bb) + 1e-12))
        assert cos > 0.999, f"int8 block cosine {cos}"
