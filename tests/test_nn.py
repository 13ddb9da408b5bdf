"""Shared NN layer tests: layer parity vs torch, KV-cache decode consistency,
sampling op behavior."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_audio.nn import layers, lstm, transformer
from tpu_audio.ops import sampling
from tpu_audio.ops.decoding import decode_loop
from tpu_audio.ops.sampling import SamplerConfig

torch = pytest.importorskip("torch")


def t2n(x):
    return x.detach().numpy()


class TestLayersVsTorch:
    def test_conv1d(self, rng):
        x = rng.standard_normal((2, 20, 8)).astype(np.float32)
        w = rng.standard_normal((16, 8, 3)).astype(np.float32)  # torch (O, I, K)
        b = rng.standard_normal(16).astype(np.float32)
        ref = torch.nn.functional.conv1d(
            torch.tensor(x).transpose(1, 2), torch.tensor(w), torch.tensor(b),
            stride=2, padding=1).transpose(1, 2)
        p = {"weight": jnp.asarray(w.transpose(2, 1, 0)), "bias": jnp.asarray(b)}
        got = layers.conv1d(p, jnp.asarray(x), stride=2, padding=1)
        np.testing.assert_allclose(np.asarray(got), t2n(ref), atol=2e-5)

    @pytest.mark.parametrize("stride,padding,dilation",
                             [(1, 1, 1), (2, 1, 1), (1, 0, 1), (3, 2, 1),
                              (2, (0, 2), 1), (1, 4, 2), (1, 6, 3)])
    def test_conv1d_mxu_matches_conv1d(self, rng, stride, padding, dilation):
        x = rng.standard_normal((2, 25, 8)).astype(np.float32)
        w = rng.standard_normal((5, 8, 16)).astype(np.float32)  # (K, I, O)
        b = rng.standard_normal(16).astype(np.float32)
        p = {"weight": jnp.asarray(w), "bias": jnp.asarray(b)}
        ref = layers.conv1d(p, jnp.asarray(x), stride=stride, padding=padding,
                            dilation=dilation)
        got = layers.conv1d_mxu(p, jnp.asarray(x), stride=stride,
                                padding=padding, dilation=dilation)
        assert got.shape == ref.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5)

    def test_conv_transpose1d(self, rng):
        x = rng.standard_normal((2, 10, 8)).astype(np.float32)
        w = rng.standard_normal((8, 16, 4)).astype(np.float32)  # torch (I, O, K)
        ref = torch.nn.functional.conv_transpose1d(
            torch.tensor(x).transpose(1, 2), torch.tensor(w),
            stride=2, padding=1).transpose(1, 2)
        p = {"weight": jnp.asarray(w.transpose(2, 0, 1))}  # (K, I, O)
        got = layers.conv_transpose1d(p, jnp.asarray(x), stride=2, padding=1)
        np.testing.assert_allclose(np.asarray(got), t2n(ref), atol=2e-5)

    def test_depthwise_conv1d(self, rng):
        x = rng.standard_normal((1, 20, 8)).astype(np.float32)
        w = rng.standard_normal((8, 1, 5)).astype(np.float32)
        ref = torch.nn.functional.conv1d(
            torch.tensor(x).transpose(1, 2), torch.tensor(w),
            padding=2, groups=8).transpose(1, 2)
        p = {"weight": jnp.asarray(w.transpose(2, 1, 0))}
        got = layers.conv1d(p, jnp.asarray(x), padding=2, groups=8)
        np.testing.assert_allclose(np.asarray(got), t2n(ref), atol=2e-5)

    def test_layer_norm(self, rng):
        x = rng.standard_normal((3, 7, 16)).astype(np.float32)
        w = rng.standard_normal(16).astype(np.float32)
        b = rng.standard_normal(16).astype(np.float32)
        ref = torch.nn.functional.layer_norm(torch.tensor(x), (16,),
                                             torch.tensor(w), torch.tensor(b))
        got = layers.layer_norm({"weight": jnp.asarray(w), "bias": jnp.asarray(b)},
                                jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(got), t2n(ref), atol=1e-5)

    def test_group_norm(self, rng):
        x = rng.standard_normal((2, 12, 16)).astype(np.float32)
        w = np.ones(16, np.float32)
        b = np.zeros(16, np.float32)
        ref = torch.nn.functional.group_norm(
            torch.tensor(x).transpose(1, 2), 4, torch.tensor(w), torch.tensor(b)
        ).transpose(1, 2)
        got = layers.group_norm({"weight": jnp.asarray(w), "bias": jnp.asarray(b)},
                                jnp.asarray(x), num_groups=4)
        np.testing.assert_allclose(np.asarray(got), t2n(ref), atol=1e-5)

    def test_lstm_vs_torch(self, rng):
        b, t, d, h = 2, 9, 6, 5
        x = rng.standard_normal((b, t, d)).astype(np.float32)
        m = torch.nn.LSTM(d, h, batch_first=True)
        ref, _ = m(torch.tensor(x))
        p = {
            "wx": jnp.asarray(t2n(m.weight_ih_l0)),
            "wh": jnp.asarray(t2n(m.weight_hh_l0)),
            "bias_ih": jnp.asarray(t2n(m.bias_ih_l0)),
            "bias_hh": jnp.asarray(t2n(m.bias_hh_l0)),
        }
        got = lstm.lstm(p, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(got), t2n(ref), atol=1e-5)

    def test_bilstm_vs_torch(self, rng):
        b, t, d, h = 1, 7, 4, 3
        x = rng.standard_normal((b, t, d)).astype(np.float32)
        m = torch.nn.LSTM(d, h, batch_first=True, bidirectional=True)
        ref, _ = m(torch.tensor(x))
        p = {
            "fwd": {"wx": jnp.asarray(t2n(m.weight_ih_l0)),
                    "wh": jnp.asarray(t2n(m.weight_hh_l0)),
                    "bias_ih": jnp.asarray(t2n(m.bias_ih_l0)),
                    "bias_hh": jnp.asarray(t2n(m.bias_hh_l0))},
            "bwd": {"wx": jnp.asarray(t2n(m.weight_ih_l0_reverse)),
                    "wh": jnp.asarray(t2n(m.weight_hh_l0_reverse)),
                    "bias_ih": jnp.asarray(t2n(m.bias_ih_l0_reverse)),
                    "bias_hh": jnp.asarray(t2n(m.bias_hh_l0_reverse))},
        }
        got = lstm.bilstm(p, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(got), t2n(ref), atol=1e-5)


TINY = transformer.TransformerConfig(
    dim=32, n_layers=2, n_heads=4, n_kv_heads=2, hidden_dim=64, vocab_size=50,
)


class TestTransformer:
    def test_prefill_equals_stepwise_decode(self):
        """KV-cache correctness: logits from one prefill == step-by-step."""
        key = jax.random.PRNGKey(0)
        params = transformer.init_params(key, TINY)
        tokens = jnp.array([[3, 7, 11, 2, 9]], dtype=jnp.int32)

        cache = transformer.make_cache(TINY, 1, 16, dtype=jnp.float32)
        full_logits, _ = transformer.forward(params, TINY, tokens, cache)

        cache = transformer.make_cache(TINY, 1, 16, dtype=jnp.float32)
        step_logits = []
        for i in range(5):
            lg, cache = transformer.forward(params, TINY, tokens[:, i : i + 1], cache)
            step_logits.append(lg[:, 0])
        step_logits = jnp.stack(step_logits, axis=1)
        np.testing.assert_allclose(np.asarray(full_logits), np.asarray(step_logits),
                                   atol=2e-5)

    def test_gpt2_style_config(self):
        cfg = transformer.TransformerConfig(
            dim=32, n_layers=2, n_heads=4, hidden_dim=64, vocab_size=50,
            mlp="gelu", norm="ln", pos_emb="learned", max_position_embeddings=64,
            attn_qkv_bias=True, attn_o_bias=True, tie_word_embeddings=True)
        params = transformer.init_params(jax.random.PRNGKey(1), cfg)
        cache = transformer.make_cache(cfg, 2, 16, dtype=jnp.float32)
        logits, cache2 = transformer.forward(
            params, cfg, jnp.zeros((2, 3), jnp.int32), cache)
        assert logits.shape == (2, 3, 50)
        assert int(cache2.pos) == 3

    def test_qwen3_qk_norm(self):
        cfg = transformer.TransformerConfig(
            dim=32, n_layers=2, n_heads=4, n_kv_heads=2, hidden_dim=64,
            vocab_size=50, qk_norm=True, attn_qkv_bias=False)
        params = transformer.init_params(jax.random.PRNGKey(2), cfg)
        cache = transformer.make_cache(cfg, 1, 8, dtype=jnp.float32)
        logits, _ = transformer.forward(params, cfg, jnp.ones((1, 4), jnp.int32), cache)
        assert np.isfinite(np.asarray(logits)).all()

    def test_encode(self):
        params = transformer.init_params(jax.random.PRNGKey(3), TINY)
        x = jax.random.normal(jax.random.PRNGKey(4), (2, 6, 32))
        out = transformer.encode(params, TINY, x)
        assert out.shape == (2, 6, 32)


class TestSampling:
    def test_top_k(self):
        logits = jnp.array([[1.0, 5.0, 3.0, 2.0]])
        out = sampling.apply_top_k(logits, 2)
        assert out[0, 0] < -1e29 and out[0, 3] < -1e29
        assert out[0, 1] == 5.0 and out[0, 2] == 3.0

    def test_top_p_keeps_first(self):
        logits = jnp.array([[10.0, 0.0, -10.0, -10.0]])
        out = sampling.apply_top_p(logits, 0.5)
        assert out[0, 0] == 10.0
        assert out[0, 1] < -1e29

    def test_min_p(self):
        logits = jnp.log(jnp.array([[0.5, 0.3, 0.01, 0.19]]))
        out = sampling.apply_min_p(logits, 0.1)  # cutoff = 0.05
        assert out[0, 2] < -1e29
        assert np.isfinite(np.asarray(out[0, :2])).all()

    def test_repetition_penalty(self):
        logits = jnp.array([[2.0, -2.0, 1.0]])
        recent = jnp.array([[0, 1, -1]])
        out = sampling.apply_repetition_penalty(logits, recent, 2.0)
        np.testing.assert_allclose(np.asarray(out[0]), [1.0, -4.0, 1.0])

    def test_greedy_sample(self):
        logits = jnp.array([[0.0, 3.0, 1.0]])
        tok = sampling.sample(jax.random.PRNGKey(0), logits,
                              SamplerConfig(temperature=0.0))
        assert int(tok[0]) == 1


class TestDecodeLoop:
    def test_decode_until_eos(self):
        """A step_fn that deterministically counts up must stop at EOS."""
        def step_fn(last, state):
            v = 10
            nxt = (last[:, 0] + 1) % v
            logits = jax.nn.one_hot(nxt, v) * 100.0
            return logits, state

        res = decode_loop(
            jax.random.PRNGKey(0), step_fn, state=(),
            first_token=jnp.array([2], jnp.int32), max_new_tokens=20,
            eos_ids=(7,), sampler=SamplerConfig(temperature=0.0))
        toks = np.asarray(res.tokens[0])
        assert list(toks[:5]) == [3, 4, 5, 6, 7]
        assert int(res.lengths[0]) == 4

    def test_min_tokens_blocks_eos(self):
        def step_fn(last, state):
            logits = jnp.full((1, 5), -10.0).at[0, 4].set(10.0)  # always EOS
            return logits, state

        res = decode_loop(
            jax.random.PRNGKey(0), step_fn, state=(),
            first_token=jnp.array([0], jnp.int32), max_new_tokens=8,
            eos_ids=(4,), sampler=SamplerConfig(temperature=0.0), min_tokens=3)
        assert int(res.lengths[0]) >= 3


class TestQuantizedKVCache:
    """int8 KV cache (reference MarvisModel.swift:384-389 optional
    QuantizedKVCache): close to fp logits, and prefill==stepwise holds."""

    def test_close_to_fp_cache(self):
        key = jax.random.PRNGKey(0)
        params = transformer.init_params(key, TINY)
        tokens = jnp.array([[3, 7, 11, 2, 9]], dtype=jnp.int32)

        ref_cache = transformer.make_cache(TINY, 1, 16, dtype=jnp.float32)
        ref, _ = transformer.forward(params, TINY, tokens, ref_cache)

        qcache = transformer.make_cache(TINY, 1, 16, quantized=True)
        got, qcache = transformer.forward(params, TINY, tokens, qcache)
        assert int(qcache.pos) == 5
        # int8 KV: small quantization error, same argmax behavior
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=0.05, rtol=0.05)

    def test_prefill_equals_stepwise(self):
        params = transformer.init_params(jax.random.PRNGKey(1), TINY)
        tokens = jnp.array([[5, 1, 8, 4]], dtype=jnp.int32)

        cache = transformer.make_cache(TINY, 1, 16, quantized=True)
        full, _ = transformer.forward(params, TINY, tokens, cache)

        cache = transformer.make_cache(TINY, 1, 16, quantized=True)
        steps = []
        for i in range(4):
            lg, cache = transformer.forward(params, TINY,
                                            tokens[:, i: i + 1], cache)
            steps.append(lg[:, 0])
        np.testing.assert_allclose(np.asarray(full),
                                   np.asarray(jnp.stack(steps, axis=1)),
                                   atol=2e-3)


class TestQuantizedTransformer:
    """Stacked-scan transformer with MLX-format q4 leaves: decode must
    match the fp stack within int4 quantization error (kernel path on TPU,
    XLA dequant fallback on CPU — same math)."""

    def test_q4_decode_matches_fp(self):
        from tpu_audio.ops import quant

        params = transformer.init_params(jax.random.PRNGKey(3), TINY)
        tokens = jnp.array([[3, 7, 11, 2, 9]], dtype=jnp.int32)
        cache = transformer.make_cache(TINY, 1, 16, dtype=jnp.float32)
        ref, _ = transformer.forward(params, TINY, tokens, cache)

        qparams = jax.tree_util.tree_map(lambda x: x, params)  # copy tree
        for name in ("q", "k", "v", "o"):
            w = np.asarray(params["layers"]["attn"][name]["weight"])
            leaves = [quant.quantize_array(w[l], 4, group=16)
                      for l in range(w.shape[0])]
            qparams["layers"]["attn"][name] = {
                k: jnp.stack([jnp.asarray(d[k]) for d in leaves])
                for k in leaves[0]}
        cache2 = transformer.make_cache(TINY, 1, 16, dtype=jnp.float32)
        got, _ = transformer.forward(qparams, TINY, tokens, cache2)
        # int4 group quantization error propagated through 2 layers
        assert np.isfinite(np.asarray(got)).all()
        corr = np.corrcoef(np.asarray(got).ravel(), np.asarray(ref).ravel())
        assert corr[0, 1] > 0.99


def quantize_tree_int8_layers(params):
    """Per-channel int8 quantization of TINY's layer matmuls (the
    production quantize_tree_int8 skips sub-128-lane weights)."""
    from tpu_audio.ops import quant

    qp = jax.tree_util.tree_map(lambda x: x, params)
    for sub, names in (("attn", ("q", "k", "v", "o")),
                       ("mlp", ("gate", "up", "down"))):
        for name in names:
            w = np.asarray(params["layers"][sub][name]["weight"])
            d = quant.quantize_array_int8(w)
            qp["layers"][sub][name] = {k: jnp.asarray(v)
                                       for k, v in d.items()}
    return qp


class TestStackedQuantServing:
    """The decode scan pulls big int8/int4 weights out of the scanned tree
    and indexes them in-kernel via scalar prefetch (no per-step HBM copy of
    scan-sliced custom-call operands). Equivalence: the stacked path must
    produce the same logits as dequantizing every layer by hand."""

    def _int8_params(self):
        from tpu_audio.ops import quant

        params = transformer.init_params(jax.random.PRNGKey(5), TINY)
        qp = quantize_tree_int8_layers(params)
        return qp

    def test_split_reinject_roundtrip(self):
        qp = self._int8_params()
        scan_tree, stacked = transformer._split_stacked_quant(qp["layers"])
        assert stacked, "int8 tree should produce stacked entries"
        for path in stacked:
            assert path[-1] == "weight_i8"
        # scan tree no longer holds the big weights
        flat = jax.tree_util.tree_leaves(scan_tree)
        big = jax.tree_util.tree_leaves(
            {str(p): a for p, a in stacked.items()})
        assert sum(x.size for x in flat) < sum(x.size for x in big)
        lp = jax.tree_util.tree_map(lambda a: a[0], scan_tree)
        lp = transformer._reinject_stacked(lp, stacked, 0)
        leaf = lp["attn"]["qkv"] if "qkv" in lp["attn"] else lp["attn"]["q"]
        assert "weight_i8_stacked" in leaf and "layer_idx" in leaf

    def test_int8_decode_matches_manual_dequant(self):
        from tpu_audio.ops import quant

        qp = self._int8_params()
        tokens = jnp.array([[3, 7, 11, 2, 9]], dtype=jnp.int32)
        cache = transformer.make_cache(TINY, 1, 16, dtype=jnp.float32)
        got, _ = transformer.forward(qp, TINY, tokens, cache)

        # manual: dequantize every quantized leaf back to fp and rerun
        def deq(tree):
            if isinstance(tree, dict):
                if "weight_i8" in tree:
                    out = {"weight": quant.dequantize_int8(tree)}
                    if "bias" in tree:
                        out["bias"] = tree["bias"]
                    return out
                return {k: deq(v) for k, v in tree.items()}
            return tree

        fp = deq(qp)
        # undo qkv/gateup fusion is unnecessary: dequantized fused leaves
        # feed the same fused-linear paths
        cache2 = transformer.make_cache(TINY, 1, 16, dtype=jnp.float32)
        ref, _ = transformer.forward(fp, TINY, tokens, cache2)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)

    def test_w4a8_decode_matches_manual_dequant(self):
        from tpu_audio.ops import quant

        params = transformer.init_params(jax.random.PRNGKey(6), TINY)
        qt = jax.tree_util.tree_map(lambda x: x, params)
        for sub, names in (("attn", ("q", "k", "v", "o")),
                           ("mlp", ("gate", "up", "down"))):
            for name in names:
                w = np.asarray(params["layers"][sub][name]["weight"])
                leaves = [quant.quantize_array(w[l], 4, group=16)
                          for l in range(w.shape[0])]
                qt["layers"][sub][name] = {
                    k: jnp.stack([jnp.asarray(d[k]) for d in leaves])
                    for k in leaves[0]}
        # group 16 < 128: repack refuses narrow leaves, so widen via dim=128
        # config instead — here just assert the q4 path still runs through
        # the scan untouched (no weight_q4p, no stacked split)
        scan_tree, stacked = transformer._split_stacked_quant(qt["layers"])
        assert not stacked
        tokens = jnp.array([[1, 2, 3]], dtype=jnp.int32)
        cache = transformer.make_cache(TINY, 1, 8, dtype=jnp.float32)
        out, _ = transformer.forward(qt, TINY, tokens, cache)
        assert np.isfinite(np.asarray(out)).all()


class TestDepthwiseShifted:
    def test_matches_grouped_conv1d(self, rng):
        from tpu_audio.nn import layers

        k, c, t = 11, 32, 40
        p = {"weight": jnp.asarray(
            rng.standard_normal((k, 1, c)), jnp.float32),
            "bias": jnp.asarray(rng.standard_normal(c), jnp.float32)}
        x = jnp.asarray(rng.standard_normal((2, t, c)), jnp.float32)
        ref = layers.conv1d(p, x, padding=(7, 3), groups=c)
        got = layers.depthwise_conv1d_shifted(p, x, padding=(7, 3))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=1e-5)
