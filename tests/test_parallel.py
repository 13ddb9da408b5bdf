"""Multi-device tests on the virtual 8-device CPU mesh: TP sharding,
SP encoder, pjit train step, batched DP decode under shardings."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from tpu_audio.models.whisper import model as wmodel
from tpu_audio.models.whisper.config import WhisperConfig
from tpu_audio.nn import transformer as transformer_mod
from tpu_audio.parallel import make_mesh, param_shardings, whisper_rules
from tpu_audio.parallel.sp import encode_sequence_parallel

pytestmark = pytest.mark.slow  # engine e2e / parity / mesh

TINY = WhisperConfig(n_audio_state=64, n_audio_head=8, n_audio_layer=2,
                     n_text_state=64, n_text_head=8, n_text_layer=2,
                     n_text_ctx=32)


@pytest.fixture(scope="module")
def params():
    return wmodel.init_params(jax.random.PRNGKey(0), TINY)


class TestTPSharding:
    def test_sharded_forward_matches_replicated(self, params):
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        mesh = make_mesh(dp=1, tp=8)
        shardings = param_shardings(params, mesh, whisper_rules)
        sharded = jax.tree_util.tree_map(jax.device_put, params, shardings)

        mel = jax.random.normal(jax.random.PRNGKey(1), (1, 3000, 80)) * 0.1
        ref = np.asarray(wmodel.encode(params, TINY, mel))
        got = np.asarray(jax.jit(
            lambda p, m: wmodel.encode(p, TINY, m))(sharded, mel))
        np.testing.assert_allclose(got, ref, atol=2e-4)

    def test_sharding_specs_applied(self, params):
        mesh = make_mesh(dp=2, tp=4)
        shardings = param_shardings(params, mesh, whisper_rules)
        # q weight: stacked layers → (L, O, I) sharded on O
        spec = shardings["encoder"]["blocks"]["attn"]["q"]["weight"].spec
        assert spec == P(None, "tp", None)
        spec_o = shardings["encoder"]["blocks"]["attn"]["o"]["weight"].spec
        assert spec_o == P(None, None, "tp")


class TestSequenceParallel:
    def test_sp_encode_matches_replicated(self, params):
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        mesh = make_mesh(dp=1, tp=8)
        mel = jax.random.normal(jax.random.PRNGKey(2), (1, 3000, 80)) * 0.1
        ref = np.asarray(wmodel.encode(params, TINY, mel))
        got = np.asarray(encode_sequence_parallel(params, TINY, mel, mesh))
        np.testing.assert_allclose(got, ref, atol=2e-4)


class TestDPBatchDecode:
    def test_batch_rows_shard_over_dp(self, params):
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        mesh = make_mesh(dp=4, tp=2)
        mel = jax.random.normal(jax.random.PRNGKey(3), (4, 3000, 80)) * 0.1
        mel = jax.device_put(mel, NamedSharding(mesh, P("dp", None, None)))
        shardings = param_shardings(params, mesh, whisper_rules)
        sharded = jax.tree_util.tree_map(jax.device_put, params, shardings)

        @jax.jit
        def step(p, mel):
            feats = wmodel.encode(p, TINY, mel)
            state = wmodel.init_state(p, TINY, feats, batch=4)
            toks = jnp.tile(jnp.asarray([[50258, 50259, 50359]], jnp.int32),
                            (4, 1))
            logits, _ = wmodel.decode_step(p, TINY, toks, state)
            return logits

        out = step(sharded, mel)
        assert out.shape == (4, 3, TINY.n_vocab)
        assert np.isfinite(np.asarray(out)).all()


class TestLLMTensorParallel:
    """TP-sharded shared transformer (the Orpheus/Qwen serving path):
    sharded decode logits == replicated."""

    def test_tp_forward_matches_replicated(self):
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        from tpu_audio.nn import transformer
        from tpu_audio.nn.transformer import TransformerConfig
        from tpu_audio.parallel import transformer_rules

        cfg = TransformerConfig(dim=64, n_layers=2, n_heads=8, n_kv_heads=8,
                                hidden_dim=128, vocab_size=97)
        params = transformer.init_params(jax.random.PRNGKey(0), cfg)
        tokens = jnp.array([[5, 1, 8, 4, 2, 9, 3, 7]], dtype=jnp.int32)

        cache = transformer.make_cache(cfg, 1, 16, dtype=jnp.float32)
        ref, _ = transformer.forward(params, cfg, tokens, cache)

        mesh = make_mesh(dp=1, tp=8)
        shardings = param_shardings(params, mesh, transformer_rules)
        sharded = jax.tree_util.tree_map(jax.device_put, params, shardings)
        cache2 = transformer.make_cache(cfg, 1, 16, dtype=jnp.float32)
        got, _ = jax.jit(lambda p, t, c: transformer.forward(p, cfg, t, c))(
            sharded, tokens, cache2)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-4)

    def test_tp_generator_token_identical(self):
        """CausalLMGenerator(mesh=): full prefill+decode_loop under TP
        produces exactly the single-device token sequence (greedy)."""
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        from tpu_audio.models.orpheus.model import CausalLMGenerator
        from tpu_audio.nn import transformer
        from tpu_audio.nn.transformer import TransformerConfig
        from tpu_audio.ops.sampling import SamplerConfig

        cfg = TransformerConfig(dim=64, n_layers=2, n_heads=8, n_kv_heads=8,
                                hidden_dim=128, vocab_size=97)
        params = transformer.init_params(jax.random.PRNGKey(3), cfg)
        kw = dict(sampler=SamplerConfig(temperature=0.0), eos_ids=(96,),
                  max_new=12, seed=0)
        ref = CausalLMGenerator(params, cfg, max_cache=64).generate(
            [5, 7, 11], **kw)
        mesh = make_mesh(dp=1, tp=8)
        got = CausalLMGenerator(params, cfg, max_cache=64,
                                mesh=mesh).generate([5, 7, 11], **kw)
        assert got == ref and len(ref) > 0

    def test_tp_generator_rejects_indivisible_heads(self):
        from tpu_audio.models.orpheus.model import CausalLMGenerator
        from tpu_audio.nn import transformer
        from tpu_audio.nn.transformer import TransformerConfig

        cfg = TransformerConfig(dim=32, n_layers=1, n_heads=4, n_kv_heads=2,
                                hidden_dim=64, vocab_size=11)
        params = transformer.init_params(jax.random.PRNGKey(0), cfg)
        with pytest.raises(ValueError, match="divisible"):
            CausalLMGenerator(params, cfg, mesh=make_mesh(dp=1, tp=8))

    def test_specs_on_stacked_layers(self):
        from tpu_audio.nn import transformer
        from tpu_audio.nn.transformer import TransformerConfig
        from tpu_audio.parallel import transformer_rules

        cfg = TransformerConfig(dim=32, n_layers=2, n_heads=4,
                                hidden_dim=64, vocab_size=11)
        params = transformer.init_params(jax.random.PRNGKey(1), cfg)
        mesh = make_mesh(dp=2, tp=4)
        sh = param_shardings(params, mesh, transformer_rules)
        assert sh["layers"]["attn"]["q"]["weight"].spec == P(None, "tp", None)
        assert sh["layers"]["mlp"]["down"]["weight"].spec == P(None, None,
                                                               "tp")


class TestEngineTPServing:
    """Engine-level tensor-parallel serving (VERDICT r1 #8): the public
    OrpheusEngine accepts mesh= and produces byte-identical audio to the
    single-device engine on the virtual CPU mesh."""

    def test_orpheus_engine_tp_identical_audio(self):
        from tpu_audio.codecs import snac
        from tpu_audio.models.orpheus import model as omodel
        from tpu_audio.models.orpheus.engine import OrpheusEngine
        from tpu_audio.nn import transformer

        cfg = transformer.TransformerConfig(
            dim=64, n_layers=2, n_heads=8, n_kv_heads=8, hidden_dim=128,
            vocab_size=omodel.CODE_OFFSET + 7 * omodel.CODEBOOK_SIZE,
            tie_word_embeddings=True)
        snac_cfg = snac.SNACConfig(decoder_dim=64, decoder_rates=(4, 4, 2, 2),
                                   latent_dim=32, codebook_size=64,
                                   codebook_dim=4, vq_strides=(4, 2, 1))
        lm_params = transformer.init_params(jax.random.PRNGKey(2), cfg)
        snac_params = snac.init_params(jax.random.PRNGKey(3), snac_cfg)

        ref = OrpheusEngine.from_params(lm_params, cfg, snac_params,
                                        snac_cfg, max_cache=256)
        ref.temperature = 0.0
        r0 = ref.generate("Hello there.", max_new_tokens=48, seed=5)

        mesh = make_mesh(dp=1, tp=8)
        tp = OrpheusEngine.from_params(lm_params, cfg, snac_params,
                                       snac_cfg, max_cache=256, mesh=mesh)
        tp.temperature = 0.0
        r1 = tp.generate("Hello there.", max_new_tokens=48, seed=5)

        assert r0.samples.shape == r1.samples.shape
        assert np.allclose(r0.samples, r1.samples, atol=1e-5)


class TestCosyVoice2EngineMesh:
    """VERDICT r3 #6: the TTS serving unit is the ENGINE, not the LM — a
    full CosyVoice2 pipeline (Qwen2 LM + conformer/CFM flow + HiFT) under
    a dp×tp mesh must reproduce the single-device waveform. LM tokens are
    integers (exact); flow/vocoder float reductions reorder under GSPMD,
    so the waveform bar is allclose at f32 tolerance."""

    def _tiny_engine(self, mesh=None):
        import tests.test_cosyvoice2 as tcv2
        from tpu_audio.codecs import s3tokenizer
        from tpu_audio.models.cosyvoice2 import lm as lm_mod
        from tpu_audio.models.cosyvoice2.engine import CosyVoice2Engine

        lm_params = lm_mod.init_params(jax.random.PRNGKey(0), tcv2.TINY_LM)
        s3_cfg, s3_params = tcv2.tiny_s3()
        tok_cfg = s3tokenizer.S3TokenizerConfig(
            n_mels=128, n_audio_state=64, n_audio_head=4, n_audio_layer=1)
        tok_params = s3tokenizer.init_params(jax.random.PRNGKey(2), tok_cfg)
        return CosyVoice2Engine.from_params(
            lm_params, tcv2.TINY_LM, s3_params, s3_cfg, tok_params, tok_cfg,
            max_cache=256, mesh=mesh)

    def test_engine_dp_tp_waveform_parity(self):
        ref = self._tiny_engine()
        r0 = ref.generate("Hello there.")
        mesh = make_mesh(dp=2, tp=4)
        eng = self._tiny_engine(mesh=mesh)
        r1 = eng.generate("Hello there.")
        assert r0.samples.shape == r1.samples.shape
        assert np.allclose(r0.samples, r1.samples, atol=1e-4)

    def test_flow_params_actually_sharded(self):
        mesh = make_mesh(dp=2, tp=4)
        eng = self._tiny_engine(mesh=mesh)
        w1 = eng.s3gen_params["flow"]["encoder"]["encoders"]["0"][
            "feed_forward"]["w_1"]["weight"]
        spec = w1.sharding.spec
        assert tuple(spec) and spec[0] == "tp", spec
        # vocoder stays replicated by design
        voc = eng.s3gen_params["mel2wav"]["conv_pre"]["weight"]
        assert all(s is None for s in voc.sharding.spec), voc.sharding.spec


class TestTPQuantServing:
    """shard_map TP for QUANTIZED params (parallel/tp_quant.py): per-shard
    megatron slices + explicit psums must reproduce the single-device
    quantized decode (CPU mesh; kernels take the exact-dequant fallback, so
    partial-sum == full matmul up to float association)."""

    def _quant_params(self, fuse):
        from tpu_audio.ops import quant

        cfg = transformer_mod.TransformerConfig(
            dim=32, n_layers=2, n_heads=4, n_kv_heads=2, hidden_dim=64,
            vocab_size=96, tie_word_embeddings=True)
        params = transformer_mod.init_params(jax.random.PRNGKey(0), cfg)
        qp = jax.tree_util.tree_map(lambda x: x, params)
        for sub, names in (("attn", ("q", "k", "v", "o")),
                           ("mlp", ("gate", "up", "down"))):
            for name in names:
                w = np.asarray(params["layers"][sub][name]["weight"])
                d = quant.quantize_array_int8(w)
                qp["layers"][sub][name] = {k: jnp.asarray(v)
                                           for k, v in d.items()}
        if fuse:
            qp["layers"] = quant.fuse_int8_tree(qp["layers"])
        return qp, cfg

    @pytest.mark.parametrize("fuse", [False, True])
    def test_tp_quant_decode_matches_single(self, fuse):
        from tpu_audio.models.orpheus.model import CausalLMGenerator
        from tpu_audio.ops.sampling import SamplerConfig

        qp, cfg = self._quant_params(fuse)
        sampler = SamplerConfig(temperature=0.0)
        kw = dict(sampler=sampler, eos_ids=(95,), max_new=12, seed=4)
        single = CausalLMGenerator(qp, cfg, max_cache=64)
        ref = single.generate([3, 5, 7], **kw)

        mesh = make_mesh(dp=4, tp=2)
        gen = CausalLMGenerator(qp, cfg, max_cache=64, mesh=mesh)
        assert gen._axis == "tp"  # quantized params -> shard_map mode
        got = gen.generate([3, 5, 7], **kw)
        assert got == ref

    def test_tp_quant_batch(self):
        from tpu_audio.models.orpheus.model import CausalLMGenerator
        from tpu_audio.ops.sampling import SamplerConfig

        qp, cfg = self._quant_params(True)
        sampler = SamplerConfig(temperature=0.0)
        mesh = make_mesh(dp=4, tp=2)
        gen = CausalLMGenerator(qp, cfg, max_cache=64, mesh=mesh)
        outs = gen.generate_batch([[3, 5, 7], [2, 4, 6, 8]],
                                  sampler=sampler, eos_ids=(95,),
                                  max_new=10, seed=1)
        assert len(outs) == 2
        single = CausalLMGenerator(qp, cfg, max_cache=64)
        souts = single.generate_batch([[3, 5, 7], [2, 4, 6, 8]],
                                      sampler=sampler, eos_ids=(95,),
                                      max_new=10, seed=1)
        assert outs == souts

    def test_tp_quant_spanned_cancellation(self):
        from tpu_audio.models.orpheus.model import CausalLMGenerator
        from tpu_audio.ops.sampling import SamplerConfig

        qp, cfg = self._quant_params(True)
        sampler = SamplerConfig(temperature=0.0)
        mesh = make_mesh(dp=4, tp=2)
        gen = CausalLMGenerator(qp, cfg, max_cache=64, mesh=mesh)
        got = gen.generate([3, 5, 7], sampler=sampler, eos_ids=(95,),
                           max_new=12, seed=4, should_stop=lambda: False,
                           span=4)
        single = CausalLMGenerator(qp, cfg, max_cache=64)
        ref = single.generate([3, 5, 7], sampler=sampler, eos_ids=(95,),
                              max_new=12, seed=4, should_stop=lambda: False,
                              span=4)
        assert got == ref

    def test_tp_quant_w4a8_decode_matches_single(self):
        """W4A8 leaves under shard_map TP: column shards split output
        channels, row shards split whole group-64s (scales/biases shard on
        the group axis). CPU-mesh fallback = exact dequant, so partial
        sums must reproduce the single-device decode exactly."""
        from tpu_audio.models.orpheus.model import CausalLMGenerator
        from tpu_audio.ops import quant
        from tpu_audio.ops.sampling import SamplerConfig

        cfg = transformer_mod.TransformerConfig(
            dim=256, n_layers=2, n_heads=4, n_kv_heads=2, hidden_dim=512,
            vocab_size=96, tie_word_embeddings=True)
        params = transformer_mod.init_params(jax.random.PRNGKey(1), cfg)
        qp = jax.tree_util.tree_map(lambda x: x, params)
        for sub, names in (("attn", ("q", "k", "v", "o")),
                           ("mlp", ("gate", "up", "down"))):
            for name in names:
                w = np.asarray(params["layers"][sub][name]["weight"])
                qs = [quant.quantize_array(w[l], bits=4, group=64)
                      for l in range(w.shape[0])]
                stacked = {k: np.stack([q[k] for q in qs]) for k in qs[0]}
                qp["layers"][sub][name] = quant.repack_w4a8(stacked)
        qp["layers"] = quant.fuse_w4a8_tree(qp["layers"])
        assert "qkv" in qp["layers"]["attn"]

        sampler = SamplerConfig(temperature=0.0)
        kw = dict(sampler=sampler, eos_ids=(95,), max_new=10, seed=2)
        single = CausalLMGenerator(qp, cfg, max_cache=64)
        ref = single.generate([3, 5, 7], **kw)
        mesh = make_mesh(dp=4, tp=2)
        gen = CausalLMGenerator(qp, cfg, max_cache=64, mesh=mesh)
        assert gen._axis == "tp"
        got = gen.generate([3, 5, 7], **kw)
        assert got == ref
