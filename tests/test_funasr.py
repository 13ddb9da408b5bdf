"""Fun-ASR tests: SANM encoder, adaptor, prompt merge, engine e2e."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_audio.api.stt_funasr import (FunASREngine, build_prompt_text,
                                      clean_output)
from tpu_audio.models.funasr import model as fmodel
from tpu_audio.nn import transformer

pytestmark = pytest.mark.slow  # engine e2e / parity / mesh

TINY = fmodel.FunASRConfig(
    encoder=fmodel.SenseVoiceConfig(input_dim=560, encoder_dim=32,
                                    num_heads=4, ffn_dim=64,
                                    num_encoders0=1, num_encoders=2,
                                    num_tp_encoders=1, kernel_size=5),
    adaptor=fmodel.AdaptorConfig(encoder_dim=32, downsample_rate=2,
                                 ffn_dim=64, llm_dim=48, n_layer=1,
                                 attention_heads=4),
    llm=transformer.TransformerConfig(dim=48, n_layers=2, n_heads=4,
                                      n_kv_heads=2, hidden_dim=96,
                                      vocab_size=300, qk_norm=True,
                                      tie_word_embeddings=True))


@pytest.fixture(scope="module")
def params():
    return fmodel.init_params(jax.random.PRNGKey(0), TINY)


class TestEncoder:
    def test_encode_shapes(self, params, rng):
        feats = jnp.asarray(rng.standard_normal((1, 20, 560)), jnp.float32)
        out = fmodel.encode(params["encoder"], TINY.encoder, feats,
                            jnp.asarray([18]))
        assert out.shape == (1, 20, 32)
        assert np.isfinite(np.asarray(out)).all()

    def test_adaptor_downsamples(self, params, rng):
        x = jnp.asarray(rng.standard_normal((1, 20, 32)), jnp.float32)
        out, lens = fmodel.adapt(params["adaptor"], TINY.adaptor, x,
                                 jnp.asarray([18]))
        assert out.shape == (1, 10, 48)
        assert int(lens[0]) == 9


class TestPrompt:
    def test_build_prompt(self):
        pre, post = build_prompt_text("transcribe", "en")
        assert pre.endswith("<|startofspeech|>")
        assert post.startswith("<|endofspeech|>")
        assert "English" in pre

    def test_translate_prompt(self):
        pre, _ = build_prompt_text("translate", target_language="es")
        assert "Spanish" in pre

    def test_clean_output(self):
        assert clean_output("hello<|im_end|> world") == "hello world"


class TestGenerator:
    def test_generate(self, params, rng):
        gen = fmodel.FunASRGenerator(params, TINY, max_cache=256)
        feats = rng.standard_normal((20, 560)).astype(np.float32)
        out = gen.generate([1, 2, 3], [4, 5], feats, eos_ids=(7,),
                           max_new=12)
        assert all(t != 7 for t in out)
        assert len(out) <= 12


class TestEngine:
    def test_transcribe_e2e(self, params, rng):
        eng = FunASREngine.from_params(params, TINY, max_cache=768)
        audio = (0.1 * np.sin(np.linspace(0, 400 * np.pi, 16000))).astype(np.float32)
        res = eng.transcribe(audio, max_new_tokens=8)
        assert res.duration == pytest.approx(1.0)
        assert isinstance(res.text, str)

    def test_translate_and_streaming(self, params, rng):
        eng = FunASREngine.from_params(params, TINY, max_cache=768)
        audio = np.zeros(8000, np.float32)
        res = eng.translate(audio, target_language="es", max_new_tokens=8)
        assert isinstance(res.text, str)
        chunks = list(eng.transcribe_streaming(audio, max_new_tokens=8))
        assert len(chunks) >= 1


def test_adaptor_fused_qkv_matches_unfused():
    """fuse_int8_tree fuses the adaptor's q/k/v; adapt() must handle the
    fused leaf identically (this broke the w8a8 serving path)."""
    from tpu_audio.models.funasr import model as fmodel
    from tpu_audio.ops import quant

    cfg = fmodel.FunASRConfig()
    acfg = cfg.adaptor
    params = fmodel.init_adaptor(jax.random.PRNGKey(0), acfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(
        (1, 8 * acfg.downsample_rate, acfg.encoder_dim)), jnp.float32)
    lens = jnp.asarray([8 * acfg.downsample_rate], jnp.int32)
    ref, _ = fmodel.adapt(params, acfg, x, lens)

    def to_i8(leaf):
        d = quant.quantize_array_int8(np.asarray(leaf["weight"], np.float32))
        out = {k: jnp.asarray(v) for k, v in d.items()}
        if "bias" in leaf:
            out["bias"] = leaf["bias"]
        return out

    qp = jax.tree_util.tree_map(lambda a: a, params)
    for i in range(acfg.n_layer):
        at = qp["blocks"][str(i)]["attn"]
        qp["blocks"][str(i)]["attn"] = {k: to_i8(v) if k in "qkvo" else v
                                        for k, v in at.items()}
    fused = quant.fuse_int8_tree(qp)
    assert "qkv" in fused["blocks"]["0"]["attn"]
    got, _ = fmodel.adapt(fused, acfg, x, lens)
    # int8 quantization error only — fused vs unfused is the same math
    assert np.corrcoef(np.asarray(got).ravel(),
                       np.asarray(ref).ravel())[0, 1] > 0.999


class TestFusedDecode:
    """FunASR's Qwen3 decode through the whole-stack fused kernel (qk-norm
    in-kernel): greedy tokens must match the plain-cache path."""

    def test_greedy_matches_plain(self, monkeypatch, rng):
        import functools

        from tpu_audio.ops.pallas import fused_step

        cfg = fmodel.FunASRConfig(
            encoder=TINY.encoder,
            adaptor=fmodel.AdaptorConfig(encoder_dim=32, downsample_rate=2,
                                         ffn_dim=64, llm_dim=128, n_layer=1,
                                         attention_heads=4),
            llm=transformer.TransformerConfig(
                dim=128, n_layers=2, n_heads=2, n_kv_heads=1,
                hidden_dim=512, vocab_size=300, qk_norm=True,
                tie_word_embeddings=True))
        params = fmodel.init_params(jax.random.PRNGKey(4), cfg)
        feats = rng.standard_normal((20, 560)).astype(np.float32)

        gen = fmodel.FunASRGenerator(params, cfg, max_cache=256)
        ref = gen.generate([1, 2, 3], [4, 5], feats, eos_ids=(7,),
                           max_new=10)

        monkeypatch.setattr(
            fused_step, "fused_decode_step",
            functools.partial(fused_step.fused_decode_step, interpret=True))
        monkeypatch.setattr(
            fused_step, "supported",
            lambda c, p, b, *a, **k: b == 1 and "qkv" in p["layers"]["attn"])
        gen_f = fmodel.FunASRGenerator(params, cfg, max_cache=256)
        got = gen_f.generate([1, 2, 3], [4, 5], feats, eos_ids=(7,),
                             max_new=10)
        assert got == ref, (got, ref)
