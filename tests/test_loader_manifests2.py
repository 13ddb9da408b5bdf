"""Loader key-manifest locks for the remaining loader families
(VERDICT r2 #3): funasr, chatterbox (s3gen incl. CAMPPlus + VoiceEncoder),
cosyvoice2/3 prefix routing, dac, snac, mimi, s3tokenizer, kokoro.

Each test synthesizes a checkpoint flat-dict in the SOURCE layout (torch /
MLX naming + conv layouts), runs the loader's pure convert(), and
validates the result against the model's own init_params schema — so a
layout drift in ANY loader is a test failure today, not silent garbage on
launch day (the remaps were written in a zero-egress environment).
"""

import functools
import re

import jax
import numpy as np
import pytest

from tpu_audio.utils import pytree, weights


def _expected(init_fn):
    sh = jax.eval_shape(init_fn)
    return {k: tuple(v.shape) for k, v in pytree.flatten(sh).items()}


def _conv_to_torch(shape):  # ours (K, I, O) -> torch (O, I, K)
    k, i, o = shape
    return (o, i, k)


def _convT_to_torch(shape):  # ours (K, I, O) -> torch (I, O, K)
    k, i, o = shape
    return (i, o, k)


_TRANSPOSED_RE = re.compile(r"\.(ups|convT|up_layer|pool)\.")


def _validate(tree, init_fn, name):
    weights.validate_tree(tree, init_fn, name=name)


# -------------------------------------------------------------------- dac

class TestDACManifest:
    def test_manifest_maps_exactly(self):
        from tpu_audio.codecs import dac
        from tpu_audio.codecs.dac import load as dload

        cfg = dac.DACConfig(encoder_dim=8, encoder_rates=(2, 4, 5, 8),
                            decoder_dim=64, decoder_rates=(8, 5, 4, 2),
                            n_codebooks=2, codebook_size=32, codebook_dim=4,
                            latent_dim=16)
        init_fn = functools.partial(dac.init_params, jax.random.PRNGKey(0),
                                    cfg)
        flat = {}
        inv_res = {"snake1": "block.0", "conv1": "block.1",
                   "snake2": "block.2", "conv2": "block.3"}
        for k, shape in _expected(init_fn).items():
            parts = k.split(".")
            if parts[0] == "quantizer":
                src = f"quantizer.quantizers.{parts[1]}." + ".".join(parts[2:])
            elif parts[0] == "encoder":
                top = {"conv_in": "block.0", "snake_out": "block.5",
                       "conv_out": "block.6"}
                if parts[1] in top:
                    src = f"encoder.{top[parts[1]]}." + ".".join(parts[2:])
                else:  # blocks.N.{residuals.j.x | snake.x | conv.x}
                    bi, rest = int(parts[2]), parts[3:]
                    if rest[0] == "residuals":
                        inner = (f"block.{int(rest[1])}.{inv_res[rest[2]]}."
                                 + ".".join(rest[3:]))
                    else:
                        inner = (f"block.{'3' if rest[0] == 'snake' else '4'}."
                                 + ".".join(rest[1:]))
                    src = f"encoder.block.{bi + 1}.{inner}"
            else:  # decoder
                top = {"conv_in": "model.0", "snake_out": "model.5",
                       "conv_out": "model.6"}
                if parts[1] in top:
                    src = f"decoder.{top[parts[1]]}." + ".".join(parts[2:])
                else:
                    bi, rest = int(parts[2]), parts[3:]
                    if rest[0] == "residuals":
                        inner = (f"block.{int(rest[1]) + 2}."
                                 f"{inv_res[rest[2]]}." + ".".join(rest[3:]))
                    else:
                        inner = (f"block.{'0' if rest[0] == 'snake' else '1'}."
                                 + ".".join(rest[1:]))
                    src = f"decoder.model.{bi + 1}.{inner}"
            if len(shape) == 3:
                shape = (_convT_to_torch(shape) if ".convT." in k
                         else _conv_to_torch(shape))
            flat[src] = np.zeros(shape, np.float32)
        _validate(dload.convert(flat), init_fn, "dac")


# ------------------------------------------------------------------- snac

class TestSNACManifest:
    def test_manifest_maps_exactly(self):
        from tpu_audio.codecs import snac
        from tpu_audio.models.orpheus import load as oload

        cfg = snac.SNACConfig(decoder_dim=32, decoder_rates=(4, 4, 2, 2),
                              latent_dim=16, codebook_size=32, codebook_dim=4,
                              vq_strides=(4, 2, 1))
        init_fn = functools.partial(snac.init_params, jax.random.PRNGKey(0),
                                    cfg)
        inv_res = {"snake1": "block.0", "conv1": "block.1",
                   "snake2": "block.2", "conv2": "block.3"}
        # encoder weights must be silently dropped (decode-only)
        flat = {"encoder.block.0.weight_v": np.zeros((16, 16, 3), np.float32)}
        for k, shape in _expected(init_fn).items():
            parts = k.split(".")
            if parts[0] == "quantizer":
                src = f"quantizer.quantizers.{parts[1]}." + ".".join(parts[2:])
            else:
                top = {"depthwise_conv": "model.0", "pointwise_conv": "model.1",
                       "final_snake": "model.6", "final_conv": "model.7"}
                if parts[1] in top:
                    src = f"decoder.{top[parts[1]]}." + ".".join(parts[2:])
                else:
                    bi, rest = int(parts[2]), parts[3:]
                    if rest[0] == "residuals":
                        inner = (f"block.{int(rest[1]) + 3}."
                                 f"{inv_res[rest[2]]}." + ".".join(rest[3:]))
                    elif rest[0] == "noise":
                        inner = "block.2." + ".".join(rest[1:])
                    else:
                        inner = (f"block.{'0' if rest[0] == 'snake' else '1'}."
                                 + ".".join(rest[1:]))
                    src = f"decoder.model.{bi + 2}.{inner}"
            if len(shape) == 3:
                shape = (_convT_to_torch(shape) if ".convT." in k
                         else _conv_to_torch(shape))
            flat[src] = np.zeros(shape, np.float32)
        _validate(oload.convert_snac(flat), init_fn, "snac")


# ---------------------------------------------------------------- funasr

class TestFunASRManifest:
    def test_manifest_maps_exactly(self):
        from tests.test_loader_manifests import _llama_manifest

        from tpu_audio.models.funasr import load as fload
        from tpu_audio.models.funasr import model as fm
        from tpu_audio.nn import transformer

        enc_cfg = fm.SenseVoiceConfig(input_dim=24, encoder_dim=32,
                                      num_heads=4, ffn_dim=64,
                                      num_encoders0=1, num_encoders=2,
                                      num_tp_encoders=1)
        adp_cfg = fm.AdaptorConfig(encoder_dim=32, ffn_dim=64, llm_dim=32,
                                   n_layer=1, attention_heads=4)
        llm_cfg = transformer.TransformerConfig(
            dim=32, n_layers=2, n_heads=4, n_kv_heads=2, hidden_dim=64,
            vocab_size=64, qk_norm=True)

        flat = {}
        enc_fn = functools.partial(fm.init_encoder, jax.random.PRNGKey(0),
                                   enc_cfg)
        for k, shape in _expected(enc_fn).items():
            if len(shape) == 3:  # fsmn depthwise: ours (K, 1, O) → torch
                shape = _conv_to_torch(shape)
            flat["encoder." + k] = np.zeros(shape, np.float32)
        adp_fn = functools.partial(fm.init_adaptor, jax.random.PRNGKey(1),
                                   adp_cfg)
        for k, shape in _expected(adp_fn).items():
            flat["adaptor." + k] = np.zeros(shape, np.float32)
        for k, v in _llama_manifest(llm_cfg).items():
            flat["llm." + k] = v

        params = fload.convert(flat)
        _validate(params["encoder"], enc_fn, "funasr-encoder")
        _validate(params["adaptor"], adp_fn, "funasr-adaptor")
        _validate(params["llm"],
                  functools.partial(transformer.init_params,
                                    jax.random.PRNGKey(2), llm_cfg),
                  "funasr-llm")


# ------------------------------------------------------------ s3tokenizer

class TestS3TokenizerManifest:
    def test_manifest_maps_exactly(self):
        from tpu_audio.codecs import s3tokenizer
        from tpu_audio.codecs.s3tokenizer import load as sload

        cfg = s3tokenizer.S3TokenizerConfig(n_mels=16, n_audio_state=32,
                                            n_audio_head=4, n_audio_layer=2)
        init_fn = functools.partial(s3tokenizer.init_params,
                                    jax.random.PRNGKey(0), cfg)
        flat = {}
        for k, shape in _expected(init_fn).items():
            if len(shape) == 3:  # MLX conv layout (O, K, I)
                kk, i, o = shape
                shape = (o, kk, i)
            flat[k] = np.zeros(shape, np.float32)
        _validate(sload.convert(flat), init_fn, "s3tokenizer")


# ------------------------------------------------------------------- mimi

class TestMimiManifest:
    def test_manifest_maps_exactly(self):
        from tpu_audio.codecs import mimi
        from tpu_audio.models.marvis import load as mload

        cfg = mimi.MimiConfig(dimension=32, n_filters=4, ratios=(4, 3, 2),
                              t_layers=2, t_heads=4, t_ff=64)
        init_fn = functools.partial(mimi.init_params, jax.random.PRNGKey(0),
                                    cfg)
        flat = {}
        for k, shape in _expected(init_fn).items():
            src = k
            if src.startswith("encoder.layers."):
                src = "encoder.model." + src[len("encoder.layers."):]
            elif src.startswith("decoder.layers."):
                src = "decoder.model." + src[len("decoder.layers."):]
            if len(shape) == 3:
                kk, i, o = shape
                if ".convtr." in src or ".upsample." in src:
                    # kyutai transposed conv (I, O, K); depthwise (C, 1, K)
                    shape = (o, i, kk) if i == 1 else (i, o, kk)
                    src = src.replace(".weight", ".convtr.convtr.weight")
                else:
                    shape = (o, i, kk)
                    src = src.replace(".weight", ".conv.conv.weight")
            flat[src] = np.zeros(shape, np.float32)
        _validate(mload.convert_mimi(flat), init_fn, "mimi")


# ------------------------------------------------------------- chatterbox

def _tiny_s3gen_cfg():
    from tpu_audio.codecs.s3gen import campplus, conformer, flow, hift
    from tpu_audio.codecs.s3gen import model as s3gen

    return s3gen.S3GenConfig(
        vocab_size=64, input_dim=32, spk_dim=24, mel_dim=16,
        conformer=conformer.ConformerConfig(input_size=32, output_size=32,
                                            heads=4, linear_units=64,
                                            num_blocks=1, num_up_blocks=1),
        estimator=flow.EstimatorConfig(in_channels=16 * 4, out_channels=16,
                                       channels=32, n_blocks=1,
                                       num_mid_blocks=1, num_heads=4),
        cfm=flow.CFMConfig(n_timesteps=2),
        hift=hift.HiFTConfig(in_channels=16, base_channels=32,
                             upsample_rates=(4, 3), upsample_kernels=(8, 7),
                             source_resblock_kernels=(7, 11),
                             source_resblock_dilations=((1, 3, 5), (1, 3, 5)),
                             resblock_kernels=(3,),
                             resblock_dilations=((1, 3, 5),)),
        campplus=campplus.CAMPPlusConfig(feat_dim=16, embedding_size=24,
                                         growth_rate=8, bn_size=2,
                                         init_channels=16, blocks=(2, 2),
                                         kernels=(3, 3), dilations=(1, 2)))


def _s3gen_manifest(init_fn):
    flat = {}
    for k, shape in _expected(init_fn).items():
        if len(shape) == 3:
            shape = (_convT_to_torch(shape) if _TRANSPOSED_RE.search(k)
                     else _conv_to_torch(shape))
        flat[k] = np.zeros(shape, np.float32)
    return flat


class TestChatterboxManifest:
    def test_s3gen_manifest(self):
        from tpu_audio.codecs.s3gen import model as s3gen
        from tpu_audio.models.chatterbox.load import _convert_conv_layouts

        cfg = _tiny_s3gen_cfg()
        init_fn = functools.partial(s3gen.init_params, jax.random.PRNGKey(0),
                                    cfg)
        tree = pytree.unflatten(_convert_conv_layouts(_s3gen_manifest(init_fn)))
        _validate(tree, init_fn, "chatterbox-s3gen")

    def test_ve_manifest(self):
        from tpu_audio.models.chatterbox import voice_encoder as ve

        cfg = ve.VoiceEncConfig(num_mels=40, ve_hidden_size=16,
                                speaker_embed_size=8)
        init_fn = functools.partial(ve.init_params, jax.random.PRNGKey(1),
                                    cfg)
        flat = {k: np.zeros(s, np.float32)
                for k, s in _expected(init_fn).items()}
        _validate(pytree.unflatten(flat), init_fn, "chatterbox-ve")

    def test_prefix_split(self):
        from tpu_audio.models.chatterbox.load import _split_prefixes

        flat = {"t3.a.w": 1, "s3gen.b.w": 2, "ve.c.w": 3, "other.w": 4}
        g = _split_prefixes(flat)
        assert g["t3"] == {"a.w": 1} and g["s3gen"] == {"b.w": 2}
        assert g["ve"] == {"c.w": 3} and g["other"] == {"other.w": 4}


# ------------------------------------------------------------- cosyvoice2

class TestCosyVoiceManifest:
    def test_cv2_split_and_convert(self):
        from tests.test_loader_manifests import _llama_manifest

        from tpu_audio.codecs.s3gen import model as s3gen
        from tpu_audio.models.cosyvoice2 import lm as lm_mod
        from tpu_audio.models.cosyvoice2 import load as cload
        from tpu_audio.nn import transformer

        qwen = transformer.TransformerConfig(
            dim=48, n_layers=2, n_heads=4, n_kv_heads=2, hidden_dim=96,
            vocab_size=400, attn_qkv_bias=True, tie_word_embeddings=True)
        lm_cfg = lm_mod.CosyLMConfig(qwen=qwen, llm_input_size=48,
                                     speech_token_size=60)
        flat = {}
        for k, v in _llama_manifest(qwen).items():
            flat["llm.llm." + k] = v
        lm_fn = functools.partial(lm_mod.init_params, jax.random.PRNGKey(0),
                                  lm_cfg)
        for k, shape in _expected(lm_fn).items():
            if k.startswith("llm."):
                continue
            flat[k] = np.zeros(shape, np.float32)

        s3_cfg = _tiny_s3gen_cfg()
        s3_fn = functools.partial(s3gen.init_params, jax.random.PRNGKey(1),
                                  s3_cfg)
        for k, v in _s3gen_manifest(s3_fn).items():
            if k.startswith("mel2wav."):
                src = "hift." + k[len("mel2wav."):]
            elif k.startswith("speaker_encoder."):
                src = "campplus." + k[len("speaker_encoder."):]
            else:
                src = "flow." + k
            flat[src] = v

        lm_params, s3_params = cload.convert(flat)
        _validate(lm_params, lm_fn, "cv2-lm")
        _validate(s3_params, s3_fn, "cv2-s3gen")


# ----------------------------------------------------------------- kokoro

class TestKokoroManifest:
    """The gnarliest remap set (KokoroWeightLoader.swift:13-172): lstms
    interleaving, cnn.N.{0,1} submodules, gamma/beta norms, duration_proj
    nesting, LSTM torch naming, and three conv layout conventions."""

    def _cfg(self):
        from tpu_audio.models.kokoro.config import AlbertConfig, KokoroConfig

        return KokoroConfig(
            albert=AlbertConfig(num_hidden_layers=1, num_attention_heads=2,
                                hidden_size=16, intermediate_size=32,
                                embedding_size=8, vocab_size=20,
                                max_position_embeddings=32),
            d_model=16, style_dim=8, n_symbols=20, decoder_hidden=32,
            resblock_kernels=(3,), resblock_dilations=((1, 3, 5),),
            upsample_rates=(5, 4), upsample_kernels=(10, 8),
            upsample_initial_channel=16, istft_n_fft=16, istft_hop=4,
            harmonic_num=4, text_encoder_depth=1)

    def _manifest(self):
        from tpu_audio.models.kokoro import model as km

        cfg = self._cfg()
        init_fn = functools.partial(km.init_params, jax.random.PRNGKey(0),
                                    cfg)
        flat = {"bert.embeddings.position_ids": np.zeros((1, 32), np.int64)}
        for k, shape in _expected(init_fn).items():
            src = k
            # inverse remaps (checkpoint layout)
            m = re.match(r"^(predictor\.text_encoder)\.(lstm|norm)(\d)\.(.+)$",
                         src)
            if m:
                idx = int(m.group(3)) * 2 + (0 if m.group(2) == "lstm" else 1)
                src = f"{m.group(1)}.lstms.{idx}.{m.group(4)}"
            m = re.match(r"^(text_encoder\.cnn\.\d+)\.(conv|norm)\.(.+)$", src)
            if m:
                sub = "0" if m.group(2) == "conv" else "1"
                tail = m.group(3)
                if sub == "1":  # norms ship as gamma/beta
                    tail = tail.replace("weight", "gamma").replace("bias",
                                                                   "beta")
                src = f"{m.group(1)}.{sub}.{tail}"
            src = src.replace("predictor.duration_proj.",
                              "predictor.duration_proj.linear_layer.")
            m = re.match(r"^(.*)\.(fwd|bwd)\.(wx|wh|bias_ih|bias_hh)$", src)
            if m:
                kind = {"wx": "weight_ih_l0", "wh": "weight_hh_l0",
                        "bias_ih": "bias_ih_l0", "bias_hh": "bias_hh_l0"}
                suffix = "_reverse" if m.group(2) == "bwd" else ""
                src = f"{m.group(1)}.{kind[m.group(3)]}{suffix}"
            if len(shape) == 3:
                kk, i, o = shape
                if re.search(r"\.(ups|pool)\.", k):
                    shape = (i, kk, o)  # MLX ConvTransposed (I, K, O)
                else:
                    shape = (o, kk, i)  # MLX Conv (O, K, I)
            flat[src] = np.zeros(shape, np.float32)
        return flat, init_fn

    def test_manifest_maps_exactly(self):
        from tpu_audio.models.kokoro import load as kload

        flat, init_fn = self._manifest()
        _validate(kload.convert(flat), init_fn, "kokoro")

    def test_corrupt_key_rejected(self):
        from tpu_audio.api.errors import ModelLoadError
        from tpu_audio.models.kokoro import load as kload

        flat, init_fn = self._manifest()
        flat["predictor.extra_head.weight"] = np.zeros((4, 4), np.float32)
        with pytest.raises(ModelLoadError, match="unexpected"):
            _validate(kload.convert(flat), init_fn, "kokoro-corrupt")


# ------------------------------------------------------------- cosyvoice3

class TestCosyVoice3Manifest:
    """CV3 flow remap lock: checkpoint naming follows upstream CosyVoice /
    the MLX port (decoder.estimator.transformer_blocks_N.*, ff.ff_0_0,
    attn.to_out_0, input_embed.conv_pos_embed.*, norm_out.linear —
    CosyVoice3TTS.swift:291-300) → tpu_audio tree naming."""

    def test_cv3_split_and_convert(self):
        from tests.test_loader_manifests import _llama_manifest

        from tpu_audio.models.cosyvoice2 import lm as lm_mod
        from tpu_audio.models.cosyvoice3 import dit as ditmod
        from tpu_audio.models.cosyvoice3 import load as cload
        from tpu_audio.models.cosyvoice3 import model as cv3
        from tpu_audio.codecs.s3gen import hift
        from tpu_audio.nn import transformer

        qwen = transformer.TransformerConfig(
            dim=48, n_layers=2, n_heads=4, n_kv_heads=2, hidden_dim=96,
            vocab_size=400, attn_qkv_bias=True, tie_word_embeddings=True)
        lm_cfg = lm_mod.CosyLMConfig(qwen=qwen, llm_input_size=48,
                                     speech_token_size=60)
        flat = {}
        for k, v in _llama_manifest(qwen).items():
            flat["llm.llm." + k] = v
        lm_fn = functools.partial(lm_mod.init_params, jax.random.PRNGKey(0),
                                  lm_cfg)
        for k, shape in _expected(lm_fn).items():
            if k.startswith("llm."):
                continue
            flat[k] = np.zeros(shape, np.float32)

        flow_cfg = cv3.CV3FlowConfig(
            vocab_size=64, input_dim=32, spk_dim=24, mel_dim=16,
            dit=ditmod.DiTConfig(mel_dim=16, dim=32, depth=2, heads=4,
                                 head_dim=8, mu_dim=32, spk_dim=16,
                                 conv_pos_groups=4),
            hift=hift.HiFTConfig(
                in_channels=16, base_channels=32, upsample_rates=(4, 3),
                upsample_kernels=(8, 7), source_resblock_kernels=(7, 11),
                source_resblock_dilations=((1, 3, 5), (1, 3, 5)),
                resblock_kernels=(3,), resblock_dilations=((1, 3, 5),)))
        flow_fn = functools.partial(cv3.init_params, jax.random.PRNGKey(1),
                                    flow_cfg)
        for k, shape in _expected(flow_fn).items():
            # inverse remaps (checkpoint layout)
            src = k
            if src.startswith("mel2wav."):
                prefix, src = "hift.", src[len("mel2wav."):]
            else:
                prefix = "flow."
                src = src.replace("decoder_estimator.",
                                  "decoder.estimator.")
                src = re.sub(r"blocks\.(\d+)\.", r"transformer_blocks_\1.",
                             src)
                src = src.replace(".attn.to_out.", ".attn.to_out_0.")
                src = src.replace(".ff.fc1.", ".ff.ff_0_0.")
                src = src.replace(".ff.fc2.", ".ff.ff_2.")
                src = src.replace(".input_embed.conv1.",
                                  ".input_embed.conv_pos_embed.conv1.")
                src = src.replace(".input_embed.conv2.",
                                  ".input_embed.conv_pos_embed.conv2.")
                src = src.replace("final_norm.linear.", "norm_out.linear.")
            if len(shape) == 3:
                shape = (_convT_to_torch(shape)
                         if _TRANSPOSED_RE.search(k)
                         else _conv_to_torch(shape))
            flat[prefix + src] = np.zeros(shape, np.float32)
        # runtime-computed keys the loader must DROP
        flat["flow.decoder.estimator.rotary_embed.inv_freq"] = \
            np.zeros((4,), np.float32)

        lm_params, flow_params = cload.convert(flat)
        _validate(lm_params, lm_fn, "cv3-lm")
        _validate(flow_params, flow_fn, "cv3-flow")
