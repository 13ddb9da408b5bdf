"""Fun-ASR: SenseVoice SANM encoder → adaptor → Qwen3 LLM transcription.

Reference: package/STT/FunASR/ — SenseVoiceEncoder (1 input + 49 main +
20 time-pooling SANM layers at 512, MultiHeadAttentionSANM.swift:16-116:
fused QKV + depthwise FSMN k11 residual on the value), AudioAdaptor
(k-frame stack → 2 linears → transformer blocks, AudioAdaptor.swift:20-119),
Qwen3ForCausalLM (Qwen3Model.swift:272), embedding merge that splices audio
features between <|startofspeech|><|endofspeech|> (FunASRModel.swift:71-141),
Qwen3 chat prompt (FunASRTokenizer.swift:113-155).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from tpu_audio.nn import attention, layers, transformer
from tpu_audio.ops import sampling
from tpu_audio.ops.decoding import decode_loop
from tpu_audio.ops.sampling import SamplerConfig

QWEN3_06B = transformer.TransformerConfig(
    dim=1024, n_layers=28, n_heads=16, n_kv_heads=8, head_dim=128,
    hidden_dim=3072, vocab_size=151936, rope_theta=1000000.0,
    qk_norm=True, norm_eps=1e-6, tie_word_embeddings=True)


@dataclass(frozen=True)
class SenseVoiceConfig:
    input_dim: int = 560  # 80 mels × LFR 7
    encoder_dim: int = 512
    num_heads: int = 4
    ffn_dim: int = 2048
    num_encoders0: int = 1
    num_encoders: int = 49
    num_tp_encoders: int = 20
    kernel_size: int = 11
    sanm_shift: int = 0


@dataclass(frozen=True)
class AdaptorConfig:
    encoder_dim: int = 512
    downsample_rate: int = 2
    ffn_dim: int = 2048
    llm_dim: int = 1024
    n_layer: int = 2
    attention_heads: int = 8


@dataclass(frozen=True)
class FunASRConfig:
    encoder: SenseVoiceConfig = field(default_factory=SenseVoiceConfig)
    adaptor: AdaptorConfig = field(default_factory=AdaptorConfig)
    llm: transformer.TransformerConfig = QWEN3_06B


# ------------------------------------------------------------------ SANM

def _sanm_layer_init(key, in_size, size, heads, ffn, kernel, dtype):
    ks = jax.random.split(key, 6)
    return {
        "norm1": layers.init_norm(in_size, dtype=dtype),
        "self_attn": {
            "linear_q_k_v": layers.init_linear(ks[0], in_size, size * 3,
                                               True, dtype),
            "linear_out": layers.init_linear(ks[1], size, size, True, dtype),
            "fsmn_block": layers.init_conv1d(ks[2], 1, size, kernel,
                                             bias=False, dtype=dtype),
        },
        "norm2": layers.init_norm(size, dtype=dtype),
        "feed_forward": {
            "w_1": layers.init_linear(ks[3], size, ffn, True, dtype),
            "w_2": layers.init_linear(ks[4], ffn, size, True, dtype),
        },
        # in_size != size → residual is skipped on the first layer
    }


def init_encoder(key, cfg: SenseVoiceConfig, dtype=jnp.float32) -> dict:
    n = cfg.num_encoders0 + cfg.num_encoders + cfg.num_tp_encoders
    ks = iter(jax.random.split(key, n + 2))
    p = {"encoders0": {}, "encoders": {}, "tp_encoders": {},
         "after_norm": layers.init_norm(cfg.encoder_dim, dtype=dtype),
         "tp_norm": layers.init_norm(cfg.encoder_dim, dtype=dtype)}
    for i in range(cfg.num_encoders0):
        p["encoders0"][str(i)] = _sanm_layer_init(
            next(ks), cfg.input_dim if i == 0 else cfg.encoder_dim,
            cfg.encoder_dim, cfg.num_heads, cfg.ffn_dim, cfg.kernel_size,
            dtype)
    for i in range(cfg.num_encoders):
        p["encoders"][str(i)] = _sanm_layer_init(
            next(ks), cfg.encoder_dim, cfg.encoder_dim, cfg.num_heads,
            cfg.ffn_dim, cfg.kernel_size, dtype)
    for i in range(cfg.num_tp_encoders):
        p["tp_encoders"][str(i)] = _sanm_layer_init(
            next(ks), cfg.encoder_dim, cfg.encoder_dim, cfg.num_heads,
            cfg.ffn_dim, cfg.kernel_size, dtype)
    return p


def _sanm_attention(p, x, cfg: SenseVoiceConfig, pad_mask, bias):
    b, t, _ = x.shape
    d = cfg.encoder_dim
    h = cfg.num_heads
    hd = d // h
    qkv = layers.linear(p["linear_q_k_v"], x)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    # FSMN memory on the raw value
    left = (cfg.kernel_size - 1) // 2 + cfg.sanm_shift
    right = cfg.kernel_size - 1 - left
    vm = v * pad_mask
    # depthwise FSMN memory as K shifted VPU FMAs (grouped lax.conv lowers
    # orders of magnitude off the roofline on TPU; VERDICT r4 #8)
    mem = layers.depthwise_conv1d_shifted(p["fsmn_block"], vm,
                                          padding=(left, right))
    mem = (mem + vm) * pad_mask
    o = attention.attend(q.reshape(b, t, h, hd), k.reshape(b, t, h, hd),
                         v.reshape(b, t, h, hd), bias)
    return layers.linear(p["linear_out"], o.reshape(b, t, d)) + mem


def _sanm_block(p, x, cfg, pad_mask, bias, residual: bool):
    hn = layers.layer_norm(p["norm1"], x)
    a = _sanm_attention(p["self_attn"], hn, cfg, pad_mask, bias)
    x = (x + a) if residual else a
    hn = layers.layer_norm(p["norm2"], x)
    ff = layers.linear(p["feed_forward"]["w_2"], jax.nn.relu(
        layers.linear(p["feed_forward"]["w_1"], hn)))
    return x + ff


def encode(params, cfg: SenseVoiceConfig, feats: jax.Array, lengths):
    """LFR+CMVN features (B, T, 560) → (B, T, 512)."""
    t = feats.shape[1]
    pad_mask = (jnp.arange(t) < lengths[:, None])[..., None].astype(feats.dtype)
    bias = jnp.where(jnp.arange(t)[None, :] < lengths[:, None], 0.0,
                     attention.NEG_INF)[:, None, None, :].astype(jnp.float32)
    x = feats * (cfg.encoder_dim ** 0.5)
    for i in range(cfg.num_encoders0):
        x = _sanm_block(params["encoders0"][str(i)], x, cfg, pad_mask, bias,
                        residual=i > 0)
    for i in range(cfg.num_encoders):
        x = _sanm_block(params["encoders"][str(i)], x, cfg, pad_mask, bias,
                        residual=True)
    x = layers.layer_norm(params["after_norm"], x)
    for i in range(cfg.num_tp_encoders):
        x = _sanm_block(params["tp_encoders"][str(i)], x, cfg, pad_mask,
                        bias, residual=True)
    return layers.layer_norm(params["tp_norm"], x)


# ------------------------------------------------------------------ adaptor

def init_adaptor(key, cfg: AdaptorConfig, dtype=jnp.float32) -> dict:
    ks = iter(jax.random.split(key, cfg.n_layer + 4))
    p = {
        "linear1": layers.init_linear(next(ks), cfg.encoder_dim
                                      * cfg.downsample_rate, cfg.ffn_dim,
                                      True, dtype),
        "linear2": layers.init_linear(next(ks), cfg.ffn_dim, cfg.llm_dim,
                                      True, dtype),
        "blocks": {},
    }
    for i in range(cfg.n_layer):
        kss = jax.random.split(next(ks), 6)
        p["blocks"][str(i)] = {
            "norm1": layers.init_norm(cfg.llm_dim, dtype=dtype),
            "attn": {
                "q": layers.init_linear(kss[0], cfg.llm_dim, cfg.llm_dim, True, dtype),
                "k": layers.init_linear(kss[1], cfg.llm_dim, cfg.llm_dim, True, dtype),
                "v": layers.init_linear(kss[2], cfg.llm_dim, cfg.llm_dim, True, dtype),
                "o": layers.init_linear(kss[3], cfg.llm_dim, cfg.llm_dim, True, dtype),
            },
            "norm2": layers.init_norm(cfg.llm_dim, dtype=dtype),
            "ff": {"w_1": layers.init_linear(kss[4], cfg.llm_dim,
                                             cfg.llm_dim // 4, True, dtype),
                   "w_2": layers.init_linear(kss[5], cfg.llm_dim // 4,
                                             cfg.llm_dim, True, dtype)},
        }
    return p


def adapt(params, cfg: AdaptorConfig, x: jax.Array, lengths):
    """(B, T, enc) → (B, T//k, llm_dim)."""
    b, t, d = x.shape
    k = cfg.downsample_rate
    t2 = t // k
    x = x[:, : t2 * k].reshape(b, t2, d * k)
    lengths2 = lengths // k
    x = layers.linear(params["linear2"],
                      jax.nn.relu(layers.linear(params["linear1"], x)))
    bias = jnp.where(jnp.arange(t2)[None, :] < lengths2[:, None], 0.0,
                     attention.NEG_INF)[:, None, None, :].astype(jnp.float32)
    h_ = cfg.attention_heads
    hd = cfg.llm_dim // h_
    for i in range(cfg.n_layer):
        bp = params["blocks"][str(i)]
        hn = layers.layer_norm(bp["norm1"], x)
        if "qkv" in bp["attn"]:  # fused leaf (ops/quant.fuse_int8_tree)
            qkv = layers.linear(bp["attn"]["qkv"], hn)
            q, kk, v = (a.reshape(b, t2, h_, hd)
                        for a in jnp.split(qkv, 3, axis=-1))
        else:
            q = layers.linear(bp["attn"]["q"], hn).reshape(b, t2, h_, hd)
            kk = layers.linear(bp["attn"]["k"], hn).reshape(b, t2, h_, hd)
            v = layers.linear(bp["attn"]["v"], hn).reshape(b, t2, h_, hd)
        o = attention.attend(q, kk, v, bias)
        x = x + layers.linear(bp["attn"]["o"], o.reshape(b, t2, cfg.llm_dim))
        hn = layers.layer_norm(bp["norm2"], x)
        x = x + layers.linear(bp["ff"]["w_2"], jax.nn.relu(
            layers.linear(bp["ff"]["w_1"], hn)))
    return x, lengths2


def init_params(key, cfg: FunASRConfig, dtype=jnp.float32) -> dict:
    ks = jax.random.split(key, 3)
    return {
        "encoder": init_encoder(ks[0], cfg.encoder, dtype),
        "adaptor": init_adaptor(ks[1], cfg.adaptor, dtype),
        "llm": transformer.init_params(ks[2], cfg.llm, dtype),
    }


# ------------------------------------------------------------------ generation

class FunASRGenerator:
    """Compiled prompt+audio merge and decode; audio length bucketed with
    the roll-packed layout. Yields tokens in chunks for streaming."""

    def __init__(self, params, cfg: FunASRConfig, max_cache: int = 4096):
        # fuse fp qkv/gateup leaves of the Qwen3 stack (bit-identical;
        # int8 trees arrive pre-fused) — the shape the whole-stack fused
        # decode kernel streams, and fewer dispatches per step either way
        self.params = dict(params,
                           llm=transformer.fuse_fp_tree(params["llm"]))
        self.cfg = cfg
        self.max_cache = max_cache
        self._fns = {}

    def _fn(self, pre_len: int, post_len: int, audio_pad: int, max_new: int,
            sampler: SamplerConfig, eos_ids: tuple):
        key_ = (pre_len, post_len, audio_pad, max_new, sampler, eos_ids)
        if key_ in self._fns:
            return self._fns[key_]
        cfg = self.cfg
        lcfg = cfg.llm
        # whole-stack fused decode kernel for the T=1 steps (TPU-gated;
        # the kernel handles Qwen3's per-head q/k norms in-kernel)
        fused = transformer.fused_decode_supported(
            lcfg, self.params["llm"], self.max_cache)

        def run(params, pre_ids, post_ids, feats, feat_len, key):
            audio = encode(params["encoder"], cfg.encoder, feats, feat_len)
            audio, a_len = adapt(params["adaptor"], cfg.adaptor, audio,
                                 feat_len)
            a_pad = audio.shape[1]

            pre = layers.embedding(params["llm"]["embed"], pre_ids[None])
            post = layers.embedding(params["llm"]["embed"], post_ids[None])
            total = pre_len + a_pad + post_len
            x = jnp.zeros((1, total, lcfg.dim), pre.dtype)
            x = jax.lax.dynamic_update_slice(x, pre, (0, 0, 0))
            x = jax.lax.dynamic_update_slice(x, audio.astype(x.dtype),
                                             (0, pre_len, 0))
            x = jax.lax.dynamic_update_slice(x, post,
                                             (0, pre_len + a_len[0], 0))
            n_real = pre_len + a_len[0] + post_len
            shift = total - n_real
            x = jnp.roll(x, shift, axis=1)

            cache, extra = transformer.decode_cache_and_mask(
                lcfg, self.max_cache, shift, fused)
            hidden, cache = transformer.forward_hidden(params["llm"], lcfg, x,
                                                       cache, extra)
            first_logits = transformer.logits(
                params["llm"], lcfg, hidden[:, -1:])[:, 0].astype(jnp.float32)

            def step(tok, cache):
                lg, cache = transformer.forward(params["llm"], lcfg, tok,
                                                cache, extra_mask=extra)
                return lg[:, -1].astype(jnp.float32), cache

            k1, k2 = jax.random.split(key)
            first = sampling.sample(k1, first_logits, sampler,
                                    jnp.full((1, 64), -1, jnp.int32)
                                    ).astype(jnp.int32)
            res = decode_loop(k2, step, cache, first, max_new - 1,
                              eos_ids=eos_ids, sampler=sampler,
                              pad_id=int(eos_ids[0]))
            return first, res.tokens, res.lengths

        fn = jax.jit(run)
        self._fns[key_] = fn
        return fn

    def generate(self, pre_ids: list[int], post_ids: list[int],
                 feats: np.ndarray, *, eos_ids: tuple, max_new: int = 256,
                 sampler: SamplerConfig = SamplerConfig(temperature=0.0),
                 seed: int = 0) -> list[int]:
        t = feats.shape[0]
        k = self.cfg.adaptor.downsample_rate
        t_pad = max(32, -(-t // 32) * 32)
        f = np.zeros((1, t_pad, feats.shape[1]), np.float32)
        f[0, :t] = feats
        fn = self._fn(len(pre_ids), len(post_ids), t_pad, max_new, sampler,
                      tuple(eos_ids))
        first, tokens, lengths = fn(
            self.params, jnp.asarray(pre_ids, jnp.int32),
            jnp.asarray(post_ids, jnp.int32), jnp.asarray(f),
            jnp.asarray([t]), jax.random.PRNGKey(seed))
        out = [int(first[0])] + [int(x) for x in
                                 np.asarray(tokens[0][: int(lengths[0])])]
        return [x for x in out if x not in eos_ids]
