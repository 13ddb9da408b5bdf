"""Decoder-only transformer family (Llama / Qwen2 / Qwen3 / GPT-2) as one
configurable stack, built for XLA:

  - layers run under lax.scan over stacked params (compile time independent
    of depth), with the whole-stack KV cache carried and updated in place;
  - prefill and decode are the same function at different static T;
  - GQA, Llama-3-scaled RoPE, Qwen3 q/k-norm, GPT-2 learned positions.

This one module backs the LLM cores of Orpheus (Llama-3B), OuteTTS
(Llama-1B), Marvis (Llama backbone + depth decoder), Chatterbox T3 (Llama),
Chatterbox Turbo (GPT-2 medium), CosyVoice2/3 (Qwen2-0.5B) and FunASR
(Qwen3) — the reference implements each of these separately
(e.g. package/TTS/Orpheus/BuildingBlocks/TransformerBlock.swift:145-244,
package/STT/FunASR/Layers/Qwen3Model.swift:272).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from tpu_audio.nn import attention, layers, rope
from tpu_audio.ops.kvcache import FusedKVCache, KVCache, QuantizedKVCache


@dataclass(frozen=True)
class TransformerConfig:
    dim: int
    n_layers: int
    n_heads: int
    n_kv_heads: int | None = None
    head_dim: int | None = None
    hidden_dim: int = 0  # MLP inner dim
    vocab_size: int = 0
    rope_theta: float = 10000.0
    rope_scaling: dict | None = None
    norm_eps: float = 1e-5
    attn_qkv_bias: bool = False  # Qwen2
    attn_o_bias: bool = False
    qk_norm: bool = False  # Qwen3
    mlp: str = "swiglu"  # or "gelu" (erf) / "gelu_new" (GPT-2 tanh approx)
    norm: str = "rms"  # or "ln"
    pos_emb: str = "rope"  # "rope" | "learned" | "none"
    max_position_embeddings: int = 8192
    tie_word_embeddings: bool = False
    # lax.scan unroll factor for the layer loop: >1 trades compile time /
    # VMEM for fewer per-layer indexing ops — worthwhile only for tiny
    # stacks in latency-bound loops (the Marvis depth decoder); 28-layer
    # whole-graph unrolling measurably HURTS (Mosaic scoped-vmem pressure)
    scan_unroll: int = 1

    @property
    def kv_heads(self) -> int:
        return self.n_kv_heads or self.n_heads

    @property
    def hd(self) -> int:
        return self.head_dim or self.dim // self.n_heads

    def inv_freq(self):
        return rope.make_inv_freq(self.hd, self.rope_theta, self.rope_scaling)


_STACKED_KEYS = ("weight_i8", "weight_q4p", "weight_q4s")


def _split_stacked_quant(layers_tree: dict):
    """Pull the big stacked quantized weight arrays out of the scan tree.

    XLA materializes a full HBM copy of every lax.scan-sliced operand that
    feeds a Pallas custom call, so scanning over stacked int8/int4 weights
    triples weight traffic on the decode hot path. The big arrays are
    instead closed over whole and indexed inside the kernels via scalar
    prefetch (int8_matmul_stacked / w4a8_matmul_stacked); the small
    scales/biases stay scanned. Returns (scan_tree, {path: array})."""
    stacked = {}

    def rec(d, path):
        out = {}
        for k, v in d.items():
            if isinstance(v, dict):
                hit = [b for b in _STACKED_KEYS if b in v]
                if hit:
                    keep = dict(v)
                    for b in hit:
                        stacked[path + (k, b)] = keep.pop(b)
                    out[k] = keep
                else:
                    out[k] = rec(v, path + (k,))
            else:
                out[k] = v
        return out

    return rec(layers_tree, ()), stacked


def _reinject_stacked(lp: dict, stacked: dict, li) -> dict:
    """Rebuild the per-layer tree: sliced small leaves + whole stacked
    weights tagged with the layer index for the prefetch kernels."""
    for path, arr in stacked.items():
        d = lp
        for k in path[:-1]:
            d = d[k]
        d[path[-1] + "_stacked"] = arr
        d["layer_idx"] = li
    return lp


def _norm(cfg: TransformerConfig, p, x):
    if cfg.norm == "rms":
        return layers.rms_norm(p, x, cfg.norm_eps)
    return layers.layer_norm(p, x, cfg.norm_eps)


def _mlp(cfg: TransformerConfig, p, x):
    if cfg.mlp == "swiglu":
        if "gateup" in p:  # fused int8 leaf (ops/quant.fuse_int8_tree)
            gu = layers.linear(p["gateup"], x)
            gate, up = jnp.split(gu, 2, axis=-1)
            return layers.linear(p["down"], layers.silu(gate) * up)
        return layers.linear(
            p["down"], layers.silu(layers.linear(p["gate"], x)) * layers.linear(p["up"], x)
        )
    act = layers.gelu_new if cfg.mlp == "gelu_new" else layers.gelu
    return layers.linear(p["fc2"], act(layers.linear(p["fc1"], x)))


def _qkv(cfg: TransformerConfig, attn_p, hn, b, t):
    """Project hidden → (q, k, v) heads, via the fused qkv leaf if present."""
    h_, kvh, hd = cfg.n_heads, cfg.kv_heads, cfg.hd
    if "qkv" in attn_p:
        qkv = layers.linear(attn_p["qkv"], hn)
        q, k, v = jnp.split(qkv, [h_ * hd, (h_ + kvh) * hd], axis=-1)
    else:
        q = layers.linear(attn_p["q"], hn)
        k = layers.linear(attn_p["k"], hn)
        v = layers.linear(attn_p["v"], hn)
    return (q.reshape(b, t, h_, hd), k.reshape(b, t, kvh, hd),
            v.reshape(b, t, kvh, hd))


def init_layer(key, cfg: TransformerConfig, dtype=jnp.float32) -> dict:
    ks = jax.random.split(key, 8)
    h, kvh, hd = cfg.n_heads, cfg.kv_heads, cfg.hd
    attn = {
        "q": layers.init_linear(ks[0], cfg.dim, h * hd, cfg.attn_qkv_bias, dtype),
        "k": layers.init_linear(ks[1], cfg.dim, kvh * hd, cfg.attn_qkv_bias, dtype),
        "v": layers.init_linear(ks[2], cfg.dim, kvh * hd, cfg.attn_qkv_bias, dtype),
        "o": layers.init_linear(ks[3], h * hd, cfg.dim, cfg.attn_o_bias, dtype),
    }
    if cfg.qk_norm:
        attn["q_norm"] = layers.init_norm(hd, bias=False, dtype=dtype)
        attn["k_norm"] = layers.init_norm(hd, bias=False, dtype=dtype)
    if cfg.mlp == "swiglu":
        mlp = {
            "gate": layers.init_linear(ks[4], cfg.dim, cfg.hidden_dim, False, dtype),
            "up": layers.init_linear(ks[5], cfg.dim, cfg.hidden_dim, False, dtype),
            "down": layers.init_linear(ks[6], cfg.hidden_dim, cfg.dim, False, dtype),
        }
    else:
        mlp = {
            "fc1": layers.init_linear(ks[4], cfg.dim, cfg.hidden_dim, True, dtype),
            "fc2": layers.init_linear(ks[5], cfg.hidden_dim, cfg.dim, True, dtype),
        }
    use_bias = cfg.norm == "ln"
    return {
        "attn": attn,
        "mlp": mlp,
        "ln1": layers.init_norm(cfg.dim, use_bias, dtype),
        "ln2": layers.init_norm(cfg.dim, use_bias, dtype),
    }


def fuse_fp_tree(params: dict) -> dict:
    """Fuse fp q/k/v → qkv and gate/up → gateup leaves (output-channel
    concat; bit-identical results since the stack splits after the fused
    matmul — _qkv/_mlp detect the fused keys). Fewer, larger GEMM
    dispatches per decode step: built for latency-bound tiny-model loops
    like the Marvis depth decoder (31 sequential 4-layer steps/frame)."""

    def fuse(tree):
        if not isinstance(tree, dict):
            return tree
        out = {}
        for k, v in tree.items():
            if (k == "attn" and all(
                    n in v and isinstance(v[n], dict) and "weight" in v[n]
                    for n in ("q", "k", "v"))):
                nv = {kk: vv for kk, vv in v.items()
                      if kk not in ("q", "k", "v")}
                leaf = {"weight": jnp.concatenate(
                    [v[n]["weight"] for n in ("q", "k", "v")], axis=-2)}
                if all("bias" in v[n] for n in ("q", "k", "v")):
                    leaf["bias"] = jnp.concatenate(
                        [v[n]["bias"] for n in ("q", "k", "v")], axis=-1)
                nv["qkv"] = leaf
                out[k] = nv
            elif (k == "mlp" and all(
                    n in v and isinstance(v[n], dict) and "weight" in v[n]
                    for n in ("gate", "up"))):
                nv = {kk: vv for kk, vv in v.items()
                      if kk not in ("gate", "up")}
                nv["gateup"] = {"weight": jnp.concatenate(
                    [v["gate"]["weight"], v["up"]["weight"]], axis=-2)}
                out[k] = nv
            elif isinstance(v, dict):
                out[k] = fuse(v)
            else:
                out[k] = v
        return out

    return fuse(params)


def init_params(key, cfg: TransformerConfig, dtype=jnp.float32) -> dict:
    from tpu_audio.utils import pytree

    keys = jax.random.split(key, cfg.n_layers + 3)
    p = {
        "layers": pytree.stack_layers(
            [init_layer(keys[i + 1], cfg, dtype) for i in range(cfg.n_layers)]
        ),
        "norm": layers.init_norm(cfg.dim, cfg.norm == "ln", dtype),
    }
    if cfg.vocab_size:
        p["embed"] = layers.init_embedding(keys[0], cfg.vocab_size, cfg.dim, dtype)
    if cfg.pos_emb == "learned":
        p["pos_embed"] = layers.init_embedding(
            keys[-2], cfg.max_position_embeddings, cfg.dim, dtype
        )
    if not cfg.tie_word_embeddings and cfg.vocab_size:
        p["lm_head"] = layers.init_linear(keys[-1], cfg.dim, cfg.vocab_size, False, dtype)
    return p


def make_cache(cfg: TransformerConfig, batch: int, max_len: int,
               dtype=jnp.bfloat16, quantized: bool = False) -> KVCache:
    if quantized:
        return QuantizedKVCache.create(cfg.n_layers, batch, max_len,
                                       cfg.kv_heads, cfg.hd)
    return KVCache.create(cfg.n_layers, batch, max_len, cfg.kv_heads, cfg.hd, dtype)


def forward_hidden(params: dict, cfg: TransformerConfig, x: jax.Array,
                   cache: KVCache, extra_mask: jax.Array | None = None,
                   axis_name: str | None = None,
                   pos_offset: jax.Array | None = None
                   ) -> tuple[jax.Array, KVCache]:
    """Run the stack on embedded inputs x (B, T, D) writing into `cache` at
    cache.pos. Returns (hidden (B, T, D), advanced cache).

    extra_mask: optional additive (B, 1, T, S_max) bias composed onto the
    causal decode mask (e.g. CFG-pair or prompt-padding masks).

    pos_offset: optional (B,) per-row offset subtracted from the POSITION
    values fed to RoPE / learned embeddings (cache slots are unaffected).
    Left-pad bucketing and rolling admission place a row's first real
    token at an arbitrary cache slot; with pos_offset = that slot, every
    row sees canonical positions 0,1,2,... — making differently-padded
    runs of the same prompt BIT-exact rather than exact-up-to-float-
    rounding (RoPE depends only on position differences mathematically,
    but cos/sin of shifted positions round differently, which can flip
    near-tied argmaxes). Required for correctness with learned positions.

    axis_name: set when running INSIDE shard_map with megatron-sharded
    params (parallel/tp_quant.py): cfg must then be the per-shard local
    config (n_heads/kv_heads divided by tp), and the row-parallel o/down
    projections psum their partial outputs over the axis before the
    residual adds. Row-parallel biases are unsupported here (they would be
    multiplied by tp) — tp_quant validates that at setup.
    """
    if isinstance(cache, FusedKVCache):
        return _forward_fused(params, cfg, x, cache, extra_mask,
                              axis_name, pos_offset)
    b, t, _ = x.shape
    s_max = cache.max_len
    pos = cache.pos
    positions = pos + jnp.arange(t)
    mask = attention.decode_mask(s_max, pos, t)
    if extra_mask is not None:
        mask = mask + extra_mask
    if pos_offset is None:
        rope_pos = positions
    else:  # pad slots would go negative; they are key-masked, clamp to 0
        rope_pos = jnp.maximum(positions[None, :] - pos_offset[:, None], 0)
    if cfg.pos_emb == "learned":
        pe = layers.embedding(params["pos_embed"], rope_pos)
        x = x + (pe if pe.ndim == 3 else pe[None])
    inv_freq = cfg.inv_freq() if cfg.pos_emb == "rope" else None

    h_, kvh, hd = cfg.n_heads, cfg.kv_heads, cfg.hd
    quant = isinstance(cache, QuantizedKVCache)

    scan_layers, stacked = _split_stacked_quant(params["layers"])

    def body(carry, xs):
        if quant:
            x, kq, vq, ks, vs = carry
        else:
            x, kbuf, vbuf = carry
        lp, li = xs
        lp = _reinject_stacked(lp, stacked, li)
        hn = _norm(cfg, lp["ln1"], x)
        q, k, v = _qkv(cfg, lp["attn"], hn, b, t)
        if cfg.qk_norm:
            q = layers.rms_norm(lp["attn"]["q_norm"], q, cfg.norm_eps)
            k = layers.rms_norm(lp["attn"]["k_norm"], k, cfg.norm_eps)
        if inv_freq is not None:
            q = rope.apply_rope(q, rope_pos, inv_freq)
            k = rope.apply_rope(k, rope_pos, inv_freq)
        at = (li, 0, pos, 0, 0)
        if quant:
            nkq, nks = QuantizedKVCache._quantize(k)
            nvq, nvs = QuantizedKVCache._quantize(v)
            kq = jax.lax.dynamic_update_slice(kq, nkq[None], at)
            vq = jax.lax.dynamic_update_slice(vq, nvq[None], at)
            ks = jax.lax.dynamic_update_slice(ks, nks[None], at)
            vs = jax.lax.dynamic_update_slice(vs, nvs[None], at)

            def deq(qb, sb):
                ql = jax.lax.dynamic_index_in_dim(qb, li, 0, keepdims=False)
                sl = jax.lax.dynamic_index_in_dim(sb, li, 0, keepdims=False)
                return (ql.astype(jnp.float32) * sl).astype(q.dtype)

            kl, vl = deq(kq, ks), deq(vq, vs)
        else:
            kbuf = jax.lax.dynamic_update_slice(
                kbuf, k[None].astype(kbuf.dtype), at)
            vbuf = jax.lax.dynamic_update_slice(
                vbuf, v[None].astype(vbuf.dtype), at)
            kl = jax.lax.dynamic_index_in_dim(
                kbuf, li, 0, keepdims=False).astype(q.dtype)
            vl = jax.lax.dynamic_index_in_dim(
                vbuf, li, 0, keepdims=False).astype(q.dtype)
        o = attention.attend(q, kl, vl, mask)
        o_proj = layers.linear(lp["attn"]["o"], o.reshape(b, t, h_ * hd))
        if axis_name is not None:  # row-parallel partial sum (megatron)
            o_proj = jax.lax.psum(o_proj, axis_name)
        x = x + o_proj
        mlp_out = _mlp(cfg, lp["mlp"], _norm(cfg, lp["ln2"], x))
        if axis_name is not None:
            mlp_out = jax.lax.psum(mlp_out, axis_name)
        x = x + mlp_out
        if quant:
            return (x, kq, vq, ks, vs), None
        return (x, kbuf, vbuf), None

    xs = (scan_layers, jnp.arange(cfg.n_layers))
    unroll = min(cfg.scan_unroll, cfg.n_layers)
    if quant:
        (x, kq, vq, ks, vs), _ = jax.lax.scan(
            body, (x, cache.k_q, cache.v_q, cache.k_s, cache.v_s), xs,
            unroll=unroll)
        x = _norm(cfg, params["norm"], x)
        return x, QuantizedKVCache(k_q=kq, v_q=vq, k_s=ks, v_s=vs,
                                   pos=pos + t)
    (x, kbuf, vbuf), _ = jax.lax.scan(body, (x, cache.k, cache.v), xs,
                                      unroll=unroll)
    x = _norm(cfg, params["norm"], x)
    return x, KVCache(k=kbuf, v=vbuf, pos=pos + t)


def _forward_fused(params: dict, cfg: TransformerConfig, x: jax.Array,
                   cache: FusedKVCache, extra_mask, axis_name, pos_offset):
    """forward_hidden over a FusedKVCache (single stream, kernel layout).

    T == 1 steps run the ENTIRE layer stack as one Pallas launch
    (ops/pallas/fused_step.py) — the decode hot path for latency-bound
    small models. Prefill (T > 1, or steps carrying an explicit
    extra_mask) runs the regular XLA scan through a layout view; the
    cache's `start` slot bound replaces the additive left-pad mask."""
    from tpu_audio.ops.pallas import fused_step as fs

    if axis_name is not None:
        raise ValueError("FusedKVCache does not support shard_map TP")
    b, t, _ = x.shape
    if b != 1:
        raise ValueError("FusedKVCache is single-stream (B=1)")

    mode = fs.choose_mode(cfg, params, max_len=cache.max_len,
                          cache_dtype=cache.k.dtype)
    if t <= 4 and extra_mask is None and mode is not None:
        # run t sequential whole-stack launches (t is 1 on the decode hot
        # path; tiny t>1 steps — e.g. the speculative draft's 2-token
        # re-deposit — stay in kernel layout instead of paying the
        # full-cache transpose of the prefill fallback below). When the
        # REAL cache shape/dtype fails the gate (mode None) — e.g. a
        # caller that gated at a different length — the XLA fallback
        # below serves the step instead of launching an unprobed kernel.
        stack = fs.prepare_stack(params, cfg)  # copy-free views
        kc, vc = cache.k, cache.v
        hs = []
        for i in range(t):
            pos_i = cache.pos + i
            rope_pos = pos_i
            if pos_offset is not None:
                rope_pos = jnp.maximum(rope_pos - pos_offset.reshape(()), 0)
            cos, sin = fs.make_cos_sin(rope_pos, cfg.inv_freq(), cfg.hd)
            h, kc, vc = fs.fused_decode_step(
                x[:, i], pos_i, cos, sin, stack, kc, vc,
                start=cache.start, n_heads=cfg.n_heads,
                n_kv_heads=cfg.kv_heads, hd=cfg.hd, eps=cfg.norm_eps)
            hs.append(h)
        h = jnp.stack(hs, axis=1) if t > 1 else hs[0][:, None]
        return (h.astype(x.dtype),
                FusedKVCache(k=kc, v=vc, pos=cache.pos + t,
                             start=cache.start))

    inner = KVCache(k=jnp.moveaxis(cache.k, 1, 2)[:, None],
                    v=jnp.moveaxis(cache.v, 1, 2)[:, None], pos=cache.pos)
    if extra_mask is None:
        slot = jnp.arange(cache.max_len)
        extra_mask = jnp.where(slot < cache.start, -1e30,
                               0.0)[None, None, None, :]
    h, inner = forward_hidden(params, cfg, x, inner, extra_mask,
                              pos_offset=pos_offset)
    return h, FusedKVCache(k=jnp.moveaxis(inner.k[:, 0], 2, 1),
                           v=jnp.moveaxis(inner.v[:, 0], 2, 1),
                           pos=inner.pos, start=cache.start)


def make_fused_cache(cfg: TransformerConfig, max_len: int,
                     dtype=jnp.bfloat16, start=0) -> FusedKVCache:
    return FusedKVCache.create(cfg.n_layers, max_len, cfg.kv_heads, cfg.hd,
                               dtype, start)


def decode_cache_and_mask(cfg: TransformerConfig, max_len: int, start,
                          fused: bool, dtype=jnp.bfloat16):
    """The decode loops' left-padded cache setup, in both serving modes:
    fused → (FusedKVCache carrying `start`, None); plain → (KVCache,
    additive mask hiding key slots < start). `start` may be traced."""
    if fused:
        return make_fused_cache(cfg, max_len, dtype, start=start), None
    cache = make_cache(cfg, 1, max_len, dtype)
    slot = jnp.arange(max_len)
    extra = jnp.where(slot < start, -1e30, 0.0)[None, None, None, :]
    return cache, extra


def fused_decode_supported(cfg: TransformerConfig, params: dict,
                           max_len: int = 512,
                           cache_dtype=jnp.bfloat16) -> bool:
    """Whether the whole-stack fused decode kernel can serve this stack
    single-stream (TPU backend, fused leaves, size/shape constraints, and
    a memoized compile-and-run probe at the REAL shapes — pass the cache
    length and dtype the decode loop will actually use)."""
    import os

    from tpu_audio.ops.pallas import fused_step as fs

    if os.environ.get("TPU_AUDIO_FUSED_DECODE", "1") == "0":
        return False
    return (fs.supported(cfg, params, 1, max_len, cache_dtype)
            and fs.probe_compile(cfg, params, max_len, cache_dtype))


def forward(params: dict, cfg: TransformerConfig, tokens: jax.Array,
            cache: KVCache, extra_mask: jax.Array | None = None,
            axis_name: str | None = None,
            pos_offset: jax.Array | None = None) -> tuple[jax.Array, KVCache]:
    """Token ids (B, T) → (logits (B, T, V), advanced cache)."""
    x = layers.embedding(params["embed"], tokens)
    h, cache = forward_hidden(params, cfg, x, cache, extra_mask,
                              axis_name=axis_name, pos_offset=pos_offset)
    return logits(params, cfg, h), cache


def logits(params: dict, cfg: TransformerConfig, hidden: jax.Array) -> jax.Array:
    if cfg.tie_word_embeddings or "lm_head" not in params:
        return layers.embedding_as_linear(params["embed"], hidden)
    return layers.linear(params["lm_head"], hidden)


def encode(params: dict, cfg: TransformerConfig, x: jax.Array,
           mask: jax.Array | None = None) -> jax.Array:
    """Bidirectional (encoder) pass without cache: x (B, T, D) → (B, T, D).

    Shares the same stacked-layer params; used for conformer-less encoder
    stacks (e.g. the FunASR audio adaptor's transformer blocks).
    """
    b, t, _ = x.shape
    h_, kvh, hd = cfg.n_heads, cfg.kv_heads, cfg.hd
    positions = jnp.arange(t)
    inv_freq = cfg.inv_freq() if cfg.pos_emb == "rope" else None
    if cfg.pos_emb == "learned":
        x = x + layers.embedding(params["pos_embed"], positions)[None]

    def body(x, lp):
        hn = _norm(cfg, lp["ln1"], x)
        q, k, v = _qkv(cfg, lp["attn"], hn, b, t)
        if cfg.qk_norm:
            q = layers.rms_norm(lp["attn"]["q_norm"], q, cfg.norm_eps)
            k = layers.rms_norm(lp["attn"]["k_norm"], k, cfg.norm_eps)
        if inv_freq is not None:
            q = rope.apply_rope(q, positions, inv_freq)
            k = rope.apply_rope(k, positions, inv_freq)
        o = attention.attend(q, k, v, mask)
        x = x + layers.linear(lp["attn"]["o"], o.reshape(b, t, h_ * hd))
        x = x + _mlp(cfg, lp["mlp"], _norm(cfg, lp["ln2"], x))
        return x, None

    x, _ = jax.lax.scan(body, x, params["layers"])
    return _norm(cfg, params["norm"], x)
