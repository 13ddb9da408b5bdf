"""Whisper encoder/decoder as pure functions over param trees.

Architecture (reference: package/STT/Whisper/Layers/AudioEncoder.swift:16-96,
TextDecoder.swift:17-97, MultiHeadAttention.swift:85-135):
  encoder: conv1(k3,s1,p1)+gelu → conv2(k3,s2,p1)+gelu → +sinusoids →
           pre-norm blocks → ln_post
  decoder: tok_emb + learned pos_emb → blocks [self-attn(KV cache),
           cross-attn(precomputed enc K/V), mlp] → ln → logits = h @ E.T
  attention scale (d/h)^-0.25 applied to BOTH q and k before the product.

TPU decisions: decoder layers run under lax.scan with the self-attn cache
carried in place (see nn/transformer.py); cross K/V are computed once per
segment, stacked (L, ...), and reused every decode step; cross-attention
softmax weights (for DTW word timing) are captured by a separate
forward_cross_qk entry point so the hot decode path never materializes them.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from tpu_audio.models.whisper.config import WhisperConfig
from tpu_audio.nn import attention, layers
from tpu_audio.ops.kvcache import KVCache
from tpu_audio.utils import pytree


# ------------------------------------------------------------------ init

def _init_attn(key, dim, bias=True, dtype=jnp.float32):
    ks = jax.random.split(key, 4)
    return {
        "q": layers.init_linear(ks[0], dim, dim, True, dtype),
        "k": layers.init_linear(ks[1], dim, dim, False, dtype),
        "v": layers.init_linear(ks[2], dim, dim, True, dtype),
        "o": layers.init_linear(ks[3], dim, dim, True, dtype),
    }


def _init_block(key, dim, cross: bool, dtype=jnp.float32):
    ks = jax.random.split(key, 6)
    p = {
        "attn": _init_attn(ks[0], dim, dtype=dtype),
        "ln1": layers.init_norm(dim, dtype=dtype),
        "mlp": {
            "fc1": layers.init_linear(ks[1], dim, dim * 4, True, dtype),
            "fc2": layers.init_linear(ks[2], dim * 4, dim, True, dtype),
        },
        "ln2": layers.init_norm(dim, dtype=dtype),
    }
    if cross:
        p["cross_attn"] = _init_attn(ks[3], dim, dtype=dtype)
        p["ln_cross"] = layers.init_norm(dim, dtype=dtype)
    return p


def init_params(key, cfg: WhisperConfig, dtype=jnp.float32) -> dict:
    ks = jax.random.split(key, cfg.n_audio_layer + cfg.n_text_layer + 5)
    enc_blocks = [_init_block(ks[i], cfg.n_audio_state, False, dtype)
                  for i in range(cfg.n_audio_layer)]
    dec_blocks = [_init_block(ks[cfg.n_audio_layer + i], cfg.n_text_state, True, dtype)
                  for i in range(cfg.n_text_layer)]
    return {
        "encoder": {
            "conv1": layers.init_conv1d(ks[-5], cfg.n_mels, cfg.n_audio_state, 3, dtype=dtype),
            "conv2": layers.init_conv1d(ks[-4], cfg.n_audio_state, cfg.n_audio_state, 3, dtype=dtype),
            "blocks": pytree.stack_layers(enc_blocks),
            "ln_post": layers.init_norm(cfg.n_audio_state, dtype=dtype),
        },
        "decoder": {
            "token_embedding": layers.init_embedding(ks[-3], cfg.n_vocab, cfg.n_text_state, dtype),
            "positional_embedding": jax.random.normal(
                ks[-2], (cfg.n_text_ctx, cfg.n_text_state), dtype) * 0.02,
            "blocks": pytree.stack_layers(dec_blocks),
            "ln": layers.init_norm(cfg.n_text_state, dtype=dtype),
        },
    }


# ------------------------------------------------------------------ attention

def _heads(x, n_heads):
    b, t, d = x.shape
    return x.reshape(b, t, n_heads, d // n_heads)


# pair-packed encoder attention (2·hd = 128 lanes per block). Module-level
# so benchmarks can A/B it against the plain head-major kernel on chip
# (TPU_AUDIO_PACKED_ATTN=0 disables).
PACKED_ATTN = os.environ.get("TPU_AUDIO_PACKED_ATTN", "1") != "0"


def _self_attention(p, x, n_heads, mask=None):
    d = x.shape[-1]
    hd = d // n_heads
    scale = hd ** -0.25
    if mask is None and "weight" in p["q"]:
        # head-major fast path: einsum the projections straight into the
        # (B·H, T, hd) layout the fused encoder-attention kernel consumes
        # (pre_bh) — the explicit (B,T,H,d)↔(B,H,T,d) transposes around the
        # custom call cost ~23 ms of the batch-16 encoder (enc_profile
        # "block stack (head-major qkv)" vs the plain block stack)
        try:
            from tpu_audio.ops.pallas import encoder_attention as ea

            b, t, _ = x.shape
            if ea.supported(jnp.empty((b, t, n_heads, hd), x.dtype),
                            jnp.empty((b, t, n_heads, hd), x.dtype), mask):
                if (PACKED_ATTN and n_heads % 2 == 0 and 2 * hd == 128
                        and ea.packed_probe(hd, x.dtype)):
                    # pair-packed: head pairs channel-concatenated to 128
                    # lanes — the packed kernel's dots contract/emit full
                    # MXU tiles (the hd=64 dots run at half efficiency)
                    g = n_heads // 2
                    wq = p["q"]["weight"].reshape(g, 2, hd, d).astype(x.dtype)
                    wk = p["k"]["weight"].reshape(g, 2, hd, d).astype(x.dtype)
                    wv = p["v"]["weight"].reshape(g, 2, hd, d).astype(x.dtype)
                    bq_ = p["q"]["bias"].reshape(g, 1, 2, hd).astype(x.dtype)
                    bv_ = p["v"]["bias"].reshape(g, 1, 2, hd).astype(x.dtype)
                    q = (jnp.einsum("btd,gxed->bgtxe", x, wq)
                         + bq_[None]).reshape(b * g, t, 2 * hd)
                    k = jnp.einsum("btd,gxed->bgtxe", x, wk).reshape(
                        b * g, t, 2 * hd)
                    v = (jnp.einsum("btd,gxed->bgtxe", x, wv)
                         + bv_[None]).reshape(b * g, t, 2 * hd)
                    o = ea.encoder_attention_packed(q * scale, k * scale, v,
                                                    scale=1.0)
                    wo = p["o"]["weight"].reshape(d, g, 2, hd).astype(x.dtype)
                    return (jnp.einsum("bgtxe,dgxe->btd",
                                       o.reshape(b, g, t, 2, hd), wo)
                            + p["o"]["bias"].astype(x.dtype))
                wq = p["q"]["weight"].reshape(n_heads, hd, d).astype(x.dtype)
                wk = p["k"]["weight"].reshape(n_heads, hd, d).astype(x.dtype)
                wv = p["v"]["weight"].reshape(n_heads, hd, d).astype(x.dtype)
                q = (jnp.einsum("btd,hed->bhte", x, wq)
                     + p["q"]["bias"].reshape(n_heads, 1, hd).astype(x.dtype)
                     ).reshape(b * n_heads, t, hd)
                k = jnp.einsum("btd,hed->bhte", x, wk).reshape(
                    b * n_heads, t, hd)
                v = (jnp.einsum("btd,hed->bhte", x, wv)
                     + p["v"]["bias"].reshape(n_heads, 1, hd).astype(x.dtype)
                     ).reshape(b * n_heads, t, hd)
                o = ea.encoder_attention(q * scale, k * scale, v,
                                         pre_bh=True, scale=1.0)
                wo = p["o"]["weight"].reshape(d, n_heads, hd).astype(x.dtype)
                return (jnp.einsum("bhte,dhe->btd",
                                   o.reshape(b, n_heads, t, hd), wo)
                        + p["o"]["bias"].astype(x.dtype))
        except Exception as exc:
            from tpu_audio.ops.quant import _warn_kernel_fallback

            _warn_kernel_fallback(exc)
    q = _heads(layers.linear(p["q"], x), n_heads) * scale
    k = _heads(layers.linear(p["k"], x), n_heads) * scale
    v = _heads(layers.linear(p["v"], x), n_heads)
    o = attention.attend(q, k, v, mask, q_scaled=True)
    return layers.linear(p["o"], o.reshape(x.shape))


# ------------------------------------------------------------------ encoder

# whole-block fused encoder phases (LN+QKV, attn+o-proj+LN in two Pallas
# launches per block; ops/pallas/fused_encoder.py). Env-gated for on-chip
# A/B: TPU_AUDIO_FUSED_ENC=0 restores the per-op path.
FUSED_ENC = os.environ.get("TPU_AUDIO_FUSED_ENC", "1") != "0"


def _encode_blocks_fused(blocks, x, n_heads: int):
    from tpu_audio.ops.pallas import fused_encoder as fe

    t = x.shape[1]

    def body(x, bp):
        q, k, v = fe.ln_qkv_packed(x, bp["ln1"], bp["attn"], n_heads)
        y, hn = fe.attn_oproj_ln(q, k, v, x, bp["attn"]["o"], bp["ln2"],
                                 t_valid=t)
        x = y + layers.linear(bp["mlp"]["fc2"],
                              layers.gelu(layers.linear(bp["mlp"]["fc1"],
                                                        hn)))
        return x, None

    return jax.lax.scan(body, x, blocks)[0]


def _encode_blocks_fused_int8(blocks, x, n_heads: int):
    """Full w8a8 fused block: all four GEMMs as s8×s8 MXU dots with
    activation quantization inside the kernels (VERDICT r3 #2 — the XLA
    w8a8 encoder's quantize/dequant glue made int8 SLOWER than bf16)."""
    from tpu_audio.ops.pallas import fused_encoder as fe

    t = x.shape[1]

    def body(x, bp):
        q, k, v = fe.ln_qkv_packed_int8(x, bp["ln1"], bp["attn"], n_heads)
        y, hn = fe.attn_oproj_ln_int8(q, k, v, x, bp["attn"]["o"],
                                      bp["ln2"], t_valid=t)
        g, sg = fe.fc1_gelu_int8(hn, bp["mlp"]["fc1"])
        x = fe.fc2_residual_int8(g, sg, y, bp["mlp"]["fc2"])
        return x, None

    return jax.lax.scan(body, x, blocks)[0]


def encode(params: dict, cfg: WhisperConfig, mel: jax.Array) -> jax.Array:
    """mel (B, 3000, n_mels) → audio features (B, 1500, D)."""
    p = params["encoder"]
    x = layers.gelu(layers.conv1d_mxu(p["conv1"], mel, stride=1, padding=1))
    x = layers.gelu(layers.conv1d_mxu(p["conv2"], x, stride=2, padding=1))
    pos = layers.sinusoidal_positions(cfg.n_audio_ctx, cfg.n_audio_state)
    x = x + jnp.asarray(pos, x.dtype)

    if FUSED_ENC:
        try:
            from tpu_audio.ops.pallas import fused_encoder as fe

            attn0 = {n: {k_: v_[0] for k_, v_ in sub.items()}
                     for n, sub in p["blocks"]["attn"].items()}
            mlp0 = {n: {k_: v_[0] for k_, v_ in sub.items()}
                    for n, sub in p["blocks"]["mlp"].items()}
            if (fe.supported_int8(x, attn0, mlp0, cfg.n_audio_head)
                    and fe.probe_int8(x.shape[2],
                                      mlp0["fc1"]["weight_i8"].shape[0],
                                      cfg.n_audio_head, x.dtype)):
                x = _encode_blocks_fused_int8(p["blocks"], x,
                                              cfg.n_audio_head)
                return layers.layer_norm(p["ln_post"], x)
            if (fe.supported(x, attn0, cfg.n_audio_head)
                    and fe.probe(x.shape[0], x.shape[1], x.shape[2],
                                 cfg.n_audio_head, x.dtype)):
                x = _encode_blocks_fused(p["blocks"], x, cfg.n_audio_head)
                return layers.layer_norm(p["ln_post"], x)
        except Exception as exc:
            from tpu_audio.ops.quant import _warn_kernel_fallback

            _warn_kernel_fallback(exc)

    def body(x, bp):
        x = x + _self_attention(bp["attn"], layers.layer_norm(bp["ln1"], x),
                                cfg.n_audio_head)
        h = layers.layer_norm(bp["ln2"], x)
        x = x + layers.linear(bp["mlp"]["fc2"],
                              layers.gelu(layers.linear(bp["mlp"]["fc1"], h)))
        return x, None

    x, _ = jax.lax.scan(body, x, p["blocks"])
    return layers.layer_norm(p["ln_post"], x)


def warm_fused_probes(cfg: WhisperConfig, int8: bool = False,
                      dtype=jnp.bfloat16) -> bool:
    """Run the fused encoder-block Mosaic probes eagerly at LOAD time.

    The gate inside encode() probes lazily, which means the probe can fire
    mid-trace in a fresh thread while the runtime is busy compiling the
    enclosing graph; a transient failure there is memoized False for the
    process and the encoder silently drops to the per-op path (observed on
    chip: bench.py's int8 encoder measured 425.9 ms glue in the same
    session where enc_profile measured the identical fused path at
    258.2 ms). Probing here — main thread, eager, before any trace — makes
    the gate deterministic. Returns whether the fused path is live."""
    if not FUSED_ENC:
        return False
    from tpu_audio.ops.pallas import fused_encoder as fe

    try:
        if jax.default_backend() not in ("tpu", "axon"):
            return False
    except Exception:
        return False
    d, heads = cfg.n_audio_state, cfg.n_audio_head
    if heads % 2 or (d // heads) * 2 != 128:
        return False
    ok = bool(fe.probe(1, cfg.n_audio_ctx, d, heads, dtype))
    if int8:
        ok = bool(fe.probe_int8(d, 4 * d, heads, dtype)) and ok
    return ok


# ------------------------------------------------------------------ decoder

@jax.tree_util.register_dataclass
@dataclass
class DecoderState:
    cache: KVCache  # self-attention cache (L, B, n_text_ctx, H, hd)
    cross_k: jax.Array  # (L, B, 1500, H, hd), already scaled by (d/h)^-0.25
    cross_v: jax.Array


@jax.tree_util.register_dataclass
@dataclass
class DecoderStateQ8:
    """Decoder state with int8 cross-K/V (per-channel scales over T).

    Halves the per-step cross-KV HBM traffic — the dominant decode cost at
    batch 16 (benchmarks/dec_profile.py) — and serves decode steps through
    the fused ops/pallas/cross_kv_attention kernel. Same serving-accuracy
    class as the reference's q8 checkpoints (WhisperModel.swift:190-196)."""

    cache: KVCache
    cross_k8: jax.Array   # (L, B, T_pad, H·hd) int8
    cross_v8: jax.Array
    cross_ksc: jax.Array  # (L, B, H·hd) f32
    cross_vsc: jax.Array


def precompute_cross_kv(params: dict, cfg: WhisperConfig,
                        audio_features: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Project encoder output into per-layer cross K/V once per segment."""
    h = cfg.n_text_head
    scale = (cfg.n_text_state // h) ** -0.25

    def body(_, bp):
        k = _heads(layers.linear(bp["cross_attn"]["k"], audio_features), h) * scale
        v = _heads(layers.linear(bp["cross_attn"]["v"], audio_features), h)
        return None, (k, v)

    _, (ks, vs) = jax.lax.scan(body, None, params["decoder"]["blocks"])
    return ks, vs


def init_state(params: dict, cfg: WhisperConfig, audio_features: jax.Array,
               batch: int = 1, dtype=jnp.float32,
               kv_int8: bool = False) -> DecoderState | DecoderStateQ8:
    """kv_int8=True quantizes the cross-K/V to int8 at per-channel scales
    (once per window; decode steps then read half the bytes through the
    fused cross_kv_attention kernel)."""
    ck, cv = precompute_cross_kv(params, cfg, audio_features)
    cache = KVCache.create(cfg.n_text_layer, batch, cfg.n_text_ctx,
                           cfg.n_text_head, cfg.n_text_state // cfg.n_text_head,
                           dtype=dtype)
    if kv_int8:
        from tpu_audio.ops.pallas import cross_kv_attention as ckv

        k8, ks, v8, vs = ckv.quantize_cross_kv(ck, cv)
        return DecoderStateQ8(cache=cache, cross_k8=k8, cross_v8=v8,
                              cross_ksc=ks, cross_vsc=vs)
    return DecoderState(cache=cache, cross_k=ck, cross_v=cv)


def decode_step(params: dict, cfg: WhisperConfig, tokens: jax.Array,
                state: DecoderState | DecoderStateQ8
                ) -> tuple[jax.Array, DecoderState | DecoderStateQ8]:
    """tokens (B, T) fed at positions state.cache.pos.. → (logits (B, T, V),
    state). Same function serves prefill (T=n_init) and decode (T=1)."""
    p = params["decoder"]
    b, t = tokens.shape
    h, d = cfg.n_text_head, cfg.n_text_state
    hd = d // h
    scale = hd ** -0.25
    pos = state.cache.pos
    q8 = isinstance(state, DecoderStateQ8)
    if q8:
        from tpu_audio.ops.pallas import cross_kv_attention as ckv

        # single-token decode rides the fused int8-KV kernel (whole stacked
        # arrays + scalar-prefetch layer select — scan-slicing them into a
        # custom call would re-copy the K/V to HBM every layer); prefill
        # (t > 1, once per window) dequantizes per layer in XLA
        kernel_ok = t == 1 and ckv.supported(h, hd)

    x = layers.embedding(p["token_embedding"], tokens)
    pe = jax.lax.dynamic_slice(p["positional_embedding"], (pos, 0),
                               (t, d))
    x = x + pe[None].astype(x.dtype)

    if q8 and t == 1 and b == 1:
        # single-stream serving: the ENTIRE 4-layer decoder step (self +
        # int8 cross attention + LN/GELU MLPs + final LN) as one Pallas
        # launch — the B=1 step is op-issue-bound, not byte-bound
        # (ops/pallas/fused_whisper_step.py; probe-gated with XLA fallback)
        from tpu_audio.ops.pallas import fused_whisper_step as fws

        if fws.decode_supported(cfg, p, state.cache.k.dtype):
            s_max = state.cache.max_len
            lyr = cfg.n_text_layer
            kc = state.cache.k.reshape(lyr, s_max, d)
            vc = state.cache.v.reshape(lyr, s_max, d)
            hfin, kc, vc = fws.fused_whisper_decode_step(
                p, x[:, 0], pos, kc, vc,
                state.cross_k8, state.cross_ksc,
                state.cross_v8, state.cross_vsc,
                n_heads=h, hd=hd, t_valid=cfg.n_audio_ctx)
            logits = layers.embedding_as_linear(
                p["token_embedding"], hfin[:, None].astype(x.dtype))
            new_cache = KVCache(
                k=kc.reshape(state.cache.k.shape),
                v=vc.reshape(state.cache.v.shape), pos=pos + 1)
            return logits, DecoderStateQ8(
                cache=new_cache, cross_k8=state.cross_k8,
                cross_v8=state.cross_v8, cross_ksc=state.cross_ksc,
                cross_vsc=state.cross_vsc)

    mask = attention.decode_mask(state.cache.max_len, pos, t)

    # int8 (w8a8) decoder blocks: the stacked (L, O, I) int8 weights leave
    # the scan and ride scalar-prefetch layer selection inside the kernel —
    # scanning them would re-copy every weight to HBM each layer (the same
    # finding that shaped the LLM decode path, nn/transformer.py)
    from tpu_audio.nn.transformer import (_reinject_stacked,
                                          _split_stacked_quant)

    scan_blocks, stacked = _split_stacked_quant(p["blocks"])

    def body(carry, xs):
        x, kbuf, vbuf = carry
        if q8:
            bp, ksc, vsc, li = xs
        else:
            bp, ck, cv, li = xs
        if stacked:
            bp = _reinject_stacked(bp, stacked, li)
        # self-attention with cache
        hn = layers.layer_norm(bp["ln1"], x)
        q = _heads(layers.linear(bp["attn"]["q"], hn), h) * scale
        k = _heads(layers.linear(bp["attn"]["k"], hn), h) * scale
        v = _heads(layers.linear(bp["attn"]["v"], hn), h)
        kbuf = jax.lax.dynamic_update_slice(kbuf, k[None].astype(kbuf.dtype),
                                            (li, 0, pos, 0, 0))
        vbuf = jax.lax.dynamic_update_slice(vbuf, v[None].astype(vbuf.dtype),
                                            (li, 0, pos, 0, 0))
        kl = jax.lax.dynamic_index_in_dim(kbuf, li, 0, keepdims=False)
        vl = jax.lax.dynamic_index_in_dim(vbuf, li, 0, keepdims=False)
        o = attention.attend(q, kl.astype(q.dtype), vl.astype(q.dtype), mask,
                             q_scaled=True)
        x = x + layers.linear(bp["attn"]["o"], o.reshape(b, t, d))
        # cross-attention (K/V precomputed)
        hn = layers.layer_norm(bp["ln_cross"], x)
        qc = _heads(layers.linear(bp["cross_attn"]["q"], hn), h) * scale
        if q8 and kernel_ok:
            oc = ckv.cross_attention_decode(
                qc[:, 0], state.cross_k8, state.cross_v8, ksc, vsc, li,
                t_valid=cfg.n_audio_ctx, n_heads=h)[:, None].astype(qc.dtype)
        elif q8:
            ckl = ckv.dequant_layer(
                jax.lax.dynamic_index_in_dim(state.cross_k8, li, 0,
                                             keepdims=False),
                ksc, cfg.n_audio_ctx, h)
            cvl = ckv.dequant_layer(
                jax.lax.dynamic_index_in_dim(state.cross_v8, li, 0,
                                             keepdims=False),
                vsc, cfg.n_audio_ctx, h)
            oc = attention.attend(qc, ckl.astype(qc.dtype),
                                  cvl.astype(qc.dtype), q_scaled=True)
        else:
            oc = attention.attend(qc, ck.astype(qc.dtype),
                                  cv.astype(qc.dtype), q_scaled=True)
        x = x + layers.linear(bp["cross_attn"]["o"], oc.reshape(b, t, d))
        # mlp
        hn = layers.layer_norm(bp["ln2"], x)
        x = x + layers.linear(bp["mlp"]["fc2"],
                              layers.gelu(layers.linear(bp["mlp"]["fc1"], hn)))
        return (x, kbuf, vbuf), None

    xs = ((scan_blocks, state.cross_ksc, state.cross_vsc,
           jnp.arange(cfg.n_text_layer)) if q8 else
          (scan_blocks, state.cross_k, state.cross_v,
           jnp.arange(cfg.n_text_layer)))
    (x, kbuf, vbuf), _ = jax.lax.scan(body, (x, state.cache.k, state.cache.v),
                                      xs)
    x = layers.layer_norm(p["ln"], x)
    logits = layers.embedding_as_linear(p["token_embedding"], x)
    new_cache = KVCache(k=kbuf, v=vbuf, pos=pos + t)
    if q8:
        return logits, DecoderStateQ8(
            cache=new_cache, cross_k8=state.cross_k8,
            cross_v8=state.cross_v8, cross_ksc=state.cross_ksc,
            cross_vsc=state.cross_vsc)
    return logits, DecoderState(cache=new_cache, cross_k=state.cross_k,
                                cross_v=state.cross_v)


def forward_cross_qk(params: dict, cfg: WhisperConfig, tokens: jax.Array,
                     audio_features: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Full-sequence decoder pass that also returns cross-attention softmax
    weights for word-timing DTW: (logits (B,T,V), qk (L, B, H, T, 1500)).

    Kept separate from the decode hot path — reference computes crossQK on
    every decode (TextDecoder.swift:17-97); here it's only run for the
    word-timestamp pass over already-sampled tokens.
    """
    p = params["decoder"]
    b, t = tokens.shape
    h, d = cfg.n_text_head, cfg.n_text_state
    scale = (d // h) ** -0.25
    ck, cv = precompute_cross_kv(params, cfg, audio_features)

    x = layers.embedding(p["token_embedding"], tokens)
    x = x + p["positional_embedding"][None, :t].astype(x.dtype)
    mask = attention.causal_mask(t, t)

    def body(x, xs):
        bp, ckl, cvl = xs
        x = x + _self_attention(bp["attn"], layers.layer_norm(bp["ln1"], x),
                                h, mask)
        hn = layers.layer_norm(bp["ln_cross"], x)
        qc = _heads(layers.linear(bp["cross_attn"]["q"], hn), h) * scale
        scores = jnp.einsum("bqhd,bkhd->bhqk", qc, ckl.astype(qc.dtype),
                            preferred_element_type=jnp.float32)
        w = jax.nn.softmax(scores, axis=-1)
        oc = jnp.einsum("bhqk,bkhd->bqhd", w.astype(cvl.dtype), cvl)
        x = x + layers.linear(bp["cross_attn"]["o"], oc.reshape(b, t, d))
        hn = layers.layer_norm(bp["ln2"], x)
        x = x + layers.linear(bp["mlp"]["fc2"],
                              layers.gelu(layers.linear(bp["mlp"]["fc1"], hn)))
        return x, scores  # raw scores; timing soft-maxes after head selection

    x, qks = jax.lax.scan(body, x, (p["blocks"], ck, cv))
    x = layers.layer_norm(p["ln"], x)
    logits = layers.embedding_as_linear(p["token_embedding"], x)
    return logits, qks
