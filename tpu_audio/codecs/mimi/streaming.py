"""Exact stateful streaming Mimi decoder.

Reference: package/TTS/Marvis/Mimi/Conv.swift (StreamableConv1d /
StreamableConvTranspose1d state machines) + Mimi.swift:213-241
(MimiStreamingDecoder.decodeFrames). The whole decode path is causal —
stride-1 left-padded convs, causal transposed convs, and a 250-frame
windowed transformer — so a per-chunk decoder carrying

  - each conv's input tail (k_eff − 1 samples at that conv's rate),
  - each transposed conv's partial-output overlap (k − stride samples,
    bias-free so the next chunk adds bias exactly once),
  - a sliding K/V cache for the decoder transformer (window t_context),

reproduces the one-shot `model.decode` EXACTLY (same dot products per
output sample), at O(chunk) cost per call — the TPU replacement for the
reference's per-step state machines, with every state a static-shape
jnp array so one jitted graph serves the whole stream.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

from tpu_audio.codecs.mimi.model import (ELU, MimiConfig, split_rvq_decode)
from tpu_audio.nn import attention, layers, rope


# ---------------------------------------------------------------- primitives

def conv_stream(p, x, tail, dilation: int = 1):
    """Stride-1 causal conv over a chunk: carry = last k_eff−1 inputs.

    x (B, T, Ci), tail (B, k_eff−1, Ci) → (y (B, T, Co), new tail)."""
    k = p["weight"].shape[0]
    k_eff = (k - 1) * dilation + 1
    if k_eff == 1:
        return layers.conv1d(p, x), tail
    xe = jnp.concatenate([tail, x], axis=1)
    y = layers.conv1d(p, xe, padding=0, dilation=dilation)
    return y, xe[:, xe.shape[1] - (k_eff - 1):]


def conv_tail_init(p, batch: int, dilation: int = 1, dtype=jnp.float32):
    k = p["weight"].shape[0]
    k_eff = (k - 1) * dilation + 1
    ci = p["weight"].shape[1]
    return jnp.zeros((batch, max(k_eff - 1, 0), ci), dtype)


def conv_transpose_stream(p, x, carry, stride: int):
    """Causal transposed conv over a chunk: carry = trailing k−stride
    partial outputs WITHOUT bias (so each output position gets bias once).

    x (B, T, Ci), carry (B, k−stride, Co) → (y (B, T·stride, Co), carry)."""
    k = p["weight"].shape[0]
    over = k - stride
    raw = layers.conv_transpose1d(p, x, stride=stride, padding=0)
    # raw length: (T−1)·stride + k = T·stride + over
    raw = raw.at[:, :over].add(carry)
    y = raw[:, : raw.shape[1] - over]
    bias = p.get("bias")
    new_carry = raw[:, raw.shape[1] - over:]
    if bias is not None:
        new_carry = new_carry - bias
    return y, new_carry


def conv_transpose_carry_init(p, stride: int, batch: int, dtype=jnp.float32):
    k = p["weight"].shape[0]
    co = p["weight"].shape[2]
    return jnp.zeros((batch, max(k - stride, 0), co), dtype)


# ---------------------------------------------------------------- transformer

def transformer_stream(params, cfg: MimiConfig, x, k_cache, v_cache, pos):
    """Windowed-causal transformer step with sliding K/V caches.

    x (B, T, D); k_cache/v_cache (L, B, C, H, hd) hold the last C
    positions ending at `pos` (absolute index of x[:, 0]); C ≥
    t_context − 1 + T guarantees every query sees its full window."""
    b, t, d = x.shape
    heads = cfg.t_heads
    hd = d // heads
    inv = rope.base_inv_freq(hd, 10000.0)
    c = k_cache.shape[2]
    q_pos = pos + jnp.arange(t)
    key_pos = pos + t - c + jnp.arange(c)  # cache after this chunk's append
    ok = ((key_pos[None, :] >= 0)
          & (key_pos[None, :] <= q_pos[:, None])
          & (key_pos[None, :] > q_pos[:, None] - cfg.t_context))
    mask = jnp.where(ok, 0.0, attention.NEG_INF)[None, None].astype(
        jnp.float32)

    new_k, new_v = [], []
    for i in range(cfg.t_layers):
        lp = params["layers"][str(i)]
        h = layers.layer_norm(lp["norm1"], x)
        q = rope.apply_rope(layers.linear(lp["self_attn"]["q"], h)
                            .reshape(b, t, heads, hd), q_pos, inv)
        k = rope.apply_rope(layers.linear(lp["self_attn"]["k"], h)
                            .reshape(b, t, heads, hd), q_pos, inv)
        v = layers.linear(lp["self_attn"]["v"], h).reshape(b, t, heads, hd)
        kc = jnp.concatenate([k_cache[i, :, t:], k], axis=1)
        vc = jnp.concatenate([v_cache[i, :, t:], v], axis=1)
        new_k.append(kc)
        new_v.append(vc)
        o = attention.attend(q, kc, vc, mask)
        x = x + lp["gamma_1"] * layers.linear(lp["self_attn"]["o"],
                                              o.reshape(b, t, d))
        h = layers.layer_norm(lp["norm2"], x)
        h = layers.linear(lp["mlp"]["fc2"], jax.nn.gelu(
            layers.linear(lp["mlp"]["fc1"], h), approximate=True))
        x = x + lp["gamma_2"] * h
    return x, jnp.stack(new_k), jnp.stack(new_v)


# ---------------------------------------------------------------- state

@jax.tree_util.register_dataclass
@dataclass
class MimiDecState:
    up_carry: jax.Array
    tf_k: jax.Array
    tf_v: jax.Array
    tf_pos: jax.Array  # int32: absolute 25 Hz position of the next chunk
    conv_tails: dict
    tr_carries: dict


def init_state(params, cfg: MimiConfig, batch: int = 1,
               chunk_frames: int = 8, dtype=jnp.float32) -> MimiDecState:
    """chunk_frames: 12.5 Hz frames per decode_stream call (static)."""
    t25 = chunk_frames * cfg.downsample_stride
    c = cfg.t_context - 1 + t25
    d = cfg.dimension
    hd = d // cfg.t_heads
    dec = params["decoder"]
    tails = {"init": conv_tail_init(dec["init_conv1d"], batch, dtype=dtype)}
    carries = {}
    li = 0
    for ri, ratio in enumerate(cfg.ratios):
        carries[f"tr{ri}"] = conv_transpose_carry_init(
            dec["layers"][str(li)], ratio, batch, dtype)
        li += 1
        rb = dec["layers"][str(li)]["block"]
        li += 1
        tails[f"rb{ri}a"] = conv_tail_init(rb["0"], batch, dtype=dtype)
        tails[f"rb{ri}b"] = conv_tail_init(rb["1"], batch, dtype=dtype)
    tails["final"] = conv_tail_init(dec["final_conv1d"], batch, dtype=dtype)
    return MimiDecState(
        up_carry=conv_transpose_carry_init(
            params["upsample"]["convtr"], cfg.downsample_stride, batch,
            dtype),
        tf_k=jnp.zeros((cfg.t_layers, batch, c, cfg.t_heads, hd), dtype),
        tf_v=jnp.zeros((cfg.t_layers, batch, c, cfg.t_heads, hd), dtype),
        tf_pos=jnp.zeros((), jnp.int32),
        conv_tails=tails,
        tr_carries=carries,
    )


# ---------------------------------------------------------------- decode

def decode_stream(params, cfg: MimiConfig, codes: jax.Array,
                  state: MimiDecState) -> tuple[jax.Array, MimiDecState]:
    """codes (B, n_q, F) chunk → (audio (B, F·hop), new state).

    Concatenating chunk outputs equals model.decode on the concatenated
    codes, exactly."""
    tails = dict(state.conv_tails)
    carries = dict(state.tr_carries)

    z = split_rvq_decode(params, cfg, codes)
    z, up_carry = conv_transpose_stream(params["upsample"]["convtr"], z,
                                        state.up_carry,
                                        cfg.downsample_stride)
    z, tf_k, tf_v = transformer_stream(params["decoder_transformer"], cfg, z,
                                       state.tf_k, state.tf_v, state.tf_pos)

    dec = params["decoder"]
    x, tails["init"] = conv_stream(dec["init_conv1d"], z, tails["init"])
    li = 0
    for ri, ratio in enumerate(cfg.ratios):
        x, carries[f"tr{ri}"] = conv_transpose_stream(
            dec["layers"][str(li)], ELU(x), carries[f"tr{ri}"], ratio)
        li += 1
        rb = dec["layers"][str(li)]["block"]
        li += 1
        y, tails[f"rb{ri}a"] = conv_stream(rb["0"], ELU(x), tails[f"rb{ri}a"])
        y, tails[f"rb{ri}b"] = conv_stream(rb["1"], ELU(y), tails[f"rb{ri}b"])
        x = x + y
    audio, tails["final"] = conv_stream(dec["final_conv1d"], ELU(x),
                                        tails["final"])
    new_state = MimiDecState(up_carry=up_carry, tf_k=tf_k, tf_v=tf_v,
                             tf_pos=state.tf_pos + z.shape[1],
                             conv_tails=tails, tr_carries=carries)
    return audio[..., 0], new_state
