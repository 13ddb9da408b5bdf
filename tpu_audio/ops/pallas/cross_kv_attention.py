"""Fused cross-attention decode over int8 cross-K/V (Whisper-class STT).

Why this kernel exists: at batch 16 the Whisper large-v3-turbo decode step
spends ~2.0 of 2.85 ms in cross-attention (benchmarks/dec_profile.py
ablations) — every step re-reads the full (L=4, B, T=1500, H·hd=1280)
cross-K/V from HBM, and the XLA scan path moves those bf16 tensors at only
~250 GB/s effective. Two fixes compose here:

1. **int8 K/V at per-channel scales, dequant algebraically free.** With a
   per-(layer, batch, channel) scale s_d over the T axis,
   scores = Σ_d q_d·(s_d·K8[t,d]) = Σ_d (q_d s_d)·K8[t,d] — the K scale
   folds into q BEFORE the kernel, and the V scale folds into the output
   AFTER it, so the kernel never does per-element dequant math; int8→bf16
   upcasts feed the MXU directly. HBM traffic halves.

2. **Whole-array operands + scalar-prefetch layer select.** The decoder's
   lax.scan would materialize an HBM copy of any scan-sliced operand
   feeding a custom call (the round-2 W8A8 finding); the kernel takes the
   full stacked (L, ...) arrays and picks the layer in the block index_map.

MXU mapping: per-stream decode attention is a (T×hd)·(hd) matvec — 1/128
of the MXU. The kernel instead builds a BLOCK-DIAGONAL q matrix (one
column per head) so scores for a whole head-group come out of ONE
(T_pad × HD_BLK)·(HD_BLK × 128) dot with ≥128-lane tiles, and the
probability·V product is one (128 × T_pad)·(T_pad × HD_BLK) dot whose
off-diagonal head mixes are discarded by an iota mask. The padding compute
is ~32 GFLOP/step at Whisper batch-16 shapes (~0.2 ms at peak) — cheap
against the ~1.4 ms of bandwidth it removes.

Reference behavior being served: the same cross-attention the reference
evaluates per decode step (package/STT/Whisper/Layers/
MultiHeadAttention.swift:85-135, TextDecoder.swift kv-cache path); int8
K/V is within its q8 serving class (WhisperModel.swift:190-196).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

LANE = 128
COLS = 128          # MXU lane width of the block-diagonal q / score columns
MAX_HD_BLK = 640    # head-group block cap: 2 × (1536×640) int8 ≈ 1.9 MB/blk


def head_group(h: int, hd: int) -> int | None:
    """Largest head count g per block with H % g == 0, (g·hd) % 128 == 0,
    g·hd ≤ MAX_HD_BLK and g ≤ COLS columns. None if no valid grouping."""
    for g in range(min(h, COLS, MAX_HD_BLK // max(hd, 1)), 0, -1):
        if h % g == 0 and (g * hd) % LANE == 0:
            return g
    return None


def quantize_cross_kv(ck: jax.Array, cv: jax.Array
                      ) -> tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """(L, B, T, H, hd) float K/V → ((L, B, T_pad, H·hd) int8,
    (L, B, H·hd) f32 scale) × 2, quantized per channel over the T axis.

    T pads to a lane multiple so the kernel's sublane dim is tile-aligned;
    padded rows quantize to 0 and are additionally masked in-kernel."""

    def q(x):
        lyr, b, t, h, hd = x.shape
        xf = x.astype(jnp.float32).reshape(lyr, b, t, h * hd)
        s = jnp.maximum(jnp.max(jnp.abs(xf), axis=2) / 127.0, 1e-10)
        x8 = jnp.clip(jnp.round(xf / s[:, :, None]), -127, 127)
        t_pad = -(-t // LANE) * LANE
        if t_pad != t:
            x8 = jnp.pad(x8, ((0, 0), (0, 0), (0, t_pad - t), (0, 0)))
        return x8.astype(jnp.int8), s

    k8, ks = q(ck)
    v8, vs = q(cv)
    return k8, ks, v8, vs


def _kernel(l_ref, qbd_ref, k_ref, v_ref, out_ref, *, t_valid: int,
            hd: int):
    # scores for the whole head-group in one MXU dot against the
    # block-diagonal q: column j holds head j's q channels, so
    # scores[t, j] = Σ_d K8[t, gd]·qbd[gd, j] touches only head j's block
    kf = k_ref[0, 0].astype(jnp.bfloat16)            # (T_pad, HD_BLK)
    scores = jax.lax.dot_general(
        kf, qbd_ref[0, 0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)          # (T_pad, COLS)
    tpos = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 0)
    scores = jnp.where(tpos < t_valid, scores, -1e30)
    m = jnp.max(scores, axis=0, keepdims=True)
    e = jnp.exp(scores - m)                          # masked rows → 0
    denom = jnp.sum(e, axis=0)                       # (COLS,)
    vf = v_ref[0, 0].astype(jnp.bfloat16)
    r = jax.lax.dot_general(
        e.astype(jnp.bfloat16), vf, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)          # (COLS, HD_BLK)
    r = r / denom[:, None]
    # keep only row h for head h's channel block (lane // hd == row);
    # off-diagonal head mixes and the unused COLS tail are discarded
    row = jax.lax.broadcasted_iota(jnp.int32, r.shape, 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, r.shape, 1)
    res = jnp.sum(jnp.where(lane // hd == row, r, 0.0), axis=0)
    # out block is (1, 1, 8, HD_BLK): Mosaic requires the second-minor block
    # dim divisible by 8 (a (1, HD_BLK) row block is rejected); rows 1..7
    # are discarded by the caller
    out_ref[0, 0] = jnp.broadcast_to(res[None], (8, res.shape[0]))


@functools.partial(jax.jit,
                   static_argnames=("t_valid", "n_heads", "interpret"))
def cross_attention_decode(q: jax.Array, k8: jax.Array, v8: jax.Array,
                           k_scale: jax.Array, v_scale: jax.Array,
                           layer: jax.Array, *, t_valid: int,
                           n_heads: int,
                           interpret: bool = False) -> jax.Array:
    """One decode step of cross-attention for layer `layer`.

    q: (B, H, hd) float — query already carrying any softmax scale.
    k8/v8: (L, B, T_pad, H·hd) int8 (quantize_cross_kv layout).
    k_scale/v_scale: THIS layer's (B, H·hd) f32 channel scales.
    Returns (B, H, hd) f32.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, hd = q.shape
    assert h == n_heads
    t_pad = k8.shape[2]
    gh = head_group(h, hd)
    assert gh is not None, (h, hd)
    g = h // gh
    hd_blk = gh * hd

    # fold the K channel scale into q, then lay q out block-diagonally:
    # qbd[b, grp, h_local·hd + d, h_local] = q[b, grp·gh + h_local, d]
    qs = (q.astype(jnp.float32).reshape(b, h * hd) * k_scale
          ).reshape(b, g, gh, hd)
    eye = jnp.eye(gh, dtype=jnp.float32)
    qbd = (qs[..., None] * eye[None, None, :, None, :]).reshape(
        b, g, hd_blk, gh).astype(jnp.bfloat16)
    if gh < COLS:
        qbd = jnp.pad(qbd, ((0, 0), (0, 0), (0, 0), (0, COLS - gh)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b, g),
        in_specs=[
            pl.BlockSpec((1, 1, hd_blk, COLS), lambda bi, gi, l: (bi, gi, 0, 0)),
            pl.BlockSpec((1, 1, t_pad, hd_blk), lambda bi, gi, l: (l[0], bi, 0, gi)),
            pl.BlockSpec((1, 1, t_pad, hd_blk), lambda bi, gi, l: (l[0], bi, 0, gi)),
        ],
        out_specs=pl.BlockSpec((1, 1, 8, hd_blk),
                               lambda bi, gi, l: (bi, gi, 0, 0)),
    )
    out = pl.pallas_call(
        functools.partial(_kernel, t_valid=t_valid, hd=hd),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, g, 8, hd_blk), jnp.float32),
        interpret=interpret,
    )(jnp.asarray(layer, jnp.int32).reshape(1), qbd, k8, v8)
    out = out[:, :, 0].reshape(b, h * hd) * v_scale
    return out.reshape(b, h, hd)


def dequant_layer(x8: jax.Array, scale: jax.Array, t: int, n_heads: int
                  ) -> jax.Array:
    """One layer's (B, T_pad, H·hd) int8 → (B, t, H, hd) bf16 (the XLA
    fallback for prefill steps, where tq > 1 and the one-off dequant cost
    amortizes over the whole prompt)."""
    b, t_pad, hdim = x8.shape
    xf = x8.astype(jnp.float32) * scale[:, None, :]
    return xf[:, :t].reshape(b, t, n_heads, hdim // n_heads
                             ).astype(jnp.bfloat16)


def supported(h: int, hd: int) -> bool:
    try:
        if jax.default_backend() not in ("tpu", "axon"):
            return False
    except Exception:
        return False
    return head_group(h, hd) is not None
