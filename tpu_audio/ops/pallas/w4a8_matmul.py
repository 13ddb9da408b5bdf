"""W4A8 decode matmul: packed int4 weights unpacked to int8 IN-KERNEL,
consumed by int8 MXU dots — 0.5 B/weight HBM traffic at group-64 accuracy.

Why this kernel exists (the round-1 verdict's named lever): the fused int4
float kernel (quant_matmul.py) spends ~6 VPU ops per weight composing floats
from nibbles, which caps 3B decode at bf16 latency parity; the W8A8 kernel
(int8_matmul.py) has zero per-weight VPU work but streams 1 B/weight and
gives up the checkpoint's group-64 scale resolution. This kernel keeps both:

  - storage (PAIR layout): one int8 byte packs two int4 codes from ADJACENT
    groups: byte 64p+j of group-pair p holds col 128p+j (group 2p) in the
    low nibble and col 128p+64+j (group 2p+1) in the high nibble. The high
    nibble is stored BIASED by −8, because Mosaic has no int8 vector shifts
    (arith.shrsi fails to legalize): both planes then extract with pure
    AND masks — `lo = b & 15` (codes 0..15) and `hi16 = b & -16`
    (= 16·(h−8), a valid int8) — i.e. ONE VPU op per weight.
    Pairing the groups (rather than splitting one group across nibbles)
    makes every nibble-plane dot span a FULL group of 64 columns, doubling
    the MXU contraction depth per dot vs a split-group layout — measured
    ~25% faster at 3B shapes;
  - compute: per-group 64-deep int8×int8 MXU dots (exact int32); the hi
    dot is 16× the true value, folded into the f32 group-scale multiply
    (×1/16), and the −8 bias folds into a (B, P)·(P, O) f32 GEMM on
    int8-activation group sums outside the kernel;
  - the affine zero-point term Σ_g bias[o,g]·Σ_{i∈g}x_i likewise never
    enters the kernel: another tiny f32 GEMM on group sums, fused by XLA.

Quantization semantics are EXACTLY the mlx checkpoint's group-affine int4
(w = scale·q + bias, q ∈ [0,16)) with int8 per-row activations — no
requantization loss on the weights (unlike the W8A8 path).

Accuracy: y = (Σ_g s[o,g]·(xq·q)_g)·sx[b] + Σ_g b[o,g]·xsum[b,g]; the only
approximation is the int8 activation rounding, shared with the W8A8 path.

Reference motivation: the reference ships 4-bit checkpoints for its largest
TTS LLM (TTS/Orpheus/TTSEngine/OrpheusWeightLoader.swift:31).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from tpu_audio.ops.pallas.int8_matmul import SUBLANE_I8, quantize_rows

GROUP = 64
PAIR = 2 * GROUP  # columns covered by one packed byte-span of 64
VMEM_BUDGET = 8 * 2 ** 20


def pack_w4a8(q: np.ndarray) -> np.ndarray:
    """Unpacked int4 codes (O, I) in [0, 16) → pair-packed int8 (O, I/2).

    Byte 64p+j holds col 128p+j (group 2p) in the low nibble and col
    128p+64+j (group 2p+1) in the high nibble, the latter biased by −8
    (stored as (h−8) mod 16) so the kernel can extract it with a single
    AND mask (see module docstring).
    """
    o, i = q.shape
    assert i % PAIR == 0, i
    g3 = q.reshape(o, i // PAIR, PAIR).astype(np.uint8)
    lo, hi = g3[..., :GROUP], g3[..., GROUP:]
    hib = (hi - 8) & 15
    return (lo | (hib << 4)).reshape(o, i // 2).astype(np.int8)


def split_activations(xq: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(B, I) int8 → even/odd-group (B, I/2) halves in packed byte order."""
    b, i = xq.shape
    g3 = xq.reshape(b, i // PAIR, PAIR)
    return (g3[..., :GROUP].reshape(b, i // 2),
            g3[..., GROUP:].reshape(b, i // 2))


def _pick_pps(p: int, target: int) -> int:
    """Largest divisor of p that is ≤ target and a multiple of 8 (the f32
    sublane tile for the streamed scale planes). When no such divisor
    exists but p itself is small (TP-sharded widths like p=6 or 12), the
    whole contraction runs as ONE k-step with the scale planes padded up
    to the sublane tile — returns p in that case; 0 if unsupported."""
    for cand in range(min(p, target), 7, -1):
        if p % cand == 0 and cand % 8 == 0:
            return cand
    if p <= max(target, 8) and p % 2 == 0:  # kb = 64p must be lane-tiled
        return p  # single k-step; caller pads the (P, O) scale planes
    return 0


def _kernel(pps, x_lo_ref, x_hi_ref, sx_ref, wp_ref, se_ref, so_ref,
            out_ref):
    import jax.experimental.pallas as pl

    k = pl.program_id(1)

    @pl.when(k == 0)
    def _init():
        out_ref[:, :] = jnp.zeros_like(out_ref)

    wp = wp_ref[:, :]
    lo = wp & 15  # even-group codes 0..15 (AND keeps bits 0-3)
    hi16 = wp & (-16)  # 16·(h−8) as signed int8; no vector shift needed
    acc = jnp.zeros(out_ref.shape, jnp.float32)
    for pp in range(pps):
        sl = slice(pp * GROUP, (pp + 1) * GROUP)
        dlo = jax.lax.dot_general(
            x_lo_ref[:, sl], lo[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)
        dhi = jax.lax.dot_general(
            x_hi_ref[:, sl], hi16[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)
        acc += (dlo.astype(jnp.float32) * se_ref[pp, :][None, :]
                + dhi.astype(jnp.float32) * so_ref[pp, :][None, :])
    out_ref[:, :] += acc * sx_ref[:, :]


@functools.partial(jax.jit,
                   static_argnames=("block_o", "pairs_per_step", "interpret"))
def w4a8_matmul(x: jax.Array, wp: jax.Array, scales: jax.Array,
                biases: jax.Array, block_o: int | None = None,
                pairs_per_step: int = 24,
                interpret: bool = False) -> jax.Array:
    """x (B, I) float · group-affine int4 (O, I) → (B, O) f32.

    wp: pair-packed int8 (O, I/2) from pack_w4a8; scales/biases (O, G) f32.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, i = x.shape
    o = wp.shape[0]
    g = i // GROUP
    p = i // PAIR
    pps = _pick_pps(p, pairs_per_step)

    xq, sx = quantize_rows(x)
    x_lo, x_hi = split_activations(xq)
    # affine zero-point term on exact f32 group sums (fused by XLA)
    xsum = x.astype(jnp.float32).reshape(b, g, GROUP).sum(-1)
    y_bias = jax.lax.dot_general(xsum, biases.astype(jnp.float32),
                                 (((1,), (1,)), ((), ())),
                                 precision=jax.lax.Precision.HIGHEST)
    # the stored odd-group nibbles are biased by −8: add back
    # 8·sx·Σ_odd-groups s[o,g]·Σ_{i∈g} xq — another tiny f32 GEMM
    s_odd = scales.astype(jnp.float32)[..., 1::2]  # (O, P)
    xqsum_odd = x_hi.astype(jnp.float32).reshape(b, p, GROUP).sum(-1)
    y_bias += 8.0 * sx * jax.lax.dot_general(
        xqsum_odd, s_odd, (((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST)

    b_pad = -(-b // SUBLANE_I8) * SUBLANE_I8
    if b_pad != b:
        x_lo = jnp.pad(x_lo, ((0, b_pad - b), (0, 0)))
        x_hi = jnp.pad(x_hi, ((0, b_pad - b), (0, 0)))
        sx = jnp.pad(sx, ((0, b_pad - b), (0, 0)))

    if block_o is None:
        # prefer a block that divides O exactly: the ragged-tail fallback
        # below materializes int32 unpacks in XLA, which is far costlier
        # than a slightly smaller Pallas block (e.g. qkv O=5120 → 1024)
        cap = 2048
        while cap > 256 and cap * i // 2 > VMEM_BUDGET:
            cap //= 2
        block_o = next((cand for cand in range(cap, 255, -128)
                        if o % cand == 0), cap)
    o_main = (o // block_o) * block_o if pps else 0
    kb = pps * GROUP  # packed bytes (and x_lo/x_hi cols) per k-step
    parts = []
    if o_main:
        # (P, O): the lane axis must be 128-divisible in block shapes, so
        # scales stream transposed with the pair axis on sublanes
        se = scales.astype(jnp.float32)[:, 0::2].T
        so = (s_odd * (1.0 / 16.0)).T
        # sublane tile: pad the plane rows when pps isn't a multiple of 8
        # (single-k-step mode for TP-sharded widths — see _pick_pps)
        pps_pad = -(-pps // 8) * 8
        if pps_pad != pps:
            assert p // pps == 1, (p, pps)
            se = jnp.pad(se, ((0, pps_pad - pps), (0, 0)))
            so = jnp.pad(so, ((0, pps_pad - pps), (0, 0)))
        out = pl.pallas_call(
            functools.partial(_kernel, pps),
            out_shape=jax.ShapeDtypeStruct((b_pad, o_main), jnp.float32),
            grid=(o_main // block_o, p // pps),
            in_specs=[
                pl.BlockSpec((b_pad, kb), lambda ob, k: (0, k),
                             memory_space=pltpu.VMEM),  # x_lo
                pl.BlockSpec((b_pad, kb), lambda ob, k: (0, k),
                             memory_space=pltpu.VMEM),  # x_hi
                pl.BlockSpec((b_pad, 1), lambda ob, k: (0, 0),
                             memory_space=pltpu.VMEM),  # sx
                pl.BlockSpec((block_o, kb), lambda ob, k: (ob, k),
                             memory_space=pltpu.VMEM),  # wp
                pl.BlockSpec((pps_pad, block_o), lambda ob, k: (k, ob),
                             memory_space=pltpu.VMEM),  # even scales (P, O)
                pl.BlockSpec((pps_pad, block_o), lambda ob, k: (k, ob),
                             memory_space=pltpu.VMEM),  # odd scales/16
            ],
            out_specs=pl.BlockSpec((b_pad, block_o), lambda ob, k: (0, ob),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,
        )(x_lo, x_hi, sx, wp, se, so)
        parts.append(out[:b])
    if o_main < o:
        # ragged tail rows: per-group int8 dots in XLA, same decomposition
        # (the −8 correction GEMM above spans ALL output rows)
        wp_t = wp[o_main:]
        lo = (wp_t & 15).astype(jnp.int32)
        hi16 = (wp_t & (-16)).astype(jnp.int32)
        x3l = x_lo[:b].reshape(b, p, GROUP).astype(jnp.int32)
        x3h = x_hi[:b].reshape(b, p, GROUP).astype(jnp.int32)
        w3l = lo.reshape(o - o_main, p, GROUP)
        w3h = hi16.reshape(o - o_main, p, GROUP)
        dpl = jnp.einsum("bpk,opk->bpo", x3l, w3l).astype(jnp.float32)
        dph = jnp.einsum("bpk,opk->bpo", x3h, w3h).astype(jnp.float32) / 16.0
        se_t = scales[o_main:].astype(jnp.float32)[:, 0::2]
        so_t = scales[o_main:].astype(jnp.float32)[:, 1::2]
        tail = (jnp.einsum("bpo,op->bo", dpl, se_t)
                + jnp.einsum("bpo,op->bo", dph, so_t))
        parts.append(tail * sx[:b])
    y = parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=-1)
    return y + y_bias


def _kernel_stacked(pps, l_ref, x_lo_ref, x_hi_ref, sx_ref, wp_ref, se_ref,
                    so_ref, out_ref):
    import jax.experimental.pallas as pl

    k = pl.program_id(1)

    @pl.when(k == 0)
    def _init():
        out_ref[:, :] = jnp.zeros_like(out_ref)

    wp = wp_ref[0]
    lo = wp & 15
    hi16 = wp & (-16)
    acc = jnp.zeros(out_ref.shape, jnp.float32)
    for pp in range(pps):
        sl = slice(pp * GROUP, (pp + 1) * GROUP)
        dlo = jax.lax.dot_general(
            x_lo_ref[:, sl], lo[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)
        dhi = jax.lax.dot_general(
            x_hi_ref[:, sl], hi16[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)
        acc += (dlo.astype(jnp.float32) * se_ref[pp, :][None, :]
                + dhi.astype(jnp.float32) * so_ref[pp, :][None, :])
    out_ref[:, :] += acc * sx_ref[:, :]


@functools.partial(jax.jit,
                   static_argnames=("block_o", "pairs_per_step", "interpret"))
def w4a8_matmul_stacked(x: jax.Array, wp_st: jax.Array, scales: jax.Array,
                        biases: jax.Array, layer: jax.Array,
                        block_o: int | None = None,
                        pairs_per_step: int = 24,
                        interpret: bool = False) -> jax.Array:
    """x (B, I) · layer `layer` of stacked pair-packed int4 (L, O, I/2).

    The layer index rides Pallas scalar prefetch so a lax.scan over layer
    indices streams the packed weights straight from the stacked HBM array
    (no per-step scan-slice copy — see int8_matmul_stacked). scales/biases
    are this layer's (O, G) slices (small; sliced outside).
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, i = x.shape
    _, o, _ = wp_st.shape
    g = i // GROUP
    p = i // PAIR
    pps = _pick_pps(p, pairs_per_step)

    xq, sx = quantize_rows(x)
    x_lo, x_hi = split_activations(xq)
    xsum = x.astype(jnp.float32).reshape(b, g, GROUP).sum(-1)
    y_bias = jax.lax.dot_general(xsum, biases.astype(jnp.float32),
                                 (((1,), (1,)), ((), ())),
                                 precision=jax.lax.Precision.HIGHEST)
    s_odd = scales.astype(jnp.float32)[..., 1::2]
    xqsum_odd = x_hi.astype(jnp.float32).reshape(b, p, GROUP).sum(-1)
    y_bias += 8.0 * sx * jax.lax.dot_general(
        xqsum_odd, s_odd, (((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST)

    b_pad = -(-b // SUBLANE_I8) * SUBLANE_I8
    if b_pad != b:
        x_lo = jnp.pad(x_lo, ((0, b_pad - b), (0, 0)))
        x_hi = jnp.pad(x_hi, ((0, b_pad - b), (0, 0)))
        sx = jnp.pad(sx, ((0, b_pad - b), (0, 0)))

    if block_o is None:
        # half budget: the scalar-prefetch pipeline buffers more deeply
        # than the plain kernel (see int8_matmul_stacked)
        cap = 2048
        while cap > 256 and cap * i // 2 > VMEM_BUDGET // 2:
            cap //= 2
        block_o = next((cand for cand in range(cap, 255, -128)
                        if o % cand == 0), cap)
    assert pps and o % block_o == 0, (o, block_o, pps)
    kb = pps * GROUP
    se = scales.astype(jnp.float32)[:, 0::2].T
    so = (s_odd * (1.0 / 16.0)).T
    pps_pad = -(-pps // 8) * 8
    if pps_pad != pps:
        assert p // pps == 1, (p, pps)
        se = jnp.pad(se, ((0, pps_pad - pps), (0, 0)))
        so = jnp.pad(so, ((0, pps_pad - pps), (0, 0)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(o // block_o, p // pps),
        in_specs=[
            pl.BlockSpec((b_pad, kb), lambda ob, k, l: (0, k)),
            pl.BlockSpec((b_pad, kb), lambda ob, k, l: (0, k)),
            pl.BlockSpec((b_pad, 1), lambda ob, k, l: (0, 0)),
            pl.BlockSpec((1, block_o, kb), lambda ob, k, l: (l[0], ob, k)),
            pl.BlockSpec((pps_pad, block_o), lambda ob, k, l: (k, ob)),
            pl.BlockSpec((pps_pad, block_o), lambda ob, k, l: (k, ob)),
        ],
        out_specs=pl.BlockSpec((b_pad, block_o), lambda ob, k, l: (0, ob)),
    )
    out = pl.pallas_call(
        functools.partial(_kernel_stacked, pps),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b_pad, o), jnp.float32),
        interpret=interpret,
    )(jnp.asarray(layer, jnp.int32).reshape(1), x_lo, x_hi, sx, wp_st, se, so)
    return out[:b] + y_bias


# ------------------------------------------------------------ super-group

SUPER = 4 * GROUP  # 256 columns share one f32 scale in the k=128 variant


def requantize_w4a8_sg(scales: np.ndarray, biases: np.ndarray,
                       q: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Group-affine int4 (codes q (O, I) in [0,16), scales/biases (O, G)) →
    super-group layout: (packed int8 (O, I/2), f32 scales (O, I/SUPER)).

    Each 256-column super-group is recoded as SIGNED int4 against one
    shared scale S = max(w_max/7, −w_min/8): w ≈ S·c with c ∈ [−8, 7].
    Since adjacent groups' ranges are typically within ~2× of each other,
    the effective step is ~2-4× the original group-64 step — the accuracy
    cost of doubling the MXU contraction depth (k=64 → k=128 per
    nibble-plane dot; VERDICT r2 #6). Byte 64p+j packs col 128p+j's code
    BIASED by +8 in the low nibble (extract (b&15) = c+8; the −8 folds
    into an f32 GEMM on activation sums) and col 128p+64+j's SIGNED code
    in the high nibble (extract (b&−16) = 16·c exactly, mod-256)."""
    o, i = q.shape
    assert i % SUPER == 0, i
    w = (q.astype(np.float32).reshape(o, -1, GROUP)
         * scales.astype(np.float32)[..., None]
         + biases.astype(np.float32)[..., None]).reshape(o, i)
    wsg = w.reshape(o, i // SUPER, SUPER)
    s = np.maximum(np.maximum(wsg.max(-1) / 7.0, wsg.min(-1) / -8.0), 1e-8)
    c = np.clip(np.round(wsg / s[..., None]), -8, 7).reshape(o, i)
    g3 = c.reshape(o, i // PAIR, PAIR).astype(np.int64)
    lo = (g3[..., :GROUP] + 8) & 15
    hi = g3[..., GROUP:] & 15
    packed = (lo | (hi << 4)).astype(np.uint8).astype(np.int8)
    return packed.reshape(o, i // 2), s.astype(np.float32)


def dequantize_w4a8_sg(p: dict) -> jax.Array:
    """Super-group dict → (..., O, I) f32 (prefill / CPU fallback)."""
    wp = p["weight_q4s"]
    *lead, o, half = wp.shape
    npair = half // GROUP
    lo = ((wp & 15) - 8).astype(jnp.float32).reshape(*lead, o, npair, GROUP)
    hi = ((wp & (-16)).astype(jnp.int8).astype(jnp.float32)
          / 16.0).reshape(*lead, o, npair, GROUP)
    # pair p: lo = cols 128p..+64, hi = cols 128p+64..+128
    c = jnp.concatenate([lo, hi], axis=-1).reshape(*lead, o, half * 2)
    s = jnp.repeat(p["scales_sg"].astype(jnp.float32), SUPER, axis=-1)
    return c * s


def _kernel_sg(sgs, x_lo_ref, x_hi_ref, sx_ref, wp_ref, s_ref, out_ref):
    import jax.experimental.pallas as pl

    k = pl.program_id(1)

    @pl.when(k == 0)
    def _init():
        out_ref[:, :] = jnp.zeros_like(out_ref)

    wp = wp_ref[:, :]
    lo = wp & 15  # c_even + 8
    hi16 = wp & (-16)  # 16 · c_odd (signed, exact mod 256)
    acc = jnp.zeros(out_ref.shape, jnp.float32)
    for sg in range(sgs):
        sl = slice(sg * 2 * GROUP, (sg + 1) * 2 * GROUP)  # k = 128
        dlo = jax.lax.dot_general(
            x_lo_ref[:, sl], lo[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)
        dhi = jax.lax.dot_general(
            x_hi_ref[:, sl], hi16[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)
        acc += ((dlo.astype(jnp.float32)
                 + dhi.astype(jnp.float32) * 0.0625)
                * s_ref[sg, :][None, :])
    out_ref[:, :] += acc * sx_ref[:, :]


def _sg_bias(x, xq, sx, scales_sg):
    """The folded −8 lo-plane correction: −8·sx·Σ_s S[o,s]·Σ_{even cols of
    s} xq — an f32 GEMM on int8-activation even-column sums."""
    b, i = x.shape
    x_lo, _ = split_activations(xq)
    xlo_sum = x_lo.astype(jnp.float32).reshape(b, i // SUPER, 2 * GROUP).sum(-1)
    return -8.0 * sx * jax.lax.dot_general(
        xlo_sum, scales_sg.astype(jnp.float32), (((1,), (1,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST)


@functools.partial(jax.jit,
                   static_argnames=("block_o", "supers_per_step", "interpret"))
def w4a8_sg_matmul(x: jax.Array, wp: jax.Array, scales_sg: jax.Array,
                   block_o: int | None = None, supers_per_step: int = 12,
                   interpret: bool = False) -> jax.Array:
    """x (B, I) float · super-group signed-int4 (O, I) → (B, O) f32.

    Twice the MXU contraction depth of w4a8_matmul (k=128 per nibble-plane
    dot) at the cost of super-group-256 scale resolution."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, i = x.shape
    o = wp.shape[0]
    ns = i // SUPER
    sgs = _pick_sgs(ns, supers_per_step)

    xq, sx = quantize_rows(x)
    x_lo, x_hi = split_activations(xq)
    y_bias = _sg_bias(x, xq, sx, scales_sg)

    b_pad = -(-b // SUBLANE_I8) * SUBLANE_I8
    if b_pad != b:
        x_lo = jnp.pad(x_lo, ((0, b_pad - b), (0, 0)))
        x_hi = jnp.pad(x_hi, ((0, b_pad - b), (0, 0)))
        sx = jnp.pad(sx, ((0, b_pad - b), (0, 0)))

    if block_o is None:
        cap = 2048
        while cap > 256 and cap * i // 2 > VMEM_BUDGET:
            cap //= 2
        block_o = next((cand for cand in range(cap, 255, -128)
                        if o % cand == 0), cap)
    assert sgs and o % block_o == 0, (o, block_o, sgs)
    kb = sgs * 2 * GROUP
    s_pl = scales_sg.astype(jnp.float32).T  # (NS, O)
    sgs_pad = -(-sgs // 8) * 8
    if sgs_pad != sgs:
        assert ns // sgs == 1, (ns, sgs)
        s_pl = jnp.pad(s_pl, ((0, sgs_pad - sgs), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_kernel_sg, sgs),
        out_shape=jax.ShapeDtypeStruct((b_pad, o), jnp.float32),
        grid=(o // block_o, ns // sgs),
        in_specs=[
            pl.BlockSpec((b_pad, kb), lambda ob, k: (0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b_pad, kb), lambda ob, k: (0, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b_pad, 1), lambda ob, k: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_o, kb), lambda ob, k: (ob, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((sgs_pad, block_o), lambda ob, k: (k, ob),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b_pad, block_o), lambda ob, k: (0, ob),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x_lo, x_hi, sx, wp, s_pl)
    return out[:b] + y_bias


def _kernel_sg_stacked(sgs, l_ref, x_lo_ref, x_hi_ref, sx_ref, wp_ref,
                       s_ref, out_ref):
    import jax.experimental.pallas as pl

    k = pl.program_id(1)

    @pl.when(k == 0)
    def _init():
        out_ref[:, :] = jnp.zeros_like(out_ref)

    wp = wp_ref[0]
    lo = wp & 15
    hi16 = wp & (-16)
    acc = jnp.zeros(out_ref.shape, jnp.float32)
    for sg in range(sgs):
        sl = slice(sg * 2 * GROUP, (sg + 1) * 2 * GROUP)
        dlo = jax.lax.dot_general(
            x_lo_ref[:, sl], lo[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)
        dhi = jax.lax.dot_general(
            x_hi_ref[:, sl], hi16[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)
        acc += ((dlo.astype(jnp.float32)
                 + dhi.astype(jnp.float32) * 0.0625)
                * s_ref[sg, :][None, :])
    out_ref[:, :] += acc * sx_ref[:, :]


@functools.partial(jax.jit,
                   static_argnames=("block_o", "supers_per_step", "interpret"))
def w4a8_sg_matmul_stacked(x: jax.Array, wp_st: jax.Array,
                           scales_sg: jax.Array, layer: jax.Array,
                           block_o: int | None = None,
                           supers_per_step: int = 12,
                           interpret: bool = False) -> jax.Array:
    """Scalar-prefetch layer-indexed variant (scan serving path)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, i = x.shape
    _, o, _ = wp_st.shape
    ns = i // SUPER
    sgs = _pick_sgs(ns, supers_per_step)

    xq, sx = quantize_rows(x)
    x_lo, x_hi = split_activations(xq)
    y_bias = _sg_bias(x, xq, sx, scales_sg)

    b_pad = -(-b // SUBLANE_I8) * SUBLANE_I8
    if b_pad != b:
        x_lo = jnp.pad(x_lo, ((0, b_pad - b), (0, 0)))
        x_hi = jnp.pad(x_hi, ((0, b_pad - b), (0, 0)))
        sx = jnp.pad(sx, ((0, b_pad - b), (0, 0)))

    if block_o is None:
        cap = 2048
        while cap > 256 and cap * i // 2 > VMEM_BUDGET // 2:
            cap //= 2
        block_o = next((cand for cand in range(cap, 255, -128)
                        if o % cand == 0), cap)
    assert sgs and o % block_o == 0, (o, block_o, sgs)
    kb = sgs * 2 * GROUP
    s_pl = scales_sg.astype(jnp.float32).T
    sgs_pad = -(-sgs // 8) * 8
    if sgs_pad != sgs:
        assert ns // sgs == 1, (ns, sgs)
        s_pl = jnp.pad(s_pl, ((0, sgs_pad - sgs), (0, 0)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(o // block_o, ns // sgs),
        in_specs=[
            pl.BlockSpec((b_pad, kb), lambda ob, k, l: (0, k)),
            pl.BlockSpec((b_pad, kb), lambda ob, k, l: (0, k)),
            pl.BlockSpec((b_pad, 1), lambda ob, k, l: (0, 0)),
            pl.BlockSpec((1, block_o, kb), lambda ob, k, l: (l[0], ob, k)),
            pl.BlockSpec((sgs_pad, block_o), lambda ob, k, l: (k, ob)),
        ],
        out_specs=pl.BlockSpec((b_pad, block_o), lambda ob, k, l: (0, ob)),
    )
    out = pl.pallas_call(
        functools.partial(_kernel_sg_stacked, sgs),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b_pad, o), jnp.float32),
        interpret=interpret,
    )(jnp.asarray(layer, jnp.int32).reshape(1), x_lo, x_hi, sx, wp_st, s_pl)
    return out[:b] + y_bias


def _pick_sgs(ns: int, target: int) -> int:
    """Largest divisor of ns ≤ target, multiple of 8 (f32 sublane tile for
    the streamed scale plane); or ns itself when small (padded plane)."""
    for cand in range(min(ns, target), 7, -1):
        if ns % cand == 0 and cand % 8 == 0:
            return cand
    if ns <= max(target, 8):
        return ns
    return 0


def sg_supported(x: jax.Array, p_or_w) -> bool:
    try:
        if jax.default_backend() not in ("tpu", "axon"):
            return False
    except Exception:
        return False
    if x.ndim != 2:
        return False
    i = x.shape[-1]
    w = p_or_w["weight_q4s"] if isinstance(p_or_w, dict) else p_or_w
    if not (i % SUPER == 0 and w.shape[-1] * 2 == i
            and _pick_sgs(i // SUPER, 12) > 0):
        return False
    o = w.shape[-2]
    cap = 2048
    while cap > 256 and cap * i // 2 > VMEM_BUDGET // 2:
        cap //= 2
    return any(o % cand == 0 for cand in range(cap, 255, -128))


def supported_stacked(x: jax.Array, wp_st) -> bool:
    i = x.shape[-1]
    if not (x.ndim == 2 and i % PAIR == 0
            and wp_st.shape[-1] * 2 == i
            and _pick_pps(i // PAIR, 24) > 0):
        return False
    try:
        if jax.default_backend() not in ("tpu", "axon"):
            return False
    except Exception:
        return False
    o = wp_st.shape[-2]
    cap = 2048
    while cap > 256 and cap * i // 2 > VMEM_BUDGET // 2:  # matches kernel
        cap //= 2
    return any(o % cand == 0 for cand in range(cap, 255, -128))


def supported(x: jax.Array, p: dict) -> bool:
    try:
        if jax.default_backend() not in ("tpu", "axon"):
            return False
    except Exception:
        return False
    if x.ndim != 2 or "weight_q4p" not in p:
        return False
    i = x.shape[-1]
    return (i % PAIR == 0
            and p["weight_q4p"].shape[-1] * 2 == i
            and _pick_pps(i // PAIR, 24) > 0)
