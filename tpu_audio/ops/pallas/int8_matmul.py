"""W8A8 decode matmul: int8 weights × int8 activations on the MXU.

Why this kernel exists: the int4 fused kernel (quant_matmul.py) is bound by
VPU nibble-unpack (~6 vector ops per weight), which caps 3B decode at bf16
latency parity. Here there is NO per-weight vector work at all — the MXU
consumes int8 operands directly (v5e runs int8 matmuls at 2× bf16
throughput), so the kernel is a pure weight-stream at 1 byte/weight:
½ the HBM traffic of bf16 → ~2× faster decode where HBM bandwidth is the
roofline.

Quantization scheme: per-output-channel symmetric int8 weights
(w ≈ q8 · s8[o]) + per-row symmetric int8 activations (x ≈ xq · sx[b]);
y[b,o] = (Σᵢ xq·q8) · sx[b] · s8[o] with the int32 accumulation exact.
Group-affine int4/int8 checkpoints are requantized to this layout once at
load time (ops/quant.requantize_int8) — measured cosine > 0.9999 against
the exact dequant on Llama-shaped weight statistics.

The activation quantization runs in XLA outside the kernel (a few KB of
VPU work, fused), so the Pallas body is a single dot_general + rescale.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

SUBLANE_I8 = 32  # int8 min tile is (32, 128)
VMEM_BUDGET = 8 * 2 ** 20


def _kernel(xq_ref, sx_ref, w_ref, s_ref, out_ref):
    acc = jax.lax.dot_general(
        xq_ref[:, :], w_ref[:, :], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)
    out_ref[:, :] = acc.astype(jnp.float32) * sx_ref[:, :] * s_ref[:, :]


def quantize_rows(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-row symmetric int8: (B, I) float → ((B, I) int8, (B, 1) f32)."""
    xf = x.astype(jnp.float32)
    sx = jnp.max(jnp.abs(xf), axis=-1, keepdims=True) / 127.0
    sx = jnp.maximum(sx, 1e-10)
    xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    return xq, sx


@functools.partial(jax.jit, static_argnames=("block_o", "interpret"))
def int8_matmul(x: jax.Array, w_i8: jax.Array, scale: jax.Array,
                block_o: int | None = None,
                interpret: bool = False) -> jax.Array:
    """x (B, I) float · (w_i8 (O, I) int8 · scale (O, 1)).T → (B, O) f32."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, i = x.shape
    o = w_i8.shape[0]
    xq, sx = quantize_rows(x)

    b_pad = -(-b // SUBLANE_I8) * SUBLANE_I8
    if b_pad != b:
        xq = jnp.pad(xq, ((0, b_pad - b), (0, 0)))
        sx = jnp.pad(sx, ((0, b_pad - b), (0, 0)))

    if block_o is None:
        # prefer a block that divides O exactly so every row runs in the
        # kernel (the XLA tail dot below re-reads xq and w at worse layouts)
        cap = 2048
        while cap > 256 and cap * i > VMEM_BUDGET:
            cap //= 2
        block_o = next((cand for cand in range(cap, 255, -128)
                        if o % cand == 0), cap)
    # ragged tail rows (e.g. the 156940-row lm_head) run as an XLA int8 dot;
    # the Pallas grid covers only whole blocks
    o_main = (o // block_o) * block_o
    parts = []
    if o_main:
        # full w/scale operands; the grid only touches whole blocks, so no
        # prefix-slice copy of the (possibly huge) weight is materialized
        s_row = scale.reshape(1, o).astype(jnp.float32)
        out = pl.pallas_call(
            _kernel,
            out_shape=jax.ShapeDtypeStruct((b_pad, o_main), jnp.float32),
            grid=(o_main // block_o,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),  # xq: small, replicated
                pl.BlockSpec(memory_space=pltpu.VMEM),  # sx
                pl.BlockSpec((block_o, i), lambda g: (g, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, block_o), lambda g: (0, g),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((b_pad, block_o), lambda g: (0, g),
                                   memory_space=pltpu.VMEM),
            interpret=interpret,  # CPU-testable
        )(xq, sx, w_i8, s_row)
        parts.append(out[:b])
    if o_main < o:
        acc = jax.lax.dot_general(
            xq[:b], w_i8[o_main:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)
        parts.append(acc.astype(jnp.float32) * sx[:b]
                     * scale[o_main:].reshape(1, -1))
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=-1)


def _kernel_stacked(l_ref, xq_ref, sx_ref, w_ref, s_ref, out_ref):
    acc = jax.lax.dot_general(
        xq_ref[:, :], w_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32)
    out_ref[:, :] = acc.astype(jnp.float32) * sx_ref[:, :] * s_ref[:, :]


@functools.partial(jax.jit, static_argnames=("block_o", "interpret"))
def int8_matmul_stacked(x: jax.Array, w_st: jax.Array, scale: jax.Array,
                        layer: jax.Array, block_o: int | None = None,
                        interpret: bool = False) -> jax.Array:
    """x (B, I) float · layer `layer` of stacked int8 weights (L, O, I).

    The layer index rides Pallas scalar prefetch: the kernel's block
    index_map selects the layer slice of the stacked HBM array directly, so
    a lax.scan over layer indices runs copy-free. (XLA materializes a full
    HBM copy of any scan-sliced operand that feeds a custom call — this
    entry point exists to avoid exactly that on the decode hot path.)

    scale: this layer's (O, 1) f32 — small, fine to slice outside.
    """
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, i = x.shape
    _, o, _ = w_st.shape
    xq, sx = quantize_rows(x)
    b_pad = -(-b // SUBLANE_I8) * SUBLANE_I8
    if b_pad != b:
        xq = jnp.pad(xq, ((0, b_pad - b), (0, 0)))
        sx = jnp.pad(sx, ((0, b_pad - b), (0, 0)))
    if block_o is None:
        # the scalar-prefetch pipeline buffers more deeply than the plain
        # kernel (observed scoped-vmem OOM at (3072, 8192) with the full
        # budget): run at half budget
        cap = 2048
        while cap > 256 and cap * i > VMEM_BUDGET // 2:
            cap //= 2
        block_o = next((cand for cand in range(cap, 255, -128)
                        if o % cand == 0), cap)
    assert o % block_o == 0, (o, block_o)  # gated by supported_stacked
    s_row = scale.reshape(1, o).astype(jnp.float32)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(o // block_o,),
        in_specs=[
            pl.BlockSpec((b_pad, i), lambda g, l: (0, 0)),
            pl.BlockSpec((b_pad, 1), lambda g, l: (0, 0)),
            pl.BlockSpec((1, block_o, i), lambda g, l: (l[0], g, 0)),
            pl.BlockSpec((1, block_o), lambda g, l: (0, g)),
        ],
        out_specs=pl.BlockSpec((b_pad, block_o), lambda g, l: (0, g)),
    )
    out = pl.pallas_call(
        _kernel_stacked,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b_pad, o), jnp.float32),
        interpret=interpret,
    )(jnp.asarray(layer, jnp.int32).reshape(1), xq, sx, w_st, s_row)
    return out[:b]


def int8_matmul_bigm(x: jax.Array, w_i8: jax.Array,
                     scale: jax.Array) -> jax.Array:
    """Large-M W8A8 GEMM (encoder / prefill shapes): per-row int8
    activations × int8 weights through XLA's native s8×s8→s32 dot, which
    the TPU compiler tiles onto the int8 MXU at 2× bf16 throughput (v5e:
    394 vs 197 TOP/s). No Pallas needed — at M ≥ hundreds the GEMM is
    compute-bound and XLA's own tiling is already optimal; the Pallas
    kernels above exist for the small-M weight-streaming regime.

    x (M, I) float → (M, O) f32 = (xq·w_i8ᵀ) · sx · scaleᵀ (int32 exact)."""
    xq, sx = quantize_rows(x)
    acc = jax.lax.dot_general(xq, w_i8, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * sx * scale.reshape(1, -1)


def supported_stacked(x: jax.Array, w_st) -> bool:
    if not supported(x, {"weight_i8": w_st[0] if w_st.ndim == 3 else w_st}):
        return False
    o = w_st.shape[-2]
    i = x.shape[-1]
    cap = 2048
    while cap > 256 and cap * i > VMEM_BUDGET // 2:  # matches the kernel
        cap //= 2
    return any(o % cand == 0 for cand in range(cap, 255, -128))


def supported(x: jax.Array, p: dict) -> bool:
    try:
        if jax.default_backend() not in ("tpu", "axon"):
            return False
    except Exception:
        return False
    if x.ndim != 2:
        return False
    i = x.shape[-1]
    return i % 128 == 0 and p["weight_i8"].shape[-1] == i
