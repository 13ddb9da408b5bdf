"""Fused int4/int8 dequantize-matmul Pallas kernel.

XLA lowers `x @ dequant(Wq).T` by materializing the dequantized matrix in
HBM (measured slower than bf16 on v5e); this kernel reads the packed
uint32 weights plus GROUP-resolution f32 scales/biases (0.625 bytes per
int4 weight vs 2 for bf16), dequantizes blocks in VMEM, and runs the
GEMM — decode-time weight streaming at int4 bandwidth.

Two Mosaic-shaped tricks:

1. Nibble planes: packed word c of row o holds columns i = 8c..8c+7, and
   the group size 64 = 8 nibbles × 8 words means nibble plane j (columns
   j::8 → plane column c ↔ original column 8c+j) shares the SAME per-word
   scale layout for every j. The activation is pre-split into matching
   planes x[:, j::8] outside the kernel (a tiny reshape), and the kernel
   accumulates Σ_j x_j · dequant(plane_j)ᵀ.
2. In-kernel scale expansion as a matmul: Mosaic has no lane repeat, so
   group→word expansion runs as scales (O, G) @ E (G, W) with E a 0/1
   iota-comparison constant — one tiny MXU dot per block instead of
   shipping word-resolution scales from HBM (which would triple the
   side-band bytes and erase the int4 bandwidth win).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

BLOCK_O = 1024
SUBLANE = 8


def _kernel(x_planes_ref, packed_ref, scales_ref, biases_ref, out_ref, *,
            bits: int, group: int):
    per = 32 // bits  # values per u32 word
    packed = packed_ref[:, :]  # (BLOCK_O, W) uint32
    s_g = scales_ref[:, :].astype(jnp.float32)  # (BLOCK_O, G)
    b_g = biases_ref[:, :].astype(jnp.float32)

    w_words = packed.shape[1]
    g = s_g.shape[1]
    words_per_group = group // per
    # expansion matrix E[i, w] = 1 iff word w belongs to group i
    rows = jax.lax.broadcasted_iota(jnp.int32, (g, w_words), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (g, w_words), 1)
    e = (cols // words_per_group == rows).astype(jnp.float32)
    s_rep = jax.lax.dot_general(s_g, e, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    b_rep = jax.lax.dot_general(b_g, e, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)

    # NOTE: the exponent-bit int→float trick ((q | 0x4B000000) bitcast,
    # magic folded into the bias) was tried and REVERTED: s·8388608 >> s·q
    # cancels catastrophically in f32 (7% output error). The two casts are
    # the exact path; the VPU unpack remains the kernel's wall.
    acc = jnp.zeros(out_ref.shape, jnp.float32)
    for j in range(per):
        # uint32→float isn't supported in Mosaic; hop through int32
        q = ((packed >> (bits * j)) & ((1 << bits) - 1)).astype(
            jnp.int32).astype(jnp.float32)
        w = q * s_rep + b_rep  # (BLOCK_O, W)
        xj = x_planes_ref[j, :, :]  # (B, W)
        acc = acc + jax.lax.dot_general(
            xj, w, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
    out_ref[:, :] = acc


@functools.partial(jax.jit, static_argnames=("bits", "group"))
def quant_matmul(x: jax.Array, packed: jax.Array, scales: jax.Array,
                 biases: jax.Array, *, bits: int = 4,
                 group: int = 64) -> jax.Array:
    """x (B, I) · dequant(packed (O, I·bits/32))ᵀ → (B, O) float32.

    scales/biases at checkpoint GROUP resolution (O, I/group)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, i = x.shape
    o = packed.shape[0]
    per = 32 // bits
    b_pad = -(-b // SUBLANE) * SUBLANE
    # VMEM budget: packed + s_rep + b_rep + q + w live per block (~20 B/word)
    words = packed.shape[1]
    block_o = BLOCK_O
    while block_o > 128 and block_o * words * 20 > 12 * 2 ** 20:
        block_o //= 2
    o_pad = -(-o // block_o) * block_o
    if b_pad != b:
        x = jnp.pad(x, ((0, b_pad - b), (0, 0)))
    if o_pad != o:
        packed = jnp.pad(packed, ((0, o_pad - o), (0, 0)))
        scales = jnp.pad(scales, ((0, o_pad - o), (0, 0)))
        biases = jnp.pad(biases, ((0, o_pad - o), (0, 0)))

    # split activation into nibble planes: column 8c+j → plane j, column c
    x_planes = x.astype(jnp.float32).reshape(b_pad, i // per, per)
    x_planes = jnp.transpose(x_planes, (2, 0, 1))  # (per, B, W)

    kernel = functools.partial(_kernel, bits=bits, group=group)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b_pad, o_pad), jnp.float32),
        grid=(o_pad // block_o,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # x planes (small)
            pl.BlockSpec((block_o, packed.shape[1]), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_o, scales.shape[1]), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_o, biases.shape[1]), lambda g: (g, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b_pad, block_o), lambda g: (0, g),
                               memory_space=pltpu.VMEM),
    )(x_planes, packed, scales.astype(jnp.float32),
      biases.astype(jnp.float32))
    return out[:b, :o]


def supported(x: jax.Array, p: dict) -> bool:
    try:
        import jax as _jax

        if _jax.default_backend() not in ("tpu", "axon"):
            return False
    except Exception:
        return False
    if x.ndim != 2:
        return False
    bits = 4 if "weight_q4" in p else 8
    per = 32 // bits
    i = x.shape[-1]
    group = i // p["scales"].shape[-1]
    return group == 64 and i % per == 0
