"""Weight-only group-affine quantization (MLX checkpoint format).

The reference loads mlx-community 4/8-bit checkpoints whose linear weights
are packed uint32 with per-group scales/biases (group 64, affine:
w = scale * q + bias — package/STT/Whisper/WhisperModel.swift:190-196).
This module unpacks/packs that exact format so those checkpoints load
directly, and provides the dequantizing matmul used by nn.layers.linear
when a param dict carries quantized leaves.

Param-dict convention (all leaves are arrays, so trees stack cleanly for
lax.scan-over-layers): {"weight_q4" | "weight_q8": packed uint32 (O, I/per),
"scales": (O, I/G), "biases": (O, I/G)} — bit width lives in the key name,
group size G is inferred from the shapes.

The XLA path dequantizes then matmuls (XLA fuses the dequant into the GEMM
prologue); a fused Pallas kernel can replace quantized_linear for decode
shapes where HBM bandwidth on the weight matrix dominates.
"""

from __future__ import annotations

import re

import jax
import jax.numpy as jnp
import numpy as np

QKEYS = ("weight_q4", "weight_q8", "weight_i8", "weight_q4p", "weight_q4s")

_fallback_warned: set = set()


def _warn_kernel_fallback(exc: Exception) -> None:
    # once per DISTINCT failure, not once per process: a decoder-kernel
    # fallback early in a run must not silence a later, different encoder
    # probe failure (that hid the bench int8 encoder running the glue path)
    key = f"{type(exc).__name__}: {exc}"
    if key in _fallback_warned:
        return
    _fallback_warned.add(key)
    from tpu_audio.utils.logging import get_logger

    get_logger().warning(
        "fused Pallas kernel failed (%s); falling back to the unfused "
        "path for this process", key)


def is_quantized(p: dict) -> bool:
    return any(k in p for k in QKEYS)


def unpack_uint32(packed: jax.Array, bits: int) -> jax.Array:
    """(O, I*bits/32) uint32 → (O, I) int32 values in [0, 2^bits)."""
    per = 32 // bits
    shifts = jnp.arange(per, dtype=jnp.uint32) * bits
    vals = (packed[..., None] >> shifts) & ((1 << bits) - 1)
    return vals.reshape(*packed.shape[:-1], packed.shape[-1] * per).astype(jnp.int32)


def pack_uint32(vals: np.ndarray, bits: int) -> np.ndarray:
    per = 32 // bits
    vals = vals.astype(np.uint32).reshape(*vals.shape[:-1], -1, per)
    shifts = (np.arange(per, dtype=np.uint32) * bits)[None, None]
    return (vals << shifts).sum(axis=-1, dtype=np.uint32)


def dequantize(p: dict) -> jax.Array:
    """Quantized param dict → (O, I) float32 weight."""
    if "weight_i8" in p:
        return dequantize_int8(p)
    if "weight_q4p" in p:
        return dequantize_w4a8(p)
    if "weight_q4s" in p:
        return dequantize_w4a8_sg(p)
    bits = 4 if "weight_q4" in p else 8
    packed = p["weight_q4"] if bits == 4 else p["weight_q8"]
    q = unpack_uint32(packed, bits).astype(jnp.float32)
    o, i = q.shape[-2:]
    group = i // p["scales"].shape[-1]
    scales = jnp.repeat(p["scales"].astype(jnp.float32), group, axis=-1)
    biases = jnp.repeat(p["biases"].astype(jnp.float32), group, axis=-1)
    return q * scales + biases


def dequantize_rows(p: dict, ids: jax.Array) -> jax.Array:
    """Gather-then-dequantize for quantized embedding tables: unpacks only
    the gathered rows instead of the whole table."""
    if "weight_i8" in p:
        return (p["weight_i8"][ids].astype(jnp.float32)
                * p["scale_i8"][ids])
    if "weight_q4p" in p:
        return dequantize_w4a8({**p, "weight_q4p": p["weight_q4p"][ids],
                                "scales": p["scales"][ids],
                                "biases": p["biases"][ids]})
    bits = 4 if "weight_q4" in p else 8
    packed = (p["weight_q4"] if bits == 4 else p["weight_q8"])[ids]
    q = unpack_uint32(packed, bits).astype(jnp.float32)
    group = q.shape[-1] // p["scales"].shape[-1]
    scales = jnp.repeat(p["scales"][ids].astype(jnp.float32), group, axis=-1)
    biases = jnp.repeat(p["biases"][ids].astype(jnp.float32), group, axis=-1)
    return q * scales + biases


def expand_for_kernel(p: dict) -> dict:
    """Attach word-resolution bf16 scale/bias leaves so the fused Pallas
    dequant-matmul (ops/pallas/quant_matmul.py) can run without an
    in-kernel interleaved repeat. Call once at load time."""
    # The kernel now expands group→word resolution IN-KERNEL via a tiny
    # MXU matmul with a 0/1 expansion matrix, so checkpoint-resolution
    # scales stream from HBM untouched (0.625 B per int4 weight total).
    return dict(p)


def quantized_linear(p: dict, x: jax.Array) -> jax.Array:
    if "weight_i8" in p or "weight_i8_stacked" in p:
        return int8_linear(p, x)
    if "weight_q4s" in p or "weight_q4s_stacked" in p:
        return w4a8_sg_linear(p, x)
    if "weight_q4p" in p or "weight_q4p_stacked" in p:
        return w4a8_linear(p, x)
    lead = x.shape[:-1]
    rows = int(np.prod(lead)) if lead else 1
    # the fused kernel is weight-streaming-optimal; for big GEMMs (prefill)
    # XLA's dequant+matmul reads weights once anyway and tiles the MXU better
    if rows <= 32:
        try:
            from tpu_audio.ops.pallas import quant_matmul as qmm

            x2 = x.reshape(rows, x.shape[-1])
            if qmm.supported(x2, p):
                bits = 4 if "weight_q4" in p else 8
                y = qmm.quant_matmul(
                    x2, p["weight_q4" if bits == 4 else "weight_q8"],
                    p["scales"], p["biases"], bits=bits).astype(x.dtype)
                y = y.reshape(*lead, y.shape[-1])
                if "bias" in p:
                    y = y + p["bias"].astype(x.dtype)
                return y
        except Exception as exc:  # VMEM OOM / Mosaic lowering failure
            _warn_kernel_fallback(exc)
    w = dequantize(p).astype(x.dtype)
    y = x @ w.T
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


# ---------------------------------------------------------------- W4A8

def repack_w4a8(p: dict) -> dict:
    """Group-affine q4 dict (mlx packed uint32) → W4A8 kernel layout:
    {"weight_q4p": int8 (..., O, I/2) group-packed nibbles,
     "scales"/"biases": (..., O, G) f32}. Lossless repack (host, load time):
    the int4 codes and group scales are byte-identical to the checkpoint's."""
    from tpu_audio.ops.pallas.w4a8_matmul import pack_w4a8

    q = np.asarray(unpack_uint32(jnp.asarray(p["weight_q4"]), 4))
    *lead, o, i = q.shape
    packed = pack_w4a8(q.reshape(-1, i)).reshape(*lead, o, i // 2)
    out = {"weight_q4p": jnp.asarray(packed),
           "scales": jnp.asarray(p["scales"], jnp.float32),
           "biases": jnp.asarray(p["biases"], jnp.float32)}
    if "bias" in p:
        out["bias"] = p["bias"]
    return out


def dequantize_w4a8(p: dict) -> jax.Array:
    """W4A8 pair-packed dict → (..., O, I) float32 (prefill / fallback)."""
    from tpu_audio.ops.pallas.w4a8_matmul import GROUP

    wp = p["weight_q4p"]
    *lead, o, half = wp.shape
    g = half * 2 // GROUP
    np_ = half // GROUP  # group-pairs
    lo = (wp & 15).astype(jnp.float32).reshape(*lead, o, np_, GROUP)
    # high nibble is stored biased by −8 (arithmetic >> 4 sign-extends the
    # stored (h−8), so +8 recovers the code)
    hi = ((wp >> 4) + 8).astype(jnp.float32).reshape(*lead, o, np_, GROUP)
    # pair p: lo = group 2p (cols 128p..128p+64), hi = group 2p+1 — the
    # concat along the last axis restores natural column order
    q = jnp.concatenate([lo, hi], axis=-1).reshape(*lead, o, g, GROUP)
    s = p["scales"].astype(jnp.float32)[..., None]
    b = p["biases"].astype(jnp.float32)[..., None]
    return (q * s + b).reshape(*lead, o, half * 2)


def w4a8_linear(p: dict, x: jax.Array) -> jax.Array:
    if "weight_q4p_stacked" in p:
        lead = x.shape[:-1]
        rows = int(np.prod(lead)) if lead else 1
        x2 = x.reshape(rows, x.shape[-1])
        wp_st = p["weight_q4p_stacked"]
        if rows <= 32:
            try:
                from tpu_audio.ops.pallas import w4a8_matmul as w4mm

                if w4mm.supported_stacked(x2, wp_st):
                    y = w4mm.w4a8_matmul_stacked(
                        x2, wp_st, p["scales"], p["biases"],
                        p["layer_idx"]).astype(x.dtype)
                    y = y.reshape(*lead, y.shape[-1])
                    if "bias" in p:
                        y = y + p["bias"].astype(x.dtype)
                    return y
            except Exception as exc:
                _warn_kernel_fallback(exc)
        sliced = {k: v for k, v in p.items()
                  if k not in ("weight_q4p_stacked", "layer_idx")}
        sliced["weight_q4p"] = jax.lax.dynamic_index_in_dim(
            wp_st, p["layer_idx"], 0, keepdims=False)
        return w4a8_linear(sliced, x)
    lead = x.shape[:-1]
    rows = int(np.prod(lead)) if lead else 1
    x2 = x.reshape(rows, x.shape[-1])
    if rows <= 32:
        try:
            from tpu_audio.ops.pallas import w4a8_matmul as w4mm

            if w4mm.supported(x2, p):
                y = w4mm.w4a8_matmul(x2, p["weight_q4p"], p["scales"],
                                     p["biases"]).astype(x.dtype)
                y = y.reshape(*lead, y.shape[-1])
                if "bias" in p:
                    y = y + p["bias"].astype(x.dtype)
                return y
        except Exception as exc:
            _warn_kernel_fallback(exc)
    w = dequantize_w4a8(p).astype(x.dtype)
    y = x2 @ w.T
    y = y.reshape(*lead, y.shape[-1])
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


# ----------------------------------------------------- W4A8 super-group

def requantize_w4a8_sg(p: dict) -> dict:
    """Group-affine q4 dict → super-group signed-int4 serving layout
    {"weight_q4s" int8 (..., O, I/2), "scales_sg" (..., O, I/256) f32}.

    Doubles the W4A8 kernel's MXU contraction depth (k=64 → 128 per
    nibble-plane dot) by sharing one f32 scale across 256 columns; the
    recode is LOSSY: ~2× coarser step than the checkpoint's group-64
    affine, costing ≤3× the int4 quantization error itself (weight-vs-
    float cosine ~0.99 vs ~0.995 on gaussian statistics — see
    tests/test_pallas_kernels.py::TestW4A8SuperGroup). Host-side, load
    time; keep repack_tree_w4a8 where byte-exactness matters."""
    from tpu_audio.ops.pallas.w4a8_matmul import requantize_w4a8_sg as rq

    q = np.asarray(unpack_uint32(jnp.asarray(p["weight_q4"]), 4))
    *lead, o, i = q.shape
    scales = np.asarray(p["scales"], np.float32).reshape(-1, o,
                                                         q.shape[-1] // 64)
    biases = np.asarray(p["biases"], np.float32).reshape(scales.shape)
    q2 = q.reshape(-1, o, i)
    packed, ssg = zip(*[rq(scales[l], biases[l], q2[l])
                        for l in range(q2.shape[0])])
    out = {"weight_q4s": jnp.asarray(np.stack(packed).reshape(*lead, o,
                                                              i // 2)),
           "scales_sg": jnp.asarray(np.stack(ssg).reshape(*lead, o,
                                                          i // 256))}
    if "bias" in p:
        out["bias"] = p["bias"]
    return out


def dequantize_w4a8_sg(p: dict) -> jax.Array:
    from tpu_audio.ops.pallas.w4a8_matmul import dequantize_w4a8_sg as dq

    return dq(p)


def w4a8_sg_linear(p: dict, x: jax.Array) -> jax.Array:
    from tpu_audio.ops.pallas import w4a8_matmul as w4mm

    lead = x.shape[:-1]
    rows = int(np.prod(lead)) if lead else 1
    x2 = x.reshape(rows, x.shape[-1])
    import os

    sps = int(os.environ.get("TPU_AUDIO_SG_SPS", "12"))
    if "weight_q4s_stacked" in p:
        wp_st = p["weight_q4s_stacked"]
        if rows <= 32:
            try:
                if w4mm.sg_supported(x2, wp_st):
                    y = w4mm.w4a8_sg_matmul_stacked(
                        x2, wp_st, p["scales_sg"],
                        p["layer_idx"], supers_per_step=sps).astype(x.dtype)
                    y = y.reshape(*lead, y.shape[-1])
                    if "bias" in p:
                        y = y + p["bias"].astype(x.dtype)
                    return y
            except Exception as exc:
                _warn_kernel_fallback(exc)
        sliced = {k: v for k, v in p.items()
                  if k not in ("weight_q4s_stacked", "layer_idx")}
        sliced["weight_q4s"] = jax.lax.dynamic_index_in_dim(
            wp_st, p["layer_idx"], 0, keepdims=False)
        return w4a8_sg_linear(sliced, x)
    if rows <= 32:
        try:
            if w4mm.sg_supported(x2, p):
                y = w4mm.w4a8_sg_matmul(x2, p["weight_q4s"],
                                        p["scales_sg"]).astype(x.dtype)
                y = y.reshape(*lead, y.shape[-1])
                if "bias" in p:
                    y = y + p["bias"].astype(x.dtype)
                return y
        except Exception as exc:
            _warn_kernel_fallback(exc)
    w = dequantize_w4a8_sg(p).astype(x.dtype)
    y = x2 @ w.T
    y = y.reshape(*lead, y.shape[-1])
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def requantize_tree_w4a8_sg(tree: dict, fuse: bool = True) -> dict:
    """Convert every group-affine q4 leaf-dict to the super-group k=128
    serving layout (narrow leaves keep the q4 fused-dequant path; q8/fp
    pass through). The exact-repack W4A8 layout (repack_tree_w4a8) remains
    the lossless alternative."""
    if not isinstance(tree, dict):
        return tree
    if "weight_q4" in tree:
        if (tree["weight_q4"].shape[-1] * 8) % 256 == 0:
            return requantize_w4a8_sg(tree)
        return tree
    out = {k: requantize_tree_w4a8_sg(v, fuse=False) if isinstance(v, dict)
           else v for k, v in tree.items()}
    return fuse_w4a8_sg_tree(out) if fuse else out


def fuse_w4a8_sg_tree(tree: dict) -> dict:
    """Fuse q/k/v → qkv and gate/up → gateup super-group leaves (output-
    channel concat is exact)."""
    if not isinstance(tree, dict):
        return tree

    def all_q4s(names, d):
        return all(n in d and isinstance(d[n], dict)
                   and "weight_q4s" in d[n] for n in names)

    def cat(ds):
        out = {k: jnp.concatenate([d[k] for d in ds], axis=-2)
               for k in ("weight_q4s", "scales_sg")}
        if all("bias" in d for d in ds):
            out["bias"] = jnp.concatenate([d["bias"] for d in ds], axis=-1)
        return out

    out = {}
    for k, v in tree.items():
        if k == "attn" and all_q4s(("q", "k", "v"), v):
            nv = {kk: vv for kk, vv in v.items() if kk not in ("q", "k", "v")}
            nv["qkv"] = cat([v["q"], v["k"], v["v"]])
            out[k] = nv
        elif k == "mlp" and all_q4s(("gate", "up"), v):
            nv = {kk: vv for kk, vv in v.items() if kk not in ("gate", "up")}
            nv["gateup"] = cat([v["gate"], v["up"]])
            out[k] = nv
        elif isinstance(v, dict):
            out[k] = fuse_w4a8_sg_tree(v)
        else:
            out[k] = v
    return out


def repack_tree_w4a8(tree: dict, fuse: bool = True) -> dict:
    """Convert every group-affine q4 leaf-dict to the W4A8 serving layout
    (q8 and fp leaves pass through). Losslessly preserves the checkpoint's
    group-64 affine quantization, unlike requantize_tree_int8."""
    if not isinstance(tree, dict):
        return tree
    if "weight_q4" in tree:
        # pair packing needs in_features % 128; narrower leaves keep the
        # group-affine q4 layout (fused dequant kernel path)
        if (tree["weight_q4"].shape[-1] * 8) % 128 == 0:
            return repack_w4a8(tree)
        return tree
    out = {k: repack_tree_w4a8(v, fuse=False) if isinstance(v, dict) else v
           for k, v in tree.items()}
    return fuse_w4a8_tree(out) if fuse else out


def fuse_w4a8_tree(tree: dict) -> dict:
    """Fuse q/k/v → qkv and gate/up → gateup W4A8 leaves (output-channel
    concat of packed weights and group scales/biases is exact)."""
    if not isinstance(tree, dict):
        return tree

    def all_q4p(names, d):
        return all(n in d and isinstance(d[n], dict)
                   and "weight_q4p" in d[n] for n in names)

    def cat(ds):
        out = {k: jnp.concatenate([d[k] for d in ds], axis=-2)
               for k in ("weight_q4p", "scales", "biases")}
        if all("bias" in d for d in ds):
            out["bias"] = jnp.concatenate([d["bias"] for d in ds], axis=-1)
        return out

    out = {}
    for k, v in tree.items():
        if k == "attn" and all_q4p(("q", "k", "v"), v):
            nv = {kk: vv for kk, vv in v.items() if kk not in ("q", "k", "v")}
            nv["qkv"] = cat([v["q"], v["k"], v["v"]])
            out[k] = nv
        elif k == "mlp" and all_q4p(("gate", "up"), v):
            nv = {kk: vv for kk, vv in v.items() if kk not in ("gate", "up")}
            nv["gateup"] = cat([v["gate"], v["up"]])
            out[k] = nv
        elif isinstance(v, dict):
            out[k] = fuse_w4a8_tree(v)
        else:
            out[k] = v
    return out


# ---------------------------------------------------------------- int8 (W8A8)

def quantize_array_int8(w: np.ndarray) -> dict:
    """fp weight (O, I) → per-output-channel symmetric int8 dict
    {"weight_i8" (O, I) int8, "scale_i8" (O, 1) f32} for the MXU-native
    W8A8 decode kernel (ops/pallas/int8_matmul.py)."""
    w = np.asarray(w, np.float32)
    s = np.abs(w).max(axis=-1, keepdims=True) / 127.0
    s = np.maximum(s, 1e-10)
    q = np.clip(np.round(w / s), -127, 127).astype(np.int8)
    return {"weight_i8": q, "scale_i8": s.astype(np.float32)}


def requantize_int8(p: dict) -> dict:
    """Group-affine q4/q8 dict → per-channel int8 dict (load-time, host).

    Trades the checkpoint's group-64 resolution for MXU-native int8
    serving; measured weight cosine ≥ 0.9999 on Llama-shaped statistics."""
    out = {k: jnp.asarray(v)
           for k, v in quantize_array_int8(np.asarray(dequantize(p))).items()}
    if "bias" in p:
        out["bias"] = p["bias"]
    return out


def dequantize_int8(p: dict) -> jax.Array:
    return p["weight_i8"].astype(jnp.float32) * p["scale_i8"]


def int8_linear(p: dict, x: jax.Array) -> jax.Array:
    if "weight_i8_stacked" in p:
        # scan-over-layers serving layout: the Pallas kernel indexes the
        # stacked HBM weight itself (scalar prefetch), so no scan-slice
        # copy materializes; fall back to an explicit slice elsewhere
        lead = x.shape[:-1]
        rows = int(np.prod(lead)) if lead else 1
        x2 = x.reshape(rows, x.shape[-1])
        w_st = p["weight_i8_stacked"]
        if rows <= 32:
            try:
                from tpu_audio.ops.pallas import int8_matmul as i8mm

                if i8mm.supported_stacked(x2, w_st):
                    y = i8mm.int8_matmul_stacked(
                        x2, w_st, p["scale_i8"],
                        p["layer_idx"]).astype(x.dtype)
                    y = y.reshape(*lead, y.shape[-1])
                    if "bias" in p:
                        y = y + p["bias"].astype(x.dtype)
                    return y
            except Exception as exc:
                _warn_kernel_fallback(exc)
        sliced = {k: v for k, v in p.items()
                  if k not in ("weight_i8_stacked", "layer_idx")}
        sliced["weight_i8"] = jax.lax.dynamic_index_in_dim(
            w_st, p["layer_idx"], 0, keepdims=False)
        return int8_linear(sliced, x)
    lead = x.shape[:-1]
    rows = int(np.prod(lead)) if lead else 1
    x2 = x.reshape(rows, x.shape[-1])
    if rows <= 32:
        try:
            from tpu_audio.ops.pallas import int8_matmul as i8mm

            if i8mm.supported(x2, p):
                y = i8mm.int8_matmul(x2, p["weight_i8"],
                                     p["scale_i8"]).astype(x.dtype)
                y = y.reshape(*lead, y.shape[-1])
                if "bias" in p:
                    y = y + p["bias"].astype(x.dtype)
                return y
        except Exception as exc:
            _warn_kernel_fallback(exc)
    if rows > 32 and x2.shape[-1] % 128 == 0:
        try:
            backend = jax.default_backend()
        except Exception:
            backend = "cpu"
        if backend in ("tpu", "axon"):
            # encoder / prefill shapes: true s8×s8 GEMM on the int8 MXU
            # (2× bf16 throughput). TPU-only: CPU keeps the exact-dequant
            # fallback so CPU-mesh parity tests stay bit-exact.
            from tpu_audio.ops.pallas.int8_matmul import int8_matmul_bigm

            y = int8_matmul_bigm(x2, p["weight_i8"],
                                 p["scale_i8"]).astype(x.dtype)
            y = y.reshape(*lead, y.shape[-1])
            if "bias" in p:
                y = y + p["bias"].astype(x.dtype)
            return y
    # fallback: XLA fuses the int8→fp convert + scale into the GEMM
    w = (p["weight_i8"].astype(x.dtype) * p["scale_i8"].astype(x.dtype))
    y = x2 @ w.T
    y = y.reshape(*lead, y.shape[-1])
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


_I8_SKIP = re.compile(r"(ln\w*|norm|conv\w*|pos_embed)\.weight$")


def quantize_tree_int8(tree: dict, predicate=None) -> dict:
    """Per-channel int8 version of quantize_tree (host-side, load time).

    Quantizes matmul weights (including scan-stacked (L, O, I) leaves and
    embedding tables); norms, convs and positional tables stay fp."""
    from tpu_audio.utils import pytree

    flat = pytree.flatten(tree)
    out = {}
    for k, v in flat.items():
        # ndim 3 = lax.scan-stacked (L, O, I) layer weights; the per-channel
        # absmax in quantize_array_int8 is rank-agnostic (axis=-1)
        if (k.endswith(".weight") and hasattr(v, "ndim") and v.ndim in (2, 3)
                and v.shape[-1] % 128 == 0 and v.shape[-2] >= 64
                and not _I8_SKIP.search(k)
                and (predicate is None or predicate(k, v))):
            qd = quantize_array_int8(np.asarray(v, np.float32))
            prefix = k[: -len(".weight")]
            for qk, qv in qd.items():
                out[f"{prefix}.{qk}"] = jnp.asarray(qv)
        else:
            out[k] = v
    return pytree.unflatten(out)


def requantize_tree_int8(tree: dict, fuse: bool = True) -> dict:
    """Convert every group-affine q4/q8 leaf-dict in a param tree to the
    MXU-native per-channel int8 serving format (host-side pass over the
    loaded checkpoint; works on scan-stacked (L, O, I) leaves).

    This is the fast decode path on TPU: the measured 3B decode is
    6.1 ms/token w8a8 vs 11.0 ms/token bf16 and 11.1 ms/token with the
    fused int4 kernel (VPU-unpack-bound) — see docs/BENCHMARKS.md."""
    if not isinstance(tree, dict):
        return tree
    if "weight_q4" in tree or "weight_q8" in tree:
        return requantize_int8(tree)
    out = {k: requantize_tree_int8(v, fuse=False) if isinstance(v, dict)
           else v for k, v in tree.items()}
    return fuse_int8_tree(out) if fuse else out


def fuse_int8_tree(tree: dict) -> dict:
    """Fuse q/k/v → qkv and gate/up → gateup int8 leaves (concat along the
    output-channel axis; per-channel scales concat exactly, so fused output
    is bit-identical). Fewer, larger kernel launches per decode step keep
    the weight stream saturated. nn.transformer detects the fused keys."""
    if not isinstance(tree, dict):
        return tree

    def all_i8(names, d):
        return all(n in d and isinstance(d[n], dict)
                   and "weight_i8" in d[n] for n in names)

    def cat(ds, axis=-2):
        out = {"weight_i8": jnp.concatenate([d["weight_i8"] for d in ds],
                                            axis=axis),
               "scale_i8": jnp.concatenate([d["scale_i8"] for d in ds],
                                           axis=axis)}
        if all("bias" in d for d in ds):
            out["bias"] = jnp.concatenate([d["bias"] for d in ds], axis=-1)
        return out

    out = {}
    for k, v in tree.items():
        if k == "attn" and all_i8(("q", "k", "v"), v):
            nv = {kk: vv for kk, vv in v.items() if kk not in ("q", "k", "v")}
            nv["qkv"] = cat([v["q"], v["k"], v["v"]])
            out[k] = nv
        elif k == "mlp" and all_i8(("gate", "up"), v):
            nv = {kk: vv for kk, vv in v.items()
                  if kk not in ("gate", "up")}
            nv["gateup"] = cat([v["gate"], v["up"]])
            out[k] = nv
        elif isinstance(v, dict):
            out[k] = fuse_int8_tree(v)
        else:
            out[k] = v
    return out


def quantize_array(w: np.ndarray, bits: int = 4, group: int = 64) -> dict:
    """fp weight (..., O, I) → quantized param dict (numpy leaves); lead
    dims (e.g. the scan layer axis) pass through."""
    *lead, o, i = w.shape
    assert i % group == 0, f"in_features {i} not divisible by group {group}"
    wg = w.reshape(*lead, o, i // group, group).astype(np.float32)
    wmax = wg.max(axis=-1)
    wmin = wg.min(axis=-1)
    levels = (1 << bits) - 1
    scales = np.maximum((wmax - wmin) / levels, 1e-8)
    biases = wmin
    q = np.clip(np.round((wg - biases[..., None]) / scales[..., None]),
                0, levels).astype(np.uint32)
    return {
        f"weight_q{bits}": pack_uint32(q.reshape(*lead, o, i), bits),
        "scales": scales.astype(np.float32),
        "biases": biases.astype(np.float32),
    }


def quantize_tree(tree: dict, bits: int = 4, group: int = 64,
                  predicate=None) -> dict:
    """Quantize every eligible 2-D "weight" leaf in a param tree (returns a
    new tree). predicate(path, arr) can veto individual leaves (e.g. keep
    embeddings or small projections in fp)."""
    from tpu_audio.utils import pytree

    flat = pytree.flatten(tree)
    out = {}
    for k, v in flat.items():
        if (k.endswith(".weight") and hasattr(v, "ndim") and v.ndim in (2, 3)
                and v.shape[-1] % group == 0
                and not _I8_SKIP.search(k)
                and (predicate is None or predicate(k, v))):
            qd = quantize_array(np.asarray(v, np.float32), bits, group)
            prefix = k[: -len(".weight")]
            for qk, qv in qd.items():
                out[f"{prefix}.{qk}"] = jnp.asarray(qv)
        else:
            out[k] = v
    return pytree.unflatten(out)


def expand_tree_for_kernel(tree: dict) -> dict:
    """Walk a param tree and expand every quantized leaf-dict for the fused
    kernel (works on scan-stacked (L, ...) leaves too)."""
    if not isinstance(tree, dict):
        return tree
    if is_quantized(tree):
        return expand_for_kernel(tree)
    return {k: expand_tree_for_kernel(v) if isinstance(v, dict) else v
            for k, v in tree.items()}
