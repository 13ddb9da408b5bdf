"""Functional NN primitives over param dicts.

Conventions:
  - linear weights are stored PyTorch-layout (out_features, in_features) so
    safetensors keys map 1:1; XLA picks the fast layout for `x @ w.T`.
  - all sequence tensors are channels-last (B, T, C) / (T, C) — the
    TPU-native layout (lane dim = features).
  - conv1d weights are stored (kernel, in_ch, out_ch) = WIO; loaders
    transpose from PyTorch's (out, in, k).
  - quantized linears carry {"weight_q","scales","biases"} (group-wise
    affine uint32-packed, MLX checkpoint format) and dispatch through
    ops.quant.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------- init

def init_linear(key, in_features: int, out_features: int, bias: bool = True,
                dtype=jnp.float32) -> dict:
    scale = 1.0 / math.sqrt(in_features)
    k1, k2 = jax.random.split(key)
    p = {"weight": jax.random.uniform(k1, (out_features, in_features), dtype,
                                      -scale, scale)}
    if bias:
        p["bias"] = jax.random.uniform(k2, (out_features,), dtype, -scale, scale)
    return p


def init_embedding(key, vocab: int, dim: int, dtype=jnp.float32) -> dict:
    return {"weight": jax.random.normal(key, (vocab, dim), dtype) * 0.02}


def init_norm(dim: int, bias: bool = True, dtype=jnp.float32) -> dict:
    p = {"weight": jnp.ones((dim,), dtype)}
    if bias:
        p["bias"] = jnp.zeros((dim,), dtype)
    return p


def init_conv1d(key, in_ch: int, out_ch: int, kernel: int, bias: bool = True,
                dtype=jnp.float32) -> dict:
    scale = 1.0 / math.sqrt(in_ch * kernel)
    k1, k2 = jax.random.split(key)
    p = {"weight": jax.random.uniform(k1, (kernel, in_ch, out_ch), dtype, -scale, scale)}
    if bias:
        p["bias"] = jax.random.uniform(k2, (out_ch,), dtype, -scale, scale)
    return p


# ---------------------------------------------------------------- apply

def linear(p: dict, x: jax.Array) -> jax.Array:
    if "weight" not in p:
        from tpu_audio.ops import quant

        return quant.quantized_linear(p, x)
    y = x @ p["weight"].T.astype(x.dtype)
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def embedding(p: dict, ids: jax.Array) -> jax.Array:
    if "weight" not in p:
        from tpu_audio.ops import quant

        return quant.dequantize_rows(p, ids)
    return p["weight"][ids]


def embedding_as_linear(p: dict, x: jax.Array) -> jax.Array:
    """Tied-embedding output head: logits = x @ E.T."""
    if "weight" not in p:
        from tpu_audio.ops import quant

        # routes decode-shape rows through the fused quant kernels instead
        # of materializing the dequantized vocab×dim table in HBM
        return quant.quantized_linear(p, x)
    return x @ p["weight"].T.astype(x.dtype)


def layer_norm(p: dict | None, x: jax.Array, eps: float = 1e-5) -> jax.Array:
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    if p is not None:
        y = y * p["weight"].astype(jnp.float32)
        if "bias" in p:
            y = y + p["bias"].astype(jnp.float32)
    return y.astype(x.dtype)


def rms_norm(p: dict, x: jax.Array, eps: float = 1e-6) -> jax.Array:
    xf = x.astype(jnp.float32)
    y = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return (y * p["weight"].astype(jnp.float32)).astype(x.dtype)


def group_norm(p: dict, x: jax.Array, num_groups: int, eps: float = 1e-5) -> jax.Array:
    """x: (..., T, C) grouped over channels."""
    *lead, t, c = x.shape
    xf = x.astype(jnp.float32).reshape(*lead, t, num_groups, c // num_groups)
    mu = jnp.mean(xf, axis=(-3, -1), keepdims=True)
    var = jnp.var(xf, axis=(-3, -1), keepdims=True)
    y = ((xf - mu) * jax.lax.rsqrt(var + eps)).reshape(*lead, t, c)
    return (y * p["weight"] + p["bias"]).astype(x.dtype)


def instance_norm(p: dict | None, x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """InstanceNorm1d over (B, T, C): normalize each channel over time."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-2, keepdims=True)
    var = jnp.var(xf, axis=-2, keepdims=True)
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    if p is not None:
        y = y * p["weight"] + p["bias"]
    return y.astype(x.dtype)


def batch_norm(p: dict, x: jax.Array, eps: float = 1e-5) -> jax.Array:
    """Inference-mode BatchNorm over the channel (last) axis using running stats."""
    inv = jax.lax.rsqrt(p["running_var"].astype(jnp.float32) + eps)
    y = (x.astype(jnp.float32) - p["running_mean"]) * inv
    return (y * p["weight"] + p["bias"]).astype(x.dtype)


def conv1d(p: dict, x: jax.Array, stride: int = 1, padding: int | tuple = 0,
           dilation: int = 1, groups: int = 1) -> jax.Array:
    """1-D convolution over (B, T, C_in) → (B, T', C_out); weight (K, I/g, O)."""
    if isinstance(padding, int):
        padding = (padding, padding)
    w = p["weight"].astype(x.dtype)
    y = jax.lax.conv_general_dilated(
        x, w,
        window_strides=(stride,),
        padding=(padding,),
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups,
    )
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def conv1d_mxu(p: dict, x: jax.Array, stride: int = 1,
               padding: int | tuple = 0, dilation: int = 1) -> jax.Array:
    """conv1d lowered as K shifted matmuls instead of lax.conv.

    XLA's TPU lowering of small-K NWC conv1d runs orders of magnitude below
    the MXU on large (B·T, C) problems (measured: the Whisper conv stem at
    batch 16 is ~0.3 TFLOP of work yet cost ~65% of encoder wall time, see
    benchmarks/enc_profile.py). y[t] = Σ_k x[t·s + k − pad] @ W[k] turns the
    same math into K dense (B·T', I)@(I, O) dots that tile straight onto the
    MXU. Dense (groups=1) only; bit-class identical to conv1d (same dot
    precision, accumulation order differs only across the K partial sums).
    """
    if isinstance(padding, int):
        padding = (padding, padding)
    w = p["weight"].astype(x.dtype)
    k = w.shape[0]
    xp = jnp.pad(x, ((0, 0), (padding[0], padding[1]), (0, 0)))
    span = (k - 1) * dilation + 1
    t_out = (xp.shape[1] - span) // stride + 1
    y = None
    for i in range(k):
        xi = jax.lax.slice_in_dim(
            xp, i * dilation, i * dilation + stride * (t_out - 1) + 1,
            stride=stride, axis=1)
        yi = jnp.einsum("bti,io->bto", xi, w[i])
        y = yi if y is None else y + yi
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def depthwise_conv1d_shifted(p: dict, x: jax.Array,
                             padding: int | tuple = 0) -> jax.Array:
    """Depthwise conv1d (groups == channels, weight (K, 1, C)) lowered as K
    shifted elementwise FMAs on the VPU.

    XLA's TPU lowering of lax.conv with feature_group_count == C runs far
    off the vector unit's roofline for small K (same pathology as the
    dense small-K case conv1d_mxu fixes on the MXU — the FSMN memory
    blocks of FunASR's SANM encoder are exactly this shape, K=11 C=512,
    SenseVoiceEncoder.swift:22-136). y[t,c] = Σ_k x[t+k-pad, c]·w[k,c] is
    K fused multiply-adds over contiguous slices; bit-class identical to
    conv1d (accumulation order differs only across the K partials)."""
    if isinstance(padding, int):
        padding = (padding, padding)
    w = p["weight"].astype(x.dtype)  # (K, 1, C)
    k = w.shape[0]
    xp = jnp.pad(x, ((0, 0), (padding[0], padding[1]), (0, 0)))
    t_out = xp.shape[1] - k + 1
    y = None
    for i in range(k):
        yi = jax.lax.slice_in_dim(xp, i, i + t_out, axis=1) * w[i, 0]
        y = yi if y is None else y + yi
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def conv_transpose1d(p: dict, x: jax.Array, stride: int = 1, padding: int = 0,
                     groups: int = 1) -> jax.Array:
    """Transposed 1-D conv over (B, T, C_in); weight (K, I/g, O) — same WIO
    orientation as conv1d; loaders map PyTorch's dense (I, O, K) via
    transpose(2,0,1) and depthwise (C, 1, K) via transpose(2,1,0).
    out_len = (T-1)*stride - 2*padding + K. Depthwise grouping (the Mimi
    ×2 upsampler, reference Mimi/Conv.swift:357-365 groups=dim) is inferred
    from the weight's singleton I/g axis."""
    w = p["weight"]
    if groups == 1 and w.shape[1] != x.shape[-1]:
        groups = x.shape[-1] // w.shape[1]
        if w.shape[1] != 1 or w.shape[2] != x.shape[-1]:
            raise NotImplementedError(
                f"only dense or depthwise transposed conv supported; "
                f"weight {w.shape} vs input C={x.shape[-1]}")
    k = w.shape[0]
    # Transposed conv = lhs-dilated conv with the kernel flipped along K.
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype)[::-1],
        window_strides=(1,),
        padding=((k - 1 - padding, k - 1 - padding),),
        lhs_dilation=(stride,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups,
    )
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def weight_norm_conv1d(p: dict, x: jax.Array, **kw) -> jax.Array:
    """Weight-normalized conv1d: weight_v (K,I,O) + weight_g norm over (K,I)."""
    v = p["weight_v"].astype(jnp.float32)
    norm = jnp.sqrt(jnp.sum(v * v, axis=(0, 1), keepdims=True) + 1e-12)
    w = (v / norm) * p["weight_g"].astype(jnp.float32)
    q = {"weight": w.astype(x.dtype)}
    if "bias" in p:
        q["bias"] = p["bias"]
    return conv1d(q, x, **kw)


# ---------------------------------------------------------------- activations

def gelu(x):
    return jax.nn.gelu(x, approximate=False)


def gelu_new(x):
    """GPT-2's tanh-approximate gelu (HF `gelu_new`), used by the Chatterbox
    Turbo backbone (reference TTS/ChatterboxTurbo/T3/GPT2.swift:64)."""
    return jax.nn.gelu(x, approximate=True)


def silu(x):
    return jax.nn.silu(x)


def snake(x: jax.Array, alpha: jax.Array, logscale: bool = False) -> jax.Array:
    """Snake activation x + sin²(αx)/α (fp32-safe like the reference's
    HiFiGAN Snake, package/Codec/S3Gen/HiFiGAN.swift:30-70). alpha: (C,),
    x: (..., T, C)."""
    a = alpha.astype(jnp.float32)
    if logscale:
        a = jnp.exp(a)
    xf = x.astype(jnp.float32)
    y = xf + jnp.sin(a * xf) ** 2 / (a + 1e-9)
    return y.astype(x.dtype)


def sinusoidal_positions(length: int, dim: int, max_timescale: float = 10000.0) -> np.ndarray:
    """Whisper-style sinusoidal embeddings (length, dim), [sin | cos] halves."""
    log_inc = np.log(max_timescale) / (dim // 2 - 1)
    inv = np.exp(-log_inc * np.arange(dim // 2))
    ang = np.arange(length)[:, None] * inv[None, :]
    return np.concatenate([np.sin(ang), np.cos(ang)], axis=1).astype(np.float32)


def masked_instance_norm(x: jax.Array, valid_len, eps: float = 1e-5) -> jax.Array:
    """InstanceNorm1d over (B, T, C) using only the first `valid_len` frames
    for the statistics. Required for static-shape padded synthesis: stats
    over the padded tail would otherwise change every valid frame."""
    xf = x.astype(jnp.float32)
    t = x.shape[-2]
    mask = (jnp.arange(t) < valid_len)[None, :, None].astype(jnp.float32)
    n = jnp.maximum(jnp.sum(mask), 1.0)
    mu = jnp.sum(xf * mask, axis=-2, keepdims=True) / n
    var = jnp.sum(((xf - mu) ** 2) * mask, axis=-2, keepdims=True) / n
    y = (xf - mu) * jax.lax.rsqrt(var + eps)
    return (y * mask).astype(x.dtype)


def zero_pad_tail(x: jax.Array, valid_len) -> jax.Array:
    """Zero frames at and beyond valid_len along axis -2 of (B, T, C)."""
    t = x.shape[-2]
    mask = (jnp.arange(t) < valid_len)[None, :, None]
    return jnp.where(mask, x, 0)


def leaky_relu(x, negative_slope: float = 0.2):
    return jax.nn.leaky_relu(x, negative_slope)
