"""CAMPPlus x-vector speaker embedder (D-TDNN with context-aware masking).

Reference: package/Codec/S3Gen/CAMPPlus.swift:180-819 — FCM 2-D conv head
over mel bins, TDNN stem, three CAM-dense TDNN blocks with transit layers,
stats pooling, dense output embedding (192-d). Input is Kaldi fbank with
per-utterance mean subtraction (ops/frontends.kaldi_fbank).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from tpu_audio.nn import layers


@dataclass(frozen=True)
class CAMPPlusConfig:
    feat_dim: int = 80
    embedding_size: int = 192
    growth_rate: int = 32
    bn_size: int = 4
    init_channels: int = 128
    blocks: tuple = (12, 24, 16)
    kernels: tuple = (3, 3, 3)
    dilations: tuple = (1, 2, 2)


def _bn_init(ch, dtype):
    return {"weight": jnp.ones((ch,), dtype), "bias": jnp.zeros((ch,), dtype),
            "running_mean": jnp.zeros((ch,), dtype),
            "running_var": jnp.ones((ch,), dtype)}


def _conv2d_init(key, i, o, k, dtype):
    scale = 1.0 / np.sqrt(i * k * k)
    return {"weight": jax.random.uniform(key, (k, k, i, o), dtype,
                                         -scale, scale)}


def init_params(key, cfg: CAMPPlusConfig, dtype=jnp.float32) -> dict:
    ks = iter(jax.random.split(key, 512))

    def res2d(cin, cout, stride):
        p = {"conv1": _conv2d_init(next(ks), cin, cout, 3, dtype),
             "bn1": _bn_init(cout, dtype),
             "conv2": _conv2d_init(next(ks), cout, cout, 3, dtype),
             "bn2": _bn_init(cout, dtype)}
        if stride != 1 or cin != cout:
            p["shortcut"] = {"0": {"weight": jax.random.uniform(
                next(ks), (1, 1, cin, cout), dtype, -0.1, 0.1)},
                "1": _bn_init(cout, dtype)}
        return p

    head = {
        "conv1": _conv2d_init(next(ks), 1, 32, 3, dtype),
        "bn1": _bn_init(32, dtype),
        # FCM.swift:246-295: each layer holds TWO res blocks (stride 2,
        # then stride 1) — round-3 fix, the second block was missing
        "layer1": {"0": res2d(32, 32, 2), "1": res2d(32, 32, 1)},
        "layer2": {"0": res2d(32, 32, 2), "1": res2d(32, 32, 1)},
        "conv2": _conv2d_init(next(ks), 32, 32, 3, dtype),
        "bn2": _bn_init(32, dtype),
    }
    fcm_out = 32 * ((cfg.feat_dim + 7) // 8)  # channels × reduced bins

    tdnn = {"linear": layers.init_conv1d(next(ks), fcm_out, cfg.init_channels,
                                         5, bias=False, dtype=dtype),
            "bn": _bn_init(cfg.init_channels, dtype)}

    channels = cfg.init_channels
    blocks = {}
    transits = {}
    for bi, (n_layers, k, dil) in enumerate(zip(cfg.blocks, cfg.kernels,
                                                cfg.dilations)):
        blk = {}
        for li in range(n_layers):
            inner = cfg.bn_size * cfg.growth_rate
            blk[str(li)] = {
                "nonlinear1_bn": _bn_init(channels, dtype),
                "linear1": layers.init_conv1d(next(ks), channels, inner, 1,
                                              bias=False, dtype=dtype),
                "nonlinear2_bn": _bn_init(inner, dtype),
                "cam_layer": {
                    "linear_local": layers.init_conv1d(
                        next(ks), inner, cfg.growth_rate, k, bias=False,
                        dtype=dtype),
                    "linear1": layers.init_conv1d(next(ks), inner,
                                                  inner // cfg.bn_size, 1,
                                                  dtype=dtype),
                    "linear2": layers.init_conv1d(next(ks), inner // cfg.bn_size,
                                                  cfg.growth_rate, 1,
                                                  dtype=dtype),
                },
            }
            channels += cfg.growth_rate
        blocks[str(bi)] = blk
        transits[str(bi)] = {
            "nonlinear_bn": _bn_init(channels, dtype),
            "linear": layers.init_conv1d(next(ks), channels, channels // 2, 1,
                                         bias=False, dtype=dtype)}
        channels //= 2
    return {
        "head": head, "tdnn": tdnn, "blocks": blocks, "transits": transits,
        "out_nonlinear_bn": _bn_init(channels, dtype),
        "dense": {"linear": layers.init_conv1d(next(ks), channels * 2,
                                               cfg.embedding_size, 1,
                                               bias=False, dtype=dtype),
                  "nonlinear_bn": _bn_init(cfg.embedding_size, dtype)},
    }


def _conv2d(p, x, stride=(1, 1), padding=1):
    return jax.lax.conv_general_dilated(
        x, p["weight"].astype(x.dtype), window_strides=stride,
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def _res2d(p, x, stride):
    y = jax.nn.relu(layers.batch_norm(p["bn1"], _conv2d(p["conv1"], x,
                                                        (stride, 1))))
    y = layers.batch_norm(p["bn2"], _conv2d(p["conv2"], y))
    if "shortcut" in p:
        sc = jax.lax.conv_general_dilated(
            x, p["shortcut"]["0"]["weight"].astype(x.dtype),
            window_strides=(stride, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        sc = layers.batch_norm(p["shortcut"]["1"], sc)
    else:
        sc = x
    return jax.nn.relu(y + sc)


def _fcm(p, fbank):
    """(B, T, F) → (B, T, 32·F/8)."""
    x = fbank[..., None].transpose(0, 2, 1, 3)  # (B, F, T, 1) → NHWC (F=H)
    x = jax.nn.relu(layers.batch_norm(p["bn1"], _conv2d(p["conv1"], x)))
    x = _res2d(p["layer1"]["0"], x, 2)
    x = _res2d(p["layer1"]["1"], x, 1)
    x = _res2d(p["layer2"]["0"], x, 2)
    x = _res2d(p["layer2"]["1"], x, 1)
    x = jax.nn.relu(layers.batch_norm(p["bn2"], _conv2d(p["conv2"], x,
                                                        (2, 1))))
    b, f, t, c = x.shape
    return x.transpose(0, 2, 3, 1).reshape(b, t, c * f)


def _cam_layer(p, x, k, dil=1):
    """Context-aware mask: local conv modulated by sigmoid(segment-pooled
    context) (CAMPPlus.swift:420-505)."""
    local = layers.conv1d(p["linear_local"], x, padding=(k - 1) * dil // 2,
                          dilation=dil)
    # segment pooling: mean over 100-frame segments + global mean
    seg = 100
    t = x.shape[1]
    n_seg = -(-t // seg)
    pad = n_seg * seg - t
    xp = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    seg_mean = xp.reshape(x.shape[0], n_seg, seg, -1).mean(axis=2)
    context = seg_mean + x.mean(axis=1, keepdims=True)
    m = jax.nn.relu(layers.conv1d(p["linear1"], context))
    m = jax.nn.sigmoid(layers.conv1d(p["linear2"], m))
    m = jnp.repeat(m, seg, axis=1)[:, :t]
    return local * m


def embed(params, cfg: CAMPPlusConfig, fbank: jax.Array) -> jax.Array:
    """fbank (B, T, feat_dim) mean-normalized → x-vector (B, 192)."""
    x = _fcm(params["head"], fbank)
    # TDNN stem: conv k5 STRIDE 2 → BN → ReLU (TDNNLayer "batchnorm-relu"
    # applies BN first; CAMPPlus.swift:711-719 — round-3 fix: the stride
    # and the BN/ReLU order were both wrong before the torch parity suite)
    x = jax.nn.relu(layers.batch_norm(
        params["tdnn"]["bn"],
        layers.conv1d(params["tdnn"]["linear"], x, stride=2, padding=2)))

    for bi, (n_layers, k, dil) in enumerate(zip(cfg.blocks, cfg.kernels,
                                                cfg.dilations)):
        blk = params["blocks"][str(bi)]
        for li in range(n_layers):
            lp = blk[str(li)]
            h = jax.nn.relu(layers.batch_norm(lp["nonlinear1_bn"], x))
            h = layers.conv1d(lp["linear1"], h)
            h = jax.nn.relu(layers.batch_norm(lp["nonlinear2_bn"], h))
            h = _cam_layer(lp["cam_layer"], h, k, dil)
            x = jnp.concatenate([x, h], axis=-1)
        tp = params["transits"][str(bi)]
        x = jax.nn.relu(layers.batch_norm(tp["nonlinear_bn"], x))
        x = layers.conv1d(tp["linear"], x)

    x = jax.nn.relu(layers.batch_norm(params["out_nonlinear_bn"], x))
    mean = x.mean(axis=1)
    # statisticsPooling: sqrt(var + 1e-5) (CAMPPlus.swift:327-333)
    std = jnp.sqrt(x.var(axis=1) + 1e-5)
    stats = jnp.concatenate([mean, std], axis=-1)[:, None, :]
    out = layers.conv1d(params["dense"]["linear"], stats)
    out = layers.batch_norm(params["dense"]["nonlinear_bn"], out)
    return out[:, 0]
