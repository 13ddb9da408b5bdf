"""Kokoro acoustic model + iSTFT-NSF generator, shape-static for XLA.

Architecture follows the reference modules (package/TTS/Kokoro/TTSEngine/
KokoroModel.swift:94-131, Predictor :13-89, TextEncoder.swift,
DurationEncoder.swift, Decoder/Generator.swift:11-193,
BuildingBlocks/AdainResBlk1d.swift, AdaINResBlock1.swift) but is built for
fixed shapes: the token axis is always padded to 512 and the frame axis to
a bucket size, with masked instance-norm statistics and masked-flip BiLSTMs
so padded execution is numerically identical to exact-shape execution.
The reference's COO alignment-matrix loop (KokoroTTS.swift:318-395) becomes
a vectorized cumsum comparison.

All tensors are channels-last (B, T, C); batch is 1 per sentence.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tpu_audio.models.kokoro import albert
from tpu_audio.models.kokoro.config import KokoroConfig
from tpu_audio.nn import layers, lstm
from tpu_audio.ops.interpolate import linear_resize, nearest_2x

LRELU_SLOPE = 0.2


# =================================================================== init

def _init_wn_conv(key, in_ch, out_ch, kernel, bias=True, dtype=jnp.float32):
    base = layers.init_conv1d(key, in_ch, out_ch, kernel, bias, dtype)
    v = base["weight"]
    g = jnp.sqrt(jnp.sum(v * v, axis=(0, 1), keepdims=True))
    p = {"weight_v": v, "weight_g": g}
    if bias:
        p["bias"] = base["bias"]
    return p


def _init_bilstm(key, in_size, hidden, dtype=jnp.float32):
    def one(k):
        k1, k2 = jax.random.split(k)
        s = 1.0 / np.sqrt(hidden)
        return {
            "wx": jax.random.uniform(k1, (4 * hidden, in_size), dtype, -s, s),
            "wh": jax.random.uniform(k2, (4 * hidden, hidden), dtype, -s, s),
            "bias_ih": jnp.zeros((4 * hidden,), dtype),
            "bias_hh": jnp.zeros((4 * hidden,), dtype),
        }
    k1, k2 = jax.random.split(key)
    return {"fwd": one(k1), "bwd": one(k2)}


def _init_adain(key, style_dim, ch, dtype=jnp.float32):
    return {"fc": layers.init_linear(key, style_dim, ch * 2, True, dtype)}


def _init_adain_res_blk1d(key, dim_in, dim_out, style_dim, upsample=False,
                          dtype=jnp.float32):
    ks = jax.random.split(key, 6)
    p = {
        "conv1": _init_wn_conv(ks[0], dim_in, dim_out, 3, dtype=dtype),
        "conv2": _init_wn_conv(ks[1], dim_out, dim_out, 3, dtype=dtype),
        "norm1": _init_adain(ks[2], style_dim, dim_in, dtype),
        "norm2": _init_adain(ks[3], style_dim, dim_out, dtype),
    }
    if upsample:
        p["pool"] = _init_wn_conv(ks[4], dim_in, dim_in, 3, dtype=dtype)
    if dim_in != dim_out:
        p["conv1x1"] = _init_wn_conv(ks[5], dim_in, dim_out, 1, bias=False,
                                     dtype=dtype)
    return p


def _init_gen_res_block(key, channels, kernel, style_dim, dtype=jnp.float32):
    ks = jax.random.split(key, 12)
    return {
        "convs1": {str(i): _init_wn_conv(ks[i], channels, channels, kernel,
                                         dtype=dtype) for i in range(3)},
        "convs2": {str(i): _init_wn_conv(ks[3 + i], channels, channels, kernel,
                                         dtype=dtype) for i in range(3)},
        "adain1": {str(i): _init_adain(ks[6 + i], style_dim, channels, dtype)
                   for i in range(3)},
        "adain2": {str(i): _init_adain(ks[9 + i], style_dim, channels, dtype)
                   for i in range(3)},
        "alpha1": {str(i): jnp.ones((1, 1, channels), dtype) for i in range(3)},
        "alpha2": {str(i): jnp.ones((1, 1, channels), dtype) for i in range(3)},
    }


def init_params(key, cfg: KokoroConfig, dtype=jnp.float32) -> dict:
    ks = iter(jax.random.split(key, 64))
    d, sd = cfg.d_model, cfg.style_dim

    text_encoder = {
        "embedding": layers.init_embedding(next(ks), cfg.n_symbols, d, dtype),
        "cnn": {str(i): {
            "conv": _init_wn_conv(next(ks), d, d, cfg.text_encoder_kernel,
                                  dtype=dtype),
            "norm": layers.init_norm(d, dtype=dtype),
        } for i in range(cfg.text_encoder_depth)},
        "lstm": _init_bilstm(next(ks), d, d // 2, dtype),
    }

    predictor = {
        "text_encoder": {},
        "lstm": _init_bilstm(next(ks), d + sd, d // 2, dtype),
        "duration_proj": layers.init_linear(next(ks), d, cfg.max_dur, True, dtype),
        "shared": _init_bilstm(next(ks), d + sd, d // 2, dtype),
        "F0": {"0": _init_adain_res_blk1d(next(ks), d, d, sd, dtype=dtype),
               "1": _init_adain_res_blk1d(next(ks), d, d // 2, sd, True, dtype),
               "2": _init_adain_res_blk1d(next(ks), d // 2, d // 2, sd, dtype=dtype)},
        "N": {"0": _init_adain_res_blk1d(next(ks), d, d, sd, dtype=dtype),
              "1": _init_adain_res_blk1d(next(ks), d, d // 2, sd, True, dtype),
              "2": _init_adain_res_blk1d(next(ks), d // 2, d // 2, sd, dtype=dtype)},
        "F0_proj": layers.init_conv1d(next(ks), d // 2, 1, 1, dtype=dtype),
        "N_proj": layers.init_conv1d(next(ks), d // 2, 1, 1, dtype=dtype),
    }
    for i in range(3):
        predictor["text_encoder"][f"lstm{i}"] = _init_bilstm(
            next(ks), d + sd, d // 2, dtype)
        predictor["text_encoder"][f"norm{i}"] = {
            "fc": layers.init_linear(next(ks), sd, d * 2, True, dtype)}

    hidden = cfg.decoder_hidden
    decoder = {
        "encode": _init_adain_res_blk1d(next(ks), d + 2, hidden, sd, dtype=dtype),
        "decode": {
            "0": _init_adain_res_blk1d(next(ks), hidden + 2 + 64, hidden, sd, dtype=dtype),
            "1": _init_adain_res_blk1d(next(ks), hidden + 2 + 64, hidden, sd, dtype=dtype),
            "2": _init_adain_res_blk1d(next(ks), hidden + 2 + 64, hidden, sd, dtype=dtype),
            "3": _init_adain_res_blk1d(next(ks), hidden + 2 + 64, d, sd, True, dtype),
        },
        "F0_conv": _init_wn_conv(next(ks), 1, 1, 3, dtype=dtype),
        "N_conv": _init_wn_conv(next(ks), 1, 1, 3, dtype=dtype),
        "asr_res": {"0": _init_wn_conv(next(ks), d, 64, 1, dtype=dtype)},
        "generator": _init_generator(next(ks), cfg, dtype),
    }

    return {
        "bert": albert.init_params(next(ks), cfg.albert, dtype),
        "bert_encoder": layers.init_linear(next(ks), cfg.albert.hidden_size,
                                           d, True, dtype),
        "text_encoder": text_encoder,
        "predictor": predictor,
        "decoder": decoder,
    }


def _init_generator(key, cfg: KokoroConfig, dtype=jnp.float32) -> dict:
    ks = iter(jax.random.split(key, 40))
    uic = cfg.upsample_initial_channel
    n_fft = cfg.istft_n_fft
    gen = {
        "m_source": {"l_linear": layers.init_linear(
            next(ks), cfg.harmonic_num + 1, 1, True, dtype)},
        "ups": {}, "noise_convs": {}, "noise_res": {}, "resblocks": {},
        "conv_post": _init_wn_conv(next(ks), uic // (2 ** len(cfg.upsample_rates)),
                                   (n_fft // 2 + 1) * 2, 7, dtype=dtype),
    }
    for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernels)):
        gen["ups"][str(i)] = _init_wn_conv(
            next(ks), uic // (2 ** i), uic // (2 ** (i + 1)), k, dtype=dtype)
    for i in range(len(cfg.upsample_rates)):
        ch = uic // (2 ** (i + 1))
        for j, (k, dil) in enumerate(zip(cfg.resblock_kernels,
                                         cfg.resblock_dilations)):
            gen["resblocks"][str(i * len(cfg.resblock_kernels) + j)] = \
                _init_gen_res_block(next(ks), ch, k, cfg.style_dim, dtype)
        if i + 1 < len(cfg.upsample_rates):
            stride_f0 = int(np.prod(cfg.upsample_rates[i + 1:]))
            gen["noise_convs"][str(i)] = layers.init_conv1d(
                next(ks), n_fft + 2, ch, stride_f0 * 2, dtype=dtype)
            gen["noise_res"][str(i)] = _init_gen_res_block(
                next(ks), ch, 7, cfg.style_dim, dtype)
        else:
            gen["noise_convs"][str(i)] = layers.init_conv1d(
                next(ks), n_fft + 2, ch, 1, dtype=dtype)
            gen["noise_res"][str(i)] = _init_gen_res_block(
                next(ks), ch, 11, cfg.style_dim, dtype)
    return gen


# =================================================================== blocks

def _wn_conv(p, x, **kw):
    return layers.weight_norm_conv1d(p, x, **kw)


def _wn_conv_transpose(p, x, stride, padding):
    """Weight-normalized ConvTranspose1d, torch weight_norm(dim=0) semantics:
    the norm is per INPUT channel over (out, kernel). Our stored layout is
    (K, I, O); the g vector broadcasts over axis I."""
    v = p["weight_v"].astype(jnp.float32)
    norm = jnp.sqrt(jnp.sum(v * v, axis=(0, 2), keepdims=True) + 1e-12)
    w = (v / norm) * p["weight_g"].astype(jnp.float32)
    q = {"weight": w.astype(x.dtype)}
    if "bias" in p:
        q["bias"] = p["bias"]
    return layers.conv_transpose1d(q, x, stride=stride, padding=padding)


def adain(p, x, s, valid_len):
    """AdaIN1d: masked instance norm + style-conditioned affine
    (BuildingBlocks/AdaIN1d.swift:11-30). x (B,T,C), s (B,style)."""
    h = layers.linear(p["fc"], s)
    gamma, beta = jnp.split(h, 2, axis=-1)
    normed = layers.masked_instance_norm(x, valid_len)
    return (1 + gamma[:, None, :]) * normed + beta[:, None, :]


def ada_layer_norm(p, x, s, eps=1e-5):
    """AdaLayerNorm: per-frame channel LayerNorm with style affine."""
    h = layers.linear(p["fc"], s)
    gamma, beta = jnp.split(h, 2, axis=-1)
    normed = layers.layer_norm(None, x, eps)
    return (1 + gamma[:, None, :]) * normed + beta[:, None, :]


def adain_res_blk1d(p, cfg, x, s, valid_len, upsample=False):
    """AdainResBlk1d (norm→lrelu→[pool-transpose-2x]→conv→norm→lrelu→conv
    + [nearest-2x + 1x1] shortcut) / sqrt(2). Returns (y, new_valid_len)."""
    out_valid = valid_len * 2 if upsample else valid_len

    # residual branch
    h = adain(p["norm1"], x, s, valid_len)
    h = layers.leaky_relu(h, LRELU_SLOPE)
    if upsample:
        h = _wn_conv_transpose(p["pool"], h, stride=2, padding=1)  # 2T-1
        h = jnp.pad(h, ((0, 0), (1, 0), (0, 0)))  # left pad → 2T
        h = layers.zero_pad_tail(h, out_valid)
    h = _wn_conv(p["conv1"], h, padding=1)
    h = adain(p["norm2"], h, s, out_valid)
    h = layers.leaky_relu(h, LRELU_SLOPE)
    h = _wn_conv(p["conv2"], h, padding=1)

    # shortcut
    sc = nearest_2x(x) if upsample else x
    if "conv1x1" in p:
        sc = _wn_conv(p["conv1x1"], sc)
    y = (h + sc) / jnp.sqrt(2.0).astype(x.dtype)
    return layers.zero_pad_tail(y, out_valid), out_valid


def gen_res_block(p, x, s, valid_len, dilations=(1, 3, 5), kernel=3):
    """AdaINResBlock1 with Snake activations (AdaINResBlock1.swift:80-105)."""
    for i in range(3):
        i_ = str(i)
        xt = adain(p["adain1"][i_], x, s, valid_len)
        a1 = p["alpha1"][i_]
        xt = xt + (1.0 / a1) * jnp.sin(a1 * xt) ** 2
        d = dilations[i]
        xt = _wn_conv(p["convs1"][i_], xt, padding=(kernel * d - d) // 2,
                      dilation=d)
        xt = adain(p["adain2"][i_], xt, s, valid_len)
        a2 = p["alpha2"][i_]
        xt = xt + (1.0 / a2) * jnp.sin(a2 * xt) ** 2
        xt = _wn_conv(p["convs2"][i_], xt, padding=(kernel - 1) // 2)
        x = xt + x
    return layers.zero_pad_tail(x, valid_len)


# =================================================================== stages

def bert_duration_features(params, cfg: KokoroConfig, tokens, n_tokens):
    """tokens (1, T) padded ids → d_en (1, T, d_model)."""
    mask = (jnp.arange(tokens.shape[1]) < n_tokens)[None].astype(jnp.int32)
    seq = albert.forward(params["bert"], cfg.albert, tokens, mask)
    return layers.linear(params["bert_encoder"], seq)


def duration_encode(params, cfg: KokoroConfig, d_en, style, n_tokens):
    """DurationEncoder: 3× (masked BiLSTM → AdaLayerNorm → concat style)."""
    p = params["predictor"]["text_encoder"]
    b, t, _ = d_en.shape
    s = jnp.broadcast_to(style[:, None, :], (b, t, style.shape[-1]))
    x = jnp.concatenate([d_en, s], axis=-1)
    x = layers.zero_pad_tail(x, n_tokens)
    for i in range(3):
        h = lstm.masked_bilstm(p[f"lstm{i}"], x, n_tokens)
        h = ada_layer_norm(p[f"norm{i}"], h, style)
        x = jnp.concatenate([h, s], axis=-1)
        x = layers.zero_pad_tail(x, n_tokens)
    return x  # (1, T, d_model + style)


def predict_durations(params, cfg: KokoroConfig, d, n_tokens, speed):
    """d → per-token frame counts (1, T) int32; padded tokens get 0."""
    p = params["predictor"]
    x = lstm.masked_bilstm(p["lstm"], d, n_tokens)
    dur_logits = layers.linear(p["duration_proj"], x)
    dur = jnp.sum(jax.nn.sigmoid(dur_logits), axis=-1) / speed
    dur = jnp.clip(jnp.round(dur), 1, None).astype(jnp.int32)
    return jnp.where(jnp.arange(d.shape[1])[None] < n_tokens, dur, 0)


def alignment_matrix(durations, total_frames: int):
    """(1, T) durations → (T, F) one-hot alignment: frame f belongs to the
    token whose cumulative-duration interval contains f. Replaces the
    reference's host-side COO loop with a cumsum comparison."""
    cum = jnp.cumsum(durations[0])
    starts = jnp.concatenate([jnp.zeros(1, jnp.int32), cum[:-1]])
    f = jnp.arange(total_frames)[None, :]
    return ((f >= starts[:, None]) & (f < cum[:, None])).astype(jnp.float32)


def f0n_predict(params, cfg: KokoroConfig, en, style, valid_frames):
    """Prosody: shared BiLSTM → F0/N AdainResBlk stacks (middle block
    upsamples 2×) → 1-d projections. en (1, F, d+style) → ((1, 2F), (1, 2F))."""
    p = params["predictor"]
    x = lstm.masked_bilstm(p["shared"], en, valid_frames)

    def branch(blocks, proj):
        h, v = adain_res_blk1d(blocks["0"], cfg, x, style, valid_frames)
        h, v = adain_res_blk1d(blocks["1"], cfg, h, style, v, upsample=True)
        h, v = adain_res_blk1d(blocks["2"], cfg, h, style, v)
        out = layers.conv1d(proj, h)
        return out[..., 0], v

    f0, v2 = branch(p["F0"], p["F0_proj"])
    n, _ = branch(p["N"], p["N_proj"])
    return f0, n, v2


def text_encode(params, cfg: KokoroConfig, tokens, n_tokens):
    """TextEncoder: embedding → 3×(wn-conv k5 → LN → lrelu) → BiLSTM."""
    p = params["text_encoder"]
    x = layers.embedding(p["embedding"], tokens)
    x = layers.zero_pad_tail(x, n_tokens)
    pad = (cfg.text_encoder_kernel - 1) // 2
    for i in range(cfg.text_encoder_depth):
        blk = p["cnn"][str(i)]
        x = _wn_conv(blk["conv"], x, padding=pad)
        x = layers.layer_norm(blk["norm"], x)
        x = layers.leaky_relu(x, LRELU_SLOPE)
        x = layers.zero_pad_tail(x, n_tokens)
    x = lstm.masked_bilstm(p["lstm"], x, n_tokens)
    return x


# =================================================================== generator

def _kokoro_stft(x, n_fft, hop):
    """Center-padded magnitude+phase STFT, periodic-Hann (MLXSTFT.transform)."""
    from tpu_audio.ops import stft as stft_ops
    from tpu_audio.ops import windows

    win = windows.hann(n_fft, periodic=True)
    spec = stft_ops.stft_complex(x, win, n_fft, hop, center=True)
    # +0.0 canonicalizes -0.0 imaginary parts (DC/Nyquist bins) so the
    # ±π branch of atan2 matches torch — the phase feeds a linear conv,
    # so the branch choice is numerically significant
    return jnp.abs(spec), jnp.arctan2(jnp.imag(spec) + 0.0,
                                      jnp.real(spec))  # (B, frames, K)


def _kokoro_istft(mag, phase, n_fft, hop):
    """OLA inverse matching MLXSTFT.inverse: frames×window / OLA(window),
    trimmed by n_fft/2 on both ends."""
    from tpu_audio.ops import stft as stft_ops
    from tpu_audio.ops import windows

    win_np = windows.hann(n_fft, periodic=True)
    win = jnp.asarray(win_np)
    # explicit cos/sin instead of exp(1j·φ): complex exp is an
    # unimplemented single op on the TPU backend in eager mode
    spec = jax.lax.complex(mag * jnp.cos(phase), mag * jnp.sin(phase))
    frames = jnp.fft.irfft(spec, n=n_fft, axis=-1) * win
    nf = frames.shape[1]
    out_len = (nf - 1) * hop + n_fft
    out = stft_ops.overlap_add(frames, hop)  # scatter-free (hop | n_fft)
    wsum = np.zeros(out_len)
    for f in range(nf):
        wsum[f * hop: f * hop + n_fft] += np.asarray(win_np)
    scale = np.where(wsum != 0, 1.0 / np.maximum(wsum, 1e-30), 1.0)
    out = out * jnp.asarray(scale, out.dtype)
    return out[:, n_fft // 2: out_len - n_fft // 2]


def sine_source(params, cfg: KokoroConfig, f0_up, key,
                rand_ini: jax.Array | None = None,
                noise: jax.Array | None = None):
    """Harmonic NSF source (KokoroSineGen + SourceModuleHnNSF): per-harmonic
    sines with random phase, voiced/unvoiced gating, tanh-merged.

    rand_ini (B, H+1) / noise (B, T, H+1) override the PRNG draws (parity
    tests inject the same values into the torch translation)."""
    b, t, _ = f0_up.shape
    upsample_scale = float(np.prod(cfg.upsample_rates) * cfg.istft_hop)
    harmonics = jnp.arange(1, cfg.harmonic_num + 2, dtype=jnp.float32)
    fn = f0_up * harmonics[None, None, :]  # (B, T, H+1)

    rad = (fn / cfg.sample_rate) % 1.0
    k1, k2 = jax.random.split(key)
    if rand_ini is None:
        rand_ini = jax.random.normal(k1, (b, cfg.harmonic_num + 1))
        rand_ini = rand_ini.at[:, 0].set(0.0)
    rad = rad.at[:, 0, :].add(rand_ini)
    # downsample phase increments to frame rate, integrate, upsample back
    down = linear_resize(rad, int(t / upsample_scale))
    phase = jnp.cumsum(down, axis=1) * 2 * jnp.pi
    phase = linear_resize(phase * upsample_scale, t)
    sines = jnp.sin(phase) * 0.1

    uv = (f0_up > cfg.voiced_threshold).astype(jnp.float32)
    noise_amp = uv * 0.003 + (1 - uv) * 0.1 / 3
    if noise is None:
        noise = jax.random.normal(k2, sines.shape)
    noise = noise_amp * noise
    sine_waves = sines * uv + noise
    merged = jnp.tanh(layers.linear(params["m_source"]["l_linear"], sine_waves))
    return merged  # (B, T, 1)


def generator(params, cfg: KokoroConfig, x, style, f0_curve, valid_frames,
              key, rand_ini=None, noise=None, har_override=None):
    """iSTFT-NSF generator (Generator.swift:136-199). x (1, 2F, 512),
    f0_curve (1, 2F) → audio (1, samples).

    har_override replaces the internally-computed source spectrum (parity
    tests: the STFT *phase* of near-silent bins sits on the ±π branch cut,
    where any two float implementations chaotically disagree by 2π, so the
    decoder stack is verified against torch with a shared spectrum)."""
    gp = params["decoder"]["generator"]
    n_fft, hop = cfg.istft_n_fft, cfg.istft_hop
    up_total = int(np.prod(cfg.upsample_rates)) * hop  # 300

    if har_override is None:
        # f0Upsample is MLX Upsample with default NEAREST mode
        # (Generator.swift:50 + MLXNN default) — round-3 fix: was linear
        f0_up = jnp.repeat(f0_curve[..., None], up_total, axis=1)
        har_source = sine_source(gp, cfg, f0_up, key, rand_ini=rand_ini,
                                 noise=noise)[..., 0]
        har_mag, har_phase = _kokoro_stft(har_source, n_fft, hop)
        har = jnp.concatenate([har_mag, har_phase], axis=-1)
    else:
        har = har_override  # (1, frames, n_fft+2)

    valid = valid_frames
    n_kernels = len(cfg.resblock_kernels)
    for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernels)):
        x = layers.leaky_relu(x, 0.1)
        if i + 1 < len(cfg.upsample_rates):
            stride_f0 = int(np.prod(cfg.upsample_rates[i + 1:]))
            x_source = layers.conv1d(gp["noise_convs"][str(i)], har,
                                     stride=stride_f0,
                                     padding=(stride_f0 + 1) // 2)
        else:
            x_source = layers.conv1d(gp["noise_convs"][str(i)], har)
        x = _wn_conv_transpose(gp["ups"][str(i)], x, stride=u,
                               padding=(k - u) // 2)
        valid = valid * u
        if i == len(cfg.upsample_rates) - 1:
            x = jnp.pad(x, ((0, 0), (1, 0), (0, 0)), mode="reflect")
            valid = valid + 1
        t = min(x.shape[1], x_source.shape[1])
        # noise_res blocks are fixed k7/k11 with dilations (1,3,5)
        # regardless of the resblock config (Generator.swift:82-107)
        noise_kernel = 7 if i + 1 < len(cfg.upsample_rates) else 11
        x_source = gen_res_block(gp["noise_res"][str(i)], x_source[:, :t],
                                 style, valid, (1, 3, 5), noise_kernel)
        x = x[:, :t] + x_source
        xs = None
        for j in range(n_kernels):
            r = gen_res_block(gp["resblocks"][str(i * n_kernels + j)], x,
                              style, valid, cfg.resblock_dilations[j],
                              cfg.resblock_kernels[j])
            xs = r if xs is None else xs + r
        x = xs / n_kernels

    x = layers.leaky_relu(x, 0.01)
    x = _wn_conv(gp["conv_post"], x, padding=3)
    k = n_fft // 2 + 1
    spec = jnp.exp(x[..., :k])
    phase = jnp.sin(x[..., k:])
    return _kokoro_istft(spec, phase, n_fft, hop)


def decode(params, cfg: KokoroConfig, asr, f0_curve, n_curve, style,
           valid_frames, key):
    """KokoroDecoder (KokoroDecoder.swift:85-115): prosody downsample,
    encode block, residual-conditioned decode blocks, generator."""
    dp = params["decoder"]
    f0 = _wn_conv(dp["F0_conv"], f0_curve[..., None], stride=2, padding=1)
    n = _wn_conv(dp["N_conv"], n_curve[..., None], stride=2, padding=1)

    x = jnp.concatenate([asr, f0, n], axis=-1)
    x, _ = adain_res_blk1d(dp["encode"], cfg, x, style, valid_frames)
    asr_res = _wn_conv(dp["asr_res"]["0"], asr)

    res = True
    valid = valid_frames
    for i in range(4):
        if res:
            x = jnp.concatenate([x, asr_res, f0, n], axis=-1)
        upsample = i == 3
        x, valid = adain_res_blk1d(dp["decode"][str(i)], cfg, x, style, valid,
                                   upsample=upsample)
        if upsample:
            res = False
    return generator(params, cfg, x, style, f0_curve, valid, key)
