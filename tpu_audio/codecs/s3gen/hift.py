"""HiFT-Net vocoder: mel → F0 → harmonic NSF source → iSTFT synthesis.

Reference: package/Codec/S3Gen/HiFiGAN.swift:380-624 + F0Predictor.swift —
ConvRNN F0 predictor (5× conv k3 + ELU → |linear|), SourceModuleHnNSF
harmonic sine source, source-STFT fusion into the upsample stack
(rates 8/5/3 kernels 16/11/7 for the 24 kHz S3Gen build — S3Gen.swift:
250-257), magnitude/phase head, iSTFT n_fft 16 hop 4, ±0.99 clip.
Source cache in/out supports glitch-free streaming.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from tpu_audio.nn import layers
from tpu_audio.ops import windows


@dataclass(frozen=True)
class HiFTConfig:
    in_channels: int = 80
    base_channels: int = 512
    nb_harmonics: int = 8
    sampling_rate: int = 24000
    nsf_alpha: float = 0.1
    nsf_sigma: float = 0.003
    nsf_voiced_threshold: float = 10.0
    upsample_rates: tuple = (8, 5, 3)
    upsample_kernels: tuple = (16, 11, 7)
    istft_n_fft: int = 16
    istft_hop: int = 4
    resblock_kernels: tuple = (3, 7, 11)
    resblock_dilations: tuple = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    source_resblock_kernels: tuple = (7, 7, 11)
    source_resblock_dilations: tuple = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    lrelu_slope: float = 0.1
    audio_limit: float = 0.99

    @property
    def upsample_scale(self) -> int:
        s = self.istft_hop
        for r in self.upsample_rates:
            s *= r
        return s  # samples per mel frame (480)


# ------------------------------------------------------------------ init

def _res_block_init(ks, ch, kernel, dils, dtype):
    # HiFiGANResBlock (HiFiGAN.swift:75-131): each conv is preceded by a
    # SNAKE activation with a learned per-channel alpha (round-3 fix —
    # previously leaky-relu, a silent drift vs the checkpoint)
    return {
        "convs1": {str(i): layers.init_conv1d(next(ks), ch, ch, kernel,
                                              dtype=dtype)
                   for i in range(len(dils))},
        "convs2": {str(i): layers.init_conv1d(next(ks), ch, ch, kernel,
                                              dtype=dtype)
                   for i in range(len(dils))},
        "activations1": {str(i): {"alpha": jnp.ones((ch,), dtype)}
                         for i in range(len(dils))},
        "activations2": {str(i): {"alpha": jnp.ones((ch,), dtype)}
                         for i in range(len(dils))},
    }


def _snake(x, alpha):
    """Snake with fp16-safe alpha clamp (HiFiGAN.swift:30-70): magnitude
    floored at 1e-4, sign preserved (alpha≈0 falls back to +1e-4)."""
    a = alpha[None, None, :].astype(jnp.float32)
    sign = jnp.where(jnp.abs(a) < 1e-9, 1.0, jnp.sign(a))
    a_c = sign * jnp.maximum(jnp.abs(a), 1e-4)
    xf = x.astype(jnp.float32)
    return (xf + jnp.sin(xf * a) ** 2 / a_c).astype(x.dtype)


def init_params(key, cfg: HiFTConfig, dtype=jnp.float32) -> dict:
    ks = iter(jax.random.split(key, 128))
    bc = cfg.base_channels
    nfft = cfg.istft_n_fft
    p = {
        "m_source": {"l_linear": layers.init_linear(
            next(ks), cfg.nb_harmonics + 1, 1, True, dtype)},
        "conv_pre": layers.init_conv1d(next(ks), cfg.in_channels, bc, 7,
                                       dtype=dtype),
        "ups": {}, "source_downs": {}, "source_resblocks": {},
        "resblocks": {},
        "conv_post": layers.init_conv1d(next(ks), bc // (1 << len(cfg.upsample_rates)),
                                        nfft + 2, 7, dtype=dtype),
        "f0_predictor": {
            "condnet": {str(i): layers.init_conv1d(
                next(ks), cfg.in_channels if i == 0 else 512, 512, 3,
                dtype=dtype) for i in range(5)},
            "classifier": layers.init_linear(next(ks), 512, 1, True, dtype),
        },
    }
    for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernels)):
        p["ups"][str(i)] = layers.init_conv1d(
            next(ks), bc // (1 << i), bc // (1 << (i + 1)), k, dtype=dtype)
    # source downsample rates: cumulative products of reversed rates
    down_rates = [1] + list(reversed(cfg.upsample_rates))[:-1]
    cum = []
    c = 1
    for r in down_rates:
        c *= r
        cum.append(c)
    for i, u in enumerate(reversed(cum)):
        ch = bc // (1 << (i + 1))
        if u == 1:
            p["source_downs"][str(i)] = layers.init_conv1d(
                next(ks), nfft + 2, ch, 1, dtype=dtype)
        else:
            p["source_downs"][str(i)] = layers.init_conv1d(
                next(ks), nfft + 2, ch, u * 2, dtype=dtype)
        p["source_resblocks"][str(i)] = _res_block_init(
            ks, ch, cfg.source_resblock_kernels[i],
            cfg.source_resblock_dilations[i], dtype)
    for i in range(len(cfg.upsample_rates)):
        ch = bc // (1 << (i + 1))
        for j, (k, d) in enumerate(zip(cfg.resblock_kernels,
                                       cfg.resblock_dilations)):
            p["resblocks"][str(i * len(cfg.resblock_kernels) + j)] = \
                _res_block_init(ks, ch, k, d, dtype)
    return p


# ------------------------------------------------------------------ forward

def _res_block(p, x, kernel, dilations, slope):
    del slope  # the reference resblocks activate with Snake, not leaky-relu
    for i, d in enumerate(dilations):
        i_ = str(i)
        xt = _snake(x, p["activations1"][i_]["alpha"])
        xt = layers.conv1d(p["convs1"][i_], xt,
                           padding=(kernel * d - d) // 2, dilation=d)
        xt = _snake(xt, p["activations2"][i_]["alpha"])
        xt = layers.conv1d(p["convs2"][i_], xt, padding=(kernel - 1) // 2)
        x = x + xt
    return x


def f0_predict(p, mel: jax.Array) -> jax.Array:
    """mel (B, T, 80) → F0 (B, T)."""
    x = mel
    for i in range(5):
        x = jax.nn.elu(layers.conv1d(p["condnet"][str(i)], x, padding=1))
    return jnp.abs(layers.linear(p["classifier"], x))[..., 0]


def _position_noise(key, start_frame, n_frames: int, b: int, per: int,
                    h: int) -> jax.Array:
    """Per-mel-frame position-keyed noise (B, n_frames·per, H).

    Keyed by ABSOLUTE frame index so a windowed streaming pass draws the
    identical noise as one full pass — the property that makes
    vocode_window() reproduce generate() sample-for-sample."""
    keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(
        start_frame + jnp.arange(n_frames))
    noise = jax.vmap(lambda k: jax.random.normal(k, (b, per, h)))(keys)
    return jnp.transpose(noise, (1, 0, 2, 3)).reshape(b, n_frames * per, h)


def sine_source(p, cfg: HiFTConfig, f0_up: jax.Array, key, *,
                start_frame=0, init_phase: jax.Array | None = None,
                rand_ini: jax.Array | None = None,
                noise: jax.Array | None = None
                ) -> tuple[jax.Array, jax.Array]:
    """f0 upsampled to sample rate (B, T, 1) → (merged harmonic source,
    end phase (B, H)) (SourceModuleHnNSF, HiFiGAN.swift:141-255). Unlike
    Kokoro's SineGen, phases integrate directly at sample rate.

    init_phase continues the cumulative phase from a previous window
    (streaming); start_frame is the absolute mel-frame index of f0_up[ :,0]
    for position-keyed noise. The returned phase is mod 1, which also keeps
    long streams inside f32 precision (a full-pass cumsum degrades past
    ~minutes of audio)."""
    per = cfg.upsample_scale
    harmonics = jnp.arange(1, cfg.nb_harmonics + 2, dtype=jnp.float32)
    fn = f0_up * harmonics[None, None, :] / cfg.sampling_rate
    k1, k2 = jax.random.split(key)
    rad = jnp.cumsum(fn % 1.0, axis=1)
    if init_phase is not None:
        rad = rad + init_phase[:, None, :]
    end_phase = rad[:, -1, :] % 1.0
    if rand_ini is None:  # parity tests inject fixed phase offsets / noise
        rand_ini = jax.random.uniform(k1, (f0_up.shape[0],
                                           cfg.nb_harmonics + 1))
        rand_ini = rand_ini.at[:, 0].set(0.0)
    sines = jnp.sin(2 * jnp.pi * (rad + rand_ini[:, None, :]))
    uv = (f0_up > cfg.nsf_voiced_threshold).astype(jnp.float32)
    noise_amp = uv * cfg.nsf_sigma + (1 - uv) * cfg.nsf_alpha / 3
    if noise is None:
        noise = _position_noise(k2, start_frame, f0_up.shape[1] // per,
                                f0_up.shape[0], per, cfg.nb_harmonics + 1)
    noise = noise_amp * noise
    sine_waves = sines * cfg.nsf_alpha * uv + noise
    return jnp.tanh(layers.linear(p["l_linear"], sine_waves)), end_phase


def _stft(x: jax.Array, n_fft: int, hop: int):
    """Real/imag STFT with centered reflect padding (stftHiFiGAN)."""
    from tpu_audio.ops import stft as stft_ops

    win = windows.hann(n_fft, periodic=True)
    spec = stft_ops.stft_complex(x, win, n_fft, hop, center=True)
    return jnp.real(spec), jnp.imag(spec)  # (B, frames, K)


def _istft(mag: jax.Array, phase: jax.Array, n_fft: int, hop: int):
    from tpu_audio.ops import stft as stft_ops

    win_np = windows.hann(n_fft, periodic=True)
    win = jnp.asarray(win_np)
    mag = jnp.minimum(mag, 1e2)  # istftHiFiGAN clips (HiFiGAN.swift:300)
    # explicit cos/sin instead of exp(1j·φ): complex exp is an
    # unimplemented single op on the TPU backend in eager mode
    spec = jax.lax.complex(mag * jnp.cos(phase), mag * jnp.sin(phase))
    frames = jnp.fft.irfft(spec, n=n_fft, axis=-1) * win
    nf = frames.shape[1]
    out_len = (nf - 1) * hop + n_fft
    out = stft_ops.overlap_add(frames, hop)
    wsq = np.maximum(stft_ops.window_sumsquare(win_np, nf, hop, n_fft), 1e-11)
    out = out / jnp.asarray(wsq, out.dtype)
    return out[:, n_fft // 2: out_len - n_fft // 2]


def decode(params, cfg: HiFTConfig, mel: jax.Array, source: jax.Array):
    """mel (B, T, 80) + source (B, T*480) → waveform (B, T*480)."""
    sr, si_ = _stft(source, cfg.istft_n_fft, cfg.istft_hop)
    s_stft = jnp.concatenate([sr, si_], axis=-1)  # (B, frames, n_fft+2)

    x = layers.conv1d(params["conv_pre"], mel, padding=3)
    n_up = len(cfg.upsample_rates)
    nk = len(cfg.resblock_kernels)
    for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernels)):
        x = jax.nn.leaky_relu(x, cfg.lrelu_slope)
        x = layers.conv_transpose1d(params["ups"][str(i)], x, stride=u,
                                    padding=(k - u) // 2)
        if i == n_up - 1:
            x = jnp.concatenate([x[:, 1:2], x], axis=1)  # reflect pad left 1
        # source fusion
        sd = params["source_downs"][str(i)]
        down_k = sd["weight"].shape[0]
        if down_k == 1:
            si = layers.conv1d(sd, s_stft)
        else:
            stride = down_k // 2
            si = layers.conv1d(sd, s_stft, stride=stride, padding=stride // 2)
        si = _res_block(params["source_resblocks"][str(i)], si,
                        cfg.source_resblock_kernels[i],
                        cfg.source_resblock_dilations[i], cfg.lrelu_slope)
        t = min(x.shape[1], si.shape[1])
        x = x[:, :t] + si[:, :t]
        xs = None
        for j in range(nk):
            r = _res_block(params["resblocks"][str(i * nk + j)], x,
                           cfg.resblock_kernels[j], cfg.resblock_dilations[j],
                           cfg.lrelu_slope)
            xs = r if xs is None else xs + r
        x = xs / nk
    x = jax.nn.leaky_relu(x, cfg.lrelu_slope)
    x = layers.conv1d(params["conv_post"], x, padding=3)
    k = cfg.istft_n_fft // 2 + 1
    mag = jnp.exp(x[..., :k])
    phase = jnp.sin(x[..., k:])
    audio = _istft(mag, phase, cfg.istft_n_fft, cfg.istft_hop)
    return jnp.clip(audio, -cfg.audio_limit, cfg.audio_limit)


def generate(params, cfg: HiFTConfig, mel: jax.Array, key,
             cache_source: jax.Array | None = None):
    """Full vocoder pass (HiFiGAN.swift:595-619): returns (audio, source)
    where source can be cached and re-injected for streaming continuity."""
    f0 = f0_predict(params["f0_predictor"], mel)
    f0_up = jnp.repeat(f0[..., None], cfg.upsample_scale, axis=1)
    source = sine_source(params["m_source"], cfg, f0_up, key)[0][..., 0]
    if cache_source is not None and cache_source.shape[1] > 0:
        n = cache_source.shape[1]
        source = jnp.concatenate([cache_source, source[:, n:]], axis=1)
    audio = decode(params, cfg, mel, source)
    return audio, source


# ------------------------------------------------------------------ streaming

LOOKBACK_FRAMES = 32  # > the stack's total receptive field (~15 mel frames)


def vocode_window(params, cfg: HiFTConfig, mel: jax.Array, key,
                  phase: jax.Array, source_tail: jax.Array, start_frame):
    """O(1)-per-chunk streaming vocoder window.

    The upstream (reference CosyVoice3Model.swift:605-649 and PyTorch
    CosyVoice) re-vocodes the FULL accumulated mel every chunk — O(n²) over
    an utterance, with per-chunk latency growing linearly. Every op in HiFT
    downstream of the sine source has a finite receptive field, so a window
    with LOOKBACK_FRAMES of exact left context reproduces the full pass
    exactly; the two unbounded dependencies are carried as state:
    the cumulative sine phase (`phase`, (B, H) at the window's first NEW
    frame) and the already-computed source samples for the lookback region
    (`source_tail`, (B, Lb·per)).

    mel: (B, Lb+N, 80) ending at the emit boundary; start_frame: absolute
    index of the first new frame (position-keyed noise).
    Returns (audio (B, (Lb+N)·per), new_phase, source (B, (Lb+N)·per)).
    """
    per = cfg.upsample_scale
    lb = source_tail.shape[1] // per
    f0 = f0_predict(params["f0_predictor"], mel)
    f0_new = f0[:, lb:]
    f0_up = jnp.repeat(f0_new[..., None], per, axis=1)
    src_new, new_phase = sine_source(params["m_source"], cfg, f0_up, key,
                                     start_frame=start_frame,
                                     init_phase=phase)
    source = jnp.concatenate([source_tail, src_new[..., 0]], axis=1)
    audio = decode(params, cfg, mel, source)
    return audio, new_phase, source
