"""Torch Kokoro iSTFT-NSF generator, translated from the Swift reference.

Source: /root/reference/package/TTS/Kokoro/
  - Decoder/Generator.swift:11-193 — NSF source (nearest-upsampled F0 →
    harmonic sines) → STFT(mag, atan2-phase) → per-stage [leaky(0.1) →
    noise_conv(har) → AdaIN-res(noise) → weight-norm convT → (last:
    reflect-pad left 1) → add → mean of AdaIN resblocks] → leaky(0.01) →
    conv_post → exp-mag / sin-phase → iSTFT.
  - BuildingBlocks/AdaINResBlock1.swift:11-113 — AdaIN → snake (scalar
    alpha) → conv(dilated) → AdaIN → snake → conv, residual.
  - BuildingBlocks/AdaIN1d.swift — InstanceNorm(affine=False) then
    (1+gamma)·x+beta from fc(style).
  - BuildingBlocks/ConvWeighted.swift — weight-norm with eps 1e-7.
  - Decoder/KokoroSineGen.swift — rad = (f0/sr) % 1, random first-step
    phase (injectable), linear-downsample by upsample_scale, cumsum,
    ×2π, linear-upsample back, sin.
  - Decoder/MLXSTFT.swift — centered reflect STFT; inverse divides the
    windowed OLA by the OLA of the WINDOW (not window²).
"""

from __future__ import annotations

import torch
import torch.nn.functional as F
from torch import nn


class WNConv(nn.Module):
    """Weight-normalized Conv1d (eps 1e-7, norm over all dims but 0)."""

    def __init__(self, i, o, k, stride=1, padding=0, dilation=1):
        super().__init__()
        self.stride, self.padding, self.dilation = stride, padding, dilation
        w = torch.randn(o, i, k) * 0.05
        g = w.pow(2).sum(dim=(1, 2), keepdim=True).sqrt()
        self.weight_g = nn.Parameter(g)
        self.weight_v = nn.Parameter(w)
        self.bias = nn.Parameter(torch.zeros(o))

    def forward(self, x):
        norm = self.weight_v.pow(2).sum(dim=(1, 2), keepdim=True).sqrt()
        w = self.weight_v / (norm + 1e-7) * self.weight_g
        return F.conv1d(x, w, self.bias, self.stride, self.padding,
                        self.dilation)


class WNConvT(nn.Module):
    def __init__(self, i, o, k, stride, padding):
        super().__init__()
        self.stride, self.padding = stride, padding
        w = torch.randn(i, o, k) * 0.05
        g = w.pow(2).sum(dim=(1, 2), keepdim=True).sqrt()
        self.weight_g = nn.Parameter(g)
        self.weight_v = nn.Parameter(w)
        self.bias = nn.Parameter(torch.zeros(o))

    def forward(self, x):
        norm = self.weight_v.pow(2).sum(dim=(1, 2), keepdim=True).sqrt()
        w = self.weight_v / (norm + 1e-7) * self.weight_g
        return F.conv_transpose1d(x, w, self.bias, self.stride, self.padding)


class AdaIN1d(nn.Module):
    def __init__(self, style_dim, ch):
        super().__init__()
        self.fc = nn.Linear(style_dim, ch * 2)

    def forward(self, x, s):
        h = self.fc(s)[:, :, None]
        gamma, beta = h.chunk(2, dim=1)
        return (1 + gamma) * F.instance_norm(x) + beta


class AdaINResBlock1(nn.Module):
    def __init__(self, ch, k, dils, style_dim):
        super().__init__()
        self.k, self.dils = k, dils
        self.convs1 = nn.ModuleList(
            [WNConv(ch, ch, k, padding=(k * d - d) // 2, dilation=d)
             for d in dils])
        self.convs2 = nn.ModuleList(
            [WNConv(ch, ch, k, padding=(k - 1) // 2) for _ in dils])
        self.adain1 = nn.ModuleList([AdaIN1d(style_dim, ch) for _ in dils])
        self.adain2 = nn.ModuleList([AdaIN1d(style_dim, ch) for _ in dils])
        self.alpha1 = nn.ParameterList(
            [nn.Parameter(torch.ones(1)) for _ in dils])
        self.alpha2 = nn.ParameterList(
            [nn.Parameter(torch.ones(1)) for _ in dils])

    def forward(self, x, s):
        for c1, c2, n1, n2, a1, a2 in zip(self.convs1, self.convs2,
                                          self.adain1, self.adain2,
                                          self.alpha1, self.alpha2):
            xt = n1(x, s)
            xt = xt + (1 / a1) * torch.sin(a1 * xt) ** 2
            xt = c1(xt)
            xt = n2(xt, s)
            xt = xt + (1 / a2) * torch.sin(a2 * xt) ** 2
            xt = c2(xt)
            x = xt + x
        return x


def sine_gen(f0_up, harmonics, sr, upsample_scale, sine_amp, noise_std,
             voiced_thr, rand_ini, noise):
    """f0_up (B, T, 1) at sample rate (nearest-upsampled); rand_ini
    (B, H+1) cycles with index 0 == 0; noise (B, T, H+1) std normal."""
    mult = torch.arange(1, harmonics + 2, dtype=torch.float32)
    fn = f0_up * mult.reshape(1, 1, -1)
    rad = (fn / sr) % 1
    rad[:, 0, :] = rad[:, 0, :] + rand_ini
    t = rad.shape[1]
    down = F.interpolate(rad.transpose(1, 2),
                         scale_factor=1 / upsample_scale,
                         mode="linear").transpose(1, 2)
    phase = torch.cumsum(down, dim=1) * 2 * torch.pi
    phase = F.interpolate(phase.transpose(1, 2) * upsample_scale,
                          scale_factor=upsample_scale,
                          mode="linear").transpose(1, 2)
    sines = torch.sin(phase) * sine_amp
    uv = (f0_up > voiced_thr).float()
    namp = uv * noise_std + (1 - uv) * sine_amp / 3
    return sines[:, :t] * uv + namp * noise


class KokoroGenerator(nn.Module):
    def __init__(self, style_dim=8, resblock_kernels=(3, 7),
                 upsample_rates=(5, 4), upsample_initial_channel=32,
                 resblock_dilations=((1, 3), (1, 3)),
                 upsample_kernels=(10, 8), n_fft=16, hop=4,
                 harmonics=4, sample_rate=24000, voiced_thr=10.0):
        super().__init__()
        self.nk = len(resblock_kernels)
        self.n_fft, self.hop = n_fft, hop
        self.harmonics = harmonics
        self.sample_rate = sample_rate
        self.voiced_thr = voiced_thr
        self.up_scale = hop
        for r in upsample_rates:
            self.up_scale *= r
        self.upsample_rates = upsample_rates
        self.l_linear = nn.Linear(harmonics + 1, 1)
        self.ups = nn.ModuleList()
        for i, (u, k) in enumerate(zip(upsample_rates, upsample_kernels)):
            self.ups.append(WNConvT(upsample_initial_channel // (2 ** i),
                                    upsample_initial_channel // (2 ** (i + 1)),
                                    k, u, (k - u) // 2))
        self.noise_convs = nn.ModuleList()
        self.noise_res = nn.ModuleList()
        self.resblocks = nn.ModuleList()
        import numpy as np
        for i in range(len(upsample_rates)):
            ch = upsample_initial_channel // (2 ** (i + 1))
            for k, d in zip(resblock_kernels, resblock_dilations):
                self.resblocks.append(AdaINResBlock1(ch, k, d, style_dim))
            if i + 1 < len(upsample_rates):
                sf0 = int(np.prod(upsample_rates[i + 1:]))
                self.noise_convs.append(nn.Conv1d(
                    n_fft + 2, ch, sf0 * 2, stride=sf0,
                    padding=(sf0 + 1) // 2))
                self.noise_res.append(AdaINResBlock1(ch, 7, (1, 3, 5),
                                                     style_dim))
            else:
                self.noise_convs.append(nn.Conv1d(n_fft + 2, ch, 1))
                self.noise_res.append(AdaINResBlock1(ch, 11, (1, 3, 5),
                                                     style_dim))
        last = upsample_initial_channel // (2 ** len(upsample_rates))
        self.conv_post = WNConv(last, (n_fft // 2 + 1) * 2, 7, padding=3)
        self.register_buffer("window",
                             torch.hann_window(n_fft, periodic=True),
                             persistent=False)

    def _stft(self, x):
        spec = torch.stft(x, self.n_fft, self.hop, self.n_fft, self.window,
                          center=True, pad_mode="reflect",
                          return_complex=True)  # (B, K, frames)
        return spec.abs(), torch.atan2(spec.imag, spec.real)

    def _istft(self, mag, phase):
        spec = torch.polar(mag, phase)  # (B, K, nF)
        frames = torch.fft.irfft(spec.transpose(1, 2), n=self.n_fft, dim=-1)
        frames = frames * self.window
        b, nf, _ = frames.shape
        out_len = (nf - 1) * self.hop + self.n_fft
        out = torch.zeros(b, out_len)
        wsum = torch.zeros(out_len)
        for f in range(nf):
            out[:, f * self.hop: f * self.hop + self.n_fft] += frames[:, f]
            wsum[f * self.hop: f * self.hop + self.n_fft] += self.window
        out = torch.where(wsum != 0, out / wsum, out)
        pad = self.n_fft // 2
        return out[:, pad: out_len - pad]

    def forward(self, x, s, f0_curve, rand_ini, noise, har_spec=None):
        """x (B, C, T2); s (B, style); f0_curve (B, T2); rand_ini (B, H+1)
        cycles (index 0 zero); noise (B, T2·up_scale, H+1). har_spec
        overrides the source spectrum (see the JAX side's har_override —
        the ±π phase branch of near-silent bins is fp-chaotic)."""
        if har_spec is None:
            f0_up = f0_curve[:, :, None].repeat_interleave(self.up_scale,
                                                           dim=1)
            sines = sine_gen(f0_up, self.harmonics, self.sample_rate,
                             float(self.up_scale), 0.1, 0.003,
                             self.voiced_thr, rand_ini, noise)
            har = torch.tanh(self.l_linear(sines))[:, :, 0]
            mag, ph = self._stft(har)
            har_spec = torch.cat([mag, ph], dim=1)  # (B, n_fft+2, frames)
        for i in range(len(self.ups)):
            x = F.leaky_relu(x, 0.1)
            xs = self.noise_res[i](self.noise_convs[i](har_spec), s)
            x = self.ups[i](x)
            if i == len(self.ups) - 1:
                x = torch.cat([x[:, :, 1:2], x], dim=2)
            t = min(x.shape[2], xs.shape[2])
            x = x[:, :, :t] + xs[:, :, :t]
            acc = None
            for j in range(self.nk):
                r = self.resblocks[i * self.nk + j](x, s)
                acc = r if acc is None else acc + r
            x = acc / self.nk
        x = F.leaky_relu(x, 0.01)
        x = self.conv_post(x)
        k = self.n_fft // 2 + 1
        spec = torch.exp(x[:, :k])
        phase = torch.sin(x[:, k:])
        return self._istft(spec, phase)
