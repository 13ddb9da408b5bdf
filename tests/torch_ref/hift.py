"""Torch HiFT-Net vocoder, translated from the Swift reference.

Source: /root/reference/package/Codec/S3Gen/HiFiGAN.swift +
F0Predictor.swift
  - Snake :30-70 (x + (1/α)·sin²(αx), α magnitude clamped at 1e-4 with
    sign preserved, ≈0 → +1e-4)
  - HiFiGANResBlock :75-131 (snake→conv(dil)→snake→conv(1), residual)
  - SineGen :137-202 (harmonic phase cumsum, random phase offsets for
    harmonics>0, uv gating, noise mix — injectable here for determinism)
  - SourceModuleHnNSF :207-252 (tanh(linear(harmonic sines)))
  - stftHiFiGAN :257-296 / istftHiFiGAN :298-367 (centered reflect pad,
    magnitude clip 1e2, conjugate-symmetric ifft, window-sumsquare OLA)
  - HiFTGenerator :372-624 (conv_pre k7 → per-stage [leaky→convT →
    (last: left reflect-pad 1) → +source-branch → mean of resblocks] →
    leaky → conv_post → exp-mag / sin-phase → iSTFT → clip ±0.99)
  - ConvRNNF0Predictor (F0Predictor.swift:15-62): 5× conv k3 + ELU →
    |linear|
"""

from __future__ import annotations

import torch
import torch.nn.functional as F
from torch import nn


def snake(x, alpha):
    a = alpha.reshape(1, -1, 1)
    sign = torch.where(a.abs() < 1e-9, torch.ones_like(a), a.sign())
    a_c = sign * a.abs().clamp_min(1e-4)
    return x + torch.sin(x * a) ** 2 / a_c


class ResBlock(nn.Module):
    def __init__(self, ch, k, dils):
        super().__init__()
        self.k, self.dils = k, dils
        self.convs1 = nn.ModuleList(
            [nn.Conv1d(ch, ch, k, padding=(k * d - d) // 2, dilation=d)
             for d in dils])
        self.convs2 = nn.ModuleList(
            [nn.Conv1d(ch, ch, k, padding=(k - 1) // 2) for _ in dils])
        self.alphas1 = nn.ParameterList(
            [nn.Parameter(torch.ones(ch)) for _ in dils])
        self.alphas2 = nn.ParameterList(
            [nn.Parameter(torch.ones(ch)) for _ in dils])

    def forward(self, x):
        for c1, c2, a1, a2 in zip(self.convs1, self.convs2, self.alphas1,
                                  self.alphas2):
            xt = c2(snake(c1(snake(x, a1)), a2))
            x = x + xt
        return x


class ConvRNNF0Predictor(nn.Module):
    def __init__(self, in_channels=80, cond=512):
        super().__init__()
        self.condnet = nn.ModuleList(
            [nn.Conv1d(in_channels if i == 0 else cond, cond, 3, padding=1)
             for i in range(5)])
        self.classifier = nn.Linear(cond, 1)

    def forward(self, mel):  # (B, C, T) -> (B, T)
        x = mel
        for c in self.condnet:
            x = F.elu(c(x))
        return self.classifier(x.transpose(1, 2)).squeeze(-1).abs()


def sine_gen(f0, harmonics, sr, sine_amp, noise_std, voiced_thr,
             phase_vec, noise):
    """f0 (B, 1, T) at sample rate; phase_vec (B, H+1, 1) radians (index 0
    zeroed by the caller); noise (B, H+1, T) standard normal."""
    mult = torch.arange(1, harmonics + 2, dtype=torch.float32).reshape(1, -1, 1)
    fmat = f0 * mult / sr
    theta = 2 * torch.pi * (torch.cumsum(fmat, dim=-1) % 1)
    sines = sine_amp * torch.sin(theta + phase_vec)
    uv = (f0 > voiced_thr).float()
    namp = uv * noise_std + (1 - uv) * sine_amp / 3
    return sines * uv + namp * noise


class HiFTGenerator(nn.Module):
    def __init__(self, in_channels=80, base_channels=512, nb_harmonics=8,
                 sampling_rate=24000, nsf_alpha=0.1, nsf_sigma=0.003,
                 nsf_voiced_threshold=10.0, upsample_rates=(8, 5, 3),
                 upsample_kernels=(16, 11, 7), n_fft=16, hop=4,
                 resblock_kernels=(3, 7, 11),
                 resblock_dilations=((1, 3, 5),) * 3,
                 source_resblock_kernels=(7, 7, 11),
                 source_resblock_dilations=((1, 3, 5),) * 3,
                 lrelu_slope=0.1, audio_limit=0.99):
        super().__init__()
        self.cfg = dict(locals())
        self.n_fft, self.hop = n_fft, hop
        self.lrelu_slope, self.audio_limit = lrelu_slope, audio_limit
        self.nb_harmonics = nb_harmonics
        self.sampling_rate = sampling_rate
        self.nsf = (nsf_alpha, nsf_sigma, nsf_voiced_threshold)
        self.upsample_rates = upsample_rates
        self.up_scale = hop
        for r in upsample_rates:
            self.up_scale *= r

        self.l_linear = nn.Linear(nb_harmonics + 1, 1)
        self.conv_pre = nn.Conv1d(in_channels, base_channels, 7, padding=3)
        self.ups = nn.ModuleList()
        for i, (u, k) in enumerate(zip(upsample_rates, upsample_kernels)):
            self.ups.append(nn.ConvTranspose1d(
                base_channels // (1 << i), base_channels // (1 << (i + 1)),
                k, stride=u, padding=(k - u) // 2))
        # source downsample strides = reversed cumulative rates
        down = [1] + list(upsample_rates[::-1])[:-1]
        cum, c = [], 1
        for r in down:
            c *= r
            cum.append(c)
        self.source_downs = nn.ModuleList()
        self.source_resblocks = nn.ModuleList()
        for i, (u, (k, d)) in enumerate(zip(
                cum[::-1], zip(source_resblock_kernels,
                               source_resblock_dilations))):
            ch = base_channels // (1 << (i + 1))
            if u == 1:
                self.source_downs.append(nn.Conv1d(n_fft + 2, ch, 1))
            else:
                self.source_downs.append(
                    nn.Conv1d(n_fft + 2, ch, u * 2, stride=u, padding=u // 2))
            self.source_resblocks.append(ResBlock(ch, k, d))
        self.resblocks = nn.ModuleList()
        for i in range(len(upsample_rates)):
            ch = base_channels // (1 << (i + 1))
            for k, d in zip(resblock_kernels, resblock_dilations):
                self.resblocks.append(ResBlock(ch, k, d))
        self.conv_post = nn.Conv1d(
            base_channels // (1 << len(upsample_rates)), n_fft + 2, 7,
            padding=3)
        self.f0_predictor = ConvRNNF0Predictor(in_channels)
        self.register_buffer(
            "window", torch.hann_window(n_fft, periodic=True),
            persistent=False)

    # ---- stft helpers (manual, mirroring the Swift implementations)
    def _stft(self, x):
        pad = self.n_fft // 2
        left = x[:, 1:pad + 1].flip(1)
        right = x[:, -(pad + 1):-1].flip(1)
        xp = torch.cat([left, x, right], dim=1)
        frames = xp.unfold(1, self.n_fft, self.hop)  # (B, nF, n_fft)
        frames = frames * self.window
        spec = torch.fft.rfft(frames, dim=-1)  # (B, nF, K)
        return spec.real.transpose(1, 2), spec.imag.transpose(1, 2)

    def _istft(self, mag, phase):
        mag = mag.clamp(max=1e2)
        spec = torch.polar(mag, phase).transpose(1, 2)  # (B, nF, K)
        frames = torch.fft.irfft(spec, n=self.n_fft, dim=-1) * self.window
        b, nf, _ = frames.shape
        out_len = (nf - 1) * self.hop + self.n_fft
        out = torch.zeros(b, out_len)
        wsum = torch.zeros(out_len)
        for f in range(nf):
            out[:, f * self.hop: f * self.hop + self.n_fft] += frames[:, f]
            wsum[f * self.hop: f * self.hop + self.n_fft] += self.window ** 2
        out = out / wsum.clamp_min(1e-8)
        pad = self.n_fft // 2
        return out[:, pad: out_len - pad]

    def decode(self, mel, s):
        sr, si = self._stft(s.squeeze(1))
        s_stft = torch.cat([sr, si], dim=1)  # (B, n_fft+2, nF)
        x = self.conv_pre(mel)
        nk = len(self.cfg["resblock_kernels"])
        for i in range(len(self.ups)):
            x = F.leaky_relu(x, self.lrelu_slope)
            x = self.ups[i](x)
            if i == len(self.ups) - 1:
                x = torch.cat([x[:, :, 1:2], x], dim=2)
            si_ = self.source_resblocks[i](self.source_downs[i](s_stft))
            x = x + si_
            acc = None
            for j in range(nk):
                r = self.resblocks[i * nk + j](x)
                acc = r if acc is None else acc + r
            x = acc / nk
        x = F.leaky_relu(x, self.lrelu_slope)
        x = self.conv_post(x)
        k = self.n_fft // 2 + 1
        mag = torch.exp(x[:, :k])
        phase = torch.sin(x[:, k:])
        audio = self._istft(mag, phase)
        return audio.clamp(-self.audio_limit, self.audio_limit)

    def forward(self, mel, phase_vec, noise):
        """mel (B, C, T); phase_vec (B, H+1, 1) radians with index 0 = 0;
        noise (B, H+1, T·up_scale) standard normal."""
        alpha, sigma, thr = self.nsf
        f0 = self.f0_predictor(mel)
        s = f0.unsqueeze(1).repeat_interleave(self.up_scale, dim=2)
        sines = sine_gen(s, self.nb_harmonics, self.sampling_rate, alpha,
                         sigma, thr, phase_vec, noise)
        merged = torch.tanh(self.l_linear(sines.transpose(1, 2)))
        source = merged.transpose(1, 2)  # (B, 1, T)
        return self.decode(mel, source), source
