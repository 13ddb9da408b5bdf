"""Torch SNAC decoder, translated from the Swift reference.

Source: /root/reference/package/TTS/Orpheus/SNAC/
  - SNACDecoder.swift:16-489 (structure, embedCodes :329-409, snake :411-419)
  - WNConv1d.swift:13-100 (weight norm g·v/||v||, norm over all dims but 0)
  - ConvWeightedTranspose1d.swift:13-100 (weight_v (I, K, O/g), norm over
    (1,2) per input channel; padding ceil(stride/2), output_padding stride%2)
  - ResidualUnit.swift:13-100 (snake→conv k7 dil→snake→conv 1×1, residual)
  - NoiseBlock.swift:13-42 (x + N(0,1)·linear(x); the test injects fixed
    noise for determinism)

Channel layout is torch-native (B, C, T); the Swift file's transposes are
MLX-layout bookkeeping with no numeric effect.
"""

from __future__ import annotations

import torch
import torch.nn.functional as F
from torch import nn


class WNConv1d(nn.Module):
    def __init__(self, i, o, k, stride=1, padding=0, dilation=1, groups=1,
                 bias=True):
        super().__init__()
        self.stride, self.padding = stride, padding
        self.dilation, self.groups = dilation, groups
        w = torch.empty(o, i // groups, k).uniform_(
            -((1 / (i * k)) ** 0.5), (1 / (i * k)) ** 0.5)
        g = w.pow(2).sum(dim=(1, 2), keepdim=True).sqrt()
        self.weight_g = nn.Parameter(g)
        self.weight_v = nn.Parameter(w / (g + 1e-12))
        self.bias = nn.Parameter(torch.zeros(o)) if bias else None

    def weight(self):
        norm = self.weight_v.pow(2).sum(dim=(1, 2), keepdim=True).sqrt()
        return self.weight_g * self.weight_v / (norm + 1e-12)

    def forward(self, x):
        return F.conv1d(x, self.weight(), self.bias, self.stride,
                        self.padding, self.dilation, self.groups)


class WNConvTranspose1d(nn.Module):
    def __init__(self, i, o, k, stride=1, padding=0, output_padding=0,
                 bias=True):
        super().__init__()
        self.stride, self.padding = stride, padding
        self.output_padding = output_padding
        w = torch.empty(i, o, k).uniform_(
            -((1 / (i * k)) ** 0.5), (1 / (i * k)) ** 0.5)
        g = w.pow(2).sum(dim=(1, 2), keepdim=True).sqrt()  # per in-channel
        self.weight_g = nn.Parameter(g)
        self.weight_v = nn.Parameter(w / (g + 1e-12))
        self.bias = nn.Parameter(torch.zeros(o)) if bias else None

    def forward(self, x):
        norm = self.weight_v.pow(2).sum(dim=(1, 2), keepdim=True).sqrt()
        w = self.weight_g * self.weight_v / (norm + 1e-12)
        return F.conv_transpose1d(x, w, self.bias, self.stride, self.padding,
                                  self.output_padding)


def snake(x, alpha):
    # SNACDecoder.swift:411-419: x + (1/(alpha+1e-9))·sin²(alpha·x)
    return x + torch.sin(alpha * x) ** 2 / (alpha + 1e-9)


class Snake(nn.Module):
    def __init__(self, channels):
        super().__init__()
        self.alpha = nn.Parameter(torch.ones(1, channels, 1))

    def forward(self, x):
        return snake(x, self.alpha)


class ResidualUnit(nn.Module):
    def __init__(self, dim, dilation, kernel_size=7, groups=1):
        super().__init__()
        pad = ((kernel_size - 1) * dilation) // 2
        self.snake1 = Snake(dim)
        self.conv1 = WNConv1d(dim, dim, kernel_size, padding=pad,
                              dilation=dilation, groups=groups)
        self.snake2 = Snake(dim)
        self.conv2 = WNConv1d(dim, dim, 1)

    def forward(self, x):
        return x + self.conv2(self.snake2(self.conv1(self.snake1(x))))


class NoiseBlock(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.linear = WNConv1d(dim, 1, 1, bias=False)

    def forward(self, x, noise=None):
        if noise is None:
            noise = torch.zeros(x.shape[0], 1, x.shape[2])
        return x + noise * self.linear(x)


class DecoderBlock(nn.Module):
    def __init__(self, in_dim, out_dim, stride, groups, noise):
        super().__init__()
        self.snake = Snake(in_dim)
        self.convT = WNConvTranspose1d(in_dim, out_dim, stride * 2,
                                       stride=stride,
                                       padding=-(-stride // 2),
                                       output_padding=stride % 2)
        self.noise_block = NoiseBlock(out_dim) if noise else None
        self.residuals = nn.ModuleList(
            [ResidualUnit(out_dim, d, 7, groups) for d in (1, 3, 9)])

    def forward(self, x, noise=None):
        x = self.convT(self.snake(x))
        if self.noise_block is not None:
            x = self.noise_block(x, noise)
        for r in self.residuals:
            x = r(x)
        return x


class SNACDecoder(nn.Module):
    def __init__(self, latent_dim=768, decoder_dim=1024,
                 decoder_rates=(8, 8, 4, 2), codebook_size=4096,
                 codebook_dim=8, vq_strides=(4, 2, 1), noise=True,
                 depthwise=True):
        super().__init__()
        self.vq_strides = vq_strides
        self.codebooks = nn.ModuleList(
            [nn.Embedding(codebook_size, codebook_dim) for _ in vq_strides])
        self.out_projs = nn.ModuleList(
            [WNConv1d(codebook_dim, latent_dim, 1) for _ in vq_strides])
        self.depthwise_conv = WNConv1d(latent_dim, latent_dim, 7, padding=3,
                                       groups=latent_dim if depthwise else 1)
        self.pointwise_conv = WNConv1d(latent_dim, decoder_dim, 1)
        dims, cur = [], decoder_dim
        for i, s in enumerate(decoder_rates):
            out = decoder_dim // (2 ** (i + 1))
            dims.append((cur, out, s, out if depthwise else 1))
            cur = out
        self.blocks = nn.ModuleList(
            [DecoderBlock(i, o, s, g, noise) for i, o, s, g in dims])
        final = decoder_dim // (2 ** len(decoder_rates))
        self.final_snake = Snake(final)
        self.final_conv = WNConv1d(final, 1, 7, padding=3)

    def embed_codes(self, codes):
        """codes[i]: (B, T_i) long → (B, latent, T_0·stride_0)."""
        total = codes[-1].shape[1]
        z = None
        for i, stride in enumerate(self.vq_strides):
            emb = self.codebooks[i](codes[i]).transpose(1, 2)  # (B, cd, T_i)
            proj = self.out_projs[i](emb)
            if stride > 1:
                proj = proj.repeat_interleave(stride, dim=2)
            proj = proj[:, :, :total]
            z = proj if z is None else z + proj
        return z

    def forward(self, z, noises=None):
        x = self.pointwise_conv(self.depthwise_conv(z))
        for i, blk in enumerate(self.blocks):
            x = blk(x, None if noises is None else noises[i])
        x = self.final_conv(self.final_snake(x))
        return torch.tanh(x)

    def decode(self, codes, noises=None):
        return self.forward(self.embed_codes(codes), noises)
