"""Torch S3TokenizerV2, translated from the Swift reference.

Source: /root/reference/package/Codec/S3Tokenizer/S3Tokenizer.swift
  - precomputeFreqsCis (:13-37): freqs = 1/theta^(i/dim) for i in
    [0, dim/2) — note the NON-standard exponent i/dim (standard RoPE uses
    2i/dim); cos/sin are doubled by concatenation.
  - applyRotaryEmb (:40-68): HALF-SPLIT rotation (rotate_half), not
    interleaved pairs.
  - FSMNMultiHeadAttention (:193-316): q/v/out biased, k unbiased;
    depthwise fsmn conv k31 over the value heads, residual + pad masking;
    q,k each scaled by (D/H)^-0.25.
  - S3ResidualAttentionBlock (:319-357): pre-LN, out(wv) + fsmn memory.
  - AudioEncoderV2 (:358-440): conv k3/s2 ×2 with pre-conv pad-masking and
    gelu, length formula (L + 2 - 2 - 1)/s + 1.
  - FSQCodebook.encode (:132-168): project_down → tanh → ×0.999000013 →
    round + 1 → base-3 positional sum.
"""

from __future__ import annotations

import math

import torch
import torch.nn.functional as F
from torch import nn


def precompute_freqs_cis(dim: int, end: int, theta: float = 10000.0):
    half = dim // 2
    freqs = 1.0 / theta ** (torch.arange(half, dtype=torch.float32) / dim)
    t = torch.arange(end, dtype=torch.float32)
    ang = torch.outer(t, freqs)
    cos = torch.cat([ang.cos(), ang.cos()], dim=-1)
    sin = torch.cat([ang.sin(), ang.sin()], dim=-1)
    return cos, sin


def apply_rotary_emb(xq, xk, cos, sin):
    cos = cos[None, :, None, :]
    sin = sin[None, :, None, :]
    half = xq.shape[-1] // 2

    def rot(x):
        return torch.cat([-x[..., half:], x[..., :half]], dim=-1)

    return xq * cos + rot(xq) * sin, xk * cos + rot(xk) * sin


class FSMNMultiHeadAttention(nn.Module):
    def __init__(self, n_state: int, n_head: int, kernel_size: int = 31):
        super().__init__()
        self.n_head = n_head
        self.left = (kernel_size - 1) // 2
        self.right = kernel_size - 1 - self.left
        self.query = nn.Linear(n_state, n_state)
        self.key = nn.Linear(n_state, n_state, bias=False)
        self.value = nn.Linear(n_state, n_state)
        self.out = nn.Linear(n_state, n_state)
        self.fsmn_block = nn.Conv1d(n_state, n_state, kernel_size,
                                    groups=n_state, bias=False)

    def forward_fsmn(self, inputs, mask_pad):
        b, t, h, d = inputs.shape
        x = inputs.reshape(b, t, h * d)
        if mask_pad is not None:
            x = x * mask_pad
        xp = F.pad(x.transpose(1, 2), (self.left, self.right))
        y = self.fsmn_block(xp).transpose(1, 2) + x
        if mask_pad is not None:
            y = y * mask_pad
        return y

    def forward(self, x, mask=None, mask_pad=None, freqs_cis=None):
        b, t, d = x.shape
        q = self.query(x).reshape(b, t, self.n_head, -1)
        k = self.key(x).reshape(b, t, self.n_head, -1)
        v = self.value(x).reshape(b, t, self.n_head, -1)
        if freqs_cis is not None:
            cos, sin = freqs_cis
            q, k = apply_rotary_emb(q, k, cos[:t], sin[:t])
        fsm = self.forward_fsmn(v, mask_pad)
        scale = (d / self.n_head) ** -0.25
        qh = q.permute(0, 2, 1, 3) * scale
        kh = k.permute(0, 2, 1, 3) * scale
        vh = v.permute(0, 2, 1, 3)
        scores = qh @ kh.transpose(-1, -2)
        if mask is not None:
            scores = scores + mask
        w = scores.float().softmax(dim=-1).to(vh.dtype)
        o = (w @ vh).permute(0, 2, 1, 3).reshape(b, t, d)
        return self.out(o) + fsm


class S3ResidualAttentionBlock(nn.Module):
    def __init__(self, n_state: int, n_head: int, kernel_size: int = 31):
        super().__init__()
        self.attn = FSMNMultiHeadAttention(n_state, n_head, kernel_size)
        self.attn_ln = nn.LayerNorm(n_state, eps=1e-5)
        self.mlp = nn.Sequential(nn.Linear(n_state, n_state * 4), nn.GELU(),
                                 nn.Linear(n_state * 4, n_state))
        self.mlp_ln = nn.LayerNorm(n_state, eps=1e-5)

    def forward(self, x, mask=None, mask_pad=None, freqs_cis=None):
        x = x + self.attn(self.attn_ln(x), mask, mask_pad, freqs_cis)
        return x + self.mlp(self.mlp_ln(x))


class AudioEncoderV2(nn.Module):
    def __init__(self, n_mels, n_state, n_head, n_layer, stride=2):
        super().__init__()
        self.stride = stride
        self.conv1 = nn.Conv1d(n_mels, n_state, 3, stride=stride, padding=1)
        self.conv2 = nn.Conv1d(n_state, n_state, 3, stride=2, padding=1)
        self.blocks = nn.ModuleList(
            [S3ResidualAttentionBlock(n_state, n_head)
             for _ in range(n_layer)])
        # the Swift hard-codes dim 64 == its head dim (1280/20); use the
        # actual head dim so tiny test configs exercise the same math
        cos, sin = precompute_freqs_cis(n_state // n_head, 2048)
        self.register_buffer("cos", cos, persistent=False)
        self.register_buffer("sin", sin, persistent=False)

    def forward(self, mel, mel_len):
        """mel (B, n_mels, T) 100 Hz; returns (hidden (B, T//4, D), len)."""
        t = mel.shape[2]
        mask = (torch.arange(t)[None] < mel_len[:, None]).float()
        x = F.gelu(self.conv1(mel * mask[:, None, :]))
        mel_len = (mel_len + 2 - 2 - 1) // self.stride + 1
        t = x.shape[2]
        mask = (torch.arange(t)[None] < mel_len[:, None]).float()
        x = F.gelu(self.conv2(x * mask[:, None, :]))
        mel_len = (mel_len + 2 - 2 - 1) // 2 + 1
        t = x.shape[2]
        mask = (torch.arange(t)[None] < mel_len[:, None]).float()
        x = x.transpose(1, 2)  # (B, T, D)
        mask_pad = mask[:, :, None]
        bias = torch.where(mask.bool(), 0.0, -torch.inf)[:, None, None, :]
        for blk in self.blocks:
            x = blk(x, bias, mask_pad, (self.cos, self.sin))
        return x, mel_len


class FSQCodebook(nn.Module):
    def __init__(self, dim: int, level: int = 3):
        super().__init__()
        self.level = level
        self.project_down = nn.Linear(dim, 8)

    def encode(self, x):
        b, t, _ = x.shape
        h = self.project_down(x.reshape(b * t, -1)).float()
        h = torch.tanh(h) * 0.9990000128746033
        h = torch.round(h) + 1
        powers = float(self.level) ** torch.arange(8, dtype=torch.float32)
        mu = (h * powers[None]).sum(dim=-1)
        return mu.reshape(b, t).to(torch.int32)


class S3TokenizerV2(nn.Module):
    def __init__(self, n_mels=128, n_state=1280, n_head=20, n_layer=6):
        super().__init__()
        self.encoder = AudioEncoderV2(n_mels, n_state, n_head, n_layer)
        self.fsq = FSQCodebook(n_state)

    def quantize(self, mel, mel_len):
        hidden, code_len = self.encoder(mel, mel_len)
        return self.fsq.encode(hidden), code_len
