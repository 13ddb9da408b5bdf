"""Torch UpsampleConformerEncoder, translated from the Swift reference.

Source: /root/reference/package/Codec/S3Gen/Transformer/
  - Embedding.swift:17-85 — RelPositionalEncoding: pos table over
    POSITIVE positions [0, T) with sin/cos halves CONCATENATED (the
    createPE stack-transpose-reshape concatenates); input scaled by √d;
    pos_emb returned separately.
  - Subsampling.swift LinearNoSubsampling — linear → LayerNorm → pos enc.
  - Attention.swift:15-240 — RelPositionMultiHeadedAttention: q/k/v with
    k-bias, pos linear (no bias), pos_bias_u/v; pos length == T so the
    rel-shift branch is NOT taken; scores (AC+BD)/√dk, bool mask applied
    before and after softmax.
  - ConformerEncoderLayer.swift:69-160 — pre-LN attention + FFN (SiLU),
    macaron and conv modules disabled in this build.
  - UpsampleConformerEncoder.swift:60-470 — pre-lookahead (pad right L,
    conv k=L+1, leaky 0.01, pad left 2, conv k3, NO second activation,
    residual), 6 blocks, nearest-×2 upsample + left-pad-4 conv k5 (no
    activation), up-embed, 4 blocks, after-norm; chunk masks
    ⌊k/c⌋ ≤ ⌊q/c⌋ when streaming.
"""

from __future__ import annotations

import math

import torch
import torch.nn.functional as F
from torch import nn


def pos_table(t, d):
    pos = torch.arange(t, dtype=torch.float32)[:, None]
    div = torch.exp(torch.arange(0, d, 2, dtype=torch.float32)
                    * (-math.log(10000.0) / d))
    return torch.cat([torch.sin(pos * div), torch.cos(pos * div)],
                     dim=1)[None]  # (1, T, D)


class RelAttention(nn.Module):
    def __init__(self, heads, d):
        super().__init__()
        self.h, self.dk = heads, d // heads
        self.linear_q = nn.Linear(d, d)
        self.linear_k = nn.Linear(d, d)
        self.linear_v = nn.Linear(d, d)
        self.linear_out = nn.Linear(d, d)
        self.linear_pos = nn.Linear(d, d, bias=False)
        self.pos_bias_u = nn.Parameter(torch.zeros(heads, self.dk))
        self.pos_bias_v = nn.Parameter(torch.zeros(heads, self.dk))

    def forward(self, x, pos_emb, mask):
        b, t, d = x.shape
        q = self.linear_q(x).reshape(b, t, self.h, self.dk)
        k = self.linear_k(x).reshape(b, t, self.h, self.dk).permute(0, 2, 1, 3)
        v = self.linear_v(x).reshape(b, t, self.h, self.dk).permute(0, 2, 1, 3)
        p = self.linear_pos(pos_emb).reshape(1, -1, self.h, self.dk)
        p = p.permute(0, 2, 1, 3)
        qu = (q + self.pos_bias_u).permute(0, 2, 1, 3)
        qv = (q + self.pos_bias_v).permute(0, 2, 1, 3)
        ac = qu @ k.transpose(-1, -2)
        bd = qv @ p.transpose(-1, -2)  # same shape as ac: no rel-shift
        scores = (ac + bd) / math.sqrt(self.dk)
        cond = mask[:, None] == 0  # (B, 1, T, T)
        scores = scores.masked_fill(cond, -torch.inf)
        attn = scores.softmax(-1).masked_fill(cond, 0.0)
        o = (attn @ v).permute(0, 2, 1, 3).reshape(b, t, d)
        return self.linear_out(o)


class EncoderLayer(nn.Module):
    def __init__(self, d, heads, ff):
        super().__init__()
        self.self_attn = RelAttention(heads, d)
        self.norm_mha = nn.LayerNorm(d, eps=1e-5)
        self.norm_ff = nn.LayerNorm(d, eps=1e-5)
        self.w_1 = nn.Linear(d, ff)
        self.w_2 = nn.Linear(ff, d)

    def forward(self, x, pos_emb, mask):
        x = x + self.self_attn(self.norm_mha(x), pos_emb, mask)
        return x + self.w_2(F.silu(self.w_1(self.norm_ff(x))))


class UpsampleConformerEncoder(nn.Module):
    def __init__(self, input_size=32, output_size=32, heads=4, ff=64,
                 num_blocks=2, num_up_blocks=1, pre_lookahead_len=3,
                 stride=2, static_chunk_size=50):
        super().__init__()
        d = output_size
        self.d = d
        self.pre_len = pre_lookahead_len
        self.stride = stride
        self.chunk = static_chunk_size
        self.embed_out = nn.Linear(input_size, d)
        self.embed_norm = nn.LayerNorm(d, eps=1e-5)
        self.pl_conv1 = nn.Conv1d(d, d, pre_lookahead_len + 1)
        self.pl_conv2 = nn.Conv1d(d, d, 3)
        self.encoders = nn.ModuleList(
            [EncoderLayer(d, heads, ff) for _ in range(num_blocks)])
        self.up_conv = nn.Conv1d(d, d, stride * 2 + 1)
        self.up_embed_out = nn.Linear(d, d)
        self.up_embed_norm = nn.LayerNorm(d, eps=1e-5)
        self.up_encoders = nn.ModuleList(
            [EncoderLayer(d, heads, ff) for _ in range(num_up_blocks)])
        self.after_norm = nn.LayerNorm(d, eps=1e-5)

    def _mask(self, t, lengths, streaming, chunk):
        pad = (torch.arange(t)[None] < lengths[:, None])  # (B, T) keep
        m = pad[:, None, :].expand(-1, t, -1).clone()  # (B, Tq, Tk)
        if streaming and chunk > 0:
            qi = torch.arange(t)[:, None]
            ki = torch.arange(t)[None, :]
            m = m & ((ki // chunk) <= (qi // chunk))[None]
        return m

    def forward(self, x, lengths, streaming=False):
        t = x.shape[1]
        x = self.embed_norm(self.embed_out(x)) * math.sqrt(self.d)
        pos = pos_table(t, self.d)
        h = F.pad(x.transpose(1, 2), (0, self.pre_len))
        h = F.leaky_relu(self.pl_conv1(h), 0.01)
        h = self.pl_conv2(F.pad(h, (2, 0))).transpose(1, 2)
        x = x + h
        mask = self._mask(t, lengths, streaming, self.chunk // self.stride)
        for layer in self.encoders:
            x = layer(x, pos, mask)
        x = x.transpose(1, 2).repeat_interleave(self.stride, dim=2)
        x = self.up_conv(F.pad(x, (2 * self.stride, 0))).transpose(1, 2)
        lengths2 = lengths * self.stride
        t2 = x.shape[1]
        x = self.up_embed_norm(self.up_embed_out(x)) * math.sqrt(self.d)
        pos2 = pos_table(t2, self.d)
        mask2 = self._mask(t2, lengths2, streaming, self.chunk)
        for layer in self.up_encoders:
            x = layer(x, pos2, mask2)
        return self.after_norm(x), lengths2
