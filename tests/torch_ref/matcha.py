"""Torch causal Matcha ConditionalDecoder (the S3Gen flow estimator) +
CFG Euler solver, translated from the Swift reference.

Source: /root/reference/package/Codec/S3Gen/
  - S3GenDecoder.swift:15-100 — CausalConv1d (left pad k−1), CausalBlock1D
    (causal conv k3 → LayerNorm → mish → mask), CausalResnetBlock1D
    (block1 → +mlp(mish(t_emb)) → block2 → +res_conv(x·mask)).
  - S3GenDecoder.swift:146-400 — channels=[256]: one down block (resnet +
    4 transformer blocks + causal-conv "downsample"), 12 mid blocks, one
    up block with skip concat, final causal block + 1×1 proj; chunk mask
    ⌊k/c⌋ ≤ ⌊q/c⌋ when streaming (numLeftChunks is ignored by
    subsequentChunkMask).
  - Matcha/MatchaDecoder.swift:13-60 — SinusoidalPosEmb (scale 1000,
    sin‖cos concat) → TimestepEmbedding (silu MLP).
  - Matcha/MatchaTransformer.swift — DiffusersAttention (qkv no-bias, out
    bias, 1/√dh) + gelu FeedForward, pre-LN residuals.
  - FlowMatching.swift:97-214 — CFG Euler: cosine t-schedule,
    (1+rate)·v_cond − rate·v_uncond.
"""

from __future__ import annotations

import math

import torch
import torch.nn.functional as F
from torch import nn


def mish(x):
    return x * torch.tanh(F.softplus(x))


class CausalConv1d(nn.Module):
    def __init__(self, i, o, k):
        super().__init__()
        self.conv = nn.Conv1d(i, o, k)
        self.pad = k - 1

    def forward(self, x):
        return self.conv(F.pad(x, (self.pad, 0)))


class CausalBlock1D(nn.Module):
    def __init__(self, dim, dim_out):
        super().__init__()
        self.conv = CausalConv1d(dim, dim_out, 3)
        self.norm = nn.LayerNorm(dim_out)

    def forward(self, x, mask):
        h = self.conv(x * mask)
        h = self.norm(h.transpose(1, 2)).transpose(1, 2)
        return mish(h) * mask


class CausalResnetBlock1D(nn.Module):
    def __init__(self, dim, dim_out, time_dim):
        super().__init__()
        self.mlp_linear = nn.Linear(time_dim, dim_out)
        self.block1 = CausalBlock1D(dim, dim_out)
        self.block2 = CausalBlock1D(dim_out, dim_out)
        self.res_conv = nn.Conv1d(dim, dim_out, 1)

    def forward(self, x, mask, t_emb):
        h = self.block1(x, mask)
        h = h + self.mlp_linear(mish(t_emb))[:, :, None]
        h = self.block2(h, mask)
        return h + self.res_conv(x * mask)


class TransformerBlock(nn.Module):
    def __init__(self, dim, heads, head_dim):
        super().__init__()
        inner = heads * head_dim
        self.h, self.dh = heads, head_dim
        self.norm1 = nn.LayerNorm(dim)
        self.norm3 = nn.LayerNorm(dim)
        self.q = nn.Linear(dim, inner, bias=False)
        self.k = nn.Linear(dim, inner, bias=False)
        self.v = nn.Linear(dim, inner, bias=False)
        self.o = nn.Linear(inner, dim)
        self.ff1 = nn.Linear(dim, dim * 4)
        self.ff2 = nn.Linear(dim * 4, dim)

    def forward(self, x, bias):
        b, t, _ = x.shape
        hn = self.norm1(x)
        q = self.q(hn).reshape(b, t, self.h, self.dh).permute(0, 2, 1, 3)
        k = self.k(hn).reshape(b, t, self.h, self.dh).permute(0, 2, 1, 3)
        v = self.v(hn).reshape(b, t, self.h, self.dh).permute(0, 2, 1, 3)
        scores = q @ k.transpose(-1, -2) / math.sqrt(self.dh) + bias
        w = scores.float().softmax(-1).to(v.dtype)
        o = (w @ v).permute(0, 2, 1, 3).reshape(b, t, -1)
        x = x + self.o(o)
        return x + self.ff2(F.gelu(self.ff1(self.norm3(x))))


class ConditionalDecoder(nn.Module):
    def __init__(self, in_channels=320, out_channels=80, channels=256,
                 n_blocks=4, num_mid_blocks=12, heads=8, head_dim=64,
                 static_chunk_size=50, meanflow=False):
        super().__init__()
        self.in_channels = in_channels
        self.chunk = static_chunk_size
        ch = channels
        time_dim = ch * 4
        self.time_l1 = nn.Linear(in_channels, time_dim)
        self.time_l2 = nn.Linear(time_dim, time_dim)
        # meanflow-distilled (t, r) conditioning (CBTDecoder.swift:602-625)
        self.time_embed_mixer = (nn.Linear(time_dim * 2, time_dim,
                                           bias=False) if meanflow else None)
        self.down_resnet = CausalResnetBlock1D(in_channels, ch, time_dim)
        self.down_tf = nn.ModuleList(
            [TransformerBlock(ch, heads, head_dim) for _ in range(n_blocks)])
        self.down_conv = CausalConv1d(ch, ch, 3)
        self.mid = nn.ModuleList()
        for _ in range(num_mid_blocks):
            self.mid.append(nn.ModuleList([
                CausalResnetBlock1D(ch, ch, time_dim),
                nn.ModuleList([TransformerBlock(ch, heads, head_dim)
                               for _ in range(n_blocks)])]))
        self.up_resnet = CausalResnetBlock1D(ch * 2, ch, time_dim)
        self.up_tf = nn.ModuleList(
            [TransformerBlock(ch, heads, head_dim) for _ in range(n_blocks)])
        self.up_conv = CausalConv1d(ch, ch, 3)
        self.final_block = CausalBlock1D(ch, ch)
        self.final_proj = nn.Conv1d(ch, out_channels, 1)

    def _bias(self, t, lengths, streaming):
        ki = torch.arange(t)[None, :]
        pad = torch.where(ki < lengths[:, None], 0.0, -torch.inf)
        bias = pad[:, None, None, :]
        if streaming and self.chunk > 0:
            qc = torch.arange(t)[:, None] // self.chunk
            kc = torch.arange(t)[None, :] // self.chunk
            bias = bias + torch.where(kc <= qc, 0.0, -torch.inf)[None, None]
        return bias

    def _temb(self, t):
        half = self.in_channels // 2
        emb = torch.exp(torch.arange(half, dtype=torch.float32)
                        * (-math.log(10000.0) / (half - 1)))
        ang = 1000.0 * t[:, None] * emb[None]
        t_emb = torch.cat([torch.sin(ang), torch.cos(ang)], dim=-1)
        return self.time_l2(F.silu(self.time_l1(t_emb)))

    def forward(self, x, lengths, mu, t, spks=None, cond=None,
                streaming=False, r=None):
        """x/mu/cond (B, C, T); spks (B, C); t (B,) → (B, out, T)."""
        b, _, tlen = x.shape
        mask = (torch.arange(tlen)[None] < lengths[:, None]
                ).float()[:, None, :]
        t_emb = self._temb(t)
        if r is not None and self.time_embed_mixer is not None:
            t_emb = self.time_embed_mixer(
                torch.cat([t_emb, self._temb(r)], dim=-1))

        h = torch.cat([x, mu], dim=1)
        if spks is not None:
            h = torch.cat([h, spks[:, :, None].expand(-1, -1, tlen)], dim=1)
        if cond is not None:
            h = torch.cat([h, cond], dim=1)
        bias = self._bias(tlen, lengths, streaming)

        h = self.down_resnet(h, mask, t_emb)
        ht = h.transpose(1, 2)
        for tf in self.down_tf:
            ht = tf(ht, bias)
        h = ht.transpose(1, 2)
        skip = h
        h = self.down_conv(h * mask)
        for resnet, tfs in self.mid:
            h = resnet(h, mask, t_emb)
            ht = h.transpose(1, 2)
            for tf in tfs:
                ht = tf(ht, bias)
            h = ht.transpose(1, 2)
        h = torch.cat([h, skip], dim=1)
        h = self.up_resnet(h, mask, t_emb)
        ht = h.transpose(1, 2)
        for tf in self.up_tf:
            ht = tf(ht, bias)
        h = ht.transpose(1, 2)
        h = self.up_conv(h * mask)
        h = self.final_block(h, mask)
        return self.final_proj(h * mask) * mask


def cfg_euler(est, z, mu, lengths, spks, cond, n_steps, rate,
              streaming=False):
    t_span = torch.linspace(0, 1, n_steps + 1)
    t_span = 1 - torch.cos(t_span * 0.5 * torch.pi)
    x = z
    for s in range(n_steps):
        dt = t_span[s + 1] - t_span[s]
        b = x.shape[0]
        v = est(torch.cat([x, x]), torch.cat([lengths, lengths]),
                torch.cat([mu, torch.zeros_like(mu)]),
                torch.full((2 * b,), float(t_span[s])),
                torch.cat([spks, torch.zeros_like(spks)])
                if spks is not None else None,
                torch.cat([cond, torch.zeros_like(cond)])
                if cond is not None else None, streaming)
        x = x + dt * ((1 + rate) * v[:b] - rate * v[b:])
    return x


def basic_euler_meanflow(est, z, mu, lengths, spks, cond, n_steps,
                         streaming=False):
    """CBT meanflow basicEuler (CBTFlowMatching.swift:77-117): no CFG,
    LINEAR t grid, estimator conditioned on (t, r=t_next)."""
    t_span = torch.linspace(0, 1, n_steps + 1)
    x = z
    for s in range(n_steps):
        b = x.shape[0]
        t = torch.full((b,), float(t_span[s]))
        r = torch.full((b,), float(t_span[s + 1]))
        v = est(x, lengths, mu, t, spks, cond, streaming, r)
        x = x + (t_span[s + 1] - t_span[s]) * v
    return x
