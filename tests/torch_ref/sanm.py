"""Torch SenseVoice SANM encoder, translated from the Swift reference.

Source: /root/reference/package/STT/FunASR/Layers/
  - MultiHeadAttentionSANM.swift:16-116: fused q/k/v projection; depthwise
    FSMN conv k11 (groups=nFeat, no conv bias) applied to the UNPROJECTED
    value with explicit (left,right) padding where left = (k-1)/2 +
    sanm_shift; residual + re-mask; attention scale dK^-0.5 on scores; the
    FSMN memory is added AFTER the output projection.
  - EncoderLayerSANM.swift:17-95: pre-norm; the attention residual is
    skipped when inSize != size (the 560→512 first layer).
  - SenseVoiceEncoder.swift:22-136: input × sqrt(encoderDim), encoders0 →
    encoders → after_norm → tp_encoders → tp_norm.
"""

from __future__ import annotations

import torch
import torch.nn.functional as F
from torch import nn


class SANMAttention(nn.Module):
    def __init__(self, n_head, in_feat, n_feat, kernel_size=11, sanm_shift=0):
        super().__init__()
        self.h, self.d_k = n_head, n_feat // n_head
        self.n_feat = n_feat
        self.linear_q_k_v = nn.Linear(in_feat, n_feat * 3)
        self.linear_out = nn.Linear(n_feat, n_feat)
        self.fsmn_block = nn.Conv1d(n_feat, n_feat, kernel_size,
                                    groups=n_feat, bias=False)
        self.left = (kernel_size - 1) // 2 + sanm_shift
        self.right = kernel_size - 1 - self.left

    def forward_fsmn(self, v, mask):
        x = v * mask if mask is not None else v
        xp = F.pad(x.transpose(1, 2), (self.left, self.right))
        x = self.fsmn_block(xp).transpose(1, 2) + v
        return x * mask if mask is not None else x

    def forward(self, x, mask=None, attn_bias=None):
        b, t, _ = x.shape
        q, k, v = self.linear_q_k_v(x).chunk(3, dim=-1)
        mem = self.forward_fsmn(v, mask)
        qh = q.reshape(b, t, self.h, self.d_k).permute(0, 2, 1, 3)
        kh = k.reshape(b, t, self.h, self.d_k).permute(0, 2, 1, 3)
        vh = v.reshape(b, t, self.h, self.d_k).permute(0, 2, 1, 3)
        scores = qh @ kh.transpose(-1, -2) * self.d_k ** -0.5
        if attn_bias is not None:
            scores = scores + attn_bias
        w = scores.float().softmax(-1).to(vh.dtype)
        o = (w @ vh).permute(0, 2, 1, 3).reshape(b, t, self.n_feat)
        return self.linear_out(o) + mem


class FeedForward(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.w_1 = nn.Linear(dim, hidden)
        self.w_2 = nn.Linear(hidden, dim)

    def forward(self, x):
        return self.w_2(F.relu(self.w_1(x)))


class EncoderLayerSANM(nn.Module):
    def __init__(self, in_size, size, n_head, d_ff, kernel_size=11,
                 sanm_shift=0):
        super().__init__()
        self.residual = in_size == size
        self.norm1 = nn.LayerNorm(in_size)
        self.self_attn = SANMAttention(n_head, in_size, size, kernel_size,
                                       sanm_shift)
        self.norm2 = nn.LayerNorm(size)
        self.feed_forward = FeedForward(size, d_ff)

    def forward(self, x, mask=None, attn_bias=None):
        a = self.self_attn(self.norm1(x), mask, attn_bias)
        x = x + a if self.residual else a
        return x + self.feed_forward(self.norm2(x))


class SenseVoiceEncoder(nn.Module):
    def __init__(self, input_dim=560, encoder_dim=512, n_head=4, ffn=2048,
                 n_enc0=1, n_enc=49, n_tp=20, kernel_size=11, sanm_shift=0):
        super().__init__()
        self.encoder_dim = encoder_dim

        def layer(in_size):
            return EncoderLayerSANM(in_size, encoder_dim, n_head, ffn,
                                    kernel_size, sanm_shift)

        self.encoders0 = nn.ModuleList(
            [layer(input_dim if i == 0 else encoder_dim)
             for i in range(n_enc0)])
        self.encoders = nn.ModuleList([layer(encoder_dim)
                                       for _ in range(n_enc)])
        self.tp_encoders = nn.ModuleList([layer(encoder_dim)
                                          for _ in range(n_tp)])
        self.after_norm = nn.LayerNorm(encoder_dim)
        self.tp_norm = nn.LayerNorm(encoder_dim)

    def forward(self, x, lengths):
        t = x.shape[1]
        mask = (torch.arange(t)[None] < lengths[:, None]).float()[:, :, None]
        bias = torch.where(mask[:, None, :, 0][:, :, None] > 0, 0.0,
                           -torch.inf)  # (B, 1, 1, T)
        x = x * self.encoder_dim ** 0.5
        for l in self.encoders0:
            x = l(x, mask, bias)
        for l in self.encoders:
            x = l(x, mask, bias)
        x = self.after_norm(x)
        for l in self.tp_encoders:
            x = l(x, mask, bias)
        return self.tp_norm(x)
