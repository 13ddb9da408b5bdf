"""Torch CAMPPlus x-vector embedder, translated from the Swift reference.

Source: /root/reference/package/Codec/S3Gen/CAMPPlus.swift
  - BasicResBlock :180-243 (2-D conv k3, stride (s,1) on the MEL axis,
    BN, 1×1 shortcut when shape changes)
  - FCM :246-325 (conv k3 → BN → ReLU → 2 res layers (stride 2) →
    conv k3 stride (2,1) → BN → ReLU; reshape (B,C,H,W)→(B, C·H, W))
  - statisticsPooling :327-333 (mean ‖ sqrt(var + 1e-5))
  - TDNNLayer :345-393 (conv k5 STRIDE 2 pad 2 no-bias → BN → ReLU)
  - CAMLayer :420-505 (local conv × sigmoid(ctx); ctx = global mean +
    100-frame segment mean, broadcast back)
  - CAMDenseTDNNLayer :507-567 (BN→ReLU→1×1(bias=no)→BN→ReLU→CAM)
  - CAMDenseTDNNBlock :571-608 (dense concat on channels)
  - TransitLayer :613-637 (BN→ReLU→1×1 no-bias)
  - DenseLayer :642-683 (1×1 no-bias → BatchNorm(affine=False))
  - CAMPPlus :687-792 (head→tdnn→3×(block,transit)→BN→ReLU→stats→dense)

All in torch-native (B, C, T) / (B, C, H, W) layouts; eval-mode BN.
"""

from __future__ import annotations

import torch
import torch.nn.functional as F
from torch import nn


class BasicResBlock(nn.Module):
    def __init__(self, in_planes, planes, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(in_planes, planes, 3, (stride, 1), 1,
                               bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.shortcut = None
        if stride != 1 or in_planes != planes:
            self.shortcut = nn.Sequential(
                nn.Conv2d(in_planes, planes, 1, (stride, 1), bias=False),
                nn.BatchNorm2d(planes))

    def forward(self, x):
        out = F.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        sc = self.shortcut(x) if self.shortcut is not None else x
        return F.relu(out + sc)


class FCM(nn.Module):
    def __init__(self, m_channels=32, feat_dim=80):
        super().__init__()
        self.conv1 = nn.Conv2d(1, m_channels, 3, 1, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(m_channels)
        self.layer1 = nn.Sequential(BasicResBlock(m_channels, m_channels, 2),
                                    BasicResBlock(m_channels, m_channels, 1))
        self.layer2 = nn.Sequential(BasicResBlock(m_channels, m_channels, 2),
                                    BasicResBlock(m_channels, m_channels, 1))
        self.conv2 = nn.Conv2d(m_channels, m_channels, 3, (2, 1), 1,
                               bias=False)
        self.bn2 = nn.BatchNorm2d(m_channels)
        self.out_channels = m_channels * (feat_dim // 8)

    def forward(self, x):
        # x: (B, F, T) → (B, 1, F, T): channel dim in torch position
        x = x.unsqueeze(1)
        out = F.relu(self.bn1(self.conv1(x)))
        out = self.layer2(self.layer1(out))
        out = F.relu(self.bn2(self.conv2(out)))
        b, c, h, w = out.shape
        return out.reshape(b, c * h, w)  # channel-major (c·H + h), like Swift


def stats_pool(x):
    return torch.cat([x.mean(-1), (x.var(-1, unbiased=False) + 1e-5).sqrt()],
                     dim=-1)


class TDNNLayer(nn.Module):
    def __init__(self, i, o, k, stride=1, padding=-1, dilation=1):
        super().__init__()
        if padding < 0:
            padding = (k - 1) // 2 * dilation
        self.linear = nn.Conv1d(i, o, k, stride, padding, dilation,
                                bias=False)
        self.bn = nn.BatchNorm1d(o)

    def forward(self, x):
        return F.relu(self.bn(self.linear(x)))


class CAMLayer(nn.Module):
    def __init__(self, bn_channels, out_channels, k, stride, padding,
                 dilation, bias, reduction=2):
        super().__init__()
        self.linear_local = nn.Conv1d(bn_channels, out_channels, k, stride,
                                      padding, dilation, bias=bias)
        self.linear1 = nn.Conv1d(bn_channels, bn_channels // reduction, 1)
        self.linear2 = nn.Conv1d(bn_channels // reduction, out_channels, 1)

    def seg_pool(self, x, seg_len=100):
        b, c, t = x.shape
        n = -(-t // seg_len)
        xp = F.pad(x, (0, n * seg_len - t))
        seg = xp.reshape(b, c, n, seg_len).mean(-1)
        seg = seg.unsqueeze(-1).expand(b, c, n, seg_len).reshape(b, c, -1)
        return seg[:, :, :t]

    def forward(self, x):
        y = self.linear_local(x)
        ctx = x.mean(-1, keepdim=True) + self.seg_pool(x)
        ctx = F.relu(self.linear1(ctx))
        return y * torch.sigmoid(self.linear2(ctx))


class CAMDenseTDNNLayer(nn.Module):
    def __init__(self, i, o, bn_ch, k, dilation=1, bias=False):
        super().__init__()
        pad = (k - 1) // 2 * dilation
        self.bn1 = nn.BatchNorm1d(i)
        self.linear1 = nn.Conv1d(i, bn_ch, 1, bias=False)
        self.bn2 = nn.BatchNorm1d(bn_ch)
        self.cam_layer = CAMLayer(bn_ch, o, k, 1, pad, dilation, bias)

    def forward(self, x):
        h = F.relu(self.bn1(x))
        h = self.linear1(h)
        h = F.relu(self.bn2(h))
        return self.cam_layer(h)


class TransitLayer(nn.Module):
    def __init__(self, i, o):
        super().__init__()
        self.bn = nn.BatchNorm1d(i)
        self.linear = nn.Conv1d(i, o, 1, bias=False)

    def forward(self, x):
        return self.linear(F.relu(self.bn(x)))


class CAMPPlus(nn.Module):
    def __init__(self, feat_dim=80, embedding_size=192, growth_rate=32,
                 bn_size=4, init_channels=128,
                 blocks=(12, 24, 16), kernels=(3, 3, 3),
                 dilations=(1, 2, 2)):
        super().__init__()
        self.head = FCM(32, feat_dim)
        ch = self.head.out_channels
        self.tdnn = TDNNLayer(ch, init_channels, 5, stride=2, padding=-1)
        ch = init_channels
        self.blocks = nn.ModuleList()
        self.transits = nn.ModuleList()
        for n, k, d in zip(blocks, kernels, dilations):
            blk = nn.ModuleList(
                [CAMDenseTDNNLayer(ch + i * growth_rate, growth_rate,
                                   bn_size * growth_rate, k, d)
                 for i in range(n)])
            self.blocks.append(blk)
            ch += n * growth_rate
            self.transits.append(TransitLayer(ch, ch // 2))
            ch //= 2
        self.out_bn = nn.BatchNorm1d(ch)
        self.dense_linear = nn.Conv1d(ch * 2, embedding_size, 1, bias=False)
        self.dense_bn = nn.BatchNorm1d(embedding_size, affine=False)

    def forward(self, fbank):
        """fbank (B, T, F) mean-normalized → (B, embedding_size)."""
        x = fbank.transpose(1, 2)  # (B, F, T)
        x = self.tdnn(self.head(x))
        for blk, transit in zip(self.blocks, self.transits):
            for layer in blk:
                x = torch.cat([x, layer(x)], dim=1)
            x = transit(x)
        x = F.relu(self.out_bn(x))
        stats = stats_pool(x).unsqueeze(-1)
        return self.dense_bn(self.dense_linear(stats)).squeeze(-1)
