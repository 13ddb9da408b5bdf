"""Independent torch implementation of the CosyVoice3 DiT estimator and the
CausalMaskedDiffWithDiT mu pipeline, written from the reference semantics
(package/TTS/CosyVoice3/Flow/DiT.swift:13-782 and
Flow/CosyVoice3CFM.swift:28-392, themselves a port of FunAudioLLM/CosyVoice).

Third-implementation parity oracle for tpu_audio/models/cosyvoice3/{dit,
model}.py — the technique that caught nine silent convention drifts in the
other estimator graphs (tests/test_torch_parity_audio.py). Keep this file
torch-idiomatic and free of any JAX-side structure so drifts cannot cancel.
"""

import math

import torch
import torch.nn as nn
import torch.nn.functional as F


def sinus_position_embedding(t: torch.Tensor, dim: int = 256,
                             scale: float = 1000.0) -> torch.Tensor:
    """DiT.swift:26-31 — log-spaced over half_dim - 1, [sin, cos]."""
    half = dim // 2
    emb = math.log(10000.0) / (half - 1)
    freqs = torch.exp(torch.arange(half, dtype=torch.float32) * -emb)
    ang = scale * t.unsqueeze(1) * freqs.unsqueeze(0)
    return torch.cat([torch.sin(ang), torch.cos(ang)], dim=-1)


class TimestepEmbedding(nn.Module):
    def __init__(self, dim: int, freq_dim: int = 256):
        super().__init__()
        self.time_mlp_0 = nn.Linear(freq_dim, dim)
        self.time_mlp_2 = nn.Linear(dim, dim)

    def forward(self, t):
        h = sinus_position_embedding(t)
        return self.time_mlp_2(F.silu(self.time_mlp_0(h)))


class CausalConvPositionEmbedding(nn.Module):
    """DiT.swift:66-107 — two causal grouped convs with mish."""

    def __init__(self, dim: int, kernel: int = 31, groups: int = 16):
        super().__init__()
        self.kernel = kernel
        self.conv1 = nn.Conv1d(dim, dim, kernel, groups=groups)
        self.conv2 = nn.Conv1d(dim, dim, kernel, groups=groups)

    def forward(self, x):  # (B, N, D)
        h = x.transpose(1, 2)
        h = F.mish(self.conv1(F.pad(h, (self.kernel - 1, 0))))
        h = F.mish(self.conv2(F.pad(h, (self.kernel - 1, 0))))
        return h.transpose(1, 2)


def rotate_half(x):
    """x_transformers pairwise rotate: (a, b) -> (-b, a) (DiT.swift:286)."""
    x = x.reshape(*x.shape[:-1], -1, 2)
    x1, x2 = x[..., 0], x[..., 1]
    return torch.stack([-x2, x1], dim=-1).reshape(*x.shape[:-2], -1)


def apply_rotary(t, freqs):
    """DiT.swift:305-340 — applied to the FLAT projection: only the first
    rot_dim channels rotate."""
    rot_dim = freqs.shape[-1]
    t_rot, t_pass = t[..., :rot_dim], t[..., rot_dim:]
    out = t_rot * torch.cos(freqs) + rotate_half(t_rot) * torch.sin(freqs)
    return torch.cat([out, t_pass], dim=-1)


def rotary_freqs(n: int, dim: int) -> torch.Tensor:
    """RotaryEmbedding.forward (DiT.swift:342-400): interleaved angles."""
    inv = 1.0 / (10000.0 ** (torch.arange(0, dim, 2).float() / dim))
    freqs = torch.einsum("i,j->ij", torch.arange(n).float(), inv)
    return torch.stack([freqs, freqs], dim=-1).reshape(n, -1)  # (N, dim)


class DiTAttention(nn.Module):
    def __init__(self, dim, heads, head_dim):
        super().__init__()
        inner = heads * head_dim
        self.heads, self.head_dim = heads, head_dim
        self.to_q = nn.Linear(dim, inner)
        self.to_k = nn.Linear(dim, inner)
        self.to_v = nn.Linear(dim, inner)
        self.to_out_0 = nn.Linear(inner, dim)

    def forward(self, x, bool_mask, freqs):
        # bool_mask (B, 1, N, N); rope BEFORE the head reshape
        b, n, _ = x.shape
        q = apply_rotary(self.to_q(x), freqs)
        k = apply_rotary(self.to_k(x), freqs)
        v = self.to_v(x)

        def heads(t):
            return t.reshape(b, n, self.heads,
                             self.head_dim).transpose(1, 2)

        o = F.scaled_dot_product_attention(heads(q), heads(k), heads(v),
                                           attn_mask=bool_mask)
        o = o.transpose(1, 2).reshape(b, n, -1)
        o = self.to_out_0(o)
        # output masked with the mask's last row (DiT.swift:500-510)
        return o * bool_mask[:, 0, -1, :].unsqueeze(-1)


class DiTBlock(nn.Module):
    def __init__(self, dim, heads, head_dim, ff_mult):
        super().__init__()
        self.attn_norm_linear = nn.Linear(dim, dim * 6)
        self.attn = DiTAttention(dim, heads, head_dim)
        self.ff_0_0 = nn.Linear(dim, dim * ff_mult)
        self.ff_2 = nn.Linear(dim * ff_mult, dim)
        self.norm = nn.LayerNorm(dim, eps=1e-6, elementwise_affine=False)

    def forward(self, x, t_emb, bool_mask, freqs):
        mod = self.attn_norm_linear(F.silu(t_emb))
        (sh_msa, sc_msa, g_msa, sh_mlp, sc_mlp,
         g_mlp) = mod.chunk(6, dim=1)
        hn = self.norm(x) * (1 + sc_msa.unsqueeze(1)) + sh_msa.unsqueeze(1)
        x = x + g_msa.unsqueeze(1) * self.attn(hn, bool_mask, freqs)
        hn = self.norm(x) * (1 + sc_mlp.unsqueeze(1)) + sh_mlp.unsqueeze(1)
        ff = self.ff_2(F.gelu(self.ff_0_0(hn), approximate="tanh"))
        return x + g_mlp.unsqueeze(1) * ff


class DiT(nn.Module):
    """Sequence-first interface: x/cond (B, N, mel), mu (B, N, mu_dim),
    spks (B, spk); lengths (B,). Returns (B, N, mel)."""

    def __init__(self, dim=32, depth=2, heads=4, head_dim=8, ff_mult=2,
                 mel_dim=16, mu_dim=16, spk_dim=16, static_chunk_size=50,
                 num_left_chunks=-1, conv_groups=16):
        super().__init__()
        self.static_chunk_size = static_chunk_size
        self.num_left_chunks = num_left_chunks
        self.time_embed = TimestepEmbedding(dim)
        self.proj = nn.Linear(mel_dim * 2 + mu_dim + spk_dim, dim)
        self.conv_pos_embed = CausalConvPositionEmbedding(
            dim, groups=conv_groups)
        self.blocks = nn.ModuleList(
            [DiTBlock(dim, heads, head_dim, ff_mult) for _ in range(depth)])
        self.norm_out_linear = nn.Linear(dim, dim * 2)
        self.norm = nn.LayerNorm(dim, eps=1e-6, elementwise_affine=False)
        self.proj_out = nn.Linear(dim, mel_dim)
        self.head_dim = head_dim

    def _mask(self, lengths, n, streaming):
        """addOptionalChunkMask (DiT.swift:570-640) as a bool (B,1,N,N)."""
        b = lengths.shape[0]
        pad = (torch.arange(n).unsqueeze(0)
               < lengths.unsqueeze(1))  # (B, N) key-valid
        if streaming:
            pos = torch.arange(n)
            block = (pos // self.static_chunk_size + 1) \
                * self.static_chunk_size
            chunk = pos.unsqueeze(0) < block.unsqueeze(1)  # (N, N)
            if self.num_left_chunks >= 0:
                qc = pos.unsqueeze(1) // self.static_chunk_size
                kc = pos.unsqueeze(0) // self.static_chunk_size
                chunk = chunk & (kc >= qc - self.num_left_chunks)
            m = pad.unsqueeze(1) & chunk.unsqueeze(0)  # (B, N, N)
        else:
            m = pad.unsqueeze(1).expand(b, n, n)
        # all-false row safety (DiT.swift:626-633)
        dead = ~m.any(dim=-1, keepdim=True)
        m = m | dead
        return m.unsqueeze(1)

    def forward(self, x, lengths, mu, t, spks, cond, streaming=False):
        b, n, _ = x.shape
        t_emb = self.time_embed(t)
        spk_b = spks.unsqueeze(1).expand(b, n, spks.shape[-1])
        h = self.proj(torch.cat([x, cond, mu, spk_b], dim=-1))
        h = self.conv_pos_embed(h) + h
        mask = self._mask(lengths, n, streaming)
        freqs = rotary_freqs(n, self.head_dim)
        for blk in self.blocks:
            h = blk(h, t_emb, mask, freqs)
        mod = self.norm_out_linear(F.silu(t_emb))
        scale, shift = mod.chunk(2, dim=1)
        h = self.norm(h) * (1 + scale.unsqueeze(1)) + shift.unsqueeze(1)
        out = self.proj_out(h)
        valid = (torch.arange(n).unsqueeze(0)
                 < lengths.unsqueeze(1)).unsqueeze(-1)
        return out * valid


class PreLookaheadLayer(nn.Module):
    """CosyVoice3CFM.swift:28-93."""

    def __init__(self, in_channels, channels, pre_lookahead_len=3):
        super().__init__()
        self.pre = pre_lookahead_len
        self.conv1 = nn.Conv1d(in_channels, channels, pre_lookahead_len + 1)
        self.conv2 = nn.Conv1d(channels, in_channels, 3)

    def forward(self, x, context=None):  # (B, T, C)
        if context is not None:
            out = torch.cat([x, context], dim=1)
        else:
            out = F.pad(x, (0, 0, 0, self.pre))
        h = out.transpose(1, 2)
        h = F.leaky_relu(self.conv1(h))
        h = self.conv2(F.pad(h, (2, 0)))
        h = h.transpose(1, 2)
        if context is not None:
            h = h[:, : x.shape[1]]
        return h + x


class MuPipeline(nn.Module):
    """CausalMaskedDiffWithDiT.inference front half
    (CosyVoice3CFM.swift:317-368): embedding → mask → pre-lookahead →
    ×ratio repeat → (mu, spks)."""

    def __init__(self, vocab, input_dim, dit_dim, spk_in, spk_out,
                 ratio=2, pre=3):
        super().__init__()
        self.ratio = ratio
        self.pre = pre
        self.input_embedding = nn.Embedding(vocab, input_dim)
        self.spk_embed_affine_layer = nn.Linear(spk_in, spk_out)
        self.pre_lookahead_layer = PreLookaheadLayer(input_dim, dit_dim, pre)

    def forward(self, tokens, lengths, embedding, finalize=True):
        emb = embedding / torch.sqrt(
            (embedding * embedding).sum(-1, keepdim=True) + 1e-8)
        spks = self.spk_embed_affine_layer(emb)
        n = tokens.shape[1]
        mask = (torch.arange(n).unsqueeze(0)
                < lengths.unsqueeze(1)).unsqueeze(-1).float()
        x = self.input_embedding(
            tokens.clamp(0, self.input_embedding.num_embeddings - 1)) * mask
        if finalize:
            h = self.pre_lookahead_layer(x)
        else:
            h = self.pre_lookahead_layer(x[:, : n - self.pre],
                                         context=x[:, n - self.pre:])
        return h.repeat_interleave(self.ratio, dim=1), spks
