"""Conditional flow matching: CFG Euler solver + causal U-Net estimator.

Reference: package/Codec/S3Gen/FlowMatching.swift (BASECFM.solveEuler :63,
ConditionalCFM CFG Euler with cosine t-schedule :97-214) and
S3GenDecoder.swift:146-330 (ConditionalDecoder: with channels=[256] the
"U-Net" is 1 down block + 12 mid blocks + 1 up block of
[causal resnet + 4 transformer blocks], all at full temporal resolution,
plus skip concat and a causal final block).

Channels-last; the CFG pair (cond/uncond) is one batch of 2 — a single
batched estimator call per Euler step, 10 steps default.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from tpu_audio.nn import attention, layers


@dataclass(frozen=True)
class EstimatorConfig:
    in_channels: int = 320  # x(80) + mu(80) + spk(80) + cond(80)
    out_channels: int = 80
    channels: int = 256
    n_blocks: int = 4  # transformer blocks per stage
    num_mid_blocks: int = 12
    num_heads: int = 8
    static_chunk_size: int = 50
    num_left_chunks: int = 2
    # meanflow-distilled estimator (Chatterbox Turbo): adds the (t, r)
    # time_embed_mixer and expects estimator_forward(..., r=...)
    meanflow: bool = False


@dataclass(frozen=True)
class CFMConfig:
    sigma_min: float = 1e-6
    t_scheduler: str = "cosine"
    inference_cfg_rate: float = 0.7
    n_timesteps: int = 10


def mish(x):
    return x * jnp.tanh(jax.nn.softplus(x))


# ------------------------------------------------------------------ init

def _tblock_init(ks, dim, heads, head_dim, dtype):
    inner = heads * head_dim
    return {
        "norm1": layers.init_norm(dim, dtype=dtype),
        "attn": {
            "q": layers.init_linear(next(ks), dim, inner, False, dtype),
            "k": layers.init_linear(next(ks), dim, inner, False, dtype),
            "v": layers.init_linear(next(ks), dim, inner, False, dtype),
            "o": layers.init_linear(next(ks), inner, dim, True, dtype),
        },
        "norm3": layers.init_norm(dim, dtype=dtype),
        "ff": {"fc1": layers.init_linear(next(ks), dim, dim * 4, True, dtype),
               "fc2": layers.init_linear(next(ks), dim * 4, dim, True, dtype)},
    }


def _resnet_init(ks, dim, dim_out, time_dim, dtype):
    return {
        "mlp_linear": layers.init_linear(next(ks), time_dim, dim_out, True, dtype),
        "block1": {"conv": layers.init_conv1d(next(ks), dim, dim_out, 3, dtype=dtype),
                   "norm": layers.init_norm(dim_out, dtype=dtype)},
        "block2": {"conv": layers.init_conv1d(next(ks), dim_out, dim_out, 3, dtype=dtype),
                   "norm": layers.init_norm(dim_out, dtype=dtype)},
        "res_conv": layers.init_conv1d(next(ks), dim, dim_out, 1, dtype=dtype),
    }


def init_estimator(key, cfg: EstimatorConfig, dtype=jnp.float32,
                   meanflow: bool | None = None) -> dict:
    """meanflow=True adds the time_embed_mixer Linear (no bias) that fuses
    the (t, r) embeddings of a meanflow-distilled estimator
    (CBTDecoder.swift:602-604)."""
    if meanflow is None:
        meanflow = cfg.meanflow
    ks = iter(jax.random.split(key, 512))
    ch = cfg.channels
    time_dim = ch * 4
    head_dim = 64
    p = {
        "time_mlp": {
            "linear_1": layers.init_linear(next(ks), cfg.in_channels, time_dim,
                                           True, dtype),
            "linear_2": layers.init_linear(next(ks), time_dim, time_dim, True,
                                           dtype),
        },
        "down": {
            "resnet": _resnet_init(ks, cfg.in_channels, ch, time_dim, dtype),
            "transformers": {str(i): _tblock_init(ks, ch, cfg.num_heads,
                                                  head_dim, dtype)
                             for i in range(cfg.n_blocks)},
            "downsample": layers.init_conv1d(next(ks), ch, ch, 3, dtype=dtype),
        },
        "mid": {},
        "up": {
            "resnet": _resnet_init(ks, ch * 2, ch, time_dim, dtype),
            "transformers": {str(i): _tblock_init(ks, ch, cfg.num_heads,
                                                  head_dim, dtype)
                             for i in range(cfg.n_blocks)},
            "upsample": layers.init_conv1d(next(ks), ch, ch, 3, dtype=dtype),
        },
        "final_block": {"conv": layers.init_conv1d(next(ks), ch, ch, 3, dtype=dtype),
                        "norm": layers.init_norm(ch, dtype=dtype)},
        "final_proj": layers.init_conv1d(next(ks), ch, cfg.out_channels, 1,
                                         dtype=dtype),
    }
    for m in range(cfg.num_mid_blocks):
        p["mid"][str(m)] = {
            "resnet": _resnet_init(ks, ch, ch, time_dim, dtype),
            "transformers": {str(i): _tblock_init(ks, ch, cfg.num_heads,
                                                  head_dim, dtype)
                             for i in range(cfg.n_blocks)},
        }
    if meanflow:
        p["time_embed_mixer"] = layers.init_linear(next(ks), time_dim * 2,
                                                   time_dim, False, dtype)
    return p


# ------------------------------------------------------------------ forward

def _causal_conv(p, x, mask):
    k = p["weight"].shape[0]
    return layers.conv1d(p, x * mask, padding=(k - 1, 0))


def _causal_block(p, x, mask):
    h = _causal_conv(p["conv"], x, mask)
    h = layers.layer_norm(p["norm"], h)
    return mish(h) * mask


def _resnet(p, x, mask, t_emb):
    h = _causal_block(p["block1"], x, mask)
    h = h + layers.linear(p["mlp_linear"], mish(t_emb))[:, None, :]
    h = _causal_block(p["block2"], h, mask)
    return h + layers.conv1d(p["res_conv"], x * mask)


def _tblock(p, x, attn_bias, heads):
    b, t, d = x.shape
    h = layers.layer_norm(p["norm1"], x)
    inner = p["attn"]["q"]["weight"].shape[0]
    hd = inner // heads
    q = layers.linear(p["attn"]["q"], h).reshape(b, t, heads, hd)
    k = layers.linear(p["attn"]["k"], h).reshape(b, t, heads, hd)
    v = layers.linear(p["attn"]["v"], h).reshape(b, t, heads, hd)
    o = attention.attend(q, k, v, attn_bias)
    x = x + layers.linear(p["attn"]["o"], o.reshape(b, t, inner))
    h = layers.layer_norm(p["norm3"], x)
    x = x + layers.linear(p["ff"]["fc2"],
                          layers.gelu(layers.linear(p["ff"]["fc1"], h)))
    return x


def _chunk_bias(t: int, lengths, chunk: int, left_chunks: int,
                streaming: bool):
    """Padding + (streaming) chunked-causal attention bias (1|B, 1, T, T).

    left_chunks is accepted but NOT applied: the reference's
    subsequentChunkMask ignores its numLeftChunks parameter
    (UpsampleConformerEncoder.swift:124-129), so streaming attention sees
    the full left context — round-3 fix (we previously limited it)."""
    del left_chunks
    ki = jnp.arange(t)[None, :]
    pad = jnp.where(ki < lengths[:, None], 0.0, attention.NEG_INF)
    bias = pad[:, None, None, :]
    if streaming and chunk > 0:
        qc = jnp.arange(t)[:, None] // chunk
        kc = jnp.arange(t)[None, :] // chunk
        bias = bias + jnp.where(kc <= qc, 0.0,
                                attention.NEG_INF)[None, None]
    return bias.astype(jnp.float32)


def _time_embed(params, dim: int, t):
    # sinusoidal time embedding at dim in_channels, scale 1000
    half = dim // 2
    emb_f = jnp.exp(jnp.arange(half) * (-np.log(10000.0) / (half - 1)))
    ang = 1000.0 * t[:, None] * emb_f[None, :]
    t_emb = jnp.concatenate([jnp.sin(ang), jnp.cos(ang)], axis=-1)
    return layers.linear(params["time_mlp"]["linear_2"], jax.nn.silu(
        layers.linear(params["time_mlp"]["linear_1"], t_emb)))


def estimator_forward(params, cfg: EstimatorConfig, x, mask_len, mu, t,
                      spks=None, cond=None, streaming: bool = False,
                      r=None):
    """x/mu/cond: (B, T, 80); spks (B, 80); t (B,) → velocity (B, T, 80).

    r: meanflow second timestep (the Euler step's END time). Meanflow-
    distilled estimators (Chatterbox Turbo) predict the AVERAGE velocity
    over [t, r] and condition on both: emb = time_embed_mixer(concat
    [emb(t), emb(r)]) (CBTDecoder.swift:617-625 + the time_embed_mixer
    Linear at :602-604). Requires params["time_embed_mixer"]."""
    b, tlen, _ = x.shape
    mask = (jnp.arange(tlen) < mask_len[:, None])[..., None].astype(x.dtype)
    t_emb = _time_embed(params, cfg.in_channels, t)
    if r is not None:
        r_emb = _time_embed(params, cfg.in_channels, r)
        t_emb = layers.linear(params["time_embed_mixer"],
                              jnp.concatenate([t_emb, r_emb], axis=-1))

    h = jnp.concatenate([x, mu], axis=-1)
    if spks is not None:
        h = jnp.concatenate([h, jnp.broadcast_to(spks[:, None, :],
                                                 (b, tlen, spks.shape[-1]))],
                            axis=-1)
    if cond is not None:
        h = jnp.concatenate([h, cond], axis=-1)

    bias = _chunk_bias(tlen, mask_len, cfg.static_chunk_size,
                       cfg.num_left_chunks, streaming)

    # down stage
    h = _resnet(params["down"]["resnet"], h, mask, t_emb)
    for i in range(cfg.n_blocks):
        h = _tblock(params["down"]["transformers"][str(i)], h, bias,
                    cfg.num_heads)
    skip = h
    h = _causal_conv(params["down"]["downsample"], h, mask)
    # mid stage
    for m in range(cfg.num_mid_blocks):
        mp = params["mid"][str(m)]
        h = _resnet(mp["resnet"], h, mask, t_emb)
        for i in range(cfg.n_blocks):
            h = _tblock(mp["transformers"][str(i)], h, bias, cfg.num_heads)
    # up stage (skip concat)
    h = jnp.concatenate([h, skip], axis=-1)
    h = _resnet(params["up"]["resnet"], h, mask, t_emb)
    for i in range(cfg.n_blocks):
        h = _tblock(params["up"]["transformers"][str(i)], h, bias,
                    cfg.num_heads)
    h = _causal_conv(params["up"]["upsample"], h, mask)

    h = _causal_block(params["final_block"], h, mask)
    return layers.conv1d(params["final_proj"], h * mask) * mask


OVERLAP_FRAMES = 34  # reference FlowMatching.swift:140-142


def make_flow_cache(z, mu, prompt_len: int):
    """Pin (z, mu) for the prompt + trailing OVERLAP_FRAMES so the next
    chunk's solve agrees at the junction (FlowMatching.swift:133-142)."""
    z_c = jnp.concatenate([z[:, :prompt_len], z[:, -OVERLAP_FRAMES:]], axis=1)
    mu_c = jnp.concatenate([mu[:, :prompt_len], mu[:, -OVERLAP_FRAMES:]],
                           axis=1)
    return jnp.stack([z_c, mu_c], axis=-1)  # (B, prompt+34, D, 2)


def cfm_solve(estimator_fn, cfm: CFMConfig, mu, mask_len, spks, cond, key,
              streaming: bool = False, n_timesteps: int | None = None,
              prompt_len: int = 0, flow_cache=None, return_cache: bool = False,
              out_dim: int | None = None):
    """Generic CFG Euler solver: estimator_fn(x, mask_len, mu, t, spks,
    cond, streaming) → velocity. Used by the Matcha U-Net (here) and
    CosyVoice3's DiT estimator.

    flow_cache: optional (B, prompt_len+34, D, 2) pinned (z, mu) from the
    previous streaming chunk (ConditionalCFM overlap cache,
    FlowMatching.swift:125-142); return_cache adds the updated cache to the
    result.

    out_dim: width of the generated sample x (defaults to mu's width —
    true for the Matcha U-Net; CosyVoice3's DiT conditions an 80-mel x on
    a 512-dim mu, CosyVoice3CFM.swift:365-368)."""
    n_steps = n_timesteps or cfm.n_timesteps
    b, t, d = mu.shape
    z = jax.random.normal(key, (b, t, out_dim or d), mu.dtype)
    if flow_cache is not None and flow_cache.shape[1] > 0:
        cs = flow_cache.shape[1]
        z = jnp.concatenate([flow_cache[..., 0].astype(z.dtype), z[:, cs:]],
                            axis=1)
        mu = jnp.concatenate([flow_cache[..., 1].astype(mu.dtype),
                              mu[:, cs:]], axis=1)
    new_cache = make_flow_cache(z, mu, prompt_len) if return_cache else None
    t_span = jnp.linspace(0.0, 1.0, n_steps + 1)
    if cfm.t_scheduler == "cosine":
        t_span = 1 - jnp.cos(t_span * 0.5 * jnp.pi)

    rate = cfm.inference_cfg_rate
    zero_mu = jnp.zeros_like(mu)
    zero_spk = jnp.zeros_like(spks) if spks is not None else None
    zero_cond = jnp.zeros_like(cond) if cond is not None else None

    def step(i, x):
        t0 = t_span[i]
        dt = t_span[i + 1] - t_span[i]
        x_in = jnp.concatenate([x, x], axis=0)
        mu_in = jnp.concatenate([mu, zero_mu], axis=0)
        t_in = jnp.full((2 * b,), t0, mu.dtype)
        spk_in = (jnp.concatenate([spks, zero_spk], axis=0)
                  if spks is not None else None)
        cond_in = (jnp.concatenate([cond, zero_cond], axis=0)
                   if cond is not None else None)
        len_in = jnp.concatenate([mask_len, mask_len], axis=0)
        v = estimator_fn(x_in, len_in, mu_in, t_in, spk_in, cond_in,
                         streaming)
        v_c, v_u = v[:b], v[b:]
        v_cfg = (1.0 + rate) * v_c - rate * v_u
        return (x + dt * v_cfg).astype(x.dtype)

    out = jax.lax.fori_loop(0, n_steps, step, z)
    if return_cache:
        return out, new_cache
    return out


def cfm_inference(params, est_cfg: EstimatorConfig, cfm: CFMConfig,
                  mu, mask_len, spks, cond, key, streaming: bool = False,
                  n_timesteps: int | None = None, prompt_len: int = 0,
                  flow_cache=None, return_cache: bool = False):
    """ConditionalCFM.forward with the Matcha causal U-Net estimator."""
    def est(x, ml, mu_, t, spks_, cond_, stream):
        return estimator_forward(params, est_cfg, x, ml, mu_, t, spks_,
                                 cond_, stream)

    return cfm_solve(est, cfm, mu, mask_len, spks, cond, key, streaming,
                     n_timesteps, prompt_len=prompt_len,
                     flow_cache=flow_cache, return_cache=return_cache)
