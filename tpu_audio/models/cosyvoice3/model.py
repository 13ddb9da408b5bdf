"""CosyVoice3 streaming synthesis: token chunks → incremental mel → audio.

Reference: package/TTS/CosyVoice3/CosyVoice3Model.swift:10-669 — chunk 25
tokens + 3-token pre-lookahead, silent-token filter (FSQ ids {1,2,28,29,
55,248,494,2241,2242,2322,2323}, runs > 5 dropped), mel cache concat
across chunks, incremental vocoder with source cache and sample offsets;
finalize pass without lookahead at stream end. Flow (CausalMaskedDiffWithDiT,
Flow/CosyVoice3CFM.swift:260-392) = token embedding → PreLookaheadLayer
(k=4 lookahead conv + causal k=3 conv, residual) → ×token_mel_ratio repeat
→ 512-dim mu through the DiT estimator with CFG; vocoder = causal HiFT.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field, replace
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np

from tpu_audio.codecs.s3gen import flow, hift
from tpu_audio.models.cosyvoice3 import dit
from tpu_audio.nn import layers

SILENT_TOKENS = {1, 2, 28, 29, 55, 248, 494, 2241, 2242, 2322, 2323}
MAX_SILENT_RUN = 5
CHUNK_SIZE = 25
PRE_LOOKAHEAD = 3


@dataclass(frozen=True)
class CV3FlowConfig:
    vocab_size: int = 6561
    input_dim: int = 512
    spk_dim: int = 192
    mel_dim: int = 80
    token_mel_ratio: int = 2
    pre_lookahead_len: int = PRE_LOOKAHEAD
    dit: dit.DiTConfig = field(default_factory=dit.DiTConfig)
    cfm: flow.CFMConfig = field(default_factory=flow.CFMConfig)
    hift: hift.HiFTConfig = field(default_factory=hift.HiFTConfig)


def init_params(key, cfg: CV3FlowConfig, dtype=jnp.float32) -> dict:
    ks = jax.random.split(key, 6)
    return {
        "input_embedding": layers.init_embedding(ks[0], cfg.vocab_size,
                                                 cfg.input_dim, dtype),
        "spk_embed_affine_layer": layers.init_linear(ks[1], cfg.spk_dim,
                                                     cfg.dit.spk_dim, True,
                                                     dtype),
        # PreLookaheadLayer (CosyVoice3CFM.swift:28-93): conv1 input→dit.dim
        # with kernel pre_lookahead_len+1 (right/lookahead context), conv2
        # dit.dim→input causal k=3, residual
        "pre_lookahead_layer": {
            "conv1": layers.init_conv1d(ks[2], cfg.input_dim, cfg.dit.dim,
                                        cfg.pre_lookahead_len + 1,
                                        dtype=dtype),
            "conv2": layers.init_conv1d(ks[3], cfg.dit.dim, cfg.input_dim, 3,
                                        dtype=dtype),
        },
        "decoder_estimator": dit.init_params(ks[4], cfg.dit, dtype),
        "mel2wav": hift.init_params(ks[5], cfg.hift, dtype),
    }


def pre_lookahead(p, x: jax.Array, pre_len: int) -> jax.Array:
    """PreLookaheadLayer (CosyVoice3CFM.swift:62-93): each position reads
    pre_len future embeddings through conv1 (k = pre_len+1, leaky-relu),
    then a causal k=3 conv, residual. x (B, T, C) must be zero beyond the
    real length; positions < n_real - pre_len then match the reference's
    streaming (context) mode exactly, and positions < n_real match its
    finalize (zero-right-pad) mode — the two differ only in how much of
    the output is considered valid."""
    xp = jnp.pad(x, ((0, 0), (0, pre_len), (0, 0)))
    h = jax.nn.leaky_relu(layers.conv1d(p["conv1"], xp), 0.01)
    h = layers.conv1d(p["conv2"], h, padding=(2, 0))
    return h + x


def filter_silent_tokens(tokens: list[int],
                         max_run: int = MAX_SILENT_RUN) -> list[int]:
    """Drop silent-token runs longer than max_run (CosyVoice3Model.swift
    silent-token filter)."""
    out = []
    run = 0
    for t in tokens:
        if t in SILENT_TOKENS:
            run += 1
            if run > max_run:
                continue
        else:
            run = 0
        out.append(t)
    return out


def flow_chunk(params, cfg: CV3FlowConfig, tokens, token_len, prompt_mel,
               prompt_mel_len, embedding, key, streaming: bool):
    """tokens (1, T) (prompt+generated window) → mel (1, 2T, mel_dim).

    streaming=True mirrors the reference finalize=false path: the last
    pre_lookahead_len real tokens are lookahead context only, so the valid
    mel length is (token_len - pre_lookahead_len) * ratio
    (CosyVoice3CFM.swift:344-356)."""
    emb = embedding / jnp.maximum(
        jnp.linalg.norm(embedding, axis=-1, keepdims=True), 1e-8)
    spks = layers.linear(params["spk_embed_affine_layer"], emb)
    x = layers.embedding(params["input_embedding"],
                         jnp.clip(tokens, 0, cfg.vocab_size - 1))
    t_tok = x.shape[1]
    x = jnp.where((jnp.arange(t_tok) < token_len[:, None])[..., None], x, 0)
    h = pre_lookahead(params["pre_lookahead_layer"], x,
                      cfg.pre_lookahead_len)
    h_len = token_len - (0 if not streaming else cfg.pre_lookahead_len)
    mu = jnp.repeat(h, cfg.token_mel_ratio, axis=1)
    m_len = h_len * cfg.token_mel_ratio
    t2 = mu.shape[1]
    cond = jnp.zeros((1, t2, cfg.mel_dim), mu.dtype)
    pm = prompt_mel[:, : min(prompt_mel.shape[1], t2)]
    cond = jax.lax.dynamic_update_slice(cond, pm.astype(mu.dtype), (0, 0, 0))
    cond = jnp.where((jnp.arange(t2) < prompt_mel_len)[None, :, None],
                     cond, 0)

    def est(x_, ml, mu_, t, spks_, cond_, stream):
        return dit.forward(params["decoder_estimator"], cfg.dit, x_, ml, mu_,
                           t, spks_, cond_, stream)

    return flow.cfm_solve(est, cfg.cfm, mu, m_len, spks, cond, key,
                          streaming=streaming, out_dim=cfg.mel_dim)


def make_flow_stream_caches(cfg: CV3FlowConfig, s_max: int,
                            n_timesteps: int | None = None,
                            dtype=jnp.float32):
    """Per-flow-timestep DiT stream caches, stacked on a leading timestep
    axis (lax.scan carries each step's own cache). Batch is 2 (CFG
    cond+uncond folded into the batch dim). The chunk-causal mask bounds
    live context to (num_left_chunks+1) static chunks, so s_max only needs
    to cover prompt + that window — memory is O(1) in stream length."""
    n = n_timesteps or cfg.cfm.n_timesteps
    one = dit.make_stream_cache(cfg.dit, 2, s_max, dtype)
    return jax.tree_util.tree_map(
        lambda a: jnp.zeros((n, *a.shape), a.dtype), one)


def cfm_solve_chunk(params, cfg: CV3FlowConfig, z_new, mu_new, spks,
                    cond_new, caches, valid_new=None,
                    n_timesteps: int | None = None):
    """CFG Euler solve over the NEW frames only, reading/advancing the
    per-timestep frozen KV caches. Equivalent of flow.cfm_solve
    restricted to the chunk (O(chunk) work instead of O(window))."""
    n_steps = n_timesteps or cfg.cfm.n_timesteps
    b, tn, d = mu_new.shape
    assert b == 1, "streaming flow is single-stream"
    t_span = jnp.linspace(0.0, 1.0, n_steps + 1)
    if cfg.cfm.t_scheduler == "cosine":
        t_span = 1 - jnp.cos(t_span * 0.5 * jnp.pi)
    rate = cfg.cfm.inference_cfg_rate

    mu_in = jnp.concatenate([mu_new, jnp.zeros_like(mu_new)], axis=0)
    spk_in = jnp.concatenate([spks, jnp.zeros_like(spks)], axis=0)
    cond_in = jnp.concatenate([cond_new, jnp.zeros_like(cond_new)], axis=0)

    def body(x, per_step):
        t0, dt, cache_i = per_step
        x_in = jnp.concatenate([x, x], axis=0)
        t_in = jnp.full((2 * b,), t0, mu_new.dtype)
        v, cache_i = dit.forward_chunk(params["decoder_estimator"], cfg.dit,
                                       x_in, mu_in, t_in, spk_in, cond_in,
                                       cache_i, valid_new=valid_new)
        v_cfg = (1.0 + rate) * v[:b] - rate * v[b:]
        return (x + dt * v_cfg).astype(x.dtype), cache_i

    x, caches = jax.lax.scan(
        body, z_new, (t_span[:-1], t_span[1:] - t_span[:-1], caches))
    return x, caches


@jax.jit
def roll_stream_caches(caches, shift):
    """Slide every per-timestep KV cache left by `shift` slots (must be a
    multiple of static_chunk_size so absolute chunk boundaries survive;
    RoPE'd K/V values are position-absolute and move unchanged). base
    advances by the same amount, so slot+base stays the absolute frame."""

    def roll_kv(a):  # (n, depth, B, S, H, hd) — slide the S axis
        rolled = jnp.roll(a, -shift, axis=3)
        slot = jnp.arange(a.shape[3])
        return jnp.where(
            (slot < a.shape[3] - shift)[None, None, None, :, None, None],
            rolled, 0)

    return dit.DiTStreamCache(
        k=roll_kv(caches.k), v=roll_kv(caches.v),
        conv1_tail=caches.conv1_tail, conv2_tail=caches.conv2_tail,
        pos=caches.pos - shift, base=caches.base + shift)


class CV3Synthesizer:
    """Host orchestration of the chunked streaming pipeline.

    o1_flow=True (default) runs the DiT flow with frozen per-timestep KV
    caches: per-chunk cost is O(chunk), constant for the whole stream
    (the reference — and o1_flow=False — re-runs the growing window every
    chunk, so chunk latency drifts upward on long streams). The mu
    pipeline (embedding + pre-lookahead convs) still sees the full token
    window (it is ~1% of flow cost). The cache ring holds
    stream_cache_frames slots; the O(1) path runs the DiT with a BOUNDED
    left window (num_left_chunks ≥ 0 — a beyond-reference approximation;
    the reference's streaming mask is unbounded-left), so the ring
    slides."""

    def __init__(self, params, cfg: CV3FlowConfig, o1_flow="auto",
                 stream_cache_frames: int = 512,
                 o1_switch_frames: int = 600):
        """o1_flow: "auto" (default) runs the reference-style full-window
        recompute — which is FASTER while the window is small (bigger ops,
        fewer dispatches) and numerically identical to the reference — and
        switches to the O(1) cached flow once the window crosses
        o1_switch_frames, bootstrapping the DiT cache over the attention
        horizon in one call. True forces cached flow from the first chunk;
        False never switches (per-chunk latency then grows with the
        window)."""
        self.params = params
        self.cfg = cfg
        self.o1_flow = o1_flow
        self.stream_cache_frames = stream_cache_frames
        self.o1_switch_frames = o1_switch_frames
        # the reference streaming mask has unbounded left context
        # (num_left_chunks = -1); the O(1) frozen-KV path needs a bounded
        # window for its ring — a documented beyond-reference approximation
        # (2 left chunks = 100 mel frames of live context)
        if cfg.dit.num_left_chunks < 0:
            self._o1_cfg = replace(cfg, dit=replace(cfg.dit,
                                                    num_left_chunks=2))
        else:
            self._o1_cfg = cfg
        self._flow_fns = {}
        self._voc_fns = {}
        self._mu_fns = {}
        self._chunk_fns = {}
        # set to a dict to collect per-stage wall times (forces extra host
        # syncs — diagnostic only, see benchmarks/cv3_streaming.py --stages)
        self.stage_times: dict | None = None

    def _mark(self, name: str, t0: float) -> float:
        if self.stage_times is None:
            return t0
        t1 = time.perf_counter()
        self.stage_times.setdefault(name, []).append(t1 - t0)
        return t1

    # ------------------------------------------------- O(1) flow pieces

    def _mu_fn(self, t_pad: int, chunk_pad: int):
        """Token embedding → pre-lookahead layer → ×ratio repeat + spk
        affine, returning ONLY the (1, chunk_pad, mu_dim) window of mu at
        dynamic offset `lo`.

        The pre-lookahead convs run over the full token window (cheap —
        two convs), but the dispatch OUTPUT is O(chunk): returning the
        full accumulated mu paid an O(stream-length) per-chunk device→host
        transfer — measured as the only positive per-stage drift term
        (+0.5 ms/chunk at 40 chunks, cv3_streaming.py --stages)."""
        key_ = ("mu", t_pad, chunk_pad)
        if key_ not in self._mu_fns:
            cfg = self.cfg

            @jax.jit
            def fn(params, tokens, tl, emb, lo, n_valid):
                e = emb / jnp.maximum(
                    jnp.linalg.norm(emb, axis=-1, keepdims=True), 1e-8)
                spks = layers.linear(params["spk_embed_affine_layer"], e)
                x = layers.embedding(params["input_embedding"],
                                     jnp.clip(tokens, 0, cfg.vocab_size - 1))
                x = jnp.where((jnp.arange(t_pad) < tl[:, None])[..., None],
                              x, 0)
                h = pre_lookahead(params["pre_lookahead_layer"], x,
                                  cfg.pre_lookahead_len)
                hu = jnp.repeat(h, cfg.token_mel_ratio, axis=1)
                hp = jnp.pad(hu, ((0, 0), (0, chunk_pad), (0, 0)))
                sl = jax.lax.dynamic_slice(
                    hp, (0, lo, 0), (1, chunk_pad, hu.shape[-1]))
                idx = jnp.arange(chunk_pad)
                return jnp.where((idx < n_valid)[None, :, None], sl, 0.0), \
                    spks

            self._mu_fns[key_] = fn
        return self._mu_fns[key_]

    def _chunk_fn(self, chunk_pad: int):
        if chunk_pad not in self._chunk_fns:
            cfg = self._o1_cfg

            @jax.jit
            def fn(params, z, mu_new, spks, cond_new, caches, valid):
                return cfm_solve_chunk(params, cfg, z, mu_new, spks,
                                       cond_new, caches, valid_new=valid)

            self._chunk_fns[chunk_pad] = fn
        return self._chunk_fns[chunk_pad]

    def _flow_fn(self, t_pad: int, streaming: bool):
        key_ = (t_pad, streaming)
        if key_ not in self._flow_fns:
            cfg = self.cfg

            @jax.jit
            def fn(params, tokens, tl, pm, pml, emb, key):
                return flow_chunk(params, cfg, tokens, tl, pm, pml, emb, key,
                                  streaming)

            self._flow_fns[key_] = fn
        return self._flow_fns[key_]

    def _voc_fn(self, lb: int, n_new: int):
        """Jitted vocode_window, cached per (lookback, new-frames) shape —
        steady-state streaming hits ONE compiled graph regardless of how
        long the utterance grows (the full-recompute scheme recompiled per
        length bucket AND did O(n²) work)."""
        key_ = (lb, n_new)
        if key_ not in self._voc_fns:
            cfg = self.cfg

            @jax.jit
            def fn(params, mel_, key, phase, source_tail, start_frame):
                return hift.vocode_window(params["mel2wav"], cfg.hift, mel_,
                                          key, phase, source_tail,
                                          start_frame)

            self._voc_fns[key_] = fn
        return self._voc_fns[key_]

    def stream(self, token_chunks: Iterator[list[int]],
               prompt_tokens: list[int], prompt_mel: np.ndarray,
               embedding, *, seed: int = 0,
               chunk_size: int = CHUNK_SIZE) -> Iterator[np.ndarray]:
        """Consume LM token chunks, yield incremental audio samples.

        The flow re-runs over the full accumulated token window with
        streaming (chunk-causal) attention — mathematically stable because
        every mask is causal at chunk granularity (matches the reference,
        CosyVoice3Model.swift:605-649). The vocoder, unlike the reference's
        full-mel re-run, is O(1) per chunk: hift.vocode_window with a
        32-frame lookback + carried sine phase/source state reproduces the
        full pass exactly at a fixed per-chunk cost."""
        cfg = self.cfg
        p_len = len(prompt_tokens)
        pm = jnp.asarray(prompt_mel[None]) if prompt_mel.ndim == 2 \
            else jnp.asarray(prompt_mel)
        emb = jnp.asarray(embedding)

        gen_tokens: list[int] = []
        emitted = 0  # generated tokens whose audio has been yielded
        mel_ratio = cfg.token_mel_ratio
        ups = cfg.hift.upsample_scale
        done = False
        chunk_iter = iter(token_chunks)

        # incremental vocoder state (hift.vocode_window)
        nh = cfg.hift.nb_harmonics + 1
        phase = jnp.zeros((1, nh))
        source_tail = jnp.zeros((1, 0))
        voc_frames = 0  # absolute mel frames already vocoded
        voc_key = jax.random.PRNGKey(seed)

        # O(1)-flow state (per-timestep frozen DiT KV caches)
        caches = None
        cache_base = 0  # absolute frame of cache slot 0
        mel_tail = np.zeros((0, cfg.mel_dim), np.float32)
        pm_np = np.asarray(pm[0], np.float32)
        noise_key = jax.random.PRNGKey(seed + 7)
        static = cfg.dit.static_chunk_size
        horizon = (self._o1_cfg.dit.num_left_chunks + 1) * static
        o1_active = False

        while True:
            while (not done
                   and len(gen_tokens) < emitted + chunk_size + PRE_LOOKAHEAD):
                try:
                    gen_tokens.extend(filter_silent_tokens(next(chunk_iter)))
                except StopIteration:
                    done = True
            emit_upto = len(gen_tokens) if done else emitted + chunk_size
            if emit_upto <= emitted:
                break
            # flow sees emitted+chunk (+ lookahead context when available)
            window_end = len(gen_tokens) if done else min(
                len(gen_tokens), emit_upto + PRE_LOOKAHEAD)
            tokens_window = list(prompt_tokens) + gen_tokens[:window_end]
            n = len(tokens_window)
            t_pad = max(32, -(-n // 32) * 32)
            toks = np.zeros((1, t_pad), np.int32)
            toks[0, :n] = tokens_window
            valid_frames = (p_len + emit_upto) * mel_ratio
            lb = min(hift.LOOKBACK_FRAMES, voc_frames)
            n_new = valid_frames - voc_frames
            if not o1_active:
                # one-shot synthesis keeps the reference's full finalize
                # pass; streams switch when forced (True) or when the
                # window crosses the auto threshold
                multi_chunk = not (done and emitted == 0)
                if multi_chunk and (
                        self.o1_flow is True
                        or (self.o1_flow == "auto"
                            and valid_frames > self.o1_switch_frames)):
                    o1_active = True

            if o1_active:

                def run_chunk(lo, hi, caches, cache_base):
                    """Flow frames [lo, hi) through the cached DiT."""
                    chunk_frames = hi - lo
                    chunk_pad = max(32, -(-chunk_frames // 32) * 32)
                    # the mu dispatch returns ONLY this chunk's window —
                    # output (and transfer) O(chunk), not O(stream length)
                    t_mu = time.perf_counter()
                    mu_new, spks = self._mu_fn(t_pad, chunk_pad)(
                        self.params, jnp.asarray(toks), jnp.asarray([n]),
                        emb, jnp.int32(lo), jnp.int32(chunk_frames))
                    if self.stage_times is not None:
                        np.asarray(mu_new)  # force the tunnel round-trip
                    self._mark("mu", t_mu)
                    t_flow = time.perf_counter()
                    cond_new = np.zeros((1, chunk_pad, cfg.mel_dim),
                                        np.float32)
                    p_over = max(0, min(pm_np.shape[0], hi) - lo)
                    if p_over > 0:
                        cond_new[0, :p_over] = pm_np[lo: lo + p_over]
                    z_new = jax.random.normal(
                        jax.random.fold_in(noise_key, lo),
                        (1, chunk_pad, cfg.mel_dim), jnp.float32)
                    if caches is None:
                        s_max = max(self.stream_cache_frames,
                                    -(-(chunk_pad + static) // static)
                                    * static)
                        caches = make_flow_stream_caches(self._o1_cfg, s_max)
                        cache_base = lo  # static-aligned by construction
                    slot = lo - cache_base
                    s_max = caches.k.shape[3]
                    if slot + chunk_pad > s_max:
                        shift = (-(-(slot + chunk_pad - s_max) // static)
                                 * static)
                        caches = roll_stream_caches(caches, jnp.int32(shift))
                        cache_base += shift
                    x_new, caches = self._chunk_fn(chunk_pad)(
                        self.params, z_new, jnp.asarray(mu_new), spks,
                        jnp.asarray(cond_new), caches,
                        jnp.int32(chunk_frames))
                    out = np.asarray(x_new[0, :chunk_frames], np.float32)
                    self._mark("flow", t_flow)
                    return out, caches, cache_base

                if caches is None and voc_frames > 0:
                    # auto-switch bootstrap: prime the cache over the DiT
                    # attention horizon (older frames are never attended —
                    # num_left_chunks bounds the mask); output discarded
                    # (those frames are already vocoded)
                    h_start = max(0, (voc_frames - horizon) // static
                                  * static)
                    _, caches, cache_base = run_chunk(
                        h_start, voc_frames, None, 0)
                new_mel, caches, cache_base = run_chunk(
                    voc_frames, valid_frames, caches, cache_base)
                window = np.concatenate(
                    [mel_tail[len(mel_tail) - lb:], new_mel], axis=0)
                mel_tail = window[max(0, len(window)
                                      - hift.LOOKBACK_FRAMES):]
            else:
                mel = self._flow_fn(t_pad, not done)(
                    self.params, jnp.asarray(toks), jnp.asarray([n]), pm,
                    jnp.asarray([pm.shape[1]]), emb, jax.random.PRNGKey(seed))
                mel_np = np.asarray(mel[0])
                window = mel_np[voc_frames - lb: valid_frames]
                # keep the vocoder-lookback tail in case the auto policy
                # switches to the cached flow on a later chunk
                mel_tail = np.asarray(
                    mel_np[max(0, valid_frames - hift.LOOKBACK_FRAMES):
                           valid_frames], np.float32)
            t_voc = time.perf_counter()
            audio_w, phase, source_w = self._voc_fn(lb, n_new)(
                self.params, jnp.asarray(window[None]), voc_key, phase,
                source_tail[:, source_tail.shape[1] - lb * ups:],
                jnp.asarray(voc_frames))
            new_audio = np.asarray(audio_w[0, lb * ups:], np.float32)
            self._mark("voc", t_voc)
            new_lb = min(hift.LOOKBACK_FRAMES, valid_frames)
            source_tail = source_w[:, (lb + n_new - new_lb) * ups:]
            # skip the prompt-region samples (first chunk only)
            skip = max(0, p_len * mel_ratio - voc_frames)
            voc_frames = valid_frames
            new_audio = new_audio[skip * ups:]
            emitted = emit_upto
            if len(new_audio):
                yield new_audio
            if done:
                break
