"""Fused Whisper decoder step: all decoder layers (self-attention with
cache, int8 cross-attention, LayerNorm/GELU MLP) in ONE Pallas launch.

Why: the single-stream Whisper window loop is decode-step-dominated after
the encoder — each XLA step of the 4-layer decoder issues ~150 small ops
(three norms, seven projections, two attentions, cache update per layer),
each with microseconds of fixed issue cost, while the actual bytes per
B=1 step (~160 MB int8 weights + 15 MB cross-KV) need ~0.2 ms. Same
finding and same cure as ops/pallas/fused_step.py for the LLM engines,
specialized to the whisper decoder's conventions (reference decode loop:
package/STT/Whisper/WhisperDecoding.swift:81-410, layers
TextDecoder.swift:17-97, MultiHeadAttention.swift:85-135):

  - LayerNorm (weight + bias) everywhere, GELU (erf) MLP with biases;
  - (d/h)^-0.25 scaling applied to q AND k (the cache and the
    precomputed cross-K store the scaled keys, matching the XLA path);
  - cross-attention reads the per-window int8 K/V (quantize_cross_kv
    layout: (L, 1, T_pad, H·hd) codes + (L, 1, H·hd) per-channel scales,
    folded into q and the output exactly as cross_kv_attention does);
  - the self cache is INPUT-only in a flat (L, S_pad, H·hd) view of the
    engine's KVCache (a free reshape at B=1): the current token rides an
    online-softmax fresh term and the kernel emits just the (L, 1, H·hd)
    new slot, scattered outside with one dynamic_update_slice.

Grid: (L, HG + HG + n_hb) — HG head-group phases of self-attention
(weight and cache blocks are BlockSpec column/row VIEWS, no re-layout),
HG head-group phases of cross-attention (q/o weight row/column views and
int8 K/V COLUMN views: per-head softmax is column-independent, so each
group scores, normalizes, and projects its own lane span — loading the
full (T_pad, D) cross-K/V plus both (D, D) cross weights in one phase
was measured 4.5 MB over the 16 MB scoped-VMEM limit with everything
double-buffered), n_hb MLP hidden blocks. Weights may be per-channel
int8 (the w8a8 serving tree) or fp.

Mosaic constraints honored throughout (empirically bisected on-chip, see
ops/pallas/fused_step.py): no sublane-axis concatenation or transposes of
computed arrays — heads stay on the LANE axis (scores are (rows, heads)
columns built by masked broadcast-sums of per-head skinny dots, softmax
reduces over the sublane axis, head extraction uses iota-mask reductions);
every per-layer VECTOR rides as a rank-3 (rows, 1, width) array whose
trailing block equals the array's trailing shape (Mosaic rejects rank-2
blocks with a unit sublane dim over L > 1); self-attention head-group
column views are 128-lane multiples.

B=1, T=1 only — the batched window decoder keeps the XLA path, where the
per-step op cost amortizes over 16 rows.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

try:
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pl = None
    pltpu = None

ROWS = 8          # sublane-padded batch rows; row 0 is the real stream
MAX_GCOLS = 512   # self-attn head-group column cap (VMEM per phase)


def _head_group(h: int, hd: int) -> int | None:
    """Largest head count per self-attention phase with H % g == 0 and a
    128-lane-multiple column view (Mosaic block constraint), capped at
    MAX_GCOLS columns. None if no valid grouping."""
    for g in range(min(h, MAX_GCOLS // max(hd, 1)), 0, -1):
        if h % g == 0 and (g * hd) % 128 == 0:
            return g
    return None


def _ln(x, w, b, eps=1e-5):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean((xf - mu) * (xf - mu), axis=-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps)
            * w.astype(jnp.float32) + b.astype(jnp.float32))


def _erf(x):
    """Abramowitz & Stegun 7.1.26 rational erf (|err| <= 1.5e-7, below
    bf16 resolution): this Mosaic backend has no erf lowering for the TC
    kernel type, but exp is supported."""
    a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
    a4, a5, p = -1.453152027, 1.061405429, 0.3275911
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    y = 1.0 - poly * jnp.exp(-ax * ax)
    return jnp.where(x < 0, -y, y)


def _gelu(x):
    return 0.5 * x * (1.0 + _erf(x / math.sqrt(2.0)))


def _sel(rows: int, cols: int, hd: int):
    """(rows, cols) 0/1 matrix with [r, c] = 1 iff c // hd == r — places
    head r's channel block on its lane span (iota-built, no transposes)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (rows, cols), 1)
    return (c // hd == r).astype(jnp.float32)


def _kernel(pos_ref, x_ref,
            ln1_ref, lnc_ref, ln2_ref, lnf_ref,
            wq_ref, sq_ref, bq_ref, wk_ref, sk_ref,
            wv_ref, sv_ref, bv_ref, wo_ref, so_ref, bo_ref,
            wqc_ref, sqc_ref, bqc_ref, woc_ref, soc_ref, boc_ref,
            k8_ref, ksc_ref, v8_ref, vsc_ref,
            w1_ref, s1_ref, b1_ref, w2_ref, s2_ref, b2_ref,
            kc_ref, vc_ref,
            hout_ref, knew_ref, vnew_ref,
            x_s, hn_s, oacc_s, acc_s, *,
            n_heads, hd, hg, gh, t_valid, l_total, compute_dtype):
    lyr = pl.program_id(0)
    ph = pl.program_id(1)
    n_ph = pl.num_programs(1)
    pos = pos_ref[0]
    cd = compute_dtype
    gcols = gh * hd
    scale = hd ** -0.25

    @pl.when((lyr == 0) & (ph == 0))
    def _init():
        x_s[...] = x_ref[...].astype(jnp.float32)

    @pl.when(ph == 0)
    def _layer_start():
        hn_s[...] = _ln(x_s[...], ln1_ref[0, 0], ln1_ref[0, 1])
        oacc_s[...] = jnp.zeros_like(oacc_s)

    @pl.when(ph < hg)
    def _self_attn():
        hn = hn_s[...].astype(cd)

        def proj(w_ref, s_ref, b_ref):
            y = jax.lax.dot_general(
                hn, w_ref[0].astype(cd), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * s_ref[0, 0][None, :]
            if b_ref is not None:
                y = y + b_ref[0, 0][None, :]
            return y

        q = proj(wq_ref, sq_ref, bq_ref) * scale            # (ROWS, gcols)
        k = proj(wk_ref, sk_ref, None) * scale              # scaled like
        v = proj(wv_ref, sv_ref, bv_ref)                    # the XLA cache
        knew_ref[0] = k[0:1].astype(knew_ref.dtype)
        vnew_ref[0] = v[0:1].astype(vnew_ref.dtype)

        kbuf = kc_ref[0].astype(jnp.float32)                # (S_pad, gcols)
        vbuf = vc_ref[0].astype(jnp.float32)
        s_pad = kbuf.shape[0]
        lane_h = jax.lax.broadcasted_iota(jnp.int32, (s_pad, gh), 1)
        s_hist = jnp.zeros((s_pad, gh), jnp.float32)
        for j in range(gh):  # per-head skinny dots; heads stay on lanes
            qj = q[0:1, j * hd:(j + 1) * hd]                # (1, hd)
            sj = jax.lax.dot_general(
                kbuf[:, j * hd:(j + 1) * hd], qj,
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)         # (S_pad, 1)
            s_hist = s_hist + jnp.where(
                lane_h == j, jnp.broadcast_to(sj, s_hist.shape), 0.0)
        spos = jax.lax.broadcasted_iota(jnp.int32, s_hist.shape, 0)
        s_hist = jnp.where(spos < pos, s_hist, -1e30)
        # fresh (current-token) score per head
        qk = q[0:1] * k[0:1]                                # (1, gcols)
        s_fresh = jax.lax.dot_general(
            qk, _sel(gh, gcols, hd), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)             # (1, gh)
        m = jnp.maximum(jnp.max(s_hist, axis=0, keepdims=True), s_fresh)
        e_h = jnp.exp(s_hist - m)
        e_f = jnp.exp(s_fresh - m)
        den = jnp.sum(e_h, axis=0, keepdims=True) + e_f     # (1, gh)
        p = e_h / den                                       # (S_pad, gh)
        o_rows = jax.lax.dot_general(
            p.astype(cd), vbuf.astype(cd), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)             # (gh, gcols)
        selt = _sel(gh, gcols, hd)                          # (gh, gcols)
        out = jnp.sum(o_rows * selt, axis=0,
                      keepdims=True)                        # (1, gcols)
        pf = jax.lax.dot_general(
            e_f / den, selt, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)             # (1, gcols)
        out = out + pf * v[0:1]
        part = jax.lax.dot_general(
            out.astype(cd), wo_ref[0].astype(cd), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)             # (1, D)
        oacc_s[0:1] += part * so_ref[0, 0][None, :]

        @pl.when(ph == hg - 1)
        def _self_done():
            x_s[0:1, :] = (x_s[0:1, :] + oacc_s[0:1]
                           + bo_ref[0, 0][None, :])
            hn_s[...] = _ln(x_s[...], lnc_ref[0, 0], lnc_ref[0, 1])
            oacc_s[...] = jnp.zeros_like(oacc_s)  # reused by cross phases

    @pl.when((ph >= hg) & (ph < 2 * hg))
    def _cross_group():
        # one head-group of cross-attention end-to-end: scores, softmax,
        # value, and the o-projection partial for this group's lane span.
        # Per-head softmax is column-independent, so nothing crosses
        # phases except the oacc accumulator.
        hn = hn_s[...].astype(cd)
        qc = jax.lax.dot_general(
            hn[0:1], wqc_ref[0].astype(cd), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)             # (1, gcols)
        qc = (qc * sqc_ref[0, 0][None, :] + bqc_ref[0, 0][None, :]) * scale
        qs = qc * ksc_ref[0, 0][None, :]                    # fold K scales
        k8 = k8_ref[0, 0]                                   # (T_pad, gcols)
        t_pad = k8.shape[0]
        gw = max(gh, 8)
        lane_h = jax.lax.broadcasted_iota(jnp.int32, (t_pad, gw), 1)
        scores = jnp.zeros((t_pad, gw), jnp.float32)
        for j in range(gh):  # per-head skinny dots on lane slices
            # f32 operands: Mosaic lowers a computed-bf16 skinny dot via a
            # vector.broadcast that changes element type, which its own
            # verifier rejects (observed on chip); the f32 path verifies,
            # and these dots are ~2M MACs/layer — noise next to the value
            # dot. k8 is int8 so the f32 cast is exact.
            sj = jax.lax.dot_general(
                k8[:, j * hd:(j + 1) * hd].astype(jnp.float32),
                qs[0:1, j * hd:(j + 1) * hd],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)         # (T_pad, 1)
            scores = scores + jnp.where(
                lane_h == j, jnp.broadcast_to(sj, scores.shape), 0.0)
        tpos = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 0)
        scores = jnp.where(tpos < t_valid, scores, -1e30)
        m = jnp.max(scores, axis=0, keepdims=True)
        e = jnp.exp(scores - m)
        p = e / jnp.sum(e, axis=0, keepdims=True)           # (T_pad, gw)
        o_rows = jax.lax.dot_general(
            p.astype(cd), v8_ref[0, 0].astype(cd), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)             # (gw, gcols)
        selt = _sel(gw, gcols, hd)                          # pad rows drop
        out = jnp.sum(o_rows * selt, axis=0, keepdims=True)  # (1, gcols)
        out = out * vsc_ref[0, 0][None, :]                  # fold V scales
        part = jax.lax.dot_general(
            out.astype(cd), woc_ref[0].astype(cd), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)             # (1, D)
        oacc_s[0:1] += part * soc_ref[0, 0][None, :]

        @pl.when(ph == 2 * hg - 1)
        def _cross_done():
            x_s[0:1, :] = (x_s[0:1, :] + oacc_s[0:1]
                           + boc_ref[0, 0][None, :])
            hn_s[...] = _ln(x_s[...], ln2_ref[0, 0], ln2_ref[0, 1])
            acc_s[...] = jnp.zeros_like(acc_s)

    @pl.when(ph >= 2 * hg)
    def _mlp():
        hn = hn_s[...].astype(cd)
        part = jax.lax.dot_general(
            hn, w1_ref[0].astype(cd), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        part = part * s1_ref[0, 0][None, :] + b1_ref[0, 0][None, :]
        act = _gelu(part)
        acc_s[...] += jax.lax.dot_general(
            act.astype(cd), w2_ref[0].astype(cd), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

        @pl.when(ph == n_ph - 1)
        def _layer_end():
            x = (x_s[...] + acc_s[...] * s2_ref[0, 0][None, :]
                 + b2_ref[0, 0][None, :])
            x_s[...] = x

            @pl.when(lyr == l_total - 1)
            def _emit():
                hout_ref[...] = _ln(x, lnf_ref[0, 0], lnf_ref[0, 1])


def _wsc(leaf, want_bias: bool):
    """(weight (L,O,I), scale (L,O), bias (L,O)) from an fp or int8 leaf."""
    if "weight_i8" in leaf:
        w = leaf["weight_i8"]
        s = leaf["scale_i8"].reshape(w.shape[:-1]).astype(jnp.float32)
    else:
        w = leaf["weight"]
        s = jnp.ones(w.shape[:-1], jnp.float32)
    if want_bias:
        b = leaf.get("bias")
        b = (jnp.zeros(w.shape[:-1], jnp.float32) if b is None
             else b.astype(jnp.float32))
        return w, s, b
    return w, s


def _ln_pair(leaf):
    return jnp.stack([leaf["weight"].astype(jnp.float32),
                      leaf["bias"].astype(jnp.float32)], axis=-2)


@functools.partial(jax.jit, static_argnames=("n_heads", "hd", "t_valid",
                                             "interpret"))
def fused_whisper_decode_step(dec: dict, x, pos, k_cache, v_cache,
                              k8, ksc, v8, vsc, *,
                              n_heads: int, hd: int, t_valid: int,
                              interpret: bool = False):
    """x (1, D) embedded token (+position); pos () int32; k/v_cache
    (L, S_pad, H·hd) flat views of the decoder KVCache; k8/v8
    (L, 1, T_pad, H·hd) int8 cross-KV with (L, 1, H·hd) scales
    (ops/pallas/cross_kv_attention.quantize_cross_kv). Returns
    (h (1, D) f32 after the final LN, new k_cache, new v_cache)."""
    blocks = dec["blocks"]
    wq, sq, bq = _wsc(blocks["attn"]["q"], True)
    wk, sk = _wsc(blocks["attn"]["k"], False)
    wv, sv, bv = _wsc(blocks["attn"]["v"], True)
    wo, so, bo = _wsc(blocks["attn"]["o"], True)
    wqc, sqc, bqc = _wsc(blocks["cross_attn"]["q"], True)
    woc, soc, boc = _wsc(blocks["cross_attn"]["o"], True)
    w1, s1, b1 = _wsc(blocks["mlp"]["fc1"], True)
    w2, s2, b2 = _wsc(blocks["mlp"]["fc2"], True)
    ln1 = _ln_pair(blocks["ln1"])
    lnc = _ln_pair(blocks["ln_cross"])
    ln2 = _ln_pair(blocks["ln2"])
    lnf = _ln_pair(dec["ln"])[None]                        # (1, 2, D)

    l_total, d = wq.shape[0], wq.shape[1]
    gh = _head_group(n_heads, hd)
    if gh is None:
        raise ValueError(f"no valid head grouping for H={n_heads} hd={hd}")
    hg = n_heads // gh
    gcols = gh * hd
    hidden = w1.shape[1]
    hb = _whisper_hb(hidden)
    n_hb = hidden // hb
    s_pad = k_cache.shape[1]
    t_pad = k8.shape[2]
    cd = x.dtype

    xp = jnp.zeros((ROWS, d), cd).at[0:1].set(x.astype(cd))
    grid = (l_total, 2 * hg + n_hb)
    kernel = functools.partial(
        _kernel, n_heads=n_heads, hd=hd, hg=hg, gh=gh, t_valid=t_valid,
        l_total=l_total, compute_dtype=cd)

    # rank-3 per-layer vector layouts (see module docstring): per-phase
    # slices flatten to (L·phases, 1, width); whole-row vectors to
    # (L, 1, d) / (L·n_hb, 1, hb). All contiguous reshapes (views).
    def ph3(a):   # (L, d) -> (L*hg, 1, gcols) phase slices
        return a.reshape(l_total * hg, 1, gcols)

    def mh3(a):   # (L, hidden) -> (L*n_hb, 1, hb) hidden blocks
        return a.reshape(l_total * n_hb, 1, hb)

    def r3(a):    # (L, d) -> (L, 1, d)
        return a.reshape(l_total, 1, d)

    def a(shape):
        return pl.BlockSpec(shape,
                            lambda l, p, s: (l,) + (0,) * (len(shape) - 1))

    def sg(shape):  # self head-group weight row views, clamped after hg
        return pl.BlockSpec(
            shape, lambda l, p, s: (l, jnp.minimum(p, hg - 1))
            + (0,) * (len(shape) - 2))

    def sgv():  # self head-group VECTOR rows of (L*hg, 1, gcols)
        return pl.BlockSpec(
            (1, 1, gcols), lambda l, p, s: (
                l * hg + jnp.minimum(p, hg - 1), 0, 0))

    def sgc(shape):  # cache/wo column views on the LAST axis
        return pl.BlockSpec(
            shape, lambda l, p, s: (l, 0, jnp.minimum(p, hg - 1)))

    def cg(shape):  # cross head-group weight ROW views (wqc)
        return pl.BlockSpec(
            shape, lambda l, p, s: (l, jnp.clip(p - hg, 0, hg - 1))
            + (0,) * (len(shape) - 2))

    def cgv():  # cross head-group VECTOR rows of (L*hg, 1, gcols)
        return pl.BlockSpec(
            (1, 1, gcols), lambda l, p, s: (
                l * hg + jnp.clip(p - hg, 0, hg - 1), 0, 0))

    def cgc(shape):  # cross K8/V8/woc COLUMN views on the LAST axis
        return pl.BlockSpec(
            shape, lambda l, p, s: (l,) + (0,) * (len(shape) - 2)
            + (jnp.clip(p - hg, 0, hg - 1),))

    def mh(shape):  # MLP hidden row blocks
        return pl.BlockSpec(
            shape, lambda l, p, s: (
                l, jnp.clip(p - 2 * hg, 0, n_hb - 1))
            + (0,) * (len(shape) - 2))

    def mhv():  # MLP hidden VECTOR rows of (L*n_hb, 1, hb)
        return pl.BlockSpec(
            (1, 1, hb), lambda l, p, s: (
                l * n_hb + jnp.clip(p - 2 * hg, 0, n_hb - 1), 0, 0))

    def mhc(shape):  # fc2 contraction blocks
        return pl.BlockSpec(
            shape, lambda l, p, s: (l, 0, jnp.clip(p - 2 * hg, 0, n_hb - 1)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((ROWS, d), lambda l, p, s: (0, 0)),      # x
            a((1, 2, d)), a((1, 2, d)), a((1, 2, d)),             # ln1/c/2
            pl.BlockSpec((1, 2, d), lambda l, p, s: (0, 0, 0)),   # ln final
            sg((1, gcols, d)), sgv(), sgv(),                      # q w/s/b
            sg((1, gcols, d)), sgv(),                             # k w/s
            sg((1, gcols, d)), sgv(), sgv(),                      # v w/s/b
            sgc((1, d, gcols)), a((1, 1, d)), a((1, 1, d)),       # o w/s/b
            cg((1, gcols, d)), cgv(), cgv(),                      # cq w/s/b
            cgc((1, d, gcols)), a((1, 1, d)), a((1, 1, d)),       # co w/s/b
            cgc((1, 1, t_pad, gcols)), cgv(),                     # K8 + sc
            cgc((1, 1, t_pad, gcols)), cgv(),                     # V8 + sc
            mh((1, hb, d)), mhv(), mhv(),                         # fc1
            mhc((1, d, hb)), a((1, 1, d)), a((1, 1, d)),          # fc2
            sgc((1, s_pad, gcols)),                               # k cache
            sgc((1, s_pad, gcols)),                               # v cache
        ],
        out_specs=[
            pl.BlockSpec((ROWS, d), lambda l, p, s: (0, 0)),
            sgc((1, 1, gcols)),                                   # k new
            sgc((1, 1, gcols)),                                   # v new
        ],
        scratch_shapes=[
            pltpu.VMEM((ROWS, d), jnp.float32),       # residual stream
            pltpu.VMEM((ROWS, d), jnp.float32),       # section norm
            pltpu.VMEM((ROWS, d), jnp.float32),       # self/cross-o acc
            pltpu.VMEM((ROWS, d), jnp.float32),       # mlp accumulator
        ],
    )
    h, k_new, v_new = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((ROWS, d), jnp.float32),
            jax.ShapeDtypeStruct((l_total, 1, d), k_cache.dtype),
            jax.ShapeDtypeStruct((l_total, 1, d), v_cache.dtype),
        ],
        interpret=interpret,
    )(jnp.asarray(pos, jnp.int32).reshape(1),
      xp, ln1, lnc, ln2, lnf,
      wq, ph3(sq), ph3(bq), wk, ph3(sk), wv, ph3(sv), ph3(bv),
      wo, r3(so), r3(bo),
      wqc, ph3(sqc), ph3(bqc), woc, r3(soc), r3(boc),
      k8, ph3(ksc.reshape(l_total, d)), v8, ph3(vsc.reshape(l_total, d)),
      w1, mh3(s1), mh3(b1), w2, r3(s2), r3(b2), k_cache, v_cache)
    at = (0, jnp.asarray(pos, jnp.int32), 0)
    k_cache = jax.lax.dynamic_update_slice(k_cache, k_new, at)
    v_cache = jax.lax.dynamic_update_slice(v_cache, v_new, at)
    return h[0:1], k_cache, v_cache


def _whisper_hb(hidden: int) -> int:
    hb = min(1280, hidden)
    while hidden % hb:
        hb -= 128 if hb > 128 else 8
    return hb


_PROBE_MEMO: dict = {}


def decode_supported(cfg, dec: dict, cache_dtype=jnp.float32) -> bool:
    """Applicability + memoized compile probe for the whisper fused decode
    step at this config's REAL shapes — including the caller's self-cache
    dtype (synthetic weights — callable while tracing the decode function,
    since only static cfg dims are used)."""
    try:
        if jax.default_backend() not in ("tpu", "axon"):
            return False
    except Exception:
        return False
    import os

    if os.environ.get("TPU_AUDIO_FUSED_WHISPER", "1") == "0":
        return False
    h, d = cfg.n_text_head, cfg.n_text_state
    hd = d // h
    if d % 128 or cfg.n_text_ctx % 8:
        return False
    if _head_group(h, hd) is None:
        return False
    q = dec["blocks"]["attn"]["q"]
    int8 = "weight_i8" in q
    cache_dtype = jnp.dtype(cache_dtype)
    # activations = token embedding dtype; the kernel specializes on it
    act_dtype = jnp.dtype(dec["ln"]["weight"].dtype)
    # repr(): config dataclasses may hold unhashable fields (dicts)
    sig = (repr(cfg), int8, cache_dtype.name, act_dtype.name)
    if sig in _PROBE_MEMO:
        return _PROBE_MEMO[sig]
    try:
        import numpy as _np

        from tpu_audio.ops.pallas.probe import run_outside_trace

        # synthetic decoder at the REAL shapes (never materializes the
        # full model). The probe body runs in a fresh thread outside any
        # ambient trace (ops/pallas/probe.py) so it stays eager when a
        # caller gates on it while tracing a decode graph.
        def _run():
            lyr, hidden = cfg.n_text_layer, 4 * d

            def leaf(o, i, bias=True):
                if int8:
                    out = {"weight_i8": jnp.zeros((lyr, o, i), jnp.int8),
                           "scale_i8": jnp.full((lyr, o, 1), 1e-3,
                                                jnp.float32)}
                else:
                    out = {"weight": jnp.zeros((lyr, o, i), jnp.float32)}
                if bias:
                    out["bias"] = jnp.zeros((lyr, o), jnp.float32)
                return out

            def ln(shape=(lyr, d)):
                return {"weight": jnp.ones(shape, jnp.float32),
                        "bias": jnp.zeros(shape, jnp.float32)}

            dec_syn = {
                "blocks": {
                    "attn": {"q": leaf(d, d), "k": leaf(d, d, bias=False),
                             "v": leaf(d, d), "o": leaf(d, d)},
                    "cross_attn": {"q": leaf(d, d), "o": leaf(d, d)},
                    "mlp": {"fc1": leaf(hidden, d), "fc2": leaf(d, hidden)},
                    "ln1": ln(), "ln_cross": ln(), "ln2": ln(),
                },
                "ln": ln((d,)),
            }
            t_pad = -(-cfg.n_audio_ctx // 128) * 128
            k8 = jnp.zeros((lyr, 1, t_pad, d), jnp.int8)
            sc = jnp.full((lyr, 1, d), 1e-3, jnp.float32)
            kc = jnp.zeros((lyr, cfg.n_text_ctx, d), cache_dtype)
            hh, _, _ = fused_whisper_decode_step(
                dec_syn, jnp.zeros((1, d), act_dtype), 0,
                kc, kc, k8, sc, k8, sc, n_heads=h, hd=hd,
                t_valid=cfg.n_audio_ctx)
            return _np.asarray(hh)

        ok = bool(_np.isfinite(run_outside_trace(_run)).all())
    except Exception as exc:
        from tpu_audio.ops.quant import _warn_kernel_fallback

        _warn_kernel_fallback(exc)
        ok = False
    _PROBE_MEMO[sig] = ok
    return ok
