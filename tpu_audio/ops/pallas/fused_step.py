"""Fused single-token transformer decode step: the WHOLE layer stack in one
Pallas kernel launch.

Why: latency-bound small-model decode loops (the Marvis depth decoder runs
4 layers × 31 sequential codebook steps per 12.5 Hz frame — reference
package/TTS/Marvis/Models/MarvisModel.swift:365-587) spend their time on
per-op dispatch, not on math or bytes: one XLA decode step of a small
stack issues ~90 small ops (norms, matvecs, rope, cache updates, attention
pieces), each microseconds of fixed cost on the sequential TPU pipeline.
This kernel collapses the entire stack to ONE launch per token: grid
(layers, attn_phases + hidden_blocks), residual stream carried in VMEM
scratch across grid steps, weights streamed layer-by-layer from HBM with
Pallas' double-buffered pipeline (the weight stream — the true lower bound
of small-batch decode — overlaps the compute of the previous block).

Two grid layouts over the SAME stack arrays (no re-layout, no copies —
every per-phase weight block is a BlockSpec view into the fused qkv /
gateup arrays, whose group rows are already contiguous):
  - plain:   one attention phase covers all kv heads (small models);
  - grouped: one attention phase per kv-head group, with the o projection
    accumulated across phases (per-output-channel scales factor out of
    the partial sums exactly) — large models (1B/3B) whose qkv/o blocks
    would otherwise blow the ~16 MB/core VMEM budget.
`choose_mode` picks the layout; `probe_compile` compile-checks the REAL
shapes (incl. the caller's cache length/dtype) before any decode graph
commits to the kernel.

The KV cache is INPUT-only: attention handles the current token's k/v as
an online-softmax fresh term, and the kernel emits just the (L, KVH, 1,
hd) new slot, which the wrapper scatters into the cache with one XLA
dynamic_update_slice — no full-cache write-back per token.

Semantics match nn/transformer.forward_hidden for the supported subset:
rms-norm, fused qkv (optional Qwen2 bias), optional Qwen3 per-head q/k
rms, half-split RoPE (cos/sin computed outside at the step position), GQA
attention over a (KVH, S_pad, hd) cache, swiglu MLP, final stack norm.
Weights are either fp (bf16/f32) or per-channel int8
(ops/quant.quantize_array_int8): int8 codes are cast raw to the compute
dtype inside the kernel and the per-output-channel scale applies to the
dot OUTPUT — activations stay exact at 1 byte/weight of HBM stream.

Batch handling: built for the B=1 latency case; the row axis is padded to
8 sublanes and only row 0 carries data (pad rows are zeros through every
op: rms(0)=0, dot(0)=0).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

ROWS = 8  # sublane-padded batch rows; row 0 is the real stream


def _pick_hb(hidden: int, hidden_block: int) -> int:
    hb = min(hidden_block, hidden)
    while hidden % hb:  # largest divisor <= hidden_block (128-steps, then 8)
        hb -= 128 if hb > 128 else 8
    if hb < 8:
        raise ValueError(f"no usable hidden block for hidden={hidden}")
    return hb


def _grouped_hb(d: int, hidden: int) -> int:
    """Hidden-block policy for the grouped layout: shrink blocks as the
    model dim grows so per-phase VMEM stays bounded (shared by the gate
    estimate and the kernel wrapper)."""
    cap = 512 if d <= 1024 else (256 if d <= 2048 else 128)
    return _pick_hb(hidden, cap)


def _rms(x, w, eps):
    return x * jax.lax.rsqrt(jnp.mean(x * x, axis=-1, keepdims=True)
                             + eps) * w


def _kernel(pos_ref, x_ref, cos_ref, sin_ref, ln1_ref, ln2_ref, normw_ref,
            wq_ref, sq_ref, bq_ref, wk_ref, sk_ref, bk_ref,
            wv_ref, sv_ref, bv_ref, qknorm_ref, wo_ref, so_ref,
            wg_ref, sg_ref, wu_ref, su_ref, wd_ref, sd_ref,
            kin_ref, vin_ref,
            hout_ref, knew_ref, vnew_ref,
            x_s, hn1_s, hn2_s, oacc_s, acc_s, *,
            n_heads, n_kv_heads, gpp, hd, eps, l_total, compute_dtype,
            qkv_bias, qk_norm):
    lyr = pl.program_id(0)
    ph = pl.program_id(1)
    n_ph = pl.num_programs(1)
    n_attn_ph = n_kv_heads // gpp
    group = n_heads // n_kv_heads
    pos = pos_ref[0]
    start = pos_ref[1]  # first valid key slot (left-padded prompts)
    cd = compute_dtype

    @pl.when((lyr == 0) & (ph == 0))
    def _init():
        x_s[...] = x_ref[...].astype(jnp.float32)

    @pl.when(ph == 0)
    def _layer_start():
        hn1_s[...] = _rms(x_s[...], ln1_ref[0, 0].astype(jnp.float32), eps)
        oacc_s[...] = jnp.zeros_like(oacc_s)

    @pl.when(ph < n_attn_ph)
    def _attn():
        hn = hn1_s[...].astype(cd)                          # (ROWS, D)

        def proj(w_ref, s_ref, b_ref):
            y = jax.lax.dot_general(
                hn, w_ref[0].astype(cd), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            y = y * s_ref[0, 0][None, :]
            if qkv_bias:
                y = y + b_ref[0, 0][None, :]
            return y

        q = proj(wq_ref, sq_ref, bq_ref)                    # (ROWS, gpp*G*hd)
        k = proj(wk_ref, sk_ref, bk_ref)                    # (ROWS, gpp*hd)
        v = proj(wv_ref, sv_ref, bv_ref)

        cos = cos_ref[0].astype(jnp.float32)                # (hd,)
        sin = sin_ref[0].astype(jnp.float32)
        half = hd // 2

        def rot(vec, which=0):                              # (rows, hd) f32
            if qk_norm:  # Qwen3: per-head rms before rope; qknorm (1,2,hd)
                vec = _rms(vec, qknorm_ref[0, which].astype(jnp.float32),
                           eps)
            r = jnp.concatenate([-vec[:, half:], vec[:, :half]], axis=1)
            return vec * cos[None, :] + r * sin[None, :]

        scale = hd ** -0.5
        # Per-head attention with NO sublane-axis data movement: this
        # Mosaic backend crashes on sublane concatenation / transposes of
        # computed arrays (empirically bisected on-chip), so heads stay on
        # the LANE axis throughout — scores live in (S_pad, G) columns
        # built by masked broadcast-sums of per-head skinny dots, the
        # softmax reduces over the sublane (S) axis, and the per-head
        # p·V products lane-concatenate back into the flat (1, G·hd)
        # attention output (the proven cross_kv_attention primitive set).
        outs = []
        for gi in range(gpp):
            k_g = rot(k[0:1, gi * hd:(gi + 1) * hd], which=1)   # (1, hd)
            v_g = v[0:1, gi * hd:(gi + 1) * hd].astype(jnp.float32)
            knew_ref[0, gi] = k_g.astype(knew_ref.dtype)
            vnew_ref[0, gi] = v_g.astype(vnew_ref.dtype)
            kbuf = kin_ref[0, gi].astype(jnp.float32)           # (S_pad, hd)
            vbuf = vin_ref[0, gi].astype(jnp.float32)
            s_pad = kbuf.shape[0]
            lane_g = jax.lax.broadcasted_iota(
                jnp.int32, (s_pad, group), 1)
            lane_f = jax.lax.broadcasted_iota(jnp.int32, (1, group), 1)
            # history scores over [start, pos) + the CURRENT token as an
            # online-softmax fresh term (slot `pos` of the input cache is
            # stale — the new k/v leave the kernel via knew/vnew instead
            # of a full-cache write-back)
            s_hist = jnp.zeros((s_pad, group), jnp.float32)
            s_fresh = jnp.zeros((1, group), jnp.float32)
            for j in range(group):
                qj = rot(q[0:1, (gi * group + j) * hd:
                              (gi * group + j + 1) * hd]) * scale  # (1, hd)
                sj = jax.lax.dot_general(
                    kbuf, qj, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)         # (S_pad, 1)
                s_hist = s_hist + jnp.where(
                    lane_g == j, jnp.broadcast_to(sj, s_hist.shape), 0.0)
                fj = jnp.sum(qj * k_g, axis=1, keepdims=True)   # (1, 1)
                s_fresh = s_fresh + jnp.where(
                    lane_f == j, jnp.broadcast_to(fj, s_fresh.shape), 0.0)
            spos = jax.lax.broadcasted_iota(jnp.int32, s_hist.shape, 0)
            s_hist = jnp.where((spos >= start) & (spos < pos),
                               s_hist, -1e30)
            m = jnp.maximum(jnp.max(s_hist, axis=0, keepdims=True),
                            s_fresh)                            # (1, G)
            e_h = jnp.exp(s_hist - m)                           # (S_pad, G)
            e_f = jnp.exp(s_fresh - m)                          # (1, G)
            den = jnp.sum(e_h, axis=0, keepdims=True) + e_f     # (1, G)
            p = (e_h / den).astype(cd)
            pf = e_f / den                                      # (1, G)
            for j in range(group):
                oj = jax.lax.dot_general(
                    p[:, j:j + 1], vbuf.astype(cd),
                    (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)         # (1, hd)
                outs.append(oj + pf[0:1, j:j + 1] * v_g)
        flat = jnp.concatenate(outs, axis=1)                # (1, gpp*G*hd)
        part = jax.lax.dot_general(
            flat.astype(cd), wo_ref[0].astype(cd),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)             # (1, D)
        oacc_s[0:1] += part

        @pl.when(ph == n_attn_ph - 1)
        def _attn_done():
            o = oacc_s[0:1] * so_ref[0, 0][None, :]
            x_s[0:1, :] = x_s[0:1, :] + o
            x = x_s[...]
            hn2_s[...] = _rms(x, ln2_ref[0, 0].astype(jnp.float32), eps)
            acc_s[...] = jnp.zeros_like(acc_s)

    @pl.when(ph >= n_attn_ph)
    def _mlp():
        hn2 = hn2_s[...].astype(cd)                         # (ROWS, D)
        g = jax.lax.dot_general(
            hn2, wg_ref[0].astype(cd), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * sg_ref[0, 0][None, :]
        u = jax.lax.dot_general(
            hn2, wu_ref[0].astype(cd), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * su_ref[0, 0][None, :]
        act = (g * jax.lax.logistic(g)) * u                 # silu(g) * u
        acc_s[...] += jax.lax.dot_general(
            act.astype(cd), wd_ref[0].astype(cd), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)             # (ROWS, D)

        @pl.when(ph == n_ph - 1)
        def _layer_end():
            x = x_s[...] + acc_s[...] * sd_ref[0, 0][None, :]
            x_s[...] = x

            @pl.when(lyr == l_total - 1)
            def _emit():
                hout_ref[...] = _rms(
                    x, normw_ref[0].astype(jnp.float32), eps)


try:  # import at module scope for the kernel body above
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover - pallas always ships with jax here
    pl = None
    pltpu = None


@functools.partial(
    jax.jit, static_argnames=("n_heads", "n_kv_heads", "hd", "eps",
                              "grouped", "interpret"))
def fused_decode_step(x, pos, cos, sin, stack, k_cache, v_cache, *,
                      start=0, grouped: bool | None = None,
                      n_heads: int, n_kv_heads: int, hd: int,
                      eps: float = 1e-5,
                      interpret: bool = False):
    """One token through the whole stacked layer set, one kernel launch.

    x (1, D) float; pos () int32 cache position (rope position == cache
    position; callers with offsets fold them into cos/sin); cos/sin (1, hd)
    f32 for this position (half-split duplicated layout, see
    nn/rope.apply_rope); stack: prepare_stack() output; k/v_cache
    (L, KVH, S_pad, hd) in the cache dtype; start () int32 first valid key
    slot (left-padded prompt masking — slots < start never attend);
    grouped: None (default) derives the layout from THIS call's actual
    weight/cache shapes via the same rule the gate uses — the single
    source of truth, so probe_compile provably compiles the variant that
    runs; an explicit bool forces a layout (tests). Returns (h (1, D) f32
    after the final stack norm, new k_cache, new v_cache) — the caches are
    updated with one XLA scatter of the kernel's (L, KVH, 1, hd)
    fresh-slot outputs.
    """
    l_total, qo, d = stack["wqkv"].shape[:3]
    hidden = stack["wgateup"].shape[1] // 2  # gate rows then up rows
    if grouped is None:
        mode = _mode_from_shapes(
            d, n_heads, n_kv_heads, hd, hidden, stack["wqkv"].dtype.itemsize,
            k_cache.shape[2], k_cache.dtype.itemsize)
        grouped = mode == "grouped"  # None -> plain; gates should prevent it
    hb = _grouped_hb(d, hidden) if grouped else _pick_hb(hidden, 512)
    n_hb = hidden // hb
    cd = x.dtype
    h_, kvh = n_heads, n_kv_heads
    gpp = 1 if grouped else kvh  # kv groups per attention phase
    n_attn_ph = kvh // gpp
    g = h_ // kvh
    q_blk = gpp * g * hd  # q rows per phase (contiguous in the fused qkv)
    k_blk = gpp * hd

    xp = jnp.zeros((ROWS, d), cd).at[0:1].set(x.astype(cd))
    s_pad = k_cache.shape[2]

    grid = (l_total, n_attn_ph + n_hb)
    kernel = functools.partial(
        _kernel, n_heads=h_, n_kv_heads=kvh, gpp=gpp, hd=hd, eps=eps,
        l_total=l_total, compute_dtype=cd,
        qkv_bias="bqkv" in stack, qk_norm="qknorm" in stack)
    wqkv = stack["wqkv"]
    sqkv = stack["sqkv"]
    bqkv = stack.get("bqkv")
    if bqkv is None:
        bqkv = jnp.zeros((l_total, qo), jnp.float32)
    qknorm = stack.get("qknorm")
    if qknorm is None:
        qknorm = jnp.ones((l_total, 2, hd), jnp.float32)
    gateup = stack["wgateup"]

    # block index (in block units) where the k / v row regions start inside
    # the fused qkv array's output rows: [q (H*hd) | k (KVH*hd) | v]
    k_row0 = h_ * hd // k_blk        # = H // gpp, integral under GQA
    v_row0 = (h_ + kvh) * hd // k_blk

    # Mosaic rejects rank-2 blocks whose sublane (layer) dim is 1 over
    # L > 1 — the last two block dims must be (8, 128)-divisible or equal
    # to the array dims. Every per-layer VECTOR therefore rides as a
    # rank-3 (rows, 1, width) array whose trailing (1, width) block IS the
    # array's trailing shape: per-layer vectors as (L, 1, d), per-phase
    # slices flattened to (L·phases, 1, width). All reshapes/slices below
    # are views of contiguous regions (the qkv row regions and gate/up
    # halves are contiguous by construction).
    ln1 = stack["ln1"].reshape(l_total, 1, d)
    ln2 = stack["ln2"].reshape(l_total, 1, d)
    so_v = stack["so"].reshape(l_total, 1, d)
    sd_v = stack["sdown"].reshape(l_total, 1, d)
    qr, kr = h_ * hd, kvh * hd
    sq_v = sqkv[:, :qr].reshape(l_total * n_attn_ph, 1, q_blk)
    sk_v = sqkv[:, qr:qr + kr].reshape(l_total * n_attn_ph, 1, k_blk)
    sv_v = sqkv[:, qr + kr:].reshape(l_total * n_attn_ph, 1, k_blk)
    bq_v = bqkv[:, :qr].reshape(l_total * n_attn_ph, 1, q_blk)
    bk_v = bqkv[:, qr:qr + kr].reshape(l_total * n_attn_ph, 1, k_blk)
    bv_v = bqkv[:, qr + kr:].reshape(l_total * n_attn_ph, 1, k_blk)
    sg_v = stack["sgate"].reshape(l_total * n_hb, 1, hb)
    su_v = stack["sup"].reshape(l_total * n_hb, 1, hb)

    def a(shape):  # per-layer block, constant across phases
        return pl.BlockSpec(shape,
                            lambda l, p, s: (l,) + (0,) * (len(shape) - 1))

    def aph(shape, row0=0):  # per-attention-phase block (clamped in MLP)
        return pl.BlockSpec(
            shape, lambda l, p, s: (
                l, row0 + jnp.minimum(p, n_attn_ph - 1))
            + (0,) * (len(shape) - 2))

    def vph(width):  # per-attention-phase VECTOR rows of (L·phases, 1, w)
        return pl.BlockSpec(
            (1, 1, width), lambda l, p, s: (
                l * n_attn_ph + jnp.minimum(p, n_attn_ph - 1), 0, 0))

    def ocol(shape):  # wo column blocks per attention phase
        return pl.BlockSpec(
            shape, lambda l, p, s: (l, 0, jnp.minimum(p, n_attn_ph - 1)))

    def mrow(shape, row0=0):  # hidden blocks during MLP phases
        return pl.BlockSpec(
            shape, lambda l, p, s: (
                l, row0 + jnp.clip(p - n_attn_ph, 0, n_hb - 1))
            + (0,) * (len(shape) - 2))

    def vmh():  # per-hidden-block VECTOR rows of (L·n_hb, 1, hb)
        return pl.BlockSpec(
            (1, 1, hb), lambda l, p, s: (
                l * n_hb + jnp.clip(p - n_attn_ph, 0, n_hb - 1), 0, 0))

    def mcol(shape):  # down: contraction blocks on the last axis
        return pl.BlockSpec(
            shape, lambda l, p, s: (
                l, 0, jnp.clip(p - n_attn_ph, 0, n_hb - 1)))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((ROWS, d), lambda l, p, s: (0, 0)),      # x
            pl.BlockSpec((1, hd), lambda l, p, s: (0, 0)),        # cos
            pl.BlockSpec((1, hd), lambda l, p, s: (0, 0)),        # sin
            a((1, 1, d)),                                         # ln1
            a((1, 1, d)),                                         # ln2
            pl.BlockSpec((1, d), lambda l, p, s: (0, 0)),         # norm
            aph((1, q_blk, d)),                                   # wq view
            vph(q_blk),                                           # sq
            vph(q_blk),                                           # bq
            aph((1, k_blk, d), row0=k_row0),                      # wk view
            vph(k_blk),                                           # sk
            vph(k_blk),                                           # bk
            aph((1, k_blk, d), row0=v_row0),                      # wv view
            vph(k_blk),                                           # sv
            vph(k_blk),                                           # bv
            a((1, 2, hd)),                                        # qk norms
            ocol((1, d, q_blk)),                                  # wo view
            a((1, 1, d)),                                         # so
            mrow((1, hb, d)),                                     # gate view
            vmh(),                                                # sgate
            mrow((1, hb, d), row0=n_hb),                          # up view
            vmh(),                                                # sup
            mcol((1, d, hb)),                                     # down
            a((1, 1, d)),                                         # sdown
            aph((1, gpp, s_pad, hd)),                             # k cache
            aph((1, gpp, s_pad, hd)),                             # v cache
        ],
        out_specs=[
            pl.BlockSpec((ROWS, d), lambda l, p, s: (0, 0)),
            aph((1, gpp, 1, hd)),                                 # k new
            aph((1, gpp, 1, hd)),                                 # v new
        ],
        scratch_shapes=[
            pltpu.VMEM((ROWS, d), jnp.float32),   # residual stream
            pltpu.VMEM((ROWS, d), jnp.float32),   # pre-attn norm
            pltpu.VMEM((ROWS, d), jnp.float32),   # post-attn norm
            pltpu.VMEM((ROWS, d), jnp.float32),   # o accumulator
            pltpu.VMEM((ROWS, d), jnp.float32),   # mlp accumulator
        ],
    )
    h, k_new, v_new = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((ROWS, d), jnp.float32),
            jax.ShapeDtypeStruct((l_total, kvh, 1, hd), k_cache.dtype),
            jax.ShapeDtypeStruct((l_total, kvh, 1, hd), v_cache.dtype),
        ],
        interpret=interpret,
    )(jnp.stack([jnp.asarray(pos, jnp.int32).reshape(()),
                 jnp.asarray(start, jnp.int32).reshape(())]),
      xp, cos, sin, ln1, ln2, stack["norm"],
      wqkv, sq_v, bq_v, wqkv, sk_v, bk_v, wqkv, sv_v, bv_v, qknorm,
      stack["wo"], so_v,
      gateup, sg_v, gateup, su_v,
      stack["wdown"], sd_v, k_cache, v_cache)
    # one in-place scatter of the fresh slot (donated/carried buffers)
    at = (0, 0, jnp.asarray(pos, jnp.int32), 0)
    k_cache = jax.lax.dynamic_update_slice(k_cache, k_new, at)
    v_cache = jax.lax.dynamic_update_slice(v_cache, v_new, at)
    return h[0:1], k_cache, v_cache


def prepare_stack(params: dict, cfg) -> dict:
    """Stacked layer params (nn/transformer init_params layout, fp fused or
    int8 fused leaves) → the flat array dict the kernel streams.

    Copy-free: every per-phase weight block is a BlockSpec VIEW into these
    arrays (qkv row regions and gate/up halves are contiguous), so this
    runs safely inside traced decode bodies. fp leaves keep their dtype
    and get unit scales; int8 leaves pass codes + per-channel scales."""
    lp = params["layers"]
    attn, mlp = lp["attn"], lp["mlp"]
    if "qkv" not in attn or "gateup" not in mlp:
        raise ValueError("fused qkv/gateup leaves required "
                         "(fuse_fp_tree / fuse_int8_tree)")

    def wsc(leaf, allow_bias=False):
        if "bias" in leaf and not allow_bias:
            raise ValueError("bias only supported on the qkv projection")
        if "weight_i8" in leaf:
            w = leaf["weight_i8"]
            s = leaf["scale_i8"].reshape(w.shape[:-1]).astype(jnp.float32)
        else:
            w = leaf["weight"]
            s = jnp.ones(w.shape[:-1], jnp.float32)
        return w, s

    wqkv, sqkv = wsc(attn["qkv"], allow_bias=True)
    wo, so = wsc(attn["o"])
    wgu, sgu = wsc(mlp["gateup"])
    wd, sd = wsc(mlp["down"])
    hidden = wgu.shape[1] // 2
    d = wqkv.shape[-1]
    out = {
        "wqkv": wqkv, "sqkv": sqkv,
        "wo": wo, "so": so,
        "wgateup": wgu, "sgate": sgu[:, :hidden], "sup": sgu[:, hidden:],
        "wdown": wd, "sdown": sd,
        "ln1": lp["ln1"]["weight"].astype(jnp.float32),
        "ln2": lp["ln2"]["weight"].astype(jnp.float32),
        "norm": params["norm"]["weight"].astype(jnp.float32).reshape(1, d),
    }
    if "bias" in attn["qkv"]:  # Qwen2-style qkv bias
        out["bqkv"] = attn["qkv"]["bias"].astype(jnp.float32)
    if "q_norm" in attn:  # Qwen3 per-head q/k rms (shared (hd,) weights)
        out["qknorm"] = jnp.stack(
            [attn["q_norm"]["weight"], attn["k_norm"]["weight"]],
            axis=1).astype(jnp.float32)
    return out


def make_cos_sin(pos, inv_freq, hd: int):
    """Half-split duplicated cos/sin row for `pos` (matches rope.apply_rope:
    ang = pos*inv_freq, concat([ang, ang]))."""
    ang = jnp.asarray(pos, jnp.float32) * jnp.asarray(inv_freq, jnp.float32)
    ang = jnp.concatenate([ang, ang]).reshape(1, hd)
    return jnp.cos(ang), jnp.sin(ang)


_PROBE_MEMO: dict = {}


def probe_compile(cfg, params: dict, max_len: int = 512,
                  cache_dtype=jnp.bfloat16, act_dtype=None) -> bool:
    """Compile-and-run the kernel once at this stack's REAL shapes — incl.
    the caller's cache length/dtype and ACTIVATION dtype (the kernel
    specializes on compute_dtype = x.dtype) — before callers commit their
    decode graphs to it: Mosaic compiles per backend, and a lowering
    failure inside a jitted decode loop would otherwise surface
    mid-generation with no fallback. act_dtype defaults to the stack's fp
    leaf dtype (= the embedding/hidden dtype in practice). Memoized per
    (config, weight signature, cache signature, activation dtype)."""
    lp = params["layers"]
    w = lp["attn"]["qkv"].get("weight_i8", lp["attn"]["qkv"].get("weight"))
    if isinstance(w, jax.core.Tracer):
        # called under trace (gates must resolve at closure-build time);
        # refuse without poisoning the memo
        return False
    cache_dtype = jnp.dtype(cache_dtype)
    act_dtype = jnp.dtype(act_dtype if act_dtype is not None
                          else lp["ln1"]["weight"].dtype)
    # repr(cfg): TransformerConfig is a dataclass whose rope_scaling field
    # is a dict (Llama-3.2) — unhashable, so the config itself can't key
    # the memo
    sig = (repr(cfg), w.shape, str(w.dtype), max_len, cache_dtype.name,
           act_dtype.name)
    if sig in _PROBE_MEMO:
        return _PROBE_MEMO[sig]
    if choose_mode(cfg, params, max_len=max_len,
                   cache_dtype=cache_dtype) is None:
        _PROBE_MEMO[sig] = False
        return False
    try:
        import numpy as _np

        from tpu_audio.ops.pallas.probe import run_outside_trace

        # grouped left to the wrapper: it derives the layout from these
        # same shapes, so the probe compiles the variant that will run.
        # The body runs in a fresh thread outside any ambient trace
        # (ops/pallas/probe.py) so a caller can gate on it while tracing.
        def _run():
            stack = prepare_stack(params, cfg)
            kc = jnp.zeros((cfg.n_layers, cfg.kv_heads, max_len, cfg.hd),
                           cache_dtype)
            cos = jnp.ones((1, cfg.hd), jnp.float32)
            h, _, _ = fused_decode_step(
                jnp.zeros((1, cfg.dim), act_dtype), 0, cos, cos * 0,
                stack, kc, kc,
                n_heads=cfg.n_heads, n_kv_heads=cfg.kv_heads,
                hd=cfg.hd, eps=cfg.norm_eps)
            return _np.asarray(h)

        ok = bool(_np.isfinite(run_outside_trace(_run)).all())
    except Exception as exc:
        from tpu_audio.ops.quant import _warn_kernel_fallback

        _warn_kernel_fallback(exc)
        ok = False
    _PROBE_MEMO[sig] = ok
    return ok


def choose_mode(cfg, params: dict, batch: int = 1, max_len: int = 512,
                cache_dtype=jnp.bfloat16) -> str | None:
    """Kernel applicability + layout choice for a TransformerConfig and
    stacked params: "plain" (one attention phase — small models),
    "grouped" (per-kv-group attention phases — large models whose qkv/o
    blocks would blow the ~16 MB VMEM budget), or None. The estimates are
    coarse sanity bounds — probe_compile is the ground truth (Mosaic
    raises on a real VMEM overflow and the caller falls back)."""
    try:
        if jax.default_backend() not in ("tpu", "axon"):
            return None
    except Exception:
        return None
    lp = params.get("layers", {})
    if "qkv" not in lp.get("attn", {}) or "gateup" not in lp.get("mlp", {}):
        return None
    if ("bias" in lp["attn"].get("o", {}) or "bias" in lp["mlp"]["gateup"]
            or "bias" in lp["mlp"]["down"]):
        return None
    if not (batch == 1 and cfg.norm == "rms" and cfg.mlp == "swiglu"
            and cfg.pos_emb == "rope"
            and cfg.hd in (64, 128) and cfg.dim % 128 == 0
            and cfg.hidden_dim % 8 == 0):
        return None
    w = lp["attn"]["qkv"].get("weight_i8", lp["attn"]["qkv"].get("weight"))
    if w is None:
        return None
    return _mode_from_shapes(cfg.dim, cfg.n_heads, cfg.kv_heads, cfg.hd,
                             cfg.hidden_dim, w.dtype.itemsize, max_len,
                             jnp.dtype(cache_dtype).itemsize)


def _mode_from_shapes(d: int, h_: int, kvh: int, hd: int, hidden: int,
                      item: int, s_pad: int, cache_item: int) -> str | None:
    """Layout choice from concrete shapes — shared by choose_mode (gate
    time) and fused_decode_step (run time), so the probed variant IS the
    running variant."""
    qo = (h_ + 2 * kvh) * hd
    # double-buffered attention-phase blocks of the single-phase layout:
    # full qkv + wo + all kv-group cache blocks
    cache_all = kvh * s_pad * hd * cache_item
    hb_p = _pick_hb(hidden, 512)
    plain_bytes = ((qo * d + d * h_ * hd) * item + 2 * cache_all
                   + 3 * hb_p * d * item) * 2
    if plain_bytes <= 12 * 2 ** 20:
        return "plain"
    # grouped layout: per-phase blocks are one kv group's qkv row views +
    # its wo column block + its cache blocks (+ hidden blocks)
    g = h_ // kvh
    cache_one = s_pad * hd * cache_item
    hb = _grouped_hb(d, hidden)
    grouped_bytes = (((g + 2) * hd * d + d * g * hd + 3 * hb * d) * item
                     + 2 * cache_one) * 2.5
    if grouped_bytes <= 14 * 2 ** 20:
        return "grouped"
    return None


def supported(cfg, params: dict, batch: int, max_len: int = 512,
              cache_dtype=jnp.bfloat16) -> bool:
    return choose_mode(cfg, params, batch, max_len, cache_dtype) is not None
