"""Fused single-token transformer decode step: the WHOLE layer stack in one
Pallas kernel launch.

Why: latency-bound tiny-model decode loops (the Marvis depth decoder runs
4 layers × 31 sequential codebook steps per 12.5 Hz frame — reference
package/TTS/Marvis/Models/MarvisModel.swift:365-587) spend their time on
per-op dispatch, not on math or bytes: one XLA decode step of the 4-layer
stack issues ~90 small ops (norms, matvecs, rope, cache updates, attention
pieces), each microseconds of fixed cost on the sequential TPU pipeline.
This kernel collapses the entire stack to ONE launch per token: grid
(layers, 1 + hidden_blocks), residual stream carried in VMEM scratch
across grid steps, weights streamed layer-by-layer from HBM with Pallas'
double-buffered pipeline (the weight stream — the true lower bound of
small-batch decode — overlaps the compute of the previous block).

Semantics match nn/transformer.forward_hidden for the supported subset:
rms-norm, no-bias fused qkv, half-split RoPE (cos/sin computed outside at
the step position), GQA attention over a (KVH, S_pad, hd) cache, swiglu
MLP, final stack norm. Weights are either fp (bf16/f32) or per-channel
int8 (ops/quant.quantize_array_int8): int8 codes are cast raw to the
compute dtype inside the kernel and the per-output-channel scale is
applied to the dot OUTPUT — activations stay exact (higher fidelity than
the W8A8 XLA fallback's int8 activations) at the same 1 byte/weight HBM
stream.

Batch handling: the kernel is built for the B=1 latency case; the row axis
is padded to 8 sublanes and only row 0 carries data (pad rows are zeros
through every op: rms(0)=0, dot(0)=0).
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
            wqkv_ref, sqkv_ref, bqkv_ref, qknorm_ref, wo_ref, so_ref,
            wg_ref, sg_ref, wu_ref, su_ref, wd_ref, sd_ref,
            kin_ref, vin_ref,
            hout_ref, kout_ref, vout_ref,
            x_s, hn2_s, acc_s, *,
            n_heads, n_kv_heads, hd, eps, hb, l_total, compute_dtype,
            qkv_bias, qk_norm):
    lyr = pl.program_id(0)
    ph = pl.program_id(1)
    n_ph = pl.num_programs(1)
    pos = pos_ref[0]
    start = pos_ref[1]  # first valid key slot (left-padded prompts)
    cd = compute_dtype

    @pl.when((lyr == 0) & (ph == 0))
    def _init():
        x_s[...] = x_ref[...].astype(jnp.float32)

    @pl.when(ph == 0)
    def _attn():
        x = x_s[...]                                        # (ROWS, D) f32
        hn = _rms(x, ln1_ref[0].astype(jnp.float32), eps)
        qkv = jax.lax.dot_general(
            hn.astype(cd), wqkv_ref[0].astype(cd),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)             # (ROWS, QO)
        qkv = qkv * sqkv_ref[0][None, :]
        if qkv_bias:
            qkv = qkv + bqkv_ref[0][None, :]

        cos = cos_ref[0].astype(jnp.float32)                # (hd,)
        sin = sin_ref[0].astype(jnp.float32)
        half = hd // 2

        def rot(vec, which=0):                              # (rows, hd) f32
            if qk_norm:  # Qwen3: per-head rms before rope; qknorm (1,2,hd)
                # holds the layer's q_norm (row 0) / k_norm (row 1) weights
                vec = _rms(vec, qknorm_ref[0, which].astype(jnp.float32),
                           eps)
            r = jnp.concatenate([-vec[:, half:], vec[:, :half]], axis=1)
            return vec * cos[None, :] + r * sin[None, :]

        group = n_heads // n_kv_heads
        scale = hd ** -0.5
        k_off = n_heads * hd
        v_off = (n_heads + n_kv_heads) * hd

        # cache write (row 0 only) via ref stores at the dynamic slot —
        # the documented Mosaic idiom; attention reads back through the
        # cache dtype exactly like the XLA path's buffer round-trip
        kout_ref[...] = kin_ref[...]
        vout_ref[...] = vin_ref[...]
        outs = []
        for g in range(n_kv_heads):
            kg_new = rot(qkv[0:1, k_off + g * hd:k_off + (g + 1) * hd],
                         which=1)
            vg_new = qkv[0:1, v_off + g * hd:v_off + (g + 1) * hd]
            kout_ref[0, g, pl.ds(pos, 1), :] = kg_new.astype(kout_ref.dtype)
            vout_ref[0, g, pl.ds(pos, 1), :] = vg_new.astype(vout_ref.dtype)
            kbuf = kout_ref[0, g].astype(jnp.float32)       # (S_pad, hd)
            vbuf = vout_ref[0, g].astype(jnp.float32)
            qg = jnp.concatenate(
                [rot(qkv[0:1, h * hd:(h + 1) * hd])
                 for h in range(g * group, (g + 1) * group)], axis=0)
            scores = jax.lax.dot_general(
                qg * scale, kbuf, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)         # (group, S_pad)
            spos = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
            scores = jnp.where((spos >= start) & (spos <= pos),
                               scores, -1e30)
            m = jnp.max(scores, axis=1, keepdims=True)
            e = jnp.exp(scores - m)
            p = e / jnp.sum(e, axis=1, keepdims=True)
            og = jax.lax.dot_general(
                p.astype(cd), vbuf.astype(cd), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)         # (group, hd)
            outs.extend(og[j:j + 1] for j in range(group))
        attn_row = jnp.concatenate(outs, axis=1)            # (1, H*hd)
        o = jax.lax.dot_general(
            attn_row.astype(cd), wo_ref[0].astype(cd),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)             # (1, D)
        o = o * so_ref[0][None, :]
        x_s[0:1, :] = x[0:1] + o
        x = x_s[...]
        hn2_s[...] = _rms(x, ln2_ref[0].astype(jnp.float32), eps)
        acc_s[...] = jnp.zeros_like(acc_s)

    @pl.when(ph > 0)
    def _mlp():
        hn2 = hn2_s[...].astype(cd)                         # (ROWS, D)
        g = jax.lax.dot_general(
            hn2, wg_ref[0].astype(cd), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * sg_ref[0][None, :]
        u = jax.lax.dot_general(
            hn2, wu_ref[0].astype(cd), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * su_ref[0][None, :]
        act = (g * jax.lax.logistic(g)) * u                 # silu(g) * u
        acc_s[...] += jax.lax.dot_general(
            act.astype(cd), wd_ref[0].astype(cd), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)             # (ROWS, D)

        @pl.when(ph == n_ph - 1)
        def _layer_end():
            x = x_s[...] + acc_s[...] * sd_ref[0][None, :]
            x_s[...] = x

            @pl.when(lyr == l_total - 1)
            def _emit():
                hout_ref[...] = _rms(
                    x, normw_ref[0].astype(jnp.float32), eps)


def _kernel_grouped(pos_ref, x_ref, cos_ref, sin_ref, ln1_ref, ln2_ref,
                    normw_ref, wqkv_ref, sqkv_ref, bqkv_ref, qknorm_ref,
                    wo_ref, so_ref, wg_ref, sg_ref, wu_ref, su_ref,
                    wd_ref, sd_ref, kin_ref, vin_ref,
                    hout_ref, kout_ref, vout_ref,
                    x_s, hn1_s, hn2_s, oacc_s, acc_s, *,
                    n_heads, n_kv_heads, hd, eps, hb, l_total,
                    compute_dtype, qkv_bias, qk_norm):
    """Large-model variant: the attention phase splits per kv-head group
    so no single weight block exceeds the VMEM budget. qkv rows arrive
    group-major (prepare_stack(grouped=True)): per group g the block is
    [q rows of its G heads | k rows | v rows] = (G+2)*hd rows; wo arrives
    column-grouped (L, KVH, D, G*hd) and o accumulates across phases
    (per-output-channel scales factor out of the partial sums exactly)."""
    lyr = pl.program_id(0)
    ph = pl.program_id(1)
    n_ph = pl.num_programs(1)
    pos = pos_ref[0]
    start = pos_ref[1]
    cd = compute_dtype
    group = n_heads // n_kv_heads

    @pl.when((lyr == 0) & (ph == 0))
    def _init():
        x_s[...] = x_ref[...].astype(jnp.float32)

    @pl.when(ph == 0)
    def _layer_start():
        hn1_s[...] = _rms(x_s[...], ln1_ref[0].astype(jnp.float32), eps)
        oacc_s[...] = jnp.zeros_like(oacc_s)

    @pl.when(ph < n_kv_heads)
    def _attn_group():
        hn = hn1_s[...].astype(cd)                          # (ROWS, D)
        qkv = jax.lax.dot_general(
            hn, wqkv_ref[0, 0].astype(cd), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)             # (ROWS, R)
        qkv = qkv * sqkv_ref[0, 0][None, :]
        if qkv_bias:
            qkv = qkv + bqkv_ref[0, 0][None, :]

        cos = cos_ref[0].astype(jnp.float32)
        sin = sin_ref[0].astype(jnp.float32)
        half = hd // 2

        def rot(vec, which=0):
            if qk_norm:
                vec = _rms(vec, qknorm_ref[0, which].astype(jnp.float32),
                           eps)
            r = jnp.concatenate([-vec[:, half:], vec[:, :half]], axis=1)
            return vec * cos[None, :] + r * sin[None, :]

        k_off = group * hd
        v_off = (group + 1) * hd
        kg_new = rot(qkv[0:1, k_off:k_off + hd], which=1)
        vg_new = qkv[0:1, v_off:v_off + hd]
        kout_ref[...] = kin_ref[...]
        vout_ref[...] = vin_ref[...]
        kout_ref[0, 0, pl.ds(pos, 1), :] = kg_new.astype(kout_ref.dtype)
        vout_ref[0, 0, pl.ds(pos, 1), :] = vg_new.astype(vout_ref.dtype)
        kbuf = kout_ref[0, 0].astype(jnp.float32)
        vbuf = vout_ref[0, 0].astype(jnp.float32)

        qg = jnp.concatenate(
            [rot(qkv[0:1, h * hd:(h + 1) * hd]) for h in range(group)],
            axis=0)                                         # (G, hd)
        scores = jax.lax.dot_general(
            qg * (hd ** -0.5), kbuf, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)             # (G, S_pad)
        spos = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        scores = jnp.where((spos >= start) & (spos <= pos), scores, -1e30)
        m = jnp.max(scores, axis=1, keepdims=True)
        e = jnp.exp(scores - m)
        p = e / jnp.sum(e, axis=1, keepdims=True)
        og = jax.lax.dot_general(
            p.astype(cd), vbuf.astype(cd), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)             # (G, hd)
        flat = jnp.concatenate([og[j:j + 1] for j in range(group)],
                               axis=1)                      # (1, G*hd)
        part = jax.lax.dot_general(
            flat.astype(cd), wo_ref[0, 0].astype(cd),
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)             # (1, D)
        oacc_s[0:1] += part

        @pl.when(ph == n_kv_heads - 1)
        def _attn_done():
            o = oacc_s[0:1] * so_ref[0][None, :]
            x_s[0:1, :] = x_s[0:1, :] + o
            x = x_s[...]
            hn2_s[...] = _rms(x, ln2_ref[0].astype(jnp.float32), eps)
            acc_s[...] = jnp.zeros_like(acc_s)

    @pl.when(ph >= n_kv_heads)
    def _mlp():
        hn2 = hn2_s[...].astype(cd)
        g = jax.lax.dot_general(
            hn2, wg_ref[0].astype(cd), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * sg_ref[0][None, :]
        u = jax.lax.dot_general(
            hn2, wu_ref[0].astype(cd), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * su_ref[0][None, :]
        act = (g * jax.lax.logistic(g)) * u
        acc_s[...] += jax.lax.dot_general(
            act.astype(cd), wd_ref[0].astype(cd), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)

        @pl.when(ph == n_ph - 1)
        def _layer_end():
            x = x_s[...] + acc_s[...] * sd_ref[0][None, :]
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
                              "hidden_block", "interpret"))
def fused_decode_step(x, pos, cos, sin, stack, k_cache, v_cache, *,
                      start=0,
                      n_heads: int, n_kv_heads: int, hd: int,
                      eps: float = 1e-5, hidden_block: int = 512,
                      interpret: bool = False):
    """One token through the whole stacked layer set, one kernel launch.

    x (1, D) float; pos () int32 cache position (rope position == cache
    position; callers with offsets fold them into cos/sin); cos/sin (1, hd)
    f32 for this position (half-split duplicated layout, see
    nn/rope.apply_rope); stack: prepare_stack() output; k/v_cache
    (L, KVH, S_pad, hd) in x.dtype; start () int32 first valid key slot
    (left-padded prompt masking — slots < start never attend). Returns
    (h (1, D) f32 after the final stack norm, new k_cache, new v_cache).
    """
    if "wqkv_g" in stack:
        return _fused_step_grouped(
            x, pos, cos, sin, stack, k_cache, v_cache, start=start,
            n_heads=n_heads, n_kv_heads=n_kv_heads, hd=hd, eps=eps,
            hidden_block=hidden_block, interpret=interpret)
    l_total, qo, d = stack["wqkv"].shape[:3]
    hidden = stack["wgateup"].shape[1] // 2  # gate rows then up rows
    hb = _pick_hb(hidden, hidden_block)
    n_hb = hidden // hb
    cd = x.dtype

    xp = jnp.zeros((ROWS, d), cd).at[0:1].set(x.astype(cd))
    s_pad = k_cache.shape[2]

    grid = (l_total, 1 + n_hb)
    kernel = functools.partial(
        _kernel, n_heads=n_heads, n_kv_heads=n_kv_heads, hd=hd, eps=eps,
        hb=hb, l_total=l_total, compute_dtype=cd,
        qkv_bias="bqkv" in stack, qk_norm="qknorm" in stack)
    bqkv = stack.get("bqkv")
    if bqkv is None:
        bqkv = jnp.zeros((l_total, qo), jnp.float32)
    qknorm = stack.get("qknorm")
    if qknorm is None:
        qknorm = jnp.ones((l_total, 2, hd), jnp.float32)

    gateup = stack["wgateup"]
    up_row0 = hidden // hb  # up rows start at block index n_hb

    def attn_blk(shape):
        return pl.BlockSpec(shape, lambda l, p, s: (l,) + (0,) * (len(shape) - 1))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((ROWS, d), lambda l, p, s: (0, 0)),      # x
            pl.BlockSpec((1, hd), lambda l, p, s: (0, 0)),        # cos
            pl.BlockSpec((1, hd), lambda l, p, s: (0, 0)),        # sin
            attn_blk((1, d)),                                     # ln1
            attn_blk((1, d)),                                     # ln2
            pl.BlockSpec((1, d), lambda l, p, s: (0, 0)),         # norm
            attn_blk((1, qo, d)),                                 # wqkv
            attn_blk((1, qo)),                                    # sqkv
            attn_blk((1, qo)),                                    # bqkv
            attn_blk((1, 2, hd)),                                 # qk norms
            attn_blk((1, d, n_heads * hd)),                       # wo
            attn_blk((1, d)),                                     # so
            pl.BlockSpec(                                         # gate view
                (1, hb, d),
                lambda l, p, s: (l, jnp.maximum(p - 1, 0), 0)),
            pl.BlockSpec((1, hb),
                         lambda l, p, s: (l, jnp.maximum(p - 1, 0))),
            pl.BlockSpec(                                         # up view
                (1, hb, d),
                lambda l, p, s: (l, up_row0 + jnp.maximum(p - 1, 0), 0)),
            pl.BlockSpec((1, hb),
                         lambda l, p, s: (l, up_row0 + jnp.maximum(p - 1, 0))),
            pl.BlockSpec(                                         # down
                (1, d, hb),
                lambda l, p, s: (l, 0, jnp.maximum(p - 1, 0))),
            attn_blk((1, d)),                                     # sdown
            attn_blk((1, n_kv_heads, s_pad, hd)),                 # k cache
            attn_blk((1, n_kv_heads, s_pad, hd)),                 # v cache
        ],
        out_specs=[
            pl.BlockSpec((ROWS, d), lambda l, p, s: (0, 0)),
            attn_blk((1, n_kv_heads, s_pad, hd)),
            attn_blk((1, n_kv_heads, s_pad, hd)),
        ],
        scratch_shapes=[
            pltpu.VMEM((ROWS, d), jnp.float32),   # residual stream
            pltpu.VMEM((ROWS, d), jnp.float32),   # post-attn norm
            pltpu.VMEM((ROWS, d), jnp.float32),   # mlp accumulator
        ],
    )
    h, kc, vc = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((ROWS, d), jnp.float32),
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
        ],
        interpret=interpret,
    )(jnp.stack([jnp.asarray(pos, jnp.int32).reshape(()),
                 jnp.asarray(start, jnp.int32).reshape(())]),
      xp, cos, sin, stack["ln1"], stack["ln2"], stack["norm"],
      stack["wqkv"], stack["sqkv"], bqkv, qknorm,
      stack["wo"], stack["so"],
      gateup, stack["sgate"], gateup, stack["sup"],
      stack["wdown"], stack["sdown"], k_cache, v_cache)
    return h[0:1], kc, vc


def _fused_step_grouped(x, pos, cos, sin, stack, k_cache, v_cache, *,
                        start, n_heads, n_kv_heads, hd, eps, hidden_block,
                        interpret):
    del hidden_block  # the grouped layout uses the shared dim policy
    l_total, kvh, r, d = stack["wqkv_g"].shape
    hidden = stack["wgateup"].shape[1] // 2
    hb = _grouped_hb(d, hidden)
    n_hb = hidden // hb
    cd = x.dtype
    xp = jnp.zeros((ROWS, d), cd).at[0:1].set(x.astype(cd))
    s_pad = k_cache.shape[2]
    gdim = (n_heads // n_kv_heads) * hd

    grid = (l_total, n_kv_heads + n_hb)
    kernel = functools.partial(
        _kernel_grouped, n_heads=n_heads, n_kv_heads=n_kv_heads, hd=hd,
        eps=eps, hb=hb, l_total=l_total, compute_dtype=cd,
        qkv_bias="bqkv_g" in stack, qk_norm="qknorm" in stack)
    bqkv = stack.get("bqkv_g")
    if bqkv is None:
        bqkv = jnp.zeros((l_total, kvh, r), jnp.float32)
    qknorm = stack.get("qknorm")
    if qknorm is None:
        qknorm = jnp.ones((l_total, 2, hd), jnp.float32)

    def attn_blk(shape):
        return pl.BlockSpec(shape,
                            lambda l, p, s: (l,) + (0,) * (len(shape) - 1))

    def grp(shape):  # per-kv-group blocks, clamped during MLP phases
        return pl.BlockSpec(
            shape, lambda l, p, s: (l, jnp.minimum(p, n_kv_heads - 1))
            + (0,) * (len(shape) - 2))

    def mlp_blk(shape, row0=0):
        return pl.BlockSpec(
            shape, lambda l, p, s: (
                l, row0 + jnp.clip(p - n_kv_heads, 0, n_hb - 1))
            + (0,) * (len(shape) - 2))

    def mlp_col(shape):  # down: contraction blocks on the last axis
        return pl.BlockSpec(
            shape, lambda l, p, s: (
                l, 0, jnp.clip(p - n_kv_heads, 0, n_hb - 1)))

    gateup = stack["wgateup"]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((ROWS, d), lambda l, p, s: (0, 0)),      # x
            pl.BlockSpec((1, hd), lambda l, p, s: (0, 0)),        # cos
            pl.BlockSpec((1, hd), lambda l, p, s: (0, 0)),        # sin
            attn_blk((1, d)),                                     # ln1
            attn_blk((1, d)),                                     # ln2
            pl.BlockSpec((1, d), lambda l, p, s: (0, 0)),         # norm
            grp((1, 1, r, d)),                                    # wqkv_g
            grp((1, 1, r)),                                       # sqkv_g
            grp((1, 1, r)),                                       # bqkv_g
            attn_blk((1, 2, hd)),                                 # qk norms
            grp((1, 1, d, gdim)),                                 # wo_g
            attn_blk((1, d)),                                     # so
            mlp_blk((1, hb, d)),                                  # gate view
            mlp_blk((1, hb)),                                     # sgate
            mlp_blk((1, hb, d), row0=n_hb),                       # up view
            mlp_blk((1, hb), row0=n_hb),                          # sup
            mlp_col((1, d, hb)),                                  # down
            attn_blk((1, d)),                                     # sdown
            grp((1, 1, s_pad, hd)),                               # k cache
            grp((1, 1, s_pad, hd)),                               # v cache
        ],
        out_specs=[
            pl.BlockSpec((ROWS, d), lambda l, p, s: (0, 0)),
            grp((1, 1, s_pad, hd)),
            grp((1, 1, s_pad, hd)),
        ],
        scratch_shapes=[
            pltpu.VMEM((ROWS, d), jnp.float32),   # residual stream
            pltpu.VMEM((ROWS, d), jnp.float32),   # pre-attn norm
            pltpu.VMEM((ROWS, d), jnp.float32),   # post-attn norm
            pltpu.VMEM((ROWS, d), jnp.float32),   # o accumulator
            pltpu.VMEM((ROWS, d), jnp.float32),   # mlp accumulator
        ],
    )
    h, kc, vc = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((ROWS, d), jnp.float32),
            jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
            jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
        ],
        interpret=interpret,
    )(jnp.stack([jnp.asarray(pos, jnp.int32).reshape(()),
                 jnp.asarray(start, jnp.int32).reshape(())]),
      xp, cos, sin, stack["ln1"], stack["ln2"], stack["norm"],
      stack["wqkv_g"], stack["sqkv_g"], bqkv, qknorm,
      stack["wo_g"], stack["so"],
      gateup, stack["sgate"], gateup, stack["sup"],
      stack["wdown"], stack["sdown"], k_cache, v_cache)
    return h[0:1], kc, vc


def prepare_stack(params: dict, cfg, grouped: bool = False) -> dict:
    """Stacked layer params (nn/transformer init_params layout, fp fused or
    int8 fused leaves) → the flat array dict the kernel streams.

    fp leaves keep their dtype and get unit scales; int8 leaves pass codes +
    per-channel scales. gate/up ride as ONE (L, 2*hidden, D) array consumed
    through two BlockSpec views (gate rows first — ops/quant.fuse_int8_tree
    and nn/transformer.fuse_fp_tree both concat gate before up).

    grouped=True reorders qkv rows kv-group-major ([q heads of group |
    its k | its v] per group) and splits wo into per-group column blocks —
    the large-model layout whose attention phase streams one group at a
    time (per-channel scales/biases reorder with their rows exactly)."""
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

    if grouped:
        h, kvh, hd = cfg.n_heads, cfg.kv_heads, cfg.hd
        g = h // kvh
        l = wqkv.shape[0]

        def regroup_rows(a):  # (L, QO, ...) -> (L, KVH, (G+2)*hd, ...)
            tail = a.shape[2:]
            q = a[:, :h * hd].reshape((l, kvh, g * hd) + tail)
            k = a[:, h * hd:(h + kvh) * hd].reshape((l, kvh, hd) + tail)
            v = a[:, (h + kvh) * hd:].reshape((l, kvh, hd) + tail)
            return jnp.concatenate([q, k, v], axis=2)

        out["wqkv_g"] = regroup_rows(out.pop("wqkv"))
        out["sqkv_g"] = regroup_rows(out.pop("sqkv"))
        if "bqkv" in out:
            out["bqkv_g"] = regroup_rows(out.pop("bqkv"))
        # wo columns split per group: (L, D, H*hd) -> (L, KVH, D, G*hd)
        wo = out.pop("wo")
        d = wo.shape[1]
        out["wo_g"] = jnp.moveaxis(
            wo.reshape(l, d, kvh, g * hd), 2, 1)
    return out


def make_cos_sin(pos, inv_freq, hd: int):
    """Half-split duplicated cos/sin row for `pos` (matches rope.apply_rope:
    ang = pos*inv_freq, concat([ang, ang]))."""
    ang = jnp.asarray(pos, jnp.float32) * jnp.asarray(inv_freq, jnp.float32)
    ang = jnp.concatenate([ang, ang]).reshape(1, hd)
    return jnp.cos(ang), jnp.sin(ang)


_PROBE_MEMO: dict = {}


def probe_compile(cfg, params: dict) -> bool:
    """Compile-and-run the kernel once at this stack's real layer shapes
    before callers commit their decode graphs to it: Mosaic compiles per
    backend, and a lowering failure inside a jitted decode loop would
    otherwise surface mid-generation with no fallback. Memoized per
    (config, weight shape/dtype) signature."""
    lp = params["layers"]
    w = lp["attn"]["qkv"].get("weight_i8", lp["attn"]["qkv"].get("weight"))
    if isinstance(w, jax.core.Tracer):
        # called under trace (gates must resolve at closure-build time);
        # refuse without poisoning the memo
        return False
    sig = (cfg, w.shape, str(w.dtype))
    if sig in _PROBE_MEMO:
        return _PROBE_MEMO[sig]
    try:
        stack = prepare_stack(params, cfg,
                              grouped=choose_mode(cfg, params) == "grouped")
        kc = jnp.zeros((cfg.n_layers, cfg.kv_heads, 8, cfg.hd), jnp.float32)
        cos = jnp.ones((1, cfg.hd), jnp.float32)
        h, _, _ = fused_decode_step(
            jnp.zeros((1, cfg.dim), jnp.float32), 0, cos, cos * 0,
            stack, kc, kc, n_heads=cfg.n_heads, n_kv_heads=cfg.kv_heads,
            hd=cfg.hd, eps=cfg.norm_eps)
        import numpy as _np

        ok = bool(_np.isfinite(_np.asarray(h)).all())
    except Exception as exc:
        from tpu_audio.ops.quant import _warn_kernel_fallback

        _warn_kernel_fallback(exc)
        ok = False
    _PROBE_MEMO[sig] = ok
    return ok


def choose_mode(cfg, params: dict, batch: int = 1) -> str | None:
    """Kernel applicability + layout choice for a TransformerConfig and
    stacked params: "plain" (one attention phase — small models),
    "grouped" (per-kv-group attention phases — large models whose qkv/o
    blocks would blow the ~16 MB VMEM budget), or None."""
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
    item = w.dtype.itemsize
    qo = w.shape[1]
    d, h_, kvh, hd = cfg.dim, cfg.n_heads, cfg.kv_heads, cfg.hd
    # double-buffered attention blocks of the single-phase layout
    attn_bytes = (qo * d + d * h_ * hd) * item * 2
    if attn_bytes <= 10 * 2 ** 20:
        return "plain"
    # grouped layout: per-phase blocks are one kv group's qkv rows + its
    # wo column block (+ hidden blocks). This is a coarse sanity bound —
    # probe_compile is the ground truth (Mosaic raises on a real VMEM
    # overflow and the caller falls back to the plain path).
    g = h_ // kvh
    r = (g + 2) * hd
    hb = _grouped_hb(d, cfg.hidden_dim)
    grouped_bytes = (r * d + d * g * hd + 3 * hb * d) * item * 2.5
    if grouped_bytes <= 14 * 2 ** 20:
        return "grouped"
    return None


def supported(cfg, params: dict, batch: int) -> bool:
    return choose_mode(cfg, params, batch) is not None
