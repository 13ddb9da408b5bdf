"""Per-component profile of the Whisper large-v3-turbo encoder at batch 16,
with a transfer-proof timing harness.

Harness (calibrated by benchmarks/gemm_ceiling.py on this chip): the axon
tunnel eagerly transfers every dispatch output to the host at ~115 MB/s, so
any host-loop timing of a function returning a (16,1500,1280) tensor measures
~530 ms of transfer per run, not compute — this is exactly how the encoder
was misread as 25% MFU (it is not; the raw GEMM chain runs at 186 TFLOP/s =
94% MFU in-graph). Here every component is repeated INSIDE one jitted
lax.fori_loop with a data dependency between reps, the output is reduced to
one scalar, and per-rep cost is the slope (t(r2)-t(r1))/(r2-r1) over distinct
inputs (the runtime memoizes identical dispatches).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from tpu_audio.models.whisper import model as wmodel
from tpu_audio.models.whisper.config import PRESETS
from tpu_audio.nn import attention, layers

R1, R2 = 1, 6


def slope_time(label, fn, p, x0, r1=R1, r2=R2):
    """fn: (p, x, reps)->scalar with static reps. Returns seconds per rep.

    p MUST be passed as an argument (not closed over): closed-over arrays
    become jaxpr constants and the tunnel's remote_compile POSTs them —
    a weight tree in the closure is an HTTP 413 / multi-GB upload.
    """
    t0 = time.perf_counter()
    _ = float(fn(p, x0, r1))  # compile r1
    _ = float(fn(p, x0, r2))  # compile r2
    print(f"  [{label}] compiled in {time.perf_counter() - t0:.0f}s",
          flush=True)
    t0 = time.perf_counter()
    _ = float(fn(p, x0 + 7e-6, r1))
    ta = time.perf_counter() - t0
    t0 = time.perf_counter()
    _ = float(fn(p, x0 + 9e-6, r2))
    tb = time.perf_counter() - t0
    return (tb - ta) / (r2 - r1)


def make_loop(fn):
    import functools

    @functools.partial(jax.jit, static_argnums=2)
    def run(p, x0, reps):
        def body(i, x):
            y = fn(p, x)
            dep = (jnp.mean(y.astype(jnp.float32)) * 1e-20).astype(x.dtype)
            return x + dep
        x = jax.lax.fori_loop(0, reps, body, x0)
        return jnp.mean(x.astype(jnp.float32))
    return run


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    args = ap.parse_args()

    cfg = PRESETS["large-v3-turbo"]
    b, t, d, h, lyr = (args.batch, cfg.n_audio_ctx, cfg.n_audio_state,
                       cfg.n_audio_head, cfg.n_audio_layer)
    params = wmodel.init_params(jax.random.PRNGKey(0), cfg,
                                dtype=jnp.bfloat16)
    enc = params["encoder"]
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((b, 2 * t, cfg.n_mels)),
                      jnp.bfloat16)
    x0 = jnp.asarray(rng.standard_normal((b, t, d)) * 0.02, jnp.bfloat16)

    mlp_dim = 4 * d
    flops_layer = (2 * t * d * d * 4
                   + 2 * 2 * t * t * d
                   + 2 * 2 * t * d * mlp_dim)
    conv_flops = 2 * b * (2 * t * 3 * cfg.n_mels * d + t * 3 * d * d)
    enc_flops = b * lyr * flops_layer + conv_flops

    def report(label, dt, flops=None):
        tf = f" = {flops / dt / 1e12:5.1f} TFLOP/s" if flops else ""
        print(f"{label:34s}: {dt * 1e3:7.1f} ms{tf}", flush=True)

    # tunnel health canary: a tiny matmul, e2e (degraded phases run this
    # 100x slower — see memory/tpu-tunnel-measurement-gotchas)
    a = jnp.asarray(rng.standard_normal((1024, 1024)), jnp.bfloat16)
    can = jax.jit(lambda a: jnp.mean((a @ a).astype(jnp.float32)))
    _ = float(can(a))
    t0 = time.perf_counter()
    _ = float(can(a * 1.001))
    print(f"canary 1024^2 matmul e2e: {(time.perf_counter() - t0) * 1e3:.0f}"
          " ms", flush=True)

    # conv stem: XLA lax.conv vs shifted-matmul lowering
    def stem_xla(p, m):
        x = layers.gelu(layers.conv1d(p["conv1"], m, stride=1, padding=1))
        return layers.gelu(layers.conv1d(p["conv2"], x, stride=2,
                                         padding=1))

    def stem_mxu(p, m):
        x = layers.gelu(layers.conv1d_mxu(p["conv1"], m, stride=1,
                                          padding=1))
        return layers.gelu(layers.conv1d_mxu(p["conv2"], x, stride=2,
                                             padding=1))

    report("conv stem (lax.conv)",
           slope_time("stem_xla", make_loop(stem_xla), enc, mel), conv_flops)
    report("conv stem (shifted matmuls)",
           slope_time("stem_mxu", make_loop(stem_mxu), enc, mel), conv_flops)

    # attention-only stack
    def attn_stack(blocks, x):
        def body(x, bp):
            hn = layers.layer_norm(bp["ln1"], x)
            scale = (d // h) ** -0.25
            q = layers.linear(bp["attn"]["q"], hn).reshape(b, t, h, d // h)
            k = layers.linear(bp["attn"]["k"], hn).reshape(b, t, h, d // h)
            v = layers.linear(bp["attn"]["v"], hn).reshape(b, t, h, d // h)
            o = attention.attend(q * scale, k * scale, v, None, q_scaled=True)
            return x + layers.linear(bp["attn"]["o"],
                                     o.reshape(b, t, d)), None
        return jax.lax.scan(body, x, blocks)[0]

    attn_fl = b * lyr * (2 * t * d * d * 4 + 2 * 2 * t * t * d)
    report("attn stack (32L)",
           slope_time("attn", make_loop(attn_stack), enc["blocks"], x0),
           attn_fl)

    # attention kernel alone, 32 calls (carry feeds back so reps chain)
    qkv = jnp.asarray(rng.standard_normal((b, t, h, d // h)) * 0.05,
                      jnp.bfloat16)

    def kern_only(_unused, q):
        def body(x, _):
            return attention.attend(x, x, x, None, q_scaled=True), None
        return jax.lax.scan(body, q, None, length=lyr)[0]

    kern_fl = b * lyr * 2 * 2 * t * t * d
    report("attend kernel x32",
           slope_time("kern", make_loop(kern_only), jnp.zeros(()), qkv),
           kern_fl)

    # MLP-only stack
    def mlp_stack(blocks, x):
        def body(x, bp):
            hn = layers.layer_norm(bp["ln2"], x)
            return x + layers.linear(
                bp["mlp"]["fc2"],
                layers.gelu(layers.linear(bp["mlp"]["fc1"], hn))), None
        return jax.lax.scan(body, x, blocks)[0]

    mlp_fl = b * lyr * 2 * 2 * t * d * mlp_dim
    report("mlp stack (32L)",
           slope_time("mlp", make_loop(mlp_stack), enc["blocks"], x0),
           mlp_fl)

    # MLP-gap ablations: the stack above runs well below the 94% MFU the
    # same-shape raw GEMM chain reaches (gemm_ceiling.py). Isolate the
    # layer-norm and the gelu to see which non-GEMM op eats the difference.
    def mlp_stack_nogelu(blocks, x):
        def body(x, bp):
            hn = layers.layer_norm(bp["ln2"], x)
            return x + layers.linear(
                bp["mlp"]["fc2"], layers.linear(bp["mlp"]["fc1"], hn)), None
        return jax.lax.scan(body, x, blocks)[0]

    report("mlp stack (no gelu)",
           slope_time("mlp_ng", make_loop(mlp_stack_nogelu), enc["blocks"],
                      x0), mlp_fl)

    def mlp_stack_noln(blocks, x):
        def body(x, bp):
            return x + layers.linear(
                bp["mlp"]["fc2"],
                layers.gelu(layers.linear(bp["mlp"]["fc1"], x))), None
        return jax.lax.scan(body, x, blocks)[0]

    report("mlp stack (no layernorm)",
           slope_time("mlp_nl", make_loop(mlp_stack_noln), enc["blocks"],
                      x0), mlp_fl)

    def mlp_stack_gemms(blocks, x):
        def body(x, bp):
            return x + layers.linear(
                bp["mlp"]["fc2"], layers.linear(bp["mlp"]["fc1"], x)), None
        return jax.lax.scan(body, x, blocks)[0]

    report("mlp stack (GEMMs only)",
           slope_time("mlp_g", make_loop(mlp_stack_gemms), enc["blocks"],
                      x0), mlp_fl)

    # full block stack (attn + mlp interleaved, exactly the encode() body):
    # isolates whether the attn/mlp gap vs the full encoder comes from
    # their interleaving (VMEM pressure between the Pallas attention and
    # the MLP GEMMs) or from the stem/posemb/ln_post glue
    def block_stack(blocks, x):
        def body(x, bp):
            x = x + wmodel._self_attention(
                bp["attn"], layers.layer_norm(bp["ln1"], x), h)
            hn = layers.layer_norm(bp["ln2"], x)
            x = x + layers.linear(
                bp["mlp"]["fc2"],
                layers.gelu(layers.linear(bp["mlp"]["fc1"], hn)))
            return x, None
        return jax.lax.scan(body, x, blocks)[0]

    report("block stack (32L attn+mlp)",
           slope_time("blocks", make_loop(block_stack), enc["blocks"], x0),
           b * lyr * flops_layer)

    # combined stack with XLA einsum attention: if this is ~additive with
    # the component stacks, the interleave penalty is Pallas-specific
    def block_stack_xla(blocks, x):
        hd = d // h
        scale = hd ** -0.25

        def body(x, bp):
            hn = layers.layer_norm(bp["ln1"], x)
            q = layers.linear(bp["attn"]["q"], hn).reshape(b, t, h, hd)
            k = layers.linear(bp["attn"]["k"], hn).reshape(b, t, h, hd)
            v = layers.linear(bp["attn"]["v"], hn).reshape(b, t, h, hd)
            s = jnp.einsum("bqhd,bkhd->bhqk", q * scale, k * scale,
                           preferred_element_type=jnp.float32)
            w = jax.nn.softmax(s, axis=-1)
            o = jnp.einsum("bhqk,bkhd->bqhd", w.astype(v.dtype), v)
            x = x + layers.linear(bp["attn"]["o"], o.reshape(b, t, d))
            hn = layers.layer_norm(bp["ln2"], x)
            x = x + layers.linear(
                bp["mlp"]["fc2"],
                layers.gelu(layers.linear(bp["mlp"]["fc1"], hn)))
            return x, None
        return jax.lax.scan(body, x, blocks)[0]

    report("block stack (XLA attention)",
           slope_time("blocks_xla", make_loop(block_stack_xla),
                      enc["blocks"], x0),
           b * lyr * flops_layer)

    # combined stack with HEAD-MAJOR einsum projections feeding the Pallas
    # kernel pre-transposed (pre_bh=True): no explicit (B,T,H,d)<->(B,H,T,d)
    # transposes around the custom call
    def block_stack_bh(blocks, x):
        from tpu_audio.ops.pallas import encoder_attention as ea

        hd = d // h
        scale = hd ** -0.25

        def body(x, bp):
            hn = layers.layer_norm(bp["ln1"], x)
            wq = bp["attn"]["q"]["weight"].reshape(h, hd, d).astype(hn.dtype)
            wk = bp["attn"]["k"]["weight"].reshape(h, hd, d).astype(hn.dtype)
            wv = bp["attn"]["v"]["weight"].reshape(h, hd, d).astype(hn.dtype)
            q = (jnp.einsum("btd,hed->bhte", hn, wq)
                 + bp["attn"]["q"]["bias"].reshape(h, 1, hd).astype(hn.dtype)
                 ).reshape(b * h, t, hd)
            k = jnp.einsum("btd,hed->bhte", hn, wk).reshape(b * h, t, hd)
            v = (jnp.einsum("btd,hed->bhte", hn, wv)
                 + bp["attn"]["v"]["bias"].reshape(h, 1, hd).astype(hn.dtype)
                 ).reshape(b * h, t, hd)
            o = ea.encoder_attention(q * scale, k * scale, v, pre_bh=True,
                                     scale=1.0)
            wo = bp["attn"]["o"]["weight"].reshape(d, h, hd).astype(hn.dtype)
            x = x + (jnp.einsum("bhte,dhe->btd", o.reshape(b, h, t, hd), wo)
                     + bp["attn"]["o"]["bias"].astype(hn.dtype))
            hn = layers.layer_norm(bp["ln2"], x)
            x = x + layers.linear(
                bp["mlp"]["fc2"],
                layers.gelu(layers.linear(bp["mlp"]["fc1"], hn)))
            return x, None
        return jax.lax.scan(body, x, blocks)[0]

    report("block stack (head-major qkv)",
           slope_time("blocks_bh", make_loop(block_stack_bh),
                      enc["blocks"], x0),
           b * lyr * flops_layer)

    # combined stack with PAIR-PACKED attention (2 heads -> 128 lanes,
    # block-diagonal q in-kernel): the hd=64 dots of the plain kernel run
    # at half MXU contraction depth / emit half-width tiles; this is the
    # production path when PACKED_ATTN is on — compare against the
    # head-major row above
    def block_stack_packed(blocks, x):
        from tpu_audio.ops.pallas import encoder_attention as ea

        hd = d // h
        g = h // 2
        scale = hd ** -0.25

        def body(x, bp):
            hn = layers.layer_norm(bp["ln1"], x)
            wq = bp["attn"]["q"]["weight"].reshape(g, 2, hd, d).astype(
                hn.dtype)
            wk = bp["attn"]["k"]["weight"].reshape(g, 2, hd, d).astype(
                hn.dtype)
            wv = bp["attn"]["v"]["weight"].reshape(g, 2, hd, d).astype(
                hn.dtype)
            bq_ = bp["attn"]["q"]["bias"].reshape(g, 1, 2, hd).astype(
                hn.dtype)
            bv_ = bp["attn"]["v"]["bias"].reshape(g, 1, 2, hd).astype(
                hn.dtype)
            q = (jnp.einsum("btd,gxed->bgtxe", hn, wq)
                 + bq_[None]).reshape(b * g, t, 2 * hd)
            k = jnp.einsum("btd,gxed->bgtxe", hn, wk).reshape(
                b * g, t, 2 * hd)
            v = (jnp.einsum("btd,gxed->bgtxe", hn, wv)
                 + bv_[None]).reshape(b * g, t, 2 * hd)
            o = ea.encoder_attention_packed(q * scale, k * scale, v,
                                            scale=1.0)
            wo = bp["attn"]["o"]["weight"].reshape(d, g, 2, hd).astype(
                hn.dtype)
            x = x + (jnp.einsum("bgtxe,dgxe->btd",
                                o.reshape(b, g, t, 2, hd), wo)
                     + bp["attn"]["o"]["bias"].astype(hn.dtype))
            hn = layers.layer_norm(bp["ln2"], x)
            x = x + layers.linear(
                bp["mlp"]["fc2"],
                layers.gelu(layers.linear(bp["mlp"]["fc1"], hn)))
            return x, None
        return jax.lax.scan(body, x, blocks)[0]

    if h % 2 == 0 and 2 * (d // h) == 128:
        report("block stack (pair-packed attn)",
               slope_time("blocks_pk", make_loop(block_stack_packed),
                          enc["blocks"], x0),
               b * lyr * flops_layer)

    # whole-block FUSED phases (ops/pallas/fused_encoder): LayerNorm+QKV
    # and attention+o-proj+residual+LayerNorm as TWO Pallas launches per
    # block, XLA MLP — the attention output never exists in HBM
    if h % 2 == 0 and 2 * (d // h) == 128:
        def block_stack_fused(blocks, x):
            return wmodel._encode_blocks_fused(blocks, x, h)

        report("block stack (FUSED phases)",
               slope_time("blocks_fe", make_loop(block_stack_fused),
                          enc["blocks"], x0),
               b * lyr * flops_layer)

    # attention replaced by identity-over-v (projections + MLP intact):
    # block-stack-minus-this isolates what the attend custom call costs IN
    # CONTEXT (its standalone slope is ~95 ms; if the in-context delta is
    # larger, the call also serializes/disrupts its surroundings)
    def block_stack_noattend(blocks, x):
        hd = d // h

        def body(x, bp):
            hn = layers.layer_norm(bp["ln1"], x)
            _q = layers.linear(bp["attn"]["q"], hn)
            _k = layers.linear(bp["attn"]["k"], hn)
            v = layers.linear(bp["attn"]["v"], hn)
            o = v + 1e-12 * (_q + _k)  # keep all projections live
            x = x + layers.linear(bp["attn"]["o"], o)
            hn = layers.layer_norm(bp["ln2"], x)
            x = x + layers.linear(
                bp["mlp"]["fc2"],
                layers.gelu(layers.linear(bp["mlp"]["fc1"], hn)))
            return x, None
        return jax.lax.scan(body, x, blocks)[0]

    report("block stack (attend -> identity)",
           slope_time("blocks_noat", make_loop(block_stack_noattend),
                      enc["blocks"], x0),
           b * lyr * (flops_layer - 2 * 2 * t * t * d))

    # full encoder (current code path: conv1d_mxu stem); the fused-block
    # gate picks the fused path automatically — A/B both explicitly
    saved_gate = wmodel.FUSED_ENC
    wmodel.FUSED_ENC = False
    report("full encoder (per-op)",
           slope_time("full", make_loop(
               lambda p, m: wmodel.encode(p, cfg, m)), params, mel),
           enc_flops)
    wmodel.FUSED_ENC = True
    report("full encoder (FUSED blocks)",
           slope_time("full_fe", make_loop(
               lambda p, m: wmodel.encode(p, cfg, m)), params, mel),
           enc_flops)

    # int8 (w8a8 serving) encoder: XLA-glue path vs the fused int8 chain
    try:
        from tpu_audio.models.whisper.load import serve_tree_int8
        pi8 = serve_tree_int8(params, decoder=False)
        wmodel.FUSED_ENC = False
        report("full encoder int8 (XLA glue)",
               slope_time("full_i8", make_loop(
                   lambda p, m: wmodel.encode(p, cfg, m)), pi8, mel),
               enc_flops)
        wmodel.FUSED_ENC = True
        report("full encoder int8 (FUSED w8a8)",
               slope_time("full_i8f", make_loop(
                   lambda p, m: wmodel.encode(p, cfg, m)), pi8, mel),
               enc_flops)
    except Exception as exc:
        print(f"int8 encoder failed: {exc}")
    finally:
        wmodel.FUSED_ENC = saved_gate


if __name__ == "__main__":
    main()
