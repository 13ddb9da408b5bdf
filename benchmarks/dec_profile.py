"""Per-component profile of the Whisper large-v3-turbo DECODE loop at batch
16 (the other ~55% of the full-pipeline headline, next to the encoder).

Same transfer-proof harness as enc_profile.py: repetition inside one jitted
lax.fori_loop with a data dependency between reps (argmax token feeds the
next step), scalar output, slope timing over distinct inputs.

Bandwidth floor per step at batch 16 (v5e, 819 GB/s):
  decoder weights  ~184 MB bf16 (4 layers incl. cross proj + mlp)  0.22 ms
  lm_head (tied embedding 51866x1280)                 133 MB       0.16 ms
  cross K/V reads  4L x (16,1500,20,64) x {K,V} bf16  492 MB       0.60 ms
  self-KV + activations                               ~60 MB       0.07 ms
  total                                               ~0.87 GB     ~1.05 ms

Measured (same session): full step 2.87 ms, no-cross ablation 0.65 ms →
the XLA cross path moves its 492 MB at only ~220 GB/s effective. The
int8 cross-KV variant (ops/pallas/cross_kv_attention, 246 MB/step)
measured 1.54 ms/step — 1.86x — and lifted the full-pipeline headline
476 -> 646x real time.
"""

import argparse
import functools
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

R1, R2 = 32, 160


def slope(label, fn, *arrays, r1=R1, r2=R2):
    t0 = time.perf_counter()
    _ = float(fn(*arrays, r1))
    _ = float(fn(*arrays, r2))
    print(f"  [{label}] compiled in {time.perf_counter() - t0:.0f}s",
          flush=True)
    t0 = time.perf_counter()
    _ = float(fn(*arrays, r1))
    ta = time.perf_counter() - t0
    t0 = time.perf_counter()
    _ = float(fn(*arrays, r2))
    tb = time.perf_counter() - t0
    return (tb - ta) / (r2 - r1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--steps", type=int, default=200)
    args = ap.parse_args()

    cfg = PRESETS["large-v3-turbo"]
    b = args.batch
    d, h = cfg.n_text_state, cfg.n_text_head
    params = wmodel.init_params(jax.random.PRNGKey(0), cfg,
                                dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal(
        (b, cfg.n_audio_ctx, cfg.n_audio_state)) * 0.3, jnp.bfloat16)

    def report(label, dt):
        print(f"{label:40s}: {dt * 1e3:7.3f} ms/step "
              f"({dt * args.steps * 1e3:6.0f} ms / {args.steps} steps)",
              flush=True)

    # full decode step, token-argmax feedback (the honest serving loop body)
    @functools.partial(jax.jit, static_argnums=2)
    def dec_full(p, feats, reps):
        state = wmodel.init_state(p, cfg, feats, batch=b, dtype=jnp.bfloat16)

        def body(i, carry):
            tok, state = carry
            logits, state = wmodel.decode_step(p, cfg, tok[:, None], state)
            nxt = jnp.argmax(logits[:, -1].astype(jnp.float32),
                             axis=-1).astype(jnp.int32)
            return (nxt % 50000, state)

        tok0 = jnp.full((b,), 50258, jnp.int32)
        tok, _ = jax.lax.fori_loop(0, reps, body, (tok0, state))
        return jnp.sum(tok)

    report("decode step (full)", slope("full", dec_full, params, feats))

    # int8 cross-KV serving state (fused cross_kv_attention kernel):
    # halves the dominant HBM term (the per-step cross-K/V stream)
    @functools.partial(jax.jit, static_argnums=2)
    def dec_full_q8(p, feats, reps):
        state = wmodel.init_state(p, cfg, feats, batch=b, dtype=jnp.bfloat16,
                                  kv_int8=True)

        def body(i, carry):
            tok, state = carry
            logits, state = wmodel.decode_step(p, cfg, tok[:, None], state)
            nxt = jnp.argmax(logits[:, -1].astype(jnp.float32),
                             axis=-1).astype(jnp.int32)
            return (nxt % 50000, state)

        tok0 = jnp.full((b,), 50258, jnp.int32)
        tok, _ = jax.lax.fori_loop(0, reps, body, (tok0, state))
        return jnp.sum(tok)

    report("decode step (int8 cross-KV)",
           slope("full_q8", dec_full_q8, params, feats))

    # stacked-int8 decoder weights + int8 cross-KV (the full w8a8 decode):
    # weights 184 MB -> 92, lm_head 133 -> 66 on top of the halved KV
    try:
        from tpu_audio.models.whisper.load import serve_tree_int8

        params_w8 = serve_tree_int8(params, encoder=False)
        report("decode step (int8 dec + int8 KV)",
               slope("full_w8", dec_full_q8, params_w8, feats))
    except Exception as exc:
        print(f"int8-decoder profile failed: {exc}")

    # ---- ablations on a hand-rolled copy of the step body ----------------
    p = params["decoder"]
    hd = d // h
    scale = hd ** -0.25
    max_len = 224

    def make_abl(cross_keys: int | None, lm_head: bool, layers_on: bool):
        """cross_keys: None = full 1500, 0 = skip cross-attn entirely."""

        @functools.partial(jax.jit, static_argnums=2)
        def run(p, feats, reps):
            dec = p["decoder"]
            ck, cv = wmodel.precompute_cross_kv(p, cfg, feats)
            if cross_keys:
                ck, cv = ck[:, :, :cross_keys], cv[:, :, :cross_keys]
            kbuf = jnp.zeros((cfg.n_text_layer, b, max_len, h, hd),
                             jnp.bfloat16)
            vbuf = jnp.zeros_like(kbuf)

            def step(tok, pos, kbuf, vbuf):
                x = layers.embedding(dec["token_embedding"], tok[:, None])
                pe = jax.lax.dynamic_slice(dec["positional_embedding"],
                                           (pos, 0), (1, d))
                x = x + pe[None].astype(x.dtype)
                mask = attention.decode_mask(max_len, pos, 1)

                def body(carry, xs):
                    x, kbuf, vbuf = carry
                    bp, ckl, cvl, li = xs
                    hn = layers.layer_norm(bp["ln1"], x)
                    q = wmodel._heads(layers.linear(bp["attn"]["q"], hn),
                                      h) * scale
                    k = wmodel._heads(layers.linear(bp["attn"]["k"], hn),
                                      h) * scale
                    v = wmodel._heads(layers.linear(bp["attn"]["v"], hn), h)
                    kbuf = jax.lax.dynamic_update_slice(
                        kbuf, k[None].astype(kbuf.dtype), (li, 0, pos, 0, 0))
                    vbuf = jax.lax.dynamic_update_slice(
                        vbuf, v[None].astype(vbuf.dtype), (li, 0, pos, 0, 0))
                    kl = jax.lax.dynamic_index_in_dim(kbuf, li, 0,
                                                      keepdims=False)
                    vl = jax.lax.dynamic_index_in_dim(vbuf, li, 0,
                                                      keepdims=False)
                    o = attention.attend(q, kl.astype(q.dtype),
                                         vl.astype(q.dtype), mask,
                                         q_scaled=True)
                    x = x + layers.linear(bp["attn"]["o"], o.reshape(b, 1, d))
                    if cross_keys != 0:
                        hn = layers.layer_norm(bp["ln_cross"], x)
                        qc = wmodel._heads(
                            layers.linear(bp["cross_attn"]["q"], hn),
                            h) * scale
                        oc = attention.attend(qc, ckl.astype(qc.dtype),
                                              cvl.astype(qc.dtype),
                                              q_scaled=True)
                        x = x + layers.linear(bp["cross_attn"]["o"],
                                              oc.reshape(b, 1, d))
                    hn = layers.layer_norm(bp["ln2"], x)
                    x = x + layers.linear(
                        bp["mlp"]["fc2"],
                        layers.gelu(layers.linear(bp["mlp"]["fc1"], hn)))
                    return (x, kbuf, vbuf), None

                if layers_on:
                    (x, kbuf, vbuf), _ = jax.lax.scan(
                        body, (x, kbuf, vbuf),
                        (dec["blocks"], ck, cv,
                         jnp.arange(cfg.n_text_layer)))
                x = layers.layer_norm(dec["ln"], x)
                if lm_head:
                    logits = layers.embedding_as_linear(
                        dec["token_embedding"], x)
                    nxt = jnp.argmax(logits[:, -1].astype(jnp.float32),
                                     axis=-1)
                else:
                    nxt = jnp.argmax(x[:, -1].astype(jnp.float32), axis=-1)
                return nxt.astype(jnp.int32) % 50000, kbuf, vbuf

            def body(i, carry):
                tok, kbuf, vbuf = carry
                nxt, kbuf, vbuf = step(tok, i, kbuf, vbuf)
                return (nxt, kbuf, vbuf)

            tok0 = jnp.full((b,), 50258, jnp.int32)
            tok, _, _ = jax.lax.fori_loop(0, reps, body, (tok0, kbuf, vbuf))
            return jnp.sum(tok)

        return run

    report("abl: full copy (sanity)",
           slope("abl_full", make_abl(None, True, True), params, feats))
    report("abl: cross ctx 1500 -> 128",
           slope("abl_c128", make_abl(128, True, True), params, feats))
    report("abl: no cross-attn",
           slope("abl_nocross", make_abl(0, True, True), params, feats))
    report("abl: no lm_head",
           slope("abl_nolm", make_abl(None, False, True), params, feats))
    report("abl: lm_head only (no layers)",
           slope("abl_lm", make_abl(None, True, False), params, feats))


if __name__ == "__main__":
    main()
