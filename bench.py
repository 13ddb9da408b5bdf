"""Headline benchmark: Whisper large-v3-turbo transcription throughput per
chip (aggregate audio seconds per wall second), on real TPU hardware.

Random bf16 weights (throughput is weight-value independent); the measured
path is the real serving path: per window, 30 s mel → 32-layer encoder →
prefill → cached decode with suppression masks, timestamp rules, and greedy
selection on device. The headline metric batches 8 windows through one
compiled while_loop (models/whisper/batch.py — weights stream from HBM once
per step for all 8 streams); the single-stream number is printed to stderr
for reference.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: >50x real time per v5e chip (BASELINE.md).
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

TOKENS_PER_WINDOW = 200  # typical upper bound for 30 s of speech
AUDIO_SECONDS = 30.0
BASELINE_XRT = 50.0
BATCH = 16


def main():
    from tpu_audio.models.whisper import batch as wbatch
    from tpu_audio.models.whisper import model as wmodel
    from tpu_audio.models.whisper.config import PRESETS
    from tpu_audio.ops import frontends

    cfg = PRESETS["large-v3-turbo"]
    params = wmodel.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)
    # settle the fused-encoder Mosaic gates eagerly (main thread, before
    # any trace): a mid-trace probe failure is memoized for the process
    # and silently demotes every later encode to the per-op path
    print(f"fused encoder probes (bf16+int8): "
          f"{wmodel.warm_fused_probes(cfg, int8=True)}", file=sys.stderr)
    rng = np.random.default_rng(0)

    base_mask = np.zeros(cfg.n_vocab, np.float32)
    base_mask[rng.choice(cfg.n_vocab, 120, replace=False)] = -1e30
    sot = 50258
    init_tokens_1 = jnp.asarray([[sot, sot + 1, sot + 101]], jnp.int32)

    @jax.jit
    def mel_fn(audio):
        return frontends.whisper_log_mel(audio, n_mels=cfg.n_mels)

    def make_window_fn(b, kv_int8=False):
        init_tokens = jnp.tile(init_tokens_1, (b, 1))

        def decode_from_feats(params, feats):
            state = wmodel.init_state(params, cfg, feats, batch=b,
                                      dtype=jnp.bfloat16, kv_int8=kv_int8)
            logits, state = wmodel.decode_step(params, cfg, init_tokens, state)
            mask = jnp.asarray(base_mask)
            ts_begin = 50364

            def body(i, carry):
                last, state, toks = carry
                logits, state = wmodel.decode_step(params, cfg, last[:, None],
                                                   state)
                lg = logits[:, -1].astype(jnp.float32) + mask[None]
                vocab_idx = jnp.arange(cfg.n_vocab)
                lg = jnp.where((vocab_idx >= ts_begin)
                               & (vocab_idx < ts_begin + (i % 50)),
                               -1e30, lg)
                logprobs = jax.nn.log_softmax(lg, axis=-1)
                ts_lp = jax.nn.logsumexp(logprobs[:, ts_begin:], axis=-1)
                max_text = jnp.max(logprobs[:, :ts_begin], axis=-1)
                lg = jnp.where((ts_lp > max_text)[:, None]
                               & (vocab_idx < ts_begin)[None], -1e30, lg)
                nxt = jnp.argmax(lg, axis=-1).astype(jnp.int32)
                toks = jax.lax.dynamic_update_slice(toks, nxt[:, None], (0, i))
                return (nxt, state, toks)

            toks = jnp.zeros((b, TOKENS_PER_WINDOW), jnp.int32)
            _, _, toks = jax.lax.fori_loop(
                0, TOKENS_PER_WINDOW, body, (init_tokens[:, -1], state, toks))
            return toks

        @jax.jit
        def transcribe_window(params, mel):
            feats = wmodel.encode(params, cfg, mel.astype(jnp.bfloat16))
            return decode_from_feats(params, feats)

        return transcribe_window, decode_from_feats

    audio = jnp.asarray(rng.standard_normal(
        int(AUDIO_SECONDS * 16000)).astype(np.float32) * 0.1)
    mel1 = mel_fn(audio)[None]

    def measure(b, runs=5):
        # Distinct input buffers per run: the tunnel runtime memoizes
        # identical dispatches (executable + input buffers), and health
        # varies — scaled copies keep every run honest. Output (b, 200)
        # int32 is small, so the eager per-dispatch output transfer
        # (~115 MB/s, see benchmarks/gemm_ceiling.py) is negligible here.
        fn, _ = make_window_fn(b)
        mel = jnp.tile(mel1, (b, 1, 1))
        mels = [mel * (1.0 + 0.001 * i) for i in range(runs + 1)]
        out = fn(params, mels[-1])
        _ = np.asarray(out)  # sync
        t0 = time.perf_counter()
        for i in range(runs):
            out = fn(params, mels[i])
        _ = np.asarray(out)
        dt = (time.perf_counter() - t0) / runs
        return b * AUDIO_SECONDS / dt

    single_xrt = measure(1)
    print(f"single-stream: {single_xrt:.1f}x real time", file=sys.stderr)
    batch_xrt = measure(BATCH)
    print(f"batch={BATCH}: {batch_xrt:.1f}x real time aggregate",
          file=sys.stderr)

    # ---- int8 (W8A8) encoder serving format: encoder blocks requantized
    # per-channel, GEMMs on the int8 MXU (2x bf16 peak). Guarded: any
    # failure falls back to the bf16 numbers.
    params_i8 = None
    try:
        from tpu_audio.models.whisper.load import serve_tree_int8

        params_i8 = serve_tree_int8(params)
        feats_ref = np.asarray(
            jax.jit(lambda p, m: wmodel.encode(p, cfg, m.astype(jnp.bfloat16))
                    )(params, mel1)).astype(np.float32)
        feats_i8 = np.asarray(
            jax.jit(lambda p, m: wmodel.encode(p, cfg, m.astype(jnp.bfloat16))
                    )(params_i8, mel1)).astype(np.float32)
        cos = float((feats_ref * feats_i8).sum()
                    / (np.linalg.norm(feats_ref) * np.linalg.norm(feats_i8)
                       + 1e-12))
        print(f"int8 encoder feature cosine vs bf16: {cos:.5f}",
              file=sys.stderr)
    except Exception as exc:  # pragma: no cover - chip-side guard
        print(f"int8 encoder setup failed ({exc}); bf16 only",
              file=sys.stderr)
        params_i8 = None

    # ---- HONEST full pipeline at batch 16: mel extraction + language
    # detect (encoder reuse + 1 decode step) + the full window decode. This
    # is what a real batch transcription pays per 30 s window; the window-
    # loop-only number above is the component view.
    def make_full_fn(b, p, kv_int8=False):
        # ONE jitted graph raw audio -> (lang, tokens): keeps the 24 MB mel
        # intermediate on device (returning it to host would pay the eager
        # tunnel transfer), collapses three dispatch round-trips into one,
        # and encodes ONCE — language detect and the window decode share the
        # same encoder features, as a real serving pipeline does.
        _, decode_from_feats = make_window_fn(b, kv_int8=kv_int8)

        @jax.jit
        def run(p, raw_audio_b):
            # p is an argument, not a closure: closed-over weights become
            # jaxpr constants and remote_compile would upload the tree
            mels = jax.vmap(mel_fn)(raw_audio_b)
            feats = wmodel.encode(p, cfg, mels.astype(jnp.bfloat16))
            state = wmodel.init_state(p, cfg, feats, batch=b,
                                      dtype=jnp.bfloat16, kv_int8=kv_int8)
            logits, _ = wmodel.decode_step(
                p, cfg, jnp.full((b, 1), sot, jnp.int32), state)
            lang = jnp.argmax(logits[:, -1, sot + 1: sot + 100], axis=-1)
            toks = decode_from_feats(p, feats)
            return lang, toks

        return lambda raw: run(p, raw)

    def measure_full(b, p, runs=5, kv_int8=False):
        fn = make_full_fn(b, p, kv_int8=kv_int8)
        base = rng.standard_normal(
            (b, int(AUDIO_SECONDS * 16000))).astype(np.float32) * 0.1
        raw0 = jnp.asarray(base)
        raws = [raw0 * (1.0 + 0.001 * i) for i in range(runs + 1)]
        lang, out = fn(raws[-1])
        _ = np.asarray(out)
        t0 = time.perf_counter()
        for i in range(runs):
            lang, out = fn(raws[i])
        _ = np.asarray(out)
        dt = (time.perf_counter() - t0) / runs
        return b * AUDIO_SECONDS / dt

    full_bf16_xrt = measure_full(BATCH, params)
    print(f"FULL pipeline (mel+detect+decode) batch={BATCH} bf16: "
          f"{full_bf16_xrt:.1f}x real time", file=sys.stderr)
    full_xrt = full_bf16_xrt
    # int8 cross-K/V decode (fused cross_kv_attention kernel): the decode
    # loop reads half the cross-KV bytes — measured 2.87 -> 1.54 ms/step at
    # batch 16. Token agreement vs the bf16 state is checked below.
    try:
        full_kv8_xrt = measure_full(BATCH, params, kv_int8=True)
        print(f"FULL pipeline batch={BATCH} bf16 + int8 cross-KV: "
              f"{full_kv8_xrt:.1f}x real time", file=sys.stderr)
        full_xrt = max(full_xrt, full_kv8_xrt)
        raw1 = jnp.asarray(rng.standard_normal(
            (BATCH, int(AUDIO_SECONDS * 16000))).astype(np.float32) * 0.1)
        _, tok_fp = make_full_fn(BATCH, params)(raw1)
        _, tok_q8 = make_full_fn(BATCH, params, kv_int8=True)(raw1)
        agree = float((np.asarray(tok_fp) == np.asarray(tok_q8)).mean())
        print(f"int8 cross-KV greedy token agreement vs bf16: {agree:.3f} "
              "(random weights — near-tie logits; real checkpoints via "
              "tools/validate_release.py)", file=sys.stderr)
    except Exception as exc:
        print(f"int8 cross-KV run failed ({exc})", file=sys.stderr)
    if params_i8 is not None:
        try:
            full_i8_xrt = measure_full(BATCH, params_i8, kv_int8=True)
            print(f"FULL pipeline batch={BATCH} full w8a8 (int8 encoder + "
                  f"decoder + cross-KV): {full_i8_xrt:.1f}x real time",
                  file=sys.stderr)
            full_xrt = max(full_xrt, full_i8_xrt)
        except Exception as exc:
            print(f"int8 full-pipeline run failed ({exc})", file=sys.stderr)
        try:
            # mixed combo: bf16 encoder + stacked-int8 decoder + int8
            # cross-KV (was the round-3 winner while the int8 encoder ran
            # the XLA glue path; the fused w8a8 encoder should now put the
            # full-w8a8 row ahead — the headline takes the max)
            params_mix = {**params_i8, "encoder": params["encoder"]}
            full_mix_xrt = measure_full(BATCH, params_mix, kv_int8=True)
            print(f"FULL pipeline batch={BATCH} bf16-enc + int8 decoder + "
                  f"int8 cross-KV: {full_mix_xrt:.1f}x real time",
                  file=sys.stderr)
            full_xrt = max(full_xrt, full_mix_xrt)
        except Exception as exc:
            print(f"mixed int8 full-pipeline run failed ({exc})",
                  file=sys.stderr)
        try:
            # single-stream w8a8 serving: B=1 steps ride the fused
            # whole-decoder kernel (ops/pallas/fused_whisper_step.py)
            single_w8_xrt = measure_full(1, params_i8, kv_int8=True)
            print(f"FULL pipeline single-stream w8a8 (fused decoder "
                  f"step): {single_w8_xrt:.1f}x real time", file=sys.stderr)
        except Exception as exc:
            print(f"single-stream w8a8 run failed ({exc})", file=sys.stderr)

    # encoder MFU: isolate the 32-layer encoder at batch 16 and compare its
    # matmul FLOPs to the v5e bf16 peak (197 TFLOP/s) so the perf claim is
    # auditable. Timed with in-graph lax.fori_loop repetition + scalar
    # output + slope over distinct inputs: the tunnel runtime eagerly
    # transfers every dispatch output (~115 MB/s — a host-loop timing of
    # the (16,1500,1280) features measures ~530 ms of transfer per run,
    # which is how this encoder was once misread as 25% MFU) and memoizes
    # identical dispatches. See benchmarks/gemm_ceiling.py.
    mel8 = jnp.tile(mel1, (BATCH, 1, 1))
    d, t, lyr = cfg.n_audio_state, cfg.n_audio_ctx, cfg.n_audio_layer
    mlp_dim = 4 * d
    flops_layer = (2 * t * d * d * 4          # q,k,v,o projections
                   + 2 * 2 * t * t * d       # qk^T and attn·v
                   + 2 * 2 * t * d * mlp_dim)  # fc1 + fc2
    conv_flops = 2 * (3000 * 3 * cfg.n_mels * d + 1500 * 3 * d * d)
    flops = BATCH * (lyr * flops_layer + conv_flops)

    import functools

    # params must be an ARGUMENT (closed-over arrays become jaxpr
    # constants and the tunnel's remote_compile uploads them — a weight
    # tree in the closure is a multi-GB POST / HTTP 413)
    @functools.partial(jax.jit, static_argnums=2)
    def enc_reps_fn(p, mel, reps):
        def body(i, m):
            y = wmodel.encode(p, cfg, m.astype(jnp.bfloat16))
            dep = jnp.mean(y.astype(jnp.float32)) * 1e-12
            return m + dep
        return jnp.mean(jax.lax.fori_loop(0, reps, body, mel)
                        .astype(jnp.float32))

    def measure_enc(p, label, peak_tops):
        _ = float(enc_reps_fn(p, mel8, 1))  # compile + warm
        _ = float(enc_reps_fn(p, mel8, 6))
        t0 = time.perf_counter()
        _ = float(enc_reps_fn(p, mel8 * 1.001, 1))
        ta = time.perf_counter() - t0
        t0 = time.perf_counter()
        _ = float(enc_reps_fn(p, mel8 * 1.002, 6))
        tb = time.perf_counter() - t0
        enc_dt = (tb - ta) / 5
        mfu = flops / enc_dt / peak_tops
        print(f"encoder batch={BATCH} {label}: {enc_dt * 1e3:.1f} ms, "
              f"{flops / enc_dt / 1e12:.1f} TFLOP/s = {mfu * 100:.0f}% of "
              f"{peak_tops / 1e12:.0f}T peak", file=sys.stderr)

    measure_enc(params, "bf16", 197e12)
    if params_i8 is not None:
        try:  # int8 MXU peak on v5e is 2x bf16
            measure_enc(params_i8, "int8", 394e12)
        except Exception as exc:
            print(f"int8 encoder bench failed ({exc})", file=sys.stderr)

    # headline = the honest FULL pipeline number (mel + language detect +
    # window decode, batch 16, best serving format)
    print(json.dumps({
        "metric": f"whisper_large_v3_turbo_full_pipeline_xrt_batch{BATCH}",
        "value": round(full_xrt, 2),
        "unit": "x_realtime",
        "vs_baseline": round(full_xrt / BASELINE_XRT, 3),
    }))


if __name__ == "__main__":
    main()
