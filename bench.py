"""Headline benchmark: Whisper large-v3-turbo transcription throughput per
chip (xRT = audio seconds per wall second), on real TPU hardware.

Random bf16 weights (throughput is weight-value independent); the measured
path is the real one: 30 s mel → encoder (32 layers) → prefill → 200 cached
decode steps with suppression masks, timestamp rules, and greedy selection
on device — i.e. what SegmentDecoder runs per seek window, with a fixed
trip count so the number is comparable across rounds.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: >50x real time per v5e chip (BASELINE.md).
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

TOKENS_PER_WINDOW = 200  # typical upper bound of tokens for 30 s of speech
AUDIO_SECONDS = 30.0
BASELINE_XRT = 50.0


def main():
    from tpu_audio.models.whisper import model as wmodel
    from tpu_audio.models.whisper.config import PRESETS
    from tpu_audio.models.whisper.decoding import build_blank_mask, build_suppress_mask
    from tpu_audio.ops import frontends

    cfg = PRESETS["large-v3-turbo"]
    params = wmodel.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16)

    # static suppression tables (as in SegmentDecoder; tokenizer-independent
    # stand-ins with the same sparsity for benchmarking)
    rng = np.random.default_rng(0)
    base_mask = np.zeros(cfg.n_vocab, np.float32)
    base_mask[rng.choice(cfg.n_vocab, 120, replace=False)] = -1e30

    sot = 50258
    init_tokens = jnp.asarray([[sot, sot + 1, sot + 101]], jnp.int32)

    @jax.jit
    def mel_fn(audio):
        return frontends.whisper_log_mel(audio, n_mels=cfg.n_mels)

    @jax.jit
    def transcribe_window(params, mel):
        feats = wmodel.encode(params, cfg, mel[None].astype(jnp.bfloat16))
        state = wmodel.init_state(params, cfg, feats, dtype=jnp.bfloat16)
        logits, state = wmodel.decode_step(params, cfg, init_tokens, state)
        mask = jnp.asarray(base_mask)
        ts_begin = 50364

        def body(i, carry):
            last, state, toks = carry
            logits, state = wmodel.decode_step(params, cfg, last[None], state)
            lg = logits[0, -1].astype(jnp.float32) + mask
            # timestamp-rule-shaped work: monotonic range suppression
            vocab_idx = jnp.arange(cfg.n_vocab)
            lg = jnp.where((vocab_idx >= ts_begin) & (vocab_idx < ts_begin + (i % 50)),
                           -1e30, lg)
            logprobs = jax.nn.log_softmax(lg)
            ts_lp = jax.nn.logsumexp(logprobs[ts_begin:])
            max_text = jnp.max(logprobs[:ts_begin])
            lg = jnp.where((ts_lp > max_text) & (vocab_idx < ts_begin), -1e30, lg)
            nxt = jnp.argmax(lg).astype(jnp.int32)
            toks = toks.at[i].set(nxt)
            return (nxt[None], state, toks)

        toks = jnp.zeros((TOKENS_PER_WINDOW,), jnp.int32)
        _, _, toks = jax.lax.fori_loop(
            0, TOKENS_PER_WINDOW, body,
            (init_tokens[:, -1], state, toks))
        return toks

    audio = jnp.asarray(np.random.default_rng(1).standard_normal(
        int(AUDIO_SECONDS * 16000)).astype(np.float32) * 0.1)

    # warmup / compile
    mel = mel_fn(audio)
    out = transcribe_window(params, mel)
    out.block_until_ready()

    runs = 5
    t0 = time.perf_counter()
    for _ in range(runs):
        mel = mel_fn(audio)
        out = transcribe_window(params, mel)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / runs

    xrt = AUDIO_SECONDS / dt
    print(json.dumps({
        "metric": "whisper_large_v3_turbo_xrt_per_chip",
        "value": round(xrt, 2),
        "unit": "x_realtime",
        "vs_baseline": round(xrt / BASELINE_XRT, 3),
    }))


if __name__ == "__main__":
    main()
