"""CosyVoice3 token-granularity streaming latency benchmark.

Measures per-chunk latency of the chunk-25/lookahead-3 streaming pipeline
(reference package/TTS/CosyVoice3/CosyVoice3Model.swift:505-660) with this
build's O(1)-per-chunk vocoder (hift.vocode_window). The reference
re-vocodes the full accumulated mel every chunk, so its per-chunk latency
grows with the utterance; here it should stay flat (the flow window still
grows, bucketed — matching the reference's flow behavior).

    python benchmarks/cv3_streaming.py [--full] [--chunks N]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")

SEED = 42
CHUNK_TOKENS = 25


def build(full: bool):
    import jax

    from tpu_audio.codecs.s3gen import flow, hift
    from tpu_audio.models.cosyvoice3 import dit
    from tpu_audio.models.cosyvoice3 import model as cv3

    if full:
        cfg = cv3.CV3FlowConfig()
    else:
        cfg = cv3.CV3FlowConfig(
            input_dim=256,
            dit=dit.DiTConfig(dim=256, depth=6, heads=4, head_dim=64,
                              mu_dim=256, spk_dim=80),
            cfm=flow.CFMConfig(n_timesteps=10),
            hift=hift.HiFTConfig(),
        )
    params = cv3.init_params(jax.random.PRNGKey(SEED), cfg)
    return cv3.CV3Synthesizer(params, cfg), cfg


def run_stream(syn, cfg, n_chunks: int, seed: int):
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    prompt_tokens = [int(x) for x in rng.integers(0, cfg.vocab_size, 12)]
    prompt_mel = rng.standard_normal(
        (2 * len(prompt_tokens), cfg.mel_dim)).astype(np.float32) * 0.1
    emb = jnp.asarray(rng.standard_normal((1, cfg.spk_dim)).astype(np.float32))
    chunks = [[int(x) for x in rng.integers(0, cfg.vocab_size, CHUNK_TOKENS)]
              for _ in range(n_chunks)]

    lat = []
    t0 = time.perf_counter()
    total = 0
    for audio in syn.stream(iter(chunks), prompt_tokens, prompt_mel, emb,
                            seed=0):
        t1 = time.perf_counter()
        lat.append(t1 - t0)
        total += len(audio)
        t0 = t1
    return lat, total


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true",
                    help="production-size configs (slow first compile)")
    ap.add_argument("--chunks", type=int, default=10)
    ap.add_argument("--o1", default="auto", choices=["auto", "on", "off"],
                    help="cached O(1) DiT flow: auto switches past the "
                         "window threshold; off = reference-style full "
                         "recompute per chunk")
    ap.add_argument("--o1-switch", type=int, default=600)
    ap.add_argument("--stages", action="store_true",
                    help="per-stage (mu/flow/voc) timing with forced host "
                         "syncs — attribution only, adds overhead")
    args = ap.parse_args()

    import jax

    print(f"backend: {jax.default_backend()}, devices: {jax.devices()}")
    syn, cfg = build(args.full)
    syn.o1_flow = {"auto": "auto", "on": True, "off": False}[args.o1]
    syn.o1_switch_frames = args.o1_switch
    print(f"o1_flow: {syn.o1_flow} (switch at {syn.o1_switch_frames} frames)")
    sr = 24000

    print("[warmup] compiling stream graphs...")
    t0 = time.perf_counter()
    run_stream(syn, cfg, args.chunks, seed=SEED)
    print(f"[warmup] {time.perf_counter() - t0:.1f}s")

    if args.stages:
        syn.stage_times = {}
    lat, total = run_stream(syn, cfg, args.chunks, seed=SEED)
    audio_s = total / sr
    chunk_audio = CHUNK_TOKENS * cfg.token_mel_ratio \
        * cfg.hift.upsample_scale / sr
    print(f"\n=== {len(lat)} chunks, {audio_s:.2f}s audio "
          f"({chunk_audio * 1000:.0f} ms/chunk) ===")
    print(f"  TTFA (first chunk): {lat[0] * 1000:8.1f} ms")
    for i, l in enumerate(lat):
        rtf = l / chunk_audio
        print(f"  chunk {i:2d}: {l * 1000:8.1f} ms  (chunk RTF {rtf:.3f})")
    steady = lat[2:]
    # tunnel jitter is ±25% on single chunks, so drift needs robust
    # statistics: median of the second half vs the first, plus the
    # per-chunk linear-regression slope
    half = len(steady) // 2
    med_drift = (np.median(steady[half:]) / np.median(steady[:half])
                 if half >= 2 else float("nan"))
    slope = np.polyfit(np.arange(len(steady)), steady, 1)[0]
    print(f"  steady-state: mean {np.mean(steady) * 1000:.1f} ms, "
          f"median {np.median(steady) * 1000:.1f} ms, "
          f"max {np.max(steady) * 1000:.1f} ms")
    print(f"  drift: median-halves {med_drift:.2f}x, "
          f"slope {slope * 1000:+.2f} ms/chunk "
          f"(last/first {steady[-1] / steady[0]:.2f}x)")
    print(f"  total {sum(lat):.2f}s for {audio_s:.2f}s audio "
          f"(RTF {sum(lat) / audio_s:.3f})")
    if args.stages:
        print("  per-stage (median first half | second half | slope):")
        for name, ts in syn.stage_times.items():
            ts = np.asarray(ts)
            h = len(ts) // 2
            sl = np.polyfit(np.arange(len(ts)), ts, 1)[0]
            print(f"    {name:5s}: {np.median(ts[:h]) * 1e3:7.1f} ms | "
                  f"{np.median(ts[h:]) * 1e3:7.1f} ms | "
                  f"{sl * 1e3:+.3f} ms/chunk  (n={len(ts)})")


if __name__ == "__main__":
    main()
