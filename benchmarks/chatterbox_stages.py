"""Chatterbox pipeline stage benchmark.

Mirrors the reference's benchmark-as-test machinery
(package/Tests/ChatterboxBenchmark.swift:30-229): fixed seed 42, 1 warmup +
3 timed runs, per-stage timers (prepare_conditionals, text_tokenization,
t3_inference, s3gen_waveform, total), prints average RTF. Runs on random
weights in offline environments (stage COSTS are architecture properties).

    python benchmarks/chatterbox_stages.py [--full]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")

SEED = 42
WARMUP = 1
RUNS = 3
TEXT = ("The quick brown fox jumps over the lazy dog while the sun sets "
        "behind the distant mountains.")


def build_engine(full: bool):
    import jax

    from tpu_audio.codecs import s3tokenizer
    from tpu_audio.codecs.s3gen import conformer, flow
    from tpu_audio.codecs.s3gen import model as s3gen
    from tpu_audio.models.chatterbox import t3 as t3mod
    from tpu_audio.models.chatterbox import voice_encoder as ve
    from tpu_audio.models.chatterbox.engine import ChatterboxEngine
    from tpu_audio.nn import transformer

    if full:
        t3_cfg = t3mod.T3Config()
        s3_cfg = s3gen.S3GenConfig()
        tok_cfg = s3tokenizer.S3TokenizerConfig()
        ve_cfg = ve.VoiceEncConfig()
        max_cache = 2048
    else:
        t3_cfg = t3mod.T3Config(
            llama=transformer.TransformerConfig(dim=256, n_layers=6,
                                                n_heads=8, n_kv_heads=8,
                                                hidden_dim=1024),
            speaker_embed_size=256, perceiver_tokens=32)
        s3_cfg = s3gen.S3GenConfig(
            conformer=conformer.ConformerConfig(num_blocks=2, num_up_blocks=1),
            estimator=flow.EstimatorConfig(num_mid_blocks=3),
            cfm=flow.CFMConfig(n_timesteps=10))
        tok_cfg = s3tokenizer.S3TokenizerConfig(n_audio_layer=2)
        ve_cfg = ve.VoiceEncConfig()
        max_cache = 1024

    t3_params = t3mod.init_params(jax.random.PRNGKey(SEED), t3_cfg)
    s3_params = s3gen.init_params(jax.random.PRNGKey(SEED + 1), s3_cfg)
    tok_params = s3tokenizer.init_params(jax.random.PRNGKey(SEED + 2), tok_cfg)
    ve_params = ve.init_params(jax.random.PRNGKey(SEED + 3), ve_cfg)
    return ChatterboxEngine.from_params(
        t3_params, t3_cfg, s3_params, s3_cfg, tok_params, tok_cfg, ve_params,
        ve_cfg, max_cache=max_cache)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true",
                    help="full 520M/mid-12 sizes (long first compile)")
    args = ap.parse_args()

    from tpu_audio.models.chatterbox import t3 as t3mod
    from tpu_audio.models.chatterbox.engine import punc_norm
    from tpu_audio.utils.profiling import Profiler

    eng = build_engine(args.full)
    prof = Profiler()
    rng = np.random.default_rng(SEED)
    ref = (0.1 * np.sin(2 * np.pi * 220 * np.arange(16000 * 5) / 16000)
           ).astype(np.float32)

    results = []
    for run in range(WARMUP + RUNS):
        prof.reset()
        t_total = time.perf_counter()

        with prof.time("prepare_conditionals"):
            cond = eng.prepare_conditionals(ref, 16000)

        with prof.time("text_tokenization"):
            norm = punc_norm(TEXT)
            ids = ([eng.t3_cfg.start_text_token]
                   + [min(i, eng.t3_cfg.text_tokens_dict_size - 1)
                      for i in eng.tokenizer.encode(norm)]
                   + [eng.t3_cfg.stop_text_token])

        with prof.time("t3_inference"):
            cond_emb = t3mod.prepare_conditioning(
                eng.t3_params, eng.t3_cfg, cond.speaker_emb,
                cond.t3_cond_tokens, cond.exaggeration)
            speech = eng.t3_gen.generate(
                cond_emb, ids,
                sampler=t3mod.T3SamplerConfig(), max_new=256, seed=SEED)

        with prof.time("s3gen_waveform"):
            audio = eng._token2wav(np.asarray(speech, np.int32), cond, SEED)

        total = time.perf_counter() - t_total
        dur = max(len(audio) / 24000, 1e-6)
        if run >= WARMUP:
            results.append((prof.summary(), total, dur))
        tag = "warmup" if run < WARMUP else f"run {run - WARMUP + 1}"
        print(f"[{tag}] total {total:.2f}s, audio {dur:.2f}s")

    print("\n=== averages over", RUNS, "runs (seed", SEED, ") ===")
    for stage in ("prepare_conditionals", "text_tokenization", "t3_inference",
                  "s3gen_waveform"):
        avg = np.mean([s[stage]["total_s"] for s, _, _ in results])
        print(f"  {stage:22s} {avg * 1e3:9.1f} ms")
    avg_total = np.mean([t for _, t, _ in results])
    avg_dur = np.mean([d for _, _, d in results])
    print(f"  {'total':22s} {avg_total * 1e3:9.1f} ms")
    print(f"  avg RTF: {avg_total / avg_dur:.4f} "
          f"({avg_dur / avg_total:.1f}x real time)")


if __name__ == "__main__":
    main()
