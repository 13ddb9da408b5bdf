"""Fused whole-stack decode kernel: on-chip ablation (plain XLA scan vs
ops/pallas/fused_step.py) for every engine family that serves it.

Measures, at production sizes with random weights:
  - Marvis 250M: full frame (backbone step + 31-codebook depth decode),
    plain vs depth-fused vs fully-fused (backbone too), bf16 and w8a8
  - CosyVoice2/3 0.5B Qwen2 LM: ms/token, plain vs fused, bf16 and w8a8
  - FunASR Qwen3-0.6B: ms/token, plain vs fused

Timing uses host-synced end-to-end loops (np.asarray on a small output)
per the tunnel measurement rules (docs/BENCHMARKS.md).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from tpu_audio.nn import transformer


def timeit(fn, *args, warmup=2, iters=8):
    for _ in range(warmup):
        np.asarray(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = np.asarray(fn(*args))
    return (time.perf_counter() - t0) / iters, out


def bench_lm(name, qcfg, quantize: bool, steps: int = 64):
    """ms/token of a compiled `steps`-token greedy rollout, plain vs
    fused cache (same jitted loop body, cache type switches the path)."""
    from tpu_audio.ops import quant

    params = transformer.init_params(jax.random.PRNGKey(0), qcfg,
                                     dtype=jnp.bfloat16)
    if quantize:
        params = quant.fuse_int8_tree(quant.quantize_tree_int8(
            params, predicate=lambda k, v: "layers" in k))
    else:
        params = transformer.fuse_fp_tree(params)

    s_max = 512

    def rollout(params, cache):
        def body(carry, _):
            tok, cache = carry
            lg, cache = transformer.forward(params, qcfg, tok, cache)
            nxt = jnp.argmax(lg[:, -1], -1).astype(jnp.int32)[:, None]
            return (nxt, cache), nxt[0, 0]
        (_, _), toks = jax.lax.scan(
            body, (jnp.ones((1, 1), jnp.int32), cache), None, length=steps)
        return toks

    roll = jax.jit(rollout)
    for mode in ("plain", "fused"):
        if mode == "fused":
            if not transformer.fused_decode_supported(qcfg, params):
                print(f"  {name} [{mode}]: unsupported "
                      f"(gate/probe declined)", flush=True)
                continue
            cache = transformer.make_fused_cache(qcfg, s_max)
        else:
            cache = transformer.make_cache(qcfg, 1, s_max)
        try:
            dt, toks = timeit(roll, params, cache, warmup=1, iters=4)
            print(f"  {name} [{mode}{'/w8a8' if quantize else '/bf16'}]: "
                  f"{dt / steps * 1e3:.3f} ms/token "
                  f"({steps / dt:.0f} tok/s)", flush=True)
        except Exception as exc:
            print(f"  {name} [{mode}]: FAILED {exc}", flush=True)


def bench_marvis(quantization=None):
    from tpu_audio.codecs import mimi
    from tpu_audio.models.marvis import model as mmodel
    from tpu_audio.models.marvis.engine import MarvisEngine

    cfg = mmodel.MarvisConfig()
    params = mmodel.init_params(jax.random.PRNGKey(0), cfg,
                                dtype=jnp.bfloat16)
    mimi_cfg = mimi.MimiConfig()
    mimi_params = mimi.init_params(jax.random.PRNGKey(1), mimi_cfg)

    q = f"/{quantization}" if quantization else "/bf16"
    for mode, env in (("plain", {"TPU_AUDIO_FUSED_DEPTH": "0"}),
                      ("depth-fused", {"TPU_AUDIO_FUSED_DEPTH": "1",
                                       "TPU_AUDIO_FUSED_BB": "0"}),
                      ("fully-fused", {"TPU_AUDIO_FUSED_DEPTH": "1",
                                       "TPU_AUDIO_FUSED_BB": "1"})):
        os.environ.update(env)
        try:
            eng = MarvisEngine.from_params(params, cfg, mimi_params,
                                           mimi_cfg, max_frames=64,
                                           quantization=quantization)
            eng.quality = "high"
            eng.temperature = 0.9
            t0 = time.perf_counter()
            res = eng.generate("This is a benchmark of the fused marvis "
                               "frame loop on the real chip.")
            dt = time.perf_counter() - t0
            dur = len(res.samples) / eng.sample_rate
            print(f"  marvis [{mode}{q}]: {dt:.2f} s for {dur:.2f} s audio "
                  f"-> RTF {dt / max(dur, 1e-9):.3f}", flush=True)
        except Exception as exc:
            print(f"  marvis [{mode}{q}]: FAILED {exc}", flush=True)
        finally:
            for k in env:
                os.environ.pop(k, None)


def bench_whisper_step(steps: int = 32):
    """Single-stream whisper w8a8 decode step: plain XLA vs the fused
    whole-decoder kernel (TPU_AUDIO_FUSED_WHISPER toggles the gate at
    trace time — two separate jitted rollouts)."""
    import jax.numpy as jnp

    from tpu_audio.models.whisper import load as wload
    from tpu_audio.models.whisper import model as wmodel
    from tpu_audio.models.whisper.config import PRESETS

    cfg = PRESETS["large-v3-turbo"]
    params = wload.serve_tree_int8(
        wmodel.init_params(jax.random.PRNGKey(0), cfg, dtype=jnp.bfloat16),
        encoder=False)
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal(
        (1, cfg.n_audio_ctx, cfg.n_audio_state)) * 0.3, jnp.bfloat16)

    state0 = jax.jit(lambda p, f: wmodel.init_state(
        p, cfg, f, dtype=jnp.bfloat16, kv_int8=True))(params, feats)

    for mode, env in (("plain", "0"), ("fused", "1")):
        os.environ["TPU_AUDIO_FUSED_WHISPER"] = env

        @jax.jit
        def roll(p, state):
            def body(i, carry):
                tok, state, acc = carry
                lg, state = wmodel.decode_step(p, cfg, tok, state)
                nxt = jnp.argmax(lg[:, -1], -1).astype(jnp.int32)[:, None]
                return nxt, state, acc + lg[0, -1, 0].astype(jnp.float32)

            tok0 = jnp.full((1, 1), 50258, jnp.int32)
            _, _, acc = jax.lax.fori_loop(0, steps, body,
                                          (tok0, state, jnp.float32(0)))
            return acc

        try:
            dt, _ = timeit(roll, params, state0, warmup=1, iters=4)
            print(f"  whisper-l3t single-stream w8a8 [{mode}]: "
                  f"{dt / steps * 1e3:.3f} ms/step", flush=True)
        except Exception as exc:
            print(f"  whisper step [{mode}]: FAILED {exc}", flush=True)
    os.environ.pop("TPU_AUDIO_FUSED_WHISPER", None)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-marvis", action="store_true")
    ap.add_argument("--steps", type=int, default=64)
    args = ap.parse_args()

    print(f"backend: {jax.default_backend()}", flush=True)

    qwen05 = transformer.TransformerConfig(  # CosyVoice2/3 Qwen2.5-0.5B
        dim=896, n_layers=24, n_heads=14, n_kv_heads=2, head_dim=64,
        hidden_dim=4864, vocab_size=151936, attn_qkv_bias=True,
        rope_theta=1000000.0, tie_word_embeddings=True)
    qwen06 = transformer.TransformerConfig(  # FunASR Qwen3-0.6B
        dim=1024, n_layers=28, n_heads=16, n_kv_heads=8, head_dim=128,
        hidden_dim=3072, vocab_size=151936, qk_norm=True,
        rope_theta=1000000.0, tie_word_embeddings=True)

    llama1b = transformer.TransformerConfig(  # OuteTTS Llama-3.2-1B
        dim=2048, n_layers=16, n_heads=32, n_kv_heads=8, head_dim=64,
        hidden_dim=8192, vocab_size=128256, rope_theta=500000.0,
        rope_scaling={"rope_type": "llama3", "factor": 32.0,
                      "low_freq_factor": 1.0, "high_freq_factor": 4.0,
                      "original_max_position_embeddings": 8192},
        tie_word_embeddings=True)
    llama3b = transformer.TransformerConfig(  # Orpheus Llama-3.2-3B
        dim=3072, n_layers=28, n_heads=24, n_kv_heads=8, head_dim=128,
        hidden_dim=8192, vocab_size=128256, rope_theta=500000.0,
        rope_scaling={"rope_type": "llama3", "factor": 32.0,
                      "low_freq_factor": 1.0, "high_freq_factor": 4.0,
                      "original_max_position_embeddings": 8192})

    for quantize in (False, True):
        bench_lm("qwen2.5-0.5B (CosyVoice2/3)", qwen05, quantize,
                 steps=args.steps)
    bench_lm("qwen3-0.6B (FunASR)", qwen06, False, steps=args.steps)
    # grouped-layout territory (1B/3B); w8a8 is the serving format
    bench_lm("llama-1B (OuteTTS)", llama1b, True, steps=args.steps)
    bench_lm("llama-3B (Orpheus)", llama3b, True, steps=args.steps)

    bench_whisper_step()

    if not args.skip_marvis:
        bench_marvis(None)
        bench_marvis("w8a8")


if __name__ == "__main__":
    main()
