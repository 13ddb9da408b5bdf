"""End-to-end engine RTF benchmark — every engine, production sizes.

Fills the per-engine rows of docs/BENCHMARKS.md (the reference publishes
engine-level RTF on its hardware; BASELINE.md carries the targets). Random
weights (zero-egress environment): RTF/TTFA are architecture+shape
properties, not weight properties — token COUNTS are capped so runtimes
are comparable across runs (random logits rarely sample EOS).

    python benchmarks/engines.py --engine orpheus|outetts|marvis|
                                          cosyvoice2|funasr [--w8a8]
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


def _ref_audio(seconds: float = 5.0, sr: int = 16000) -> np.ndarray:
    t = np.arange(int(sr * seconds)) / sr
    return (0.1 * np.sin(2 * np.pi * 220 * t)
            * (1 + 0.3 * np.sin(2 * np.pi * 3 * t))).astype(np.float32)


def _synth_int8_tree(params: dict) -> dict:
    """Replace eligible matmul weights with random int8 dicts ON DEVICE
    (shape/dtype determine perf; host-side requantize of multi-GB random
    trees over the axon tunnel is pointlessly slow for a benchmark)."""
    import jax
    import jax.numpy as jnp

    from tpu_audio.ops import quant
    from tpu_audio.utils import pytree

    flat = pytree.flatten(params)
    out = {}
    key = jax.random.PRNGKey(123)
    for k, v in flat.items():
        if (k.endswith(".weight") and v.ndim in (2, 3)
                and v.shape[-1] % 128 == 0 and v.shape[-2] >= 64
                and not quant._I8_SKIP.search(k)):
            key, k1, k2 = jax.random.split(key, 3)
            prefix = k[: -len(".weight")]
            out[prefix + ".weight_i8"] = jax.random.randint(
                k1, v.shape, -127, 128, jnp.int8)
            out[prefix + ".scale_i8"] = jax.random.uniform(
                k2, (*v.shape[:-1], 1), jnp.float32, 0.001, 0.02)
        else:
            out[k] = v
    return quant.fuse_int8_tree(pytree.unflatten(out))


# ---------------------------------------------------------------- builders

def build_orpheus(w8a8: bool):
    import jax

    from tpu_audio.codecs import snac
    from tpu_audio.models.orpheus import model as omodel
    from tpu_audio.models.orpheus.engine import OrpheusEngine
    from tpu_audio.nn import transformer
    cfg = omodel.LLAMA_3B
    params = transformer.init_params(jax.random.PRNGKey(SEED), cfg,
                                     dtype=jax.numpy.bfloat16)
    if w8a8:
        params = _synth_int8_tree(params)
    snac_cfg = snac.SNACConfig()
    snac_params = snac.init_params(jax.random.PRNGKey(SEED + 1), snac_cfg)
    eng = OrpheusEngine.from_params(params, cfg, snac_params, snac_cfg,
                                    max_cache=1024)
    return eng, dict(max_new_tokens=224), eng.sample_rate


def build_outetts(w8a8: bool):
    import jax

    from tpu_audio.codecs.dac import model as dac
    from tpu_audio.models.outetts.engine import OuteTTSEngine
    from tpu_audio.nn import transformer
    from tpu_audio.ops import quant

    cfg = transformer.TransformerConfig(
        dim=2048, n_layers=16, n_heads=32, n_kv_heads=8, hidden_dim=8192,
        vocab_size=134400, rope_theta=500000.0,
        rope_scaling={"rope_type": "llama3", "factor": 32.0,
                      "low_freq_factor": 1.0, "high_freq_factor": 4.0,
                      "original_max_position_embeddings": 8192})
    params = transformer.init_params(jax.random.PRNGKey(SEED), cfg,
                                     dtype=jax.numpy.bfloat16)
    if w8a8:
        params = _synth_int8_tree(params)
    dac_cfg = dac.DACConfig()
    dac_params = dac.init_params(jax.random.PRNGKey(SEED + 1), dac_cfg)
    eng = OuteTTSEngine.from_params(params, cfg, dac_params, dac_cfg,
                                    max_cache=2048)
    return eng, dict(max_new_tokens=512), eng.sample_rate


def build_marvis(w8a8: bool):
    import jax

    from tpu_audio.codecs.mimi import model as mimi
    from tpu_audio.models.marvis import model as mmodel
    from tpu_audio.models.marvis.engine import MarvisEngine

    cfg = mmodel.MarvisConfig()
    params = mmodel.init_params(jax.random.PRNGKey(SEED), cfg,
                                dtype=jax.numpy.bfloat16)
    if w8a8:
        # quantize the backbone + depth-decoder stacks only (the frame loop
        # re-reads the decoder weights 31x per frame)
        params = dict(params,
                      backbone=_synth_int8_tree(params["backbone"]),
                      decoder=_synth_int8_tree(params["decoder"]))
    mimi_cfg = mimi.MimiConfig()
    mimi_params = mimi.init_params(jax.random.PRNGKey(SEED + 1), mimi_cfg)
    eng = MarvisEngine.from_params(params, cfg, mimi_params, mimi_cfg,
                                   max_frames=50)  # 4 s at 12.5 Hz
    return eng, {}, eng.sample_rate


def build_cosyvoice2(w8a8: bool):
    import jax

    from tpu_audio.codecs import s3tokenizer
    from tpu_audio.codecs.s3gen import model as s3gen
    from tpu_audio.models.cosyvoice2 import lm as lm_mod
    from tpu_audio.models.cosyvoice2.engine import CosyVoice2Engine
    from tpu_audio.ops import quant

    lm_cfg = lm_mod.CosyLMConfig()
    lm_params = lm_mod.init_params(jax.random.PRNGKey(SEED), lm_cfg,
                                   dtype=jax.numpy.bfloat16)
    if w8a8:
        lm_params = _synth_int8_tree(lm_params)
    s3_cfg = s3gen.S3GenConfig()
    s3_params = s3gen.init_params(jax.random.PRNGKey(SEED + 1), s3_cfg)
    tok_cfg = s3tokenizer.S3TokenizerConfig()
    tok_params = s3tokenizer.init_params(jax.random.PRNGKey(SEED + 2), tok_cfg)
    eng = CosyVoice2Engine.from_params(lm_params, lm_cfg, s3_params, s3_cfg,
                                       tok_params, tok_cfg, max_cache=1024)
    return eng, {}, eng.sample_rate


def build_funasr(w8a8: bool):
    import jax

    from tpu_audio.api.stt_funasr import FunASREngine
    from tpu_audio.models.funasr import model as fmodel
    from tpu_audio.ops import quant

    cfg = fmodel.FunASRConfig()
    params = fmodel.init_params(jax.random.PRNGKey(SEED), cfg,
                                dtype=jax.numpy.bfloat16)
    if w8a8:
        params = _synth_int8_tree(params)
    eng = FunASREngine.from_params(params, cfg, max_cache=1024)
    return eng, {}, 16000


def build_chatterbox(w8a8: bool):
    from benchmarks.chatterbox_stages import build_engine

    eng = build_engine(full=False)
    return eng, dict(max_new_tokens=96), eng.sample_rate


def build_chatterbox_turbo(w8a8: bool):
    import jax

    from tpu_audio.codecs import s3tokenizer
    from tpu_audio.codecs.s3gen import conformer, flow
    from tpu_audio.codecs.s3gen import model as s3gen
    from tpu_audio.models.chatterbox import voice_encoder as ve
    from tpu_audio.models.chatterbox_turbo import model as turbo
    from tpu_audio.models.chatterbox_turbo.engine import ChatterboxTurboEngine

    t3_cfg = turbo.T3TurboConfig()
    s3_cfg = s3gen.S3GenConfig(
        conformer=conformer.ConformerConfig(num_blocks=2, num_up_blocks=1),
        estimator=flow.EstimatorConfig(num_mid_blocks=3),
        cfm=flow.CFMConfig(n_timesteps=2))  # meanflow few-step
    tok_cfg = s3tokenizer.S3TokenizerConfig(n_audio_layer=2)
    ve_cfg = ve.VoiceEncConfig()
    t3_params = turbo.init_params(jax.random.PRNGKey(SEED), t3_cfg)
    s3_params = s3gen.init_params(jax.random.PRNGKey(SEED + 1), s3_cfg)
    tok_params = s3tokenizer.init_params(jax.random.PRNGKey(SEED + 2),
                                         tok_cfg)
    ve_params = ve.init_params(jax.random.PRNGKey(SEED + 3), ve_cfg)
    eng = ChatterboxTurboEngine.from_turbo_params(
        t3_params, t3_cfg, s3_params, s3_cfg, tok_params, tok_cfg, ve_params,
        ve_cfg, max_cache=1024)
    return eng, dict(max_new_tokens=96), eng.sample_rate


BUILDERS = {
    "orpheus": build_orpheus,
    "outetts": build_outetts,
    "marvis": build_marvis,
    "cosyvoice2": build_cosyvoice2,
    "funasr": build_funasr,
    "chatterbox": build_chatterbox,
    "chatterbox_turbo": build_chatterbox_turbo,
}


# ---------------------------------------------------------------- runners

def run_tts(eng, kw: dict, sr: int) -> None:
    for run in range(WARMUP + RUNS):
        t0 = time.perf_counter()
        ttfa = None
        parts = []
        for chunk in eng.generate_streaming(TEXT, **kw):
            if ttfa is None and len(chunk.samples):
                ttfa = time.perf_counter() - t0
            parts.append(chunk.samples)
        total = time.perf_counter() - t0
        audio = np.concatenate(parts) if parts else np.zeros(1, np.float32)
        dur = max(len(audio) / sr, 1e-6)
        tag = "warmup" if run < WARMUP else f"run {run - WARMUP + 1}"
        spec = getattr(getattr(eng, "lm", None), "last_spec_stats", None)
        spec_s = (f"  spec α={spec['accept_rate']:.2f} "
                  f"({spec['accepted']}/{spec['drafted']} over "
                  f"{spec['iterations']} iters)" if spec else "")
        print(f"[{tag}] total {total:.2f}s  audio {dur:.2f}s  "
              f"RTF {total / dur:.3f}  TTFA {ttfa if ttfa else -1:.2f}s"
              f"{spec_s}", flush=True)


def run_ttfa(eng, kw: dict, sr: int, runs: int = 20) -> None:
    """p50/p90 time-to-first-audio over `runs` streaming starts (VERDICT r3
    #7; BASELINE bar: p50 < 300 ms). Each run abandons the stream after the
    first non-empty chunk — TTFA is a cold-start property, the rest of the
    stream is the RTF benchmark's job."""
    ttfas = []
    for run in range(WARMUP + runs):
        t0 = time.perf_counter()
        for chunk in eng.generate_streaming(TEXT, **kw):
            if len(chunk.samples):
                break
        dt = time.perf_counter() - t0
        if run >= WARMUP:
            ttfas.append(dt)
        if hasattr(eng, "stop"):
            try:
                eng.stop()  # cancel the abandoned stream; the locked
            except Exception:  # wrapper clears the flag on the next start
                pass
    arr = np.sort(np.asarray(ttfas))
    p50 = float(np.percentile(arr, 50))
    p90 = float(np.percentile(arr, 90))
    print(f"TTFA over {len(arr)} runs: p50 {p50 * 1e3:.0f} ms  "
          f"p90 {p90 * 1e3:.0f} ms  min {arr[0] * 1e3:.0f} ms  "
          f"max {arr[-1] * 1e3:.0f} ms  (target p50 < 300 ms)", flush=True)


def run_stt(eng, kw: dict, sr: int) -> None:
    audio = _ref_audio(seconds=10.0, sr=sr)
    # random weights never sample EOS, so an uncapped run decodes the full
    # max_new budget (256 tokens ≈ a minute of speech text) — cap at the
    # realistic output length for 10 s of speech (~30 words ≈ 48 tokens)
    # so the measured decode matches production behavior
    for run in range(WARMUP + RUNS):
        t0 = time.perf_counter()
        res = eng.transcribe(audio, max_new_tokens=48)
        total = time.perf_counter() - t0
        tag = "warmup" if run < WARMUP else f"run {run - WARMUP + 1}"
        print(f"[{tag}] 10.0s audio in {total:.2f}s -> {10.0 / total:.1f}x RT"
              f"  ({len(res.text)} chars)", flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--engine", required=True, choices=sorted(BUILDERS))
    ap.add_argument("--w8a8", action="store_true",
                    help="serve the LLM core in the int8 W8A8 format")
    ap.add_argument("--ttfa", action="store_true",
                    help="measure p50/p90 time-to-first-audio over 20 "
                         "streaming starts instead of full-run RTF")
    ap.add_argument("--spec", choices=["ngram"], default=None,
                    help="engine-level speculative decoding (VERDICT r3 #4:"
                         " prove the projection table END-TO-END — prints "
                         "the measured accept rate per run)")
    args = ap.parse_args()

    import jax

    print(f"backend: {jax.default_backend()}  engine: {args.engine}"
          f"{' w8a8' if args.w8a8 else ''}", flush=True)
    t0 = time.perf_counter()
    eng, kw, sr = BUILDERS[args.engine](args.w8a8)
    if args.spec:
        if not hasattr(eng, "speculative"):
            raise SystemExit(f"{args.engine} has no speculative option")
        eng.speculative = args.spec
    print(f"built in {time.perf_counter() - t0:.1f}s", flush=True)

    if args.engine == "funasr":
        run_stt(eng, kw, sr)
    elif args.ttfa:
        run_ttfa(eng, kw, sr)
    else:
        run_tts(eng, kw, sr)


if __name__ == "__main__":
    main()
