"""Per-engine cold-start budget: engine.warmup() wall time and warm
first-call latency, with and without the persistent XLA compile cache.

Protocol (the cache makes compiles once-per-machine, so cold numbers need
a fresh cache dir):

    # cold: fresh cache dir
    TPU_AUDIO_XLA_CACHE=/tmp/wu_cache_$RANDOM python benchmarks/warmup_times.py --engine kokoro
    # cached: SAME dir again in a new process
    TPU_AUDIO_XLA_CACHE=<same dir>           python benchmarks/warmup_times.py --engine kokoro

Engines are built at production sizes with random weights via the
engines.py builders (shapes determine compile cost). Reference context:
the reference pays this implicitly on first use (MLX lazy tracing); under
XLA each (bucket x sampler) is an executable, so warmup() front-loads it
(VERDICT r2 weak #7).
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--engine", default="marvis",
                    choices=["orpheus", "outetts", "marvis", "cosyvoice2",
                             "funasr"])
    ap.add_argument("--full", action="store_true",
                    help="walk the production text-length buckets too")
    args = ap.parse_args()

    import jax

    from benchmarks.engines import BUILDERS, _ref_audio

    print(f"backend: {jax.default_backend()}  engine: {args.engine}",
          flush=True)
    t0 = time.perf_counter()
    eng, kw, sr = BUILDERS[args.engine](False)
    print(f"built in {time.perf_counter() - t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    timings = eng.warmup(full=args.full)
    total = time.perf_counter() - t0
    for name, dt in timings.items():
        print(f"  warmup[{name}]: {dt:7.2f}s", flush=True)
    print(f"warmup total ({'full' if args.full else 'default'}): "
          f"{total:.2f}s over {len(timings)} variants", flush=True)

    # warm first call (the post-warmup serving latency)
    t0 = time.perf_counter()
    if args.engine == "funasr":
        out = eng.transcribe(_ref_audio(5.0), **kw)
        n = len(out.text)
    else:
        res = eng.generate("Warm first call after warmup.", **kw)
        n = len(res.samples)
    print(f"warm first call: {time.perf_counter() - t0:.2f}s ({n} out)",
          flush=True)


if __name__ == "__main__":
    main()
