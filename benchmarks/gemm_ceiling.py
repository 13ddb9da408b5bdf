"""Measure the real MXU GEMM ceiling on this chip and calibrate the timing
harness itself.

The axon tunnel runtime MEMOIZES identical dispatches (same executable +
same input buffers -> cached result), and np.asarray of large outputs pays
a slow tunnel transfer. This script times one 32-layer
(24000,1280)@(1280,5120)@(5120,1280) bf16 chain three ways:

  A. identical-args host loop, one big-output sync   (enc_profile's old way)
  B. distinct-args host loop, scalar sync per run    (memoization-proof)
  C. in-graph lax.fori_loop repetition, (t(2R)-t(R))/R  (gold standard)

If B ~= C >> A/5-ish, memoization is real and every identical-args host
loop in the repo's benches under-reports wall time.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    rng = np.random.default_rng(0)
    m, d, f, lyr = 24000, 1280, 5120, 32
    x = jnp.asarray(rng.standard_normal((m, d)) * 0.02, jnp.bfloat16)
    w1 = jnp.asarray(rng.standard_normal((d, f)) * 0.02, jnp.bfloat16)
    w2 = jnp.asarray(rng.standard_normal((f, d)) * 0.02, jnp.bfloat16)
    flops = lyr * 2 * (2 * m * d * f)

    def chain(x, w1, w2):
        def body(x, _):
            y = (x @ w1 @ w2).astype(x.dtype)
            # keep magnitudes sane through repeated application
            return y * jax.lax.rsqrt(jnp.mean(
                y.astype(jnp.float32) ** 2) + 1e-6).astype(x.dtype), None
        return jax.lax.scan(body, x, None, length=lyr)[0]

    jchain = jax.jit(chain)

    @jax.jit
    def chain_scalar(x, w1, w2):
        return jnp.mean(chain(x, w1, w2).astype(jnp.float32))

    @jax.jit
    def chain_reps(x, w1, w2, reps):
        def body(i, x):
            # data dependency across reps XLA cannot simplify away
            return chain(x + (i.astype(jnp.bfloat16) * 1e-6), w1, w2)
        return jnp.mean(jax.lax.fori_loop(0, reps, body, x)
                        .astype(jnp.float32))

    # A: identical args, big-output sync once after 5 dispatches
    out = jchain(x, w1, w2)
    _ = np.asarray(out)
    t0 = time.perf_counter()
    for _ in range(5):
        out = jchain(x, w1, w2)
    _ = np.asarray(out)
    dt = (time.perf_counter() - t0) / 5
    print(f"A identical-args big-sync : {dt * 1e3:7.1f} ms/run = "
          f"{flops / dt / 1e12:5.0f} TFLOP/s")

    # B: distinct args, scalar sync per run
    xs = [x + i * 1e-6 for i in range(6)]
    _ = float(chain_scalar(xs[0], w1, w2))
    t0 = time.perf_counter()
    for i in range(1, 6):
        _ = float(chain_scalar(xs[i], w1, w2))
    dt = (time.perf_counter() - t0) / 5
    print(f"B distinct-args scalar    : {dt * 1e3:7.1f} ms/run = "
          f"{flops / dt / 1e12:5.0f} TFLOP/s")

    # C: in-graph repetition (distinct x offsets so no timed call can be
    # memoized against the warmup or each other)
    _ = float(chain_reps(x, w1, w2, 1))  # compile
    t0 = time.perf_counter()
    _ = float(chain_reps(x + 7e-6, w1, w2, 2))
    t2 = time.perf_counter() - t0
    t0 = time.perf_counter()
    _ = float(chain_reps(x + 9e-6, w1, w2, 6))
    t6 = time.perf_counter() - t0
    dt = (t6 - t2) / 4
    print(f"C in-graph (t6-t2)/4      : {dt * 1e3:7.1f} ms/run = "
          f"{flops / dt / 1e12:5.0f} TFLOP/s")


if __name__ == "__main__":
    main()
