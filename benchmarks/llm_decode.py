"""LLM decode throughput benchmark (the Orpheus/Qwen TTS serving path).

Measures per-token decode latency of the shared transformer stack
(nn/transformer scan + whole-stack KV cache + on-device sampling loop) at
production sizes. Orpheus-3B needs ~83 speech tokens/s of audio, so
tokens/s directly bounds TTS RTF for the LLM stage.

    python benchmarks/llm_decode.py [--model 3b|1b|0.5b] [--tokens N]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")

SIZES = {
    # dim, layers, heads, kv, hidden, vocab
    "3b": (3072, 28, 24, 8, 8192, 128266),   # Orpheus (Llama-3.2-3B)
    "1b": (2048, 16, 32, 8, 8192, 134400),   # OuteTTS (Llama-3.2-1B)
    "0.5b": (896, 24, 14, 2, 4864, 151936),  # CosyVoice2 (Qwen2.5-0.5B)
    "tiny": (128, 2, 4, 2, 256, 512),        # CPU smoke tests only
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="3b", choices=sorted(SIZES))
    ap.add_argument("--tokens", type=int, default=128)
    ap.add_argument("--prompt", type=int, default=64)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--q4", action="store_true",
                    help="int4 weights via the fused Pallas dequant-matmul")
    ap.add_argument("--w8a8", action="store_true",
                    help="per-channel int8 weights + int8 activations via "
                         "the MXU-native Pallas int8 matmul")
    ap.add_argument("--w4a8", action="store_true",
                    help="group-affine int4 weights unpacked to int8 "
                         "in-kernel + int8 activations (0.5 B/weight)")
    ap.add_argument("--w4a8sg", action="store_true",
                    help="super-group signed int4 (one f32 scale / 256 "
                         "cols): k=128 nibble-plane MXU dots")
    ap.add_argument("--greedy", action="store_true",
                    help="temperature 0 (isolates sampler cost)")
    ap.add_argument("--spec", default="off",
                    choices=["off", "ngram", "1b", "0.5b", "self"],
                    help="speculative decoding: n-gram self-draft, a "
                         "smaller draft model (same vocab, random init), "
                         "or 'self' (draft == target; realizes the "
                         "accept-rate=1 upper bound end-to-end)")
    ap.add_argument("--gamma", type=int, default=8,
                    help="drafted tokens per speculative iteration")
    ap.add_argument("--serve", action="store_true",
                    help="continuous-batching serving benchmark: Poisson "
                         "arrivals into api.serving.ContinuousBatcher at "
                         "--load of measured capacity")
    ap.add_argument("--span", type=int, default=16,
                    help="--serve: decode-span length between admissions")
    ap.add_argument("--requests", type=int, default=32,
                    help="--serve: requests per phase")
    ap.add_argument("--load", type=float, default=0.5,
                    help="--serve: offered load as a fraction of saturated "
                         "capacity")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from tpu_audio.nn import transformer
    from tpu_audio.ops import decoding, sampling

    dim, layers, heads, kv, hidden, vocab = SIZES[args.model]
    cfg = transformer.TransformerConfig(
        dim=dim, n_layers=layers, n_heads=heads, n_kv_heads=kv,
        hidden_dim=hidden, vocab_size=vocab)
    print(f"backend: {jax.default_backend()}  model: {args.model} "
          f"({dim}d x {layers}L, vocab {vocab})")

    t0 = time.perf_counter()
    kind = ("q4" if args.q4 else "w8a8" if args.w8a8
            else "w4a8" if args.w4a8 else "w4a8sg" if args.w4a8sg
            else "bf16")

    def synth_params(cfg):
        """Random params at production shapes/dtypes (perf depends only on
        shapes), with quantized leaves per --q4/--w8a8/--w4a8."""
        params = transformer.init_params(jax.random.PRNGKey(0), cfg,
                                         dtype=jnp.bfloat16)
        if kind == "bf16":
            return params
        dim, hidden, vocab = cfg.dim, cfg.hidden_dim, cfg.vocab_size

        def q4_leaf(key, shape):
            o, i = shape[-2], shape[-1]
            lead = shape[:-2]
            return {
                "weight_q4": jax.random.bits(key, (*lead, o, i // 8),
                                             jnp.uint32),
                "scales": jax.random.uniform(key, (*lead, o, i // 64),
                                             jnp.float32, 0.001, 0.02),
                "biases": jax.random.normal(key, (*lead, o, i // 64),
                                            jnp.float32) * 0.01,
            }

        def i8_leaf(key, shape):
            o, i = shape[-2], shape[-1]
            lead = shape[:-2]
            return {
                "weight_i8": jax.random.randint(key, (*lead, o, i), -127,
                                                128, jnp.int8),
                "scale_i8": jax.random.uniform(key, (*lead, o, 1),
                                               jnp.float32, 0.001, 0.02),
            }

        def q4p_leaf(key, shape):
            o, i = shape[-2], shape[-1]
            lead = shape[:-2]
            return {
                "weight_q4p": jax.random.randint(key, (*lead, o, i // 2),
                                                 -128, 128, jnp.int8),
                "scales": jax.random.uniform(key, (*lead, o, i // 64),
                                             jnp.float32, 0.001, 0.02),
                "biases": jax.random.normal(key, (*lead, o, i // 64),
                                            jnp.float32) * 0.01,
            }

        def q4s_leaf(key, shape):
            o, i = shape[-2], shape[-1]
            lead = shape[:-2]
            return {
                "weight_q4s": jax.random.randint(key, (*lead, o, i // 2),
                                                 -128, 128, jnp.int8),
                "scales_sg": jax.random.uniform(key, (*lead, o, i // 256),
                                                jnp.float32, 0.001, 0.02),
            }

        leaf = {"q4": q4_leaf, "w8a8": i8_leaf, "w4a8": q4p_leaf,
                "w4a8sg": q4s_leaf}[kind]
        k = jax.random.PRNGKey(7)
        L = cfg.n_layers
        lay = params["layers"]
        hd = cfg.hd
        for name, shape in (("q", (L, cfg.n_heads * hd, dim)),
                            ("k", (L, cfg.kv_heads * hd, dim)),
                            ("v", (L, cfg.kv_heads * hd, dim)),
                            ("o", (L, dim, cfg.n_heads * hd))):
            lay["attn"][name] = leaf(jax.random.fold_in(k, hash(name) % 97),
                                     shape)
        for name, shape in (("gate", (L, hidden, dim)),
                            ("up", (L, hidden, dim)),
                            ("down", (L, dim, hidden))):
            lay["mlp"][name] = leaf(jax.random.fold_in(k, hash(name) % 89),
                                    shape)
        params["lm_head"] = leaf(jax.random.fold_in(k, 3), (vocab, dim))
        if kind == "w8a8":
            from tpu_audio.ops import quant
            params = quant.fuse_int8_tree(params)
        elif kind == "w4a8":
            from tpu_audio.ops import quant
            params = quant.fuse_w4a8_tree(params)
        elif kind == "w4a8sg":
            from tpu_audio.ops import quant
            params = quant.fuse_w4a8_sg_tree(params)
        return params

    params = synth_params(cfg)
    n_params = sum(int(np.prod(x.shape))
                   for x in jax.tree_util.tree_leaves(params))
    np.asarray(np.asarray(jax.tree_util.tree_leaves(params)[0])[:1])  # sync
    gb = sum(x.size * x.dtype.itemsize
             for x in jax.tree_util.tree_leaves(params)) / 1e9
    print(f"init {n_params / 1e9:.2f}B params ({gb:.1f} GB "
          f"{kind}) in {time.perf_counter() - t0:.1f}s")

    if args.serve:
        _run_serve(args, cfg, params)
        return
    if args.spec != "off":
        _run_spec(args, cfg, params, gb, synth_params)
        return

    max_len = args.prompt + args.tokens + 8
    sampler = (sampling.SamplerConfig(temperature=0.0) if args.greedy
               else sampling.SamplerConfig(temperature=0.8, top_k=50))

    B = args.batch

    def fn(params, prompt, key):
        cache = transformer.make_cache(cfg, B, max_len)
        logits, cache = transformer.forward(params, cfg, prompt, cache)

        def step(tok, cache):
            lg, cache = transformer.forward(params, cfg, tok, cache)
            return lg[:, -1], cache

        k1, k2 = jax.random.split(key)
        first = sampling.sample(k1, logits[:, -1], sampler)
        res = decoding.decode_loop(k2, step, cache, first, args.tokens,
                                   eos_ids=(vocab - 1,), sampler=sampler)
        return res.tokens, res.lengths

    jfn = jax.jit(fn)
    prompt = jnp.asarray(np.random.default_rng(0).integers(
        0, vocab, (B, args.prompt)), jnp.int32)

    t0 = time.perf_counter()
    toks, lens = jfn(params, prompt, jax.random.PRNGKey(1))
    np.asarray(toks)  # block_until_ready is async-unsafe over the axon tunnel
    print(f"compile+first: {time.perf_counter() - t0:.1f}s")

    runs = 3
    n_gen = 0
    t0 = time.perf_counter()
    for i in range(runs):
        toks, lens = jfn(params, prompt, jax.random.PRNGKey(2 + i))
        np.asarray(toks)
        n_gen += max(int(np.asarray(lens).sum()), 1)
    dt = (time.perf_counter() - t0) / runs
    per_tok = dt * runs / n_gen
    print(f"batch {B}: {args.tokens} steps in {dt * 1000:.0f} ms -> "
          f"{per_tok * 1000:.2f} ms/token aggregate "
          f"({1 / per_tok:.0f} tok/s)")
    bw = gb / (per_tok * B)  # weights are read once per STEP, not per token
    print(f"effective weight bandwidth {bw:.0f} GB/s "
          f"(v5e HBM ~819 GB/s -> {bw / 819 * 100:.0f}% of roofline)")


def _run_serve(args, cfg, params) -> None:
    """Continuous-batching serving benchmark (VERDICT r2 next-round #5).

    Three phases on ONE batcher (so the admit/span graphs compile once):
      warmup   — B requests, compiles both graphs;
      saturated — all --requests submitted at t=0: the rolling-admission
                  ceiling (static batch-B with refills, no head-of-line
                  blocking);
      poisson  — arrivals at --load × saturated capacity; reports
                  occupancy, busy-normalized throughput vs the ceiling,
                  and TTFT/completion percentiles.
    """
    import jax

    from tpu_audio.api.serving import ContinuousBatcher, Request
    from tpu_audio.models.orpheus.model import CausalLMGenerator
    from tpu_audio.ops import sampling

    vocab = cfg.vocab_size
    B, span, n_req, max_new = args.batch, args.span, args.requests, args.tokens
    sampler = sampling.SamplerConfig(temperature=0.8, top_k=50)
    # ring must cover all three phases: pos advances by `span` per step
    need = (B + 2 * n_req) * (max_new + span) // B + 4 * args.prompt + 512
    gen = CausalLMGenerator(params, cfg, max_cache=need)
    batcher = ContinuousBatcher(gen, batch=B, span=span, sampler=sampler,
                                eos_ids=(vocab - 1,), prompt_bucket=64)
    rng = np.random.default_rng(0)

    def make_reqs(n):
        return [Request(list(rng.integers(0, vocab, args.prompt)),
                        max_new=max_new) for _ in range(n)]

    print(f"serve: batch {B}, span {span}, {n_req} req x {max_new} tok, "
          f"ring {need}")
    t0 = time.perf_counter()
    for r in make_reqs(B):
        batcher.submit(r)
    batcher.run_until_idle()
    batcher.completed.clear()
    print(f"warmup (compile admit+span): {time.perf_counter() - t0:.1f}s")

    # --- saturated: all requests queued up front ---------------------------
    occ_sat = []
    reqs = make_reqs(n_req)
    t0 = time.perf_counter()
    for r in reqs:
        batcher.submit(r)
    while batcher.step():
        occ_sat.append(int(batcher.active.sum()))
    sat_wall = time.perf_counter() - t0
    sat_tok = sum(len(r.tokens) for r in reqs)
    cap = sat_tok / sat_wall
    batcher.completed.clear()
    print(f"saturated: {sat_tok} tok in {sat_wall:.2f}s = {cap:.0f} tok/s "
          f"aggregate (mean occupancy {np.mean(occ_sat):.1f}/{B})")

    # --- poisson arrivals at --load × capacity -----------------------------
    lam = args.load * cap / max_new  # requests/s
    arr = np.cumsum(rng.exponential(1 / lam, n_req))
    reqs = make_reqs(n_req)
    occ, t0 = [], time.perf_counter()
    i = 0
    while True:
        now = time.perf_counter() - t0
        while i < n_req and arr[i] <= now:
            batcher.submit(reqs[i])
            i += 1
        more = batcher.step()
        if batcher.active.any() or more:
            occ.append(int(batcher.active.sum()))
        if not more and i < n_req:
            time.sleep(max(0.0, arr[i] - (time.perf_counter() - t0)))
        elif not more and i >= n_req:
            break
    wall = time.perf_counter() - t0
    tok = sum(len(r.tokens) for r in reqs)
    mean_occ = float(np.mean(occ)) if occ else 0.0
    busy_tok_s = tok / wall / (mean_occ / B) if mean_occ else 0.0
    ttft = np.asarray([r.first_token_at - r.arrival for r in reqs])
    dur = np.asarray([r.done_at - r.arrival for r in reqs])
    print(f"poisson load={args.load:.2f} (lambda={lam:.2f} req/s): "
          f"{tok} tok in {wall:.2f}s = {tok / wall:.0f} tok/s offered-rate")
    print(f"  mean occupancy {mean_occ:.1f}/{B}; busy-normalized "
          f"{busy_tok_s:.0f} tok/s = {busy_tok_s / cap * 100:.0f}% of "
          f"saturated capacity")
    print(f"  TTFT p50 {np.percentile(ttft, 50) * 1000:.0f} ms / "
          f"p95 {np.percentile(ttft, 95) * 1000:.0f} ms; completion "
          f"p50 {np.percentile(dur, 50):.2f}s / "
          f"p95 {np.percentile(dur, 95):.2f}s")
    done = sum(r.done for r in reqs)
    print(f"  completed {done}/{n_req} (head-of-line blocking would show "
          f"as TTFT ~ completion time)")


def _run_spec(args, cfg, params, gb, synth_params) -> None:
    """Speculative decoding latency measurement.

    The per-ITERATION cost (gamma draft steps + one chunked verify) is
    independent of the accept rate — acceptance only changes how many
    tokens each iteration emits — so ms/iteration measured with random
    weights is the true hardware number; the checkpoint-dependent accept
    rate then maps it to ms/token. We print the measured end-to-end run,
    the projection ms/token(alpha), and the breakeven alpha vs plain
    decode. --spec self realizes alpha=1 end-to-end (draft == target:
    rejection sampling provably always accepts), giving the measured
    upper bound."""
    import jax

    from tpu_audio.models.orpheus.model import CausalLMGenerator, DraftModel
    from tpu_audio.nn import transformer
    from tpu_audio.ops import sampling

    vocab = cfg.vocab_size
    max_cache = args.prompt + args.tokens + args.gamma + 24
    sampler = (sampling.SamplerConfig(temperature=0.0) if args.greedy
               else sampling.SamplerConfig(temperature=0.8, top_k=50))
    gen = CausalLMGenerator(params, cfg, max_cache=max_cache)
    prompt_ids = list(np.random.default_rng(0).integers(
        0, vocab, args.prompt))

    if args.spec == "ngram":
        draft = None
    elif args.spec == "self":
        draft = DraftModel(params, cfg, max_cache=max_cache)
    else:
        d, l, h, kv, hid, _ = SIZES[args.spec]
        dcfg = transformer.TransformerConfig(
            dim=d, n_layers=l, n_heads=h, n_kv_heads=kv, hidden_dim=hid,
            vocab_size=vocab)
        draft = DraftModel(synth_params(dcfg), dcfg, max_cache=max_cache)
        dgb = sum(x.size * x.dtype.itemsize for x in
                  jax.tree_util.tree_leaves(draft.params)) / 1e9
        print(f"draft: {args.spec} ({dgb:.1f} GB)")

    kw = dict(sampler=sampler, eos_ids=(vocab - 1,), max_new=args.tokens,
              gamma=args.gamma, draft=draft)
    t0 = time.perf_counter()
    out = gen.generate_speculative(prompt_ids, seed=1, **kw)
    print(f"spec compile+first: {time.perf_counter() - t0:.1f}s")

    runs, n_tok, n_iter, n_drafted, n_acc = 3, 0, 0, 0, 0
    t0 = time.perf_counter()
    for i in range(runs):
        out = gen.generate_speculative(prompt_ids, seed=2 + i, **kw)
        st = gen.last_spec_stats
        n_tok += max(len(out), 1)
        n_iter += max(st["iterations"], 1)
        n_drafted += st["drafted"]
        n_acc += st["accepted"]
    dt = (time.perf_counter() - t0) / runs
    ms_iter = dt * runs / n_iter * 1000
    ms_tok = dt * runs / n_tok * 1000
    alpha = n_acc / n_drafted if n_drafted else 0.0
    print(f"spec[{args.spec}] gamma={args.gamma}: {ms_iter:.2f} ms/iter, "
          f"measured accept_rate={alpha:.2f} -> {ms_tok:.2f} ms/token "
          f"({n_tok / runs:.0f} tok/run)")

    # plain-decode baseline for breakeven
    from tpu_audio.ops import decoding

    def fn(params, prompt, key):
        cache = transformer.make_cache(cfg, 1, max_cache)
        logits, cache = transformer.forward(params, cfg, prompt, cache)

        def step(tok, cache):
            lg, cache = transformer.forward(params, cfg, tok, cache)
            return lg[:, -1], cache

        k1, k2 = jax.random.split(key)
        first = sampling.sample(k1, logits[:, -1], sampler)
        res = decoding.decode_loop(k2, step, cache, first, args.tokens,
                                   eos_ids=(vocab - 1,), sampler=sampler)
        return res.tokens, res.lengths

    import jax.numpy as jnp
    jfn = jax.jit(fn)
    prompt = jnp.asarray(np.asarray(prompt_ids, np.int32)[None])
    toks, lens = jfn(params, prompt, jax.random.PRNGKey(1))
    np.asarray(toks)
    t0 = time.perf_counter()
    n_gen = 0
    for i in range(runs):
        toks, lens = jfn(params, prompt, jax.random.PRNGKey(5 + i))
        np.asarray(toks)
        n_gen += max(int(np.asarray(lens).sum()), 1)
    plain_ms = (time.perf_counter() - t0) / n_gen * 1000
    print(f"plain decode: {plain_ms:.2f} ms/token")

    def e_tok(a):  # expected emitted tokens per iteration
        g = args.gamma
        return g + 1 if a >= 1.0 else (1 - a ** (g + 1)) / (1 - a)

    proj = {f"{a:.1f}": f"{ms_iter / e_tok(a):.2f}"
            for a in (0.5, 0.7, 0.8, 0.9, 1.0)}
    print(f"projection ms/token vs accept rate: {proj}")
    lo, hi = 0.0, 1.0
    for _ in range(40):
        mid = (lo + hi) / 2
        if ms_iter / e_tok(mid) > plain_ms:
            lo = mid
        else:
            hi = mid
    print(f"breakeven accept rate vs plain decode: {hi:.2f}")


if __name__ == "__main__":
    main()
