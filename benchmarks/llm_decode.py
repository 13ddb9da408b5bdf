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
    ap.add_argument("--greedy", action="store_true",
                    help="temperature 0 (isolates sampler cost)")
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
    params = transformer.init_params(jax.random.PRNGKey(0), cfg,
                                     dtype=jnp.bfloat16)
    if args.q4:
        # synthesize MLX-format int4 leaves for every big matmul (random
        # packed weights: perf depends only on shapes/dtypes)
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
        k = jax.random.PRNGKey(7)
        L = cfg.n_layers
        lay = params["layers"]
        hd = cfg.hd
        for name, shape in (("q", (L, cfg.n_heads * hd, dim)),
                            ("k", (L, cfg.kv_heads * hd, dim)),
                            ("v", (L, cfg.kv_heads * hd, dim)),
                            ("o", (L, dim, cfg.n_heads * hd))):
            lay["attn"][name] = q4_leaf(jax.random.fold_in(k, hash(name) % 97),
                                        shape)
        for name, shape in (("gate", (L, hidden, dim)),
                            ("up", (L, hidden, dim)),
                            ("down", (L, dim, hidden))):
            lay["mlp"][name] = q4_leaf(jax.random.fold_in(k, hash(name) % 89),
                                       shape)
        params["lm_head"] = q4_leaf(jax.random.fold_in(k, 3), (vocab, dim))
    if args.w8a8:
        def i8_leaf(key, shape):
            o, i = shape[-2], shape[-1]
            lead = shape[:-2]
            return {
                "weight_i8": jax.random.randint(key, (*lead, o, i), -127, 128,
                                                jnp.int8),
                "scale_i8": jax.random.uniform(key, (*lead, o, 1),
                                               jnp.float32, 0.001, 0.02),
            }
        k = jax.random.PRNGKey(7)
        L = cfg.n_layers
        lay = params["layers"]
        hd = cfg.hd
        for name, shape in (("q", (L, cfg.n_heads * hd, dim)),
                            ("k", (L, cfg.kv_heads * hd, dim)),
                            ("v", (L, cfg.kv_heads * hd, dim)),
                            ("o", (L, dim, cfg.n_heads * hd))):
            lay["attn"][name] = i8_leaf(jax.random.fold_in(k, hash(name) % 97),
                                        shape)
        for name, shape in (("gate", (L, hidden, dim)),
                            ("up", (L, hidden, dim)),
                            ("down", (L, dim, hidden))):
            lay["mlp"][name] = i8_leaf(jax.random.fold_in(k, hash(name) % 89),
                                       shape)
        params["lm_head"] = i8_leaf(jax.random.fold_in(k, 3), (vocab, dim))
        from tpu_audio.ops import quant
        params = quant.fuse_int8_tree(params)
    if args.w4a8:
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
        k = jax.random.PRNGKey(7)
        L = cfg.n_layers
        lay = params["layers"]
        hd = cfg.hd
        for name, shape in (("q", (L, cfg.n_heads * hd, dim)),
                            ("k", (L, cfg.kv_heads * hd, dim)),
                            ("v", (L, cfg.kv_heads * hd, dim)),
                            ("o", (L, dim, cfg.n_heads * hd))):
            lay["attn"][name] = q4p_leaf(
                jax.random.fold_in(k, hash(name) % 97), shape)
        for name, shape in (("gate", (L, hidden, dim)),
                            ("up", (L, hidden, dim)),
                            ("down", (L, dim, hidden))):
            lay["mlp"][name] = q4p_leaf(
                jax.random.fold_in(k, hash(name) % 89), shape)
        params["lm_head"] = q4p_leaf(jax.random.fold_in(k, 3), (vocab, dim))
        from tpu_audio.ops import quant
        params = quant.fuse_w4a8_tree(params)
    n_params = sum(int(np.prod(x.shape))
                   for x in jax.tree_util.tree_leaves(params))
    np.asarray(np.asarray(jax.tree_util.tree_leaves(params)[0])[:1])  # sync
    gb = sum(x.size * x.dtype.itemsize
             for x in jax.tree_util.tree_leaves(params)) / 1e9
    kind = ("q4" if args.q4 else "w8a8" if args.w8a8
            else "w4a8" if args.w4a8 else "bf16")
    print(f"init {n_params / 1e9:.2f}B params ({gb:.1f} GB "
          f"{kind}) in {time.perf_counter() - t0:.1f}s")

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


if __name__ == "__main__":
    main()
