"""Orpheus TTS: Llama-3B LLM emitting 7-token SNAC frames.

Reference: package/TTS/Orpheus/TTSEngine/OrpheusTTS.swift:52-508 — special
tokens 128257..128266, double-buffered host decode loop with repetition
penalty 1.3 over a 20-token window, 7-token frames parsed into 3 SNAC
layers. Here the whole token loop runs on device (ops/decoding.decode_loop)
and frame parsing is a host reshape.

Prompt-length bucketing uses LEFT padding with masked-out key slots: RoPE
attention depends only on position differences, so shifting all real tokens
right by the pad amount is numerically identical to an unpadded run — one
compiled executable serves a whole bucket of prompt lengths exactly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tpu_audio.nn import transformer
from tpu_audio.ops.decoding import decode_loop
from tpu_audio.ops.sampling import SamplerConfig

SAMPLE_RATE = 24000
MAX_TOKENS = 1200
START_TOKEN = 128259
END_TOKEN = 128258
PAD_TOKEN = 128263
AUDIO_START_TOKEN = 128261
AUDIO_END_TOKEN = 128262
VOICE_PREFIX_TOKEN = 128260
TEXT_END_TOKEN = 128009
CODE_OFFSET = 128266
AUDIO_MARKER = 128257
CODEBOOK_SIZE = 4096
REPETITION_WINDOW = 20

VOICES = ["tara", "leah", "jess", "leo", "dan", "mia", "zac", "zoe"]
EXPRESSION_TAGS = ["<laugh>", "<chuckle>", "<sigh>", "<cough>", "<sniffle>",
                   "<groan>", "<yawn>", "<gasp>"]

# Llama-3.2-3B architecture (orpheus-3b-0.1-ft)
LLAMA_3B = transformer.TransformerConfig(
    dim=3072, n_layers=28, n_heads=24, n_kv_heads=8, head_dim=128,
    hidden_dim=8192, vocab_size=156940, rope_theta=500000.0,
    rope_scaling={"rope_type": "llama3", "factor": 32.0,
                  "low_freq_factor": 1.0, "high_freq_factor": 4.0,
                  "original_max_position_embeddings": 8192},
    norm_eps=1e-5, tie_word_embeddings=True)


def build_prompt_ids(text_ids: list[int]) -> list[int]:
    """[start] + text + [text_end, voice_prefix] (OrpheusTokenizer.
    prepareInputIds, OrpheusTokenizer.swift:101-150)."""
    return [START_TOKEN] + list(text_ids) + [TEXT_END_TOKEN, VOICE_PREFIX_TOKEN]


from dataclasses import dataclass, field


@dataclass
class DraftModel:
    """A small same-vocab model used to draft tokens for speculative
    decoding (e.g. a 1B Llama drafting for the 3B Orpheus — the two share
    the CausalLMGenerator stack). Params may be bf16 or quantized
    (ops/quant leaf-dicts); under TP-quant shard_map the draft runs
    replicated on every device."""

    params: dict = field(repr=False)
    cfg: transformer.TransformerConfig
    max_cache: int = 2048

    def __post_init__(self):
        # single-chip fp fusion (bit-identical) — see CausalLMGenerator;
        # the draft always runs replicated, so this is unconditional
        self.params = transformer.fuse_fp_tree(self.params)


class CausalLMGenerator:
    """Compiled prefill+decode over nn/transformer for any Llama-family
    config; shared by Orpheus, OuteTTS, Chatterbox T3 and CosyVoice LMs.

    One executable per (prompt bucket, max_new, sampler) combination.

    Pass ``mesh=`` to serve tensor-parallel: params are sharded with the
    megatron rules (parallel/shardings.py), the KV cache is sharded along
    kv_heads on the tp axis, and XLA GSPMD inserts the per-layer psum after
    the row-parallel o/down projections. Decode is token-identical to the
    single-device path (verified in tests/test_parallel.py and the driver
    dryrun). Requires n_heads, kv_heads and hidden_dim divisible by tp.

    TP has two modes, selected automatically by the param dtypes:
      - float/bf16 params: NamedSharding + GSPMD (megatron rules from
        parallel/shardings.py) — XLA inserts the collectives.
      - quantized params (int8 / pair-packed int4 leaf-dicts): GSPMD
        cannot partition the Pallas quant matmuls (custom calls), so the
        whole step runs under `shard_map` instead — each device holds its
        megatron weight shard and runs the quant kernels on LOCAL shapes,
        with explicit psums after the row-parallel projections
        (parallel/tp_quant.py). Every device samples the same token from
        the replicated logits, so decode stays deterministic.
    """

    def __init__(self, params, cfg: transformer.TransformerConfig,
                 max_cache: int = 2048, pad_id: int = 0,
                 cache_dtype=jnp.bfloat16, mesh=None):
        self.cfg = cfg
        self.cfg_run = cfg  # per-shard local config under TP-quant
        self.max_cache = max_cache
        self.pad_id = pad_id
        self.mesh = mesh
        self._axis = None
        self._pspecs = None
        self._fns = {}
        if mesh is not None:
            tp = mesh.shape["tp"]
            if cfg.kv_heads % tp or cfg.n_heads % tp:
                raise ValueError(
                    f"heads ({cfg.n_heads}/{cfg.kv_heads}) not divisible by "
                    f"tp={tp}")
            from tpu_audio.ops import quant as _q

            def _any_quant(t):
                if isinstance(t, dict):
                    return _q.is_quantized(t) or any(
                        _any_quant(v) for v in t.values())
                return False

            if _any_quant(params):
                from tpu_audio.parallel import tp_quant

                tp_quant.check_tp_quant_supported(params, cfg, tp)
                self.params, self._pspecs = tp_quant.shard_params(
                    params, cfg, mesh)
                self.cfg_run = tp_quant.local_config(cfg, tp)
                self._axis = "tp"
            else:
                from tpu_audio.parallel import shard_tree, transformer_rules

                self.params = shard_tree(params, mesh, transformer_rules,
                                         layer_prefixes=("layers",))
        else:
            # single-chip: fuse fp qkv/gateup leaves (bit-identical; int8
            # trees arrive pre-fused from requantize_tree_int8) — fewer
            # dispatches per step, and the layout the whole-stack fused
            # decode kernel streams. TP keeps unfused leaves: the megatron
            # sharding rules split q/k/v along different head axes.
            self.params = transformer.fuse_fp_tree(params)

    def _constrain_cache(self, cache):
        """Pin the KV cache (L, B, S, H_kv, D) to head-sharding on tp."""
        if self.mesh is None or self._axis is not None:
            # shard_map mode: the cache is created per-device with local
            # head counts — nothing to constrain
            return cache
        from jax.sharding import NamedSharding, PartitionSpec as P

        def pin(x):
            spec = (P(None, None, None, "tp", None) if x.ndim == 5
                    else P())
            return jax.lax.with_sharding_constraint(
                x, NamedSharding(self.mesh, spec))

        return jax.tree_util.tree_map(pin, cache)

    def _cache_specs(self, batch: int):
        """PartitionSpec pytree for a KV cache crossing the shard_map
        boundary: (L, B, S, H_kv, D) sharded on heads, scalars replicated.
        Structure comes from eval_shape on the LOCAL config (only tree
        structure and ranks matter)."""
        from jax.sharding import PartitionSpec as P

        shapes = jax.eval_shape(
            lambda: transformer.make_cache(self.cfg_run, batch,
                                           self.max_cache))
        return jax.tree_util.tree_map(
            lambda s: (P(None, None, None, "tp", None)
                       if len(s.shape) == 5 else P()), shapes)

    def _compile(self, run, in_extra=None, out_specs=None, n_extra_args=0):
        """jit, or shard_map+jit in TP-quant mode. The params arg comes
        first (sharded by self._pspecs); in_extra/out_specs default to
        replicated P() for every other arg / output."""
        if self._axis is None:
            return jax.jit(run)
        try:
            from jax import shard_map
        except ImportError:  # older jax
            from jax.experimental.shard_map import shard_map
        from jax.sharding import PartitionSpec as P

        if in_extra is None:
            in_extra = [P()] * n_extra_args
        if out_specs is None:
            out_specs = P()
        sm = shard_map(run, mesh=self.mesh,
                       in_specs=(self._pspecs, *in_extra),
                       out_specs=out_specs, check_vma=False)
        return jax.jit(sm)

    def _fn(self, prompt_pad: int, max_new: int, sampler: SamplerConfig,
            eos_ids: tuple):
        key_ = (prompt_pad, max_new, sampler, eos_ids)
        if key_ in self._fns:
            return self._fns[key_]
        cfg = self.cfg_run
        # whole-stack fused decode kernel for the T=1 steps (single-chip
        # single-stream only; grouped layout for 1B/3B dims): TPU-gated
        # with a compile probe, falls back to the plain cache otherwise
        fused = self._fused_ok()

        def run(params, prompt, pad_amount, key):
            # left-padded prompt: mask key slots < pad_amount everywhere;
            # pos_offset makes RoPE see canonical positions 0,1,2,... so
            # every bucket size yields BIT-identical logits
            off = jnp.reshape(pad_amount, (1,))
            cache, extra = transformer.decode_cache_and_mask(
                cfg, self.max_cache, pad_amount, fused)
            if not fused:
                cache = self._constrain_cache(cache)
            logits, cache = transformer.forward(params, cfg, prompt[None],
                                                cache, extra_mask=extra,
                                                axis_name=self._axis,
                                                pos_offset=off)
            first_logits = logits[0, -1].astype(jnp.float32)

            def step(tok, cache):
                lg, cache = transformer.forward(params, cfg, tok, cache,
                                                extra_mask=extra,
                                                axis_name=self._axis,
                                                pos_offset=off)
                return lg[:, -1].astype(jnp.float32), cache

            from tpu_audio.ops import sampling as S

            k1, k2 = jax.random.split(key)
            fl = first_logits[None]
            if sampler.temperature == 0.0:
                first = jnp.argmax(fl, axis=-1).astype(jnp.int32)
            else:
                fl = S.apply_top_k(fl / sampler.temperature, sampler.top_k)
                fl = S.apply_top_p(fl, sampler.top_p)
                fl = S.apply_min_p(fl, sampler.min_p)
                first = jax.random.categorical(k1, fl, axis=-1).astype(jnp.int32)

            res = decode_loop(k2, step, cache, first, max_new - 1,
                              eos_ids=eos_ids, sampler=sampler,
                              pad_id=self.pad_id)
            return first, res.tokens, res.lengths

        fn = self._compile(run, n_extra_args=3)
        self._fns[key_] = fn
        return fn

    def generate(self, prompt_ids: list[int], *, sampler: SamplerConfig,
                 eos_ids: tuple, max_new: int, seed: int = 0,
                 bucket: int = 32, should_stop=None,
                 span: int = 32) -> list[int]:
        """Returns generated ids (EOS excluded unless it was the first).

        should_stop: optional callable checked between compiled decode
        spans of `span` tokens (in-loop cancellation: stop() latency is one
        span, ~200 ms for 3B, vs the whole max_new decode — ref
        T3.swift:250-253). None = single compiled loop (bit-stable with
        round-1 outputs)."""
        if should_stop is not None:
            return self._generate_spanned(prompt_ids, sampler=sampler,
                                          eos_ids=eos_ids, max_new=max_new,
                                          seed=seed, bucket=bucket,
                                          should_stop=should_stop, span=span)
        n = len(prompt_ids)
        pad = -(-n // bucket) * bucket
        prompt = np.full(pad, self.pad_id, np.int32)
        prompt[pad - n:] = prompt_ids
        fn = self._fn(pad, max_new, sampler, tuple(eos_ids))
        first, tokens, lengths = fn(self.params, jnp.asarray(prompt),
                                    jnp.int32(pad - n),
                                    jax.random.PRNGKey(seed))
        first = int(first[0])
        if first in eos_ids:
            return []
        return [first] + [int(t) for t in
                          np.asarray(tokens[0][: int(lengths[0])])]

    def _batch_fn(self, b: int, prompt_pad: int, max_new: int,
                  sampler: SamplerConfig, eos_ids: tuple):
        key_ = ("batch", b, prompt_pad, max_new, sampler, eos_ids)
        if key_ in self._fns:
            return self._fns[key_]
        cfg = self.cfg_run

        def run(params, prompts, pad_amounts, key):
            cache = self._constrain_cache(
                transformer.make_cache(cfg, b, self.max_cache))
            slot = jnp.arange(self.max_cache)
            extra = jnp.where(slot[None] >= pad_amounts[:, None],
                              0.0, -1e30)[:, None, None, :]
            logits, cache = transformer.forward(params, cfg, prompts, cache,
                                                extra_mask=extra,
                                                axis_name=self._axis,
                                                pos_offset=pad_amounts)
            from tpu_audio.ops import sampling as S

            k1, k2 = jax.random.split(key)
            first = S.sample(k1, logits[:, -1].astype(jnp.float32),
                             sampler).astype(jnp.int32)

            def step(tok, cache):
                lg, cache = transformer.forward(params, cfg, tok, cache,
                                                extra_mask=extra,
                                                axis_name=self._axis,
                                                pos_offset=pad_amounts)
                return lg[:, -1].astype(jnp.float32), cache

            res = decode_loop(k2, step, cache, first, max_new - 1,
                              eos_ids=eos_ids, sampler=sampler,
                              pad_id=self.pad_id)
            return first, res.tokens, res.lengths

        fn = self._compile(run, n_extra_args=3)
        self._fns[key_] = fn
        return fn

    def generate_batch(self, prompts: list[list[int]], *,
                       sampler: SamplerConfig, eos_ids: tuple,
                       max_new: int, seed: int = 0,
                       bucket: int = 32) -> list[list[int]]:
        """Decode B prompts in one compiled loop (multi-stream serving).

        Weights stream from HBM once per step for the whole batch, so
        aggregate throughput scales ~7× at B=8 for the 3B model (see
        benchmarks/llm_decode.py --batch). Rows finish independently via
        per-row EOS masking; all rows run until the slowest finishes
        (decode_loop's early-exit needs every row done). Per-row outputs
        are identical in distribution to generate() but not bit-identical
        to single-stream runs (one shared PRNG stream is split across the
        batch)."""
        b = len(prompts)
        n_max = max(len(p) for p in prompts)
        pad = -(-n_max // bucket) * bucket
        arr = np.full((b, pad), self.pad_id, np.int32)
        pad_amounts = np.zeros((b,), np.int32)
        for r, ids in enumerate(prompts):
            arr[r, pad - len(ids):] = ids
            pad_amounts[r] = pad - len(ids)
        fn = self._batch_fn(b, pad, max_new, sampler, tuple(eos_ids))
        first, tokens, lengths = fn(self.params, jnp.asarray(arr),
                                    jnp.asarray(pad_amounts),
                                    jax.random.PRNGKey(seed))
        first = np.asarray(first)
        tokens = np.asarray(tokens)
        lengths = np.asarray(lengths)
        out = []
        for r in range(b):
            if int(first[r]) in eos_ids:
                out.append([])
            else:
                out.append([int(first[r])] +
                           [int(t) for t in tokens[r][: int(lengths[r])]])
        return out

    # ------------------------------------------------------- speculative

    def _spec_fn(self, prompt_pad: int, max_new: int, sampler: SamplerConfig,
                 eos_ids: tuple, gamma: int, draft):
        dcfg = draft.cfg if draft is not None else None
        key_ = ("spec", prompt_pad, max_new, sampler, eos_ids, gamma, dcfg,
                draft.max_cache if draft is not None else 0)
        if key_ in self._fns:
            return self._fns[key_]
        import dataclasses

        from tpu_audio.ops import sampling as S
        from tpu_audio.ops.speculative import speculative_decode_loop

        cfg = self.cfg_run
        # fused-kernel eligibility for the DRAFT's sequential steps —
        # resolved here (outside jit: the gate compile-probes the kernel)
        d_fused = (draft is not None and self.mesh is None
                   and transformer.fused_decode_supported(
                       draft.cfg, draft.params, draft.max_cache))

        def run(params, draft_params, prompt, pad_amount, key):
            cache = self._constrain_cache(
                transformer.make_cache(cfg, 1, self.max_cache))
            slot = jnp.arange(self.max_cache)
            extra = jnp.where(slot >= pad_amount, 0.0,
                              -1e30)[None, None, None, :]
            off = jnp.reshape(pad_amount, (1,))
            logits, cache = transformer.forward(params, cfg, prompt[None],
                                                cache, extra_mask=extra,
                                                axis_name=self._axis,
                                                pos_offset=off)
            k1, k2 = jax.random.split(key)
            first = S.sample(k1, logits[0, -1].astype(jnp.float32)[None],
                             sampler).astype(jnp.int32)
            second_last = prompt[-1][None]  # last real prompt token

            def t_step(toks, c):
                lg, c = transformer.forward(params, cfg, toks, c,
                                            extra_mask=extra,
                                            axis_name=self._axis,
                                            pos_offset=off)
                return lg.astype(jnp.float32), c

            common = dict(max_new_tokens=max_new - 1, gamma=gamma,
                          eos_ids=eos_ids, sampler=sampler,
                          pad_id=self.pad_id)
            if draft is not None:
                # the draft runs replicated (no axis_name): it is small, and
                # under TP-quant shard_map every device drafts identically.
                # Its sequential T=1/T=2 steps ride the fused whole-stack
                # kernel when eligible (the TARGET stays on the plain cache:
                # its chunked gamma+1 verify is a large-T forward).
                d_cache, d_extra = transformer.decode_cache_and_mask(
                    dcfg, draft.max_cache, pad_amount, d_fused)
                _, d_cache = transformer.forward(draft_params, dcfg,
                                                 prompt[None], d_cache,
                                                 extra_mask=d_extra,
                                                 pos_offset=off)
                # invariant: draft.pos = target.pos - 1 (the first 2-token
                # draft step re-deposits the last prompt token's KV)
                d_cache = dataclasses.replace(d_cache, pos=d_cache.pos - 1)

                def d_step(toks, c):
                    lg, c = transformer.forward(draft_params, dcfg, toks, c,
                                                extra_mask=d_extra,
                                                pos_offset=off)
                    return lg.astype(jnp.float32), c

                res = speculative_decode_loop(
                    k2, t_step, cache, first, second_last,
                    draft_step=d_step, draft_cache=d_cache, **common)
            else:
                h = prompt_pad + max_new + 2 * gamma + 4
                hist = jnp.zeros((1, h), jnp.int32)
                hist = hist.at[0, :prompt_pad].set(jnp.roll(prompt,
                                                            -pad_amount))
                res = speculative_decode_loop(
                    k2, t_step, cache, first, second_last, history=hist,
                    history_len=prompt_pad - pad_amount, **common)
            return (first, res.tokens, res.lengths, res.iterations,
                    res.drafted, res.accepted)

        if self._axis is not None:
            from jax.sharding import PartitionSpec as P

            dspec = jax.tree_util.tree_map(
                lambda _: P(), draft.params if draft is not None else {})
            fn = self._compile(run, in_extra=[dspec, P(), P(), P()])
        else:
            fn = self._compile(run, n_extra_args=4)
        self._fns[key_] = fn
        return fn

    def generate_speculative(self, prompt_ids: list[int], *,
                             sampler: SamplerConfig, eos_ids: tuple,
                             max_new: int, seed: int = 0, bucket: int = 32,
                             gamma: int = 5,
                             draft: "DraftModel | None" = None) -> list[int]:
        """generate(), but emitting up to gamma+1 tokens per target weight
        pass via speculative decoding (ops/speculative.py). Every emitted
        token has EXACTLY the same distribution as generate()'s sampler
        (incl. repetition penalty and RAS), though not the same stream for
        a given seed. draft=None uses n-gram prompt-lookup self-drafting;
        pass a DraftModel (same vocab) for model-based drafting.

        Accept statistics from the last call land in self.last_spec_stats."""
        n = len(prompt_ids)
        pad = -(-n // bucket) * bucket
        prompt = np.full(pad, self.pad_id, np.int32)
        prompt[pad - n:] = prompt_ids
        fn = self._spec_fn(pad, max_new, sampler, tuple(eos_ids), gamma,
                           draft)
        dparams = draft.params if draft is not None else {}
        first, tokens, lengths, iters, drafted, accepted = fn(
            self.params, dparams, jnp.asarray(prompt), jnp.int32(pad - n),
            jax.random.PRNGKey(seed))
        it, dr, ac = int(iters), int(drafted), int(accepted)
        self.last_spec_stats = {
            "iterations": it, "drafted": dr, "accepted": ac,
            "accept_rate": ac / dr if dr else 0.0,
            "tokens_per_iteration": (ac + it) / it if it else 0.0}
        first = int(first[0])
        if first in eos_ids:
            return []
        return [first] + [int(t) for t in
                          np.asarray(tokens[0][: int(lengths[0])])]

    # ------------------------------------------------------------- spans

    def _fused_ok(self) -> bool:
        """Whole-stack fused decode eligibility (single-chip only)."""
        return (self.mesh is None
                and transformer.fused_decode_supported(
                    self.cfg_run, self.params, self.max_cache))

    def _prefill_fn(self, prompt_pad: int, sampler: SamplerConfig):
        key_ = ("prefill", prompt_pad, sampler)
        if key_ in self._fns:
            return self._fns[key_]
        cfg = self.cfg_run
        fused = self._fused_ok()

        def run(params, prompt, pad_amount, key):
            cache, extra = transformer.decode_cache_and_mask(
                cfg, self.max_cache, pad_amount, fused)
            if not fused:
                cache = self._constrain_cache(cache)
            logits, cache = transformer.forward(params, cfg, prompt[None],
                                                cache, extra_mask=extra,
                                                axis_name=self._axis,
                                                pos_offset=jnp.reshape(
                                                    pad_amount, (1,)))
            from tpu_audio.ops import sampling as S

            fl = logits[0, -1].astype(jnp.float32)[None]
            first = S.sample(key, fl, sampler).astype(jnp.int32)
            return first, cache

        from jax.sharding import PartitionSpec as P
        fn = self._compile(
            run, in_extra=[P(), P(), P()],
            out_specs=(P(), self._cache_specs(1)) if self._axis else None)
        self._fns[key_] = fn
        return fn

    def _span_fn(self, span: int, sampler: SamplerConfig, eos_ids: tuple):
        key_ = ("span", span, sampler, eos_ids)
        if key_ in self._fns:
            return self._fns[key_]
        cfg = self.cfg_run
        fused = self._fused_ok()

        def run(params, cache, last, recent, finished, pad_amount, key):
            if fused:
                extra = None
            else:
                slot = jnp.arange(self.max_cache)
                extra = jnp.where(slot >= pad_amount, 0.0,
                                  -1e30)[None, None, None, :]

            def step(tok, cache):
                lg, cache = transformer.forward(params, cfg, tok, cache,
                                                extra_mask=extra,
                                                axis_name=self._axis,
                                                pos_offset=jnp.reshape(
                                                    pad_amount, (1,)))
                return lg[:, -1].astype(jnp.float32), cache

            res = decode_loop(key, step, cache, last, span, eos_ids=eos_ids,
                              sampler=sampler, pad_id=self.pad_id,
                              recent0=recent, finished0=finished)
            return (res.tokens, res.lengths, res.last_state, res.recent,
                    res.finished, res.last_token)

        from jax.sharding import PartitionSpec as P
        cs = self._cache_specs(1) if self._axis else None
        fn = self._compile(
            run,
            in_extra=[cs, P(), P(), P(), P(), P()] if self._axis else None,
            out_specs=(P(), P(), cs, P(), P(), P()) if self._axis else None,
            n_extra_args=6)
        self._fns[key_] = fn
        return fn

    def _generate_spanned(self, prompt_ids, *, sampler, eos_ids, max_new,
                          seed, bucket, should_stop, span) -> list[int]:
        out: list[int] = []
        for toks in self.stream_spans(prompt_ids, sampler=sampler,
                                      eos_ids=eos_ids, max_new=max_new,
                                      seed=seed, bucket=bucket,
                                      should_stop=should_stop, span=span):
            out.extend(toks)
        return out

    def stream_spans(self, prompt_ids, *, sampler, eos_ids, max_new,
                     seed: int = 0, bucket: int = 32, should_stop=None,
                     span: int = 32):
        """Yield generated ids one compiled `span`-token chunk at a time.

        Token-granularity serving primitive: the KV cache, repetition
        window, and finished flag carry across spans on device, so the
        token stream is identical to `generate` with the same seed — only
        the host sees it in `span`-sized pieces. First tokens after one
        prefill + one span dispatch (reference streams per sentence:
        OrpheusTTS.swift:201)."""
        from tpu_audio.ops.sampling import update_recent

        n = len(prompt_ids)
        pad = -(-n // bucket) * bucket
        prompt = np.full(pad, self.pad_id, np.int32)
        prompt[pad - n:] = prompt_ids
        pad_amount = jnp.int32(pad - n)
        key = jax.random.PRNGKey(seed)
        key, kp = jax.random.split(key)
        first, cache = self._prefill_fn(pad, sampler)(
            self.params, jnp.asarray(prompt), pad_amount, kp)
        if int(first[0]) in eos_ids:
            return
        window = max(sampler.repetition_window, sampler.ras_window, 1)
        recent = update_recent(jnp.full((1, window), -1, jnp.int32), first)
        finished = jnp.zeros((1,), jnp.bool_)
        last = first
        fn = self._span_fn(span, sampler, tuple(eos_ids))
        pending = [int(first[0])]
        remaining = max_new - 1
        while remaining > 0 and (should_stop is None or not should_stop()):
            key, ks = jax.random.split(key)
            tokens, lengths, cache, recent, finished, last = fn(
                self.params, cache, last, recent, finished, pad_amount, ks)
            got = min(int(lengths[0]), remaining)
            pending.extend(int(t) for t in np.asarray(tokens[0][:got]))
            remaining -= span
            if pending:
                yield pending
                pending = []
            if bool(finished[0]):
                return
        if pending:
            yield pending


def parse_frames(tokens: list[int]) -> list[np.ndarray]:
    """7-token frames → 3 SNAC layers (OrpheusTTS.parseOutput:472-508)."""
    if AUDIO_MARKER in tokens:
        tokens = tokens[len(tokens) - tokens[::-1].index(AUDIO_MARKER):]
    toks = [t - CODE_OFFSET for t in tokens
            if t != END_TOKEN and t >= CODE_OFFSET]
    n = len(toks) // 7 * 7
    toks = np.asarray(toks[:n], np.int64).reshape(-1, 7)
    l1 = toks[:, 0]
    l2 = np.stack([toks[:, 1] - CODEBOOK_SIZE,
                   toks[:, 4] - 4 * CODEBOOK_SIZE], 1).reshape(-1)
    l3 = np.stack([toks[:, 2] - 2 * CODEBOOK_SIZE,
                   toks[:, 3] - 3 * CODEBOOK_SIZE,
                   toks[:, 5] - 5 * CODEBOOK_SIZE,
                   toks[:, 6] - 6 * CODEBOOK_SIZE], 1).reshape(-1)
    clip = lambda a: np.clip(a, 0, CODEBOOK_SIZE - 1).astype(np.int32)
    return [clip(l1), clip(l2), clip(l3)]
