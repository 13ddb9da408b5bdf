"""Continuous batching for the shared LLM decode path.

generate_batch (models/orpheus/model.py) runs a static batch until the
slowest row finishes — fine for offline throughput, but a serving
deployment pays head-of-line blocking. ContinuousBatcher keeps a static
batch of B device rows decoding in short compiled spans and refills any
finished row from the request queue BETWEEN spans, so occupancy stays high
under streaming arrivals with no recompilation.

How admission stays exact (and shape-static): all rows decode in lockstep
sharing the cache's single write position P. A request with an n-token
prompt admitted at position P is prefilled into a temporary 1-row cache at
positions [P-pad, P) with its left-pad slots key-masked, then its KV
window is scattered into the batch cache row. RoPE attention depends only
on position differences and masked slots contribute -1e30 scores, so the
row's subsequent decode is numerically identical to a fresh single-stream
generate of the same prompt (the same masked-exact property the prompt
bucketing relies on, models/orpheus/model.py docstring). Greedy outputs
are therefore exactly generate()'s; sampled rows share one split PRNG
stream like generate_batch (same distribution, different bitstream).

Capacity: the cache ring holds max_cache positions shared by all rows; a
batcher serves until P + span + prompt_pad would overflow, then drains.
Size max_cache for the expected session (prompt+output ~ a sentence, so
4096 positions ≈ tens of requests per row between drains).

The reference has no serving layer at all (single-stream actors); this is
TPU-native new design (SURVEY §2C). Not yet supported under TP-quant
shard_map (single-device or GSPMD TP only).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np

from tpu_audio.nn import transformer
from tpu_audio.ops.decoding import decode_loop
from tpu_audio.ops.sampling import SamplerConfig


@dataclass
class Request:
    prompt_ids: list[int]
    max_new: int = 256
    arrival: float = 0.0  # host clock, for latency accounting
    # filled on completion:
    tokens: list[int] = field(default_factory=list)
    done: bool = False
    first_token_at: float | None = None
    done_at: float | None = None


class ContinuousBatcher:
    """Rolling-admission batch decoder over a CausalLMGenerator's params.

    Usage:
        batcher = ContinuousBatcher(gen, batch=8, span=16, sampler=...,
                                    eos_ids=(eos,))
        batcher.submit(Request(prompt_ids, max_new=400))
        batcher.run_until_idle()   # or step() in a serving loop
    """

    def __init__(self, gen, batch: int, span: int, sampler: SamplerConfig,
                 eos_ids: tuple, prompt_bucket: int = 64, seed: int = 0):
        if gen._axis is not None:
            raise NotImplementedError(
                "continuous batching under TP-quant shard_map is not "
                "supported; use single-device or GSPMD TP")
        self.gen = gen
        self.b = batch
        self.span = span
        self.sampler = sampler
        self.eos_ids = tuple(eos_ids)
        self.bucket = prompt_bucket
        self.window = max(sampler.repetition_window, sampler.ras_window, 1)
        self.key = jax.random.PRNGKey(seed)

        cfg = gen.cfg_run
        self.cache = transformer.make_cache(cfg, batch, gen.max_cache)
        self.pos = 0  # host mirror of the cache write position
        # host-side per-row state
        self.row_req: list[Request | None] = [None] * batch
        self.row_start = np.zeros(batch, np.int32)  # first real KV slot
        self.last = np.zeros(batch, np.int32)
        self.recent = np.full((batch, self.window), -1, np.int32)
        self.active = np.zeros(batch, bool)
        self.queue: list[Request] = []
        self.completed: list[Request] = []
        self._fns = {}

    # ------------------------------------------------------------ compiled

    def _admit_fn(self, pad: int):
        key_ = ("admit", pad)
        if key_ not in self._fns:
            gen, cfg = self.gen, self.gen.cfg_run

            def run(params, bk, bv, prompt, pad_amount, start_pos, row, key):
                # 1-row prefill at absolute positions [start_pos-pad, start_pos)
                tmp = transformer.make_cache(cfg, 1, gen.max_cache)
                tmp = type(tmp)(k=tmp.k, v=tmp.v,
                                pos=jnp.int32(start_pos - pad))
                slot = jnp.arange(gen.max_cache)
                row_start = start_pos - pad + pad_amount
                extra = jnp.where(slot >= row_start,
                                  0.0, -1e30)[None, None, None, :]
                # canonical RoPE positions (0,1,2,... from the first real
                # token) — bit-identical to generate() at any admission slot
                logits, tmp = transformer.forward(
                    params, cfg, prompt[None], tmp, extra_mask=extra,
                    pos_offset=jnp.reshape(row_start, (1,)))
                from tpu_audio.ops import sampling as S

                first = S.sample(key, logits[0, -1].astype(jnp.float32)[None],
                                 self.sampler).astype(jnp.int32)
                # scatter the written KV window into the batch cache row
                l, _, _, h, d = bk.shape
                ks = jax.lax.dynamic_slice(
                    tmp.k, (0, 0, start_pos - pad, 0, 0), (l, 1, pad, h, d))
                vs = jax.lax.dynamic_slice(
                    tmp.v, (0, 0, start_pos - pad, 0, 0), (l, 1, pad, h, d))
                bk = jax.lax.dynamic_update_slice(
                    bk, ks, (0, row, start_pos - pad, 0, 0))
                bv = jax.lax.dynamic_update_slice(
                    bv, vs, (0, row, start_pos - pad, 0, 0))
                return bk, bv, first

            self._fns[key_] = jax.jit(run, donate_argnums=(1, 2))
        return self._fns[key_]

    def _span_fn(self):
        key_ = "span"
        if key_ not in self._fns:
            gen, cfg = self.gen, self.gen.cfg_run

            def run(params, cache, last, recent, finished, row_start, key):
                slot = jnp.arange(gen.max_cache)
                extra = jnp.where(slot[None] >= row_start[:, None],
                                  0.0, -1e30)[:, None, None, :]

                def step(tok, cache):
                    lg, cache = transformer.forward(params, cfg, tok, cache,
                                                    extra_mask=extra,
                                                    pos_offset=row_start)
                    return lg[:, -1].astype(jnp.float32), cache

                # early_exit=False: the span must write exactly span KV
                # slots per row so the shared position stays aligned for
                # the next admission (no unwritten gap slots)
                res = decode_loop(key, step, cache, last, self.span,
                                  eos_ids=self.eos_ids, sampler=self.sampler,
                                  pad_id=gen.pad_id, recent0=recent,
                                  finished0=finished, early_exit=False)
                return (res.tokens, res.lengths, res.last_state, res.recent,
                        res.finished, res.last_token)

            self._fns[key_] = jax.jit(run)
        return self._fns[key_]

    # ---------------------------------------------------------------- queue

    def submit(self, req: Request) -> None:
        req.arrival = req.arrival or time.perf_counter()
        self.queue.append(req)

    def _try_admit(self) -> None:
        for row in range(self.b):
            if self.active[row] or not self.queue:
                continue
            req = self.queue[0]
            n = len(req.prompt_ids)
            pad = -(-n // self.bucket) * self.bucket
            if pad > self.pos:
                # the prompt KV window [pos-pad, pos) must fit behind the
                # shared position. With rows in flight, wait for pos to
                # grow; idle, jump the position forward (slots stay unread
                # — every row's mask starts at its own row_start).
                if self.active.any():
                    return
                self.pos = pad
                self.cache = type(self.cache)(
                    k=self.cache.k, v=self.cache.v, pos=jnp.int32(pad))
            if self.pos + self.span + 1 > self.gen.max_cache:
                return  # ring exhausted: serve the in-flight rows, drain
            self.queue.pop(0)
            prompt = np.full(pad, self.gen.pad_id, np.int32)
            prompt[pad - n:] = req.prompt_ids
            self.key, kp = jax.random.split(self.key)
            bk, bv, first = self._admit_fn(pad)(
                self.gen.params, self.cache.k, self.cache.v,
                jnp.asarray(prompt), jnp.int32(pad - n), jnp.int32(self.pos),
                jnp.int32(row), kp)
            self.cache = type(self.cache)(k=bk, v=bv, pos=self.cache.pos)
            first = int(first[0])
            req.first_token_at = time.perf_counter()
            self.row_req[row] = req
            self.row_start[row] = self.pos - n
            self.recent[row] = -1
            self.recent[row, -1] = first
            if first in self.eos_ids:
                self._finish_row(row)
            else:
                req.tokens.append(first)
                self.last[row] = first
                self.active[row] = True

    def _finish_row(self, row: int) -> None:
        req = self.row_req[row]
        req.done = True
        req.done_at = time.perf_counter()
        self.completed.append(req)
        self.row_req[row] = None
        self.active[row] = False

    # ----------------------------------------------------------------- loop

    def step(self) -> bool:
        """Admit waiting requests, then decode one span. Returns True if
        any work remains queued or in flight."""
        self._try_admit()
        if not self.active.any():
            return bool(self.queue)
        self.key, ks = jax.random.split(self.key)
        finished = jnp.asarray(~self.active)
        tokens, lengths, self.cache, recent, fin, last = self._span_fn()(
            self.gen.params, self.cache, jnp.asarray(self.last),
            jnp.asarray(self.recent), finished,
            jnp.asarray(self.row_start), ks)
        tokens = np.asarray(tokens)
        lengths = np.asarray(lengths)
        self.recent = np.array(recent)  # writable copies: admission edits rows
        self.last = np.array(last)
        fin = np.asarray(fin)
        self.pos += self.span  # early_exit=False: pos advances by span
        for row in range(self.b):
            if not self.active[row]:
                continue
            req = self.row_req[row]
            got = tokens[row][: int(lengths[row])]
            room = req.max_new - len(req.tokens)
            req.tokens.extend(int(t) for t in got[:room])
            if fin[row] or len(req.tokens) >= req.max_new:
                self._finish_row(row)
        return bool(self.queue) or bool(self.active.any())

    def run_until_idle(self, max_spans: int = 10_000) -> list[Request]:
        for _ in range(max_spans):
            if not self.step():
                break
        return self.completed
