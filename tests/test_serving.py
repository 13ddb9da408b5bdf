"""Continuous batching (api/serving.py): rolling admission into a static
batch must reproduce single-stream decode exactly (greedy), keep rows
independent, and respect per-request limits."""

import jax
import numpy as np
import pytest

from tpu_audio.api.serving import ContinuousBatcher, Request
from tpu_audio.models.orpheus.model import CausalLMGenerator
from tpu_audio.nn import transformer
from tpu_audio.nn.transformer import TransformerConfig
from tpu_audio.ops.sampling import SamplerConfig

pytestmark = pytest.mark.slow  # engine e2e / parity / mesh

CFG = TransformerConfig(dim=32, n_layers=2, n_heads=4, n_kv_heads=2,
                        hidden_dim=64, vocab_size=48,
                        tie_word_embeddings=True)


@pytest.fixture(scope="module")
def gen():
    params = transformer.init_params(jax.random.PRNGKey(0), CFG)
    return CausalLMGenerator(params, CFG, max_cache=512)


PROMPTS = [[3, 5, 7], [2, 4, 6, 8, 10], [9, 1], [11, 3, 5, 2],
           [7, 7, 2, 9, 4, 1], [1, 2, 3]]


class TestContinuousBatching:
    def _reference(self, gen, sampler, eos, max_new):
        return [gen.generate(p, sampler=sampler, eos_ids=eos,
                             max_new=max_new) for p in PROMPTS]

    @pytest.mark.parametrize("sampler", [
        SamplerConfig(temperature=0.0),
        SamplerConfig(temperature=0.0, repetition_penalty=1.4,
                      repetition_window=6),
    ])
    def test_greedy_rows_match_single_stream(self, gen, sampler):
        """Every request decoded through rolling admission must equal its
        single-stream generate() exactly — admission scatters prompt KV at
        an arbitrary shared position, so this verifies the masked-exact
        left-pad property end to end."""
        eos, max_new = (47,), 20
        ref = self._reference(gen, sampler, eos, max_new)
        batcher = ContinuousBatcher(gen, batch=2, span=4, sampler=sampler,
                                    eos_ids=eos, prompt_bucket=8)
        for p in PROMPTS:
            batcher.submit(Request(list(p), max_new=max_new))
        done = batcher.run_until_idle()
        assert len(done) == len(PROMPTS)
        got = {tuple(r.prompt_ids): r.tokens for r in done}
        for p, want in zip(PROMPTS, ref):
            assert got[tuple(p)] == want, f"prompt {p}"

    def test_staggered_arrivals(self, gen):
        """Requests submitted while others are mid-flight still decode
        exactly; no head-of-line blocking (a short request admitted late
        completes without waiting for the long one)."""
        sampler = SamplerConfig(temperature=0.0)
        eos = (47,)
        ref = self._reference(gen, sampler, eos, 16)
        batcher = ContinuousBatcher(gen, batch=2, span=4, sampler=sampler,
                                    eos_ids=eos, prompt_bucket=8)
        batcher.submit(Request(list(PROMPTS[0]), max_new=16))
        batcher.submit(Request(list(PROMPTS[1]), max_new=16))
        steps = 0
        submitted = 2
        while batcher.step() or submitted < len(PROMPTS):
            steps += 1
            if submitted < len(PROMPTS):  # trickle in one per span
                batcher.submit(Request(list(PROMPTS[submitted]), max_new=16))
                submitted += 1
            assert steps < 200
        got = {tuple(r.prompt_ids): r.tokens for r in batcher.completed}
        for p, want in zip(PROMPTS, ref):
            assert got[tuple(p)] == want, f"prompt {p}"

    def test_max_new_truncation(self, gen):
        sampler = SamplerConfig(temperature=0.0)
        batcher = ContinuousBatcher(gen, batch=2, span=4, sampler=sampler,
                                    eos_ids=(47,), prompt_bucket=8)
        batcher.submit(Request([3, 5, 7], max_new=5))
        done = batcher.run_until_idle()
        full = gen.generate([3, 5, 7], sampler=sampler, eos_ids=(47,),
                            max_new=5)
        assert done[0].tokens == full
        assert len(done[0].tokens) <= 5

    def test_ring_exhaustion_drains(self, gen_small=None):
        params = transformer.init_params(jax.random.PRNGKey(0), CFG)
        small = CausalLMGenerator(params, CFG, max_cache=48)
        sampler = SamplerConfig(temperature=0.0)
        batcher = ContinuousBatcher(small, batch=2, span=4, sampler=sampler,
                                    eos_ids=(47,), prompt_bucket=8)
        for p in PROMPTS:
            batcher.submit(Request(list(p), max_new=8))
        batcher.run_until_idle()
        # ring too small for all 6: completes some, leaves the rest queued
        # rather than corrupting state
        assert len(batcher.completed) >= 2
        for r in batcher.completed:
            want = small.generate(r.prompt_ids, sampler=sampler,
                                  eos_ids=(47,), max_new=8)
            assert r.tokens == want

    def test_latency_accounting(self, gen):
        batcher = ContinuousBatcher(gen, batch=2, span=4,
                                    sampler=SamplerConfig(temperature=0.0),
                                    eos_ids=(47,), prompt_bucket=8)
        batcher.submit(Request([3, 5, 7], max_new=6))
        done = batcher.run_until_idle()
        r = done[0]
        assert r.done and r.first_token_at >= r.arrival
        assert r.done_at >= r.first_token_at
