"""Speculative decoding (ops/speculative.py + CausalLMGenerator
.generate_speculative): greedy exactness vs the plain decode path,
distribution preservation of the stochastic rejection-sampling scheme,
the exact RAS marginal, accept-rate accounting, and TP identity."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpu_audio.models.orpheus.model import CausalLMGenerator, DraftModel
from tpu_audio.nn import transformer
from tpu_audio.nn.transformer import TransformerConfig
from tpu_audio.ops.sampling import (SamplerConfig, sample, update_recent,
                                    warped_probs)
from tpu_audio.ops.speculative import propose_ngram, speculative_decode_loop

pytestmark = pytest.mark.slow  # engine e2e / parity / mesh

CFG = TransformerConfig(dim=32, n_layers=2, n_heads=4, n_kv_heads=2,
                        hidden_dim=64, vocab_size=48,
                        tie_word_embeddings=True)


def _params(seed=0):
    return transformer.init_params(jax.random.PRNGKey(seed), CFG)


def _noisy(params, scale, seed=9):
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(seed), len(leaves))
    out = [l + scale * jax.random.normal(k, l.shape, l.dtype)
           for l, k in zip(leaves, keys)]
    return jax.tree_util.tree_unflatten(treedef, out)


class TestGreedyExactness:
    """Greedy speculative output must EXACTLY equal the plain greedy chain
    — any accept-rule, residual, recent-window, or cache-rewind bug breaks
    this (the cache pos rewinds on every partial acceptance)."""

    def _check(self, draft, sampler, eos=(47,), max_new=24, gamma=3):
        params = _params(0)
        gen = CausalLMGenerator(params, CFG, max_cache=128)
        kw = dict(sampler=sampler, eos_ids=eos, max_new=max_new, seed=3)
        ref = gen.generate([3, 5, 7, 11], **kw)
        got = gen.generate_speculative([3, 5, 7, 11], gamma=gamma,
                                       draft=draft, **kw)
        assert got == ref and len(ref) > 0
        return gen

    def test_ngram_draft(self):
        self._check(None, SamplerConfig(temperature=0.0))

    def test_model_draft(self):
        draft = DraftModel(_noisy(_params(0), 0.05), CFG, max_cache=128)
        self._check(draft, SamplerConfig(temperature=0.0))

    def test_model_draft_with_repetition_penalty(self):
        draft = DraftModel(_noisy(_params(0), 0.05), CFG, max_cache=128)
        self._check(draft, SamplerConfig(temperature=0.0,
                                         repetition_penalty=1.3,
                                         repetition_window=8))

    def test_gamma_sweep(self):
        for gamma in (1, 2, 5, 8):
            self._check(None, SamplerConfig(temperature=0.0), gamma=gamma)

    def test_eos_truncation(self):
        params = _params(0)
        gen = CausalLMGenerator(params, CFG, max_cache=128)
        # penalty keeps the greedy chain non-degenerate so a later token
        # differs from the first and can serve as a mid-stream EOS
        sampler = SamplerConfig(temperature=0.0, repetition_penalty=1.5,
                                repetition_window=8)
        full = gen.generate([3, 5, 7, 11], sampler=sampler, eos_ids=(47,),
                            max_new=24, seed=3)
        idx = next(i for i, t in enumerate(full) if t not in full[:i] and i)
        eos = (full[idx],)  # forces an EOS at mid-stream position idx
        kw = dict(sampler=sampler, eos_ids=eos, max_new=24, seed=3)
        ref = gen.generate([3, 5, 7, 11], **kw)
        got = gen.generate_speculative([3, 5, 7, 11], gamma=4, **kw)
        assert got == ref == full[:idx]

    def test_self_draft_accepts_everything(self):
        """Draft == target ⇒ greedy drafts always match: accept rate 1.0
        and exactly gamma+1 tokens per iteration."""
        params = _params(0)
        gen = CausalLMGenerator(params, CFG, max_cache=128)
        draft = DraftModel(params, CFG, max_cache=128)
        kw = dict(sampler=SamplerConfig(temperature=0.0), eos_ids=(47,),
                  max_new=25, seed=3)
        ref = gen.generate([3, 5, 7, 11], **kw)
        got = gen.generate_speculative([3, 5, 7, 11], gamma=3, draft=draft,
                                       **kw)
        assert got == ref
        st = gen.last_spec_stats
        assert st["accept_rate"] == 1.0
        assert st["tokens_per_iteration"] == 4.0


class TestDistributionPreserved:
    """The marginal of the first speculatively-emitted token must equal the
    target's warped sampling distribution — computed exactly and compared
    against 4000 sampled runs, with a control asserting the draft's own
    distribution is far away (so sampling from the draft would fail)."""

    def _setup(self, sampler, ngram):
        params = _params(1)
        dparams = _noisy(params, 0.12)
        prompt = jnp.array([[3, 5, 7, 9]], jnp.int32)
        first = jnp.array([11], jnp.int32)
        second_last = jnp.array([9], jnp.int32)

        cache = transformer.make_cache(CFG, 1, 64, dtype=jnp.float32)
        _, cache = transformer.forward(params, CFG, prompt, cache)

        def t_step(toks, c):
            lg, c = transformer.forward(params, CFG, toks, c)
            return lg.astype(jnp.float32), c

        kw = dict(max_new_tokens=1, gamma=2, eos_ids=(999,), sampler=sampler)
        if ngram:
            hist = jnp.zeros((1, 32), jnp.int32).at[0, :4].set(prompt[0])
            run_kw = dict(history=hist, history_len=jnp.int32(4))
            d_step = None
        else:
            d_cache = transformer.make_cache(CFG, 1, 64, dtype=jnp.float32)
            _, d_cache = transformer.forward(dparams, CFG, prompt, d_cache)
            d_cache = dataclasses.replace(d_cache, pos=d_cache.pos - 1)

            def d_step(toks, c):
                lg, c = transformer.forward(dparams, CFG, toks, c)
                return lg.astype(jnp.float32), c

            run_kw = dict(draft_cache=d_cache)

        def run(key):
            return speculative_decode_loop(
                key, t_step, cache, first, second_last, draft_step=d_step,
                **run_kw, **kw).tokens[0, 0]

        # exact target distribution of the token after `first`
        lg, _ = t_step(first[:, None], cache)
        window = max(sampler.repetition_window, sampler.ras_window, 1)
        recent = update_recent(jnp.full((1, window), -1, jnp.int32),
                               first)
        p_exact = np.asarray(warped_probs(lg[:, 0], sampler, recent)[0])

        lg_d, _ = transformer.forward(
            dparams, CFG, jnp.concatenate([prompt, first[:, None]], 1),
            transformer.make_cache(CFG, 1, 64, dtype=jnp.float32))
        q_draft = np.asarray(
            warped_probs(lg_d[:, -1].astype(jnp.float32), sampler,
                         recent)[0])
        return run, p_exact, q_draft

    def _tv(self, a, b):
        return 0.5 * np.abs(a - b).sum()

    @pytest.mark.parametrize("sampler", [
        SamplerConfig(temperature=0.9),
        SamplerConfig(temperature=0.8, top_k=12, top_p=0.9),
        SamplerConfig(temperature=1.0, repetition_penalty=1.3,
                      repetition_window=8),
        SamplerConfig(temperature=1.0, top_k=20, ras=True, ras_window=6,
                      ras_max_repeats=1),
    ])
    def test_model_draft_matches_target_dist(self, sampler):
        run, p_exact, q_draft = self._setup(sampler, ngram=False)
        # the draft must be discriminably different or the test proves nothing
        assert self._tv(p_exact, q_draft) > 0.15
        n = 4000
        toks = np.asarray(jax.vmap(run)(
            jax.random.split(jax.random.PRNGKey(123), n)))
        emp = np.bincount(toks, minlength=CFG.vocab_size) / n
        assert self._tv(emp, p_exact) < 0.08
        assert self._tv(emp, q_draft) > self._tv(emp, p_exact)

    def test_ngram_draft_matches_target_dist(self):
        sampler = SamplerConfig(temperature=0.9)
        run, p_exact, _ = self._setup(sampler, ngram=True)
        n = 4000
        toks = np.asarray(jax.vmap(run)(
            jax.random.split(jax.random.PRNGKey(7), n)))
        emp = np.bincount(toks, minlength=CFG.vocab_size) / n
        assert self._tv(emp, p_exact) < 0.08


class TestRASMarginal:
    def test_marginal_matches_two_stage_sampler(self):
        """warped_probs' closed-form RAS marginal vs 40k empirical draws of
        the actual two-stage resampling sampler."""
        cfg = SamplerConfig(temperature=1.0, top_k=12, ras=True,
                            ras_window=6, ras_max_repeats=1)
        key = jax.random.PRNGKey(0)
        logits = jax.random.normal(key, (1, 32)) * 2.0
        # recent window where token 5 (high-logit, make it so) is saturated
        logits = logits.at[0, 5].set(jnp.max(logits) + 1.0)
        recent = jnp.array([[5, 5, 3, 5, 1, 5]], jnp.int32)
        p = np.asarray(warped_probs(logits, cfg, recent)[0])
        assert abs(p.sum() - 1.0) < 1e-5
        assert p[5] == 0.0  # saturated token can never survive RAS

        n = 40000
        toks = np.asarray(jax.vmap(
            lambda k: sample(k, logits, cfg, recent)[0])(
                jax.random.split(jax.random.PRNGKey(1), n)))
        emp = np.bincount(toks, minlength=32) / n
        assert 0.5 * np.abs(emp - p).sum() < 0.02

    def test_marginal_without_saturation_is_plain_warp(self):
        cfg = SamplerConfig(temperature=0.7, top_k=8, ras=True,
                            ras_window=6, ras_max_repeats=2)
        logits = jax.random.normal(jax.random.PRNGKey(3), (1, 32))
        recent = jnp.full((1, 6), -1, jnp.int32)
        no_ras = dataclasses.replace(cfg, ras=False)
        np.testing.assert_allclose(
            np.asarray(warped_probs(logits, cfg, recent)),
            np.asarray(warped_probs(logits, no_ras, recent)), atol=1e-6)


class TestNgramProposer:
    def test_bigram_match_preferred(self):
        hist = jnp.array([[4, 8, 2, 9, 4, 8, 3, 1, 4, 8, 0, 0]], jnp.int32)
        props = propose_ngram(hist, jnp.int32(10), jnp.array([4]),
                              jnp.array([8]), 3)
        # most recent (4,8) with a continuation is at idx 4..5 → 3, 1, 4
        assert props.tolist() == [[3, 1, 4]]

    def test_unigram_fallback(self):
        hist = jnp.array([[4, 8, 2, 9, 7, 6, 0, 0]], jnp.int32)
        props = propose_ngram(hist, jnp.int32(6), jnp.array([99]),
                              jnp.array([9]), 2)
        assert props.tolist() == [[7, 6]]

    def test_no_match_is_harmless(self):
        hist = jnp.array([[4, 8, 2, 9, 0, 0]], jnp.int32)
        props = propose_ngram(hist, jnp.int32(4), jnp.array([99]),
                              jnp.array([98]), 2)
        assert props.shape == (1, 2)


class TestSpeculativeTP:
    """generate_speculative under tensor parallelism: GSPMD (bf16) and
    shard_map (quantized) modes must be token-identical to single-device."""

    def test_tp_bf16_identical(self):
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        from tpu_audio.parallel import make_mesh

        cfg = TransformerConfig(dim=64, n_layers=2, n_heads=8, n_kv_heads=8,
                                hidden_dim=128, vocab_size=97)
        params = transformer.init_params(jax.random.PRNGKey(3), cfg)
        draft = DraftModel(_noisy(params, 0.05), cfg, max_cache=64)
        kw = dict(sampler=SamplerConfig(temperature=0.0), eos_ids=(96,),
                  max_new=12, seed=0, gamma=3, draft=draft)
        ref = CausalLMGenerator(params, cfg, max_cache=64)\
            .generate_speculative([5, 7, 11], **kw)
        got = CausalLMGenerator(params, cfg, max_cache=64,
                                mesh=make_mesh(dp=1, tp=8))\
            .generate_speculative([5, 7, 11], **kw)
        assert got == ref and len(ref) > 0

    def test_tp_quant_shard_map_identical(self):
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        from tpu_audio.ops import quant
        from tpu_audio.parallel import make_mesh

        cfg = TransformerConfig(dim=32, n_layers=2, n_heads=4, n_kv_heads=2,
                                hidden_dim=64, vocab_size=96,
                                tie_word_embeddings=True)
        params = transformer.init_params(jax.random.PRNGKey(0), cfg)
        qp = jax.tree_util.tree_map(lambda x: x, params)
        for sub, names in (("attn", ("q", "k", "v", "o")),
                           ("mlp", ("gate", "up", "down"))):
            for name in names:
                w = np.asarray(params["layers"][sub][name]["weight"])
                d = quant.quantize_array_int8(w)
                qp["layers"][sub][name] = {k: jnp.asarray(v)
                                           for k, v in d.items()}

        draft = DraftModel(params, cfg, max_cache=64)  # bf16 draft, quant target
        kw = dict(sampler=SamplerConfig(temperature=0.0), eos_ids=(95,),
                  max_new=12, seed=4, gamma=3, draft=draft)
        single = CausalLMGenerator(qp, cfg, max_cache=64)
        ref = single.generate_speculative([3, 5, 7], **kw)
        gen = CausalLMGenerator(qp, cfg, max_cache=64,
                                mesh=make_mesh(dp=4, tp=2))
        assert gen._axis == "tp"
        got = gen.generate_speculative([3, 5, 7], **kw)
        assert got == ref and len(ref) > 0

    def test_tp_quant_ngram_identical(self):
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        from tpu_audio.ops import quant
        from tpu_audio.parallel import make_mesh

        cfg = TransformerConfig(dim=32, n_layers=2, n_heads=4, n_kv_heads=2,
                                hidden_dim=64, vocab_size=96,
                                tie_word_embeddings=True)
        params = transformer.init_params(jax.random.PRNGKey(0), cfg)
        qp = jax.tree_util.tree_map(lambda x: x, params)
        for sub, names in (("attn", ("q", "k", "v", "o")),
                           ("mlp", ("gate", "up", "down"))):
            for name in names:
                w = np.asarray(params["layers"][sub][name]["weight"])
                d = quant.quantize_array_int8(w)
                qp["layers"][sub][name] = {k: jnp.asarray(v)
                                           for k, v in d.items()}
        kw = dict(sampler=SamplerConfig(temperature=0.0), eos_ids=(95,),
                  max_new=12, seed=4, gamma=4)
        ref = CausalLMGenerator(qp, cfg, max_cache=64)\
            .generate_speculative([3, 5, 7], **kw)
        got = CausalLMGenerator(qp, cfg, max_cache=64,
                                mesh=make_mesh(dp=4, tp=2))\
            .generate_speculative([3, 5, 7], **kw)
        assert got == ref and len(ref) > 0


class TestCosyVoiceNgramSpeculative:
    """The 0.5B CosyVoice LM's n-gram self-drafting path: greedy equality
    with the plain decode (incl. the min-length EOS logit processor),
    and a stochastic RAS run completing sanely."""

    def _gen(self):
        from tpu_audio.models.cosyvoice2 import lm as lm_mod
        from tpu_audio.nn import transformer as tr

        qwen = tr.TransformerConfig(
            dim=48, n_layers=2, n_heads=4, n_kv_heads=2, hidden_dim=96,
            vocab_size=400, attn_qkv_bias=True, tie_word_embeddings=True)
        cfg = lm_mod.CosyLMConfig(qwen=qwen, llm_input_size=48,
                                  speech_token_size=60)
        params = lm_mod.init_params(jax.random.PRNGKey(0), cfg)
        return lm_mod.CosyLMGenerator(params, cfg, max_cache=256)

    def test_greedy_ngram_matches_plain(self):
        gen = self._gen()
        kw = dict(text_ids=[5, 9, 3, 7], prompt_text_ids=[2, 4],
                  prompt_speech_tokens=[11, 12, 13, 11, 12], seed=1,
                  sampler=SamplerConfig(temperature=0.0), max_new=32)
        ref = gen.generate(**kw)
        got = gen.generate(speculative="ngram", gamma=3, **kw)
        assert got == ref and len(ref) > 0

    def test_ras_sampler_runs(self):
        from tpu_audio.models.cosyvoice2 import lm as lm_mod

        gen = self._gen()
        out = gen.generate([5, 9, 3], [2], [11, 12, 13], seed=2,
                           sampler=lm_mod.RAS_SAMPLER, max_new=32,
                           speculative="ngram", gamma=4)
        assert all(0 <= t < 60 for t in out)


class TestFusedDraft:
    """Speculative decode with the DRAFT on the fused whole-stack kernel
    (T=1 chain + the T=2 re-deposit as two sequential launches): greedy
    speculative output must still exactly equal the plain greedy chain."""

    def test_greedy_exact_with_fused_draft(self, monkeypatch):
        import functools

        from tpu_audio.ops.pallas import fused_step

        cfg = TransformerConfig(
            dim=128, n_layers=2, n_heads=2, n_kv_heads=1, hidden_dim=512,
            vocab_size=300, tie_word_embeddings=True)
        params = transformer.fuse_fp_tree(
            transformer.init_params(jax.random.PRNGKey(0), cfg))
        dparams = transformer.fuse_fp_tree(
            _noisy(transformer.init_params(jax.random.PRNGKey(0), cfg),
                   0.05))
        gen = CausalLMGenerator(params, cfg, max_cache=128)
        kw = dict(sampler=SamplerConfig(temperature=0.0), eos_ids=(299,),
                  max_new=16, seed=3)
        ref = gen.generate([3, 5, 7], **kw)

        calls = {"n": 0}
        real = fused_step.fused_decode_step

        def counting(*a, **k):
            calls["n"] += 1
            return real(*a, interpret=True, **k)

        monkeypatch.setattr(fused_step, "fused_decode_step", counting)
        monkeypatch.setattr(fused_step, "choose_mode",
                            lambda c, p, *a, **k: "plain")
        draft = DraftModel(dparams, cfg, max_cache=128)
        gen2 = CausalLMGenerator(params, cfg, max_cache=128)
        got = gen2.generate_speculative([3, 5, 7], gamma=3, draft=draft,
                                        **kw)
        assert got == ref, (got, ref)
        assert calls["n"] > 0, "fused draft path never engaged"
