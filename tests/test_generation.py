"""Logits processor parity vs the reference processors, plus engine edges."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from cleantransformer_tpu.generation.logits_process import (
    temperature_wrap, top_k_wrap, top_p_wrap, no_repeat_ngram,
)


def _scores(seed=0, b=3, v=20):
    g = torch.Generator().manual_seed(seed)
    return torch.randn(b, v, generator=g)


def test_temperature_matches_reference():
    from CleanTransformer.generation.logits_processor import TemperatureLogitsWrapper
    s = _scores()
    expected = TemperatureLogitsWrapper(0.7)(None, s.clone())
    got = temperature_wrap(jnp.asarray(s.numpy()), 0.7)
    np.testing.assert_allclose(np.asarray(got), expected.numpy(), rtol=1e-6)
    # the 1e-2 temperature floor (logits_processor.py:37)
    expected_floor = TemperatureLogitsWrapper(1e-5)(None, s.clone())
    got_floor = temperature_wrap(jnp.asarray(s.numpy()), 1e-5)
    np.testing.assert_allclose(np.asarray(got_floor), expected_floor.numpy(), rtol=1e-5)


def test_top_k_matches_reference():
    from CleanTransformer.generation.logits_processor import TopKLogitsWrapper
    s = _scores(1)
    expected = TopKLogitsWrapper(5)(None, s.clone()).numpy()
    got = np.asarray(top_k_wrap(jnp.asarray(s.numpy()), 5))
    finite = np.isfinite(expected)
    assert (np.isfinite(got) == finite).all()
    np.testing.assert_allclose(got[finite], expected[finite], rtol=1e-6)


def test_top_p_matches_reference():
    from CleanTransformer.generation.logits_processor import TopPLogitsWrapper
    for seed, p in [(2, 0.8), (3, 0.5), (4, 0.95)]:
        s = _scores(seed)
        expected = TopPLogitsWrapper(p)(None, s.clone()).numpy()
        got = np.asarray(top_p_wrap(jnp.asarray(s.numpy()), p))
        finite = np.isfinite(expected)
        assert (np.isfinite(got) == finite).all(), f"seed={seed} p={p}"
        np.testing.assert_allclose(got[finite], expected[finite], rtol=1e-6)


def test_no_repeat_ngram_matches_reference():
    from CleanTransformer.generation.logits_processor import NoRepeatNGramLogitsProcessor
    g = torch.Generator().manual_seed(5)
    for n in (2, 3):
        ids = torch.randint(0, 6, (3, 14), generator=g)  # small vocab => repeats
        s = _scores(6, b=3, v=6)
        expected = NoRepeatNGramLogitsProcessor(n)(ids, s.clone()).numpy()
        T = 20  # fixed buffer larger than cur_len
        buf = jnp.zeros((3, T), jnp.int32).at[:, :14].set(jnp.asarray(ids.numpy()))
        got = np.asarray(no_repeat_ngram(buf, jnp.asarray(14), jnp.asarray(s.numpy()), n))
        finite = np.isfinite(expected)
        assert (np.isfinite(got) == finite).all(), f"n={n}"
        np.testing.assert_allclose(got[finite], expected[finite], rtol=1e-6)


def test_no_repeat_ngram_short_sequence_no_ban():
    buf = jnp.zeros((2, 10), jnp.int32)
    s = jnp.ones((2, 7))
    got = no_repeat_ngram(buf, jnp.asarray(1), s, 3)  # cur_len < n
    assert np.isfinite(np.asarray(got)).all()


def test_sampling_respects_top_k():
    """Sampled tokens must come from the top-k set."""
    import jax
    s = jnp.asarray(_scores(9, b=4, v=50).numpy())
    filtered = top_k_wrap(s, 5)
    toks = jax.random.categorical(jax.random.PRNGKey(0), filtered, axis=-1,
                                  shape=(64, 4))
    allowed = np.asarray(jnp.argsort(-s, axis=-1)[:, :5])
    for b in range(4):
        assert set(np.asarray(toks)[:, b]).issubset(set(allowed[b]))


def test_generate_rejects_beyond_n_positions():
    """GPT (learned position embeddings) must fail loudly when prompt +
    max_gen_len exceeds n_positions — the torch reference raises an index
    error; under jit the gather would silently clamp."""
    import jax
    import pytest
    from cleantransformer_tpu.config import GPTConfig
    from cleantransformer_tpu.models.gpt import GPTLMHeadModel
    cfg = GPTConfig(vocab_size=67, n_embd=32, n_positions=16, n_layer=1,
                    n_head=4, n_ctx=16)
    m = GPTLMHeadModel(cfg, version="gpt2", rng=jax.random.PRNGKey(0))
    ids = jnp.ones((1, 8), jnp.int32)
    with pytest.raises(ValueError, match="n_positions"):
        m.generate(ids, generation_configs={"beam_size": 1, "max_gen_len": 20,
                                            "do_sample": False})
    # within bounds still works (8 + 6 + 2 = 16)
    out = m.generate(ids, generation_configs={"beam_size": 1, "max_gen_len": 6,
                                              "do_sample": False})
    assert np.asarray(out).shape[-1] <= 16


def test_cache_factory_not_bound():
    """The generation engine's static cache factory must be a module-level
    function shared across instances — a bound method would (a) pin the
    model's params in the jit cache (HBM leak: the round-2 bench OOMed on
    exactly this) and (b) retrace per instance."""
    from cleantransformer_tpu.generation.engine import cache_factory
    from cleantransformer_tpu.config import GPTConfig
    from cleantransformer_tpu.models.gpt import GPTLMHeadModel, init_kv_cache
    cfg = dict(vocab_size=64, n_embd=32, n_positions=64, n_layer=2, n_head=2)
    m1 = GPTLMHeadModel(GPTConfig(**cfg), version="gpt2", rng=jax.random.PRNGKey(0))
    m2 = GPTLMHeadModel(GPTConfig(**cfg), version="gpt2", rng=jax.random.PRNGKey(1))
    f1, f2 = cache_factory(m1), cache_factory(m2)
    assert f1 is f2 is init_kv_cache
    assert getattr(f1, "__self__", None) is None
