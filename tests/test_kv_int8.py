"""int8 KV cache (config.kv_cache_int8): quantized cache vs fp cache."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cleantransformer_tpu.config import BloomConfig, GPTConfig
from cleantransformer_tpu.models.bloom import BloomForCausalLM
from cleantransformer_tpu.models.gpt import GPTLMHeadModel, init_kv_cache


def test_cache_layout_and_memory():
    cfg = GPTConfig(vocab_size=97, n_embd=64, n_positions=128, n_layer=2,
                    n_head=2, kv_cache_int8=True)
    cache = init_kv_cache(cfg, 3, 16)
    assert cache["k"]["q"].dtype == jnp.int8
    assert cache["k"]["s"].shape == (2, 3, 2, 16)
    dense = init_kv_cache(GPTConfig(vocab_size=97, n_embd=64, n_positions=128,
                                    n_layer=2, n_head=2), 3, 16)
    int8_bytes = sum(x.size * x.dtype.itemsize
                     for x in jax.tree_util.tree_leaves(cache))
    fp_bytes = sum(x.size * x.dtype.itemsize
                   for x in jax.tree_util.tree_leaves(dense))
    assert int8_bytes < 0.6 * fp_bytes  # ~half + scales


@pytest.mark.parametrize("family", ["gpt", "bloom"])
def test_int8_cached_decode_close_to_fp(family):
    rs = np.random.RandomState(0)
    if family == "gpt":
        mk = lambda **kw: GPTLMHeadModel(
            GPTConfig(vocab_size=211, n_embd=64, n_positions=256, n_layer=3,
                      n_head=2, **kw), version="gpt2",
            rng=jax.random.PRNGKey(0))
    else:
        def mk(**kw):
            m = BloomForCausalLM(
                BloomConfig(vocab_size=211, hidden_size=64, n_layer=3,
                            num_attention_heads=2, **kw),
                rng=jax.random.PRNGKey(0))
            m._tie_weight()
            return m
    m_fp = mk()
    m_q = mk(kv_cache_int8=True)
    m_q.params = m_fp.params

    ids = rs.randint(5, 200, (2, 9)).astype(np.int32)
    mask = np.ones((2, 9), np.int32)
    mask[1, :4] = 0
    gcfg = {"beam_size": 1, "max_gen_len": 10, "do_sample": False,
            "end_ids": None, "pad_id": 0, "no_repeat_ngram_size": 0}
    out_fp = np.asarray(m_fp.generate(jnp.asarray(ids), jnp.asarray(mask),
                                      generation_configs=gcfg))
    out_q = np.asarray(m_q.generate(jnp.asarray(ids), jnp.asarray(mask),
                                    generation_configs=gcfg))
    # int8 quantization perturbs logits slightly; on a random tiny model the
    # greedy argmax can legitimately flip, so assert strong agreement rather
    # than identity: the first generated tokens must match and most of the
    # trajectory should agree
    assert out_fp.shape == out_q.shape
    agree = (out_fp == out_q).mean()
    assert agree > 0.8, f"trajectory agreement {agree}"
    np.testing.assert_array_equal(out_fp[:, :, :10], out_q[:, :, :10])


def test_int8_cache_logits_close():
    """Single cached forward: int8-cache logits track the fp-cache logits."""
    cfg_fp = GPTConfig(vocab_size=131, n_embd=64, n_positions=128, n_layer=2,
                       n_head=2)
    cfg_q = GPTConfig(vocab_size=131, n_embd=64, n_positions=128, n_layer=2,
                      n_head=2, kv_cache_int8=True)
    m = GPTLMHeadModel(cfg_fp, version="gpt2", rng=jax.random.PRNGKey(1))
    rs = np.random.RandomState(1)
    ids = jnp.asarray(rs.randint(0, 131, (2, 12)), jnp.int32)
    mask = jnp.ones((2, 16), jnp.int32)

    from cleantransformer_tpu.models.gpt import gpt_lm_forward, init_kv_cache
    cache_fp = init_kv_cache(cfg_fp, 2, 16, dtype=jnp.float32)
    cache_q = init_kv_cache(cfg_q, 2, 16)
    (lg_fp, _), cfp = gpt_lm_forward(m.params, cfg_fp, ids, mask,
                                     cache=cache_fp, version="gpt2")
    (lg_q, _), cq = gpt_lm_forward(m.params, cfg_q, ids, mask,
                                   cache=cache_q, version="gpt2")
    # prefill logits only depend on the current tokens' k/v via the cache
    # readback — quantization error is bounded by the per-token scale
    rel = float(jnp.max(jnp.abs(lg_fp - lg_q)) /
                (jnp.max(jnp.abs(lg_fp)) + 1e-9))
    assert rel < 0.05, rel

    # one decode step from each cache
    nxt = jnp.asarray(rs.randint(0, 131, (2, 1)), jnp.int32)
    (d_fp, _), _ = gpt_lm_forward(m.params, cfg_fp, nxt, mask, cache=cfp,
                                  version="gpt2")
    (d_q, _), _ = gpt_lm_forward(m.params, cfg_q, nxt, mask, cache=cq,
                                 version="gpt2")
    rel = float(jnp.max(jnp.abs(d_fp - d_q)) /
                (jnp.max(jnp.abs(d_fp)) + 1e-9))
    assert rel < 0.05, rel


def test_serving_with_int8_cache():
    from cleantransformer_tpu.serving import ServingEngine
    cfg = GPTConfig(vocab_size=131, n_embd=64, n_positions=256, n_layer=2,
                    n_head=2, kv_cache_int8=True)
    model = GPTLMHeadModel(cfg, version="gpt2", rng=jax.random.PRNGKey(0))
    eng = ServingEngine(model, max_slots=2, max_len=64,
                        prefill_buckets=(16,), chunk_size=4)
    rs = np.random.RandomState(0)
    rids = [eng.submit(rs.randint(1, 130, (n,)).tolist(), max_new_tokens=6)
            for n in (5, 11)]
    done = dict(eng.run())
    assert set(done) == set(rids)
    for rid, toks in done.items():
        assert len(toks) >= 6


@pytest.mark.parametrize("family", ["gpt", "bloom"])
def test_int8_cache_flash_prefill_close_to_dense(family):
    """use_flash_attention + kv_cache_int8: multi-token cached forwards
    dequantize the int8 cache to a transient float view and ride the flash
    kernel instead of the O(S^2) dense fallback (the 4k-prompt prefill
    path); logits match the dense int8 path to float tolerance (scale
    folding order differs: q@(k_int*s) vs (q@k_int)*s)."""
    rs = np.random.RandomState(0)
    if family == "gpt":
        def mk(**kw):
            return GPTLMHeadModel(
                GPTConfig(vocab_size=211, n_embd=64, n_positions=256,
                          n_layer=2, n_head=2, kv_cache_int8=True, **kw),
                version="gpt2", rng=jax.random.PRNGKey(0))
    else:
        def mk(**kw):
            m = BloomForCausalLM(
                BloomConfig(vocab_size=211, hidden_size=64, n_layer=2,
                            num_attention_heads=2, kv_cache_int8=True, **kw),
                rng=jax.random.PRNGKey(0))
            m._tie_weight()
            return m
    m_dense = mk()
    m_flash = mk(use_flash_attention=True)
    m_flash.params = m_dense.params
    ids = rs.randint(5, 200, (2, 24)).astype(np.int32)
    mask = np.ones((2, 40), np.int32)

    def run(m):
        cache = m.init_cache(2, 40)
        (l1, _), cache = m.forward_fn()(m.params, m.config, ids[:, :16],
                                        mask, cache=cache)
        # chunked continuation at a nonzero offset (serving prefill shape)
        (l2, _), cache = m.forward_fn()(m.params, m.config, ids[:, 16:],
                                        mask, cache=cache)
        return np.asarray(l1), np.asarray(l2)

    a1, a2 = run(m_dense)
    b1, b2 = run(m_flash)
    np.testing.assert_allclose(a1, b1, atol=5e-5, rtol=1e-3)
    np.testing.assert_allclose(a2, b2, atol=5e-5, rtol=1e-3)
