"""Head-major (L, B, T, Dkv) llama decode cache (config.decode_head_major).

The per-(layer, head) KV-cache writes of the (L, B, Hkv, T, hd) layout cost
~0.2 us per scattered half-lane tile-run on hardware (35% of a tinyllama b32
step, BENCH_DETAILS.md); the head-major layout writes ONE contiguous-lane
row per (layer, batch) and runs S==1 attention straight on the slab via a
block-diagonal query expansion (models/llama.py _gqa_attend_headmajor).
These tests pin exact token equality vs the standard path (fp32) across
GQA, left padding, sliding window, MoE blocks, and the dense-layout
fallbacks (beam, batched speculative).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cleantransformer_tpu.config import LlamaConfig
from cleantransformer_tpu.models.llama import LlamaForCausalLM

BASE = dict(vocab_size=131, hidden_size=64, intermediate_size=128,
            num_hidden_layers=3, num_attention_heads=8,
            num_key_value_heads=2, max_position_embeddings=128)
GEN = {"beam_size": 1, "max_gen_len": 12, "do_sample": False,
       "end_ids": None, "pad_id": 0, "no_repeat_ngram_size": 0}


def _pair(seed=0, **kw):
    m0 = LlamaForCausalLM(LlamaConfig(**BASE, **kw),
                          rng=jax.random.PRNGKey(seed))
    m1 = LlamaForCausalLM(LlamaConfig(**BASE, **kw, decode_head_major=True),
                          params=m0.params)
    return m0, m1


def _inputs(bsz=3, seq=7, seed=0):
    rs = np.random.RandomState(seed)
    ids = rs.randint(1, BASE["vocab_size"], (bsz, seq)).astype(np.int32)
    mask = np.ones_like(ids)
    mask[1, :3] = 0  # left-padded row
    return ids, mask


def test_head_major_greedy_token_equality():
    m0, m1 = _pair()
    ids, mask = _inputs()
    out0 = np.asarray(m0.generate(ids, mask, generation_configs=GEN))
    out1 = np.asarray(m1.generate(ids, mask, generation_configs=GEN))
    np.testing.assert_array_equal(out0, out1)


def test_head_major_cache_layout():
    _, m1 = _pair()
    cache = m1.init_cache(3, 16)
    Hkv, hd = BASE["num_key_value_heads"], 64 // BASE["num_attention_heads"]
    assert cache["k"].shape == (3, 3, 16, Hkv * hd)
    from cleantransformer_tpu.generation.engine import cache_factory
    dense = cache_factory(m1, dense=True)(m1.config, 3, 16)
    assert dense["k"].shape == (3, 3, Hkv, 16, hd)


def test_head_major_sliding_window():
    m0, m1 = _pair(seed=1, sliding_window=6)
    ids, mask = _inputs(seed=1)
    out0 = np.asarray(m0.generate(ids, mask, generation_configs=GEN))
    out1 = np.asarray(m1.generate(ids, mask, generation_configs=GEN))
    np.testing.assert_array_equal(out0, out1)


def test_head_major_mha_no_gqa():
    # Hkv == H exercises group size 1 in the block-diagonal expansion
    m0 = LlamaForCausalLM(
        LlamaConfig(**{**BASE, "num_key_value_heads": 8}),
        rng=jax.random.PRNGKey(2))
    m1 = LlamaForCausalLM(
        LlamaConfig(**{**BASE, "num_key_value_heads": 8},
                    decode_head_major=True), params=m0.params)
    ids, mask = _inputs(seed=2)
    out0 = np.asarray(m0.generate(ids, mask, generation_configs=GEN))
    out1 = np.asarray(m1.generate(ids, mask, generation_configs=GEN))
    np.testing.assert_array_equal(out0, out1)


def test_head_major_beam_takes_dense_layout():
    m0, m1 = _pair(seed=3)
    ids, mask = _inputs(seed=3)
    cfg = {**GEN, "beam_size": 2}
    out0 = np.asarray(m0.generate(ids, mask, generation_configs=cfg))
    out1 = np.asarray(m1.generate(ids, mask, generation_configs=cfg))
    np.testing.assert_array_equal(out0, out1)


def test_head_major_sampling_path():
    # sampling shares the fused while_loop; same rng => same tokens
    m0, m1 = _pair(seed=4)
    ids, _ = _inputs(bsz=2, seed=4)
    cfg = {**GEN, "do_sample": True, "top_k": 5, "temperature": 0.9}
    r = np.asarray([0, 1234], np.uint32)
    out0 = np.asarray(m0.generate(ids, generation_configs=cfg, rng=r))
    out1 = np.asarray(m1.generate(ids, generation_configs=cfg, rng=r))
    np.testing.assert_array_equal(out0, out1)


def test_head_major_moe_decode():
    base = dict(BASE, num_local_experts=4, num_experts_per_tok=2,
                moe_impl="dense")
    m0 = LlamaForCausalLM(LlamaConfig(**base), rng=jax.random.PRNGKey(5))
    m1 = LlamaForCausalLM(LlamaConfig(**base, decode_head_major=True),
                          params=m0.params)
    ids, mask = _inputs(seed=5)
    out0 = np.asarray(m0.generate(ids, mask, generation_configs=GEN))
    out1 = np.asarray(m1.generate(ids, mask, generation_configs=GEN))
    np.testing.assert_array_equal(out0, out1)


@pytest.mark.slow
def test_head_major_serving_parity():
    """ServingEngine on a head-major llama: ragged per-row offsets through
    _gqa_attend_headmajor — every request's greedy output must equal the
    standalone generate() output."""
    from cleantransformer_tpu.serving import ServingEngine
    m = LlamaForCausalLM(LlamaConfig(**BASE, decode_head_major=True),
                         rng=jax.random.PRNGKey(7))
    eng = ServingEngine(m, max_slots=2, max_len=64, prefill_buckets=(16,),
                        chunk_size=8)
    assert eng.state["cache_k"].ndim == 4  # head-major layout picked up
    rs = np.random.RandomState(7)
    prompts = [rs.randint(1, BASE["vocab_size"], (n,)).tolist()
               for n in (3, 7, 12, 5)]
    want = {}
    for p in prompts:
        out = m.generate(np.asarray(p, np.int32)[None], generation_configs={
            "beam_size": 1, "max_gen_len": 10, "do_sample": False,
            "end_ids": None, "pad_id": 0})
        want[tuple(p)] = np.asarray(out)[0, 0][:len(p) + 10]
    rid2p = {eng.submit(p, max_new_tokens=10): p for p in prompts}
    for rid, tokens in eng.run():
        p = rid2p[rid]
        np.testing.assert_array_equal(tokens[:len(p) + 10], want[tuple(p)])


def test_head_major_ragged_multi_token_window():
    """(B,) per-row offsets with S>1 (batched-speculative-style verify
    windows) on a head-major cache: the rank-4 cache_write ragged branch
    must produce the same logits as the dense 5D layout."""
    m0, m1 = _pair(seed=8)
    fwd = m0.forward_fn()
    rs = np.random.RandomState(8)
    B, S0, W, total = 2, 5, 3, 16
    ids = rs.randint(1, BASE["vocab_size"], (B, S0 + W)).astype(np.int32)

    def run(model, cfg):
        cache = model.init_cache(B, total)
        mask = np.zeros((B, total), np.int32)
        mask[:, :S0] = 1
        pos = np.arange(S0, dtype=np.int32)[None].repeat(B, 0)
        (_, _), cache = fwd(model.params, cfg, ids[:, :S0], mask, pos, None,
                            cache)
        # ragged continuation: row 0 at offset S0, row 1 rewound to S0-1
        offs = np.asarray([S0, S0 - 1], np.int32)
        cache = {**cache, "length": jnp.asarray(offs)}
        mask2 = np.zeros((B, total), np.int32)
        mask2[0, :S0 + W] = 1
        mask2[1, :S0 - 1 + W] = 1
        pos2 = offs[:, None] + np.arange(W, dtype=np.int32)[None]
        (lg, _), cache = fwd(model.params, cfg, ids[:, S0:], mask2,
                             pos2.astype(np.int32), None, cache)
        return np.asarray(lg)

    a = run(m0, m0.config)
    b = run(m1, m1.config)
    np.testing.assert_allclose(a, b, atol=2e-6, rtol=1e-5)


def test_head_major_multi_token_cached_window():
    """S>1 cached forwards (speculative verify windows) take the generic 4D
    path — logits must match the standard cache layout exactly."""
    from cleantransformer_tpu.models.llama import llama_lm_forward
    m0, m1 = _pair(seed=6)
    cfg0, cfg1 = m0.config, m1.config
    rs = np.random.RandomState(6)
    B, S0, W = 2, 6, 4
    ids = rs.randint(1, BASE["vocab_size"], (B, S0 + W)).astype(np.int32)
    total = 16
    fwd = m0.forward_fn()

    def run(model, cfg):
        cache = model.init_cache(B, total)
        mask = np.zeros((B, total), np.int32)
        mask[:, :S0] = 1
        pos = np.arange(S0, dtype=np.int32)[None].repeat(B, 0)
        (lg1, _), cache = fwd(model.params, cfg, ids[:, :S0], mask, pos,
                              None, cache)
        mask2 = np.zeros((B, total), np.int32)
        mask2[:, :S0 + W] = 1
        pos2 = (S0 + np.arange(W, dtype=np.int32))[None].repeat(B, 0)
        (lg2, _), cache = fwd(model.params, cfg, ids[:, S0:], mask2, pos2,
                              None, cache)
        return np.asarray(lg1), np.asarray(lg2)

    a1, a2 = run(m0, cfg0)
    b1, b2 = run(m1, cfg1)
    np.testing.assert_allclose(a1, b1, atol=2e-6, rtol=1e-5)
    np.testing.assert_allclose(a2, b2, atol=2e-6, rtol=1e-5)
