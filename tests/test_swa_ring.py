"""Sliding-window RING cache (config.swa_ring_cache, models/llama.py).

A Mistral-class model with sliding_window=W never attends past the last W
positions, so the KV cache only needs ~W rows: writes land at position % R
and the masks map ring slots back to absolute positions. These tests pin
exact token equality (and logit closeness) against the masked FULL-buffer
path — the semantics the HF-parity suite (test_llama.py
test_mistral_sliding_window_parity) already anchors to HF Mistral — across
wrap-around decode, padded prompts, head-major and dense layouts, rounding
(window not a multiple of 8), prompts longer than the window, and beam.
"""

import numpy as np
import pytest

import jax

from cleantransformer_tpu.config import LlamaConfig
from cleantransformer_tpu.models.llama import (
    LlamaForCausalLM, swa_ring_rows, llama_lm_forward)

BASE = dict(vocab_size=131, hidden_size=64, intermediate_size=128,
            num_hidden_layers=3, num_attention_heads=8,
            num_key_value_heads=2, max_position_embeddings=256)


def _gen(n=24):
    return {"beam_size": 1, "max_gen_len": n, "do_sample": False,
            "end_ids": None, "pad_id": 0, "no_repeat_ngram_size": 0}


def _pair(seed=0, window=8, head_major=False, **kw):
    full = LlamaForCausalLM(
        LlamaConfig(**BASE, sliding_window=window,
                    decode_head_major=head_major, **kw),
        rng=jax.random.PRNGKey(seed))
    ring = LlamaForCausalLM(
        LlamaConfig(**BASE, sliding_window=window, swa_ring_cache=True,
                    decode_head_major=head_major, **kw),
        params=full.params)
    return full, ring


def _inputs(bsz=3, seq=7, seed=0, pad=True):
    rs = np.random.RandomState(seed)
    ids = rs.randint(1, BASE["vocab_size"], (bsz, seq)).astype(np.int32)
    mask = np.ones_like(ids)
    if pad:
        mask[1, :3] = 0
    return ids, mask


def test_ring_capacity():
    cfg = LlamaConfig(**BASE, sliding_window=12, swa_ring_cache=True)
    assert swa_ring_rows(cfg, 100) == 16       # rounds 12 -> 16
    assert swa_ring_rows(cfg, 10) == 10        # capped by the horizon
    m = LlamaForCausalLM(cfg, rng=jax.random.PRNGKey(0))
    cache = m.init_cache(2, 100)
    assert cache["k"].shape[3] == 16           # (L, B, Hkv, R, hd)


def test_ring_decode_token_equality_past_wrap():
    # gen 24 from prompt 7 with window 8: positions reach ~31, wrapping the
    # 8-row ring 3+ times
    full, ring = _pair()
    ids, mask = _inputs()
    out0 = np.asarray(full.generate(ids, mask, generation_configs=_gen()))
    out1 = np.asarray(ring.generate(ids, mask, generation_configs=_gen()))
    np.testing.assert_array_equal(out0, out1)


def test_ring_decode_head_major():
    full, ring = _pair(seed=1, head_major=True)
    ids, mask = _inputs(seed=1)
    out0 = np.asarray(full.generate(ids, mask, generation_configs=_gen()))
    out1 = np.asarray(ring.generate(ids, mask, generation_configs=_gen()))
    np.testing.assert_array_equal(out0, out1)


def test_ring_window_not_multiple_of_8():
    full, ring = _pair(seed=2, window=11)      # ring rounds to 16 rows
    ids, mask = _inputs(seed=2)
    out0 = np.asarray(full.generate(ids, mask, generation_configs=_gen()))
    out1 = np.asarray(ring.generate(ids, mask, generation_configs=_gen()))
    np.testing.assert_array_equal(out0, out1)


def test_ring_prompt_longer_than_window():
    # 19-token prompt, window 8: the prefill writes only the last 8 rows
    full, ring = _pair(seed=3)
    ids, mask = _inputs(seq=19, seed=3, pad=False)
    out0 = np.asarray(full.generate(ids, mask, generation_configs=_gen()))
    out1 = np.asarray(ring.generate(ids, mask, generation_configs=_gen()))
    np.testing.assert_array_equal(out0, out1)


def test_ring_logits_parity_stepwise():
    """Forward-level check: prefill + decode steps, logits allclose at every
    step (fp32; the ring permutes softmax summation order, so closeness —
    argmax equality is pinned by the generate tests above)."""
    full, ring = _pair(seed=4)
    ids, mask = _inputs(bsz=2, seq=6, seed=4, pad=False)
    total = 6 + 14
    mask_buf = np.ones((2, total), np.int32)
    caches = [full.init_cache(2, total), ring.init_cache(2, total)]
    assert caches[1]["k"].shape[3] == 8
    toks = [ids, ids]
    for step in range(14):
        outs = []
        for i, m in enumerate((full, ring)):
            (logits, _), caches[i] = llama_lm_forward(
                m.params, m.config, np.asarray(toks[i], np.int32),
                mask_buf, cache=caches[i], last_only=True)
            outs.append(np.asarray(logits[:, -1], np.float32))
        np.testing.assert_allclose(outs[0], outs[1], atol=1e-5, rtol=1e-5)
        nxt = outs[0].argmax(-1).astype(np.int32)[:, None]
        toks = [nxt, nxt]


def test_ring_beam():
    full, ring = _pair(seed=5)
    ids, _ = _inputs(bsz=2, seq=6, seed=5, pad=False)
    gcfg = {"beam_size": 3, "max_gen_len": 18, "do_sample": False,
            "pad_id": 0, "end_ids": None, "no_repeat_ngram_size": 0}
    out0 = np.asarray(full.generate(ids, generation_configs=gcfg))
    out1 = np.asarray(ring.generate(ids, generation_configs=gcfg))
    np.testing.assert_array_equal(out0, out1)


def test_ring_rejects_unsupported():
    _, ring = _pair(seed=6)
    with pytest.raises(ValueError):
        from cleantransformer_tpu.serving.engine import ServingEngine
        ServingEngine(ring, max_slots=2, max_len=32)
    with pytest.raises(ValueError):
        from cleantransformer_tpu.generation.speculative import (
            prompt_lookup_generate)
        ids, _ = _inputs(bsz=1, seq=6, pad=False)
        prompt_lookup_generate(ring, ids, generation_configs=_gen(4))
    with pytest.raises(ValueError):
        LlamaForCausalLM(
            LlamaConfig(**BASE, sliding_window=8, swa_ring_cache=True,
                        kv_cache_int8=True),
            rng=jax.random.PRNGKey(0)).init_cache(1, 64)


def test_ring_flash_prefill():
    """use_flash_attention composes: the ring prefill rides the flash kernel
    (causal+window in-kernel), decode unchanged."""
    full, ring = _pair(seed=7, use_flash_attention=True)
    ids, mask = _inputs(seq=16, seed=7, pad=False)
    out0 = np.asarray(full.generate(ids, mask, generation_configs=_gen()))
    out1 = np.asarray(ring.generate(ids, mask, generation_configs=_gen()))
    np.testing.assert_array_equal(out0, out1)
