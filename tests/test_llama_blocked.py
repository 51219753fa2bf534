"""int8 HEAD-MAJOR KV cache + blocked GQA decode kernel (ops/gqa_decode.py,
models/llama.py _gqa_blocked_attend).

The int8-hm slab {"q": (L, B, T, Dkv) int8, "sT": (L, B, Hkv, T) f32 T-minor
scales} is the llama-family long-context decode layout: S==1 decode streams
it through the blocked pallas kernel (int8 bytes read once), prefill rides
flash-bsd on the dequantized slab. Quantization math is identical to the 5D int8 dict path
(cache_write), so the two layouts see the same stored values; attention
summation ORDER differs (online blocks), so parity is float-tolerance plus
greedy-token agreement — the contract ops/fused_decode's blocked kernel set.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cleantransformer_tpu.config import LlamaConfig
from cleantransformer_tpu.models.llama import (
    LlamaForCausalLM, llama_lm_forward)

BASE = dict(vocab_size=131, hidden_size=64, intermediate_size=128,
            num_hidden_layers=3, num_attention_heads=8,
            num_key_value_heads=2, max_position_embeddings=256)
GEN = {"beam_size": 1, "max_gen_len": 16, "do_sample": False,
       "end_ids": None, "pad_id": 0, "no_repeat_ngram_size": 0}


def _pair(seed=0, **kw):
    """(5D int8 dict model, int8 head-major model) sharing weights."""
    m5 = LlamaForCausalLM(
        LlamaConfig(**BASE, kv_cache_int8=True, **kw),
        rng=jax.random.PRNGKey(seed))
    mhm = LlamaForCausalLM(
        LlamaConfig(**BASE, kv_cache_int8=True, decode_head_major=True,
                    **kw),
        params=m5.params)
    return m5, mhm


def _inputs(bsz=3, seq=7, seed=0, pad=True):
    rs = np.random.RandomState(seed)
    ids = rs.randint(1, BASE["vocab_size"], (bsz, seq)).astype(np.int32)
    mask = np.ones_like(ids)
    if pad:
        mask[1, :3] = 0
    return ids, mask


def test_int8_hm_cache_layout():
    _, mhm = _pair()
    # capacity rounds to 128 tiles so the T-minor scale blocks get
    # 128-multiple key blocks (lanes-streamed key axis)
    cache = mhm.init_cache(2, 64)
    L, Hkv, hd = 3, 2, 8
    assert cache["k"]["q"].shape == (L, 2, 128, Hkv * hd)
    assert cache["k"]["q"].dtype == jnp.int8
    assert cache["k"]["sT"].shape == (L, 2, Hkv, 128)
    # capacity tile-rounds to 512 past 2048
    big = mhm.init_cache(1, 2100)
    assert big["k"]["q"].shape[2] % 512 == 0


def test_int8_hm_greedy_matches_5d():
    m5, mhm = _pair()
    ids, mask = _inputs()
    out5 = np.asarray(m5.generate(ids, mask, generation_configs=GEN))
    outh = np.asarray(mhm.generate(ids, mask, generation_configs=GEN))
    np.testing.assert_array_equal(out5, outh)


def test_int8_hm_stepwise_logits_close():
    m5, mhm = _pair(seed=1)
    ids, mask = _inputs(bsz=2, seq=6, seed=1, pad=False)
    total = 6 + 12
    mask_buf = np.ones((2, total), np.int32)
    caches = [m5.init_cache(2, total), mhm.init_cache(2, total)]
    toks = ids
    for step in range(12):
        outs = []
        for i, m in enumerate((m5, mhm)):
            (logits, _), caches[i] = llama_lm_forward(
                m.params, m.config, np.asarray(toks, np.int32), mask_buf,
                cache=caches[i], last_only=True)
            outs.append(np.asarray(logits[:, -1], np.float32))
        np.testing.assert_allclose(outs[0], outs[1], atol=5e-5, rtol=5e-5)
        toks = outs[0].argmax(-1).astype(np.int32)[:, None]


def test_int8_hm_flash_prefill():
    """use_flash_attention int8-hm prefill (dequantized slab through
    flash-bsd) matches the dense int8 prefill path."""
    m5, _ = _pair(seed=2)
    mhm_f = LlamaForCausalLM(
        LlamaConfig(**BASE, kv_cache_int8=True, decode_head_major=True,
                    use_flash_attention=True),
        params=m5.params)
    ids, mask = _inputs(seq=16, seed=2, pad=False)
    out5 = np.asarray(m5.generate(ids, mask, generation_configs=GEN))
    outf = np.asarray(mhm_f.generate(ids, mask, generation_configs=GEN))
    np.testing.assert_array_equal(out5, outf)


def test_int8_hm_ragged_matches_per_row():
    """Serving-style per-row offsets: a ragged B=2 decode step equals two
    scalar-offset B=1 steps at the same positions."""
    _, mhm = _pair(seed=3)
    cfg = mhm.config
    rs = np.random.RandomState(3)
    T = 32
    lens = np.array([9, 5], np.int32)
    # per-row prefill at offset 0 (B=1 each), then one ragged decode
    caches1 = []
    rows = []
    for b in range(2):
        ids_b = rs.randint(1, 131, (1, int(lens[b]))).astype(np.int32)
        rows.append(ids_b)
        c = mhm.init_cache(1, T)
        (_, _), c = llama_lm_forward(
            mhm.params, cfg, ids_b, np.ones((1, T), np.int32), cache=c,
            last_only=True)
        caches1.append(c)
    # stitch the two B=1 caches into one B=2 cache
    def stitch(a, b):
        return jax.tree_util.tree_map(
            lambda x, y: jnp.concatenate([x, y], axis=1)
            if hasattr(x, "ndim") and x.ndim >= 2 else x, a, b)
    cache2 = stitch(caches1[0], caches1[1])
    cache2["length"] = jnp.asarray(lens)
    nxt = np.array([[7], [11]], np.int32)
    pos = lens[:, None].astype(np.int32)
    (log2, _), _ = llama_lm_forward(
        mhm.params, cfg, nxt, None, position_ids=pos, cache=cache2,
        last_only=True)
    for b in range(2):
        caches1[b]["length"] = jnp.asarray(int(lens[b]), jnp.int32)
        (log1, _), _ = llama_lm_forward(
            mhm.params, cfg, nxt[b:b + 1], None,
            position_ids=pos[b:b + 1], cache=caches1[b], last_only=True)
        np.testing.assert_allclose(np.asarray(log2[b, -1]),
                                   np.asarray(log1[0, -1]),
                                   atol=5e-5, rtol=5e-5)


def test_blocked_partials_unit():
    """gqa_blocked_partials vs a dense numpy oracle (int8 + T-minor scale
    planes; T=256 with key_block=128 exercises the online block rescale)."""
    from cleantransformer_tpu.ops.gqa_decode import gqa_blocked_partials
    rs = np.random.RandomState(0)
    L, B, T, Hkv, hd, H = 2, 2, 256, 2, 8, 4
    Dkv = Hkv * hd
    g = H // Hkv
    kq = rs.randint(-127, 128, (L, B, T, Dkv)).astype(np.int8)
    ks = np.abs(rs.randn(L, B, Hkv, T)).astype(np.float32) * 0.05 + 0.01
    vq = rs.randint(-127, 128, (L, B, T, Dkv)).astype(np.int8)
    vs = np.abs(rs.randn(L, B, Hkv, T)).astype(np.float32) * 0.05 + 0.01
    qt = rs.randn(B, H, Dkv).astype(np.float32) * 0.3
    cl = 150
    bias = np.where(np.arange(T) < cl, 0.0, -1e30).astype(np.float32)
    bias = np.broadcast_to(bias, (B, T)).copy()
    m, den, acc = jax.jit(
        lambda *a: gqa_blocked_partials(*a, kv_heads=Hkv, scale=0.5,
                                        key_block=128, interpret=True))(
        qt, kq, ks, vq, vs, bias, np.int32(1))
    # dense oracle on layer 1 (flash orientation: m/den (B, H, 1), acc
    # (B, H, Dkv))
    for b in range(B):
        s = (qt[b] @ kq[1, b].astype(np.float32).T)        # (H, T)
        s = s * np.repeat(ks[1, b], g, axis=0) * 0.5 + bias[b][None, :]
        mm = s.max(1)
        p = np.exp(s - mm[:, None])
        dd = p.sum(1)
        pv = p * np.repeat(vs[1, b], g, axis=0)
        aa = pv @ vq[1, b].astype(np.float32)              # (H, Dkv)
        np.testing.assert_allclose(np.asarray(m)[b, :, 0], mm, rtol=2e-4,
                                   atol=1e-5)
        np.testing.assert_allclose(np.asarray(den)[b, :, 0], dd, rtol=2e-3)
        np.testing.assert_allclose(np.asarray(acc)[b], aa, rtol=2e-2,
                                   atol=2e-2)
