"""Whole-stack fused decode (config.fused_decode, ops/fused_decode.py).

One Pallas program per generated token replaces the ~10-kernels-per-layer
XLA decode chain. These tests run the kernel in interpret mode on CPU and
assert bit-exact parity with the per-layer decode path (which is itself
asserted bit-exact vs the executed torch reference in test_gpt.py) —
including left-padded prompts, both GPT LN orders, and the dense-layout
opt-outs (beam reorders the cache batch axis; speculative writes ragged
per-row windows)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cleantransformer_tpu.config import BloomConfig, GPTConfig
from cleantransformer_tpu.models.bloom import BloomForCausalLM
from cleantransformer_tpu.models.gpt import (GPTLMHeadModel, init_kv_cache,
                                             init_kv_cache_dense)


def _pair(version="gpt2", **kw):
    cfg = dict(vocab_size=211, n_embd=64, n_head=4, n_layer=3,
               n_positions=256, compute_dtype=jnp.float32,
               param_dtype=jnp.float32, **kw)
    m0 = GPTLMHeadModel(GPTConfig(**cfg), version=version,
                        rng=jax.random.PRNGKey(0))
    m1 = GPTLMHeadModel(GPTConfig(**cfg, fused_decode=True), version=version,
                        params=m0.params)
    return m0, m1


def test_fused_cache_layout():
    cfg = GPTConfig(vocab_size=97, n_embd=64, n_positions=128, n_layer=2,
                    n_head=2, fused_decode=True)
    cache = init_kv_cache(cfg, 3, 16)
    assert cache["k"].shape == (2, 3, 16, 64)  # (L, B, T, D)
    dense = init_kv_cache_dense(cfg, 3, 16)
    assert dense["k"].shape == (2, 3, 2, 16, 32)  # (L, B, H, T, hd)
    # int8 KV composes with the fused layout: int8 rows + per-(key, head)
    # scale planes (dequant happens in-kernel)
    cfg_q = GPTConfig(vocab_size=97, n_embd=64, n_positions=128, n_layer=2,
                      n_head=2, fused_decode=True, kv_cache_int8=True)
    cache_q = init_kv_cache(cfg_q, 3, 16)
    assert cache_q["k"]["q"].dtype == jnp.int8
    assert cache_q["k"]["q"].shape == (2, 3, 16, 64)  # (L, B, T, D)
    assert cache_q["k"]["s"].shape == (2, 3, 16, 2)   # (L, B, T, H)


@pytest.mark.parametrize("version", ["gpt", "gpt2"])
def test_fused_greedy_bit_exact(version):
    m0, m1 = _pair(version)
    rs = np.random.RandomState(0)
    ids = rs.randint(5, 200, (2, 9)).astype(np.int32)
    mask = np.ones((2, 9), np.int32)
    mask[1, :4] = 0  # left padding exercises the additive key mask
    gcfg = {"beam_size": 1, "max_gen_len": 12, "do_sample": False,
            "end_ids": None, "pad_id": 0, "no_repeat_ngram_size": 0}
    out0 = np.asarray(m0.generate(ids, mask, generation_configs=gcfg))
    out1 = np.asarray(m1.generate(ids, mask, generation_configs=gcfg))
    assert np.array_equal(out0, out1)


def test_fused_greedy_bit_exact_batch1():
    # batch 1 is the interactive-latency shape: every kernel block collapses
    # to sublane 1 ((1, D) residual, (1, T, H) bias, (1, 8, D) cache
    # windows) — keep the fused path exact there too
    m0, m1 = _pair("gpt2")
    rs = np.random.RandomState(3)
    ids = rs.randint(5, 200, (1, 9)).astype(np.int32)
    gcfg = {"beam_size": 1, "max_gen_len": 12, "do_sample": False,
            "end_ids": None, "pad_id": 0, "no_repeat_ngram_size": 0}
    out0 = np.asarray(m0.generate(ids, generation_configs=gcfg))
    out1 = np.asarray(m1.generate(ids, generation_configs=gcfg))
    assert np.array_equal(out0, out1)


def test_fused_beam_rides_fused_layout():
    # beam search reorders the cache along the batch axis every step —
    # batch is axis 1 in the fused (L, B, T, D) layout too, so beam decode
    # now rides the whole-stack fused kernel and must still produce
    # identical beams vs the dense-model run (fp32: the S==1 kernel is
    # bit-exact vs the per-layer path).
    m0, m1 = _pair("gpt2")
    rs = np.random.RandomState(1)
    ids = rs.randint(5, 200, (1, 7)).astype(np.int32)
    gcfg = {"beam_size": 2, "max_gen_len": 8, "do_sample": False,
            "end_ids": None, "pad_id": 0, "no_repeat_ngram_size": 0}
    out0 = np.asarray(m0.generate(ids, generation_configs=gcfg))
    out1 = np.asarray(m1.generate(ids, generation_configs=gcfg))
    assert np.array_equal(out0, out1)


def _sharpen(params, key="tokens_embed", factor=16.0):
    """Scale the tied embedding so logits are decisive: cross-kernel fp32
    drift is ~1 ulp, so any argmax gap >> 1e-6 makes greedy deterministic
    across the fused window kernel and the XLA per-layer path (same recipe
    as bench_suite's acceptance workloads)."""
    return {**params, key: params[key] * factor}


def test_fused_speculative_rides_window_kernel():
    # prompt-lookup verify windows (S = K+1) at per-row ragged offsets now
    # ride the whole-stack window kernel on a fused-layout cache; committed
    # tokens must match the dense-layout run. Logits are sharpened: the
    # window kernel's per-query reductions differ from XLA's batched gemms
    # by ~1 ulp, so only decisive argmaxes are cross-path deterministic.
    from cleantransformer_tpu.generation.speculative import (
        prompt_lookup_generate)
    m0, m1 = _pair("gpt2")
    m0.params = _sharpen(m0.params)
    m1.params = m0.params
    rs = np.random.RandomState(2)
    base = rs.randint(5, 200, (1, 6)).astype(np.int32)
    ids = np.concatenate([base, base[:, :4]], axis=1)  # repetition to match
    gcfg = {"max_gen_len": 10, "do_sample": False, "pad_id": 0}
    out0 = np.asarray(prompt_lookup_generate(m0, ids, generation_configs=gcfg))
    out1 = np.asarray(prompt_lookup_generate(m1, ids, generation_configs=gcfg))
    assert np.array_equal(out0, out1)


def test_fused_window_kernel_parity_xla():
    # the S>1 window kernel vs the XLA per-layer fallback ON THE SAME fused
    # cache (fused_decode_max_window=1 forces the fallback): logits agree to
    # float tolerance (cross-path fp32 reductions differ by ~1 ulp) and the
    # cache k/v ROWS the window wrote agree to the same tolerance.
    cfg = dict(vocab_size=211, n_embd=64, n_head=4, n_layer=2,
               n_positions=256, compute_dtype=jnp.float32,
               param_dtype=jnp.float32, fused_decode=True)
    m0 = GPTLMHeadModel(GPTConfig(**cfg, fused_decode_max_window=1),
                        version="gpt2", rng=jax.random.PRNGKey(0))
    m1 = GPTLMHeadModel(GPTConfig(**cfg), version="gpt2", params=m0.params)
    rs = np.random.RandomState(0)
    ids = rs.randint(5, 200, (2, 18)).astype(np.int32)
    mask = np.ones((2, 32), np.int32)
    mask[1, :3] = 0  # left padding exercises the pad bias plane

    def run(m):
        # prefill 14 tokens: ABOVE fused_decode_max_window on both models,
        # so both prefills take the identical XLA path; the 4-token second
        # forward is the window-kernel-vs-fallback comparison
        cache = m.init_cache(2, 32)
        (l1, _), cache = m.forward_fn()(m.params, m.config, ids[:, :14],
                                        mask, cache=cache)
        (l2, _), cache = m.forward_fn()(m.params, m.config, ids[:, 14:],
                                        mask, cache=cache)
        return (np.asarray(l1), np.asarray(l2),
                jax.tree_util.tree_map(np.asarray, cache))

    a1, a2, ca = run(m0)
    b1, b2, cb = run(m1)
    assert np.array_equal(a1, b1)  # prefill: identical path
    np.testing.assert_allclose(a2, b2, atol=3e-6, rtol=1e-5)
    np.testing.assert_allclose(ca["k"][:, :, 14:18], cb["k"][:, :, 14:18],
                               atol=3e-6, rtol=1e-5)
    np.testing.assert_allclose(ca["v"][:, :, 14:18], cb["v"][:, :, 14:18],
                               atol=3e-6, rtol=1e-5)
    assert int(ca["length"]) == int(cb["length"]) == 18


@pytest.mark.parametrize("quant", [None, "kv_cache_int8", "quantize_int8"])
def test_fused_window_greedy_speculative_exact(quant):
    # greedy draft-model speculation on a fused-decode target/draft pair:
    # catch-up windows, single-token draft steps AND (K+1)-token verify all
    # ride fused kernels; the committed stream must equal the plain fused
    # greedy decode (sharpened logits — see above).
    from cleantransformer_tpu.generation.speculative import (
        speculative_generate)
    kw = {quant: True} if quant else {}
    m0, m1 = _pair("gpt2", **kw)
    m1.params = _sharpen(m1.params)
    draft = GPTLMHeadModel(
        GPTConfig(vocab_size=211, n_embd=64, n_head=4, n_layer=1,
                  n_positions=256, compute_dtype=jnp.float32,
                  param_dtype=jnp.float32, fused_decode=True, **kw),
        version="gpt2", rng=jax.random.PRNGKey(7))
    draft.params = _sharpen(draft.params)
    rs = np.random.RandomState(5)
    ids = rs.randint(5, 200, (1, 7)).astype(np.int32)
    gcfg = {"max_gen_len": 12, "do_sample": False, "pad_id": 0,
            "end_ids": None, "no_repeat_ngram_size": 0, "beam_size": 1}
    plain = np.asarray(m1.generate(ids, generation_configs=gcfg))
    spec = np.asarray(speculative_generate(m1, draft, ids,
                                           generation_configs=gcfg,
                                           draft_len=4))
    n = min(plain.shape[-1], spec.shape[-1])
    assert np.array_equal(plain[..., :n], spec[..., :n])


@pytest.mark.parametrize("kv_int8", [False, True])
def test_blocked_decode_matches_single_block(kv_int8):
    """Long-context blocked decode (ops/fused_decode._gpt_blocked_kernel,
    grid (L, key-blocks) with online-softmax partials) vs the single-block
    kernel on the same inputs: float tolerance (online rescaling reorders
    the reductions). This is the path 4k-32k contexts take instead of the
    XLA per-layer fallback (VERDICT r3 weak #7)."""
    import math
    from cleantransformer_tpu.ops.fused_decode import (
        _gpt_stack, blocked_key_block, fused_decode_blocked,
        fused_decode_step)
    assert blocked_key_block(4096, 512) == 512
    assert blocked_key_block(4232, 1024) % 8 == 0    # 4232 = 8 * 23^2
    assert 4232 % blocked_key_block(4232, 1024) == 0

    B, T, D, Hh, L = 2, 64, 64, 4, 3
    cl = 37
    cfg = GPTConfig(vocab_size=97, n_embd=D, n_head=Hh, n_layer=L,
                    n_positions=256, compute_dtype=jnp.float32,
                    param_dtype=jnp.float32, fused_decode=True)
    m = GPTLMHeadModel(cfg, version="gpt2", rng=jax.random.PRNGKey(0))
    rs = np.random.RandomState(0)
    live = (np.arange(T)[None, None, :, None] < cl)
    if kv_int8:
        ck = {"q": jnp.asarray(rs.randint(-100, 100, (L, B, T, D))
                               * live, jnp.int8),
              "s": jnp.asarray(np.abs(rs.randn(L, B, T, Hh)) * 0.01,
                               jnp.float32)}
        cv = {"q": jnp.asarray(rs.randint(-100, 100, (L, B, T, D))
                               * live, jnp.int8),
              "s": jnp.asarray(np.abs(rs.randn(L, B, T, Hh)) * 0.01,
                               jnp.float32)}
    else:
        ck = jnp.asarray(rs.randn(L, B, T, D) * 0.3 * live, jnp.float32)
        cv = jnp.asarray(rs.randn(L, B, T, D) * 0.3 * live, jnp.float32)
    h0 = jnp.asarray(rs.randn(B, D) * 0.3, jnp.float32)
    col = np.arange(T)
    bias = jnp.asarray(np.where(col < cl, 0.0, -1e4)[None, :, None]
                       * np.ones((B, 1, Hh)), jnp.float32)
    bcur = jnp.zeros((B, Hh), jnp.float32)
    stack = _gpt_stack(m.params["blocks"])
    kw = dict(n_head=Hh, eps=cfg.layer_norm_epsilon, act=cfg.afn,
              scale=1.0 / math.sqrt(D // Hh), pre_ln=True, interpret=True)
    y0, nk0, nv0 = fused_decode_step(stack, h0, bias, bcur, ck, cv,
                                     cache_len=None, **kw)
    y1, nk1, nv1 = fused_decode_blocked(stack, h0, bias, bcur, ck, cv,
                                        key_block=16, **kw)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=1e-5,
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(nk0).astype(np.float64),
                               np.asarray(nk1).astype(np.float64),
                               atol=1e-6, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(nv0).astype(np.float64),
                               np.asarray(nv1).astype(np.float64),
                               atol=1e-6, rtol=1e-5)


@pytest.mark.parametrize("kv_int8", [False, True])
@pytest.mark.parametrize("ragged", [False, True])
def test_blocked_window_matches_window_kernel(kv_int8, ragged):
    """Long-context S-token window (_gpt_blocked_window_kernel, grid
    (L, key-blocks), per-query online-softmax scratch, window columns merged
    in the epilogue) vs the whole-block window kernel on the same fused
    cache: float tolerance (online rescaling reorders reductions). Ragged
    per-row offsets live entirely in the caller bias — the serving lookup
    chunk's shape."""
    import math
    from cleantransformer_tpu.ops.fused_decode import (
        _gpt_stack, blocked_window_key_block, fused_decode_blocked_window,
        fused_decode_window)
    assert blocked_window_key_block(8, 8, 4096, 768, 3072, 12) % 8 == 0

    B, T, D, Hh, L, S = 2, 64, 64, 4, 3, 5
    cl = np.array([37, 11], np.int32) if ragged else 37
    cfg = GPTConfig(vocab_size=97, n_embd=D, n_head=Hh, n_layer=L,
                    n_positions=256, compute_dtype=jnp.float32,
                    param_dtype=jnp.float32, fused_decode=True)
    m = GPTLMHeadModel(cfg, version="gpt2", rng=jax.random.PRNGKey(0))
    rs = np.random.RandomState(0)
    live = (np.arange(T)[None, None, :, None]
            < np.reshape(cl, (1, -1, 1, 1)))
    if kv_int8:
        ck = {"q": jnp.asarray(rs.randint(-100, 100, (L, B, T, D))
                               * live, jnp.int8),
              "s": jnp.asarray(np.abs(rs.randn(L, B, T, Hh)) * 0.01,
                               jnp.float32)}
        cv = {"q": jnp.asarray(rs.randint(-100, 100, (L, B, T, D))
                               * live, jnp.int8),
              "s": jnp.asarray(np.abs(rs.randn(L, B, T, Hh)) * 0.01,
                               jnp.float32)}
    else:
        ck = jnp.asarray(rs.randn(L, B, T, D) * 0.3 * live, jnp.float32)
        cv = jnp.asarray(rs.randn(L, B, T, D) * 0.3 * live, jnp.float32)
    hw = jnp.asarray(rs.randn(S, B, D) * 0.3, jnp.float32)
    col = np.arange(T)[None, :, None]
    # window kernel: pad-only bias (kernel owns causality via cache_len);
    # blocked window: strict col < cache_len stream bias + zero bias_cur
    bias_pad = jnp.zeros((B, T, Hh), jnp.float32)
    bias_strict = jnp.asarray(
        np.where(col < np.reshape(cl, (-1, 1, 1)), 0.0, -1e30)
        * np.ones((B, 1, Hh)), jnp.float32)
    stack = _gpt_stack(m.params["blocks"])
    kw = dict(n_head=Hh, eps=cfg.layer_norm_epsilon, act=cfg.afn,
              scale=1.0 / math.sqrt(D // Hh), pre_ln=True, interpret=True)
    y0, nk0, nv0 = fused_decode_window(stack, hw, bias_pad,
                                       jnp.asarray(cl), ck, cv, **kw)
    y1, nk1, nv1 = fused_decode_blocked_window(
        stack, hw, bias_strict, jnp.zeros((S, B, Hh), jnp.float32), ck, cv,
        key_block=16, **kw)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=1e-5,
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(nk0).astype(np.float64),
                               np.asarray(nk1).astype(np.float64),
                               atol=1e-6, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(nv0).astype(np.float64),
                               np.asarray(nv1).astype(np.float64),
                               atol=1e-6, rtol=1e-5)


def test_blocked_window_model_parity_xla(monkeypatch):
    """End-to-end: force window_fits_vmem off so a 4-token second forward
    rides the blocked window kernel; logits + written cache rows match the
    XLA per-layer fallback (fused_decode_max_window=1 model) to float
    tolerance, including left padding."""
    import cleantransformer_tpu.ops.fused_decode as fd
    cfg = dict(vocab_size=211, n_embd=64, n_head=4, n_layer=2,
               n_positions=256, compute_dtype=jnp.float32,
               param_dtype=jnp.float32, fused_decode=True,
               decode_key_block=16)
    m0 = GPTLMHeadModel(GPTConfig(**cfg, fused_decode_max_window=1),
                        version="gpt2", rng=jax.random.PRNGKey(0))
    m1 = GPTLMHeadModel(GPTConfig(**cfg), version="gpt2", params=m0.params)
    monkeypatch.setattr(fd, "window_fits_vmem", lambda *a, **k: False)
    rs = np.random.RandomState(0)
    ids = rs.randint(5, 200, (2, 18)).astype(np.int32)
    mask = np.ones((2, 32), np.int32)
    mask[1, :3] = 0

    def run(m):
        cache = m.init_cache(2, 32)
        (l1, _), cache = m.forward_fn()(m.params, m.config, ids[:, :14],
                                        mask, cache=cache)
        (l2, _), cache = m.forward_fn()(m.params, m.config, ids[:, 14:],
                                        mask, cache=cache)
        return (np.asarray(l1), np.asarray(l2),
                jax.tree_util.tree_map(np.asarray, cache))

    a1, a2, ca = run(m0)
    b1, b2, cb = run(m1)
    assert np.array_equal(a1, b1)  # prefill: identical XLA path
    np.testing.assert_allclose(a2, b2, atol=3e-6, rtol=1e-5)
    np.testing.assert_allclose(ca["k"][:, :, 14:18], cb["k"][:, :, 14:18],
                               atol=3e-6, rtol=1e-5)
    np.testing.assert_allclose(ca["v"][:, :, 14:18], cb["v"][:, :, 14:18],
                               atol=3e-6, rtol=1e-5)
    assert int(ca["length"]) == int(cb["length"]) == 18


def test_bloom_blocked_window_parity_xla(monkeypatch):
    """Bloom long-context window: the ALiBi ramp rides the stream bias AND
    the per-window-column bias_cur rows (take_along_axis at cache_len + s);
    vs the XLA fallback to float tolerance."""
    import cleantransformer_tpu.ops.fused_decode as fd
    cfg = dict(vocab_size=211, hidden_size=64, n_layer=2,
               num_attention_heads=4, compute_dtype=jnp.float32,
               param_dtype=jnp.float32, fused_decode=True,
               decode_key_block=16)

    def mk(**kw):
        m = BloomForCausalLM(BloomConfig(**cfg, **kw),
                             rng=jax.random.PRNGKey(0))
        m._tie_weight()
        return m

    m0 = mk(fused_decode_max_window=1)
    m1 = mk()
    m1.params = m0.params
    monkeypatch.setattr(fd, "window_fits_vmem", lambda *a, **k: False)
    from cleantransformer_tpu.generation.engine import inference_params
    rs = np.random.RandomState(1)
    ids = rs.randint(5, 200, (2, 18)).astype(np.int32)
    mask = np.ones((2, 32), np.int32)
    mask[1, :3] = 0

    def run(m):
        p = inference_params(m)  # builds qkv_fused
        cache = m.init_cache(2, 32)
        (l1, _), cache = m.forward_fn()(p, m.config, ids[:, :14], mask,
                                        cache=cache)
        (l2, _), cache = m.forward_fn()(p, m.config, ids[:, 14:], mask,
                                        cache=cache)
        return np.asarray(l1), np.asarray(l2)

    a1, a2 = run(m0)
    b1, b2 = run(m1)
    assert np.array_equal(a1, b1)
    np.testing.assert_allclose(a2, b2, atol=3e-6, rtol=1e-5)


def test_blocked_decode_greedy_vs_dense_model(monkeypatch):
    """End-to-end: force the fits_vmem gate off so generate() rides the
    blocked kernel for every step; greedy tokens must match the dense-layout
    model (decisive sharpened logits — online-softmax parity is float-level,
    not bit-level)."""
    import cleantransformer_tpu.ops.fused_decode as fd
    m0, m1 = _pair("gpt2")
    m0.params = _sharpen(m0.params)
    m1.params = m0.params
    monkeypatch.setattr(fd, "fits_vmem", lambda *a, **k: False)
    rs = np.random.RandomState(6)
    ids = rs.randint(5, 200, (2, 9)).astype(np.int32)
    mask = np.ones((2, 9), np.int32)
    mask[1, :4] = 0
    gcfg = {"beam_size": 1, "max_gen_len": 12, "do_sample": False,
            "end_ids": None, "pad_id": 0, "no_repeat_ngram_size": 0}
    out0 = np.asarray(m0.generate(ids, mask, generation_configs=gcfg))
    out1 = np.asarray(m1.generate(ids, mask, generation_configs=gcfg))
    assert np.array_equal(out0, out1)


def test_bloom_fused_window_parity_xla():
    # Bloom window: ALiBi over the whole buffer + padding ride the (B,T,H)
    # bias; kernel vs XLA fallback on the same fused cache.
    cfg = dict(vocab_size=211, hidden_size=64, n_layer=2,
               num_attention_heads=4, compute_dtype=jnp.float32,
               param_dtype=jnp.float32, fused_decode=True)

    def mk(**kw):
        m = BloomForCausalLM(BloomConfig(**cfg, **kw),
                             rng=jax.random.PRNGKey(0))
        m._tie_weight()
        return m

    m0 = mk(fused_decode_max_window=1)
    m1 = mk()
    m1.params = m0.params
    from cleantransformer_tpu.generation.engine import inference_params
    rs = np.random.RandomState(1)
    ids = rs.randint(5, 200, (2, 18)).astype(np.int32)
    mask = np.ones((2, 32), np.int32)
    mask[1, :3] = 0

    def run(m):
        p = inference_params(m)  # builds qkv_fused
        cache = m.init_cache(2, 32)
        (l1, _), cache = m.forward_fn()(p, m.config, ids[:, :14], mask,
                                        cache=cache)
        (l2, _), cache = m.forward_fn()(p, m.config, ids[:, 14:], mask,
                                        cache=cache)
        return np.asarray(l1), np.asarray(l2)

    a1, a2 = run(m0)
    b1, b2 = run(m1)
    assert np.array_equal(a1, b1)
    np.testing.assert_allclose(a2, b2, atol=3e-6, rtol=1e-5)


def _bloom_pair(n_head=4, hidden=64):
    cfg = dict(vocab_size=211, hidden_size=hidden, n_layer=3,
               num_attention_heads=n_head, compute_dtype=jnp.float32,
               param_dtype=jnp.float32)

    def mk(**kw):
        m = BloomForCausalLM(BloomConfig(**cfg, **kw),
                             rng=jax.random.PRNGKey(0))
        m._tie_weight()
        return m

    m0 = mk()
    m1 = mk(fused_decode=True)
    m1.params = m0.params
    return m0, m1


@pytest.mark.parametrize("n_head,hidden", [(4, 64), (14, 56)])
def test_bloom_fused_greedy_bit_exact(n_head, hidden):
    # ALiBi rides the kernel's (B, T, H) bias operand + its merged-column
    # (B, H) row; 14 heads exercises the non-power-of-2 slope formula AND a
    # non-128-aligned lane count. Left padding exercises the mask-cumsum
    # ALiBi positions.
    m0, m1 = _bloom_pair(n_head, hidden)
    rs = np.random.RandomState(0)
    ids = rs.randint(5, 200, (2, 9)).astype(np.int32)
    mask = np.ones((2, 9), np.int32)
    mask[1, :4] = 0
    gcfg = {"beam_size": 1, "max_gen_len": 12, "do_sample": False,
            "end_ids": None, "pad_id": 0, "no_repeat_ngram_size": 0}
    out0 = np.asarray(m0.generate(ids, mask, generation_configs=gcfg))
    out1 = np.asarray(m1.generate(ids, mask, generation_configs=gcfg))
    assert np.array_equal(out0, out1)


def test_bloom_fused_greedy_bit_exact_batch1():
    # the bloom_interactive REPL shape — the biggest fused-kernel latency
    # win on hardware (3.25 -> 1.19 ms/step, BENCH_DETAILS.md); ALiBi bias
    # rows at sublane 1 must stay exact
    m0, m1 = _bloom_pair()
    rs = np.random.RandomState(4)
    ids = rs.randint(5, 200, (1, 9)).astype(np.int32)
    gcfg = {"beam_size": 1, "max_gen_len": 12, "do_sample": False,
            "end_ids": None, "pad_id": 0, "no_repeat_ngram_size": 0}
    out0 = np.asarray(m0.generate(ids, generation_configs=gcfg))
    out1 = np.asarray(m1.generate(ids, generation_configs=gcfg))
    assert np.array_equal(out0, out1)


@pytest.mark.parametrize("family", ["gpt", "bloom"])
def test_fused_int8_kv_cache_bit_exact(family):
    # kv_cache_int8 composes with fused_decode: int8 rows dequantize
    # in-kernel via per-(key, head) scale planes, and the merged current
    # column gets the same in-kernel quantize round-trip the XLA path sees
    # by reading the cache post-write — outputs must match the 5D int8 XLA
    # decode exactly.
    rs = np.random.RandomState(0)
    if family == "gpt":
        cfg = dict(vocab_size=211, n_embd=64, n_head=4, n_layer=3,
                   n_positions=128, kv_cache_int8=True)
        m0 = GPTLMHeadModel(GPTConfig(**cfg), version="gpt2",
                            rng=jax.random.PRNGKey(0))
        m1 = GPTLMHeadModel(GPTConfig(**cfg, fused_decode=True),
                            version="gpt2", params=m0.params)
    else:
        cfg = dict(vocab_size=211, hidden_size=64, n_layer=3,
                   num_attention_heads=4, kv_cache_int8=True)

        def mk(**kw):
            m = BloomForCausalLM(BloomConfig(**cfg, **kw),
                                 rng=jax.random.PRNGKey(0))
            m._tie_weight()
            return m

        m0 = mk()
        m1 = mk(fused_decode=True)
        m1.params = m0.params
    ids = rs.randint(5, 200, (2, 9)).astype(np.int32)
    mask = np.ones((2, 9), np.int32)
    mask[1, :4] = 0
    gcfg = {"beam_size": 1, "max_gen_len": 12, "do_sample": False,
            "end_ids": None, "pad_id": 0, "no_repeat_ngram_size": 0}
    out0 = np.asarray(m0.generate(ids, mask, generation_configs=gcfg))
    out1 = np.asarray(m1.generate(ids, mask, generation_configs=gcfg))
    assert np.array_equal(out0, out1)


@pytest.mark.parametrize("family", ["gpt", "bloom"])
def test_fused_int8_weights_bit_exact(family):
    # int8 weight-only quantization rides the kernel: the convert + column
    # scaling happen in-kernel (scale rows are exactly 1.0 when unquantized)
    # — outputs must match the int8 XLA decode path exactly.
    rs = np.random.RandomState(0)
    if family == "gpt":
        cfg = dict(vocab_size=211, n_embd=64, n_head=4, n_layer=3,
                   n_positions=128, quantize_int8=True)
        m0 = GPTLMHeadModel(GPTConfig(**cfg), version="gpt2",
                            rng=jax.random.PRNGKey(0))
        m1 = GPTLMHeadModel(GPTConfig(**cfg, fused_decode=True),
                            version="gpt2", params=m0.params)
    else:
        cfg = dict(vocab_size=211, hidden_size=64, n_layer=3,
                   num_attention_heads=4, quantize_int8=True)

        def mk(**kw):
            m = BloomForCausalLM(BloomConfig(**cfg, **kw),
                                 rng=jax.random.PRNGKey(0))
            m._tie_weight()
            return m

        m0 = mk()
        m1 = mk(fused_decode=True)
        m1.params = m0.params
    ids = rs.randint(5, 200, (2, 9)).astype(np.int32)
    mask = np.ones((2, 9), np.int32)
    mask[1, :4] = 0
    gcfg = {"beam_size": 1, "max_gen_len": 12, "do_sample": False,
            "end_ids": None, "pad_id": 0, "no_repeat_ngram_size": 0}
    out0 = np.asarray(m0.generate(ids, mask, generation_configs=gcfg))
    out1 = np.asarray(m1.generate(ids, mask, generation_configs=gcfg))
    assert np.array_equal(out0, out1)


def test_bloom_fused_beam_rides_fused_layout():
    m0, m1 = _bloom_pair()
    rs = np.random.RandomState(1)
    ids = rs.randint(5, 200, (1, 7)).astype(np.int32)
    gcfg = {"beam_size": 2, "max_gen_len": 8, "do_sample": False,
            "end_ids": None, "pad_id": 0, "no_repeat_ngram_size": 0}
    out0 = np.asarray(m0.generate(ids, generation_configs=gcfg))
    out1 = np.asarray(m1.generate(ids, generation_configs=gcfg))
    assert np.array_equal(out0, out1)


def test_fused_multi_token_cached_window():
    # S>1 forward at a nonzero cache offset (the serving/speculative chunk
    # shape) rides the whole-stack window kernel on the fused cache (S <=
    # fused_decode_max_window). Stored k/v values round-trip exactly, but
    # per-query kernel reductions vs XLA's batched gemms differ at float
    # rounding, so logits agree to tolerance, not bit-exactly (the
    # generate() S==1 fast path, which IS bit-exact, is covered above).
    m0, m1 = _pair("gpt2")
    rs = np.random.RandomState(3)
    ids = rs.randint(5, 200, (2, 12)).astype(np.int32)

    def run(m):
        cache = m.init_cache(2, 32)
        (logits1, _), cache = m.forward_fn()(
            m.params, m.config, ids[:, :8], cache=cache)
        (logits2, _), cache = m.forward_fn()(
            m.params, m.config, ids[:, 8:], cache=cache)
        return np.asarray(logits1), np.asarray(logits2)

    a1, a2 = run(m0)
    b1, b2 = run(m1)
    np.testing.assert_allclose(a1, b1, atol=2e-6, rtol=1e-5)
    np.testing.assert_allclose(a2, b2, atol=2e-6, rtol=1e-5)


def test_vmem_claim_and_fits_vmem_policy():
    """The kernel's VMEM claim: tight when the lm_head table can co-reside
    (GPT-2-class), big when it can't (Bloom real-vocab 514 MB table); the
    fits_vmem gate counts the (B, T, H) bias plane and the int8-cache scale
    planes (they are fp32 (B, T, H) kernel operands, double-buffered)."""
    from cleantransformer_tpu.ops.fused_decode import (fits_vmem, table_bytes,
                                                       vmem_claim)
    MB = 1024 * 1024
    # GPT-2 124M b8: blocks ~34 MB double-buffered, wte 77 MB -> tight claim
    D, F, H, B, T = 768, 3072, 12, 8, 104
    need = 2 * ((4 * D * D + 2 * D * F) * 2 + 2 * B * T * D * 2 + B * T * H * 4)
    park = 50257 * D * 2
    assert vmem_claim(need, park) == max(int(need * 1.5), 32 * MB)
    assert vmem_claim(need, park) + park <= int(127.5 * MB)
    # Bloom-560m real vocab: 514 MB table can never park -> claim big
    assert vmem_claim(need, 250880 * 1024 * 2) == 110 * MB
    # no table known -> previous flat-claim behavior
    assert vmem_claim(need, 0) == 110 * MB

    # quantized tables report their int8 footprint
    q = {"q": np.zeros((50257, D), np.int8), "s": np.zeros((D,), np.float32)}
    assert table_bytes(q) == 50257 * D
    assert table_bytes(np.zeros((50257, D), np.float32)) == 50257 * D * 4

    # fits_vmem: long-context serving shapes must take the XLA fallback
    assert fits_vmem(B, 1024, D, F, H)
    assert not fits_vmem(B, 65536, D, F, H)
    # the int8-cache scale planes count: large B*T with kv_int8 trips the
    # gate earlier than the bare cache bytes would
    assert fits_vmem(24, 8192, D, F, H, cache_bytes=1, kv_int8=True) <= \
        fits_vmem(24, 8192, D, F, H, cache_bytes=1, kv_int8=False)


@pytest.mark.parametrize("kv_int8", [False, True])
def test_inplace_cache_write_matches_append(kv_int8):
    """The in-place fused path (scalar cache_len -> in-kernel aliased window
    writes) must leave the cache byte-identical to the legacy path (rows
    returned, caller-side fused_cache_append) — including the int8 scale
    planes' quantization round-trip."""
    from cleantransformer_tpu.models.gpt import fused_cache_append
    from cleantransformer_tpu.ops.fused_decode import gpt_fused_decode
    from cleantransformer_tpu.ops.pallas_kernels import should_interpret

    cfg = GPTConfig(vocab_size=97, n_embd=64, n_positions=64, n_layer=2,
                    n_head=4, fused_decode=True, kv_cache_int8=kv_int8)
    m = GPTLMHeadModel(cfg, version="gpt2", rng=jax.random.PRNGKey(0))
    B, T, D, Hh = 2, 16, 64, 4
    cache = init_kv_cache(cfg, B, T)
    rs = np.random.RandomState(0)
    h = jnp.asarray(rs.randn(B, D), cfg.compute_dtype)
    bias = jnp.asarray(rs.randn(B, T, Hh), jnp.float32)
    bcur = jnp.zeros((B, Hh), jnp.float32)
    pos = jnp.asarray(5, jnp.int32)

    ya, nk, nv = gpt_fused_decode(
        m.params["blocks"], h, bias, bcur, cache["k"], cache["v"],
        config=cfg, version="gpt2", cache_len=None,
        interpret=should_interpret())
    legacy_k = fused_cache_append(cache["k"], nk, pos, Hh)
    legacy_v = fused_cache_append(cache["v"], nv, pos, Hh)

    yb, ik, iv = gpt_fused_decode(
        m.params["blocks"], h, bias, bcur, cache["k"], cache["v"],
        config=cfg, version="gpt2", cache_len=pos,
        interpret=should_interpret())

    assert np.array_equal(np.asarray(ya), np.asarray(yb))
    for a, b in ((legacy_k, ik), (legacy_v, iv)):
        if kv_int8:
            assert np.array_equal(np.asarray(a["q"]), np.asarray(b["q"]))
            assert np.array_equal(np.asarray(a["s"]), np.asarray(b["s"]))
        else:
            assert np.array_equal(np.asarray(a), np.asarray(b))
