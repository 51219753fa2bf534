"""Fused chunked lm_head+CE vs the dense logits path (ops/fused_ce.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cleantransformer_tpu.ops.fused_ce import fused_shift_ce
from cleantransformer_tpu.ops.losses import shift_cross_entropy_loss


def dense_loss(h, wte, labels, mask=None):
    logits = jnp.matmul(h, wte.T.astype(h.dtype)).astype(jnp.float32)
    return shift_cross_entropy_loss(logits, labels, mask=mask)


@pytest.mark.parametrize("chunk", [64, 96, 1000])
def test_fused_matches_dense_fp32(chunk):
    rs = np.random.RandomState(0)
    B, S, D, V = 2, 48, 16, 131
    h = jnp.asarray(rs.randn(B, S, D), jnp.float32)
    wte = jnp.asarray(rs.randn(V, D) * 0.2, jnp.float32)
    labels = jnp.asarray(rs.randint(0, V, (B, S)), jnp.int32)
    f = fused_shift_ce(h, wte, labels, chunk_tokens=chunk)
    d = dense_loss(h, wte, labels)
    np.testing.assert_allclose(np.asarray(f), np.asarray(d), rtol=2e-6)


def test_fused_grads_match_dense():
    rs = np.random.RandomState(1)
    B, S, D, V = 2, 33, 24, 97
    h = jnp.asarray(rs.randn(B, S, D), jnp.float32)
    wte = jnp.asarray(rs.randn(V, D) * 0.2, jnp.float32)
    labels = jnp.asarray(rs.randint(0, V, (B, S)), jnp.int32)
    mask = jnp.asarray((rs.rand(B, S) > 0.2).astype(np.int32))

    gf = jax.grad(lambda h, w: fused_shift_ce(h, w, labels, mask=mask,
                                              chunk_tokens=32), argnums=(0, 1))
    gd = jax.grad(lambda h, w: dense_loss(h, w, labels, mask=mask),
                  argnums=(0, 1))
    (fh, fw), (dh, dw) = gf(h, wte), gd(h, wte)
    np.testing.assert_allclose(np.asarray(fh), np.asarray(dh),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(fw), np.asarray(dw),
                               rtol=1e-4, atol=1e-6)


def test_ignore_index_and_mask_semantics():
    rs = np.random.RandomState(2)
    B, S, D, V = 2, 17, 8, 53
    h = jnp.asarray(rs.randn(B, S, D), jnp.float32)
    wte = jnp.asarray(rs.randn(V, D) * 0.2, jnp.float32)
    labels = np.asarray(rs.randint(0, V, (B, S)))
    labels[0, 5:9] = -100  # explicit ignore_index rows
    labels = jnp.asarray(labels, jnp.int32)
    f = fused_shift_ce(h, wte, labels)
    d = dense_loss(h, wte, labels)
    np.testing.assert_allclose(np.asarray(f), np.asarray(d), rtol=2e-6)


def test_bloom_lm_forward_fused_flag():
    from cleantransformer_tpu.config import BloomConfig
    from cleantransformer_tpu.models.bloom import BloomForCausalLM, bloom_lm_forward
    rs = np.random.RandomState(3)
    ids = jnp.asarray(rs.randint(1, 90, (2, 12)), jnp.int32)
    mask = jnp.ones_like(ids)

    cfg_d = BloomConfig(vocab_size=97, hidden_size=32, n_layer=2,
                        num_attention_heads=4)
    m = BloomForCausalLM(cfg_d, rng=jax.random.PRNGKey(0))
    m._tie_weight()
    (dense, _, _), _ = bloom_lm_forward(m.params, cfg_d, ids, mask, labels=ids)

    cfg_f = BloomConfig(vocab_size=97, hidden_size=32, n_layer=2,
                        num_attention_heads=4, fused_ce=True)
    (fused, logits, _), _ = bloom_lm_forward(m.params, cfg_f, ids, mask,
                                             labels=ids)
    assert logits is None  # fused path never materializes them
    np.testing.assert_allclose(np.asarray(fused), np.asarray(dense), rtol=2e-6)
