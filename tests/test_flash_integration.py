"""Flash-attention integration: flag-switched model forwards must match the
dense parity path (away from the -1e4-vs--inf causal fill difference)."""

import numpy as np

import jax
import jax.numpy as jnp

from cleantransformer_tpu.config import BloomConfig, GPTConfig
from cleantransformer_tpu.models.bloom import BloomForCausalLM, init_bloom_params
from cleantransformer_tpu.models.gpt import GPTLMHeadModel, init_gpt_params


import pytest

pytestmark = pytest.mark.slow  # full tier; fast tier: -m 'not slow'

def test_gpt_flash_matches_dense_forward():
    kw = dict(vocab_size=64, n_embd=32, n_positions=128, n_layer=2, n_head=4)
    dense_cfg = GPTConfig(**kw)
    flash_cfg = GPTConfig(**kw, use_flash_attention=True)
    params = init_gpt_params(dense_cfg, jax.random.PRNGKey(0), "gpt2")
    rs = np.random.RandomState(0)
    ids = jnp.asarray(rs.randint(0, 64, (2, 50)), jnp.int32)  # ragged length
    mask = jnp.ones((2, 50), jnp.int32).at[1, :7].set(0)
    m_dense = GPTLMHeadModel(dense_cfg, version="gpt2", params=params)
    m_flash = GPTLMHeadModel(flash_cfg, version="gpt2", params=params)
    (ld, _), _ = m_dense(ids, mask)
    (lf, _), _ = m_flash(ids, mask)
    # pad-position query rows hold garbage in the dense path (uniform
    # attention over all-masked keys) and zeros in flash; compare valid rows
    valid = np.asarray(mask, bool)
    np.testing.assert_allclose(np.asarray(lf)[valid], np.asarray(ld)[valid],
                               rtol=2e-3, atol=2e-3)


def test_bloom_flash_matches_dense_forward_and_greedy():
    kw = dict(vocab_size=64, hidden_size=32, n_layer=2, num_attention_heads=4)
    dense_cfg = BloomConfig(**kw)
    flash_cfg = BloomConfig(**kw, use_flash_attention=True)
    params = init_bloom_params(dense_cfg, jax.random.PRNGKey(0))
    rs = np.random.RandomState(1)
    ids = jnp.asarray(rs.randint(0, 64, (2, 9)), jnp.int32)
    mask = jnp.ones((2, 9), jnp.int32).at[0, :3].set(0)
    m_dense = BloomForCausalLM(dense_cfg, params=params)
    m_flash = BloomForCausalLM(flash_cfg, params=params)
    (ld, _), _ = m_dense(ids, mask)
    (lf, _), _ = m_flash(ids, mask)
    d, f = np.asarray(ld), np.asarray(lf)
    valid = np.asarray(mask, bool)
    np.testing.assert_allclose(f[valid], d[valid], rtol=2e-3, atol=2e-3)

    # greedy decode: flash prefill + dense decode must yield the same tokens
    gen = {"beam_size": 1, "max_gen_len": 10, "do_sample": False,
           "end_ids": None, "pad_id": 0, "no_repeat_ngram_size": 0}
    out_d = m_dense.generate(ids, mask, generation_configs=gen)
    out_f = m_flash.generate(ids, mask, generation_configs=gen)
    assert (np.asarray(out_d) == np.asarray(out_f)).all()


def test_flash_training_step_runs():
    cfg = BloomConfig(vocab_size=64, hidden_size=32, n_layer=2,
                      num_attention_heads=4, use_flash_attention=True)
    model = BloomForCausalLM(cfg, rng=jax.random.PRNGKey(0))
    model._tie_weight()
    rs = np.random.RandomState(2)
    ids = jnp.asarray(rs.randint(0, 64, (4, 16)), jnp.int32)
    mask = jnp.ones((4, 16), jnp.int32)

    def loss_fn(params):
        (loss, _, _), _ = model.forward_fn()(params, cfg, ids, mask, None,
                                             None, None, labels=ids)
        return loss

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(model.params)
    assert np.isfinite(float(loss))
    for g in jax.tree_util.tree_leaves(grads):
        assert np.isfinite(np.asarray(g)).all()
