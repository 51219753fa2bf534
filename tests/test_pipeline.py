"""Pipeline parallelism (GPipe shard_map) vs single-device ground truth."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cleantransformer_tpu.config import BloomConfig
from cleantransformer_tpu.models.bloom import BloomForCausalLM, bloom_lm_forward
from cleantransformer_tpu.optim import adamw_decoupled
from cleantransformer_tpu.parallel.pipeline import (
    make_pipe_mesh, shard_params_for_pipeline, bloom_pipeline_loss_fn,
    make_pipeline_train_step,
)

pytestmark = [pytest.mark.slow,
              pytest.mark.skipif(jax.device_count() < 4,
                                 reason="needs 4 virtual devices")]


def _setup(n_layer=4, num_stages=4):
    cfg = BloomConfig(vocab_size=64, hidden_size=32, n_layer=n_layer,
                      num_attention_heads=4)
    model = BloomForCausalLM(cfg, rng=jax.random.PRNGKey(0))
    model._tie_weight()
    mesh = make_pipe_mesh(num_stages)
    return cfg, model, mesh


def _batch(bsz=8, seq=6, vocab=64, seed=0):
    rs = np.random.RandomState(seed)
    ids = rs.randint(0, vocab, (bsz, seq)).astype(np.int32)
    return {"input_ids": jnp.asarray(ids),
            "attention_mask": jnp.ones((bsz, seq), jnp.int32),
            "labels": jnp.asarray(ids)}


def _single_loss(cfg):
    def f(params, batch):
        (l, _, _), _ = bloom_lm_forward(params, cfg, batch["input_ids"],
                                        batch["attention_mask"],
                                        labels=batch["labels"])
        return l
    return f


def test_pipeline_loss_matches_single_device():
    cfg, model, mesh = _setup()
    batch = _batch()
    ref = float(jax.jit(_single_loss(cfg))(model.params, batch))
    loss_fn = bloom_pipeline_loss_fn(cfg, mesh, num_microbatches=4)
    params = shard_params_for_pipeline(model.params, mesh)
    got = float(jax.jit(loss_fn)(params, batch))
    assert abs(ref - got) < 2e-4, (ref, got)


def test_pipeline_grads_match_single_device():
    cfg, model, mesh = _setup()
    batch = _batch(seed=1)
    ref_grads = jax.jit(jax.grad(_single_loss(cfg)))(model.params, batch)
    loss_fn = bloom_pipeline_loss_fn(cfg, mesh, num_microbatches=2)
    params = shard_params_for_pipeline(model.params, mesh)
    pp_grads = jax.jit(jax.grad(loss_fn))(params, batch)
    for a, b in zip(jax.tree_util.tree_leaves(ref_grads),
                    jax.tree_util.tree_leaves(pp_grads)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-4)


def test_pipeline_train_step_decreases_loss():
    cfg, model, mesh = _setup()
    opt = adamw_decoupled(lr=1e-2)
    init_fn, _ = opt
    params = shard_params_for_pipeline(model.params, mesh)
    opt_state = init_fn(params)
    step = make_pipeline_train_step(cfg, mesh, num_microbatches=4, optimizer=opt)
    batch = _batch(seed=2)
    losses = []
    for _ in range(5):
        params, opt_state, loss = step(params, opt_state, batch)
        losses.append(float(loss))
    assert losses[-1] < losses[0], losses


def test_pipeline_uneven_stage_layers_rejected():
    cfg, model, mesh = _setup(n_layer=3, num_stages=4)
    with pytest.raises(Exception):
        # n_layer must divide num_stages: rejected at shard or trace time
        params = shard_params_for_pipeline(model.params, mesh)
        loss_fn = bloom_pipeline_loss_fn(cfg, mesh, num_microbatches=2)
        jax.jit(loss_fn)(params, _batch())
