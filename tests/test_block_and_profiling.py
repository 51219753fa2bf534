"""Vanilla TransformerBlock parity + profiling utilities."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from cleantransformer_tpu.ops.transformer_block import (
    transformer_block, init_transformer_block_params)
from cleantransformer_tpu.utils.profiling import (
    transformer_flops, count_params, StepTimer)


def test_vanilla_block_matches_reference():
    from CleanTransformer.transformer import TransformerBlock as RefBlock

    class Cfg:
        num_attention_heads = 3
        layer_norm_epsilong = 1e-5
        attention_probs_dropout_prob = 0.0
        hidden_size = 12
        hidden_dropout_prob = 0.0

    torch.manual_seed(999)
    ref = RefBlock(Cfg())
    ref.eval()
    x = torch.rand(3, 4, 12)
    with torch.no_grad():
        expected = ref(x).numpy()

    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}
    params = {
        "attention": {n: {"w": jnp.asarray(sd[f"attention.{n}_linear.weight"].T),
                          "b": jnp.asarray(sd[f"attention.{n}_linear.bias"])}
                      for n in ("q", "k", "v")},
        "ffw": {"fc": {"w": jnp.asarray(sd["ffw.0.weight"].T),
                       "b": jnp.asarray(sd["ffw.0.bias"])},
                "out": {"w": jnp.asarray(sd["ffw.2.weight"].T),
                        "b": jnp.asarray(sd["ffw.2.bias"])}},
        "norm1": {"w": jnp.asarray(sd["norm1.weight"]), "b": jnp.asarray(sd["norm1.bias"])},
        "norm2": {"w": jnp.asarray(sd["norm2.weight"]), "b": jnp.asarray(sd["norm2.bias"])},
    }
    got = transformer_block(params, jnp.asarray(x.numpy()), Cfg())
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-4, atol=1e-5)


def test_init_and_run_block():
    class Cfg:
        num_attention_heads = 4
        hidden_size = 16
        layer_norm_epsilong = 1e-5
        hidden_dropout_prob = 0.1
    params = init_transformer_block_params(Cfg(), jax.random.PRNGKey(0))
    x = jnp.ones((2, 5, 16))
    out = transformer_block(params, x, Cfg(), deterministic=False,
                            rng=jax.random.PRNGKey(1))
    assert out.shape == x.shape and np.isfinite(np.asarray(out)).all()


def test_flops_and_param_count():
    params = {"a": jnp.ones((10, 20)), "b": {"c": jnp.ones(5)}}
    assert count_params(params) == 205
    f_train = transformer_flops(1e6, 128, 64, 2)
    f_fwd = transformer_flops(1e6, 128, 64, 2, fwd_only=True)
    assert f_train > f_fwd > 0


def test_step_timer():
    t = StepTimer(tokens_per_step=100)
    for _ in range(2):
        with t:
            jax.block_until_ready(jnp.ones(10) * 2)
    s = t.summary()
    assert s["steps"] == 2 and s["tokens_per_sec"] > 0
