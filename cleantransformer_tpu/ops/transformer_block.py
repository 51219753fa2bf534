"""The vanilla post-LN TransformerBlock (reference: transformer.py:92-121).

attn -> dropout -> add&norm -> 4x ReLU FFW -> dropout -> add&norm. This is
the pedagogical standalone block (BERT/GPT/Bloom use their own specialized
blocks in models/); exposed for API parity with the reference's core layer.
"""

import jax
import jax.numpy as jnp

from cleantransformer_tpu.ops.attention import multi_head_attention
from cleantransformer_tpu.ops.layers import layer_norm, linear


def init_transformer_block_params(config, rng):
    D = config.hidden_size
    keys = jax.random.split(rng, 6)
    dt = getattr(config, "param_dtype", jnp.float32)

    def lin(k, din, dout):
        return {"w": (jax.random.normal(k, (din, dout)) * 0.02).astype(dt),
                "b": jnp.zeros((dout,), dt)}

    return {
        "attention": {"q": lin(keys[0], D, D), "k": lin(keys[1], D, D),
                      "v": lin(keys[2], D, D)},
        "ffw": {"fc": lin(keys[3], D, 4 * D), "out": lin(keys[4], 4 * D, D)},
        "norm1": {"w": jnp.ones((D,), dt), "b": jnp.zeros((D,), dt)},
        "norm2": {"w": jnp.ones((D,), dt), "b": jnp.zeros((D,), dt)},
    }


def transformer_block(params, x, config, attention_mask=None, head_mask=None,
                      deterministic=True, rng=None):
    """x: (b, s, d). Post-LN residual structure (transformer.py:107-121)."""
    eps = getattr(config, "layer_norm_epsilong", 1e-5)  # reference's field name
    drop = getattr(config, "hidden_dropout_prob", 0.0)

    def dropout(h, key):
        if deterministic or not drop:
            return h
        keep = jax.random.bernoulli(key, 1.0 - drop, h.shape)
        return jnp.where(keep, h / (1.0 - drop), 0.0)

    k1, k2 = (jax.random.split(rng) if rng is not None
              else (None, None))
    att = multi_head_attention(params["attention"], x,
                               config.num_attention_heads,
                               attention_mask=attention_mask,
                               head_mask=head_mask)
    h = layer_norm(x + dropout(att, k1), params["norm1"]["w"],
                   params["norm1"]["b"], eps)
    ffw = linear(jnp.maximum(linear(h, params["ffw"]["fc"]["w"],
                                    params["ffw"]["fc"]["b"]), 0),
                 params["ffw"]["out"]["w"], params["ffw"]["out"]["b"])
    return layer_norm(h + dropout(ffw, k2), params["norm2"]["w"],
                      params["norm2"]["b"], eps)
