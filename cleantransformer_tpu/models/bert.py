"""BERT as pure functions over pytree parameters.

Behavioral spec: the reference's modeling_bert.py:229-333. Same stacked-layer
scan design as models/gpt.py. Reference semantics:

 - embeddings: word + segment + position, then LayerNorm + dropout
   (modeling_bert.py:276-300);
 - additive padding mask ``(1-m) * -10000`` (modeling_bert.py:302-304);
 - block: attention -> post linear -> +residual -> norm1; ffw -> dropout ->
   +attention_out -> norm2 (modeling_bert.py:251-264);
 - [CLS] pooler: linear + tanh (modeling_bert.py:284-310);
 - classification head: dropout + linear (modeling_bert.py:315-333).
"""

import math

import jax
import jax.numpy as jnp

from cleantransformer_tpu.ops.activations import ACT2FN
from cleantransformer_tpu.ops.layers import layer_norm, linear
from cleantransformer_tpu.parallel.sharding import shard_hint


def init_bert_params(config, rng, num_labels=None):
    D, V, L = config.hidden_size, config.vocab_size, config.num_hidden_layers
    I = config.intermediate_size
    P, T = config.max_position_embeddings, config.type_vocab_size
    keys = jax.random.split(rng, 12)
    std = config.initializer_range
    dt = config.param_dtype

    def norm(k, *shape):
        return (jax.random.normal(k, shape) * std).astype(dt)

    def ln(shape):
        return {"w": jnp.ones(shape, dt), "b": jnp.zeros(shape, dt)}

    def lin(k, din, dout, stacked=True):
        shape = (L, din, dout) if stacked else (din, dout)
        bshape = (L, dout) if stacked else (dout,)
        return {"w": norm(k, *shape), "b": jnp.zeros(bshape, dt)}

    params = {
        "word_embeddings": norm(keys[0], V, D),
        "position_embeddings": norm(keys[1], P, D),
        "segment_embeddings": norm(keys[2], T, D),
        "embedding_ln": ln((D,)),
        "blocks": {
            "attn": {
                "q": lin(keys[3], D, D), "k": lin(keys[4], D, D),
                "v": lin(keys[5], D, D), "out": lin(keys[6], D, D),
            },
            "norm1": ln((L, D)),
            "ffw": {"fc": lin(keys[7], D, I), "out": lin(keys[8], I, D)},
            "norm2": ln((L, D)),
        },
        "pooler": {"w": norm(keys[9], D, D), "b": jnp.zeros((D,), dt)},
    }
    if num_labels:
        params["classifier"] = {"w": norm(keys[10], D, num_labels),
                                "b": jnp.zeros((num_labels,), dt)}
    return params


def _bert_block(block_params, h, config, additive_mask):
    eps = config.layer_norm_eps
    H = config.num_attention_heads
    D = config.hidden_size
    B, S, _ = h.shape
    hd = D // H
    act = ACT2FN[config.hidden_act]

    def heads(x):
        return x.reshape(B, S, H, hd).transpose(0, 2, 1, 3)

    a = block_params["attn"]
    q = heads(linear(h, a["q"]["w"], a["q"]["b"]))
    k = heads(linear(h, a["k"]["w"], a["k"]["b"]))
    v = heads(linear(h, a["v"]["w"], a["v"]["b"]))
    k = shard_hint(k, ("data", "model", None, None))
    scores = jnp.matmul(q, k.swapaxes(-1, -2)) / math.sqrt(D / H)
    if additive_mask is not None:
        scores = scores + additive_mask.astype(scores.dtype)
    weights = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(v.dtype)
    attn = jnp.matmul(weights, v).transpose(0, 2, 1, 3).reshape(B, S, D)
    attn = linear(attn, a["out"]["w"], a["out"]["b"])
    h = layer_norm(attn + h, block_params["norm1"]["w"], block_params["norm1"]["b"], eps)

    f = block_params["ffw"]
    x = act(linear(h, f["fc"]["w"], f["fc"]["b"]))
    x = shard_hint(x, ("data", None, "model"))
    x = linear(x, f["out"]["w"], f["out"]["b"])
    return layer_norm(x + h, block_params["norm2"]["w"], block_params["norm2"]["b"], eps)


def bert_forward(params, config, input_ids, attention_mask=None, segment_ids=None,
                 position_ids=None):
    """BertModel.forward (modeling_bert.py:289-312). Returns (hidden, pooled)."""
    B, S = input_ids.shape
    if position_ids is None:
        position_ids = jnp.arange(S, dtype=jnp.int32)[None, :]
    if segment_ids is None:
        segment_ids = jnp.zeros((B, S), jnp.int32)

    h = (params["word_embeddings"][input_ids]
         + params["segment_embeddings"][segment_ids]
         + params["position_embeddings"][position_ids])
    h = layer_norm(h, params["embedding_ln"]["w"], params["embedding_ln"]["b"],
                   config.layer_norm_eps)
    h = h.astype(config.compute_dtype)
    h = shard_hint(h, ("data", None, None))

    additive_mask = None
    if attention_mask is not None:
        additive_mask = (1.0 - attention_mask[:, None, None, :].astype(jnp.float32)) * -10000.0

    def body(carry, block_params):
        return _bert_block(block_params, carry, config, additive_mask), None

    h, _ = jax.lax.scan(body, h, params["blocks"])

    pooled = jnp.tanh(linear(h[:, 0], params["pooler"]["w"], params["pooler"]["b"]))
    return h, pooled


def bert_classify(params, config, input_ids, attention_mask=None, segment_ids=None,
                  position_ids=None):
    """BertForSequenceClassification.forward (modeling_bert.py:324-333)."""
    _, pooled = bert_forward(params, config, input_ids, attention_mask,
                             segment_ids, position_ids)
    return linear(pooled, params["classifier"]["w"], params["classifier"]["b"])


class BertModel:
    def __init__(self, config, params=None, rng=None):
        self.config = config
        self.params = params if params is not None else init_bert_params(
            config, rng if rng is not None else jax.random.PRNGKey(0))

    def __call__(self, input_ids, attention_mask=None, segment_ids=None,
                 position_ids=None):
        return bert_forward(self.params, self.config, input_ids, attention_mask,
                            segment_ids, position_ids)


class BertForSequenceClassification:
    def __init__(self, config, params=None, rng=None):
        self.config = config
        num_labels = getattr(config, "num_labels", None)
        self.params = params if params is not None else init_bert_params(
            config, rng if rng is not None else jax.random.PRNGKey(0),
            num_labels=num_labels)

    def __call__(self, input_ids, attention_mask=None, segment_ids=None,
                 position_ids=None):
        return bert_classify(self.params, self.config, input_ids, attention_mask,
                             segment_ids, position_ids)
