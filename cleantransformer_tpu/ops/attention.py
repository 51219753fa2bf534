"""Attention primitives.

``dense_attention`` is the reference-semantics materialized-s×s path used for
bit-parity with the PyTorch reference (CleanTransformer/transformer.py:30-58).
The Pallas flash-attention fast path (never materializing s×s) lives in
``cleantransformer_tpu.ops.pallas_kernels`` and is flag-switchable at the
model level.

Shape conventions: hidden states are (batch, seq, dim); per-head tensors are
(batch, heads, seq, head_dim).
"""

import math

import jax.numpy as jnp

from cleantransformer_tpu.ops.layers import linear


def split_heads(x, num_heads):
    """(b, s, d) -> (b, h, s, hd)  (reference _split_m_head, transformer.py:25-28)."""
    b, s, d = x.shape
    return x.reshape(b, s, num_heads, d // num_heads).transpose(0, 2, 1, 3)


def merge_heads(x):
    """(b, h, s, hd) -> (b, s, d)  (reference transformer.py:56-57)."""
    b, h, s, hd = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, s, h * hd)


def dense_attention(q, k, v, additive_mask=None, scale=None, head_mask=None,
                    upcast_softmax=False, bool_mask=None, bias=None):
    """Scaled dot-product attention with the reference's mask semantics.

    q: (b, h, q_len, hd); k, v: (b, h, k_len, hd).

    - ``scale``: multiplier on the raw scores (None = no scaling; the vanilla
      reference layer uses 1/sqrt(dim/heads), transformer.py:41-42).
    - ``additive_mask``: added to scores pre-softmax (reference transformer.py:43-45).
    - ``bool_mask``: True = masked; filled with finfo.min (Bloom semantics,
      modeling_bloom.py:108-109).
    - ``bias``: additive score bias applied before masking (ALiBi).
    - ``upcast_softmax``: run masked-softmax in fp32 (Bloom's fp16->fp32
      upcast, modeling_bloom.py:106-107; on TPU this is the bf16 policy).
    - ``head_mask``: multiplicative, post-softmax (transformer.py:48-50).
    """
    scores = jnp.matmul(q, k.swapaxes(-1, -2))
    if scale is not None:
        scores = scores * scale
    if bias is not None:
        scores = scores + bias.astype(scores.dtype)
    if upcast_softmax and scores.dtype != jnp.float32:
        scores = scores.astype(jnp.float32)
    if additive_mask is not None:
        scores = scores + additive_mask.astype(scores.dtype)
    if bool_mask is not None:
        scores = jnp.where(bool_mask, jnp.finfo(scores.dtype).min, scores)
    weights = jnp.exp(scores - jnp.max(scores, axis=-1, keepdims=True))
    weights = weights / jnp.sum(weights, axis=-1, keepdims=True)
    weights = weights.astype(v.dtype)
    if head_mask is not None:
        weights = weights * head_mask
    return jnp.matmul(weights, v)


def multi_head_attention(params, hidden_states, num_heads, attention_mask=None,
                         head_mask=None):
    """The vanilla reference AttentionLayer (transformer.py:12-58): separate
    q/k/v projections, scale 1/sqrt(dim/heads), additive mask pre-softmax,
    multiplicative head mask post-softmax.

    params: {'q': {'w','b'}, 'k': {...}, 'v': {...}} with (in, out) weights.
    """
    dim = hidden_states.shape[-1]
    q = split_heads(linear(hidden_states, params["q"]["w"], params["q"]["b"]), num_heads)
    k = split_heads(linear(hidden_states, params["k"]["w"], params["k"]["b"]), num_heads)
    v = split_heads(linear(hidden_states, params["v"]["w"], params["v"]["b"]), num_heads)
    out = dense_attention(q, k, v, additive_mask=attention_mask,
                          scale=1.0 / math.sqrt(dim / num_heads), head_mask=head_mask)
    return merge_heads(out)
