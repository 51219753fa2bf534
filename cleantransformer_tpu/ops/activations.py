"""Activation functions.

Constants follow the reference exactly so greedy decodes bit-match:
 - gelu_new: GPT-2's tanh approximation with math.sqrt(2/pi)
   (reference NewGELUActivation, modeling_gpt.py:112-119)
 - bloom_gelu: Bloom's tanh approximation with the truncated literal
   0.79788456 (reference bloom_gelu_forward, modeling_bloom.py:335-344).
   The reference hand-writes its backward (modeling_bloom.py:348-363);
   JAX autodiff of the forward yields the same gradient, so no custom VJP.
 - gelu: exact erf formulation (torch.nn.GELU default).
"""

import math

import jax
import jax.numpy as jnp


def relu(x):
    return jnp.maximum(x, 0)


def gelu(x):
    return 0.5 * x * (1.0 + jax.lax.erf(x / math.sqrt(2.0)))


def gelu_new(x):
    return 0.5 * x * (1.0 + jnp.tanh(math.sqrt(2.0 / math.pi) * (x + 0.044715 * jnp.power(x, 3.0))))


def bloom_gelu(x):
    return x * 0.5 * (1.0 + jnp.tanh(0.79788456 * x * (1 + 0.044715 * x * x)))


def tanh(x):
    return jnp.tanh(x)


def silu(x):
    """SiLU / swish (Llama-family MLP gate; HF ``ACT2FN["silu"]``)."""
    return x * jax.nn.sigmoid(x)


ACT2FN = {
    "relu": relu,
    "gelu": gelu,
    "gelu_new": gelu_new,
    "bloom_gelu": bloom_gelu,
    "tanh": tanh,
    "silu": silu,
    "swish": silu,
}
