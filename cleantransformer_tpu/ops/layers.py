"""Core layers as pure functions over pytree parameters.

TPU notes: these are plain jnp ops on purpose — XLA fuses the elementwise
chains into the surrounding matmuls. A fused Pallas LayerNorm kernel lives in
``cleantransformer_tpu.ops.pallas_kernels`` for the cases XLA doesn't fuse
(switchable; numerics match this implementation).
"""

import jax
import jax.numpy as jnp


def layer_norm(x, weight, bias, eps=1e-5, exact_reference=True, upcast=True):
    """LayerNorm matching the reference's from-scratch implementation.

    The reference (CleanTransformer/transformer.py:79-89) computes
    ``std = mean((x - mu)^2 + eps) ** 0.5`` — eps is added *inside* the
    square root to the squared deviations before averaging (equivalent to
    ``sqrt(var + eps)``), unlike torch's F.layer_norm which is also
    ``sqrt(var + eps)``; the reference's quirk relative to torch is biased
    variance over the normalized dims, which both share. ``exact_reference``
    keeps that formula; False uses rsqrt for speed (same numerics up to
    rounding).

    Normalization is over the trailing dims covered by ``weight.shape``
    (the reference supports multi-dim normalized_shape, transformer.py:71-77).

    ``upcast``: statistics are computed in fp32 even when x is bf16 (TPU
    policy; mirrors the fp32-accumulation the reference gets from torch).
    """
    ndims = weight.ndim
    axes = tuple(range(x.ndim - ndims, x.ndim))
    orig_dtype = x.dtype
    if upcast:
        x = x.astype(jnp.float32)
    mean = jnp.mean(x, axis=axes, keepdims=True)
    centered = x - mean
    if exact_reference:
        std = jnp.mean(centered * centered + eps, axis=axes, keepdims=True) ** 0.5
        out = centered / std
    else:
        var = jnp.mean(centered * centered, axis=axes, keepdims=True)
        out = centered * jnp.reciprocal(jnp.sqrt(var + eps))
    out = out.astype(orig_dtype)
    return weight.astype(orig_dtype) * out + bias.astype(orig_dtype)


def rms_norm(x, weight, eps=1e-6):
    """RMSNorm (Llama-family pre-norm): ``x * rsqrt(mean(x^2) + eps) * w``.

    Statistics in fp32 regardless of input dtype, multiply by the weight
    after casting back — matching HF ``LlamaRMSNorm`` exactly (variance over
    the last dim only, no mean subtraction, no bias).
    """
    orig_dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    out = (xf * jax.lax.rsqrt(var + eps)).astype(orig_dtype)
    return weight.astype(orig_dtype) * out


def linear(x, weight, bias=None):
    """Dense layer: ``x @ weight + bias``.

    Weights are stored in (in_features, out_features) layout — the natural
    right-multiply layout for the MXU, and the same layout HF GPT-2's Conv1D
    uses (reference Conv1D: modeling_gpt.py:32-46). torch.nn.Linear weights
    ((out, in)) are transposed at checkpoint-load time (utils/hf_loader.py).

    Also accepts int8 weight-only-quantized weights ({"q","s"} pytrees from
    ops/quant.py) — the convert fuses into the dot, halving HBM reads.
    """
    if isinstance(weight, dict) and "q" in weight:
        from cleantransformer_tpu.ops.quant import quantized_matmul
        out = quantized_matmul(x, weight)
    else:
        out = jnp.matmul(x, weight.astype(x.dtype))
    if bias is not None:
        out = out + bias.astype(x.dtype)
    return out
