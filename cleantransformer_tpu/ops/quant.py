"""Int8 weight-only quantization for inference.

Decode throughput on TPU is bounded by streaming the weights from HBM every
step; int8 weights halve the bytes vs bf16 (4x vs fp32). Symmetric
per-output-channel quantization: ``w ≈ q * s`` with ``q`` int8 and ``s`` the
per-column scale, so ``x @ w ≈ (x @ q) * s``. The int8->bf16 convert fuses
into the XLA dot, which reads the int8 buffer directly from HBM.

A quantized weight is the pytree ``{"q": int8[in,out], "s": f32[out]}``
(stacked layers keep the leading layer axis). ``ops.layers.linear`` and the
model lm_heads dispatch on this structure, so quantization is a pure
parameter transformation — no model code forks.

Extension beyond the reference (which has no quantization); opt-in via
``generate(..., )`` on a config with ``quantize_int8=True``.
"""

import jax
import jax.numpy as jnp


def quantize_weight(w, compute_dtype=jnp.bfloat16):
    """float (..., in, out) -> {"q": int8, "s": compute_dtype (..., out)}."""
    w = jnp.asarray(w)
    amax = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=-2, keepdims=True)
    scale = jnp.maximum(amax / 127.0, 1e-12)
    q = jnp.clip(jnp.round(w.astype(jnp.float32) / scale), -127, 127).astype(jnp.int8)
    return {"q": q, "s": scale.squeeze(-2).astype(compute_dtype)}


def is_quantized(w):
    return isinstance(w, dict) and "q" in w and "s" in w


def quantized_matmul(x, wq):
    """x (..., in) @ {"q": (..., in, out), "s": (..., out)} -> (..., out).
    The int8 operand converts inside the dot (XLA fuses the convert), so HBM
    reads stay int8-sized."""
    y = jnp.matmul(x, wq["q"].astype(x.dtype))
    return y * wq["s"].astype(x.dtype)


def dequantize_weight(wq, dtype=jnp.float32):
    return wq["q"].astype(dtype) * wq["s"][..., None, :].astype(dtype)


_EMBED_KEYS = ("tokens_embed", "word_embeddings", "lm_head", "embed_tokens")
# parent keys whose 'w' leaf is a projection matrix (LN 'w' leaves are not)
_LINEAR_PARENTS = frozenset({
    "c_attn", "c_proj", "c_fc", "q", "k", "v", "out", "fc",
    "query_key_value", "dense", "dense_h_to_4h", "dense_4h_to_h",
    "pooler", "classifier",
    # llama family (llama/mistral/qwen2/mixtral experts + router)
    "q_proj", "k_proj", "v_proj", "o_proj",
    "gate_proj", "up_proj", "down_proj",
})


def quantize_params_for_inference(params, include_embeddings=True,
                                  compute_dtype=jnp.bfloat16):
    """Quantize every projection weight ('w' under a linear-layer parent) and,
    optionally, the embedding/lm_head matrices; other leaves cast to
    compute_dtype.

    Embedding tables are quantized per-hidden-column; lookups dequantize as
    ``table_q[ids] * s`` and the tied lm_head uses the transposed form."""

    def walk(node, key=None, parent=None):
        if isinstance(node, dict):
            return {k: walk(v, k, key) for k, v in node.items()}
        x = jnp.asarray(node)
        if not jnp.issubdtype(x.dtype, jnp.floating):
            return x
        if key == "w" and parent in _LINEAR_PARENTS and x.ndim in (2, 3, 4):
            # ndim 2 = single layer, 3 = layer-stacked (scan params), 4 =
            # layer-stacked expert weights ((L, E, D, I) — per-(expert,
            # out-column) scales; the MoE dispatch paths in ops/moe.py
            # dequantize inside their einsums/ragged dots, so MoE decode
            # streams int8 expert bytes).
            return quantize_weight(x, compute_dtype)
        if include_embeddings and key in _EMBED_KEYS and x.ndim == 2:
            # per-hidden-dim scales: table (V, D) -> q (V, D), s (D,)
            amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=0, keepdims=True)
            scale = jnp.maximum(amax / 127.0, 1e-12)
            q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127).astype(jnp.int8)
            return {"q": q, "s": scale[0].astype(compute_dtype), "embed": True}
        return x.astype(compute_dtype)

    return walk(params)


def embed_lookup(table, ids, compute_dtype=None):
    """Embedding lookup supporting quantized tables."""
    if is_quantized(table):
        out = table["q"][ids].astype(table["s"].dtype) * table["s"]
        return out
    return table[ids] if compute_dtype is None else table[ids].astype(compute_dtype)


def lm_head_matmul(h, table):
    """logits = h @ table^T, supporting quantized tables:
    (h * s) @ q^T reads int8 from HBM."""
    if is_quantized(table):
        return jnp.matmul(h * table["s"].astype(h.dtype),
                          table["q"].T.astype(h.dtype))
    return jnp.matmul(h, table.T.astype(h.dtype))
