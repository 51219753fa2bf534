"""Llama-family models (RoPE + RMSNorm + SwiGLU + GQA) as pure functions.

Extension beyond the reference (which stops at Bloom,
CleanTransformer/models/modeling_bloom.py): a user switching frameworks
expects the modern decoder family — Llama 1/2/3, Mistral, and friends share
this exact architecture. The behavioral spec is HF ``modeling_llama.py``
(parity asserted against ``transformers.LlamaForCausalLM`` in
tests/test_llama.py); the design is TPU-first and mirrors models/gpt.py:

 - stacked layer params + ``lax.scan`` (one compiled block);
 - fixed-shape KV cache updated in place as a scan carry
   (``num_key_value_heads`` heads — GQA caches are ``H/Hkv``× smaller);
 - rotary embeddings computed from dynamic position_ids (any cache offset:
   decode, chunked prefill, speculative verify windows are all exact);
 - grouped-query attention computed by reshaping queries to
   (B, Hkv, group, S, hd) and contracting against the unexpanded
   (B, Hkv, T, hd) cache — repeated K/V heads are never materialized on the
   bandwidth-bound decode path;
 - single-token decode folds causal+padding into one additive bias shared
   by every layer (see models/gpt.py);
 - flash attention (Pallas) for multi-token forwards via
   ``config.use_flash_attention``; int8 KV cache via ``config.kv_cache_int8``.

Parameter layout (no biases by default — ``attention_bias``/``mlp_bias``
add them; all linears in (in, out) right-multiply layout):

  {'embed_tokens': (V, D),
   'blocks': {'input_layernorm': {'w': (L, D)},
              'self_attn': {'q_proj': {'w': (L, D, H*hd)},
                            'k_proj': {'w': (L, D, Hkv*hd)},
                            'v_proj': {'w': (L, D, Hkv*hd)},
                            'o_proj': {'w': (L, H*hd, D)}},
              'post_attention_layernorm': {'w': (L, D)},
              'mlp': {'gate_proj': {'w': (L, D, I)},
                      'up_proj':   {'w': (L, D, I)},
                      'down_proj': {'w': (L, I, D)}}},
   'norm': {'w': (D,)},
   'lm_head': (V, D)}     # absent => weight-tied to embed_tokens
"""

import math

import jax
import jax.numpy as jnp

from cleantransformer_tpu.ops.activations import ACT2FN
from cleantransformer_tpu.ops.layers import linear, rms_norm
from cleantransformer_tpu.ops.losses import shift_cross_entropy_loss
from cleantransformer_tpu.ops.quant import embed_lookup, lm_head_matmul
from cleantransformer_tpu.parallel.sharding import shard_hint

CAUSAL_NEG = jnp.finfo(jnp.float32).min


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def init_llama_params(config, rng):
    D, V, L = config.hidden_size, config.vocab_size, config.n_layer
    H, Hkv, hd = (config.num_attention_heads, config.num_key_value_heads,
                  config.head_dim)
    I = config.intermediate_size
    keys = jax.random.split(rng, 10)
    std = config.initializer_range
    dt = config.param_dtype

    def norm(k, *shape):
        return (jax.random.normal(k, shape) * std).astype(dt)

    def proj(k, din, dout, bias):
        p = {"w": norm(k, L, din, dout)}
        if bias:
            p["b"] = jnp.zeros((L, dout), dt)
        return p

    ab, mb = config.attention_bias, config.mlp_bias
    E = getattr(config, "num_local_experts", 0)
    if E and E > 0:
        # sparse-MoE block (Mixtral): router + expert-stacked SwiGLU weights
        mlp = {
            "gate": {"w": norm(keys[5], L, D, E)},
            "experts": {
                "gate_proj": {"w": norm(keys[6], L, E, D, I)},
                "up_proj": {"w": norm(keys[7], L, E, D, I)},
                "down_proj": {"w": norm(keys[9], L, E, I, D)},
            },
        }
        mlp_key = "block_sparse_moe"
    else:
        mlp = {
            "gate_proj": proj(keys[5], D, I, mb),
            "up_proj": proj(keys[6], D, I, mb),
            "down_proj": proj(keys[7], I, D, mb),
        }
        mlp_key = "mlp"
    params = {
        "embed_tokens": norm(keys[0], V, D),
        "blocks": {
            "input_layernorm": {"w": jnp.ones((L, D), dt)},
            "self_attn": {
                "q_proj": proj(keys[1], D, H * hd, ab),
                "k_proj": proj(keys[2], D, Hkv * hd, ab),
                "v_proj": proj(keys[3], D, Hkv * hd, ab),
                # Qwen2: qkv biased, o_proj not (attention_out_bias=False)
                "o_proj": proj(keys[4], H * hd, D,
                               getattr(config, "attention_out_bias", ab)),
            },
            "post_attention_layernorm": {"w": jnp.ones((L, D), dt)},
            mlp_key: mlp,
        },
        "norm": {"w": jnp.ones((D,), dt)},
    }
    if not config.tie_word_embeddings:
        params["lm_head"] = norm(keys[8], V, D)
    return params


def swa_ring_rows(config, max_len):
    """Row capacity of a sliding-window RING cache (config.swa_ring_cache):
    the window rounded up to a sublane multiple, capped by the horizon. A
    Mistral-class 32k context with window 4096 keeps 4096 cache rows instead
    of 32768 — both the KV memory and the per-step cache stream become
    window-bounded. When max_len fits inside the ring the mod arithmetic
    degenerates to the plain layout (slot == position), so short generates
    are unchanged."""
    W = -(-int(config.sliding_window) // 8) * 8
    return min(max_len, W)


def init_llama_cache(config, batch_size, max_len, dtype=None,
                     head_major=None):
    """KV cache over ``num_key_value_heads`` (GQA: H/Hkv x smaller than a
    full-head cache). Same {'k','v','length'} layout as models/gpt.py, so
    the generic cache_write/cache_layer_kv helpers (incl. int8 mode) apply.

    With ``config.swa_ring_cache`` (requires ``sliding_window``) the buffer
    holds only ``swa_ring_rows`` rows written at ``position % rows`` —
    llama_forward owns the ring masking/writes."""
    L, Hkv, hd = config.n_layer, config.num_key_value_heads, config.head_dim
    dtype = dtype or config.compute_dtype
    if (getattr(config, "swa_ring_cache", False)
            and getattr(config, "sliding_window", None)):
        if getattr(config, "kv_cache_int8", False):
            raise ValueError("swa_ring_cache does not compose with "
                             "kv_cache_int8 (use one or the other)")
        max_len = swa_ring_rows(config, max_len)
    if head_major is None:
        head_major = getattr(config, "decode_head_major", False)
    if getattr(config, "kv_cache_int8", False):
        if head_major:
            # int8 HEAD-MAJOR slab: {"q": (L, B, T, Hkv*hd) int8, "sT":
            # (L, B, Hkv, T) f32 T-MINOR scales} — S==1 decode streams it
            # through the blocked GQA kernel (ops/gqa_decode.py) at the
            # true int8 byte rate. The scales are T-minor so their tiled
            # HBM image pads only the Hkv sublanes (2x) instead of the
            # lanes (~32x, which used to cost the whole int8 saving — see
            # ops/gqa_decode.py docstring); that puts the streamed key axis
            # on lanes, so capacity rounds to 128/512 tiles to give the
            # kernel 128-multiple key blocks.
            tile = 512 if max_len > 2048 else 128
            T = -(-max_len // tile) * tile
            def fbuf():
                return {"q": jnp.zeros((L, batch_size, T, Hkv * hd),
                                       jnp.int8),
                        "sT": jnp.zeros((L, batch_size, Hkv, T),
                                        jnp.float32)}
            return {"k": fbuf(), "v": fbuf(),
                    "length": jnp.zeros((), jnp.int32)}
        def buf():
            return {"q": jnp.zeros((L, batch_size, Hkv, max_len, hd), jnp.int8),
                    "s": jnp.zeros((L, batch_size, Hkv, max_len), jnp.float32)}
        return {"k": buf(), "v": buf(), "length": jnp.zeros((), jnp.int32)}
    if head_major:
        # (L, B, T, Hkv*hd) head-major rows: a decode step's cache write is
        # ONE contiguous-lane row per (layer, batch) instead of Hkv
        # scattered half-lane tiles — the per-tile-run update cost (~0.2 us
        # each, profiled) made the (L,B,Hkv,T,hd) writes 35% of a tinyllama
        # b32 step. S==1 attention runs directly on the head-major slab
        # (_gqa_attend_headmajor); multi-token prefill takes the generic 4D
        # helpers (models/gpt.py cache_write/cache_layer_kv).
        return {
            "k": jnp.zeros((L, batch_size, max_len, Hkv * hd), dtype),
            "v": jnp.zeros((L, batch_size, max_len, Hkv * hd), dtype),
            "length": jnp.zeros((), jnp.int32),
        }
    return {
        "k": jnp.zeros((L, batch_size, Hkv, max_len, hd), dtype),
        "v": jnp.zeros((L, batch_size, Hkv, max_len, hd), dtype),
        "length": jnp.zeros((), jnp.int32),
    }


def init_llama_cache_dense(config, batch_size, max_len, dtype=None):
    """init_llama_cache forced to the (L, B, Hkv, T, hd) layout even when
    ``config.decode_head_major`` is set — batch-axis reorder (beam) and
    ragged per-row writes (batched speculative) need it."""
    return init_llama_cache(config, batch_size, max_len, dtype,
                            head_major=False)


# ---------------------------------------------------------------------------
# rotary embeddings
# ---------------------------------------------------------------------------

def rope_inv_freq(config):
    """Inverse frequencies honoring ``config.rope_scaling`` (HF semantics).

    Supported rope_type: None/"default", "linear" (inv_freq / factor), and
    "llama3" (Llama-3.1 frequency-dependent smooth interpolation). Anything
    else (dynamic NTK, yarn, ...) is REJECTED loudly — a config field that
    changes the positional math must never be silently ignored."""
    head_dim = config.head_dim
    theta = config.rope_theta
    inv_freq = 1.0 / (theta ** (
        jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))  # (hd/2,)
    scaling = getattr(config, "rope_scaling", None)
    if scaling is None:
        return inv_freq
    rope_type = scaling.get("rope_type", scaling.get("type", "default"))
    if rope_type == "default":
        return inv_freq
    if rope_type == "linear":
        return inv_freq / float(scaling["factor"])
    if rope_type == "llama3":
        factor = float(scaling["factor"])
        low = float(scaling["low_freq_factor"])
        high = float(scaling["high_freq_factor"])
        orig = float(scaling["original_max_position_embeddings"])
        wavelen = 2.0 * math.pi / inv_freq
        smooth = (orig / wavelen - low) / (high - low)
        smooth = jnp.clip(smooth, 0.0, 1.0)
        interp = (1.0 - smooth) * (inv_freq / factor) + smooth * inv_freq
        return jnp.where(wavelen > orig / low, inv_freq / factor,
                         jnp.where(wavelen < orig / high, inv_freq, interp))
    raise ValueError(
        f"unsupported rope_scaling type {rope_type!r} (supported: default, "
        "linear, llama3)")


def rope_cos_sin(position_ids, config):
    """cos/sin tables for the given positions (HF LlamaRotaryEmbedding):
    inv_freq over even dims, freqs duplicated into both halves. Computed in
    fp32; returns (B, S, hd) fp32 — callers cast at the multiply."""
    inv_freq = rope_inv_freq(config)
    freqs = position_ids.astype(jnp.float32)[..., None] * inv_freq  # (B,S,hd/2)
    emb = jnp.concatenate([freqs, freqs], axis=-1)                  # (B,S,hd)
    return jnp.cos(emb), jnp.sin(emb)


def _rotate_half(x):
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope(x, cos, sin):
    """x: (B, h, S, hd); cos/sin: (B, S, hd)."""
    c = cos[:, None].astype(x.dtype)
    s = sin[:, None].astype(x.dtype)
    return x * c + _rotate_half(x) * s


def apply_rope_headmajor(x, cos, sin, n_head):
    """RoPE on a head-major (B, S, n_head*hd) tensor — the projection
    output's native layout, so the flash-bsd attention path never pays the
    (B, S, H, hd) -> (B, H, S, hd) relayout copies (at hd=64 XLA
    materializes those around pallas custom-calls at ~28 GB/s). Math is
    identical to apply_rope per head; cos/sin: (B, S, hd) fp32."""
    B, S, D = x.shape
    hd = D // n_head
    x4 = x.reshape(B, S, n_head, hd)
    c = cos[:, :, None, :].astype(x.dtype)
    s = sin[:, :, None, :].astype(x.dtype)
    x1, x2 = jnp.split(x4, 2, axis=-1)
    rot = jnp.concatenate([-x2, x1], axis=-1)
    return (x4 * c + rot * s).reshape(B, S, D)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _gqa_attend_headmajor(q, k_slab, v_slab, k_cur, v_cur, mask_cache,
                          mask_cur, scale):
    """S==1 grouped-query attention directly on a head-major cache slab.

    The (L, B, T, Dkv) cache layout makes the decode write ONE
    contiguous-lane row per (layer, batch) — see init_llama_cache — but its
    kv heads live packed in the lane axis, so splitting them out for the
    standard (B, Hkv, T, hd) matmuls would materialize relayout copies of
    the whole slab. Instead the head structure moves into the SMALL operand:
    the query expands to a block-diagonal q̃ (B, Dkv, H) with
    q̃[b, (g, dj), h] = q[b, h, dj] * (g == h // group), and both attention
    contractions run as single batched MXU matmuls on the slab's native
    layout:

        scores (B, T, H)  = K_slab @ q̃
        out_dk (B, Dkv, H) = V_slab^T @ softmax-weights

    out_dk holds each q-head's output in its kv-group's lane rows; a
    constant block-diagonal einsum extracts the (B, H*hd) result. The
    current token's k/v (not yet written — the caller batches all layers'
    rows after the scan) joins as one merged column, exactly the
    ops/fused_decode.py trick.

    q: (B, H, 1, hd); k_slab/v_slab: (B, T, Dkv); k_cur/v_cur: (B, Dkv);
    mask_cache: (B?, T, 1) fp32 additive; mask_cur: (B?, 1).
    Returns (B, H*hd) in q.dtype."""
    B, H, _, hd = q.shape
    T, Dkv = k_slab.shape[1], k_slab.shape[2]
    Hkv = Dkv // hd
    g = H // Hkv
    cdt = q.dtype
    qr = q[:, :, 0, :].reshape(B, Hkv, g, hd)
    qT = qr.transpose(0, 1, 3, 2)                        # (B, Hkv, hd, g)
    eye = jnp.eye(Hkv, dtype=cdt)
    qt = qT[:, None] * eye[None, :, :, None, None]       # (B, Hkv_d, Hkv_h, hd, g)
    q_tilde = qt.transpose(0, 1, 3, 2, 4).reshape(B, Dkv, H)
    s1 = jax.lax.dot_general(k_slab, q_tilde,
                             (((2,), (1,)), ((0,), (0,))),
                             preferred_element_type=jnp.float32)  # (B, T, H)
    s1 = s1 * scale + mask_cache
    s_cur = jnp.einsum('bd,bdh->bh', k_cur, q_tilde,
                       preferred_element_type=jnp.float32)
    s_cur = s_cur * scale + mask_cur
    m = jnp.maximum(jnp.max(s1, axis=1), s_cur)          # (B, H)
    p1 = jnp.exp(s1 - m[:, None, :])
    pc = jnp.exp(s_cur - m)
    den = jnp.sum(p1, axis=1) + pc                       # (B, H)
    w1 = (p1 / den[:, None, :]).astype(cdt)
    wc = (pc / den).astype(cdt).astype(jnp.float32)
    out_dk = jax.lax.dot_general(v_slab, w1,
                                 (((1,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
    out_dk = out_dk + v_cur.astype(jnp.float32)[:, :, None] * wc[:, None, :]
    od = out_dk.reshape(B, Hkv, hd, Hkv, g)
    diag = jnp.einsum('bidkj,ik->bijd', od,
                      jnp.eye(Hkv, dtype=out_dk.dtype))  # (B, Hkv, g, hd)
    return diag.reshape(B, H * hd).astype(cdt)


def _gqa_blocked_attend(q, k_cur, v_cur, k_cache, v_cache, li, mask_cache,
                        mask_cur, scale, config):
    """S==1 GQA attention on an int8 HEAD-MAJOR cache slab ({"q":
    (L, B, T, Dkv) int8, "sT": (L, B, Hkv, T) f32 T-minor scales}).

    The cache columns stream through the blocked pallas kernel
    (ops/gqa_decode.gqa_blocked_partials — int8 bytes read exactly once,
    dequant on the VMEM side); this epilogue merges the current token's
    column, normalizes, and extracts the block diagonal — all small-tensor
    XLA. The current k/v are quantize-ROUNDTRIPPED with cache_write's exact
    math before scoring, because the post-scan write stores them quantized
    and later steps read them back — the merged column must see the same
    rounding (ops/fused_decode.py applies the same rule in-kernel).

    q: (B, H, 1, hd) roped; k_cur/v_cur: (B, Hkv, 1, hd) roped;
    mask_cache: (B?, 1, 1, T) fp32 additive (strict causal + padding);
    mask_cur: (B?, 1, 1, 1). Returns (out (B, H*hd), k_row, v_row (B, Dkv)
    FLOAT rows — the caller's post-scan write quantizes them)."""
    B, H, _, hd = q.shape
    Hkv = k_cur.shape[1]
    Dkv = Hkv * hd
    g = H // Hkv
    cdt = q.dtype
    # block-diagonal q_tilde (B, H, Dkv) — _gqa_attend_headmajor's trick in
    # the kernel's flash orientation: q-head h = (i, j) occupies kv group
    # i's hd lanes of row h
    qr = q[:, :, 0, :].reshape(B, Hkv, g, hd)
    eye = jnp.eye(Hkv, dtype=cdt)
    qt = qr[:, :, :, None, :] * eye[None, :, None, :, None]
    q_tilde = qt.reshape(B, H, Dkv)

    T = k_cache["q"].shape[2]
    # dense (B, T) bias — a trailing size-1 dim would tile to 128 lanes in
    # HBM and cost ~half the int8 payload's bandwidth to stream
    bias = jnp.maximum(jnp.broadcast_to(mask_cache[:, 0, 0, :], (B, T)),
                       -1e30)
    from cleantransformer_tpu.ops.gqa_decode import gqa_blocked_partials
    from cleantransformer_tpu.ops.pallas_kernels import should_interpret
    m, den, acc = gqa_blocked_partials(
        q_tilde, k_cache["q"], k_cache["sT"], v_cache["q"], v_cache["sT"],
        bias, li, kv_heads=Hkv, scale=scale,
        key_block=getattr(config, "blocked_key_rows", 1024),
        interpret=should_interpret())
    m, den = m[:, :, 0], den[:, :, 0]

    k_row = k_cur[:, :, 0, :].reshape(B, Dkv)
    v_row = v_cur[:, :, 0, :].reshape(B, Dkv)

    def roundtrip(x):
        r = x.reshape(B, Hkv, hd).astype(jnp.float32)
        amax = jnp.max(jnp.abs(r), axis=-1)
        sc = jnp.maximum(amax / 127.0, 1e-8)                  # (B, Hkv)
        qv = jnp.clip(jnp.round(r / sc[..., None]), -127, 127)
        return qv, sc

    kq_c, ks_c = roundtrip(k_row)
    vq_c, vs_c = roundtrip(v_row)
    s_cur = jnp.einsum('bd,bhd->bh', kq_c.reshape(B, Dkv).astype(cdt),
                       q_tilde, preferred_element_type=jnp.float32)
    s_cur = s_cur * jnp.repeat(ks_c, g, axis=1) * scale       # (B, H)
    s_cur = s_cur + mask_cur[:, 0, 0, :]
    m_f = jnp.maximum(m, s_cur)
    r2 = jnp.exp(m - m_f)
    pc = jnp.exp(s_cur - m_f)
    den_f = den * r2 + pc
    v_deq = (vq_c * vs_c[..., None]).reshape(B, Dkv)          # fp32
    out_hd = (acc * r2[..., None]
              + v_deq[:, None, :] * pc[..., None]) / den_f[..., None]
    od = out_hd.reshape(B, Hkv, g, Hkv, hd)
    diag = jnp.einsum('bijkd,ik->bijd', od, jnp.eye(Hkv, dtype=out_hd.dtype))
    return diag.reshape(B, H * hd).astype(cdt), k_row, v_row


def _gqa_attend_merged(q, k, v, k_cur, v_cur, mask_cache, mask_cur, scale):
    """Grouped-query attention over [cache | current] column groups.

    Decode fast path (profiled, BENCH_DETAILS.md): writing each layer's
    current k/v into the stacked cache INSIDE the layer scan and reading the
    slab back costs ~27 us per dynamic-update-slice in the decode loop
    (44/step at tinyllama scale = 1.2 ms of a 3.5 ms b32 step — the ops are
    in-place but the write-then-read forces a serialization XLA otherwise
    pipelines away). Here the cache is READ-ONLY: the current tokens join
    the softmax as S extra merged columns (exactly the fused decode kernel's
    trick, ops/fused_decode.py) and the caller batches ALL layers' cache
    writes into two post-scan dynamic-update-slices.

    q: (B, H, S, hd); k, v: (B, Hkv, T, hd) cache slabs (positions >=
    cache_len are stale buffer junk — mask_cache must exclude them);
    k_cur/v_cur: (B, Hkv, S, hd); mask_cache: broadcastable (B, 1, S, T)
    fp32 additive (strict col < cache_len causality + padding + window);
    mask_cur: broadcastable (B, 1, S, S) additive ((S, S) causal + window +
    current-column padding). Masked scores clamp to -1e30 -> exp underflows
    to exactly 0, so the merged softmax matches the single-buffer one up to
    fp32 summation order."""
    B, H, S, hd = q.shape
    Hkv, T = k.shape[1], k.shape[2]
    g = H // Hkv
    qg = q.reshape(B, Hkv, g * S, hd)
    s1 = jnp.matmul(qg, k.swapaxes(-1, -2)).reshape(B, H, S, T)
    s1 = s1.astype(jnp.float32) * scale + mask_cache
    s2 = jnp.matmul(qg, k_cur.swapaxes(-1, -2)).reshape(B, H, S, S)
    s2 = s2.astype(jnp.float32) * scale + mask_cur
    m = jnp.maximum(jnp.max(s1, axis=-1, keepdims=True),
                    jnp.max(s2, axis=-1, keepdims=True))
    p1 = jnp.exp(s1 - m)
    p2 = jnp.exp(s2 - m)
    den = (jnp.sum(p1, axis=-1, keepdims=True)
           + jnp.sum(p2, axis=-1, keepdims=True))
    w1 = (p1 / den).reshape(B, Hkv, g * S, T).astype(v.dtype)
    w2 = (p2 / den).reshape(B, Hkv, g * S, S).astype(v.dtype)
    out = jnp.matmul(w1, v) + jnp.matmul(w2, v_cur)
    return out.reshape(B, H, S, hd)


def _gqa_attend(q, k, v, additive_mask, scale, k_scale=None, v_scale=None):
    """Grouped-query attention without materializing repeated K/V heads.

    q: (B, H, S, hd); k, v: (B, Hkv, T, hd); additive_mask broadcastable to
    (B, 1, S, T) fp32 (causal+padding already folded in).
    """
    B, H, S, hd = q.shape
    Hkv, T = k.shape[1], k.shape[2]
    g = H // Hkv
    qg = q.reshape(B, Hkv, g * S, hd)
    if k_scale is not None:
        scores = jnp.matmul(qg, k.astype(q.dtype).swapaxes(-1, -2))
        scores = scores * k_scale[:, :, None, :].astype(scores.dtype)
    else:
        scores = jnp.matmul(qg, k.swapaxes(-1, -2))          # (B,Hkv,g*S,T)
    scores = scores.reshape(B, H, S, T).astype(jnp.float32) * scale
    scores = scores + additive_mask
    weights = jax.nn.softmax(scores, axis=-1)
    wg = weights.reshape(B, Hkv, g * S, T)
    if v_scale is not None:
        # int8 values: fold the per-token dequant scales onto the weights,
        # then cast BOTH operands to the compute dtype — an fp32-operand AV
        # dot runs the MXU 4-8x slower (CLAUDE.md pallas lesson 1)
        wg = (wg * v_scale[:, :, None, :]).astype(q.dtype)
        out = jnp.matmul(wg, v.astype(q.dtype))
    else:
        out = jnp.matmul(wg.astype(v.dtype), v)              # (B,Hkv,g*S,hd)
    return out.reshape(B, H, S, hd)


def _hm_write(kv_cache, li, x_hm, offset):
    """Write S head-major rows (B, S, Dkv) into the (L, B, T, Dkv) cache for
    layer ``li`` at a scalar or (B,) ragged offset — no head transposes."""
    if jnp.ndim(offset) == 0:
        return jax.lax.dynamic_update_slice(
            kv_cache, x_hm[None].astype(kv_cache.dtype), (li, 0, offset, 0))
    B, S, _ = x_hm.shape
    pos = offset[:, None] + jnp.arange(S, dtype=jnp.int32)[None]
    rows = jnp.arange(B)[:, None]
    return kv_cache.at[li, rows, pos].set(x_hm.astype(kv_cache.dtype))


def _llama_attention(attn_params, h, cos, sin, additive_mask, layer_kv,
                     cache_len, config, segments=None):
    B, S, D = h.shape
    H, Hkv, hd = (config.num_attention_heads, config.num_key_value_heads,
                  config.head_dim)
    p = attn_params
    q = linear(h, p["q_proj"]["w"], p["q_proj"].get("b"))
    k = linear(h, p["k_proj"]["w"], p["k_proj"].get("b"))
    v = linear(h, p["v_proj"]["w"], p["v_proj"].get("b"))

    # multi-token flash fast path on the HEAD-MAJOR layout: the projection
    # outputs are already (B, S, heads*hd) — exactly flash_attention_bsd's
    # layout, whose 128-lane head-group blocks run hd=64 heads at FULL lane
    # utilization (the 4D kernel measured ~37 TF/s on a tinyllama ctx4k
    # prefill vs ~2x through bsd; GPT/Bloom took this path in round 2,
    # models/gpt.py:396-416). RoPE applies head-major (apply_rope_headmajor)
    # so no (B, H, S, hd) relayout copies exist anywhere on the path. GQA
    # K/V still expand over the group axis (kernel wants matching lanes);
    # the sliding-window kernel (Mistral) stays on the 4D path (bsd carries
    # no window), as do int8 caches (flash wants float k/v).
    int8_cache = (layer_kv is not None and not isinstance(layer_kv, str)
                  and isinstance(layer_kv[0], dict))
    int8_hm_kv = int8_cache and layer_kv[0]["q"].ndim == 4
    use_bsd = (getattr(config, "use_flash_attention", False) and S > 1
               and getattr(config, "sliding_window", None) is None
               and 128 % hd == 0 and (not int8_cache or int8_hm_kv)
               and not isinstance(additive_mask, tuple))
    if use_bsd:
        from cleantransformer_tpu.ops.pallas_kernels import (
            bsd_gqa_supported, flash_attention_bsd, should_interpret)
        g = H // Hkv
        q_hm = apply_rope_headmajor(q, cos, sin, H)
        k_hm = apply_rope_headmajor(k, cos, sin, Hkv)
        collect = isinstance(layer_kv, str)
        if layer_kv is None or collect:
            # cache-less (training / ring prefill): attend the chunk itself
            kv_ret = ((k_hm.reshape(B, S, Hkv, hd).transpose(0, 2, 1, 3),
                       v.reshape(B, S, Hkv, hd).transpose(0, 2, 1, 3))
                      if collect else (None, None))
            k_slab, v_slab = k_hm, v
            Tk = S
        else:
            k_cache, v_cache, li = layer_kv
            if int8_hm_kv:
                # int8 head-major slab: write the chunk quantized (the
                # generic dict-4D cache_write), then DEQUANTIZE the slab to
                # the compute dtype for the flash kernel (flash wants float
                # k/v) — this replaces the old dense O(S*T) fp32-score
                # fallback int8 prefill paid at long contexts
                from cleantransformer_tpu.models.gpt import cache_write
                k4 = k_hm.reshape(B, S, Hkv, hd).transpose(0, 2, 1, 3)
                v4 = v.reshape(B, S, Hkv, hd).transpose(0, 2, 1, 3)
                new_k = cache_write(k_cache, li, k4, cache_len)
                new_v = cache_write(v_cache, li, v4, cache_len)
                Tk = k_cache["q"].shape[2]
                cdt = q_hm.dtype

                def deq(buf):
                    qv = jax.lax.dynamic_slice_in_dim(buf["q"], li, 1, 0)[0]
                    sc = jax.lax.dynamic_slice_in_dim(buf["sT"], li, 1, 0)[0]
                    sc = jnp.transpose(sc, (0, 2, 1))        # -> (B, T, Hkv)
                    return qv.astype(cdt) * jnp.repeat(
                        sc, hd, axis=-1).astype(cdt)
                k_slab = deq(new_k)
                v_slab = deq(new_v)
            elif k_cache.ndim == 4:      # head-major buffer: direct writes
                new_k = _hm_write(k_cache, li, k_hm, cache_len)
                new_v = _hm_write(v_cache, li, v, cache_len)
                Tk = k_cache.shape[2]
                k_slab = jax.lax.dynamic_slice_in_dim(new_k, li, 1, 0)[0]
                v_slab = jax.lax.dynamic_slice_in_dim(new_v, li, 1, 0)[0]
            else:
                from cleantransformer_tpu.models.gpt import (cache_write,
                                                             cache_layer_kv)
                k4 = k_hm.reshape(B, S, Hkv, hd).transpose(0, 2, 1, 3)
                v4 = v.reshape(B, S, Hkv, hd).transpose(0, 2, 1, 3)
                new_k = cache_write(k_cache, li, k4, cache_len)
                new_v = cache_write(v_cache, li, v4, cache_len)
                Tk = k_cache.shape[3]
                ks, _ = cache_layer_kv(new_k, li, B, Hkv, Tk, hd)
                vs, _ = cache_layer_kv(new_v, li, B, Hkv, Tk, hd)
                k_slab = ks.transpose(0, 2, 1, 3).reshape(B, Tk, Hkv * hd)
                v_slab = vs.transpose(0, 2, 1, 3).reshape(B, Tk, Hkv * hd)
            kv_ret = (new_k, new_v)
        k_slab = k_slab.astype(q_hm.dtype)
        v_slab = v_slab.astype(q_hm.dtype)
        bias = (additive_mask[:, :, 0, :] if additive_mask is not None
                else jnp.zeros((B, 1, Tk), jnp.float32))
        off = (jnp.zeros((), jnp.int32) if (layer_kv is None or collect)
               else cache_len)
        cached = layer_kv is not None and not collect
        if cached and g > 1 and bsd_gqa_supported(H, Hkv, hd):
            # inference prefill: GQA-native kv blocks — the group-repeated
            # K/V never materialize and the kv stream shrinks g-fold
            from cleantransformer_tpu.ops.pallas_kernels import (
                flash_attention_bsd_gqa)
            out = flash_attention_bsd_gqa(
                q_hm, k_slab, v_slab, bias, off, n_head=H, kv_heads=Hkv,
                scale=1.0 / math.sqrt(hd), causal=True,
                interpret=should_interpret())
        else:
            if g > 1:
                k_slab = jnp.repeat(k_slab.reshape(B, Tk, Hkv, hd), g,
                                    axis=2).reshape(B, Tk, H * hd)
                v_slab = jnp.repeat(v_slab.reshape(B, Tk, Hkv, hd), g,
                                    axis=2).reshape(B, Tk, H * hd)
            out = flash_attention_bsd(
                q_hm, k_slab, v_slab, bias, off,
                q_segments=segments, k_segments=segments, n_head=H,
                scale=1.0 / math.sqrt(hd), causal=True,
                interpret=should_interpret())
        out = linear(out, p["o_proj"]["w"], p["o_proj"].get("b"))
        return out, kv_ret

    q = q.reshape(B, S, H, hd).transpose(0, 2, 1, 3)
    k = k.reshape(B, S, Hkv, hd).transpose(0, 2, 1, 3)
    v = v.reshape(B, S, Hkv, hd).transpose(0, 2, 1, 3)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)
    k = shard_hint(k, ("data", "model", None, None))

    k_scale = v_scale = None
    defer = isinstance(additive_mask, tuple)
    if layer_kv is None or (isinstance(layer_kv, str)
                            and layer_kv == "collect"):
        # "collect": cache-less attention over the chunk's own k/v, but the
        # rotated (k, v) return as scan outputs — the ring-cache prefill
        # (llama_forward swa_ring_cache) writes them to ring slots post-scan
        collect = layer_kv is not None
        new_k = k if collect else None
        new_v = v if collect else None
        layer_kv = None
    elif defer:
        # merged-column decode: the cache is read-only here; the caller
        # batches every layer's (k, v) rows into two post-scan writes
        # (_gqa_attend_merged docstring has the profile numbers)
        k_cache, v_cache, li = layer_kv
        mask_cache, mask_cur = additive_mask
        if isinstance(k_cache, dict):
            # int8 head-major slab: blocked pallas partials + XLA epilogue
            # (ops/gqa_decode.py); S==1 only (llama_forward gates defer)
            out, k_row, v_row = _gqa_blocked_attend(
                q, k, v, k_cache, v_cache, li, mask_cache, mask_cur,
                1.0 / math.sqrt(hd), config)
            out = linear(out[:, None, :], p["o_proj"]["w"],
                         p["o_proj"].get("b"))
            return out, (k_row, v_row)
        if k_cache.ndim == 4:
            # head-major slab: S==1 only (llama_forward gates defer on it)
            kc = jax.lax.dynamic_slice_in_dim(k_cache, li, 1, 0)[0]
            vc = jax.lax.dynamic_slice_in_dim(v_cache, li, 1, 0)[0]
            k_row = k[:, :, 0, :].reshape(B, Hkv * hd)
            v_row = v[:, :, 0, :].reshape(B, Hkv * hd)
            out = _gqa_attend_headmajor(
                q, kc, vc, k_row, v_row, mask_cache[:, 0, 0, :, None],
                mask_cur[:, 0, :, 0], 1.0 / math.sqrt(hd))
            out = linear(out[:, None, :], p["o_proj"]["w"],
                         p["o_proj"].get("b"))
            return out, (k_row, v_row)
        from cleantransformer_tpu.models.gpt import cache_layer_kv
        T = k_cache.shape[3]
        kc, _ = cache_layer_kv(k_cache, li, B, Hkv, T, hd)
        vc, _ = cache_layer_kv(v_cache, li, B, Hkv, T, hd)
        out = _gqa_attend_merged(q, kc, vc, k, v, mask_cache, mask_cur,
                                 1.0 / math.sqrt(hd))
        out = out.transpose(0, 2, 1, 3).reshape(B, S, H * hd)
        out = linear(out, p["o_proj"]["w"], p["o_proj"].get("b"))
        return out, (k, v)
    else:
        from cleantransformer_tpu.models.gpt import cache_write, cache_layer_kv
        k_cache, v_cache, li = layer_kv
        new_k = cache_write(k_cache, li, k, cache_len)
        new_v = cache_write(v_cache, li, v, cache_len)
        _cb = k_cache["q"] if isinstance(k_cache, dict) else k_cache
        # head-major layouts (dense 4D and int8 dict-4D) keep T at axis 2
        T = _cb.shape[2] if _cb.ndim == 4 else _cb.shape[3]
        k, k_scale = cache_layer_kv(new_k, li, B, Hkv, T, hd)
        v, v_scale = cache_layer_kv(new_v, li, B, Hkv, T, hd)

    scale = 1.0 / math.sqrt(hd)
    # sliding-window attention (Mistral) is a static ``window`` on the flash
    # kernel's causal iota — the key-block loop skips out-of-window blocks,
    # so long-context SWA never materializes an O(S*T) mask
    window = getattr(config, "sliding_window", None)
    use_flash = (getattr(config, "use_flash_attention", False) and S > 1
                 and k_scale is None)
    if use_flash:
        from cleantransformer_tpu.ops.pallas_kernels import (
            flash_attention, should_interpret)
        # the kernel wants matching head counts: expand K/V over the group
        # axis (multi-token forwards are FLOP-bound, the expansion streams
        # once; decode stays on the grouped dense path below)
        g = H // Hkv
        if g > 1:
            k_f = jnp.repeat(k, g, axis=1)
            v_f = jnp.repeat(v, g, axis=1)
        else:
            k_f, v_f = k, v
        # per-key padding bias: additive_mask is (B,1,S,T) or (B,1,1,T);
        # the causal part is handled by the kernel's q_offset iota (packed
        # rows instead pass segment ids — block-diagonal in-kernel)
        bias = additive_mask[:, :, 0, :] if additive_mask is not None else \
            jnp.zeros((B, 1, k_f.shape[2]), jnp.float32)
        out = flash_attention(q, k_f, v_f, bias, cache_len,
                              q_segments=segments, k_segments=segments,
                              scale=scale, causal=True,
                              interpret=should_interpret(), window=window)
    else:
        out = _gqa_attend(q, k, v, additive_mask, scale,
                          k_scale=k_scale, v_scale=v_scale)
    out = out.transpose(0, 2, 1, 3).reshape(B, S, H * hd)
    out = linear(out, p["o_proj"]["w"], p["o_proj"].get("b"))
    return out, (new_k, new_v)


def _llama_mlp(mlp_params, h, act):
    gate = act(linear(h, mlp_params["gate_proj"]["w"],
                      mlp_params["gate_proj"].get("b")))
    up = linear(h, mlp_params["up_proj"]["w"], mlp_params["up_proj"].get("b"))
    x = shard_hint(gate * up, ("data", None, "model"))
    return linear(x, mlp_params["down_proj"]["w"],
                  mlp_params["down_proj"].get("b"))


def _llama_block(block_params, layer_kv, h, cos, sin, additive_mask,
                 cache_len, config, act, segments=None):
    """Returns (h, kv, router_stats) — router_stats is None for dense MLPs,
    else the (probs, top_i) pair from the MoE router (aux loss input)."""
    eps = config.rms_norm_eps
    attn_out, kv = _llama_attention(
        block_params["self_attn"],
        rms_norm(h, block_params["input_layernorm"]["w"], eps),
        cos, sin, additive_mask, layer_kv, cache_len, config,
        segments=segments)
    h = h + attn_out
    mlp_in = rms_norm(h, block_params["post_attention_layernorm"]["w"], eps)
    router_stats = None
    if "block_sparse_moe" in block_params:
        from cleantransformer_tpu.ops.moe import (
            moe_mlp_dense, moe_mlp_capacity, moe_mlp_ragged, moe_mlp_ragged_ep)
        impl = getattr(config, "moe_impl", None)
        cf = getattr(config, "moe_capacity_factor", None)
        if impl is None:
            impl = "dense" if cf is None else "capacity"
        if impl == "ragged":
            from cleantransformer_tpu.parallel.mesh import active_mesh
            mesh = active_mesh()
            if mesh is not None and mesh.shape.get("expert", 1) > 1:
                # expert-parallel mesh: the grouped matmuls run inside a
                # shard_map (global ragged offsets defeat GSPMD's derived
                # all-to-all) — same exact semantics, local groups only
                mlp_out, router_stats = moe_mlp_ragged_ep(
                    block_params["block_sparse_moe"], mlp_in,
                    config.num_experts_per_tok, act, mesh)
            else:
                mlp_out, router_stats = moe_mlp_ragged(
                    block_params["block_sparse_moe"], mlp_in,
                    config.num_experts_per_tok, act)
        elif impl == "capacity":
            mlp_out, router_stats = moe_mlp_capacity(
                block_params["block_sparse_moe"], mlp_in,
                config.num_experts_per_tok, act,
                capacity_factor=cf if cf is not None else 1.25)
        elif impl == "dense":
            mlp_out, router_stats = moe_mlp_dense(
                block_params["block_sparse_moe"], mlp_in,
                config.num_experts_per_tok, act)
        else:
            raise ValueError(
                f"unknown moe_impl {impl!r} (dense | capacity | ragged)")
    else:
        mlp_out = _llama_mlp(block_params["mlp"], mlp_in, act)
    h = h + mlp_out
    return h, kv, router_stats


def llama_forward(params, config, input_ids, attention_mask=None,
                  position_ids=None, segment_ids=None, cache=None,
                  remat=False, embed_noise=None, return_aux=False):
    """Returns (hidden, new_cache). Model protocol of models/gpt.py:
    cache-less masks cover the inputs; cached masks cover the full buffer.
    position_ids default to the GPT/HF convention cumsum(mask)-1 with pad
    positions forced to 1 (modeling_gpt.py:171-174 — HF llama's
    prepare_inputs_for_generation builds the same).

    ``segment_ids`` (B, S) int, 0 = pad: PACKED-SEQUENCE training — several
    examples share one row, attention is block-diagonal-causal (no token
    sees another segment), RoPE positions restart per segment. Training
    path only (no cache); see trainer/data.packed_collate."""
    B, S = input_ids.shape
    compute_dtype = config.compute_dtype
    cache_len = cache["length"] if cache is not None else jnp.zeros((), jnp.int32)

    packed = segment_ids is not None
    if packed:
        if cache is not None:
            raise ValueError("segment_ids (packed sequences) are a "
                             "cache-less training feature")
        seg = segment_ids.astype(jnp.int32)
        if position_ids is None:
            # within-segment positions: idx - index of the segment's start
            # (segments are contiguous runs in a packed row)
            idx = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None],
                                   (B, S))
            new_seg = jnp.concatenate(
                [jnp.ones((B, 1), bool), seg[:, 1:] != seg[:, :-1]], axis=1)
            seg_start = jax.lax.cummax(jnp.where(new_seg, idx, 0), axis=1)
            position_ids = idx - seg_start

    if position_ids is None:
        if jnp.ndim(cache_len) == 1 and cache is not None:
            raise ValueError("per-row cache offsets (serving) require "
                             "explicit position_ids")
        if attention_mask is not None:
            am = attention_mask.astype(jnp.int32)
            pos_full = jnp.cumsum(am, axis=-1) - 1
            pos_full = jnp.where(am == 0, 1, pos_full)
            if cache is None:
                position_ids = pos_full[:, -S:]
            else:
                position_ids = jax.lax.dynamic_slice(
                    pos_full, (0, cache_len), (B, S))
        else:
            position_ids = jnp.broadcast_to(
                jnp.arange(S, dtype=jnp.int32)[None], (B, S))
            if cache is not None and jnp.ndim(cache_len) == 0:
                position_ids = position_ids + cache_len

    cos, sin = rope_cos_sin(position_ids, config)

    # additive padding mask over the key axis (fp32; scores are upcast)
    additive_mask = None
    packed_flash = (packed and S > 1
                    and getattr(config, "use_flash_attention", False))
    if packed_flash:
        # flash kernel takes the segment ids directly (in-kernel block-
        # diagonal masking); the additive bias only needs the key pads
        additive_mask = (1.0 - (seg != 0)[:, None, None, :].astype(
            jnp.float32)) * CAUSAL_NEG
    elif packed:
        # dense path: full (B,1,S,S) block-diagonal — same nonzero segment
        # only (subsumes padding: segment-0 keys are masked for every query)
        keep = (seg[:, :, None] == seg[:, None, :]) & (seg[:, None, :] != 0)
        additive_mask = jnp.where(keep, 0.0, CAUSAL_NEG)[:, None]  # (B,1,S,S)
    elif attention_mask is not None:
        additive_mask = (1.0 - attention_mask[:, None, None, :].astype(
            jnp.float32)) * CAUSAL_NEG

    h = embed_lookup(params["embed_tokens"], input_ids)
    if embed_noise is not None:
        h = h + embed_noise.astype(h.dtype)
    h = h.astype(compute_dtype)
    h = shard_hint(h, ("data", None, None))
    act = ACT2FN[config.hidden_act]

    window = getattr(config, "sliding_window", None)
    flash_cfg = getattr(config, "use_flash_attention", False)

    if cache is None:
        # cache-less multi-token: fold causal (+ sliding window, Mistral)
        # into the additive mask unless flash handles it (the kernel's
        # causal iota carries the window too)
        if not flash_cfg or S <= 1:
            row = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
            col = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
            keep = col <= row
            if window is not None:
                keep = keep & (row - col < window)
            causal_add = jnp.where(keep, 0.0, CAUSAL_NEG)[None, None]
            additive_mask = (causal_add if additive_mask is None
                             else additive_mask + causal_add)

        moe = getattr(config, "num_local_experts", 0) > 0
        k_tok = getattr(config, "num_experts_per_tok", 2)
        E = getattr(config, "num_local_experts", 0)

        def run_block(h_in, block_params):
            out, _, stats = _llama_block(block_params, None, h_in, cos, sin,
                                         additive_mask, cache_len, config,
                                         act,
                                         segments=seg if packed_flash
                                         else None)
            if not (moe and return_aux):
                return out
            # per-layer load-balancing sums (ops/moe.py): normalized across
            # layers AFTER the scan, matching HF's concatenated formulation
            # incl. its padding exclusion
            from cleantransformer_tpu.ops.moe import load_balancing_aux
            probs, top_i = stats
            tok_mask = (attention_mask.reshape(-1)
                        if attention_mask is not None else None)
            t_e, p_e, cnt = load_balancing_aux(
                probs.reshape(-1, E), top_i.reshape(-1, k_tok), E, k_tok,
                mask=tok_mask)
            return out, t_e, p_e, cnt
        if remat:
            if remat == "dots":
                policy = jax.checkpoint_policies.dots_with_no_batch_dims_saveable
            elif remat == "attn":
                policy = jax.checkpoint_policies.save_only_these_names(
                    "flash_out", "flash_lse")
            elif remat == "dots_attn":
                policy = jax.checkpoint_policies.save_from_both_policies(
                    jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
                    jax.checkpoint_policies.save_only_these_names(
                        "flash_out", "flash_lse"))
            else:
                policy = None
            run_block = jax.checkpoint(run_block, policy=policy)

        aux = None
        if moe and return_aux:
            def body(carry, xs):
                h_in, t_acc, p_acc, c_acc = carry
                out, t_e, p_e, cnt = run_block(h_in, xs)
                return (out, t_acc + t_e, p_acc + p_e, c_acc + cnt), None
            (h, t_sum, p_sum, c_sum), _ = jax.lax.scan(
                body, (h, jnp.zeros((k_tok, E), jnp.float32),
                       jnp.zeros((E,), jnp.float32),
                       jnp.zeros((), jnp.float32)), params["blocks"])
            # HF load_balancing_loss_func over layer-concatenated stats with
            # padding excluded: masked sums / total masked count (= L * per-
            # layer count, the mask repeats per layer); loss = E * sum(t * p)
            denom = jnp.maximum(c_sum, 1.0)
            aux = E * jnp.sum((t_sum / denom) * (p_sum / denom)[None, :])
        else:
            def body(carry, xs):
                return run_block(carry, xs), None
            h, _ = jax.lax.scan(body, h, params["blocks"])
        new_cache = None
    elif (window is not None and getattr(config, "swa_ring_cache", False)):
        # ----- sliding-window RING cache (Mistral long-context decode) -----
        # The buffer holds only the last R ≈ window rows, written at
        # position % R; masks map each ring slot back to its absolute
        # position. Supported flows: prefill FROM AN EMPTY cache (generate /
        # beam admit whole prompts) and S==1 decode with a scalar offset.
        # Speculative verify windows and the serving engine's chunked
        # re-prefill assume slot == position and must not use ring caches
        # (guarded at their entry points).
        kbuf = cache["k"]
        if isinstance(kbuf, dict):
            raise ValueError("swa_ring_cache does not compose with "
                             "kv_cache_int8")
        if jnp.ndim(cache_len) == 1:
            raise ValueError("swa_ring_cache does not support ragged "
                             "per-row offsets (serving)")
        head_major = kbuf.ndim == 4
        R = kbuf.shape[2] if head_major else kbuf.shape[3]
        Hkv, hd = config.num_key_value_heads, config.head_dim
        aux = None
        if S > 1:
            # prefill from empty: attention is over the chunk's own k/v
            # (cache-less semantics), the rotated rows land in ring slots
            pad_chunk = None
            if attention_mask is not None:
                pad_chunk = jax.lax.dynamic_slice(
                    attention_mask.astype(jnp.float32), (0, cache_len),
                    (B, S))
            if flash_cfg:
                # causal + window ride the flash kernel's iota; bias = pads
                am = (jnp.zeros((B, 1, 1, S), jnp.float32)
                      if pad_chunk is None
                      else ((1.0 - pad_chunk) * CAUSAL_NEG)[:, None, None, :])
            else:
                row = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
                col = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
                keep = (col <= row) & (row - col < window)
                am = jnp.where(keep, 0.0, CAUSAL_NEG)[None, None]
                if pad_chunk is not None:
                    am = am + ((1.0 - pad_chunk)
                               * CAUSAL_NEG)[:, None, None, :]

            def body(carry, block_params):
                out, (nk, nv), _ = _llama_block(
                    block_params, "collect", carry, cos, sin, am,
                    jnp.zeros((), jnp.int32), config, act)
                return out, (nk, nv)
            h, (nks, nvs) = jax.lax.scan(body, h, params["blocks"])
            # write the last min(S, R) rows at their ring slots
            if S >= R:
                slots = (cache_len + S - R + jnp.arange(R)) % R
                nks, nvs = nks[:, :, :, S - R:], nvs[:, :, :, S - R:]
            else:
                slots = (cache_len + jnp.arange(S)) % R
            if head_major:
                Sw = nks.shape[3]
                rk = nks.transpose(0, 1, 3, 2, 4).reshape(
                    nks.shape[0], B, Sw, Hkv * hd)
                rv = nvs.transpose(0, 1, 3, 2, 4).reshape(
                    nvs.shape[0], B, Sw, Hkv * hd)
                new_k = cache["k"].at[:, :, slots, :].set(
                    rk.astype(cache["k"].dtype))
                new_v = cache["v"].at[:, :, slots, :].set(
                    rv.astype(cache["v"].dtype))
            else:
                new_k = cache["k"].at[:, :, :, slots, :].set(
                    nks.astype(cache["k"].dtype))
                new_v = cache["v"].at[:, :, :, slots, :].set(
                    nvs.astype(cache["v"].dtype))
        else:
            # S == 1 decode: defer-style read-only pass over the ring slab.
            # Slot c holds absolute position p = q-1-((q-1-c) mod R) (the
            # most recent write ≤ q-1 landing on c; negative = never
            # written); keep it iff written and inside the window. The
            # current token rides the merged extra column (mask_cur).
            q_idx = cache_len
            c = jnp.arange(R, dtype=jnp.int32)
            p = q_idx - 1 - jnp.mod(q_idx - 1 - c, R)
            keep = (p >= 0) & (p > q_idx - window)
            mask_cache = jnp.where(keep, 0.0, CAUSAL_NEG)[None, None, None, :]
            if attention_mask is not None:
                amf = attention_mask.astype(jnp.float32)
                idx = jnp.broadcast_to(
                    jnp.clip(p, 0, amf.shape[1] - 1)[None, :], (B, R))
                pad = jnp.take_along_axis(amf, idx, axis=1)     # (B, R)
                mask_cache = mask_cache + ((1.0 - pad)
                                           * CAUSAL_NEG)[:, None, None, :]
                pad_cur = jax.lax.dynamic_slice(amf, (0, cache_len), (B, 1))
                mask_cur = ((1.0 - pad_cur) * CAUSAL_NEG)[:, None, None, :]
            else:
                mask_cur = jnp.zeros((1, 1, 1, 1), jnp.float32)
            ring_mask = (mask_cache, mask_cur)

            def body(carry, block_params):
                h_in, li = carry
                out, (nk, nv), _ = _llama_block(
                    block_params, (cache["k"], cache["v"], li), h_in, cos,
                    sin, ring_mask, cache_len, config, act)
                return (out, li + 1), (nk, nv)
            (h, _), (nks, nvs) = jax.lax.scan(
                body, (h, jnp.zeros((), jnp.int32)), params["blocks"],
                unroll=getattr(config, "decode_unroll", 1))
            slot = jnp.mod(cache_len, R)
            if head_major:
                new_k = jax.lax.dynamic_update_slice(
                    cache["k"], nks[:, :, None, :].astype(cache["k"].dtype),
                    (0, 0, slot, 0))
                new_v = jax.lax.dynamic_update_slice(
                    cache["v"], nvs[:, :, None, :].astype(cache["v"].dtype),
                    (0, 0, slot, 0))
            else:
                new_k = jax.lax.dynamic_update_slice(
                    cache["k"], nks.astype(cache["k"].dtype),
                    (0, 0, 0, slot, 0))
                new_v = jax.lax.dynamic_update_slice(
                    cache["v"], nvs.astype(cache["v"].dtype),
                    (0, 0, 0, slot, 0))
        new_cache = {"k": new_k, "v": new_v, "length": cache_len + S}
    else:
        kbuf = cache["k"]
        _tb = kbuf["q"] if isinstance(kbuf, dict) else kbuf
        head_major = not isinstance(kbuf, dict) and kbuf.ndim == 4
        int8_hm = isinstance(kbuf, dict) and kbuf["q"].ndim == 4
        T = _tb.shape[2] if (head_major or int8_hm) else _tb.shape[3]
        if additive_mask is not None and additive_mask.shape[-1] < T:
            # int8-hm capacity is tile-padded past the engine's mask
            # buffers; padded key slots carry bias 0 — the causal term
            # (col bounded by cache_len) already excludes them everywhere
            additive_mask = jnp.pad(
                additive_mask, ((0, 0), (0, 0), (0, 0),
                                (0, T - additive_mask.shape[-1])))
        # fold causal (+ sliding window + padding) into ONE fp32 additive
        # bias shared by all layers (see models/gpt.py decode fast path);
        # for S>1 windows the flash kernel's q_offset iota covers causal
        use_flash_window = (flash_cfg and S > 1
                            and (not isinstance(kbuf, dict) or int8_hm))
        # merged-column decode (scalar offsets, dense cache, dense attention):
        # blocks read the cache and emit their (k, v) rows as scan outputs;
        # TWO batched dynamic-update-slices then write all layers at once
        # (the per-layer write-then-read costs ~27 us per slice in the decode
        # loop — 1.2 ms of a 3.5 ms tinyllama b32 step, BENCH_DETAILS.md).
        # A head-major (L, B, T, Dkv) cache (config.decode_head_major) only
        # takes this path at S==1 (_gqa_attend_headmajor); its multi-token
        # prefill goes through the generic 4D cache_write/cache_layer_kv.
        # Per-row ragged offsets (the serving engine's continuous batching)
        # are supported head-major at S==1 — ragged rows are by definition
        # live generated tokens, never padding.
        ragged = jnp.ndim(cache_len) == 1
        # int8-hm S==1 decode also defers: blocks read the slab through the
        # blocked GQA kernel and return FLOAT k/v rows; the post-scan write
        # quantizes them once (same math as cache_write's dict-4D branch)
        defer = ((not isinstance(kbuf, dict) or int8_hm)
                 and not use_flash_window
                 and ((not head_major and not int8_hm) or S == 1)
                 and (not ragged or ((head_major or int8_hm) and S == 1)))
        if defer:
            row = jax.lax.broadcasted_iota(jnp.int32, (S, T), 0)
            col = jax.lax.broadcasted_iota(jnp.int32, (S, T), 1)
            if ragged:
                len_b = cache_len[:, None, None]                 # (B, 1, 1)
                keep = col[None] < len_b
                if window is not None:
                    keep = keep & ((len_b + row[None]) - col[None] < window)
                mask_cache = jnp.where(keep, 0.0, CAUSAL_NEG)[:, None]
            else:
                keep = col < cache_len  # strict: current rides mask_cur
                if window is not None:
                    keep = keep & ((cache_len + row) - col < window)
                mask_cache = jnp.where(keep, 0.0, CAUSAL_NEG)[None, None]
            if additive_mask is not None:
                mask_cache = mask_cache + additive_mask  # key padding (B,1,1,T)
            rs = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
            cs = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
            keep_cur = cs <= rs
            if window is not None:
                keep_cur = keep_cur & (rs - cs < window)
            mask_cur = jnp.where(keep_cur, 0.0, CAUSAL_NEG)[None, None]
            if attention_mask is not None and not ragged:
                pad_cur = jax.lax.dynamic_slice(
                    attention_mask.astype(jnp.float32), (0, cache_len),
                    (B, S))
                mask_cur = mask_cur + ((1.0 - pad_cur) * CAUSAL_NEG)[:, None,
                                                                     None, :]
            additive_mask = (mask_cache, mask_cur)
        elif not use_flash_window:
            row = jax.lax.broadcasted_iota(jnp.int32, (S, T), 0)
            col = jax.lax.broadcasted_iota(jnp.int32, (S, T), 1)
            if jnp.ndim(cache_len) == 1:
                qpos = cache_len[:, None, None] + row[None]  # (B, S, T)
                keep = col[None] <= qpos
                if window is not None:
                    keep = keep & (qpos - col[None] < window)
                causal_add = jnp.where(keep, 0.0, CAUSAL_NEG)[:, None]
            else:
                qpos = cache_len + row
                keep = col <= qpos
                if window is not None:
                    keep = keep & (qpos - col < window)
                causal_add = jnp.where(keep, 0.0, CAUSAL_NEG)[None, None]
            additive_mask = (causal_add if additive_mask is None
                             else additive_mask + causal_add)

        aux = None

        if defer:
            def body(carry, block_params):
                h_in, li = carry
                out, (nk, nv), _ = _llama_block(
                    block_params, (cache["k"], cache["v"], li), h_in, cos,
                    sin, additive_mask, cache_len, config, act)
                return (out, li + 1), (nk, nv)
            (h, _), (nks, nvs) = jax.lax.scan(
                body, (h, jnp.zeros((), jnp.int32)), params["blocks"],
                unroll=getattr(config, "decode_unroll", 1))
            if int8_hm:
                # quantize the float rows ONCE for all layers (cache_write's
                # dict-4D math — the in-scan epilogue roundtripped the
                # current column identically, so decode reads stay
                # bit-consistent) and write both planes in one update each
                Hkv, hd = config.num_key_value_heads, config.head_dim

                def quant_rows(rows_f):
                    r = rows_f.astype(jnp.float32).reshape(
                        rows_f.shape[0], B, Hkv, hd)
                    amax = jnp.max(jnp.abs(r), axis=-1)          # (L,B,Hkv)
                    sc = jnp.maximum(amax / 127.0, 1e-8)
                    qv = jnp.clip(jnp.round(r / sc[..., None]), -127,
                                  127).astype(jnp.int8)
                    return qv.reshape(rows_f.shape[0], B, Hkv * hd), sc

                kq_r, ks_r = quant_rows(nks)
                vq_r, vs_r = quant_rows(nvs)
                if jnp.ndim(cache_len) == 1:
                    rows = jnp.arange(B)
                    # sT ragged writes: (:, rows, :, cache_len) — separated
                    # advanced indices put (B,) first, so values arrive as
                    # (B, L, Hkv)
                    new_k = {"q": cache["k"]["q"].at[:, rows, cache_len].set(
                                 kq_r),
                             "sT": cache["k"]["sT"]
                                 .at[:, rows, :, cache_len].set(
                                     jnp.transpose(ks_r, (1, 0, 2)))}
                    new_v = {"q": cache["v"]["q"].at[:, rows, cache_len].set(
                                 vq_r),
                             "sT": cache["v"]["sT"]
                                 .at[:, rows, :, cache_len].set(
                                     jnp.transpose(vs_r, (1, 0, 2)))}
                else:
                    new_k = {"q": jax.lax.dynamic_update_slice(
                                 cache["k"]["q"], kq_r[:, :, None, :],
                                 (0, 0, cache_len, 0)),
                             "sT": jax.lax.dynamic_update_slice(
                                 cache["k"]["sT"], ks_r[:, :, :, None],
                                 (0, 0, 0, cache_len))}
                    new_v = {"q": jax.lax.dynamic_update_slice(
                                 cache["v"]["q"], vq_r[:, :, None, :],
                                 (0, 0, cache_len, 0)),
                             "sT": jax.lax.dynamic_update_slice(
                                 cache["v"]["sT"], vs_r[:, :, :, None],
                                 (0, 0, 0, cache_len))}
            elif head_major and jnp.ndim(cache_len) == 1:
                # ragged rows (serving): scatter each batch row at its own
                # offset — still one contiguous-lane run per (layer, batch)
                rows = jnp.arange(B)
                new_k = cache["k"].at[:, rows, cache_len].set(
                    nks.astype(cache["k"].dtype))
                new_v = cache["v"].at[:, rows, cache_len].set(
                    nvs.astype(cache["v"].dtype))
            elif head_major:
                # ys are (L, B, Dkv) rows -> ONE contiguous-lane write per
                # (layer, batch) pair
                new_k = jax.lax.dynamic_update_slice(
                    cache["k"], nks[:, :, None, :].astype(cache["k"].dtype),
                    (0, 0, cache_len, 0))
                new_v = jax.lax.dynamic_update_slice(
                    cache["v"], nvs[:, :, None, :].astype(cache["v"].dtype),
                    (0, 0, cache_len, 0))
            else:
                new_k = jax.lax.dynamic_update_slice(
                    cache["k"], nks.astype(cache["k"].dtype),
                    (0, 0, 0, cache_len, 0))
                new_v = jax.lax.dynamic_update_slice(
                    cache["v"], nvs.astype(cache["v"].dtype),
                    (0, 0, 0, cache_len, 0))
        else:
            def body(carry, block_params):
                h_in, k_cache, v_cache, li = carry
                out, (nk, nv), _ = _llama_block(
                    block_params, (k_cache, v_cache, li), h_in, cos, sin,
                    additive_mask, cache_len, config, act)
                return (out, nk, nv, li + 1), None
            (h, new_k, new_v, _), _ = jax.lax.scan(
                body, (h, cache["k"], cache["v"], jnp.zeros((), jnp.int32)),
                params["blocks"],
                unroll=getattr(config, "decode_unroll", 1))
        new_cache = {"k": new_k, "v": new_v, "length": cache_len + S}

    h = rms_norm(h, params["norm"]["w"], config.rms_norm_eps)
    if return_aux:
        return h, new_cache, aux
    return h, new_cache


def llama_lm_forward(params, config, input_ids, attention_mask=None,
                     position_ids=None, segment_ids=None, cache=None,
                     labels=None, loss_mask=None, last_only=False,
                     remat=False, embed_noise=None):
    """Returns ((logits, hidden), cache) or ((loss, logits, hidden), cache)
    with labels (shift-by-1 CE — the Bloom/HF causal-LM convention).
    With ``config.output_router_logits`` (MoE training, HF Mixtral
    convention) the labeled loss additionally includes
    ``router_aux_loss_coef *`` the load-balancing aux loss."""
    want_aux = (labels is not None
                and getattr(config, "num_local_experts", 0) > 0
                and getattr(config, "output_router_logits", False)
                and cache is None)
    if want_aux:
        h, new_cache, aux = llama_forward(
            params, config, input_ids, attention_mask, position_ids,
            segment_ids, cache, remat=remat, embed_noise=embed_noise,
            return_aux=True)
    else:
        h, new_cache = llama_forward(params, config, input_ids,
                                     attention_mask, position_ids,
                                     segment_ids, cache, remat=remat,
                                     embed_noise=embed_noise)
        aux = None
    lm_head = params.get("lm_head", params["embed_tokens"])
    if labels is not None and getattr(config, "fused_ce", False):
        from cleantransformer_tpu.ops.fused_ce import fused_shift_ce
        loss = fused_shift_ce(h, lm_head, labels, mask=loss_mask,
                              chunk_tokens=getattr(config, "fused_ce_chunk",
                                                   2048))
        if aux is not None:
            loss = loss + config.router_aux_loss_coef * aux
        return (loss, None, h), new_cache
    h_for_logits = h[:, -1:] if last_only else h
    logits = lm_head_matmul(h_for_logits, lm_head)
    if labels is not None:
        loss = shift_cross_entropy_loss(logits.astype(jnp.float32), labels,
                                        mask=loss_mask)
        if aux is not None:
            loss = loss + config.router_aux_loss_coef * aux
        return (loss, logits, h), new_cache
    return (logits, h), new_cache


# ---------------------------------------------------------------------------
# class wrappers (same duck-typed surface as GPTLMHeadModel/BloomForCausalLM)
# ---------------------------------------------------------------------------

class LlamaModel:
    def __init__(self, config, params=None, rng=None):
        self.config = config
        self.params = params if params is not None else init_llama_params(
            config, rng if rng is not None else jax.random.PRNGKey(0))

    def __call__(self, input_ids, attention_mask=None, position_ids=None,
                 k_v_pasts=None):
        return llama_forward(self.params, self.config, input_ids,
                             attention_mask, position_ids, cache=k_v_pasts)


class LlamaForCausalLM:
    def __init__(self, config, params=None, rng=None):
        self.config = config
        self.params = params if params is not None else init_llama_params(
            config, rng if rng is not None else jax.random.PRNGKey(0))
        self._forward = llama_lm_forward
        from cleantransformer_tpu.generation.engine import bind_generation
        bind_generation(self)

    cache_factory = staticmethod(init_llama_cache)  # see models/gpt.py
    cache_factory_dense = staticmethod(init_llama_cache_dense)

    def _tie_weight(self):
        self.params.pop("lm_head", None)

    @property
    def n_layer(self):
        return self.config.n_layer

    def init_cache(self, batch_size, max_len, dtype=None):
        return init_llama_cache(self.config, batch_size, max_len, dtype)

    def forward_fn(self):
        return self._forward

    def __call__(self, input_ids, attention_mask=None, position_ids=None,
                 k_v_pasts=None, labels=None, **kwargs):
        return llama_lm_forward(self.params, self.config, input_ids,
                                attention_mask, position_ids, cache=k_v_pasts,
                                labels=labels)


# Qwen2/Qwen2.5 is the llama architecture with qkv biases (config.Qwen2Config
# carries the bias/window field differences); the HF state-dict layout is
# identical, so the same loader and forward serve both families.
Qwen2ForCausalLM = LlamaForCausalLM
