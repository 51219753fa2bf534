"""GPT-1/2/3 as pure functions over pytree parameters.

Behavioral spec is the reference's modeling_gpt.py; the design is TPU-first:
 - layer parameters are *stacked* along a leading layer axis and the block
   loop is a single ``lax.scan`` (one compile of one block, not n_layer
   unrolled copies);
 - the KV-cache is a fixed-shape ring buffer updated with
   ``lax.dynamic_update_slice`` (replacing the reference's concat-grow cache,
   modeling_gpt.py:76-80), so the whole decode loop compiles once;
 - the causal mask is computed from iota comparisons, not an (n_ctx, n_ctx)
   materialized tril buffer (reference modeling_gpt.py:56).

Mask semantics match the reference exactly:
 - causal: ``w*b + -1e4*(1-b)`` == where(causal, w, -1e4) (modeling_gpt.py:87-89)
 - padding: additive ``(1-m)*finfo.min`` (modeling_gpt.py:176-179)
 - position_ids default: ``cumsum(mask)-1`` with pad positions forced to 1
   (modeling_gpt.py:171-174)

Parameter layout (all linear weights in (in, out) layout — HF GPT-2's own
Conv1D layout, see ops/layers.py):

  {'tokens_embed': (V, D), 'position_embed': (P, D),
   'blocks': {'ln_1': {'w': (L, D), 'b': (L, D)},
              'attn': {'c_attn': {'w': (L, D, 3D), 'b': (L, 3D)},
                       'c_proj': {'w': (L, D, D),  'b': (L, D)}},
              'ln_2': {'w': (L, D), 'b': (L, D)},
              'mlp':  {'c_fc':   {'w': (L, D, 4D), 'b': (L, 4D)},
                       'c_proj': {'w': (L, 4D, D), 'b': (L, D)}}},
   'ln_f': {'w': (D,), 'b': (D,)}}           # gpt2/gpt3 only

The LM head is weight-tied to ``tokens_embed`` (reference modeling_gpt.py:207-208).
"""

import math
from functools import partial

import jax
import jax.numpy as jnp

from cleantransformer_tpu.ops.activations import ACT2FN
from cleantransformer_tpu.ops.layers import layer_norm, linear
from cleantransformer_tpu.ops.quant import embed_lookup, lm_head_matmul
from cleantransformer_tpu.parallel.sharding import shard_hint

CAUSAL_NEG = -1e4  # the reference's causal fill value (modeling_gpt.py:89)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------

def init_gpt_params(config, rng, version="gpt"):
    D, V, P, L = config.n_embd, config.vocab_size, config.n_positions, config.n_layer
    keys = jax.random.split(rng, 8)
    std = 0.02
    dt = config.param_dtype

    def norm(k, *shape):
        return (jax.random.normal(k, shape) * std).astype(dt)

    params = {
        "tokens_embed": norm(keys[0], V, D),
        "position_embed": norm(keys[1], P, D),
        "blocks": {
            "ln_1": {"w": jnp.ones((L, D), dt), "b": jnp.zeros((L, D), dt)},
            "attn": {
                "c_attn": {"w": norm(keys[2], L, D, 3 * D), "b": jnp.zeros((L, 3 * D), dt)},
                "c_proj": {"w": norm(keys[3], L, D, D), "b": jnp.zeros((L, D), dt)},
            },
            "ln_2": {"w": jnp.ones((L, D), dt), "b": jnp.zeros((L, D), dt)},
            "mlp": {
                "c_fc": {"w": norm(keys[4], L, D, 4 * D), "b": jnp.zeros((L, 4 * D), dt)},
                "c_proj": {"w": norm(keys[5], L, 4 * D, D), "b": jnp.zeros((L, D), dt)},
            },
        },
    }
    if version != "gpt":
        params["ln_f"] = {"w": jnp.ones((D,), dt), "b": jnp.zeros((D,), dt)}
    return params


def init_kv_cache(config, batch_size, max_len, dtype=None, fused=None):
    """Fixed-shape KV cache: {'k','v': (L, B, H, T, hd), 'length': ()}.

    With ``config.kv_cache_int8`` each of k/v becomes a
    ``{"q": int8 (L,B,H,T,hd), "s": f32 (L,B,H,T)}`` pair (symmetric
    per-token quantization at write time) — half the HBM footprint and
    streaming bytes per decode step; scales are per key position so the
    dequant folds into the score/AV matmuls as output column scaling.

    With ``config.fused_decode`` (overridable via ``fused``) k/v become the
    FUSED layout (L, B, T, D) consumed by the whole-stack Pallas decode
    kernel (ops/fused_decode.py): head-major per batch row, heads packed
    into the lane axis — fully tile-aligned at any head_dim, and layer
    blocks slice out with zero relayout (T is rounded up to the 8-sublane
    tile; extra rows stay causally masked). Composed with
    ``kv_cache_int8`` each leaf becomes {"q": int8 (L,B,T,D), "s": f32
    (L,B,T,H)} — same per-(b,h,t) symmetric quantization, scales kept as
    head planes so the kernel folds them onto score/prob columns."""
    L, H = config.n_layer, config.n_head
    hd = config.n_embd // H
    dtype = dtype or config.compute_dtype
    if fused is None:
        fused = getattr(config, "fused_decode", False)
    if fused:
        D = config.n_embd
        # long contexts round the capacity to 256 so the blocked decode
        # kernel gets key-block divisors near its 512-row target (a prime
        # T/8 would force 8-row blocks and ~2us/block grid overhead)
        tile = 256 if max_len > 2048 else 8
        T = -(-max_len // tile) * tile
        if getattr(config, "kv_cache_int8", False):
            def fbuf():
                return {"q": jnp.zeros((L, batch_size, T, D), jnp.int8),
                        "s": jnp.zeros((L, batch_size, T, H), jnp.float32)}
            return {"k": fbuf(), "v": fbuf(),
                    "length": jnp.zeros((), jnp.int32)}
        return {
            "k": jnp.zeros((L, batch_size, T, D), dtype),
            "v": jnp.zeros((L, batch_size, T, D), dtype),
            "length": jnp.zeros((), jnp.int32),
        }
    if getattr(config, "kv_cache_int8", False):
        def buf():
            return {"q": jnp.zeros((L, batch_size, H, max_len, hd), jnp.int8),
                    "s": jnp.zeros((L, batch_size, H, max_len), jnp.float32)}
        return {"k": buf(), "v": buf(), "length": jnp.zeros((), jnp.int32)}
    return {
        "k": jnp.zeros((L, batch_size, H, max_len, hd), dtype),
        "v": jnp.zeros((L, batch_size, H, max_len, hd), dtype),
        "length": jnp.zeros((), jnp.int32),
    }


def init_kv_cache_dense(config, batch_size, max_len, dtype=None):
    """init_kv_cache forced to the dense (L, B, H, T, hd) layout even when
    ``config.fused_decode`` is set. Consumers that reorder the cache along
    the batch axis (beam search) or write at per-row ragged offsets
    (batched speculative verify) are incompatible with the fused
    (L, B, T, D) layout and take this factory instead
    (generation/engine.py cache_factory(dense=True))."""
    return init_kv_cache(config, batch_size, max_len, dtype, fused=False)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def cache_write(kv_cache, li, x, offset):
    """Write S new-token keys/values x (B, H, S, hd) into the stacked cache
    (L, B, H, T, hd) for layer ``li`` at ``offset``: a scalar (all rows at the
    same position — the generate() engine) or a (B,) vector (per-row ragged
    positions — the continuous-batching serving engine and batched
    speculative verify windows; any S).

    An int8 cache leaf is the pytree {"q": int8, "s": f32 per-token scales}
    (init_kv_cache with config.kv_cache_int8): x is quantized symmetrically
    per (batch, head, position) before the write."""
    if isinstance(kv_cache, dict):
        amax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1)  # (B,H,S)
        s = jnp.maximum(amax / 127.0, 1e-8)
        q = jnp.clip(jnp.round(x.astype(jnp.float32) / s[..., None]),
                     -127, 127).astype(jnp.int8)
        if kv_cache["q"].ndim == 4:
            B, H, S, hd = x.shape
            qt = jnp.transpose(q, (0, 2, 1, 3)).reshape(B, S, H * hd)
            if "sT" in kv_cache:
                # T-minor scale plane (L,B,H,T) — llama int8 head-major
                # slabs (models/llama.py init_llama_cache); s is (B,H,S)
                # already
                if jnp.ndim(offset) == 0:
                    return {"q": jax.lax.dynamic_update_slice(
                                kv_cache["q"], qt[None], (li, 0, offset, 0)),
                            "sT": jax.lax.dynamic_update_slice(
                                kv_cache["sT"], s[None].astype(jnp.float32),
                                (li, 0, 0, offset))}
                pos = offset[:, None] + jnp.arange(S, dtype=jnp.int32)[None]
                rows = jnp.arange(B)[:, None]
                # (li, rows, :, pos): separated advanced indices put (B,S)
                # first — values arrive (B, S, H)
                return {"q": kv_cache["q"].at[li, rows, pos].set(qt),
                        "sT": kv_cache["sT"].at[li, rows, :, pos].set(
                            jnp.transpose(s, (0, 2, 1)).astype(jnp.float32))}
            # fused-int8 layout: q (L,B,T,D), scale planes (L,B,T,H)
            st = jnp.transpose(s, (0, 2, 1))                     # (B,S,H)
            if jnp.ndim(offset) == 0:
                return {"q": jax.lax.dynamic_update_slice(
                            kv_cache["q"], qt[None], (li, 0, offset, 0)),
                        "s": jax.lax.dynamic_update_slice(
                            kv_cache["s"], st[None].astype(jnp.float32),
                            (li, 0, offset, 0))}
            pos = offset[:, None] + jnp.arange(S, dtype=jnp.int32)[None]
            rows = jnp.arange(B)[:, None]
            return {"q": kv_cache["q"].at[li, rows, pos].set(qt),
                    "s": kv_cache["s"].at[li, rows, pos].set(
                        st.astype(jnp.float32))}
        return {"q": cache_write(kv_cache["q"], li, q, offset),
                "s": _scale_write(kv_cache["s"], li, s, offset)}
    if kv_cache.ndim == 4:
        # fused/head-major (L, B, T, D) layout (ops/fused_decode.py,
        # models/llama.py decode_head_major): head-major rows per batch.
        # Scalar offsets = prefill/chunk writes (the S==1 fused step is
        # intercepted by the kernel); vector offsets = ragged per-row
        # windows, mirroring the 5D and int8-4D branches.
        B, H, S, hd = x.shape
        xt = jnp.transpose(x, (0, 2, 1, 3)).reshape(B, S, H * hd)
        if jnp.ndim(offset) == 0:
            return jax.lax.dynamic_update_slice(
                kv_cache, xt[None].astype(kv_cache.dtype), (li, 0, offset, 0))
        pos = offset[:, None] + jnp.arange(S, dtype=jnp.int32)[None]  # (B, S)
        rows = jnp.arange(B)[:, None]
        return kv_cache.at[li, rows, pos].set(xt.astype(kv_cache.dtype))
    if jnp.ndim(offset) == 0:
        return jax.lax.dynamic_update_slice(
            kv_cache, x[None].astype(kv_cache.dtype), (li, 0, 0, offset, 0))
    B, H, S, hd = x.shape
    pos = offset[:, None] + jnp.arange(S, dtype=jnp.int32)[None]  # (B, S)
    return kv_cache.at[li, jnp.arange(B)[:, None, None],
                       jnp.arange(H)[None, :, None],
                       pos[:, None, :]].set(x.astype(kv_cache.dtype))


def _scale_write(s_cache, li, s, offset):
    """Write (B, H, S) per-token scales into the (L, B, H, T) scale buffer."""
    if jnp.ndim(offset) == 0:
        return jax.lax.dynamic_update_slice(
            s_cache, s[None].astype(s_cache.dtype), (li, 0, 0, offset))
    B, H, S = s.shape
    pos = offset[:, None] + jnp.arange(S, dtype=jnp.int32)[None]
    return s_cache.at[li, jnp.arange(B)[:, None, None],
                      jnp.arange(H)[None, :, None],
                      pos[:, None, :]].set(s.astype(s_cache.dtype))


def cache_layer_kv(buf, li, B, H, T, hd):
    """Slice layer ``li``'s keys-or-values out of a stacked cache buffer.
    Returns (data, scales) — scales is None for a dense (non-int8) cache."""
    if isinstance(buf, dict):
        if buf["q"].ndim == 4:  # fused-int8 -> (B,H,T,hd) + (B,H,T) views
            data = jax.lax.dynamic_slice(buf["q"], (li, 0, 0, 0),
                                         (1, B, T, H * hd))[0]
            if "sT" in buf:  # T-minor scales are (B,H,T) natively
                scales = jax.lax.dynamic_slice(buf["sT"], (li, 0, 0, 0),
                                               (1, B, H, T))[0]
                return (data.reshape(B, T, H, hd).transpose(0, 2, 1, 3),
                        scales)
            scales = jax.lax.dynamic_slice(buf["s"], (li, 0, 0, 0),
                                           (1, B, T, H))[0]
            return (data.reshape(B, T, H, hd).transpose(0, 2, 1, 3),
                    scales.transpose(0, 2, 1))
        data = jax.lax.dynamic_slice(buf["q"], (li, 0, 0, 0, 0),
                                     (1, B, H, T, hd))[0]
        scales = jax.lax.dynamic_slice(buf["s"], (li, 0, 0, 0),
                                       (1, B, H, T))[0]
        return data, scales
    if buf.ndim == 4:  # fused (L, B, T, D) layout -> (B, H, T, hd) view
        data = jax.lax.dynamic_slice(buf, (li, 0, 0, 0), (1, B, T, H * hd))[0]
        return data.reshape(B, T, H, hd).transpose(0, 2, 1, 3), None
    return jax.lax.dynamic_slice(buf, (li, 0, 0, 0, 0),
                                 (1, B, H, T, hd))[0], None


def fused_cache_append(buf, n, cache_len, n_head):
    """Write the fused decode kernel's new k-or-v rows into a fused-layout
    cache buffer at token row ``cache_len`` — a scalar (generate) or (B,)
    per-row positions (continuous-batching serving / batched speculation).
    ``n`` is (L, B, D) (single-token kernel) or (L, S, B, D) (window
    kernel); window rows land at [cache_len, cache_len + S).
    For a fused-int8 buffer the rows are quantized per (layer, batch, head)
    first, with cache_write's exact math (the kernel applied the same
    round-trip to the merged current column(s), so decode stays
    bit-consistent with the XLA int8 path)."""
    ragged = jnp.ndim(cache_len) == 1
    windowed = n.ndim == 4                       # (L, S, B, D) window rows
    if windowed:
        n = jnp.swapaxes(n, 1, 2)                # -> (L, B, S, D)
    if isinstance(buf, dict):
        L, B, T, D = buf["q"].shape
        H = n_head
        S = n.shape[2] if windowed else 1
        r = n.astype(jnp.float32).reshape(L, B, S, H, D // H)
        amax = jnp.max(jnp.abs(r), axis=-1)                  # (L, B, S, H)
        s = jnp.maximum(amax / 127.0, 1e-8)
        q = jnp.clip(jnp.round(r / s[..., None]), -127,
                     127).astype(jnp.int8).reshape(L, B, S, D)
        if ragged:
            rows = jnp.arange(B)[:, None]
            pos = jnp.minimum(cache_len[:, None]
                              + jnp.arange(S, dtype=jnp.int32)[None], T - 1)
            return {"q": buf["q"].at[:, rows, pos].set(q),
                    "s": buf["s"].at[:, rows, pos].set(s)}
        return {"q": jax.lax.dynamic_update_slice(
                    buf["q"], q, (0, 0, cache_len, 0)),
                "s": jax.lax.dynamic_update_slice(
                    buf["s"], s, (0, 0, cache_len, 0))}
    T = buf.shape[2]
    if not windowed:
        n = n[:, :, None, :]                     # (L, B, 1, D)
    S = n.shape[2]
    if ragged:
        rows = jnp.arange(buf.shape[1])[:, None]
        pos = jnp.minimum(cache_len[:, None]
                          + jnp.arange(S, dtype=jnp.int32)[None], T - 1)
        return buf.at[:, rows, pos].set(n.astype(buf.dtype))
    return jax.lax.dynamic_update_slice(
        buf, n.astype(buf.dtype), (0, 0, cache_len, 0))


def _is_fused_cache(buf):
    """True for either fused layout: float (L, B, T, D) or int8
    {"q": (L,B,T,D), "s": (L,B,T,H)}."""
    if isinstance(buf, dict):
        return buf["q"].ndim == 4
    return buf.ndim == 4


def _cache_T(buf):
    """Token capacity of a cache buffer in any layout (dense 5D, int8 dict,
    fused 4D, fused-int8 dict)."""
    if isinstance(buf, dict):
        buf = buf["q"]
    return buf.shape[2] if buf.ndim == 4 else buf.shape[3]


def _attend(q, k, v, cache_len, q_offset, key_padding_additive, scale, causal_fill,
            attn_drop=None, mask_precombined=False, k_scale=None, v_scale=None):
    """Shared causal attention core for prefill/decode over a fixed key buffer.

    q: (B, H, S, hd); k, v: (B, H, T, hd) where only [0, cache_len+S) is valid.
    Query i has global position q_offset + i. Key j is attendable iff
    j <= q_offset + i (causal; also excludes unwritten buffer slots).
    ``q_offset`` may be per-row (B,) for ragged serving batches.

    ``mask_precombined``: ``key_padding_additive`` already folds the causal
    term (single-token decode computes it ONCE per step outside the layer
    scan instead of re-deriving iota/where chains in every layer; the
    additive form is post-softmax-identical to the reference's replace-with
    -1e4 because masked scores underflow exp() to exactly 0 either way).
    """
    B, H, S, hd = q.shape
    T = k.shape[2]
    if k_scale is not None:
        # int8 cache: the convert fuses into the dot (int8 streamed from
        # HBM); per-token dequant scales fold onto the score columns
        scores = jnp.matmul(q, k.astype(q.dtype).swapaxes(-1, -2))
        scores = scores * k_scale[:, :, None, :].astype(scores.dtype)
    else:
        scores = jnp.matmul(q, k.swapaxes(-1, -2))
    if scale:
        scores = scores / math.sqrt(hd)
    if mask_precombined:
        return _softmax_av(scores + key_padding_additive.astype(scores.dtype),
                           v, attn_drop, v_scale)
    row = jax.lax.broadcasted_iota(jnp.int32, (S, T), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (S, T), 1)
    if jnp.ndim(q_offset) == 1:
        causal = col[None] <= (q_offset[:, None, None] + row[None])  # (B, S, T)
        causal = causal[:, None]
    else:
        causal = (col <= (q_offset + row))[None, None]
    scores = jnp.where(causal, scores, jnp.asarray(causal_fill, scores.dtype))
    if key_padding_additive is not None:
        scores = scores + key_padding_additive.astype(scores.dtype)
    return _softmax_av(scores, v, attn_drop, v_scale)


def _softmax_av(scores, v, attn_drop, v_scale=None):
    weights = jax.nn.softmax(scores, axis=-1)
    if attn_drop is not None:
        rate, rng, deterministic = attn_drop
        weights = _dropout(weights, rate, rng, deterministic)
    if v_scale is not None:
        # int8 values: scale the weights per key instead of dequantizing v
        # (the int8->float convert fuses into the dot operand)
        weights = weights * v_scale[:, :, None, :].astype(weights.dtype)
        return jnp.matmul(weights, v.astype(weights.dtype))
    return jnp.matmul(weights.astype(v.dtype), v)


def _split_heads(x, n_head):
    b, s, d = x.shape
    return x.reshape(b, s, n_head, d // n_head).transpose(0, 2, 1, 3)


def _merge_heads(x):
    b, h, s, hd = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, s, h * hd)


def _dropout(x, rate, rng, deterministic):
    if deterministic or not rate or rng is None:
        return x
    keep = jax.random.bernoulli(rng, 1.0 - rate, x.shape)
    return jnp.where(keep, x / (1.0 - rate), 0.0)


def _gpt_block(block_params, layer_kv, h, config, version, additive_mask, cache_len,
               scale=True, deterministic=True, rng=None, mask_precombined=False,
               segments=None):
    """One transformer block. ``layer_kv`` is (k, v) buffers (B, H, T, hd) for
    this layer (or None when running cache-less), ``cache_len`` the number of
    already-cached tokens. Training mode (deterministic=False): attn/resid
    dropout per the reference block (modeling_gpt.py:60-61, 94, 107, 136).
    ``segments`` (B, S) marks packed rows: attention is block-diagonal
    (flash: segment refs; dense: additive mask term)."""
    eps = config.layer_norm_epsilon
    act = ACT2FN[config.afn]
    H = config.n_head
    S = h.shape[1]
    rngs = jax.random.split(rng, 4) if rng is not None else (None,) * 4

    def attn(x):
        qkv = linear(x, block_params["attn"]["c_attn"]["w"], block_params["attn"]["c_attn"]["b"])
        q, k, v = jnp.split(qkv, 3, axis=-1)

        # training/full-forward fast path: the projection output is already
        # head-major (B, S, D), exactly the packed kernel's layout — skip
        # _split_heads/_merge_heads entirely (at hd=64 XLA materializes those
        # transposes as slow relayout copies around the pallas custom-call)
        hd_ = x.shape[-1] // H
        if (getattr(config, "use_flash_attention", False) and S > 1
                and layer_kv is None and 128 % hd_ == 0
                and not getattr(config, "use_ring_attention", False)):
            from cleantransformer_tpu.ops.pallas_kernels import (
                flash_attention_bsd, should_interpret)
            if additive_mask is not None:
                bias = additive_mask[:, :, 0, :]  # (B,1,S)
            else:
                bias = jnp.zeros((x.shape[0], 1, S), jnp.float32)
            out = flash_attention_bsd(
                q, k, v, bias, 0, n_head=H,
                q_segments=segments, k_segments=segments,
                scale=(1.0 / math.sqrt(hd_)) if scale else 1.0,
                causal=True, interpret=should_interpret())
            out = linear(out, block_params["attn"]["c_proj"]["w"],
                         block_params["attn"]["c_proj"]["b"])
            return (_dropout(out, config.resid_pdrop, rngs[1], deterministic),
                    (None, None))

        # single-token decode fast path (mirrors models/bloom.py): at S==1
        # every head move is a free reshape — no (B,H,S,hd) layout copies —
        # and the QK dot accumulates straight to fp32, killing the per-layer
        # upcast convert before the masked softmax. Post-softmax identical;
        # fp32-params parity exact.
        hd_ = x.shape[-1] // H
        if (layer_kv is not None and S == 1 and mask_precombined
                and deterministic and not isinstance(layer_kv[0], dict)):
            k_cache, v_cache, li = layer_kv
            B_ = x.shape[0]
            kh = shard_hint(k.reshape(B_, H, 1, hd_),
                            ("data", "model", None, None))
            vh = v.reshape(B_, H, 1, hd_)
            new_k = cache_write(k_cache, li, kh, cache_len)
            new_v = cache_write(v_cache, li, vh, cache_len)
            T = _cache_T(k_cache)
            kf, _ = cache_layer_kv(new_k, li, B_, H, T, hd_)
            vf, _ = cache_layer_kv(new_v, li, B_, H, T, hd_)
            qh = q.reshape(B_, H, hd_)
            s = jax.lax.dot_general(qh, kf, (((2,), (3,)), ((0, 1), (0, 1))),
                                    preferred_element_type=jnp.float32)
            if scale:
                s = s / math.sqrt(hd_)
            s = s + additive_mask[:, :, 0, :]
            w = jax.nn.softmax(s, axis=-1)
            out = jax.lax.dot_general(w.astype(vf.dtype), vf,
                                      (((2,), (2,)), ((0, 1), (0, 1))))
            out = out.reshape(B_, 1, H * hd_)
            out = linear(out, block_params["attn"]["c_proj"]["w"],
                         block_params["attn"]["c_proj"]["b"])
            return out, (new_k, new_v)

        q, k, v = _split_heads(q, H), _split_heads(k, H), _split_heads(v, H)
        k = shard_hint(k, ("data", "model", None, None))
        k_scale = v_scale = None
        if layer_kv is None:
            new_k, new_v = None, None
            q_offset = 0
        else:
            # write ONLY the new tokens into the full (L,B,H,T,hd) cache at
            # (layer_idx, :, :, cache_len) — a carry-update XLA keeps in
            # place, instead of re-emitting whole per-layer buffers as
            # stacked scan outputs (which forced a full cache copy per step)
            k_cache, v_cache, li = layer_kv
            B_, = (x.shape[0],)
            new_k = cache_write(k_cache, li, k, cache_len)
            new_v = cache_write(v_cache, li, v, cache_len)
            q_offset = cache_len
            T = _cache_T(k_cache)
            hd = k.shape[-1]
            k, k_scale = cache_layer_kv(new_k, li, B_, H, T, hd)
            v, v_scale = cache_layer_kv(new_v, li, B_, H, T, hd)
        # ring attention: sequence parallelism over an ICI 'seq' mesh axis
        # (cache-less multi-token forwards — training / full-context scoring)
        if getattr(config, "use_ring_attention", False) and S > 1 \
                and layer_kv is None:
            from cleantransformer_tpu.parallel.mesh import active_mesh
            from cleantransformer_tpu.parallel.ring_attention import (
                ring_attention)
            mesh = active_mesh()
            if mesh is not None and "seq" not in mesh.axis_names:
                raise ValueError(
                    "use_ring_attention requires a mesh with a 'seq' axis "
                    f"(active mesh has {mesh.axis_names})")
            B_, H_, S_, hd_ = q.shape
            if additive_mask is not None:
                bias = jnp.broadcast_to(additive_mask[:, :, 0, :],
                                        (B_, H_, k.shape[2]))
            else:
                bias = jnp.zeros((B_, H_, k.shape[2]), jnp.float32)
            out = ring_attention(
                q, k, v, bias, mesh=mesh, causal=True,
                scale=(1.0 / math.sqrt(hd_)) if scale else 1.0)
            out = _merge_heads(out)
            out = linear(out, block_params["attn"]["c_proj"]["w"],
                         block_params["attn"]["c_proj"]["b"])
            return (_dropout(out, config.resid_pdrop, rngs[1], deterministic),
                    (new_k, new_v))

        # the kernel's causal iota takes the dynamic cache offset, so flash is
        # exact for any multi-token forward: prefill, chunked prefill, and
        # speculative verify/catch-up windows at nonzero offsets. The flash
        # kernels take float k/v: an int8 cache dequantizes first (per-token
        # scales fold back on) — a transient float view per layer, vastly
        # cheaper than the O(S^2) dense fallback at long prompts
        if (getattr(config, "use_flash_attention", False) and S > 1
                and k_scale is not None):
            k = (k.astype(jnp.float32) * k_scale[..., None]).astype(x.dtype)
            v = (v.astype(jnp.float32) * v_scale[..., None]).astype(x.dtype)
            k_scale = v_scale = None
        use_flash = (getattr(config, "use_flash_attention", False) and S > 1
                     and k_scale is None)
        if use_flash:
            from cleantransformer_tpu.ops.pallas_kernels import (
                flash_attention, should_interpret)
            if additive_mask is not None:
                bias = additive_mask[:, :, 0, :]  # (B,1,T) broadcast over heads
            else:
                bias = jnp.zeros((x.shape[0], 1, k.shape[2]), jnp.float32)
            out = flash_attention(q, k, v, bias, q_offset,
                                  q_segments=segments, k_segments=segments,
                                  scale=(1.0 / math.sqrt(q.shape[-1])) if scale else 1.0,
                                  causal=True, interpret=should_interpret())
        else:
            am = additive_mask
            if segments is not None:
                # packed rows: block-diagonal — no token attends another
                # segment (additive form; masked scores underflow exp to 0)
                neq = (segments[:, :, None]
                       != segments[:, None, :])[:, None]         # (B,1,S,S)
                blk = jnp.where(neq, jnp.finfo(jnp.float32).min, 0.0)
                am = blk if am is None else am + blk
            out = _attend(q, k, v, cache_len, q_offset, am, scale, CAUSAL_NEG,
                          attn_drop=(config.attn_pdrop, rngs[0], deterministic),
                          mask_precombined=mask_precombined,
                          k_scale=k_scale, v_scale=v_scale)
        out = _merge_heads(out)
        out = linear(out, block_params["attn"]["c_proj"]["w"], block_params["attn"]["c_proj"]["b"])
        return _dropout(out, config.resid_pdrop, rngs[1], deterministic), (new_k, new_v)

    def mlp(x):
        x = act(linear(x, block_params["mlp"]["c_fc"]["w"], block_params["mlp"]["c_fc"]["b"]))
        x = shard_hint(x, ("data", None, "model"))
        x = linear(x, block_params["mlp"]["c_proj"]["w"], block_params["mlp"]["c_proj"]["b"])
        # the reference uses torch.nn.Dropout() (p=0.5!) here; we use
        # resid_pdrop — the 0.5 default is plainly a reference bug
        return _dropout(x, config.resid_pdrop, rngs[2], deterministic)

    if version == "gpt":  # post-LN (modeling_gpt.py:141-146)
        attn_out, kv = attn(h)
        n1 = layer_norm(h + attn_out, block_params["ln_1"]["w"], block_params["ln_1"]["b"], eps)
        out = layer_norm(n1 + mlp(n1), block_params["ln_2"]["w"], block_params["ln_2"]["b"], eps)
    else:  # pre-LN gpt2/gpt3 (modeling_gpt.py:147-152)
        attn_out, kv = attn(layer_norm(h, block_params["ln_1"]["w"], block_params["ln_1"]["b"], eps))
        h = h + attn_out
        out = h + mlp(layer_norm(h, block_params["ln_2"]["w"], block_params["ln_2"]["b"], eps))
    return out, kv


def gpt_forward(params, config, input_ids, attention_mask=None, position_ids=None,
                segment_ids=None, cache=None, version="gpt", deterministic=True,
                dropout_rng=None, remat=False, embed_noise=None,
                packed_segments=None):
    """GPT forward. Returns (hidden_states, new_cache).

    - cache-less: ``attention_mask`` is (B, S) over the inputs (or None).
    - cached: ``input_ids`` are the S new tokens; ``attention_mask`` must be
      (B, T) over the *full cache buffer* (1 = attendable). Unwritten future
      slots are already excluded by the causal/window mask.
    - ``embed_noise``: optional (B, S, D) additive noise on the token-embedding
      output (the NEFTune hook point — reference trainer.py:867-898 hooks
      get_input_embeddings(), i.e. before position embeddings are added).
    - ``packed_segments``: (B, S) int, 0 = pad — PACKED-SEQUENCE training
      (trainer/data.packed_collate): several examples share one row with
      block-diagonal-causal attention and per-segment restart of the
      LEARNED absolute position ids (wpe rows 0..len-1, exactly what each
      example would see unpacked). A separate kwarg because GPT's
      ``segment_ids`` are token-TYPE embeddings (reference
      modeling_gpt.py:169 semantics). Cache-less training only.
    """
    compute_dtype = config.compute_dtype
    B, S = input_ids.shape

    cache_len = cache["length"] if cache is not None else jnp.zeros((), jnp.int32)

    packed = packed_segments is not None
    if packed:
        if cache is not None:
            raise ValueError("packed_segments (packed sequences) are a "
                             "cache-less training feature")
        if getattr(config, "use_ring_attention", False):
            raise ValueError("packed sequences are unsupported with ring "
                             "attention (no segment refs in the ring op)")
        seg = packed_segments.astype(jnp.int32)
        if attention_mask is None:
            attention_mask = (seg != 0).astype(jnp.int32)
        if position_ids is None:
            # within-segment positions: idx - segment start (segments are
            # contiguous runs in a packed row); pads pinned to 0
            idx = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None],
                                   (B, S))
            new_seg = jnp.concatenate(
                [jnp.ones((B, 1), bool), seg[:, 1:] != seg[:, :-1]], axis=1)
            seg_start = jax.lax.cummax(jnp.where(new_seg, idx, 0), axis=1)
            position_ids = (idx - seg_start) * (seg != 0)
    else:
        seg = None

    if position_ids is None:
        if jnp.ndim(cache_len) == 1:
            raise ValueError("per-row cache offsets (serving) require "
                             "explicit position_ids")
        if attention_mask is not None:
            # reference: cumsum(mask)-1 with pad positions set to 1, windowed to
            # the current inputs (modeling_gpt.py:171-174). With a cache, the
            # window is [cache_len, cache_len+S) of the full-buffer mask.
            am = attention_mask.astype(jnp.int32)
            pos_full = jnp.cumsum(am, axis=-1) - 1
            pos_full = jnp.where(am == 0, 1, pos_full)
            if cache is None:
                position_ids = pos_full[:, -S:]
            else:
                position_ids = jax.lax.dynamic_slice(
                    pos_full, (0, cache_len), (B, S))
        else:
            position_ids = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None], (B, S))

    # additive padding mask over the key axis (modeling_gpt.py:176-179)
    additive_mask = None
    if attention_mask is not None:
        neg = jnp.finfo(compute_dtype).min if jnp.issubdtype(compute_dtype, jnp.floating) \
            else jnp.finfo(jnp.float32).min
        additive_mask = (1.0 - attention_mask[:, None, None, :].astype(jnp.float32)) * neg

    h = embed_lookup(params["tokens_embed"], input_ids)
    if embed_noise is not None:
        h = h + embed_noise.astype(h.dtype)
    h = h + params["position_embed"][position_ids].astype(h.dtype)
    if segment_ids is not None:
        h = h + embed_lookup(params["tokens_embed"], segment_ids).astype(h.dtype)
    h = h.astype(compute_dtype)
    if not deterministic and dropout_rng is not None:
        h = _dropout(h, config.embd_pdrop,
                     jax.random.fold_in(dropout_rng, 0xE), deterministic)
    h = shard_hint(h, ("data", None, None))

    scale = True  # GPTModel always builds blocks with scale=True (modeling_gpt.py:163)

    if cache is None:
        def run_block(h_in, li, xs):
            rng_l = (jax.random.fold_in(dropout_rng, li)
                     if dropout_rng is not None else None)
            out, _ = _gpt_block(xs, None, h_in, config, version,
                                additive_mask, cache_len, scale,
                                deterministic, rng_l, segments=seg)
            return out
        if remat:
            # per-layer remat; remat="attn" pins the flash out/lse residuals
            # (no forward-kernel re-run in backward); remat="dots" saves
            # matmul outputs so the backward recomputes only elementwise ops
            # (see bloom.py)
            if remat == "dots":
                policy = jax.checkpoint_policies.dots_with_no_batch_dims_saveable
            elif remat == "attn":
                policy = jax.checkpoint_policies.save_only_these_names(
                    "flash_out", "flash_lse")
            elif remat == "dots_attn":
                # dots + pinned flash residuals: the backward recomputes only
                # elementwise ops AND never re-runs the attention kernel
                policy = jax.checkpoint_policies.save_from_both_policies(
                    jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
                    jax.checkpoint_policies.save_only_these_names(
                        "flash_out", "flash_lse"))
            else:
                policy = None
            run_block = jax.checkpoint(run_block, policy=policy)

        def body(carry, xs):
            h_in, li = carry
            return (run_block(h_in, li, xs), li + 1), None
        (h, _), _ = jax.lax.scan(body, (h, jnp.zeros((), jnp.int32)), params["blocks"])
        new_cache = None
    else:
        kbuf = cache["k"]
        if additive_mask is not None and additive_mask.shape[-1] < _cache_T(kbuf):
            # the fused cache capacity is tile-padded past the engine's mask
            # buffers; padded key slots carry bias 0 here — the causal term
            # (col bounded by cache_len) already excludes them everywhere
            additive_mask = jnp.pad(
                additive_mask, ((0, 0), (0, 0), (0, 0),
                                (0, _cache_T(kbuf) - additive_mask.shape[-1])))
        fused_layout = _is_fused_cache(kbuf)
        if fused_layout and S == 1 and deterministic:
            # whole-stack fused decode: ONE pallas program replaces the
            # ~10-kernels-per-layer scan body (ops/fused_decode.py). The
            # additive key bias is strict-causal (col < cache_len): the
            # current token's k/v are computed in-kernel and merged into
            # the softmax as an extra column, then written into the fused
            # (L, B, T, D) cache here with one stacked-row update per buffer
            # (a two-axis scatter for ragged serving offsets; quantizing
            # first for a fused-int8 cache).
            from cleantransformer_tpu.ops.fused_decode import (
                gpt_fused_blocked, gpt_fused_decode, fits_vmem, table_bytes)
            from cleantransformer_tpu.ops.pallas_kernels import should_interpret
            fused_int8 = isinstance(kbuf, dict)
            L, _, T, D = (kbuf["q"] if fused_int8 else kbuf).shape
            Hh = config.n_head
            wfc = params["blocks"]["mlp"]["c_fc"]["w"]
            F = (wfc["q"] if isinstance(wfc, dict) else wfc).shape[-1]
            cbytes = 1 if fused_int8 else kbuf.dtype.itemsize
            whole = fits_vmem(B, T, D, F, Hh, cache_bytes=cbytes,
                              kv_int8=fused_int8)
            ragged = jnp.ndim(cache_len) == 1
            col = jax.lax.broadcasted_iota(jnp.int32, (1, T), 1)
            if ragged:  # (B,) per-row offsets (continuous batching)
                bias_bt = jnp.where(col < cache_len[:, None], 0.0,
                                    CAUSAL_NEG)                # (B, T)
            else:
                bias_bt = jnp.where(col < cache_len, 0.0, CAUSAL_NEG)
            if additive_mask is not None:
                bias_bt = bias_bt + additive_mask[:, 0, 0, :]
            bias_bt = jnp.broadcast_to(bias_bt, (B, T)).astype(jnp.float32)
            bias_cur = jnp.zeros((B, Hh), jnp.float32)
            if whole:
                bias = jnp.broadcast_to(bias_bt[:, :, None], (B, T, Hh))
                y, nk, nv = gpt_fused_decode(
                    params["blocks"], h[:, 0, :], bias, bias_cur, kbuf,
                    cache["v"], config=config, version=version,
                    cache_len=None if ragged else cache_len,
                    park_bytes=table_bytes(
                        params.get("lm_head", params["tokens_embed"])),
                    interpret=should_interpret())
            else:
                # LONG CONTEXT: the layer's cache block exceeds VMEM —
                # stream it in key blocks with online-softmax partials
                # (ops/fused_decode._gpt_blocked_kernel) instead of
                # bailing to the ~125-fusion XLA per-layer path. GPT bias
                # is head-uniform: a 128-aligned capacity takes the dense
                # T-minor (B, 1, T) plane (the head-broadcast (B, T, H)
                # stream paid ~10x HBM lane padding per key block)
                t_minor = T % 128 == 0
                bias = (bias_bt[:, None, :] if t_minor
                        else jnp.broadcast_to(bias_bt[:, :, None],
                                              (B, T, Hh)))
                y, nk, nv = gpt_fused_blocked(
                    params["blocks"], h[:, 0, :], bias, bias_cur, kbuf,
                    cache["v"], config=config, version=version,
                    key_block=getattr(config, "decode_key_block", 512),
                    bias_t_minor=t_minor, interpret=should_interpret())
            if isinstance(nk, dict) or jnp.ndim(nk) == 4:
                # in-place mode: nk/nv ARE the updated cache buffers
                new_k, new_v = nk, nv
            else:
                new_k = fused_cache_append(kbuf, nk, cache_len, Hh)
                new_v = fused_cache_append(cache["v"], nv, cache_len, Hh)
            h = y[:, None, :]
            new_cache = {"k": new_k, "v": new_v,
                         "length": cache_len + 1}
            if version != "gpt":
                h = layer_norm(h, params["ln_f"]["w"],
                               params["ln_f"]["b"],
                               config.layer_norm_epsilon)
            return h, new_cache
        if (fused_layout and 2 <= S <= getattr(
                config, "fused_decode_max_window", 12) and deterministic):
            # multi-token decode WINDOW (speculative verify S = K+1, draft
            # catch-up, short serving chunks): one grid-(L,) program for the
            # whole stack (ops/fused_decode.py _gpt_window_kernel) instead
            # of the ~10-kernels-per-layer XLA scan those windows fell back
            # to. Cache keys keep the S==1 branch's strict-causal bias; the
            # S window tokens ride merged softmax columns with in-kernel
            # causality, and their k/v rows return for one contiguous
            # cache append.
            from cleantransformer_tpu.ops.fused_decode import (
                gpt_fused_blocked_window, gpt_fused_window, table_bytes,
                window_fits_vmem)
            from cleantransformer_tpu.ops.pallas_kernels import should_interpret
            fused_int8 = isinstance(kbuf, dict)
            L, _, T, D = (kbuf["q"] if fused_int8 else kbuf).shape
            Hh = config.n_head
            wfc = params["blocks"]["mlp"]["c_fc"]["w"]
            F = (wfc["q"] if isinstance(wfc, dict) else wfc).shape[-1]
            cbytes = 1 if fused_int8 else kbuf.dtype.itemsize
            whole_window = window_fits_vmem(S, B, T, D, F, Hh,
                                            cache_bytes=cbytes,
                                            kv_int8=fused_int8)
            if not whole_window:
                # LONG-CONTEXT window (speculative verify / serving chunk
                # past ~2-4k keys): stream the cache in key blocks with
                # per-query online-softmax partials instead of bailing to
                # the ~125-fusion XLA path. The stream bias strictly masks
                # col >= cache_len (committed keys only); the window's own
                # columns ride the kernel's epilogue merge (bias_cur=0: no
                # positional/pad term at fresh columns).
                col = jax.lax.broadcasted_iota(jnp.int32, (1, T), 1)
                if jnp.ndim(cache_len) == 1:  # ragged serving offsets
                    bias_bt = jnp.where(col < cache_len[:, None], 0.0,
                                        CAUSAL_NEG)
                else:
                    bias_bt = jnp.where(col < cache_len, 0.0, CAUSAL_NEG)
                if additive_mask is not None:
                    bias_bt = bias_bt + additive_mask[:, 0, 0, :]
                bias_bt = jnp.broadcast_to(bias_bt, (B, T)).astype(
                    jnp.float32)
                bias = jnp.broadcast_to(bias_bt[:, :, None], (B, T, Hh))
                bias_cur = jnp.zeros((S, B, Hh), jnp.float32)
                y, nk, nv = gpt_fused_blocked_window(
                    params["blocks"], jnp.swapaxes(h, 0, 1), bias, bias_cur,
                    kbuf, cache["v"], config=config, version=version,
                    key_block=getattr(config, "decode_key_block", 512),
                    interpret=should_interpret())
                new_k = fused_cache_append(kbuf, nk, cache_len, Hh)
                new_v = fused_cache_append(cache["v"], nv, cache_len, Hh)
                h = jnp.swapaxes(y, 0, 1)                        # (B, S, D)
                new_cache = {"k": new_k, "v": new_v,
                             "length": cache_len + S}
                if version != "gpt":
                    h = layer_norm(h, params["ln_f"]["w"],
                                   params["ln_f"]["b"],
                                   config.layer_norm_epsilon)
                return h, new_cache
            if whole_window:
                # key bias = padding only, over the whole buffer (window
                # columns included); the kernel owns causality (per-query
                # clamp col <= cache_len + s)
                pad_bt = (jnp.zeros((B, T), jnp.float32)
                          if additive_mask is None
                          else additive_mask[:, 0, 0, :].astype(jnp.float32))
                bias = jnp.broadcast_to(pad_bt[:, :, None], (B, T, Hh))
                y, nk, nv = gpt_fused_window(
                    params["blocks"], jnp.swapaxes(h, 0, 1), bias,
                    cache_len, kbuf, cache["v"],
                    config=config, version=version,
                    park_bytes=table_bytes(
                        params.get("lm_head", params["tokens_embed"])),
                    interpret=should_interpret())
                new_k = fused_cache_append(kbuf, nk, cache_len, Hh)
                new_v = fused_cache_append(cache["v"], nv, cache_len, Hh)
                h = jnp.swapaxes(y, 0, 1)                        # (B, S, D)
                new_cache = {"k": new_k, "v": new_v,
                             "length": cache_len + S}
                if version != "gpt":
                    h = layer_norm(h, params["ln_f"]["w"],
                                   params["ln_f"]["b"],
                                   config.layer_norm_epsilon)
                return h, new_cache
        mask_precombined = False
        if S == 1:
            # single-token decode: fold the causal term (key j attendable iff
            # j <= cache_len, which also excludes unwritten buffer slots) into
            # the additive key bias ONCE per step — every layer shares it, so
            # per-layer attention is just matmul+add+softmax+matmul instead of
            # re-deriving iota/where mask chains n_layer times per token.
            # Post-softmax this is identical to the reference's replace-with
            # -1e4: masked scores underflow exp() to exactly 0 either way.
            kbuf = cache["k"]
            T = _cache_T(kbuf)
            col = jax.lax.broadcasted_iota(jnp.int32, (1, T), 1)
            if jnp.ndim(cache_len) == 1:  # ragged serving rows
                causal_add = jnp.where(col[None] <= cache_len[:, None, None],
                                       0.0, CAUSAL_NEG)[:, None]  # (B,1,1,T)
            else:
                causal_add = jnp.where(col <= cache_len, 0.0,
                                       CAUSAL_NEG)[None, None]  # (1,1,1,T)
            additive_mask = (causal_add if additive_mask is None
                             else additive_mask + causal_add)
            mask_precombined = True
        elif not getattr(config, "use_flash_attention", False):
            # multi-token cached windows (serving decode chunks, speculative
            # verify/catch-up, chunked prefill): same fold with the query-row
            # term — key j attendable for query i iff j <= cache_len + i.
            # Built ONCE per step instead of per layer inside the scan.
            # (skipped under flash: the kernel derives causality from its own
            # iota + q_offset and must not receive a causal bias)
            kbuf = cache["k"]
            T = _cache_T(kbuf)
            col = jax.lax.broadcasted_iota(jnp.int32, (S, T), 1)
            row = jax.lax.broadcasted_iota(jnp.int32, (S, T), 0)
            if jnp.ndim(cache_len) == 1:  # ragged per-row offsets
                causal_add = jnp.where(
                    col[None] <= cache_len[:, None, None] + row[None],
                    0.0, CAUSAL_NEG)[:, None]                # (B,1,S,T)
            else:
                causal_add = jnp.where(col <= cache_len + row, 0.0,
                                       CAUSAL_NEG)[None, None]  # (1,1,S,T)
            additive_mask = (causal_add if additive_mask is None
                             else additive_mask + causal_add)
            mask_precombined = True

        def body(carry, block_params):
            h_in, k_cache, v_cache, li = carry
            out, (nk, nv) = _gpt_block(block_params, (k_cache, v_cache, li),
                                       h_in, config, version, additive_mask,
                                       cache_len, scale,
                                       mask_precombined=mask_precombined)
            return (out, nk, nv, li + 1), None
        (h, new_k, new_v, _), _ = jax.lax.scan(
            body, (h, cache["k"], cache["v"], jnp.zeros((), jnp.int32)),
            params["blocks"],
            unroll=getattr(config, "decode_unroll", 1))
        new_cache = {"k": new_k, "v": new_v, "length": cache_len + S}

    if version != "gpt":
        h = layer_norm(h, params["ln_f"]["w"], params["ln_f"]["b"], config.layer_norm_epsilon)
    return h, new_cache


def gpt_lm_head(params, hidden_states):
    """Tied LM head: logits = h @ wte^T (modeling_gpt.py:204-208).
    Supports int8-quantized tables (ops/quant.py)."""
    wte = params.get("lm_head", params["tokens_embed"])
    return lm_head_matmul(hidden_states, wte)


def gpt_lm_forward(params, config, input_ids, attention_mask=None, position_ids=None,
                   segment_ids=None, cache=None, version="gpt", last_only=False,
                   deterministic=True, dropout_rng=None, remat=False,
                   embed_noise=None, packed_segments=None):
    """Mirror of GPTLMHeadModel.forward: returns ((lm_logits, hidden), cache).

    ``last_only``: compute logits for the final position only — the decode
    engine's prefill uses this (the (S, vocab) projection is the dominant
    prefill matmul and only row -1 is consumed)."""
    h, new_cache = gpt_forward(params, config, input_ids, attention_mask,
                               position_ids, segment_ids, cache, version,
                               deterministic, dropout_rng, remat, embed_noise,
                               packed_segments)
    logits = gpt_lm_head(params, h[:, -1:] if last_only else h)
    return (logits, h), new_cache


# ---------------------------------------------------------------------------
# Thin class wrappers mirroring the reference's public API
# ---------------------------------------------------------------------------

class GPTModel:
    """API-compatible wrapper (reference GPTModel, modeling_gpt.py:156-195)."""

    def __init__(self, config, version="gpt", params=None, rng=None):
        self.config = config
        self.version = version
        self.params = params if params is not None else init_gpt_params(
            config, rng if rng is not None else jax.random.PRNGKey(0), version)

    def __call__(self, input_ids, attention_mask=None, position_ids=None,
                 segment_ids=None, k_v_pasts=None):
        return gpt_forward(self.params, self.config, input_ids, attention_mask,
                           position_ids, segment_ids, k_v_pasts, self.version)


_VERSION_FORWARDS = {}


def _forward_for_version(version):
    """One shared partial per GPT version: the forward fn is a static jit
    argument in the generation engine, so per-instance partials (which hash
    by identity) would retrace every program for every model instance."""
    if version not in _VERSION_FORWARDS:
        _VERSION_FORWARDS[version] = partial(gpt_lm_forward, version=version)
    return _VERSION_FORWARDS[version]


class GPTLMHeadModel:
    """API-compatible wrapper (reference GPTLMHeadModel, modeling_gpt.py:198-214).

    Inherits the generation surface via GenerationMixin-equivalent methods
    (see cleantransformer_tpu/generation/engine.py)."""

    def __init__(self, config, version="gpt", params=None, rng=None):
        self.config = config
        self.version = version
        self.params = params if params is not None else init_gpt_params(
            config, rng if rng is not None else jax.random.PRNGKey(0), version)
        # shared per-version so every instance hits the same jit cache entry
        self._forward = _forward_for_version(version)
        from cleantransformer_tpu.generation.engine import bind_generation
        bind_generation(self)

    # module-level factory consumed as a static jit arg by the generation
    # engine (a bound init_cache there would pin the model in the jit cache)
    cache_factory = staticmethod(init_kv_cache)
    cache_factory_dense = staticmethod(init_kv_cache_dense)

    @property
    def n_layer(self):
        return self.config.n_layer

    def init_cache(self, batch_size, max_len, dtype=None):
        return init_kv_cache(self.config, batch_size, max_len, dtype)

    def forward_fn(self):
        """The jittable forward for the generation engine."""
        return self._forward

    def __call__(self, input_ids, attention_mask=None, segment_ids=None,
                 position_ids=None, k_v_pasts=None):
        return gpt_lm_forward(self.params, self.config, input_ids, attention_mask,
                              position_ids, segment_ids, k_v_pasts, self.version)
