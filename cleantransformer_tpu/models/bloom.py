"""Bloom as pure functions over pytree parameters.

Behavioral spec: the reference's modeling_bloom.py. TPU-first design mirrors
models/gpt.py: stacked layer params + lax.scan, fixed-shape KV-cache, iota
masks. Reference semantics preserved:

 - ALiBi bias: per-head slopes 2^(-8i/n) times mask-cumsum key positions
   (build_alibi_tensor, modeling_bloom.py:309-331); added to q@k^T * 1/sqrt(hd)
   (the baddbmm at modeling_bloom.py:99-104).
 - fused QKV viewed (b, s, heads, 3, head_dim) (modeling_bloom.py:79-82).
 - bool attention mask (True = masked) filled with finfo.min after an
   upcast to fp32 (modeling_bloom.py:106-110); causal part only when
   q_len > 1 (modeling_bloom.py:176-185) — with the fixed-size cache the
   causal iota test is equivalent for q_len == 1 as well.
 - residual added inside the attention layer (modeling_bloom.py:121-122) and
   ``apply_residual_connection_post_layernorm`` switch (modeling_bloom.py:142-158).
 - tied lm_head fallback and shift-by-1 CE loss when labels are given
   (modeling_bloom.py:215-231).
"""

import math
from functools import partial

import jax
import jax.numpy as jnp

from cleantransformer_tpu.ops.activations import bloom_gelu
from cleantransformer_tpu.ops.layers import layer_norm, linear
from cleantransformer_tpu.ops.losses import shift_cross_entropy_loss
from cleantransformer_tpu.ops.quant import embed_lookup, lm_head_matmul
from cleantransformer_tpu.parallel.sharding import shard_hint


def alibi_slopes(num_heads):
    """Per-head ALiBi slopes (modeling_bloom.py:312-326), as a host-side
    constant (shapes are static)."""
    closest_pow2 = 2 ** math.floor(math.log2(num_heads))
    base = 2 ** (-(2 ** -(math.log2(closest_pow2) - 3)))
    slopes = [base ** i for i in range(1, closest_pow2 + 1)]
    if closest_pow2 != num_heads:
        extra_base = 2 ** (-(2 ** -(math.log2(2 * closest_pow2) - 3)))
        num_rem = min(closest_pow2, num_heads - closest_pow2)
        slopes += [extra_base ** i for i in range(1, 1 + 2 * num_rem, 2)]
    return jnp.asarray(slopes, dtype=jnp.float32)


def build_alibi_bias(attention_mask, num_heads, dtype=jnp.float32):
    """(B, T) mask -> (B, H, 1, T) additive bias: slopes * ((cumsum-1)*mask)
    (modeling_bloom.py:329-331)."""
    slopes = alibi_slopes(num_heads)
    am = attention_mask.astype(jnp.float32)
    positions = (jnp.cumsum(am, axis=-1) - 1) * am  # (B, T)
    return (slopes[None, :, None, None] * positions[:, None, None, :]).astype(dtype)


def init_bloom_params(config, rng):
    D, V, L = config.hidden_size, config.vocab_size, config.n_layer
    keys = jax.random.split(rng, 8)
    std = config.initializer_range
    dt = config.param_dtype

    def norm(k, *shape):
        return (jax.random.normal(k, shape) * std).astype(dt)

    def ln(shape=(L, D)):
        return {"w": jnp.ones(shape, dt), "b": jnp.zeros(shape, dt)}

    params = {
        "word_embeddings": norm(keys[0], V, D),
        "word_embeddings_layernorm": {"w": jnp.ones((D,), dt), "b": jnp.zeros((D,), dt)},
        "blocks": {
            "input_layernorm": ln(),
            "self_attention": {
                "query_key_value": {"w": norm(keys[1], L, D, 3 * D), "b": jnp.zeros((L, 3 * D), dt)},
                "dense": {"w": norm(keys[2], L, D, D), "b": jnp.zeros((L, D), dt)},
            },
            "post_attention_layernorm": ln(),
            "mlp": {
                "dense_h_to_4h": {"w": norm(keys[3], L, D, 4 * D), "b": jnp.zeros((L, 4 * D), dt)},
                "dense_4h_to_h": {"w": norm(keys[4], L, 4 * D, D), "b": jnp.zeros((L, D), dt)},
            },
        },
        "ln_f": {"w": jnp.ones((D,), dt), "b": jnp.zeros((D,), dt)},
    }
    # NOTE: no 'lm_head' key => weight-tied to word_embeddings (one parameter,
    # so gradients flow through both uses — matching the reference's shared
    # Parameter after _tie_weight, modeling_bloom.py:215-216)
    return params


def init_bloom_cache(config, batch_size, max_len, dtype=None, fused=None):
    L, H = config.n_layer, config.n_head
    hd = config.hidden_size // H
    dtype = dtype or config.compute_dtype
    if fused is None:
        fused = getattr(config, "fused_decode", False)
    if fused:
        # fused (L, B, T, D) head-major layout for the whole-stack decode
        # kernel — see models/gpt.py init_kv_cache for the full rationale
        D = config.hidden_size
        tile = 256 if max_len > 2048 else 8  # see models/gpt.py
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
        # see models/gpt.py init_kv_cache: {"q": int8, "s": f32} per leaf
        def buf():
            return {"q": jnp.zeros((L, batch_size, H, max_len, hd), jnp.int8),
                    "s": jnp.zeros((L, batch_size, H, max_len), jnp.float32)}
        return {"k": buf(), "v": buf(), "length": jnp.zeros((), jnp.int32)}
    return {
        "k": jnp.zeros((L, batch_size, H, max_len, hd), dtype),
        "v": jnp.zeros((L, batch_size, H, max_len, hd), dtype),
        "length": jnp.zeros((), jnp.int32),
    }


def init_bloom_cache_dense(config, batch_size, max_len, dtype=None):
    """init_bloom_cache forced to the dense (L, B, H, T, hd) layout (see
    models/gpt.py init_kv_cache_dense — beam reorders the batch axis,
    speculative writes ragged windows)."""
    return init_bloom_cache(config, batch_size, max_len, dtype, fused=False)


def prepare_decode_params(params, config):
    """One-time decode-param prep (engine.inference_params hook): Bloom's
    query_key_value columns are head-interleaved (h0:q,k,v | h1:q,k,v | …,
    reference modeling_bloom.py:83-90) but the fused decode kernel wants
    contiguous q|k|v groups — permute once per generate() instead of every
    step, leaving the original tensor for the (head-aware) prefill path."""
    if not getattr(config, "fused_decode", False):
        return params
    qkv = params["blocks"]["self_attention"]["query_key_value"]
    W, b = qkv["w"], qkv["b"]
    quantized = isinstance(W, dict)  # int8 {"q","s"} (ops/quant.py)
    Wq = W["q"] if quantized else W
    L, D, _ = Wq.shape
    H = config.n_head
    hd = D // H

    def cols(x):  # permute interleaved (H, 3, hd) columns to q|k|v groups
        return x.reshape(x.shape[:-1] + (H, 3, hd)).swapaxes(-3, -2) \
                .reshape(x.shape[:-1] + (3 * D,))

    Wp = {"q": cols(Wq), "s": cols(W["s"])} if quantized else cols(Wq)
    return {**params, "qkv_fused": {"w": Wp, "b": cols(b)}}


def _bloom_attention(attn_params, h, residual, alibi_bias, bool_mask, layer_kv,
                     cache_len, num_heads, dropout_rate=0.0, deterministic=True,
                     rng=None, use_flash=False, pad_mask=None, head_mask=None,
                     use_ring=False, mask_additive=None, segments=None):
    B, S, D = h.shape
    hd = D // num_heads
    qkv = linear(h, attn_params["query_key_value"]["w"], attn_params["query_key_value"]["b"])
    qkv = qkv.reshape(B, S, num_heads, 3, hd)

    # training/full-forward fast path: keep q/k/v in head-major (B, S, D)
    # for the packed kernel — no head transposes (at hd=64 those become
    # slow relayout copies around the pallas custom-call). Packed rows
    # pass their segment ids straight into the kernel (block-diagonal
    # masking), so sequence packing stays on this no-transpose path too.
    if (use_flash and S > 1 and layer_kv is None and 128 % hd == 0
            and not use_ring and head_mask is None):
        from cleantransformer_tpu.ops.pallas_kernels import (
            flash_attention_bsd, should_interpret)
        q3 = qkv[..., 0, :].reshape(B, S, D)
        k3 = qkv[..., 1, :].reshape(B, S, D)
        v3 = qkv[..., 2, :].reshape(B, S, D)
        bias = alibi_bias[:, :, 0, :]
        if pad_mask is not None:
            bias = bias + jnp.where(pad_mask, 0.0, -jnp.inf)[:, None, :]
        out = flash_attention_bsd(q3, k3, v3, bias, cache_len,
                                  q_segments=segments, k_segments=segments,
                                  n_head=num_heads,
                                  scale=1.0 / math.sqrt(hd), causal=True,
                                  interpret=should_interpret())
        out = linear(out, attn_params["dense"]["w"], attn_params["dense"]["b"])
        return residual + out, (None, None)

    # single-token decode fast path: head-major math throughout — the
    # (B,1,H,hd)->(B,H,1,hd) moves are free reshapes at S==1 (the generic
    # path's transposes cost Bloom ~117 layout copies/step at hd=64), and
    # the QK dot accumulates straight to fp32 (preferred_element_type), so
    # the per-layer upcast convert before the masked softmax disappears.
    # Post-softmax identical numerics; fp32-params parity is exact.
    if (layer_kv is not None and S == 1 and head_mask is None
            and mask_additive is not None and deterministic
            and not isinstance(layer_kv[0], dict)):  # int8 keeps generic path
        from cleantransformer_tpu.models.gpt import (cache_write,
                                                     cache_layer_kv, _cache_T)
        k_cache, v_cache, li = layer_kv
        kh = qkv[..., 1, :].reshape(B, num_heads, 1, hd)
        vh = qkv[..., 2, :].reshape(B, num_heads, 1, hd)
        kh = shard_hint(kh, ("data", "model", None, None))
        new_k = cache_write(k_cache, li, kh, cache_len)
        new_v = cache_write(v_cache, li, vh, cache_len)
        T = _cache_T(k_cache)
        k, _ = cache_layer_kv(new_k, li, B, num_heads, T, hd)
        v, _ = cache_layer_kv(new_v, li, B, num_heads, T, hd)
        qh = qkv[..., 0, :].reshape(B, num_heads, hd)
        s = jax.lax.dot_general(qh, k, (((2,), (3,)), ((0, 1), (0, 1))),
                                preferred_element_type=jnp.float32)
        s = s * (1.0 / math.sqrt(hd)) + alibi_bias[:, :, 0, :].astype(s.dtype)
        s = s + mask_additive[:, :, 0, :]
        w = jax.nn.softmax(s, axis=-1)
        out = jax.lax.dot_general(w.astype(v.dtype), v,
                                  (((2,), (2,)), ((0, 1), (0, 1))))
        out = out.reshape(B, 1, D)
        out = linear(out, attn_params["dense"]["w"], attn_params["dense"]["b"])
        return residual + out, (new_k, new_v)

    q = qkv[..., 0, :].transpose(0, 2, 1, 3)  # (B, H, S, hd)
    k = qkv[..., 1, :].transpose(0, 2, 1, 3)
    v = qkv[..., 2, :].transpose(0, 2, 1, 3)
    k = shard_hint(k, ("data", "model", None, None))

    k_scale = v_scale = None
    if layer_kv is None:
        new_k, new_v = None, None
    else:
        # token-sized in-place carry update on the full (L,B,H,T,hd) cache
        # (see models/gpt.py attn for rationale); per-row offsets for serving
        from cleantransformer_tpu.models.gpt import (cache_write,
                                                     cache_layer_kv, _cache_T)
        k_cache, v_cache, li = layer_kv
        new_k = cache_write(k_cache, li, k, cache_len)
        new_v = cache_write(v_cache, li, v, cache_len)
        T = _cache_T(k_cache)
        k, k_scale = cache_layer_kv(new_k, li, B, num_heads, T, hd)
        v, v_scale = cache_layer_kv(new_v, li, B, num_heads, T, hd)

    # Ring attention (sequence parallelism over an ICI 'seq' mesh axis):
    # cache-less multi-token forwards only (training / full-context scoring).
    # K/V/bias chunks rotate around the ring; context length scales linearly
    # with the ring size (SURVEY §5 long-context extension).
    if use_ring and S > 1 and layer_kv is None:
        from cleantransformer_tpu.parallel.mesh import active_mesh
        from cleantransformer_tpu.parallel.ring_attention import ring_attention
        mesh = active_mesh()
        if mesh is not None and "seq" not in mesh.axis_names:
            raise ValueError("use_ring_attention requires a mesh with a "
                             f"'seq' axis (active mesh has {mesh.axis_names})")
        bias = alibi_bias[:, :, 0, :]
        if pad_mask is not None:
            bias = bias + jnp.where(pad_mask, 0.0, -jnp.inf)[:, None, :]
        bias = jnp.broadcast_to(bias, (B, num_heads, S))
        out = ring_attention(q, k, v, bias, mesh=mesh, causal=True,
                             scale=1.0 / math.sqrt(hd))
        out = out.transpose(0, 2, 1, 3).reshape(B, S, D)
        out = linear(out, attn_params["dense"]["w"], attn_params["dense"]["b"])
        return residual + out, (new_k, new_v)

    # Flash covers every multi-token forward: cache-less (training/parity),
    # prefill, and nonzero-offset windows (speculative verify, chunked
    # prefill) — the kernel's causal iota takes the dynamic cache offset.
    # An int8 cache dequantizes to a transient float view first (see
    # models/gpt.py) instead of falling back to O(S^2) dense attention.
    if use_flash and S > 1 and k_scale is not None:
        k = (k.astype(jnp.float32) * k_scale[..., None]).astype(h.dtype)
        v = (v.astype(jnp.float32) * v_scale[..., None]).astype(h.dtype)
        k_scale = v_scale = None
    if use_flash and S > 1 and k_scale is None:
        from cleantransformer_tpu.ops.pallas_kernels import (
            flash_attention, should_interpret)
        # fold ALiBi + padding into the per-key additive bias (B,H,T)
        bias = alibi_bias[:, :, 0, :]
        if pad_mask is not None:
            bias = bias + jnp.where(pad_mask, 0.0, -jnp.inf)[:, None, :]
        out = flash_attention(q, k, v, bias, cache_len,
                              q_segments=segments, k_segments=segments,
                              scale=1.0 / math.sqrt(hd),
                              causal=True, interpret=should_interpret())
        out = out.transpose(0, 2, 1, 3).reshape(B, S, D)
        out = linear(out, attn_params["dense"]["w"], attn_params["dense"]["b"])
        return residual + out, (new_k, new_v)

    if k_scale is not None:
        # int8 cache: int8->float convert fuses into the dot; per-token
        # dequant scales fold onto the score columns
        scores = jnp.matmul(q, k.astype(q.dtype).swapaxes(-1, -2))
        scores = scores * k_scale[:, :, None, :].astype(scores.dtype)
        scores = scores * (1.0 / math.sqrt(hd))
    else:
        scores = jnp.matmul(q, k.swapaxes(-1, -2)) * (1.0 / math.sqrt(hd))
    scores = scores + alibi_bias.astype(scores.dtype)
    # fp32 upcast before masked softmax (modeling_bloom.py:106-110)
    scores = scores.astype(jnp.float32)
    if mask_additive is not None:
        # single-token decode: causal+padding folded into one fp32 additive
        # bias computed once per step (shared by all layers) — post-softmax
        # identical to the where-replace (masked scores underflow exp to 0)
        scores = scores + mask_additive
    else:
        scores = jnp.where(bool_mask, jnp.finfo(jnp.float32).min, scores)
    weights = jax.nn.softmax(scores, axis=-1)
    if not deterministic and dropout_rate > 0.0:
        keep = jax.random.bernoulli(rng, 1.0 - dropout_rate, weights.shape)
        weights = jnp.where(keep, weights / (1.0 - dropout_rate), 0.0)
    if head_mask is not None:
        # multiplicative, post-softmax (modeling_bloom.py:112-113)
        weights = weights * head_mask
    if v_scale is not None:
        weights = weights * v_scale[:, :, None, :].astype(weights.dtype)
        out = jnp.matmul(weights.astype(h.dtype),
                         v.astype(h.dtype))
    else:
        weights = weights.astype(v.dtype)
        out = jnp.matmul(weights, v)
    out = out.transpose(0, 2, 1, 3).reshape(B, S, D)
    out = linear(out, attn_params["dense"]["w"], attn_params["dense"]["b"])
    return residual + out, (new_k, new_v)


def _bloom_mlp(mlp_params, h, residual, pretraining_tp=1, slow_but_exact=False):
    x = bloom_gelu(linear(h, mlp_params["dense_h_to_4h"]["w"], mlp_params["dense_h_to_4h"]["b"]))
    x = shard_hint(x, ("data", None, "model"))
    w = mlp_params["dense_4h_to_h"]["w"]
    if pretraining_tp > 1 and slow_but_exact:
        # Megatron-TP numerics emulation (modeling_bloom.py:258-265): sum of
        # per-shard column-slice matmuls, reproducing TP's accumulation order
        # bit-for-bit. (Real TP here is the 'model' mesh axis — this branch
        # exists for checkpoint-numerics parity with Megatron-trained Bloom.)
        # NB: the reference (and HF 4.26) slow path never adds the bias
        slices = w.shape[0] / pretraining_tp
        out = jnp.zeros(h.shape, x.dtype)
        for i in range(pretraining_tp):
            lo, hi = int(i * slices), int((i + 1) * slices)
            out = out + jnp.matmul(x[:, :, lo:hi], w[lo:hi].astype(x.dtype))
        x = out
    else:
        x = linear(x, w, mlp_params["dense_4h_to_h"]["b"])
    return residual + x


def _bloom_block(block_params, layer_kv, h, config, alibi_bias, bool_mask,
                 cache_len, pad_mask=None, head_mask=None, mask_additive=None,
                 segments=None):
    eps = config.layer_norm_epsilon
    ln_out = layer_norm(h, block_params["input_layernorm"]["w"],
                        block_params["input_layernorm"]["b"], eps)
    residual = ln_out if config.apply_residual_connection_post_layernorm else h
    attn_out, kv = _bloom_attention(
        block_params["self_attention"], ln_out, residual, alibi_bias, bool_mask,
        layer_kv, cache_len, config.n_head,
        use_flash=getattr(config, "use_flash_attention", False),
        pad_mask=pad_mask, head_mask=head_mask,
        use_ring=getattr(config, "use_ring_attention", False),
        mask_additive=mask_additive, segments=segments)
    ln_out2 = layer_norm(attn_out, block_params["post_attention_layernorm"]["w"],
                         block_params["post_attention_layernorm"]["b"], eps)
    residual = ln_out2 if config.apply_residual_connection_post_layernorm else attn_out
    out = _bloom_mlp(block_params["mlp"], ln_out2, residual,
                     getattr(config, "pretraining_tp", 1),
                     getattr(config, "slow_but_exact", False))
    return out, kv


def bloom_forward(params, config, input_ids, attention_mask=None, position_ids=None,
                  segment_ids=None, cache=None, head_mask=None, remat=False,
                  embed_noise=None):
    """BloomModel.forward (modeling_bloom.py:187-205). position_ids are
    accepted for engine-protocol uniformity and ignored (Bloom is
    position-embedding-free). ``segment_ids`` (B, S) int, 0 = pad: PACKED-
    SEQUENCE training — block-diagonal-causal attention and per-segment
    ALiBi position restart (trainer/data.packed_collate); cache-less only.
    ``embed_noise``: optional (B, S, D) additive noise on the
    word-embedding output, before the embedding LayerNorm (the NEFTune hook
    point, reference trainer.py:867-898). Returns (hidden, new_cache)."""
    del position_ids
    B, S = input_ids.shape
    packed = segment_ids is not None
    if packed:
        if cache is not None:
            raise ValueError("segment_ids (packed sequences) are a "
                             "cache-less training feature")
        if getattr(config, "use_ring_attention", False):
            raise ValueError("packed sequences are unsupported with ring "
                             "attention (no segment refs in the ring op)")
        seg = segment_ids.astype(jnp.int32)
        if attention_mask is None:
            attention_mask = (seg != 0).astype(jnp.int32)
    if attention_mask is None:
        attention_mask = jnp.ones((B, S), jnp.int32)
    cache_len = cache["length"] if cache is not None else jnp.zeros((), jnp.int32)
    if cache is not None:
        from cleantransformer_tpu.models.gpt import _cache_T
        T = _cache_T(cache["k"])
        if attention_mask.shape[1] < T:
            # the fused cache capacity is tile-padded past the engine's mask
            # buffer; zero-pad = masked, so padded key slots stay excluded
            attention_mask = jnp.pad(
                attention_mask, ((0, 0), (0, T - attention_mask.shape[1])))
    else:
        T = S

    h = embed_lookup(params["word_embeddings"], input_ids).astype(config.compute_dtype)
    if embed_noise is not None:
        h = h + embed_noise.astype(h.dtype)
    h = layer_norm(h, params["word_embeddings_layernorm"]["w"],
                   params["word_embeddings_layernorm"]["b"], config.layer_norm_epsilon)
    h = shard_hint(h, ("data", None, None))

    if packed:
        # ALiBi key positions restart per packed example (segments are
        # contiguous runs): position = index - segment start, zero on pads —
        # exactly what build_alibi_bias' mask-cumsum gives a lone example
        idx = jnp.broadcast_to(jnp.arange(S, dtype=jnp.int32)[None], (B, S))
        new_seg = jnp.concatenate(
            [jnp.ones((B, 1), bool), seg[:, 1:] != seg[:, :-1]], axis=1)
        seg_start = jax.lax.cummax(jnp.where(new_seg, idx, 0), axis=1)
        positions = ((idx - seg_start) * (seg != 0)).astype(jnp.float32)
        alibi_bias = (alibi_slopes(config.n_head)[None, :, None, None]
                      * positions[:, None, None, :]).astype(jnp.float32)
    else:
        alibi_bias = build_alibi_bias(attention_mask, config.n_head)  # (B, H, 1, T)

    # bool mask (True = masked): padding OR not-causal (modeling_bloom.py:176-185).
    # Only the dense path consumes it — flash/ring fold padding into a per-key
    # bias, so skip the O(S*T) materialization there (long-context ring would
    # otherwise defeat its own memory scaling).
    dense_path = not (S > 1 and (
        getattr(config, "use_flash_attention", False)
        or (getattr(config, "use_ring_attention", False) and cache is None)))
    mask_additive = None
    if dense_path:
        row = jax.lax.broadcasted_iota(jnp.int32, (S, T), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (S, T), 1)
        if jnp.ndim(cache_len) == 1:  # per-row offsets (serving)
            not_causal = (col[None] > (cache_len[:, None, None] + row[None]))[:, None]
        else:
            not_causal = (col > (cache_len + row))[None, None]
        pad = (attention_mask == 0)[:, None, None, :]
        bool_mask = pad | not_causal
        if packed:
            # block-diagonal: no token attends another segment
            bool_mask = bool_mask | (seg[:, :, None]
                                     != seg[:, None, :])[:, None]
        if cache is not None:
            # decode / cached-window fast path (single-token steps AND
            # multi-token serving chunks / speculative verify windows): one
            # fp32 additive bias per step instead of a per-layer
            # where-replace (see _bloom_attention)
            mask_additive = jnp.where(bool_mask, jnp.finfo(jnp.float32).min,
                                      0.0)
            bool_mask = None
    else:
        bool_mask = None

    pad_mask = attention_mask != 0  # (B, T) True = attendable, for flash bias

    if cache is None:
        def run_block(h_in, block_params):
            out, _ = _bloom_block(block_params, None, h_in, config, alibi_bias,
                                  bool_mask, cache_len, pad_mask, head_mask,
                                  segments=seg if packed else None)
            return out
        if remat:
            # per-layer rematerialization: the scan stores only each block's
            # input instead of all its intermediates (activation checkpointing
            # — the ZeRO/gradient-checkpointing analogue, SURVEY §2.3).
            # remat="attn" saves the flash kernel's out+lse residuals so the
            # backward never re-runs the forward attention kernel (the most
            # expensive recompute; ~16MB/layer extra memory at b8 s1024).
            # remat="dots" additionally saves matmul outputs (XLA recomputes
            # only cheap elementwise ops in the backward pass — less recompute
            # FLOPs for slightly more activation memory than full remat).
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

        def body(carry, block_params):
            return run_block(carry, block_params), None
        h, _ = jax.lax.scan(body, h, params["blocks"])
        new_cache = None
    else:
        kbuf = cache["k"]
        from cleantransformer_tpu.models.gpt import (_is_fused_cache,
                                                     fused_cache_append)
        fused_layout = _is_fused_cache(kbuf)
        _whole = False
        if fused_layout:
            from cleantransformer_tpu.ops.fused_decode import fits_vmem
            _D = h.shape[-1]
            cbytes = 1 if isinstance(kbuf, dict) else kbuf.dtype.itemsize
            # whole-layer blocks in VMEM, or key-block streaming (long ctx)
            _whole = fits_vmem(B, T, _D, 4 * _D, config.n_head,
                               cache_bytes=cbytes,
                               kv_int8=isinstance(kbuf, dict))
        if (fused_layout and S == 1 and head_mask is None
                and "qkv_fused" in params
                and not config.apply_residual_connection_post_layernorm):
            # whole-stack fused decode: ONE Pallas program per token
            # (ops/fused_decode.py; see models/gpt.py for the GPT twin).
            # ALiBi is (batch, key, head)-separable, so it rides the same
            # additive bias operands as padding+causality: (B, T, H) over
            # cache keys plus a (B, H) row for the merged current column
            # (its ALiBi value is the ramp at key position cache_len).
            from cleantransformer_tpu.ops.fused_decode import fused_decode_step
            from cleantransformer_tpu.ops.pallas_kernels import should_interpret
            D = h.shape[-1]
            Hh = config.n_head
            hd = D // Hh
            ab = alibi_bias[:, :, 0, :]                          # (B, H, T)
            ab = jnp.broadcast_to(ab, (B, Hh, T))
            # mask_additive allows col == cache_len (the XLA path writes the
            # current token into the cache BEFORE scoring); the kernel keeps
            # it as the merged extra column instead, so the in-cache slot —
            # still zeros — must be strictly masked here
            col = jax.lax.broadcasted_iota(jnp.int32, (1, T), 1)
            if jnp.ndim(cache_len) == 1:  # ragged serving offsets
                strict = jnp.where(col == cache_len[:, None],
                                   jnp.finfo(jnp.float32).min, 0.0)  # (B, T)
                bias_cur = jnp.take_along_axis(
                    ab, jnp.minimum(cache_len, T - 1)[:, None, None],
                    axis=2)[:, :, 0]                             # (B, H)
            else:
                strict = jnp.where(col == cache_len,
                                   jnp.finfo(jnp.float32).min, 0.0)  # (1, T)
                bias_cur = jax.lax.dynamic_slice_in_dim(
                    ab, cache_len, 1, axis=2)[:, :, 0]           # (B, H)
            # T-minor (B, H, T) bias when the capacity is 128-aligned and
            # the step streams (blocked kernel): the transposed (B, T, H)
            # plane pays ~8x HBM lane padding per streamed key block. The
            # whole-block kernel keeps the legacy orientation.
            bias_t_minor = not _whole and T % 128 == 0
            if bias_t_minor:
                bias = (mask_additive[:, 0, 0, None, :]
                        + jnp.broadcast_to(strict, (B, T))[:, None, :]
                        + ab)                                    # (B, H, T)
            else:
                bias = (mask_additive[:, 0, 0, :, None]
                        + jnp.broadcast_to(strict, (B, T))[:, :, None]
                        + jnp.transpose(ab, (0, 2, 1)))          # (B, T, H)
            blocks = params["blocks"]
            stack = {
                "ln1w": blocks["input_layernorm"]["w"],
                "ln1b": blocks["input_layernorm"]["b"],
                "wqkv": params["qkv_fused"]["w"],
                "bqkv": params["qkv_fused"]["b"],
                "wproj": blocks["self_attention"]["dense"]["w"],
                "bproj": blocks["self_attention"]["dense"]["b"],
                "ln2w": blocks["post_attention_layernorm"]["w"],
                "ln2b": blocks["post_attention_layernorm"]["b"],
                "wfc": blocks["mlp"]["dense_h_to_4h"]["w"],
                "bfc": blocks["mlp"]["dense_h_to_4h"]["b"],
                "wfc2": blocks["mlp"]["dense_4h_to_h"]["w"],
                "bfc2": blocks["mlp"]["dense_4h_to_h"]["b"],
            }
            from cleantransformer_tpu.ops.fused_decode import (
                fused_decode_blocked, table_bytes)
            if _whole:
                y, nk, nv = fused_decode_step(
                    stack, h[:, 0, :], bias.astype(jnp.float32),
                    bias_cur.astype(jnp.float32), kbuf, cache["v"],
                    n_head=Hh, eps=config.layer_norm_epsilon,
                    act="bloom_gelu", scale=1.0 / math.sqrt(hd), pre_ln=True,
                    cache_len=None if jnp.ndim(cache_len) == 1 else cache_len,
                    park_bytes=table_bytes(
                        params.get("lm_head", params["word_embeddings"])),
                    interpret=should_interpret())
            else:
                # long context: stream the cache in key blocks with online-
                # softmax partials (see models/gpt.py for the GPT twin)
                y, nk, nv = fused_decode_blocked(
                    stack, h[:, 0, :], bias.astype(jnp.float32),
                    bias_cur.astype(jnp.float32), kbuf, cache["v"],
                    n_head=Hh, eps=config.layer_norm_epsilon,
                    act="bloom_gelu", scale=1.0 / math.sqrt(hd), pre_ln=True,
                    key_block=getattr(config, "decode_key_block", 512),
                    bias_t_minor=bias_t_minor, interpret=should_interpret())
            if isinstance(nk, dict) or jnp.ndim(nk) == 4:
                new_k, new_v = nk, nv  # in-place: the updated cache buffers
            else:
                new_k = fused_cache_append(kbuf, nk, cache_len, Hh)
                new_v = fused_cache_append(cache["v"], nv, cache_len, Hh)
            h = y[:, None, :]
            new_cache = {"k": new_k, "v": new_v, "length": cache_len + 1}
            h = layer_norm(h, params["ln_f"]["w"], params["ln_f"]["b"],
                           config.layer_norm_epsilon)
            return h, new_cache

        _wmax = getattr(config, "fused_decode_max_window", 12)
        if (_is_fused_cache(kbuf) and 2 <= S <= _wmax and head_mask is None
                and "qkv_fused" in params
                and not config.apply_residual_connection_post_layernorm):
            # multi-token decode WINDOW (speculative verify / catch-up,
            # short serving chunks) — see models/gpt.py for the GPT twin and
            # ops/fused_decode._gpt_window_kernel for the kernel contract.
            # The key bias carries padding + the ALiBi ramp over the WHOLE
            # buffer (window columns included — ALiBi is key-position-only,
            # modeling_bloom.py:309-331, so one (B, T, H) plane serves every
            # query); the kernel owns causality.
            from cleantransformer_tpu.ops.fused_decode import (
                fused_decode_blocked_window, fused_decode_window,
                table_bytes, window_fits_vmem)
            from cleantransformer_tpu.ops.pallas_kernels import should_interpret
            D = h.shape[-1]
            Hh = config.n_head
            hd = D // Hh
            cbytes = 1 if isinstance(kbuf, dict) else kbuf.dtype.itemsize
            ab = jnp.broadcast_to(alibi_bias[:, :, 0, :], (B, Hh, T))
            pad_bt = jnp.where(attention_mask != 0, 0.0,
                               jnp.finfo(jnp.float32).min)         # (B, T)
            blocks = params["blocks"]
            stack = {
                "ln1w": blocks["input_layernorm"]["w"],
                "ln1b": blocks["input_layernorm"]["b"],
                "wqkv": params["qkv_fused"]["w"],
                "bqkv": params["qkv_fused"]["b"],
                "wproj": blocks["self_attention"]["dense"]["w"],
                "bproj": blocks["self_attention"]["dense"]["b"],
                "ln2w": blocks["post_attention_layernorm"]["w"],
                "ln2b": blocks["post_attention_layernorm"]["b"],
                "wfc": blocks["mlp"]["dense_h_to_4h"]["w"],
                "bfc": blocks["mlp"]["dense_h_to_4h"]["b"],
                "wfc2": blocks["mlp"]["dense_4h_to_h"]["w"],
                "bfc2": blocks["mlp"]["dense_4h_to_h"]["b"],
            }
            if window_fits_vmem(S, B, T, D, 4 * D, Hh, cache_bytes=cbytes,
                                kv_int8=isinstance(kbuf, dict)):
                bias = (pad_bt[:, :, None]
                        + jnp.transpose(ab, (0, 2, 1))).astype(jnp.float32)
                y, nk, nv = fused_decode_window(
                    stack, jnp.swapaxes(h, 0, 1), bias, cache_len, kbuf,
                    cache["v"], n_head=Hh, eps=config.layer_norm_epsilon,
                    act="bloom_gelu", scale=1.0 / math.sqrt(hd), pre_ln=True,
                    park_bytes=table_bytes(
                        params.get("lm_head", params["word_embeddings"])),
                    interpret=should_interpret())
            else:
                # LONG-CONTEXT window: stream the cache in key blocks (see
                # ops/fused_decode._gpt_blocked_window_kernel). The stream
                # bias strictly masks col >= cache_len (committed keys
                # only); the window's own columns ride the epilogue merge
                # with their ALiBi ramp values at cache_len + s as bias_cur.
                col = jax.lax.broadcasted_iota(jnp.int32, (1, T), 1)
                if jnp.ndim(cache_len) == 1:  # ragged serving offsets
                    strict = jnp.where(col < cache_len[:, None], 0.0,
                                       jnp.finfo(jnp.float32).min)  # (B, T)
                else:
                    strict = jnp.where(col < cache_len, 0.0,
                                       jnp.finfo(jnp.float32).min)  # (1, T)
                bias = (pad_bt[:, :, None]
                        + jnp.broadcast_to(strict, (B, T))[:, :, None]
                        + jnp.transpose(ab, (0, 2, 1))).astype(jnp.float32)
                cl_rows = jnp.broadcast_to(
                    jnp.reshape(cache_len, (-1,)), (B,)).astype(jnp.int32)
                idx = jnp.minimum(cl_rows[None, :] + jnp.arange(S)[:, None],
                                  T - 1)                           # (S, B)
                bias_cur = jnp.take_along_axis(
                    jnp.broadcast_to(ab[None], (S, B, Hh, T)),
                    idx[:, :, None, None], axis=3)[..., 0]         # (S, B, H)
                y, nk, nv = fused_decode_blocked_window(
                    stack, jnp.swapaxes(h, 0, 1), bias,
                    bias_cur.astype(jnp.float32), kbuf, cache["v"],
                    n_head=Hh, eps=config.layer_norm_epsilon,
                    act="bloom_gelu", scale=1.0 / math.sqrt(hd), pre_ln=True,
                    key_block=getattr(config, "decode_key_block", 512),
                    interpret=should_interpret())
            new_k = fused_cache_append(kbuf, nk, cache_len, Hh)
            new_v = fused_cache_append(cache["v"], nv, cache_len, Hh)
            h = jnp.swapaxes(y, 0, 1)                            # (B, S, D)
            new_cache = {"k": new_k, "v": new_v,
                         "length": cache_len + S}
            h = layer_norm(h, params["ln_f"]["w"], params["ln_f"]["b"],
                           config.layer_norm_epsilon)
            return h, new_cache

        def body(carry, block_params):
            h_in, k_cache, v_cache, li = carry
            out, (nk, nv) = _bloom_block(block_params, (k_cache, v_cache, li),
                                         h_in, config, alibi_bias, bool_mask,
                                         cache_len, pad_mask, head_mask,
                                         mask_additive=mask_additive)
            return (out, nk, nv, li + 1), None
        (h, new_k, new_v, _), _ = jax.lax.scan(
            body, (h, cache["k"], cache["v"], jnp.zeros((), jnp.int32)),
            params["blocks"],
            unroll=getattr(config, "decode_unroll", 1))
        new_cache = {"k": new_k, "v": new_v, "length": cache_len + S}

    h = layer_norm(h, params["ln_f"]["w"], params["ln_f"]["b"], config.layer_norm_epsilon)
    return h, new_cache


def bloom_lm_forward(params, config, input_ids, attention_mask=None,
                     position_ids=None, segment_ids=None, cache=None, labels=None,
                     loss_mask=None, last_only=False, head_mask=None, remat=False,
                     embed_noise=None):
    """BloomForCausalLM.forward (modeling_bloom.py:218-232): returns
    ((loss?, logits, hidden), cache) like the reference tuple convention —
    here as ((logits, hidden), cache), or ((loss, logits, hidden), cache)
    when labels are given (shift-by-1 CE, modeling_bloom.py:223-231)."""
    h, new_cache = bloom_forward(params, config, input_ids, attention_mask,
                                 position_ids, segment_ids, cache, head_mask,
                                 remat=remat, embed_noise=embed_noise)
    lm_head = params.get("lm_head", params["word_embeddings"])
    if labels is not None and getattr(config, "fused_ce", False):
        # training fast path: chunked lm_head+CE never materializes the
        # (B, S, vocab) logits (ops/fused_ce.py) — fp32-rounding-equal to the
        # dense loss below, so parity suites keep the dense default
        from cleantransformer_tpu.ops.fused_ce import fused_shift_ce
        loss = fused_shift_ce(h, lm_head, labels, mask=loss_mask,
                              chunk_tokens=getattr(config, "fused_ce_chunk",
                                                   2048))
        return (loss, None, h), new_cache
    h_for_logits = h[:, -1:] if last_only else h
    logits = lm_head_matmul(h_for_logits, lm_head)
    if labels is not None:
        loss = shift_cross_entropy_loss(logits.astype(jnp.float32), labels,
                                        mask=loss_mask)
        return (loss, logits, h), new_cache
    return (logits, h), new_cache


class BloomModel:
    """API-compatible wrapper (reference BloomModel, modeling_bloom.py:162-205)."""

    def __init__(self, config, params=None, rng=None):
        self.config = config
        self.params = params if params is not None else init_bloom_params(
            config, rng if rng is not None else jax.random.PRNGKey(0))

    def __call__(self, input_ids, attention_mask=None, head_mask=None, k_v_pasts=None):
        return bloom_forward(self.params, self.config, input_ids, attention_mask,
                             cache=k_v_pasts, head_mask=head_mask)


class BloomForCausalLM:
    """API-compatible wrapper (reference BloomForCausalLM, modeling_bloom.py:208-232)."""

    def __init__(self, config, params=None, rng=None):
        self.config = config
        self.params = params if params is not None else init_bloom_params(
            config, rng if rng is not None else jax.random.PRNGKey(0))
        self._forward = bloom_lm_forward
        from cleantransformer_tpu.generation.engine import bind_generation
        bind_generation(self)

    cache_factory = staticmethod(init_bloom_cache)  # see models/gpt.py
    cache_factory_dense = staticmethod(init_bloom_cache_dense)

    def _tie_weight(self):
        """Tie lm_head to the word embeddings (modeling_bloom.py:215-216):
        dropping the separate leaf makes them ONE trainable parameter."""
        self.params.pop("lm_head", None)

    def init_cache(self, batch_size, max_len, dtype=None):
        return init_bloom_cache(self.config, batch_size, max_len, dtype)

    def forward_fn(self):
        return self._forward

    def __call__(self, input_ids, attention_mask=None, head_mask=None,
                 k_v_pasts=None, labels=None, **kwargs):
        return bloom_lm_forward(self.params, self.config, input_ids,
                                attention_mask, cache=k_v_pasts, labels=labels,
                                head_mask=head_mask)
