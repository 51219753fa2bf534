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


def init_llama_cache(config, batch_size, max_len, dtype=None):
    """KV cache over ``num_key_value_heads`` (GQA: H/Hkv x smaller than a
    full-head cache). Same {'k','v','length'} layout as models/gpt.py, so
    the generic cache_write/cache_layer_kv helpers (incl. int8 mode) apply."""
    L, Hkv, hd = config.n_layer, config.num_key_value_heads, config.head_dim
    dtype = dtype or config.compute_dtype
    if getattr(config, "kv_cache_int8", False):
        def buf():
            return {"q": jnp.zeros((L, batch_size, Hkv, max_len, hd), jnp.int8),
                    "s": jnp.zeros((L, batch_size, Hkv, max_len), jnp.float32)}
        return {"k": buf(), "v": buf(), "length": jnp.zeros((), jnp.int32)}
    return {
        "k": jnp.zeros((L, batch_size, Hkv, max_len, hd), dtype),
        "v": jnp.zeros((L, batch_size, Hkv, max_len, hd), dtype),
        "length": jnp.zeros((), jnp.int32),
    }


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


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

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


def _llama_attention(attn_params, h, cos, sin, additive_mask, layer_kv,
                     cache_len, config, segments=None):
    B, S, D = h.shape
    H, Hkv, hd = (config.num_attention_heads, config.num_key_value_heads,
                  config.head_dim)
    p = attn_params
    q = linear(h, p["q_proj"]["w"], p["q_proj"].get("b"))
    k = linear(h, p["k_proj"]["w"], p["k_proj"].get("b"))
    v = linear(h, p["v_proj"]["w"], p["v_proj"].get("b"))
    q = q.reshape(B, S, H, hd).transpose(0, 2, 1, 3)
    k = k.reshape(B, S, Hkv, hd).transpose(0, 2, 1, 3)
    v = v.reshape(B, S, Hkv, hd).transpose(0, 2, 1, 3)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)
    k = shard_hint(k, ("data", "model", None, None))

    k_scale = v_scale = None
    if layer_kv is None:
        new_k, new_v = None, None
    else:
        from cleantransformer_tpu.models.gpt import cache_write, cache_layer_kv
        k_cache, v_cache, li = layer_kv
        new_k = cache_write(k_cache, li, k, cache_len)
        new_v = cache_write(v_cache, li, v, cache_len)
        T = (k_cache["q"] if isinstance(k_cache, dict) else k_cache).shape[3]
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
    else:
        kbuf = cache["k"]
        T = (kbuf["q"] if isinstance(kbuf, dict) else kbuf).shape[3]
        # fold causal (+ sliding window + padding) into ONE fp32 additive
        # bias shared by all layers (see models/gpt.py decode fast path);
        # for S>1 windows the flash kernel's q_offset iota covers causal
        use_flash_window = (flash_cfg and S > 1
                            and not getattr(config, "kv_cache_int8", False))
        if not use_flash_window:
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
