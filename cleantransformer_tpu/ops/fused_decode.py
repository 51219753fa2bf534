"""Fused single-token decode: the WHOLE transformer stack as ONE Pallas
program per generated token.

Motivation (profiled, BENCH_DETAILS.md): XLA's b8 GPT-2 decode step runs
~125 small fusions at ~2 us fixed cost each — kernel-count overhead, not a
memory wall, keeps the step at ~0.63 ms when the weight stream alone prices
it at ~0.24 ms. This kernel replaces the per-layer op chain (LN, qkv matmul,
cache attention, proj, LN, MLP — reference call stack
CleanTransformer/models/modeling_gpt.py:125-152 executed once per layer per
token) with a single grid-(L,) pallas_call: layer l's weights and KV-cache
block stream HBM->VMEM (auto double-buffered by the grid pipeline) while
layer l-1 computes; the (B, D) residual stream lives in a VMEM scratch
across grid steps.

Attention trick — one MXU matmul for ALL (batch, head) pairs: the decode
cache keeps layer keys/values in a FUSED (L, T, B*D) layout (token-major,
batch-and-head packed into the 128-lane axis, fully tile-aligned at any
head_dim — the (B,H,T,hd) layout wastes half the lanes at hd=64 and forces
relayout copies). Scores for every (b, h) then come from a single
block-diagonal product:

    scores(T, B*H) = K_all(T, B*D) @ Qexp(B*D, B*H)

where Qexp[b*D + h*hd + d, b*H + h] = q[b, h*hd + d] and zero elsewhere
(the static mask is built once at grid step 0 into VMEM scratch). The AV
product is taken TRANSPOSED — out(B*D, B*H) = V_all^T-contract @ P — so the
per-(b,h) output extraction is a row-sum against the SAME static mask, no
in-kernel transposes. The current token's k/v (not yet in the cache — it is
written by the caller after the kernel) joins the softmax as one extra
merged column.

Numerics mirror the XLA decode fast path (models/gpt.py _gpt_block S==1):
bf16 operands into the MXU with fp32 accumulation, fp32 masked softmax with
the reference's -1e4 causal fill, LN statistics in fp32 with eps inside the
sqrt (reference transformer.py:79-89). Greedy outputs are token-identical
to the per-layer path (asserted in tests/test_fused_decode.py).
"""

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cleantransformer_tpu.ops.activations import ACT2FN


def _ln(x, w, b, eps, cdt):
    """Reference LayerNorm (eps inside sqrt; fp32 stats) on a (B, D) tile."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    cen = xf - mu
    std = jnp.mean(cen * cen + eps, axis=-1, keepdims=True) ** 0.5
    out = (cen / std).astype(cdt)
    return w[0, 0].astype(cdt) * out + b[0, 0].astype(cdt)


def _gpt_decode_kernel(x_ref, mexp_ref, ln1w, ln1b, wqkv, bqkv, wproj, bproj,
                       ln2w, ln2b, wfc, bfc, wfc2, bfc2, ck_ref, cv_ref,
                       y_ref, nk_ref, nv_ref, h_scr, qmask_scr,
                       *, B, H, D, hd, L, eps, act, scale, pre_ln):
    l = pl.program_id(0)
    cdt = x_ref.dtype
    BD, BH = B * D, B * H

    @pl.when(l == 0)
    def _init():
        h_scr[:] = x_ref[:]
        # static block-diagonal selector: row b*D + h*hd + d pairs with
        # column b*H + h
        r = jax.lax.broadcasted_iota(jnp.int32, (BD, BH), 0)
        c = jax.lax.broadcasted_iota(jnp.int32, (BD, BH), 1)
        keep = ((r // D) == (c // H)) & (((r % D) // hd) == (c % H))
        qmask_scr[:] = keep.astype(jnp.float32)

    def attn(x):
        # qkv projection (linear() semantics: matmul -> cdt, bias in cdt)
        qkv = jnp.dot(x, wqkv[0].astype(cdt),
                      preferred_element_type=jnp.float32).astype(cdt)
        qkv = qkv + bqkv[0, 0].astype(cdt)
        q, k_t, v_t = qkv[:, :D], qkv[:, D:2 * D], qkv[:, 2 * D:]
        nk_ref[0] = k_t
        nv_ref[0] = v_t

        qm = qmask_scr[:]
        qexp = (qm * q.reshape(BD, 1).astype(jnp.float32)).astype(cdt)
        s = jax.lax.dot_general(ck_ref[0], qexp, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = s * scale + mexp_ref[:]                            # (T, BH)
        s_cur = jax.lax.dot_general(
            k_t.reshape(1, BD), qexp, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * scale        # (1, BH)

        m = jnp.maximum(jnp.max(s, axis=0, keepdims=True), s_cur)
        p = jnp.exp(s - m)
        pc = jnp.exp(s_cur - m)
        denom = jnp.sum(p, axis=0, keepdims=True) + pc         # (1, BH)

        # transposed AV: (BD, BH) — extraction is a masked row-sum, the
        # only per-(b,h) data movement is the two (B,D)<->(BD,1) reshapes
        ofT = jax.lax.dot_general(cv_ref[0], p.astype(cdt),
                                  (((0,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        o_flat = jnp.sum(ofT * qm, axis=1, keepdims=True)      # (BD, 1)
        pc_exp = jnp.sum(qm * pc, axis=1, keepdims=True)
        den_exp = jnp.sum(qm * denom, axis=1, keepdims=True)
        a_flat = (o_flat + pc_exp * v_t.reshape(BD, 1).astype(jnp.float32))
        a = (a_flat / den_exp).reshape(B, D).astype(cdt)

        o = jnp.dot(a, wproj[0].astype(cdt),
                    preferred_element_type=jnp.float32).astype(cdt)
        return o + bproj[0, 0].astype(cdt)

    def mlp(x):
        u = jnp.dot(x, wfc[0].astype(cdt),
                    preferred_element_type=jnp.float32).astype(cdt)
        u = act(u + bfc[0, 0].astype(cdt))
        o = jnp.dot(u.astype(cdt), wfc2[0].astype(cdt),
                    preferred_element_type=jnp.float32).astype(cdt)
        return o + bfc2[0, 0].astype(cdt)

    h = h_scr[:]
    if pre_ln:  # gpt2/gpt3 (modeling_gpt.py:147-152)
        h = h + attn(_ln(h, ln1w, ln1b, eps, cdt))
        h = h + mlp(_ln(h, ln2w, ln2b, eps, cdt))
    else:       # gpt post-LN (modeling_gpt.py:141-146)
        h = _ln(h + attn(h), ln1w, ln1b, eps, cdt)
        h = _ln(h + mlp(h), ln2w, ln2b, eps, cdt)
    h_scr[:] = h
    y_ref[:] = h


@functools.partial(jax.jit, static_argnames=("config", "version", "interpret"))
def gpt_fused_decode(blocks, h0, mexp, cache_k, cache_v, *, config, version,
                     interpret=False):
    """One decode step over the whole stack.

    blocks: the stacked per-layer param tree (models/gpt.py init_gpt_params).
    h0: (B, D) embedded current token (wte + wpe [+ segment], compute dtype).
    mexp: (T, B*H) fp32 additive key mask — padding + strict causal
      (col < cache_len; the current token rides the merged extra column).
    cache_k/v: (L, T, B*D) fused-layout cache (init_kv_cache fused branch).

    Returns (y (B, D) final hidden pre-ln_f, new_k (L, B, D), new_v) — the
    caller writes new_k/new_v into the cache at row cache_len (one
    dynamic_update_slice each on the stacked buffer)."""
    L, T, BD = cache_k.shape
    B, D = h0.shape
    H = config.n_head
    hd = D // H

    def vec(p, X):  # (L, X) -> (L, 1, X): sublane-1 blocks ride as (1,1,X)
        return p.reshape(L, 1, X)

    attn_p, mlp_p = blocks["attn"], blocks["mlp"]
    operands = (
        h0, mexp,
        vec(blocks["ln_1"]["w"], D), vec(blocks["ln_1"]["b"], D),
        attn_p["c_attn"]["w"], vec(attn_p["c_attn"]["b"], 3 * D),
        attn_p["c_proj"]["w"], vec(attn_p["c_proj"]["b"], D),
        vec(blocks["ln_2"]["w"], D), vec(blocks["ln_2"]["b"], D),
        mlp_p["c_fc"]["w"], vec(mlp_p["c_fc"]["b"], 4 * D),
        mlp_p["c_proj"]["w"], vec(mlp_p["c_proj"]["b"], D),
        cache_k, cache_v,
    )

    def fixed(shape):
        return pl.BlockSpec(shape, lambda l: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    def per_layer(shape):
        return pl.BlockSpec((1,) + shape,
                            lambda l: (l,) + (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    in_specs = [
        fixed((B, D)), fixed((T, B * H)),
        per_layer((1, D)), per_layer((1, D)),
        per_layer((D, 3 * D)), per_layer((1, 3 * D)),
        per_layer((D, D)), per_layer((1, D)),
        per_layer((1, D)), per_layer((1, D)),
        per_layer((D, 4 * D)), per_layer((1, 4 * D)),
        per_layer((4 * D, D)), per_layer((1, D)),
        per_layer((T, BD)), per_layer((T, BD)),
    ]
    out_specs = [fixed((B, D)), per_layer((B, D)), per_layer((B, D))]
    out_shape = [jax.ShapeDtypeStruct((B, D), h0.dtype),
                 jax.ShapeDtypeStruct((L, B, D), cache_k.dtype),
                 jax.ShapeDtypeStruct((L, B, D), cache_v.dtype)]

    kernel = functools.partial(
        _gpt_decode_kernel, B=B, H=H, D=D, hd=hd, L=L,
        eps=config.layer_norm_epsilon, act=ACT2FN[config.afn],
        scale=1.0 / math.sqrt(hd), pre_ln=(version != "gpt"))

    y, nk, nv = pl.pallas_call(
        kernel,
        grid=(L,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((B, D), h0.dtype),
                        pltpu.VMEM((B * D, B * H), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*operands)
    return y, nk, nv
