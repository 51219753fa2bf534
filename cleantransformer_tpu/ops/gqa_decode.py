"""Blocked GQA decode attention over int8 head-major KV slabs.

Long-context llama-family decode is cache-stream-bound: at ctx4k b8 the XLA
head-major path already runs at ~99% of the HBM roofline for a bf16 cache
(measured: 4.20 ms/step vs 4.15 roofline — BENCH_DETAILS.md), so the only
lever left is SMALLER cache bytes. int8 KV through XLA loses the saving to
materialized int8->bf16 convert buffers (the dot can't fuse a convert into
its operand stream, so the effective traffic is ~2.5x the int8 bytes); this
kernel streams the int8 slab exactly once, dequantizing on the VMEM side.

The fp32 dequant scales live T-MINOR ("sT": (L, B, Hkv, T)) — round-5
reprofile: the original (L, B, T, Hkv) planes put Hkv=4 on the 128-wide
lane axis, so their (8, 128)-tiled HBM image was ~32x padding and the
"half the cache bytes" int8 stream actually moved the int8 payload PLUS
scale tiles worth ~the whole saving (kernel matched, never beat, the bf16
XLA path at ctx4k/8k). T-minor tiles pad only the 4-sublane dim (2x), so
the scale stream is ~6% of the payload. The block's LAST dim is then the
streamed key axis, which Mosaic only accepts when TK % 128 == 0 or
TK == T — init_llama_cache rounds int8-hm capacity to 128/512 tiles and
_aligned_key_block picks a 128-multiple block (whole-axis fallback for
small unaligned slabs).

One pallas_call per LAYER (inside the decode scan), grid (TB,) over
``key_block``-row cache blocks. The whole stacked (L, B, T, Dkv) cache is
the operand and the LAYER is picked by a scalar-prefetch index in the block
index_map — slicing the layer out in XLA first would materialize a copy of
the slab and triple the traffic. A whole-stack kernel (the GPT design,
ops/fused_decode.py) is impossible for this family: a tinyllama layer is
88 MB of bf16 weights, which cannot double-buffer in 128 MB of VMEM.

Per block, per batch row b (static loop — rank-3 refs indexed on leading
dims, 2D MXU dots in the FLASH orientation: keys on lanes):

    scores (H, TK) = q_tilde_b @ K_block_b^T           # NT: minors contract
    scores *= E @ k_scales_b^T                         # (H,Hkv)x(TK,Hkv) NT
    online-softmax over lanes; AV (H, Dkv) = probs @ V_block_b

q_tilde is the block-diagonal query expansion of models/llama.py
_gqa_attend_headmajor (q-head h lives in its kv group's hd lanes of row h),
built in XLA — it is (B, H, Dkv), tiny. The kernel returns the ONLINE
PARTIALS (m, den, acc) over the cache columns; the caller merges the
current token's column (quantize-roundtripped to match the later cache
write), normalizes, and extracts the block diagonal — all small-tensor XLA
work.

Causality/padding ride the (B, T) additive bias plane (strict
col < cache_len — the current token is the caller's merged column), clamped
to -1e30 so exp underflows masked columns to exactly 0. 2-D on purpose: a
(B, T, 1) plane tiles its size-1 minor to 128 lanes, so streaming it cost
as many HBM bytes as the padded scale planes did (~50% of the int8
payload); (B, T) is dense and the kernel reads each row as a static
(1, TK) sublane slice — no transpose dot needed.

Numerics mirror the XLA int8 decode path (models/llama.py _gqa_attend):
bf16 dot operands (int8 values are exact in bf16), fp32 accumulation and
scale folding, probs cast to bf16 before AV. Online block rescaling
reorders the summations, so parity is float-tolerance, not bit-level
(same contract as ops/fused_decode._gpt_blocked_kernel).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def _aligned_key_block(T, target):
    """Largest 128-MULTIPLE divisor of T <= max(target, 128). The scale
    blocks stream the key axis on LANES, where Mosaic requires
    TK % 128 == 0 or TK == T; falls back to the whole axis for slabs whose
    capacity isn't 128-aligned (tiny test caches — init_llama_cache rounds
    real ones to 128/512 tiles, so the fallback block always fits VMEM)."""
    if T % 128:
        return T
    TK = max(min((target // 128) * 128, T), 128)
    while T % TK:
        TK -= 128
    return TK


def _gqa_blocked_kernel(scal_ref, qt_ref, kq_ref, ks_ref, vq_ref, vs_ref,
                        bias_ref, m_out, den_out, acc_out,
                        m_scr, den_scr, acc_scr, *, B, H, Hkv, TB, scale,
                        kv_int8):
    # FLASH ORIENTATION (round-5 reprofile): every score/probability tensor
    # carries the key dimension TK on the 128-wide LANES and the H=32 query
    # heads on sublanes. The first version put H on lanes ((TK, H) scores
    # via (TK,Dkv)@(Dkv,H) per-row dots): 25% lane utilization on all VPU
    # softmax math and N=32 MXU dots padded 4x — profiled at 202 us per
    # layer call vs an 89 us cache-stream roofline (compute-bound). Here
    # scores are the standard flash q@k^T NT contraction (both minors
    # contract — Mosaic lowers it natively), the int8 scale expansion rides
    # an NT dot against the constant (H, Hkv) group expander instead of a
    # transpose, AV is a full-width (H,TK)@(TK,Dkv) NN dot, and the online
    # rescale broadcasts an (H, 1) column over lanes (the old layout needed
    # an hmT matmul just to expand it).
    tb = pl.program_id(0)
    cdt = qt_ref.dtype

    @pl.when(tb == 0)
    def _init():
        m_scr[:] = jnp.full((B, H, 1), -1e30, jnp.float32)
        den_scr[:] = jnp.zeros((B, H, 1), jnp.float32)
        acc_scr[:] = jnp.zeros(acc_scr.shape, jnp.float32)

    g = H // Hkv
    if kv_int8:
        # (H, Hkv) head-expansion: row h reads kv head h // g's scale
        expand = (jax.lax.broadcasted_iota(jnp.int32, (H, Hkv), 0) // g
                  == jax.lax.broadcasted_iota(jnp.int32, (H, Hkv), 1)
                  ).astype(jnp.float32)
    nt = (((1,), (1,)), ((), ()))                  # contract both minors
    kb = kq_ref[0].astype(cdt)                     # (B, TK, Dkv)
    vb = vq_ref[0].astype(cdt)
    for b in range(B):
        s_b = jax.lax.dot_general(qt_ref[b], kb[b], nt,
                                  preferred_element_type=jnp.float32)
        if kv_int8:
            # (H, TK) scale plane: the T-minor block is already keys-on-
            # lanes, so the group expansion is a plain NN dot
            s_b = s_b * jax.lax.dot_general(
                expand, ks_ref[0, b], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        # dense (B, TK) bias block: row b as a static leading 2-D slice
        s_b = s_b * scale + bias_ref[b:b + 1, :]   # (1, TK) broadcasts
        m_old = m_scr[b]                           # (H, 1)
        m_new = jnp.maximum(m_old, jnp.max(s_b, axis=1, keepdims=True))
        r = jnp.exp(m_old - m_new)
        p = jnp.exp(s_b - m_new)                   # (H, TK) fp32
        den_scr[b] = den_scr[b] * r + jnp.sum(p, axis=1, keepdims=True)
        if kv_int8:
            p = p * jax.lax.dot_general(expand, vs_ref[0, b],
                                        (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
        av = jnp.dot(p.astype(cdt), vb[b],
                     preferred_element_type=jnp.float32)
        m_scr[b] = m_new
        acc_scr[b] = acc_scr[b] * r + av           # (H, Dkv)

    @pl.when(tb == TB - 1)
    def _fin():
        m_out[:] = m_scr[:]
        den_out[:] = den_scr[:]
        acc_out[:] = acc_scr[:]


@functools.partial(jax.jit, static_argnames=("kv_heads", "scale",
                                             "key_block", "interpret"))
def gqa_blocked_partials(q_tilde, kq, ks, vq, vs, bias, li, *, kv_heads,
                         scale, key_block=1024, interpret=False):
    """Online-softmax partials of layer ``li``'s cache attention.

    q_tilde: (B, H, Dkv) block-diagonal queries (compute dtype) — q-head
      h's vector lives in its kv group's hd lanes of row h, zeros elsewhere.
    kq/vq: (L, B, T, Dkv) int8 (or float for a bf16 slab) — the FULL stacked
      cache; the layer is picked by the scalar-prefetched ``li`` in the
      block index maps so no layer slice is ever materialized.
    ks/vs: (L, B, kv_heads, T) fp32 T-MINOR dequant scales ("sT" — see the
      module docstring for why), or None for a float slab.
    bias: (B, T) fp32 additive (strict causality + padding), >= -1e30 —
      2-D so the HBM image is dense (see the module docstring).
    Returns (m (B, H, 1), den (B, H, 1), acc (B, H, Dkv)) fp32 partials.
    """
    L, B, T, Dkv = kq.shape
    H = q_tilde.shape[1]
    kv_int8 = ks is not None
    Hkv = kv_heads
    # past ~4.6k keys, halve the streaming block: XLA parks the int8
    # embed/lm_head tables in VMEM around this call inside the decode loop,
    # and 1024-row double-buffered blocks pushed the ctx8k b8 program ~1 MB
    # over the scoped-vmem budget at compile time. The extra grid steps
    # cost ~2 us each (~+0.35 ms/step at ctx8k x22 layers) — losing the
    # table parking would cost more. ctx4k (T=4608 after the 512-tile
    # rounding, TK=512) fits as-is and keeps the larger block.
    TK = _aligned_key_block(T, min(key_block, 512) if T > 4608 else key_block)
    TB = T // TK
    if not kv_int8:
        ks = vs = jnp.ones((L, 1, 1, 1), jnp.float32)

    def fixed(shape):
        return pl.BlockSpec(shape, lambda tb, s: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    def per_kblock(last):
        return pl.BlockSpec((1, B, TK, last),
                            lambda tb, s: (s[0], 0, tb, 0),
                            memory_space=pltpu.VMEM)

    if kv_int8:
        # T-minor scale blocks: (1, B, Hkv, TK) — Hkv equals the array dim
        # (sublanes), TK is 128-aligned or the whole axis (lanes)
        ks_spec = pl.BlockSpec((1, B, Hkv, TK),
                               lambda tb, s: (s[0], 0, 0, tb),
                               memory_space=pltpu.VMEM)
    else:
        ks_spec = pl.BlockSpec((1, 1, 1, 1), lambda tb, s: (0, 0, 0, 0),
                               memory_space=pltpu.VMEM)
    in_specs = [
        fixed((B, H, Dkv)),
        per_kblock(Dkv), ks_spec,
        per_kblock(Dkv), ks_spec,
        pl.BlockSpec((B, TK), lambda tb, s: (0, tb),
                     memory_space=pltpu.VMEM),
    ]
    out_specs = [fixed((B, H, 1)), fixed((B, H, 1)), fixed((B, H, Dkv))]
    out_shape = [jax.ShapeDtypeStruct((B, H, 1), jnp.float32),
                 jax.ShapeDtypeStruct((B, H, 1), jnp.float32),
                 jax.ShapeDtypeStruct((B, H, Dkv), jnp.float32)]

    kernel = functools.partial(
        _gqa_blocked_kernel, B=B, H=H, Hkv=Hkv, TB=TB, scale=scale,
        kv_int8=kv_int8)

    blk = (2 * B * TK * Dkv * kq.dtype.itemsize
           + (2 * B * TK * Hkv * 4 if kv_int8 else 0) + B * TK * 4)
    need = 2 * blk + 3 * B * Dkv * H * 4 + B * Dkv * H * q_tilde.dtype.itemsize
    # the 32 MiB floor is a RESERVATION, not waste: vmem_limit_bytes keeps
    # XLA's scheduler from parking its own values (int8 embed/lm_head
    # tables) into the space this call transits — shrinking the claim to
    # need*1.5 made the ctx4k program FAIL scoped-vmem accounting (XLA
    # parked more around the smaller claim), while 32 MiB compiled and
    # measured 527 tok/s. ctx8k additionally needs the TK=512 block shrink
    # above (it was ~1 MB over even at 32 MiB with 1024-row blocks).
    vmem_cap = min(max(int(need * 1.5), 32 * 1024 * 1024),
                   110 * 1024 * 1024)

    m, den, acc = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(TB,),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=[pltpu.VMEM((B, H, 1), jnp.float32),
                            pltpu.VMEM((B, H, 1), jnp.float32),
                            pltpu.VMEM((B, H, Dkv), jnp.float32)]),
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=vmem_cap),
        interpret=interpret,
    )(jnp.reshape(li, (1,)).astype(jnp.int32), q_tilde, kq, ks, vq, vs, bias)
    return m, den, acc
