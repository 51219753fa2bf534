"""Pallas TPU kernels for the hot ops.

``flash_attention``: blockwise online-softmax attention — never materializes
the (seq, seq) score matrix the reference builds everywhere
(transformer.py:41-46, modeling_gpt.py:83-93, modeling_bloom.py:99-110).
Supports causal masking, an additive per-(batch,head) key bias (ALiBi +
padding folded together), and a scale factor. fp32 accumulation, bf16-friendly
tiles. The MXU sees (BLOCK_Q, head_dim) x (head_dim, BLOCK_K) tiles; the
online max/sum rescaling runs on the VPU.

This is the *fast path* (training + prefill): exact softmax, but with -inf
masking and a different accumulation order than the reference's dense
``w*b + -1e4*(1-b)`` path, so bit-parity mode keeps dense attention.
The backward pass is fused too: ``_flash_bwd_dq_kernel`` /
``_flash_bwd_dkv_kernel`` below, wired via ``defvjp`` — no dense
rematerialization anywhere.

``q_offset`` (dynamic int32, scalar or per-batch-row vector, carried as the
scalar-prefetch operand) shifts the causal iota: query i attends keys
<= q_offset + i. This makes the
kernel exact for multi-token forwards at nonzero cache offsets — speculative
decoding's verify/catch-up windows and chunked prefill — not just offset-0
prefill.

Also: ``fused_layer_norm`` — one-pass Welford-free LN kernel matching
ops/layers.layer_norm numerics (eps inside sqrt).
"""

import functools
import math

import jax
import jax.ad_checkpoint
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# 512 measured fastest on the v5-lite chip (256-blocks leave the kernel
# grid-overhead-bound: 2x the programs for the same FLOPs)
DEFAULT_BLOCK_Q = 512
DEFAULT_BLOCK_K = 512


def _flash_kernel(qoff_ref, *refs, scale, causal, segmented, block_k, seq_k,
                  window=None):
    """One (batch*head, q-block) program: loop key blocks with online softmax.
    Also emits the per-row logsumexp (for the backward kernels).

    ``qoff_ref`` is the scalar-prefetch operand: a flat (B*H,) int32 vector of
    per-(batch,head) query offsets (TPU tiling rejects a (1,1)-blocked SMEM
    array, so the offsets ride the PrefetchScalarGridSpec instead).

    MXU dots take the native (bf16) operands with fp32 accumulation
    (preferred_element_type) — upcasting operands to fp32 first would run
    the MXU at a fraction of its bf16 rate for zero accuracy gain (the
    inputs are bf16 to begin with). Softmax/rescaling stay fp32 on the VPU;
    the probabilities are cast to the value dtype for the AV dot (standard
    flash practice).

    ``segmented`` (static): two extra int32 refs carry per-query /
    per-key segment ids — scores where they differ are masked (packed-
    sequence block-diagonal attention, the splash-attention convention)."""
    if segmented:
        (q_ref, k_ref, v_ref, bias_ref, qseg_ref, kseg_ref,
         out_ref, lse_ref) = refs
    else:
        q_ref, k_ref, v_ref, bias_ref, out_ref, lse_ref = refs
    q = q_ref[0]  # (BQ, hd) native dtype

    block_q = q.shape[0]
    qi = pl.program_id(1)
    q_off = qoff_ref[pl.program_id(0)]
    num_kb = pl.cdiv(seq_k, block_k)
    kb_start = 0
    if causal:
        # only key blocks up to the causal frontier of this q block
        last_row = q_off + qi * block_q + block_q - 1
        num_kb_eff = jnp.minimum(num_kb, (last_row + block_k) // block_k)
        if window is not None:
            # sliding window (Mistral): skip key blocks wholly left of the
            # oldest in-window key of this q block's first row
            first_row = q_off + qi * block_q
            kb_start = jnp.maximum(0, (first_row - window + 1) // block_k)
    else:
        num_kb_eff = num_kb

    def body(kb, carry):
        acc, m, l = carry
        k_blk = k_ref[0, pl.ds(kb * block_k, block_k), :]
        v_blk = v_ref[0, pl.ds(kb * block_k, block_k), :]
        s = jax.lax.dot_general(q, k_blk, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if scale != 1.0:
            s = s * scale
        s = s + bias_ref[0, 0, pl.ds(kb * block_k, block_k)][None, :]
        if segmented:
            qs = qseg_ref[0, 0, :][:, None]                     # (BQ, 1)
            ks = kseg_ref[0, 0, pl.ds(kb * block_k, block_k)][None, :]
            s = jnp.where(qs == ks, s, -jnp.inf)
        if causal:
            row = q_off + qi * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0)
            col = kb * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1)
            keep = col <= row
            if window is not None:
                keep &= (row - col) < window
            s = jnp.where(keep, s, -jnp.inf)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        # guard fully-masked rows (m_new == -inf): exp(-inf - -inf) = nan
        safe_m = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
        p = jnp.exp(s - safe_m)
        p = jnp.where(jnp.isfinite(s), p, 0.0)
        corr = jnp.where(jnp.isfinite(m), jnp.exp(m - safe_m), 0.0)
        l_new = l * corr + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * corr + jax.lax.dot_general(
            p.astype(v_blk.dtype), v_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return acc_new, m_new, l_new

    head_dim = q.shape[-1]
    acc0 = jnp.zeros((block_q, head_dim), jnp.float32)
    m0 = jnp.full((block_q, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(kb_start, num_kb_eff, body, (acc0, m0, l0))
    out_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(out_ref.dtype)
    lse = jnp.where(l[:, 0] > 0, m[:, 0] + jnp.log(jnp.maximum(l[:, 0], 1e-30)),
                    -jnp.inf)
    lse_ref[0, 0, :] = lse


def _qoff_rows(q_offset, B, H):
    """Normalize q_offset (python int, scalar array, or (B,) vector) to a
    flat (B*H,) int32 vector — one scalar-prefetch entry per (batch, head)
    program."""
    qo = jnp.asarray(q_offset, jnp.int32)
    qo = jnp.broadcast_to(qo.reshape(-1, 1) if qo.ndim else qo, (B, H))
    return qo.reshape(B * H)


def _seg_flat(seg, B, H, S0, pad):
    """(B, S0) segment ids -> (B*H, 1, S_padded) int32 (bias layout); pads
    get -1, which matches no real segment."""
    s = jnp.broadcast_to(seg.astype(jnp.int32)[:, None, :], (B, H, S0))
    if pad:
        s = jnp.pad(s, ((0, 0), (0, 0), (0, pad)), constant_values=-1)
    return s.reshape(B * H, 1, S0 + pad)


def _flash_fwd_impl(q, k, v, bias, q_offset, scale, causal, block_q, block_k,
                    interpret, q_segments=None, k_segments=None, window=None):
    B, H, Sq0, hd = q.shape
    Sk0 = k.shape[2]
    block_q = min(block_q, Sq0)
    block_k = min(block_k, Sk0)
    # pad ragged seq lengths up to block multiples (key pads get -inf bias;
    # query pad rows are sliced off the output)
    pad_q = (-Sq0) % block_q
    pad_k = (-Sk0) % block_k
    bias = jnp.broadcast_to(bias, (B, H, Sk0))
    if pad_q:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad_q), (0, 0)))
    if pad_k:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad_k), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad_k), (0, 0)))
        bias = jnp.pad(bias, ((0, 0), (0, 0), (0, pad_k)),
                       constant_values=-jnp.inf)
    Sq, Sk = Sq0 + pad_q, Sk0 + pad_k
    qf = q.reshape(B * H, Sq, hd)
    kf = k.reshape(B * H, Sk, hd)
    vf = v.reshape(B * H, Sk, hd)
    # bias kept 3D: TPU tiling wants the block's trailing two dims to equal
    # the array's ((1, Sk) block on a (BH, Sk) array is rejected on hardware)
    bias_f = bias.reshape(B * H, 1, Sk)
    qoff = _qoff_rows(q_offset, B, H)

    segmented = q_segments is not None
    seg_ops, seg_specs = [], []
    if segmented:
        seg_ops = [_seg_flat(q_segments, B, H, Sq0, pad_q),
                   _seg_flat(k_segments, B, H, Sk0, pad_k)]
        seg_specs = [
            pl.BlockSpec((1, 1, block_q), lambda bh, qi, s: (bh, 0, qi)),
            pl.BlockSpec((1, 1, Sk), lambda bh, qi, s: (bh, 0, 0)),
        ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B * H, Sq // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, hd), lambda bh, qi, s: (bh, qi, 0)),
            pl.BlockSpec((1, Sk, hd), lambda bh, qi, s: (bh, 0, 0)),
            pl.BlockSpec((1, Sk, hd), lambda bh, qi, s: (bh, 0, 0)),
            pl.BlockSpec((1, 1, Sk), lambda bh, qi, s: (bh, 0, 0)),
        ] + seg_specs,
        out_specs=(
            pl.BlockSpec((1, block_q, hd), lambda bh, qi, s: (bh, qi, 0)),
            pl.BlockSpec((1, 1, block_q), lambda bh, qi, s: (bh, 0, qi)),
        ),
    )
    out, lse = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, causal=causal,
                          segmented=segmented, block_k=block_k, seq_k=Sk,
                          window=window),
        out_shape=(jax.ShapeDtypeStruct((B * H, Sq, hd), q.dtype),
                   jax.ShapeDtypeStruct((B * H, 1, Sq), jnp.float32)),
        grid_spec=grid_spec,
        interpret=interpret,
    )(qoff, qf, kf, vf, bias_f, *seg_ops)
    out = out.reshape(B, H, Sq, hd)
    if pad_q:
        out = out[:, :, :Sq0]
    return out, lse  # lse stays padded (B*H, 1, Sq_padded) for the backward


def _dense_reference(q, k, v, bias, scale, causal, q_offset=0, window=None):
    """Dense formulation of the same math (used by tests as the oracle)."""
    scores = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                        k.astype(jnp.float32))
    if scale != 1.0:
        scores = scores * scale
    scores = scores + bias[:, :, None, :].astype(jnp.float32)
    if causal:
        Sq, Sk = scores.shape[-2], scores.shape[-1]
        row = jax.lax.broadcasted_iota(jnp.int32, (Sq, Sk), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (Sq, Sk), 1)
        qo = jnp.asarray(q_offset, jnp.int32)
        if qo.ndim:  # per-row offsets
            qpos = qo[:, None, None] + row[None]                 # (B, Sq, Sk)
            keep = col[None] <= qpos
            if window is not None:
                keep &= (qpos - col[None]) < window
            keep = keep[:, None]
        else:
            qpos = qo + row
            keep = col <= qpos
            if window is not None:
                keep &= (qpos - col) < window
            keep = keep[None, None]
        scores = jnp.where(keep, scores, -jnp.inf)
    weights = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", weights, v.astype(jnp.float32)).astype(q.dtype)


def should_interpret():
    """Pallas interpret mode off-TPU (CPU tests / virtual meshes)."""
    return jax.default_backend() not in ("tpu", "axon")


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11, 12))
def flash_attention(q, k, v, bias, q_offset=0, q_segments=None,
                    k_segments=None, scale=1.0, causal=True,
                    block_q=DEFAULT_BLOCK_Q, block_k=DEFAULT_BLOCK_K,
                    interpret=False, window=None):
    """q: (B,H,Sq,hd); k,v: (B,H,Sk,hd); bias: (B,H,Sk) or (B,1,Sk) additive
    (ALiBi + padding, broadcast over queries). ``q_offset`` (dynamic int32
    scalar or (B,) vector): query i has absolute position q_offset + i, so
    causal attends keys <= q_offset + i (cache offset for speculative verify /
    chunked prefill). ``q_segments``/``k_segments`` (B, S) int32: packed-
    sequence block-diagonal masking — scores with differing segment ids are
    -inf (pass both or neither). ``window`` (static int, requires causal):
    sliding-window attention (Mistral, HF semantics row - col < window) —
    the key-block loop skips blocks wholly outside the window, so compute
    scales with window, not context. Returns (B,H,Sq,hd)."""
    out, _ = _flash_fwd_impl(q, k, v, bias, q_offset, scale, causal, block_q,
                             block_k, interpret, q_segments, k_segments,
                             window)
    return out


# ---------------------------------------------------------------------------
# flash backward kernels (standard two-pass: dq over q-blocks, dk/dv/dbias
# over k-blocks, using the saved per-row logsumexp)
# ---------------------------------------------------------------------------

def _flash_bwd_dq_kernel(qoff_ref, *refs, scale, causal, segmented, block_k,
                         seq_k, window=None):
    if segmented:
        (q_ref, k_ref, v_ref, bias_ref, qseg_ref, kseg_ref, do_ref,
         lse_ref, d_ref, dq_ref) = refs
    else:
        (q_ref, k_ref, v_ref, bias_ref, do_ref, lse_ref, d_ref,
         dq_ref) = refs
    q = q_ref[0]                               # native dtype (MXU bf16 rate)
    do = do_ref[0]
    lse = lse_ref[0, 0, :][:, None]            # (BQ, 1)
    D = d_ref[0, 0, :][:, None]                # (BQ, 1)
    block_q = q.shape[0]
    qi = pl.program_id(1)
    q_off = qoff_ref[pl.program_id(0)]
    num_kb = pl.cdiv(seq_k, block_k)
    kb_start = 0
    if causal:
        last_row = q_off + qi * block_q + block_q - 1
        num_kb_eff = jnp.minimum(num_kb, (last_row + block_k) // block_k)
        if window is not None:
            first_row = q_off + qi * block_q
            kb_start = jnp.maximum(0, (first_row - window + 1) // block_k)
    else:
        num_kb_eff = num_kb

    safe_lse = jnp.where(jnp.isfinite(lse), lse, 0.0)

    def body(kb, dq):
        k_blk = k_ref[0, pl.ds(kb * block_k, block_k), :]
        v_blk = v_ref[0, pl.ds(kb * block_k, block_k), :]
        s = jax.lax.dot_general(q, k_blk, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if scale != 1.0:
            s = s * scale
        s = s + bias_ref[0, 0, pl.ds(kb * block_k, block_k)][None, :]
        if segmented:
            qs = qseg_ref[0, 0, :][:, None]
            ks = kseg_ref[0, 0, pl.ds(kb * block_k, block_k)][None, :]
            s = jnp.where(qs == ks, s, -jnp.inf)
        if causal:
            row = q_off + qi * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0)
            col = kb * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1)
            keep = col <= row
            if window is not None:
                keep &= (row - col) < window
            s = jnp.where(keep, s, -jnp.inf)
        p = jnp.where(jnp.isfinite(s) & jnp.isfinite(lse),
                      jnp.exp(s - safe_lse), 0.0)
        dp = jax.lax.dot_general(do, v_blk, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = (p * (dp - D)).astype(k_blk.dtype)
        return dq + jax.lax.dot_general(ds, k_blk, (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)

    dq = jax.lax.fori_loop(kb_start, num_kb_eff, body,
                           jnp.zeros(q.shape, jnp.float32))
    if scale != 1.0:
        dq = dq * scale
    dq_ref[0] = dq.astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(qoff_ref, *refs, scale, causal, segmented, block_q,
                          seq_q, window=None):
    if segmented:
        (q_ref, k_ref, v_ref, bias_ref, qseg_ref, kseg_ref, do_ref,
         lse_ref, d_ref, dk_ref, dv_ref, dbias_ref) = refs
    else:
        (q_ref, k_ref, v_ref, bias_ref, do_ref, lse_ref, d_ref,
         dk_ref, dv_ref, dbias_ref) = refs
    k_blk = k_ref[0]                           # (BK, hd) native dtype
    v_blk = v_ref[0]
    bias_blk = bias_ref[0, 0, :][None, :]      # (1, BK)
    block_k = k_blk.shape[0]
    kb = pl.program_id(1)
    q_off = qoff_ref[pl.program_id(0)]
    num_qb = pl.cdiv(seq_q, block_q)
    # first q block whose causal frontier (q_off + row) reaches this key block
    qb_start = (jnp.maximum(kb * block_k - q_off, 0) // block_q
                if causal else 0)
    if causal and window is not None:
        # last q row still inside the window of this key block's last key:
        # row - col < window with col <= kb*block_k + block_k - 1
        last_qrow = kb * block_k + block_k - 1 + window - 1 - q_off
        num_qb_eff = jnp.minimum(num_qb, last_qrow // block_q + 1)
    else:
        num_qb_eff = num_qb

    def body(qb, carry):
        dk, dv, dbias = carry
        q = q_ref[0, pl.ds(qb * block_q, block_q), :]
        do = do_ref[0, pl.ds(qb * block_q, block_q), :]
        lse = lse_ref[0, 0, pl.ds(qb * block_q, block_q)][:, None]
        D = d_ref[0, 0, pl.ds(qb * block_q, block_q)][:, None]
        s = jax.lax.dot_general(q, k_blk, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if scale != 1.0:
            s = s * scale
        s = s + bias_blk
        if segmented:
            qs = qseg_ref[0, 0, pl.ds(qb * block_q, block_q)][:, None]
            ks = kseg_ref[0, 0, :][None, :]
            s = jnp.where(qs == ks, s, -jnp.inf)
        if causal:
            row = q_off + qb * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0)
            col = kb * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1)
            keep = col <= row
            if window is not None:
                keep &= (row - col) < window
            s = jnp.where(keep, s, -jnp.inf)
        safe_lse = jnp.where(jnp.isfinite(lse), lse, 0.0)
        p = jnp.where(jnp.isfinite(s) & jnp.isfinite(lse),
                      jnp.exp(s - safe_lse), 0.0)
        pc = p.astype(do.dtype)
        dv = dv + jax.lax.dot_general(pc, do, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do, v_blk, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - D)
        dsc = ds.astype(q.dtype)
        dk = dk + jax.lax.dot_general(dsc, q, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
        dbias = dbias + jnp.sum(ds, axis=0)
        return dk, dv, dbias

    hd = k_blk.shape[-1]
    dk, dv, dbias = jax.lax.fori_loop(
        qb_start, num_qb_eff, body,
        (jnp.zeros((block_k, hd), jnp.float32),
         jnp.zeros((block_k, hd), jnp.float32),
         jnp.zeros((block_k,), jnp.float32)))
    if scale != 1.0:
        dk = dk * scale
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)
    dbias_ref[0, 0, :] = dbias


def _flash_fwd(q, k, v, bias, q_offset, q_segments, k_segments, scale, causal,
               block_q, block_k, interpret, window):
    out, lse = _flash_fwd_impl(q, k, v, bias, q_offset, scale, causal, block_q,
                               block_k, interpret, q_segments, k_segments,
                               window)
    # named so a remat policy can pin the flash residuals
    # (save_only_these_names('flash_out', 'flash_lse') == remat="attn" in the
    # models): the backward then reuses them instead of re-running the
    # forward kernel inside the rematerialized block
    out = jax.ad_checkpoint.checkpoint_name(out, "flash_out")
    lse = jax.ad_checkpoint.checkpoint_name(lse, "flash_lse")
    return out, (q, k, v, bias, q_offset, q_segments, k_segments, out, lse)


def _flash_bwd(scale, causal, block_q, block_k, interpret, window, res, g):
    q, k, v, bias, q_offset, q_segments, k_segments, out, lse = res
    segmented = q_segments is not None
    B, H, Sq0, hd = q.shape
    Sk0 = k.shape[2]
    bias_shape_in = bias.shape
    block_q = min(block_q, Sq0)
    block_k = min(block_k, Sk0)
    pad_q = (-Sq0) % block_q
    pad_k = (-Sk0) % block_k
    bias_b = jnp.broadcast_to(bias, (B, H, Sk0))
    if pad_q:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad_q), (0, 0)))
        g = jnp.pad(g, ((0, 0), (0, 0), (0, pad_q), (0, 0)))
        out = jnp.pad(out, ((0, 0), (0, 0), (0, pad_q), (0, 0)))
    if pad_k:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad_k), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad_k), (0, 0)))
        bias_b = jnp.pad(bias_b, ((0, 0), (0, 0), (0, pad_k)),
                         constant_values=-jnp.inf)
    Sq, Sk = Sq0 + pad_q, Sk0 + pad_k
    BH = B * H
    qf = q.reshape(BH, Sq, hd)
    kf = k.reshape(BH, Sk, hd)
    vf = v.reshape(BH, Sk, hd)
    dof = g.reshape(BH, Sq, hd)
    outf = out.reshape(BH, Sq, hd)
    bias_f = bias_b.reshape(BH, 1, Sk)
    qoff = _qoff_rows(q_offset, B, H)
    # lse comes padded from the forward already
    Dval = jnp.sum(dof.astype(jnp.float32) * outf.astype(jnp.float32),
                   axis=-1).reshape(BH, 1, Sq)

    vec_spec = lambda blk: pl.BlockSpec((1, 1, blk),
                                        lambda bh, i, s: (bh, 0, i))
    full_vec = pl.BlockSpec((1, 1, Sq), lambda bh, i, s: (bh, 0, 0))
    full_vec_k = pl.BlockSpec((1, 1, Sk), lambda bh, i, s: (bh, 0, 0))
    kvec_spec = pl.BlockSpec((1, 1, block_k), lambda bh, kb, s: (bh, 0, kb))

    seg_ops, dq_seg_specs, dkv_seg_specs = [], [], []
    if segmented:
        seg_ops = [_seg_flat(q_segments, B, H, Sq0, pad_q),
                   _seg_flat(k_segments, B, H, Sk0, pad_k)]
        # dq grid iterates q blocks: qseg per block, kseg full
        dq_seg_specs = [vec_spec(block_q), full_vec_k]
        # dkv grid iterates k blocks: qseg full, kseg per block
        dkv_seg_specs = [full_vec, kvec_spec]

    dq_grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(BH, Sq // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, hd), lambda bh, qi, s: (bh, qi, 0)),
            pl.BlockSpec((1, Sk, hd), lambda bh, qi, s: (bh, 0, 0)),
            pl.BlockSpec((1, Sk, hd), lambda bh, qi, s: (bh, 0, 0)),
            pl.BlockSpec((1, 1, Sk), lambda bh, qi, s: (bh, 0, 0)),
        ] + dq_seg_specs + [
            pl.BlockSpec((1, block_q, hd), lambda bh, qi, s: (bh, qi, 0)),
            vec_spec(block_q),
            vec_spec(block_q),
        ],
        out_specs=pl.BlockSpec((1, block_q, hd),
                               lambda bh, qi, s: (bh, qi, 0)),
    )
    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, scale=scale, causal=causal,
                          segmented=segmented, block_k=block_k, seq_k=Sk,
                          window=window),
        out_shape=jax.ShapeDtypeStruct((BH, Sq, hd), q.dtype),
        grid_spec=dq_grid,
        interpret=interpret,
    )(qoff, qf, kf, vf, bias_f, *seg_ops, dof, lse, Dval)

    dkv_grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(BH, Sk // block_k),
        in_specs=[
            pl.BlockSpec((1, Sq, hd), lambda bh, kb, s: (bh, 0, 0)),
            pl.BlockSpec((1, block_k, hd), lambda bh, kb, s: (bh, kb, 0)),
            pl.BlockSpec((1, block_k, hd), lambda bh, kb, s: (bh, kb, 0)),
            pl.BlockSpec((1, 1, block_k), lambda bh, kb, s: (bh, 0, kb)),
        ] + dkv_seg_specs + [
            pl.BlockSpec((1, Sq, hd), lambda bh, kb, s: (bh, 0, 0)),
            full_vec,
            full_vec,
        ],
        out_specs=(
            pl.BlockSpec((1, block_k, hd), lambda bh, kb, s: (bh, kb, 0)),
            pl.BlockSpec((1, block_k, hd), lambda bh, kb, s: (bh, kb, 0)),
            pl.BlockSpec((1, 1, block_k), lambda bh, kb, s: (bh, 0, kb)),
        ),
    )
    dk, dv, dbias = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, scale=scale, causal=causal,
                          segmented=segmented, block_q=block_q, seq_q=Sq,
                          window=window),
        out_shape=(jax.ShapeDtypeStruct((BH, Sk, hd), k.dtype),
                   jax.ShapeDtypeStruct((BH, Sk, hd), v.dtype),
                   jax.ShapeDtypeStruct((BH, 1, Sk), jnp.float32)),
        grid_spec=dkv_grid,
        interpret=interpret,
    )(qoff, qf, kf, vf, bias_f, *seg_ops, dof, lse, Dval)

    dq = dq.reshape(B, H, Sq, hd)[:, :, :Sq0]
    dk = dk.reshape(B, H, Sk, hd)[:, :, :Sk0]
    dv = dv.reshape(B, H, Sk, hd)[:, :, :Sk0]
    dbias = dbias.reshape(B, H, Sk)[:, :, :Sk0]
    # un-broadcast dbias to the caller's bias shape (e.g. (B, 1, Sk))
    if bias_shape_in != (B, H, Sk0):
        axes = tuple(i for i, (a, b) in enumerate(zip((B, H, Sk0), bias_shape_in))
                     if a != b)
        dbias = jnp.sum(dbias, axis=axes, keepdims=True)
        dbias = dbias.reshape(bias_shape_in)
    import numpy as np
    dqoff = np.zeros(jnp.shape(q_offset), jax.dtypes.float0)
    dqseg = (None if q_segments is None
             else np.zeros(jnp.shape(q_segments), jax.dtypes.float0))
    dkseg = (None if k_segments is None
             else np.zeros(jnp.shape(k_segments), jax.dtypes.float0))
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
            dbias.astype(bias.dtype), dqoff, dqseg, dkseg)


flash_attention.defvjp(_flash_fwd, _flash_bwd)


# ---------------------------------------------------------------------------
# packed (B, S, D) flash attention — no head transposes
# ---------------------------------------------------------------------------
#
# The (B, H, S, hd) kernel above needs q/k/v transposed out of the
# projection's natural (B, S, D) layout; at hd=64 XLA materializes those
# transposes as ~28 GB/s relayout copies (64 lanes = half a 128-lane tile),
# costing more than the kernel itself in the training step. This variant
# consumes (B, S, D) directly: the grid blocks the LANE dimension in
# 128-wide groups (= 128//hd heads per program) and the per-head math runs
# on lane halves inside VMEM. Outputs are (B, S, D) too, so the attention
# block needs no _split_heads/_merge_heads at all. Numerically identical to
# flash_attention (same blocking, same fp32 online softmax).

_MASK_NEG = -1e30  # masked-score fill: exp underflows to 0, no inf/nan paths


def _heads_per_group(hd):
    return 128 // hd if hd in (32, 64) else 1


def _packed_fwd_kernel(qoff_ref, *refs, scale, causal, segmented, block_k,
                       seq_k, hd, ppg, kv_shared=False):
    if segmented:
        (q_ref, k_ref, v_ref, bias_ref, qseg_ref, kseg_ref,
         out_ref, lse_ref) = refs
    else:
        q_ref, k_ref, v_ref, bias_ref, out_ref, lse_ref = refs
    qb = q_ref[0]                                  # (BQ, ppg*hd)
    block_q = qb.shape[0]
    qi = pl.program_id(2)
    q_off = qoff_ref[pl.program_id(0)]
    num_kb = pl.cdiv(seq_k, block_k)
    if causal:
        last_row = q_off + qi * block_q + block_q - 1
        num_kb_eff = jnp.minimum(num_kb, (last_row + block_k) // block_k)
    else:
        num_kb_eff = num_kb

    # kv_shared (GQA-native): the k/v block is ONE kv head's (block_k, hd)
    # lanes shared by every q sub-head in this group — no per-g lane slice,
    # and the group-repeated K/V never materialize (flash_attention_bsd_gqa)
    def kvs(x, lo):
        return x if kv_shared else x[:, lo:lo + hd]

    def body(kb, carry):
        accs, ms, ls = carry
        if kv_shared:
            kb_ = k_ref[0, 0, pl.ds(kb * block_k, block_k), :]
            vb = v_ref[0, 0, pl.ds(kb * block_k, block_k), :]
        else:
            kb_ = k_ref[0, pl.ds(kb * block_k, block_k), :]
            vb = v_ref[0, pl.ds(kb * block_k, block_k), :]
        keep = None
        if causal:
            row = q_off + qi * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0)
            col = kb * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1)
            keep = col <= row
        if segmented:
            # segments are per batch row (head-independent): one (BQ, BK)
            # block-diagonal mask shared by all ppg head groups
            qs = qseg_ref[0, 0, :][:, None]
            ks = kseg_ref[0, 0, pl.ds(kb * block_k, block_k)][None, :]
            seg_keep = qs == ks
            keep = seg_keep if keep is None else (keep & seg_keep)
        new_accs, new_ms, new_ls = [], [], []
        for g in range(ppg):
            lo = g * hd
            s = jax.lax.dot_general(
                qb[:, lo:lo + hd], kvs(kb_, lo),
                (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
            if scale != 1.0:
                s = s * scale
            s = s + bias_ref[0, g, pl.ds(kb * block_k, block_k)][None, :]
            if keep is not None:
                s = jnp.where(keep, s, _MASK_NEG)
            m, l, acc = ms[g], ls[g], accs[g]
            m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
            p = jnp.exp(s - m_new)
            corr = jnp.exp(m - m_new)
            new_ls.append(l * corr + jnp.sum(p, axis=-1, keepdims=True))
            new_accs.append(acc * corr + jax.lax.dot_general(
                p.astype(vb.dtype), kvs(vb, lo),
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32))
            new_ms.append(m_new)
        return tuple(new_accs), tuple(new_ms), tuple(new_ls)

    accs0 = tuple(jnp.zeros((block_q, hd), jnp.float32) for _ in range(ppg))
    ms0 = tuple(jnp.full((block_q, 1), _MASK_NEG, jnp.float32)
                for _ in range(ppg))
    ls0 = tuple(jnp.zeros((block_q, 1), jnp.float32) for _ in range(ppg))
    accs, ms, ls = jax.lax.fori_loop(0, num_kb_eff, body, (accs0, ms0, ls0))
    # fully-masked rows (running max never left the _MASK_NEG sentinel — all
    # scores were clamp-masked and therefore exactly equal): zero the output
    # (matching the 4D kernel's exact-masking semantics) and emit a +sentinel
    # lse so the backward's exp(s - lse) underflows those rows to 0 too.
    # Cheap: two wheres on (block_q, 1), not per-element guard chains.
    out_ref[0] = jnp.concatenate(
        [jnp.where(ms[g] > 0.5 * _MASK_NEG,
                   accs[g] / jnp.maximum(ls[g], 1e-30), 0.0)
         for g in range(ppg)], axis=1).astype(out_ref.dtype)
    for g in range(ppg):
        lse = ms[g][:, 0] + jnp.log(jnp.maximum(ls[g][:, 0], 1e-30))
        lse_ref[0, g, :] = jnp.where(ms[g][:, 0] > 0.5 * _MASK_NEG,
                                     lse, -_MASK_NEG)


def _packed_bwd_dq_kernel(qoff_ref, *refs, scale, causal, segmented, block_k,
                          seq_k, hd, ppg):
    if segmented:
        (q_ref, k_ref, v_ref, bias_ref, qseg_ref, kseg_ref, do_ref,
         lse_ref, d_ref, dq_ref) = refs
    else:
        (q_ref, k_ref, v_ref, bias_ref, do_ref, lse_ref, d_ref,
         dq_ref) = refs
    qb = q_ref[0]
    do = do_ref[0]
    block_q = qb.shape[0]
    qi = pl.program_id(2)
    q_off = qoff_ref[pl.program_id(0)]
    num_kb = pl.cdiv(seq_k, block_k)
    if causal:
        last_row = q_off + qi * block_q + block_q - 1
        num_kb_eff = jnp.minimum(num_kb, (last_row + block_k) // block_k)
    else:
        num_kb_eff = num_kb

    def body(kb, dqs):
        kb_ = k_ref[0, pl.ds(kb * block_k, block_k), :]
        vb = v_ref[0, pl.ds(kb * block_k, block_k), :]
        keep = None
        if causal:
            row = q_off + qi * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0)
            col = kb * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1)
            keep = col <= row
        if segmented:
            qs = qseg_ref[0, 0, :][:, None]
            ks = kseg_ref[0, 0, pl.ds(kb * block_k, block_k)][None, :]
            seg_keep = qs == ks
            keep = seg_keep if keep is None else (keep & seg_keep)
        new_dqs = []
        for g in range(ppg):
            lo = g * hd
            lse = lse_ref[0, g, pl.ds(qi * block_q, block_q)][:, None]
            D = d_ref[0, g, pl.ds(qi * block_q, block_q)][:, None]
            s = jax.lax.dot_general(
                qb[:, lo:lo + hd], kb_[:, lo:lo + hd],
                (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
            if scale != 1.0:
                s = s * scale
            s = s + bias_ref[0, g, pl.ds(kb * block_k, block_k)][None, :]
            if keep is not None:
                s = jnp.where(keep, s, _MASK_NEG)
            p = jnp.exp(s - lse)
            dp = jax.lax.dot_general(
                do[:, lo:lo + hd], vb[:, lo:lo + hd],
                (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
            ds = (p * (dp - D)).astype(kb_.dtype)
            new_dqs.append(dqs[g] + jax.lax.dot_general(
                ds, kb_[:, lo:lo + hd], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
        return tuple(new_dqs)

    dqs0 = tuple(jnp.zeros((block_q, hd), jnp.float32) for _ in range(ppg))
    dqs = jax.lax.fori_loop(0, num_kb_eff, body, dqs0)
    dq = jnp.concatenate(list(dqs), axis=1)
    if scale != 1.0:
        dq = dq * scale
    dq_ref[0] = dq.astype(dq_ref.dtype)


def _packed_bwd_dkv_kernel(qoff_ref, *refs, scale, causal, segmented, block_q,
                           seq_q, hd, ppg):
    if segmented:
        (q_ref, k_ref, v_ref, bias_ref, qseg_ref, kseg_ref, do_ref,
         lse_ref, d_ref, dk_ref, dv_ref, dbias_ref) = refs
    else:
        (q_ref, k_ref, v_ref, bias_ref, do_ref, lse_ref, d_ref,
         dk_ref, dv_ref, dbias_ref) = refs
    kb_ = k_ref[0]                                  # (BK, ppg*hd)
    vb = v_ref[0]
    block_k = kb_.shape[0]
    kb = pl.program_id(2)
    q_off = qoff_ref[pl.program_id(0)]
    num_qb = pl.cdiv(seq_q, block_q)
    qb_start = (jnp.maximum(kb * block_k - q_off, 0) // block_q
                if causal else 0)

    def body(qb, carry):
        dks, dvs, dbs = carry
        q = q_ref[0, pl.ds(qb * block_q, block_q), :]
        do = do_ref[0, pl.ds(qb * block_q, block_q), :]
        keep = None
        if causal:
            row = q_off + qb * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0)
            col = kb * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1)
            keep = col <= row
        if segmented:
            qs = qseg_ref[0, 0, pl.ds(qb * block_q, block_q)][:, None]
            ks = kseg_ref[0, 0, :][None, :]
            seg_keep = qs == ks
            keep = seg_keep if keep is None else (keep & seg_keep)
        new_dks, new_dvs, new_dbs = [], [], []
        for g in range(ppg):
            lo = g * hd
            lse = lse_ref[0, g, pl.ds(qb * block_q, block_q)][:, None]
            D = d_ref[0, g, pl.ds(qb * block_q, block_q)][:, None]
            s = jax.lax.dot_general(
                q[:, lo:lo + hd], kb_[:, lo:lo + hd],
                (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
            if scale != 1.0:
                s = s * scale
            s = s + bias_ref[0, g, pl.ds(kb * block_k, block_k)][None, :]
            if keep is not None:
                s = jnp.where(keep, s, _MASK_NEG)
            p = jnp.exp(s - lse)
            pc = p.astype(do.dtype)
            new_dvs.append(dvs[g] + jax.lax.dot_general(
                pc, do[:, lo:lo + hd], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
            dp = jax.lax.dot_general(
                do[:, lo:lo + hd], vb[:, lo:lo + hd],
                (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
            ds = p * (dp - D)
            dsc = ds.astype(q.dtype)
            new_dks.append(dks[g] + jax.lax.dot_general(
                dsc, q[:, lo:lo + hd], (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))
            new_dbs.append(dbs[g] + jnp.sum(ds, axis=0))
        return tuple(new_dks), tuple(new_dvs), tuple(new_dbs)

    z = lambda shape: tuple(jnp.zeros(shape, jnp.float32) for _ in range(ppg))
    dks, dvs, dbs = jax.lax.fori_loop(
        qb_start, num_qb, body,
        (z((block_k, hd)), z((block_k, hd)), z((block_k,))))
    dk = jnp.concatenate(list(dks), axis=1)
    if scale != 1.0:
        dk = dk * scale
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = jnp.concatenate(list(dvs), axis=1).astype(dv_ref.dtype)
    for g in range(ppg):
        dbias_ref[0, g, :] = dbs[g]


def _packed_prep(q, bias, n_head, block_q, block_k, Sq0, Sk0):
    """Shared shape bookkeeping: group count, padded lengths, packed bias."""
    B, _, D = q.shape
    hd = D // n_head
    ppg = _heads_per_group(hd)
    lanes = ppg * hd
    assert lanes == 128 or ppg == 1, (hd, ppg)
    G = n_head // ppg
    block_q = min(block_q, Sq0)
    block_k = min(block_k, Sk0)
    pad_q = (-Sq0) % block_q
    pad_k = (-Sk0) % block_k
    # clamp to -1e30: with no infinities in play, exp() underflows masked
    # scores to exactly 0 and the kernels need no isfinite/where guard
    # chains (measured 2x kernel time at hd=64)
    bias_b = jnp.maximum(jnp.broadcast_to(bias.astype(jnp.float32),
                                          (B, n_head, Sk0)), _MASK_NEG)
    if pad_k:
        bias_b = jnp.pad(bias_b, ((0, 0), (0, 0), (0, pad_k)),
                         constant_values=_MASK_NEG)
    # (B*G, ppg, Sk): per-group bias rows, block (1, ppg, Sk) is tiling-legal
    bias_p = bias_b.reshape(B, G, ppg, Sk0 + pad_k).reshape(
        B * G, ppg, Sk0 + pad_k)
    return hd, ppg, G, block_q, block_k, pad_q, pad_k, bias_p


def _qoff_batch(q_offset, B):
    qo = jnp.asarray(q_offset, jnp.int32)
    return jnp.broadcast_to(qo.reshape(-1), (B,)) if qo.ndim \
        else jnp.broadcast_to(qo, (B,))


def _bsd_seg_flat(seg, B, S0, pad):
    """(B, S0) segment ids -> (B, 1, S_padded) int32; pads get -1 (matches
    no real segment). Head-independent: one ref per batch row."""
    s = seg.astype(jnp.int32)[:, None, :]
    if pad:
        s = jnp.pad(s, ((0, 0), (0, 0), (0, pad)), constant_values=-1)
    return s


def _packed_fwd_impl(q, k, v, bias, q_offset, scale, causal, block_q, block_k,
                     interpret, n_head, q_segments=None, k_segments=None,
                     kv_heads=None):
    B, Sq0, D = q.shape
    Sk0 = k.shape[1]
    hd, ppg, G, block_q, block_k, pad_q, pad_k, bias_p = _packed_prep(
        q, bias, n_head, block_q, block_k, Sq0, Sk0)
    if pad_q:
        q = jnp.pad(q, ((0, 0), (0, pad_q), (0, 0)))
    if pad_k:
        k = jnp.pad(k, ((0, 0), (0, pad_k), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad_k), (0, 0)))
    Sq, Sk = Sq0 + pad_q, Sk0 + pad_k
    qoff = _qoff_batch(q_offset, B)
    lanes = ppg * hd

    # GQA-native kv (flash_attention_bsd_gqa): k/v arrive with kv_heads*hd
    # lanes; each q-group's kv head is selected by the BLOCK INDEX MAP, so
    # the group-repeated K/V never materialize and the kv stream shrinks
    # n_head/kv_heads-fold (consecutive q-groups sharing a kv head reuse the
    # fetched block — the grid iterates q-blocks innermost).
    gqa = kv_heads is not None and kv_heads != n_head
    if gqa:
        r = n_head // kv_heads
        assert n_head % kv_heads == 0 and r % ppg == 0, \
            (n_head, kv_heads, ppg)
        k = k.reshape(B, Sk, kv_heads, hd).transpose(0, 2, 1, 3)
        v = v.reshape(B, Sk, kv_heads, hd).transpose(0, 2, 1, 3)
        rg = r // ppg  # q-groups per kv head
        kv_spec = pl.BlockSpec((1, 1, Sk, hd),
                               lambda b, g, qi, s: (b, g // rg, 0, 0))

    segmented = q_segments is not None
    seg_ops, seg_specs = [], []
    if segmented:
        seg_ops = [_bsd_seg_flat(q_segments, B, Sq0, pad_q),
                   _bsd_seg_flat(k_segments, B, Sk0, pad_k)]
        seg_specs = [
            pl.BlockSpec((1, 1, block_q), lambda b, g, qi, s: (b, 0, qi)),
            pl.BlockSpec((1, 1, Sk), lambda b, g, qi, s: (b, 0, 0)),
        ]

    Gv = G
    if not gqa:
        kv_spec = pl.BlockSpec((1, Sk, lanes), lambda b, g, qi, s: (b, 0, g))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, G, Sq // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, lanes), lambda b, g, qi, s: (b, qi, g)),
            kv_spec,
            kv_spec,
            pl.BlockSpec((1, ppg, Sk),
                         lambda b, g, qi, s, G=Gv: (b * G + g, 0, 0)),
        ] + seg_specs,
        out_specs=(
            pl.BlockSpec((1, block_q, lanes), lambda b, g, qi, s: (b, qi, g)),
            pl.BlockSpec((1, ppg, block_q),
                         lambda b, g, qi, s, G=Gv: (b * G + g, 0, qi)),
        ),
    )
    out, lse = pl.pallas_call(
        functools.partial(_packed_fwd_kernel, scale=scale, causal=causal,
                          segmented=segmented, block_k=block_k, seq_k=Sk,
                          hd=hd, ppg=ppg, kv_shared=gqa),
        out_shape=(jax.ShapeDtypeStruct((B, Sq, D), q.dtype),
                   jax.ShapeDtypeStruct((B * G, ppg, Sq), jnp.float32)),
        grid_spec=grid_spec,
        interpret=interpret,
    )(qoff, q, k, v, bias_p, *seg_ops)
    if pad_q:
        out = out[:, :Sq0]
    return out, lse


def bsd_gqa_supported(n_head, kv_heads, hd):
    """flash_attention_bsd_gqa eligibility: every q sub-head in a 128-lane
    group must map to the same kv head."""
    ppg = _heads_per_group(hd)
    return (kv_heads > 0 and n_head % kv_heads == 0
            and (n_head // kv_heads) % ppg == 0)


def flash_attention_bsd_gqa(q, k, v, bias, q_offset=0, q_segments=None,
                            k_segments=None, n_head=1, kv_heads=1, scale=1.0,
                            causal=True, block_q=DEFAULT_BLOCK_Q,
                            block_k=DEFAULT_BLOCK_K, interpret=False):
    """GQA-native flash_attention_bsd: k/v stay (B, Sk, kv_heads*hd).

    The group-repeated K/V of the expansion path cost n_head/kv_heads x the
    kv HBM stream (a tinyllama ctx4k prefill re-fetched 269 MB of expanded
    kv per layer vs the 16.8 MB slab); here the kv head is selected by the
    block index map and consecutive q-groups reuse the fetched block.
    FORWARD-ONLY (no vjp) — inference paths; training keeps
    flash_attention_bsd's expansion, whose backward accumulates dk/dv."""
    assert bsd_gqa_supported(n_head, kv_heads, q.shape[-1] // n_head)
    out, _ = _packed_fwd_impl(q, k, v, bias, q_offset, scale, causal,
                              block_q, block_k, interpret, n_head,
                              q_segments, k_segments, kv_heads=kv_heads)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11, 12))
def flash_attention_bsd(q, k, v, bias, q_offset=0, q_segments=None,
                        k_segments=None, n_head=1, scale=1.0,
                        causal=True, block_q=DEFAULT_BLOCK_Q,
                        block_k=DEFAULT_BLOCK_K, interpret=False):
    """Flash attention over head-major (B, S, D) tensors (D = n_head * hd).

    Same math as ``flash_attention`` but the projection outputs feed in (and
    the context feeds out) without any head transpose — the kernel grid
    blocks the lane dimension in 128-wide head groups. ``bias``: additive
    per-key (B, n_head, Sk) or (B, 1, Sk); ``q_offset``: scalar or (B,)
    cache offsets for the causal iota. ``q_segments``/``k_segments``
    (B, S) int32: packed-sequence block-diagonal masking, the same
    splash-attention convention as ``flash_attention`` (pass both or
    neither)."""
    out, _ = _packed_fwd_impl(q, k, v, bias, q_offset, scale, causal,
                              block_q, block_k, interpret, n_head,
                              q_segments, k_segments)
    return out


def _packed_fwd(q, k, v, bias, q_offset, q_segments, k_segments, n_head,
                scale, causal, block_q, block_k, interpret):
    out, lse = _packed_fwd_impl(q, k, v, bias, q_offset, scale, causal,
                                block_q, block_k, interpret, n_head,
                                q_segments, k_segments)
    out = jax.ad_checkpoint.checkpoint_name(out, "flash_out")
    lse = jax.ad_checkpoint.checkpoint_name(lse, "flash_lse")
    return out, (q, k, v, bias, q_offset, q_segments, k_segments, out, lse)


def _packed_bwd(n_head, scale, causal, block_q, block_k, interpret, res, g):
    q, k, v, bias, q_offset, q_segments, k_segments, out, lse = res
    segmented = q_segments is not None
    B, Sq0, D = q.shape
    Sk0 = k.shape[1]
    bias_shape_in = bias.shape
    hd, ppg, G, block_q, block_k, pad_q, pad_k, bias_p = _packed_prep(
        q, bias, n_head, block_q, block_k, Sq0, Sk0)
    if pad_q:
        q = jnp.pad(q, ((0, 0), (0, pad_q), (0, 0)))
        g = jnp.pad(g, ((0, 0), (0, pad_q), (0, 0)))
        out = jnp.pad(out, ((0, 0), (0, pad_q), (0, 0)))
    if pad_k:
        k = jnp.pad(k, ((0, 0), (0, pad_k), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pad_k), (0, 0)))
    Sq, Sk = Sq0 + pad_q, Sk0 + pad_k
    lanes = ppg * hd
    qoff = _qoff_batch(q_offset, B)
    # per-(head, row) sum(do * out) in the packed (B*G, ppg, Sq) layout
    do_out = (g.astype(jnp.float32) * out.astype(jnp.float32)).reshape(
        B, Sq, G, ppg, hd)
    Dval = jnp.sum(do_out, axis=-1).transpose(0, 2, 3, 1).reshape(
        B * G, ppg, Sq)

    Gv = G
    qspec = pl.BlockSpec((1, block_q, lanes), lambda b, g_, qi, s: (b, qi, g_))
    kfull = pl.BlockSpec((1, Sk, lanes), lambda b, g_, qi, s: (b, 0, g_))
    qfull = pl.BlockSpec((1, Sq, lanes), lambda b, g_, kb, s: (b, 0, g_))
    kspec = pl.BlockSpec((1, block_k, lanes), lambda b, g_, kb, s: (b, kb, g_))
    bias_q = pl.BlockSpec((1, ppg, Sk), lambda b, g_, qi, s, G=Gv: (b * G + g_, 0, 0))
    vec_q = pl.BlockSpec((1, ppg, Sq), lambda b, g_, qi, s, G=Gv: (b * G + g_, 0, 0))

    seg_ops, dq_seg_specs, dkv_seg_specs = [], [], []
    if segmented:
        seg_ops = [_bsd_seg_flat(q_segments, B, Sq0, pad_q),
                   _bsd_seg_flat(k_segments, B, Sk0, pad_k)]
        # dq grid iterates q blocks: qseg per block, kseg full
        dq_seg_specs = [
            pl.BlockSpec((1, 1, block_q), lambda b, g_, qi, s: (b, 0, qi)),
            pl.BlockSpec((1, 1, Sk), lambda b, g_, qi, s: (b, 0, 0)),
        ]
        # dkv grid iterates k blocks: qseg full, kseg per block
        dkv_seg_specs = [
            pl.BlockSpec((1, 1, Sq), lambda b, g_, kb, s: (b, 0, 0)),
            pl.BlockSpec((1, 1, block_k), lambda b, g_, kb, s: (b, 0, kb)),
        ]

    dq_grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, G, Sq // block_q),
        in_specs=[qspec, kfull, kfull, bias_q] + dq_seg_specs
        + [qspec, vec_q, vec_q],
        out_specs=pl.BlockSpec((1, block_q, lanes),
                               lambda b, g_, qi, s: (b, qi, g_)),
    )
    dq = pl.pallas_call(
        functools.partial(_packed_bwd_dq_kernel, scale=scale, causal=causal,
                          segmented=segmented, block_k=block_k, seq_k=Sk,
                          hd=hd, ppg=ppg),
        out_shape=jax.ShapeDtypeStruct((B, Sq, D), q.dtype),
        grid_spec=dq_grid,
        interpret=interpret,
    )(qoff, q, k, v, bias_p, *seg_ops, g, lse, Dval)

    dkv_grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, G, Sk // block_k),
        in_specs=[qfull, kspec, kspec, bias_q] + dkv_seg_specs
        + [qfull, vec_q, vec_q],
        out_specs=(
            pl.BlockSpec((1, block_k, lanes), lambda b, g_, kb, s: (b, kb, g_)),
            pl.BlockSpec((1, block_k, lanes), lambda b, g_, kb, s: (b, kb, g_)),
            pl.BlockSpec((1, ppg, block_k),
                         lambda b, g_, kb, s, G=Gv: (b * G + g_, 0, kb)),
        ),
    )
    dk, dv, dbias = pl.pallas_call(
        functools.partial(_packed_bwd_dkv_kernel, scale=scale, causal=causal,
                          segmented=segmented, block_q=block_q, seq_q=Sq,
                          hd=hd, ppg=ppg),
        out_shape=(jax.ShapeDtypeStruct((B, Sk, D), k.dtype),
                   jax.ShapeDtypeStruct((B, Sk, D), v.dtype),
                   jax.ShapeDtypeStruct((B * G, ppg, Sk), jnp.float32)),
        grid_spec=dkv_grid,
        interpret=interpret,
    )(qoff, q, k, v, bias_p, *seg_ops, g, lse, Dval)

    dq = dq[:, :Sq0]
    dk = dk[:, :Sk0]
    dv = dv[:, :Sk0]
    dbias = dbias.reshape(B, G, ppg, Sk)[..., :Sk0].reshape(B, n_head, Sk0)
    if bias_shape_in != (B, n_head, Sk0):
        axes = tuple(i for i, (a, b) in enumerate(zip((B, n_head, Sk0),
                                                      bias_shape_in))
                     if a != b)
        dbias = jnp.sum(dbias, axis=axes, keepdims=True)
        dbias = dbias.reshape(bias_shape_in)
    import numpy as np
    dqoff = np.zeros(jnp.shape(q_offset), jax.dtypes.float0)
    dqseg = (None if q_segments is None
             else np.zeros(jnp.shape(q_segments), jax.dtypes.float0))
    dkseg = (None if k_segments is None
             else np.zeros(jnp.shape(k_segments), jax.dtypes.float0))
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
            dbias.astype(bias.dtype), dqoff, dqseg, dkseg)


flash_attention_bsd.defvjp(_packed_fwd, _packed_bwd)


# ---------------------------------------------------------------------------
# fused LayerNorm
# ---------------------------------------------------------------------------

def _ln_kernel(x_ref, w_ref, b_ref, out_ref, *, eps):
    x = x_ref[...].astype(jnp.float32)
    mean = jnp.mean(x, axis=-1, keepdims=True)
    c = x - mean
    std = jnp.sqrt(jnp.mean(c * c + eps, axis=-1, keepdims=True))
    out_ref[...] = ((c / std) * w_ref[...].astype(jnp.float32)
                    + b_ref[...].astype(jnp.float32)).astype(out_ref.dtype)


def fused_layer_norm(x, weight, bias, eps=1e-5, block_rows=256, interpret=False):
    """LayerNorm over the last dim as a single Pallas kernel (numerics match
    ops/layers.layer_norm with exact_reference=True). x: (..., D)."""
    orig_shape = x.shape
    D = orig_shape[-1]
    xf = x.reshape(-1, D)
    R = xf.shape[0]
    block_rows = min(block_rows, R)
    pad = (-R) % block_rows
    if pad:
        xf = jnp.pad(xf, ((0, pad), (0, 0)))
    grid = (xf.shape[0] // block_rows,)
    out = pl.pallas_call(
        functools.partial(_ln_kernel, eps=eps),
        out_shape=jax.ShapeDtypeStruct(xf.shape, x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_rows, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((D,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((D,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_rows, D), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xf, weight, bias)
    if pad:
        out = out[:R]
    return out.reshape(orig_shape)
