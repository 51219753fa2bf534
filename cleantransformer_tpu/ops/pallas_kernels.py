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
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 256
DEFAULT_BLOCK_K = 256


def _flash_kernel(qoff_ref, q_ref, k_ref, v_ref, bias_ref, out_ref, lse_ref, *,
                  scale, causal, block_k, seq_k):
    """One (batch*head, q-block) program: loop key blocks with online softmax.
    Also emits the per-row logsumexp (for the backward kernels).

    ``qoff_ref`` is the scalar-prefetch operand: a flat (B*H,) int32 vector of
    per-(batch,head) query offsets (TPU tiling rejects a (1,1)-blocked SMEM
    array, so the offsets ride the PrefetchScalarGridSpec instead)."""
    q = q_ref[0].astype(jnp.float32)  # (BQ, hd)
    block_q = q.shape[0]
    qi = pl.program_id(1)
    q_off = qoff_ref[pl.program_id(0)]
    num_kb = pl.cdiv(seq_k, block_k)
    if causal:
        # only key blocks up to the causal frontier of this q block
        last_row = q_off + qi * block_q + block_q - 1
        num_kb_eff = jnp.minimum(num_kb, (last_row + block_k) // block_k)
    else:
        num_kb_eff = num_kb

    def body(kb, carry):
        acc, m, l = carry
        k_blk = k_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        v_blk = v_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(q, k_blk, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if scale != 1.0:
            s = s * scale
        s = s + bias_ref[0, 0, pl.ds(kb * block_k, block_k)][None, :]
        if causal:
            row = q_off + qi * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0)
            col = kb * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1)
            s = jnp.where(col <= row, s, -jnp.inf)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        # guard fully-masked rows (m_new == -inf): exp(-inf - -inf) = nan
        safe_m = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
        p = jnp.exp(s - safe_m)
        p = jnp.where(jnp.isfinite(s), p, 0.0)
        corr = jnp.where(jnp.isfinite(m), jnp.exp(m - safe_m), 0.0)
        l_new = l * corr + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * corr + jax.lax.dot_general(
            p, v_blk, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return acc_new, m_new, l_new

    head_dim = q.shape[-1]
    acc0 = jnp.zeros((block_q, head_dim), jnp.float32)
    m0 = jnp.full((block_q, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, num_kb_eff, body, (acc0, m0, l0))
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


def _flash_fwd_impl(q, k, v, bias, q_offset, scale, causal, block_q, block_k,
                    interpret):
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

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B * H, Sq // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, hd), lambda bh, qi, s: (bh, qi, 0)),
            pl.BlockSpec((1, Sk, hd), lambda bh, qi, s: (bh, 0, 0)),
            pl.BlockSpec((1, Sk, hd), lambda bh, qi, s: (bh, 0, 0)),
            pl.BlockSpec((1, 1, Sk), lambda bh, qi, s: (bh, 0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, block_q, hd), lambda bh, qi, s: (bh, qi, 0)),
            pl.BlockSpec((1, 1, block_q), lambda bh, qi, s: (bh, 0, qi)),
        ),
    )
    out, lse = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, causal=causal,
                          block_k=block_k, seq_k=Sk),
        out_shape=(jax.ShapeDtypeStruct((B * H, Sq, hd), q.dtype),
                   jax.ShapeDtypeStruct((B * H, 1, Sq), jnp.float32)),
        grid_spec=grid_spec,
        interpret=interpret,
    )(qoff, qf, kf, vf, bias_f)
    out = out.reshape(B, H, Sq, hd)
    if pad_q:
        out = out[:, :, :Sq0]
    return out, lse  # lse stays padded (B*H, 1, Sq_padded) for the backward


def _dense_reference(q, k, v, bias, scale, causal, q_offset=0):
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
            keep = col[None] <= (qo[:, None, None] + row[None])  # (B, Sq, Sk)
            keep = keep[:, None]
        else:
            keep = (col <= (qo + row))[None, None]
        scores = jnp.where(keep, scores, -jnp.inf)
    weights = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", weights, v.astype(jnp.float32)).astype(q.dtype)


def should_interpret():
    """Pallas interpret mode off-TPU (CPU tests / virtual meshes)."""
    return jax.default_backend() not in ("tpu", "axon")


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def flash_attention(q, k, v, bias, q_offset=0, scale=1.0, causal=True,
                    block_q=DEFAULT_BLOCK_Q, block_k=DEFAULT_BLOCK_K,
                    interpret=False):
    """q: (B,H,Sq,hd); k,v: (B,H,Sk,hd); bias: (B,H,Sk) or (B,1,Sk) additive
    (ALiBi + padding, broadcast over queries). ``q_offset`` (dynamic int32
    scalar or (B,) vector): query i has absolute position q_offset + i, so
    causal attends keys <= q_offset + i (cache offset for speculative verify /
    chunked prefill). Returns (B,H,Sq,hd)."""
    out, _ = _flash_fwd_impl(q, k, v, bias, q_offset, scale, causal, block_q,
                             block_k, interpret)
    return out


# ---------------------------------------------------------------------------
# flash backward kernels (standard two-pass: dq over q-blocks, dk/dv/dbias
# over k-blocks, using the saved per-row logsumexp)
# ---------------------------------------------------------------------------

def _flash_bwd_dq_kernel(qoff_ref, q_ref, k_ref, v_ref, bias_ref, do_ref,
                         lse_ref, d_ref, dq_ref, *, scale, causal, block_k,
                         seq_k):
    q = q_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0, 0, :][:, None]            # (BQ, 1)
    D = d_ref[0, 0, :][:, None]                # (BQ, 1)
    block_q = q.shape[0]
    qi = pl.program_id(1)
    q_off = qoff_ref[pl.program_id(0)]
    num_kb = pl.cdiv(seq_k, block_k)
    if causal:
        last_row = q_off + qi * block_q + block_q - 1
        num_kb_eff = jnp.minimum(num_kb, (last_row + block_k) // block_k)
    else:
        num_kb_eff = num_kb

    safe_lse = jnp.where(jnp.isfinite(lse), lse, 0.0)

    def body(kb, dq):
        k_blk = k_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        v_blk = v_ref[0, pl.ds(kb * block_k, block_k), :].astype(jnp.float32)
        s = jax.lax.dot_general(q, k_blk, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if scale != 1.0:
            s = s * scale
        s = s + bias_ref[0, 0, pl.ds(kb * block_k, block_k)][None, :]
        if causal:
            row = q_off + qi * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0)
            col = kb * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1)
            s = jnp.where(col <= row, s, -jnp.inf)
        p = jnp.where(jnp.isfinite(s) & jnp.isfinite(lse),
                      jnp.exp(s - safe_lse), 0.0)
        dp = jax.lax.dot_general(do, v_blk, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - D)
        return dq + jax.lax.dot_general(ds, k_blk, (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)

    dq = jax.lax.fori_loop(0, num_kb_eff, body,
                           jnp.zeros(q.shape, jnp.float32))
    if scale != 1.0:
        dq = dq * scale
    dq_ref[0] = dq.astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(qoff_ref, q_ref, k_ref, v_ref, bias_ref, do_ref,
                          lse_ref, d_ref, dk_ref, dv_ref, dbias_ref, *, scale,
                          causal, block_q, seq_q):
    k_blk = k_ref[0].astype(jnp.float32)       # (BK, hd)
    v_blk = v_ref[0].astype(jnp.float32)
    bias_blk = bias_ref[0, 0, :][None, :]      # (1, BK)
    block_k = k_blk.shape[0]
    kb = pl.program_id(1)
    q_off = qoff_ref[pl.program_id(0)]
    num_qb = pl.cdiv(seq_q, block_q)
    # first q block whose causal frontier (q_off + row) reaches this key block
    qb_start = (jnp.maximum(kb * block_k - q_off, 0) // block_q
                if causal else 0)

    def body(qb, carry):
        dk, dv, dbias = carry
        q = q_ref[0, pl.ds(qb * block_q, block_q), :].astype(jnp.float32)
        do = do_ref[0, pl.ds(qb * block_q, block_q), :].astype(jnp.float32)
        lse = lse_ref[0, 0, pl.ds(qb * block_q, block_q)][:, None]
        D = d_ref[0, 0, pl.ds(qb * block_q, block_q)][:, None]
        s = jax.lax.dot_general(q, k_blk, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if scale != 1.0:
            s = s * scale
        s = s + bias_blk
        if causal:
            row = q_off + qb * block_q + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 0)
            col = kb * block_k + jax.lax.broadcasted_iota(
                jnp.int32, (block_q, block_k), 1)
            s = jnp.where(col <= row, s, -jnp.inf)
        safe_lse = jnp.where(jnp.isfinite(lse), lse, 0.0)
        p = jnp.where(jnp.isfinite(s) & jnp.isfinite(lse),
                      jnp.exp(s - safe_lse), 0.0)
        dv = dv + jax.lax.dot_general(p, do, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do, v_blk, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - D)
        dk = dk + jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
        dbias = dbias + jnp.sum(ds, axis=0)
        return dk, dv, dbias

    hd = k_blk.shape[-1]
    dk, dv, dbias = jax.lax.fori_loop(
        qb_start, num_qb, body,
        (jnp.zeros((block_k, hd), jnp.float32),
         jnp.zeros((block_k, hd), jnp.float32),
         jnp.zeros((block_k,), jnp.float32)))
    if scale != 1.0:
        dk = dk * scale
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)
    dbias_ref[0, 0, :] = dbias


def _flash_fwd(q, k, v, bias, q_offset, scale, causal, block_q, block_k,
               interpret):
    out, lse = _flash_fwd_impl(q, k, v, bias, q_offset, scale, causal, block_q,
                               block_k, interpret)
    return out, (q, k, v, bias, q_offset, out, lse)


def _flash_bwd(scale, causal, block_q, block_k, interpret, res, g):
    q, k, v, bias, q_offset, out, lse = res
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

    dq_grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(BH, Sq // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, hd), lambda bh, qi, s: (bh, qi, 0)),
            pl.BlockSpec((1, Sk, hd), lambda bh, qi, s: (bh, 0, 0)),
            pl.BlockSpec((1, Sk, hd), lambda bh, qi, s: (bh, 0, 0)),
            pl.BlockSpec((1, 1, Sk), lambda bh, qi, s: (bh, 0, 0)),
            pl.BlockSpec((1, block_q, hd), lambda bh, qi, s: (bh, qi, 0)),
            vec_spec(block_q),
            vec_spec(block_q),
        ],
        out_specs=pl.BlockSpec((1, block_q, hd),
                               lambda bh, qi, s: (bh, qi, 0)),
    )
    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, scale=scale, causal=causal,
                          block_k=block_k, seq_k=Sk),
        out_shape=jax.ShapeDtypeStruct((BH, Sq, hd), q.dtype),
        grid_spec=dq_grid,
        interpret=interpret,
    )(qoff, qf, kf, vf, bias_f, dof, lse, Dval)

    dkv_grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(BH, Sk // block_k),
        in_specs=[
            pl.BlockSpec((1, Sq, hd), lambda bh, kb, s: (bh, 0, 0)),
            pl.BlockSpec((1, block_k, hd), lambda bh, kb, s: (bh, kb, 0)),
            pl.BlockSpec((1, block_k, hd), lambda bh, kb, s: (bh, kb, 0)),
            pl.BlockSpec((1, 1, block_k), lambda bh, kb, s: (bh, 0, kb)),
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
                          block_q=block_q, seq_q=Sq),
        out_shape=(jax.ShapeDtypeStruct((BH, Sk, hd), k.dtype),
                   jax.ShapeDtypeStruct((BH, Sk, hd), v.dtype),
                   jax.ShapeDtypeStruct((BH, 1, Sk), jnp.float32)),
        grid_spec=dkv_grid,
        interpret=interpret,
    )(qoff, qf, kf, vf, bias_f, dof, lse, Dval)

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
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype),
            dbias.astype(bias.dtype), dqoff)


flash_attention.defvjp(_flash_fwd, _flash_bwd)


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
