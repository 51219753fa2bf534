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

Attention without unsupported vector ops: Mosaic rejects lane<->sublane
shape casts ((B, D) -> (B*D, 1) is "unsupported shape cast"), transposes,
and unaligned lane slices — so everything here is 2D matmuls against
CONSTANT iota masks, broadcasts, and sublane reductions. The decode cache
keeps layer keys/values head-major per batch row: (L, B, T, D) with
D = H*hd packed in the lane axis (fully tile-aligned at any head_dim; the
(B, H, T, hd) layout wastes half the lanes at hd=64 and forces relayout
copies). Per batch row b:

    scores(T, H) = ((K_b * q_b) @ Hmask) * scale + bias_b
    out_b(1, D)  = sum_T (probs @ HmaskT * V_b)

where Hmask[d, h] = (d // hd == h) collapses each head's lane group — the
head dimension never has to be split out of the lane axis. All rows batch
through ONE leading-dim-merged matmul per stage ((B·T, D) @ Hmask — a
leading-dim reshape keeps the lane axis intact, so Mosaic accepts it) with
rank-3 broadcasts and axis-1 (key) reductions in between. The current
token's k/v (not yet in the cache — the caller writes them after the
kernel) joins the softmax as one extra merged column.

The additive bias operand (B, T, H) + its merged-column row (B, H) carries
key-padding + strict causality for GPT and additionally the per-head ALiBi
ramp for Bloom — score biases that are (batch, key, head)-separable fold
into the same two tensors, so one kernel serves both families.

Numerics mirror the XLA decode fast path (models/gpt.py _gpt_block S==1):
fp32 q*k products (bf16 products are exact in fp32) accumulated on the MXU
in fp32, fp32 masked softmax, fp32 AV, LN statistics in fp32 with eps
inside the sqrt (reference transformer.py:79-89). Greedy outputs are
token-identical to the per-layer path in the fp32 parity mode (asserted in
tests/test_fused_decode.py); on-device bf16 greedy agrees to summation-order
noise (cross-kernel bf16 bit-parity is unattainable — CLAUDE.md).
"""

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cleantransformer_tpu.ops.activations import ACT2FN


def fits_vmem(B, T, D, F, H, weight_bytes=2, cache_bytes=2, kv_int8=False,
              limit=100 * 1024 * 1024):
    """Static check that one double-buffered layer block (weights + k/v
    cache + the (B, T, H) fp32 bias plane + — for an int8 cache — the two
    (B, T, H) fp32 scale planes) fits the kernel's VMEM budget —
    long-context callers (serving at large max_len) fall back to the XLA
    per-layer path instead of failing the Mosaic allocation."""
    weights = (3 * D * D + D * D + 2 * D * F) * weight_bytes
    cache = 2 * B * T * D * cache_bytes
    planes = (3 if kv_int8 else 1) * B * T * H * 4
    scratch = 4 * B * D
    return 2 * (weights + cache + planes) + scratch < limit


def vmem_claim(need_bytes, park_bytes, total=int(127.5 * 1024 * 1024)):
    """The kernel's vmem_limit_bytes claim, given its double-buffered block
    footprint and the lm_head table the caller wants VMEM-parked.

    Over-claiming evicts XLA's parked buffers for the REST of the decode
    step: at GPT-2 b8 a flat 110 MB claim pushed the 77 MB wte out of VMEM
    and the lm_head+argmax fusion from ~55 us (parked, ~1.4 TB/s) to
    ~122 us (HBM-rate re-read) — ~15% of the step. So when the block set
    (+50% Mosaic working-set margin) AND the table fit VMEM together, claim
    only what the kernel needs; otherwise parking is impossible anyway and
    a tight claim just constrains the kernel's buffering (measured: Bloom
    b8 1.25 -> 1.88 ms, its 514 MB table can never park), so claim big.
    A generous claim sized to exactly fill the remainder also loses
    (gpt2 int8 b8 0.22 -> 0.31 ms): XLA needs slack for the step's other
    fusions, so keep the claim tight when parking."""
    tight = max(int(need_bytes * 1.5), 32 * 1024 * 1024)
    if park_bytes and tight + park_bytes <= total:
        return tight
    return 110 * 1024 * 1024


def _ln(x, w, b, eps, cdt):
    """Reference LayerNorm (eps inside sqrt; fp32 stats) on a (B, D) tile."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    cen = xf - mu
    std = jnp.mean(cen * cen + eps, axis=-1, keepdims=True) ** 0.5
    out = (cen / std).astype(cdt)
    return w[0, 0].astype(cdt) * out + b[0, 0].astype(cdt)


def _gpt_decode_kernel(s_ref, x_ref, bias_ref, bcur_ref, ln1w, ln1b, wqkv,
                       sqkv, bqkv, wproj, sproj, bproj, ln2w, ln2b, wfc, sfc,
                       bfc, wfc2, sfc2, bfc2, ck_ref, sk_ref, cv_ref, sv_ref,
                       *tail, B, H, D, hd, L, eps, act, scale, pre_ln,
                       kv_int8, inplace):
    # tail = outputs + [h_scr]: legacy (y, nk, nv) returns the new rows for a
    # caller-side dynamic_update_slice (ragged serving offsets need it);
    # inplace (y, ok, ov[, oks, ovs]) writes the current token's k/v (and
    # int8 scales) STRAIGHT into 8-row-aligned windows of the aliased cache
    # buffers at token s_ref[0] — the caller's 2 DUS of L*B scattered
    # tile-runs (~77 us at b32) disappear.
    h_scr = tail[-1]
    if inplace:
        if kv_int8:
            y_ref, ok_ref, oks_ref, ov_ref, ovs_ref = tail[:-1]
        else:
            y_ref, ok_ref, ov_ref = tail[:-1]
        nk_dt = x_ref.dtype if kv_int8 else ok_ref.dtype
    else:
        y_ref, nk_ref, nv_ref = tail[:-1]
        nk_dt = nk_ref.dtype
    l = pl.program_id(0)
    cdt = x_ref.dtype

    @pl.when(l == 0)
    def _init():
        h_scr[:] = x_ref[:]

    # constant head-collapse masks: Hmask[d, h] = lane d belongs to head h
    hm = (jax.lax.broadcasted_iota(jnp.int32, (D, H), 0) // hd
          == jax.lax.broadcasted_iota(jnp.int32, (D, H), 1)
          ).astype(jnp.float32)
    hmT = (jax.lax.broadcasted_iota(jnp.int32, (H, D), 0)
           == jax.lax.broadcasted_iota(jnp.int32, (H, D), 1) // hd
           ).astype(jnp.float32)
    if kv_int8:
        # per-head helpers for the merged current column's in-kernel
        # quantize round-trip (the XLA path reads the current k/v back from
        # the quantized cache — the kernel must see the same rounding)
        lane_head = jax.lax.broadcasted_iota(jnp.int32, (1, D), 1) // hd
        iota_h = jax.lax.broadcasted_iota(jnp.int32, (1, H), 1)

        def quantize_rows(x):
            """(B, D) float -> (int-valued (B, D), scale heads (B, H)) —
            cache_write's per-(b, h) symmetric int8 quantization
            (models/gpt.py), batched over rows without transposes: each
            head's lane-group max is taken under a CONSTANT per-head lane
            mask and scattered into the (B, H) scale plane."""
            ax = jnp.abs(x)
            sc_h = jnp.zeros((B, H), jnp.float32)
            for h in range(H):
                sel = (lane_head == h).astype(jnp.float32)      # (1, D)
                amax = jnp.max(ax * sel + (sel - 1.0) * 1e30,
                               axis=1, keepdims=True)           # (B, 1)
                sc_h = sc_h + (amax / 127.0) * (iota_h == h).astype(
                    jnp.float32)
            sc_h = jnp.maximum(sc_h, 1e-8)                      # (B, H)
            sc_lanes = jnp.dot(sc_h, hmT,
                               preferred_element_type=jnp.float32)
            q = jnp.clip(jnp.round(x / sc_lanes), -127, 127)
            return q, sc_h

    def attn(x):
        # qkv projection (linear() semantics: matmul -> cdt, bias in cdt).
        # s* are per-output-channel int8 dequant scales (ops/quant.py
        # quantized_matmul: y = (x @ q) * s); exactly 1.0 when unquantized,
        # so the fp32 bit-parity with the per-layer path is preserved.
        qkv = jnp.dot(x, wqkv[0].astype(cdt),
                      preferred_element_type=jnp.float32).astype(cdt)
        qkv = qkv * sqkv[0, 0].astype(cdt) + bqkv[0, 0].astype(cdt)
        q, k_t, v_t = qkv[:, :D], qkv[:, D:2 * D], qkv[:, 2 * D:]
        # the cache may be narrower than the compute dtype (serving keeps a
        # bf16 cache under fp32-config int8 models); the merged current
        # column must see the SAME rounding the cache write applies — the
        # XLA path reads the current k/v back from the cache post-write
        k_t = k_t.astype(nk_dt)
        v_t = v_t.astype(nk_dt)
        if not inplace:
            nk_ref[0] = k_t
            nv_ref[0] = v_t
        qf = q.astype(jnp.float32)
        kf_t = k_t.astype(jnp.float32)
        vf_t = v_t.astype(jnp.float32)
        bcur = bcur_ref[:].astype(jnp.float32)                  # (B, H)

        # All rows at once (the per-row unrolled loop cost ~40% of the b32
        # kernel in VPU row extract/scatter): rank-3 broadcasts, ONE
        # leading-dim-merged head-collapse matmul per stage, and axis-1
        # (key) reductions — all Mosaic-legal, no lane<->sublane casts.
        T = ck_ref.shape[2]
        kc = ck_ref[0].astype(jnp.float32)                      # (B, T, D)
        s = jnp.dot((kc * qf[:, None, :]).reshape(B * T, D), hm,
                    preferred_element_type=jnp.float32).reshape(B, T, H)
        if kv_int8:
            # dequant scales are per (key, head): exactly the XLA int8
            # path's ``(q@k) * k_scale`` column scaling (_attend)
            s = s * sk_ref[0]
            kq, sck_h = quantize_rows(kf_t)                     # (B, D/H)
        else:
            kq = kf_t
        s = s * scale + bias_ref[:].astype(jnp.float32)         # (B, T, H)
        s_cur = jnp.dot(kq * qf, hm,
                        preferred_element_type=jnp.float32)     # (B, H)
        if kv_int8:
            s_cur = s_cur * sck_h
        s_cur = s_cur * scale + bcur                            # (B, H)
        m = jnp.maximum(jnp.max(s, axis=1), s_cur)              # (B, H)
        p = jnp.exp(s - m[:, None, :])                          # (B, T, H)
        pc = jnp.exp(s_cur - m)                                 # (B, H)
        den = jnp.sum(p, axis=1) + pc                           # (B, H)
        vc = cv_ref[0].astype(jnp.float32)                      # (B, T, D)
        if kv_int8:
            # XLA's v_scale branch keeps fp32 probs and folds the value
            # scales onto them (_softmax_av): out = (w * s_v) @ v_int
            vq, scv_h = quantize_rows(vf_t)
            pn = (p / den[:, None, :]) * sv_ref[0]
            pcn = (pc / den) * scv_h
        else:
            # probs round-trip through compute dtype before AV — mirrors
            # the XLA decode path's w.astype(v.dtype) (_softmax_av),
            # keeping bf16 drift down to summation-order noise
            vq = vf_t
            pn = (p / den[:, None, :]).astype(cdt).astype(jnp.float32)
            pcn = (pc / den).astype(cdt).astype(jnp.float32)
        pexp = jnp.dot(pn.reshape(B * T, H), hmT,
                       preferred_element_type=jnp.float32).reshape(B, T, D)
        out = jnp.sum(pexp * vc, axis=1)                        # (B, D)
        out = out + jnp.dot(pcn, hmT,
                            preferred_element_type=jnp.float32) * vq

        if inplace:
            # merge the current token's row into the 8-row-aligned cache
            # window at token s_ref[0] (rows beyond it are still unwritten
            # zeros / stale — the bias strictly masks them)
            base = (s_ref[0] // 8) * 8
            r = s_ref[0] % 8
            ti = jax.lax.broadcasted_iota(jnp.int32, (B, 8, D), 1)
            kwnd = ck_ref[0, :, pl.ds(base, 8), :]
            vwnd = cv_ref[0, :, pl.ds(base, 8), :]
            if kv_int8:
                ok_ref[0] = jnp.where(ti == r,
                                      kq.astype(jnp.int8)[:, None, :], kwnd)
                ov_ref[0] = jnp.where(ti == r,
                                      vq.astype(jnp.int8)[:, None, :], vwnd)
                th = jax.lax.broadcasted_iota(jnp.int32, (B, 8, H), 1)
                oks_ref[0] = jnp.where(th == r, sck_h[:, None, :],
                                       sk_ref[0, :, pl.ds(base, 8), :])
                ovs_ref[0] = jnp.where(th == r, scv_h[:, None, :],
                                       sv_ref[0, :, pl.ds(base, 8), :])
            else:
                ok_ref[0] = jnp.where(ti == r, k_t[:, None, :], kwnd)
                ov_ref[0] = jnp.where(ti == r, v_t[:, None, :], vwnd)

        a = out.astype(cdt)
        o = jnp.dot(a, wproj[0].astype(cdt),
                    preferred_element_type=jnp.float32).astype(cdt)
        return o * sproj[0, 0].astype(cdt) + bproj[0, 0].astype(cdt)

    def mlp(x):
        u = jnp.dot(x, wfc[0].astype(cdt),
                    preferred_element_type=jnp.float32).astype(cdt)
        u = act(u * sfc[0, 0].astype(cdt) + bfc[0, 0].astype(cdt))
        o = jnp.dot(u.astype(cdt), wfc2[0].astype(cdt),
                    preferred_element_type=jnp.float32).astype(cdt)
        return o * sfc2[0, 0].astype(cdt) + bfc2[0, 0].astype(cdt)

    h = h_scr[:]
    if pre_ln:  # gpt2/gpt3 (modeling_gpt.py:147-152)
        h = h + attn(_ln(h, ln1w, ln1b, eps, cdt))
        h = h + mlp(_ln(h, ln2w, ln2b, eps, cdt))
    else:       # gpt post-LN (modeling_gpt.py:141-146)
        h = _ln(h + attn(h), ln1w, ln1b, eps, cdt)
        h = _ln(h + mlp(h), ln2w, ln2b, eps, cdt)
    h_scr[:] = h
    y_ref[:] = h


@functools.partial(jax.jit, static_argnames=("n_head", "eps", "act", "scale",
                                              "pre_ln", "park_bytes",
                                              "interpret"))
def fused_decode_step(stack, h0, bias, bias_cur, cache_k, cache_v, *,
                      n_head, eps, act, scale, pre_ln, cache_len=None,
                      park_bytes=0, interpret=False):
    """One decode step over the whole stack (model-agnostic core).

    cache_len: traced scalar token position, or None. When given (and T is
    8-aligned), the kernel writes the current token's k/v — quantized, with
    the scale planes, for an int8 cache — into the ALIASED cache buffers
    in-kernel, and the returned cache arrays replace the caller's; the
    caller-side dynamic_update_slice (L*B scattered tile-runs, ~77 us at
    GPT-2 b32) disappears. None (ragged serving offsets) keeps the legacy
    contract: new rows are returned for fused_cache_append.

    park_bytes: size of the buffer the caller wants XLA to keep VMEM-parked
    across decode steps (the lm_head table) — shrinks the kernel's VMEM
    claim when, and only when, kernel blocks + that buffer fit together.

    stack: dict of stacked per-layer tensors in canonical pre/post-LN block
      order — ln1w/ln1b (L, D), wqkv (L, D, 3D) with CONTIGUOUS q|k|v
      column groups, bqkv (L, 3D), wproj (L, D, D), bproj (L, D),
      ln2w/ln2b (L, D), wfc (L, D, F), bfc (L, F), wfc2 (L, F, D),
      bfc2 (L, D). GPT params are already in this shape
      (models/gpt.py init_gpt_params); Bloom permutes its head-interleaved
      qkv columns once per generate (models/bloom.py prepare_decode_params).
    h0: (B, D) embedded current token (compute dtype).
    bias: (B, T, H) fp32 additive score bias over cache keys — key padding
      + strict causality (col < cache_len; the current token rides the
      merged extra column), plus the ALiBi ramp for Bloom-family callers.
    bias_cur: (B, H) fp32 additive bias for the merged current-token column
      (zeros for GPT; ALiBi at the current key position for Bloom).
    cache_k/v: (L, B, T, D) head-major cache (init_kv_cache fused branch),
      OR int8 pytrees {"q": int8 (L, B, T, D), "s": f32 (L, B, T, H)}
      (config.kv_cache_int8): keys/values stream int8 and dequantize
      in-kernel via the per-(key, head) scale planes.
    act: activation NAME (ops/activations.ACT2FN key) — static/hashable.

    Returns (y (B, D) final hidden pre-ln_f, new_k, new_v). In-place mode:
    new_k/new_v ARE the updated cache buffers (int8: {"q", "s"} pytrees) —
    drop them into the cache dict directly. Legacy mode: (L, B, D) rows in
    the COMPUTE dtype for the caller's fused_cache_append."""
    kv_int8 = isinstance(cache_k, dict)
    if kv_int8:
        cache_k, sk = cache_k["q"], cache_k["s"]
        cache_v, sv = cache_v["q"], cache_v["s"]
    L, B, T, D = cache_k.shape
    H = n_head
    hd = D // H
    if not kv_int8:  # dummy scale planes keep one operand list (tiny)
        sk = sv = jnp.ones((L, 1, 1, H), jnp.float32)

    def vec(p):  # (L, X) -> (L, 1, X): sublane-1 blocks ride as (1,1,X)
        return p.reshape(L, 1, p.shape[-1])

    def wpair(w):
        # int8 weight-only quantization (ops/quant.py): {"q": int8 (L,in,out),
        # "s": (L,out)} streams half the HBM bytes; the convert + column
        # scaling happen in-kernel. Unquantized weights ride with scale 1.
        if isinstance(w, dict):
            return w["q"], vec(w["s"])
        return w, jnp.ones((L, 1, w.shape[-1]), h0.dtype)

    wqkv, sqkv = wpair(stack["wqkv"])
    wproj, sproj = wpair(stack["wproj"])
    wfc, sfc = wpair(stack["wfc"])
    wfc2, sfc2 = wpair(stack["wfc2"])
    F = wfc.shape[-1]

    operands = (
        h0, bias, bias_cur,
        vec(stack["ln1w"]), vec(stack["ln1b"]),
        wqkv, sqkv, vec(stack["bqkv"]),
        wproj, sproj, vec(stack["bproj"]),
        vec(stack["ln2w"]), vec(stack["ln2b"]),
        wfc, sfc, vec(stack["bfc"]),
        wfc2, sfc2, vec(stack["bfc2"]),
        cache_k, sk, cache_v, sv,
    )

    def fixed(shape):
        return pl.BlockSpec(shape, lambda l, s: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    def per_layer(shape):
        return pl.BlockSpec((1,) + shape,
                            lambda l, s: (l,) + (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    def token_window(shape):  # 8-row-aligned (l, :, tok//8-block, :) window
        return pl.BlockSpec((1, shape[0], 8, shape[1]),
                            lambda l, s: (l, 0, s[0] // 8, 0),
                            memory_space=pltpu.VMEM)

    # scale planes are unread refs when not quantized (static kv_int8 flag)
    sk_spec = per_layer((B, T, H)) if kv_int8 else per_layer((1, 1, H))
    in_specs = [
        fixed((B, D)), fixed((B, T, H)), fixed((B, H)),
        per_layer((1, D)), per_layer((1, D)),
        per_layer((D, 3 * D)), per_layer((1, 3 * D)), per_layer((1, 3 * D)),
        per_layer((D, D)), per_layer((1, D)), per_layer((1, D)),
        per_layer((1, D)), per_layer((1, D)),
        per_layer((D, F)), per_layer((1, F)), per_layer((1, F)),
        per_layer((F, D)), per_layer((1, D)), per_layer((1, D)),
        per_layer((B, T, D)), sk_spec, per_layer((B, T, D)), sk_spec,
    ]
    new_kv_dtype = h0.dtype if kv_int8 else cache_k.dtype
    inplace = cache_len is not None and T % 8 == 0
    if inplace:
        # write the token's k/v (and int8 scales) into 8-row windows of the
        # ALIASED cache buffers in-kernel — no caller-side DUS. Operand
        # indices for input_output_aliases count the scalar-prefetch arg.
        if kv_int8:
            out_specs = [fixed((B, D)),
                         token_window((B, D)), token_window((B, H)),
                         token_window((B, D)), token_window((B, H))]
            out_shape = [jax.ShapeDtypeStruct((B, D), h0.dtype),
                         jax.ShapeDtypeStruct((L, B, T, D), cache_k.dtype),
                         jax.ShapeDtypeStruct((L, B, T, H), sk.dtype),
                         jax.ShapeDtypeStruct((L, B, T, D), cache_v.dtype),
                         jax.ShapeDtypeStruct((L, B, T, H), sv.dtype)]
            aliases = {20: 1, 21: 2, 22: 3, 23: 4}
        else:
            out_specs = [fixed((B, D)),
                         token_window((B, D)), token_window((B, D))]
            out_shape = [jax.ShapeDtypeStruct((B, D), h0.dtype),
                         jax.ShapeDtypeStruct((L, B, T, D), cache_k.dtype),
                         jax.ShapeDtypeStruct((L, B, T, D), cache_v.dtype)]
            aliases = {20: 1, 22: 2}
    else:
        out_specs = [fixed((B, D)), per_layer((B, D)), per_layer((B, D))]
        out_shape = [jax.ShapeDtypeStruct((B, D), h0.dtype),
                     jax.ShapeDtypeStruct((L, B, D), new_kv_dtype),
                     jax.ShapeDtypeStruct((L, B, D), new_kv_dtype)]
        aliases = {}

    kernel = functools.partial(
        _gpt_decode_kernel, B=B, H=H, D=D, hd=hd, L=L,
        eps=eps, act=ACT2FN[act], scale=scale, pre_ln=pre_ln,
        kv_int8=kv_int8, inplace=inplace)

    wbytes = sum(w.dtype.itemsize * w.size // L
                 for w in (wqkv, wproj, wfc, wfc2))
    cache_blk = 2 * B * T * D * cache_k.dtype.itemsize
    planes = (2 * B * T * H * 4 if kv_int8 else 0) + B * T * H * 4
    fixed_ops = B * D * h0.dtype.itemsize * 5 + B * H * 4
    need = 2 * (wbytes + cache_blk + planes) + fixed_ops
    vmem_cap = vmem_claim(need, park_bytes)

    tok = (jnp.zeros((1,), jnp.int32) if cache_len is None
           else jnp.reshape(cache_len, (1,)).astype(jnp.int32))
    outs = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(L,),
            in_specs=in_specs,
            out_specs=out_specs,
            scratch_shapes=[pltpu.VMEM((B, D), h0.dtype)]),
        out_shape=out_shape,
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=vmem_cap),
        interpret=interpret,
    )(tok, *operands)
    if inplace and kv_int8:
        y, ckq, cks, cvq, cvs = outs
        return y, {"q": ckq, "s": cks}, {"q": cvq, "s": cvs}
    y, k_out, v_out = outs
    return y, k_out, v_out


def _gpt_window_kernel(cl_ref, x_ref, bias_ref, ln1w, ln1b, wqkv, sqkv,
                       bqkv, wproj, sproj, bproj, ln2w, ln2b, wfc, sfc, bfc,
                       wfc2, sfc2, bfc2, ck_ref, sk_ref, cv_ref, sv_ref,
                       y_ref, nk_ref, nv_ref, h_scr, *, S, B, H, D, hd, L,
                       eps, act, scale, pre_ln, kv_int8):
    """S-token decode window (2 <= S <= ~16): the whole stack as one
    grid-(L,) program, like _gpt_decode_kernel, but with S current tokens
    per row — the shape of a speculative verify window (S = draft_len + 1),
    a draft catch-up window, or a short serving chunk. Replaces the
    ~10-kernels-per-layer XLA chain those paths previously fell back to
    (reference hot loop: generation_util.py:57-119 feeds multi-token
    windows through the same per-layer module chain).

    Every query is processed by a STATIC per-s loop sharing the layer's
    streamed weights: all values stay rank <= 3 with (B, ...) trailing dims,
    because merging the window axis into the sublane axis ((S, B, D) ->
    (S*B, D)) is a Mosaic relayout when B % 8 != 0 — and B = 1 is the
    flagship speculative shape. Per-s matmuls cost the same MXU blocks as a
    batched one whenever B is a sublane multiple, and the kernel is
    weight-stream-bound at small B anyway.

    In-window attention: the window tokens' k/v (quantized, for an int8
    cache) are INSERTED into the loaded cache block in VMEM at their true
    buffer columns cache_len + j (cl_ref rides as a (B, 1) per-row column
    operand, so scalar and ragged serving offsets share one code path), and
    every query then runs the S==1 kernel's single-block masked softmax
    with a per-query causal clamp (col <= cache_len + s). Because the
    reductions see the same values at the same positions as the XLA
    per-layer path (which writes the cache before attending), fp32 outputs
    stay bit-exact — a merged-extra-columns scheme (the S==1 kernel's
    trick) changes the reduction grouping once there is more than one
    current column and drifts at float rounding level.

    Window writes are legacy-mode only: the new k/v rows return as
    (L, S, B, D) for a caller DUS — S contiguous head-major rows per
    (layer, batch) are a cheap lane-contiguous update, unlike the S==1
    scattered single-row case that needed in-kernel aliasing."""
    l = pl.program_id(0)
    cdt = x_ref.dtype
    nk_dt = x_ref.dtype if kv_int8 else nk_ref.dtype
    T = ck_ref.shape[2]

    @pl.when(l == 0)
    def _init():
        h_scr[:] = x_ref[:]

    hm = (jax.lax.broadcasted_iota(jnp.int32, (D, H), 0) // hd
          == jax.lax.broadcasted_iota(jnp.int32, (D, H), 1)
          ).astype(jnp.float32)
    hmT = (jax.lax.broadcasted_iota(jnp.int32, (H, D), 0)
           == jax.lax.broadcasted_iota(jnp.int32, (H, D), 1) // hd
           ).astype(jnp.float32)
    if kv_int8:
        lane_head = jax.lax.broadcasted_iota(jnp.int32, (1, D), 1) // hd
        iota_h = jax.lax.broadcasted_iota(jnp.int32, (1, H), 1)

        def quantize_rows(x):
            """(B, D) -> (int-valued (B, D), per-head scales (B, H)) —
            cache_write's symmetric int8 math (see _gpt_decode_kernel)."""
            ax = jnp.abs(x)
            sc_h = jnp.zeros((B, H), jnp.float32)
            for h in range(H):
                sel = (lane_head == h).astype(jnp.float32)
                amax = jnp.max(ax * sel + (sel - 1.0) * 1e30,
                               axis=1, keepdims=True)
                sc_h = sc_h + (amax / 127.0) * (iota_h == h).astype(
                    jnp.float32)
            sc_h = jnp.maximum(sc_h, 1e-8)
            sc_lanes = jnp.dot(sc_h, hmT,
                               preferred_element_type=jnp.float32)
            q = jnp.clip(jnp.round(x / sc_lanes), -127, 127)
            return q, sc_h

    def project(x, w, s_cols, b):
        o = jnp.dot(x, w[0].astype(cdt),
                    preferred_element_type=jnp.float32).astype(cdt)
        return o * s_cols[0, 0].astype(cdt) + b[0, 0].astype(cdt)

    # rank-3 column iota and (B, 1, 1) offsets: comparisons produce the
    # (B, T, 1) masks directly — expanding a (B, T) BOOL with [:, :, None]
    # is an i1 minor-dim insert Mosaic rejects ("only supported for 32-bit
    # types"); int32 reshapes are fine
    col3 = jax.lax.broadcasted_iota(jnp.int32, (B, T, 1), 1)
    cl3 = cl_ref[:].reshape(B, 1, 1)                         # int32

    kc = ck_ref[0].astype(jnp.float32)                       # (B, T, D)
    vc = cv_ref[0].astype(jnp.float32)
    if kv_int8:
        skp = sk_ref[0]                                      # (B, T, H)
        svp = sv_ref[0]
    bias = bias_ref[:].astype(jnp.float32)                   # (B, T, H)

    # pass 1 — window qkv; insert each token's k/v (and int8 scales) into
    # the loaded cache block at its true buffer column cache_len + s, so
    # the attention reductions below see exactly what the XLA path reads
    # back from the post-write cache
    qs = []
    for s in range(S):
        x = h_scr[s]
        if pre_ln:
            x = _ln(x, ln1w, ln1b, eps, cdt)
        qkv = jnp.dot(x, wqkv[0].astype(cdt),
                      preferred_element_type=jnp.float32).astype(cdt)
        qkv = qkv * sqkv[0, 0].astype(cdt) + bqkv[0, 0].astype(cdt)
        k_t = qkv[:, D:2 * D].astype(nk_dt)
        v_t = qkv[:, 2 * D:].astype(nk_dt)
        nk_ref[0, s] = k_t
        nv_ref[0, s] = v_t
        qs.append(qkv[:, :D].astype(jnp.float32))
        ins = col3 == cl3 + s                                # (B, T, 1)
        if kv_int8:
            kq_s, ksc_s = quantize_rows(k_t.astype(jnp.float32))
            vq_s, vsc_s = quantize_rows(v_t.astype(jnp.float32))
            kc = jnp.where(ins, kq_s[:, None, :], kc)
            vc = jnp.where(ins, vq_s[:, None, :], vc)
            skp = jnp.where(ins, ksc_s[:, None, :], skp)
            svp = jnp.where(ins, vsc_s[:, None, :], svp)
        else:
            kc = jnp.where(ins, k_t.astype(jnp.float32)[:, None, :], kc)
            vc = jnp.where(ins, v_t.astype(jnp.float32)[:, None, :], vc)

    # pass 2 — per-query single-block attention + block epilogue
    for s in range(S):
        qf = qs[s]                                           # (B, D)
        sc = jnp.dot((kc * qf[:, None, :]).reshape(B * T, D), hm,
                     preferred_element_type=jnp.float32).reshape(B, T, H)
        if kv_int8:
            sc = sc * skp
        sc = sc * scale + bias                               # (B, T, H)
        sc = jnp.where(col3 <= cl3 + s, sc, -1e30)
        m = jnp.max(sc, axis=1)                              # (B, H)
        p = jnp.exp(sc - m[:, None, :])
        den = jnp.sum(p, axis=1)                             # (B, H)
        if kv_int8:
            pn = (p / den[:, None, :]) * svp
        else:
            pn = (p / den[:, None, :]).astype(cdt).astype(jnp.float32)
        pexp = jnp.dot(pn.reshape(B * T, H), hmT,
                       preferred_element_type=jnp.float32).reshape(B, T, D)
        out = jnp.sum(pexp * vc, axis=1)                     # (B, D)
        o = project(out.astype(cdt), wproj, sproj, bproj)
        if pre_ln:  # gpt2/gpt3 residual order (modeling_gpt.py:147-152)
            h = h_scr[s] + o
            u = project(_ln(h, ln2w, ln2b, eps, cdt), wfc, sfc, bfc)
            h = h + project(act(u).astype(cdt), wfc2, sfc2, bfc2)
        else:       # gpt post-LN (modeling_gpt.py:141-146)
            h = _ln(h_scr[s] + o, ln1w, ln1b, eps, cdt)
            u = project(h, wfc, sfc, bfc)
            h = _ln(h + project(act(u).astype(cdt), wfc2, sfc2, bfc2),
                    ln2w, ln2b, eps, cdt)
        h_scr[s] = h
        y_ref[s] = h


@functools.partial(jax.jit, static_argnames=("n_head", "eps", "act", "scale",
                                              "pre_ln", "park_bytes",
                                              "interpret"))
def fused_decode_window(stack, hw, bias, cache_len, cache_k, cache_v, *,
                        n_head, eps, act, scale, pre_ln, park_bytes=0,
                        interpret=False):
    """S-token decode window over the whole stack (see _gpt_window_kernel).

    hw: (S, B, D) embedded window tokens (compute dtype), window-major so
      every kernel value keeps (B, ...) trailing dims.
    bias: (B, T, H) fp32 additive KEY bias covering the whole buffer —
      padding (and ALiBi for Bloom-family callers) at every column,
      including the window's own columns [cache_len, cache_len + S). NO
      causal term: the kernel owns causality (query s clamps columns
      > cache_len + s, which also excludes stale/unwritten cache rows).
    cache_len: scalar or (B,) per-row token offsets (traced) — where the
      window starts in the buffer.

    Returns (y (S, B, D) final hiddens pre-ln_f, new_k, new_v (L, S, B, D)
    rows in the compute dtype) — the caller writes them with
    fused_cache_append (which quantizes for an int8 cache)."""
    kv_int8 = isinstance(cache_k, dict)
    if kv_int8:
        cache_k, sk = cache_k["q"], cache_k["s"]
        cache_v, sv = cache_v["q"], cache_v["s"]
    L, B, T, D = cache_k.shape
    S = hw.shape[0]
    H = n_head
    hd = D // H
    if not kv_int8:
        sk = sv = jnp.ones((L, 1, 1, H), jnp.float32)
    cl2d = jnp.broadcast_to(jnp.reshape(cache_len, (-1, 1)),
                            (B, 1)).astype(jnp.int32)

    def vec(p):
        return p.reshape(L, 1, p.shape[-1])

    def wpair(w):
        if isinstance(w, dict):
            return w["q"], vec(w["s"])
        return w, jnp.ones((L, 1, w.shape[-1]), hw.dtype)

    wqkv, sqkv = wpair(stack["wqkv"])
    wproj, sproj = wpair(stack["wproj"])
    wfc, sfc = wpair(stack["wfc"])
    wfc2, sfc2 = wpair(stack["wfc2"])
    F = wfc.shape[-1]

    operands = (
        cl2d, hw, bias,
        vec(stack["ln1w"]), vec(stack["ln1b"]),
        wqkv, sqkv, vec(stack["bqkv"]),
        wproj, sproj, vec(stack["bproj"]),
        vec(stack["ln2w"]), vec(stack["ln2b"]),
        wfc, sfc, vec(stack["bfc"]),
        wfc2, sfc2, vec(stack["bfc2"]),
        cache_k, sk, cache_v, sv,
    )

    def fixed(shape):
        return pl.BlockSpec(shape, lambda l: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    def per_layer(shape):
        return pl.BlockSpec((1,) + shape, lambda l: (l,) + (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    sk_spec = per_layer((B, T, H)) if kv_int8 else per_layer((1, 1, H))
    in_specs = [
        fixed((B, 1)), fixed((S, B, D)), fixed((B, T, H)),
        per_layer((1, D)), per_layer((1, D)),
        per_layer((D, 3 * D)), per_layer((1, 3 * D)), per_layer((1, 3 * D)),
        per_layer((D, D)), per_layer((1, D)), per_layer((1, D)),
        per_layer((1, D)), per_layer((1, D)),
        per_layer((D, F)), per_layer((1, F)), per_layer((1, F)),
        per_layer((F, D)), per_layer((1, D)), per_layer((1, D)),
        per_layer((B, T, D)), sk_spec, per_layer((B, T, D)), sk_spec,
    ]
    new_kv_dtype = hw.dtype if kv_int8 else cache_k.dtype
    out_specs = [fixed((S, B, D)),
                 per_layer((S, B, D)), per_layer((S, B, D))]
    out_shape = [jax.ShapeDtypeStruct((S, B, D), hw.dtype),
                 jax.ShapeDtypeStruct((L, S, B, D), new_kv_dtype),
                 jax.ShapeDtypeStruct((L, S, B, D), new_kv_dtype)]

    kernel = functools.partial(
        _gpt_window_kernel, S=S, B=B, H=H, D=D, hd=hd, L=L,
        eps=eps, act=ACT2FN[act], scale=scale, pre_ln=pre_ln,
        kv_int8=kv_int8)

    wbytes = sum(w.dtype.itemsize * w.size // L
                 for w in (wqkv, wproj, wfc, wfc2))
    cache_blk = 2 * B * T * D * cache_k.dtype.itemsize
    planes = (2 * B * T * H * 4 if kv_int8 else 0) + B * T * H * 4
    fixed_ops = S * B * D * hw.dtype.itemsize * 6 + S * B * H * 4
    # the per-s loop keeps two fp32 (B, T, D) cache copies + one (B, T, D)
    # score intermediate live — count them in the claim
    live_f32 = 3 * B * T * D * 4
    need = 2 * (wbytes + cache_blk + planes
                + 2 * S * B * D * new_kv_dtype.itemsize) + fixed_ops + live_f32
    vmem_cap = vmem_claim(need, park_bytes)

    y, k_out, v_out = pl.pallas_call(
        kernel,
        grid=(L,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((S, B, D), hw.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=vmem_cap),
        interpret=interpret,
    )(*operands)
    return y, k_out, v_out


def window_fits_vmem(S, B, T, D, F, H, weight_bytes=2, cache_bytes=2,
                     kv_int8=False, limit=100 * 1024 * 1024):
    """fits_vmem for the window kernel: adds the per-s loop's live fp32
    cache copies and the (L, S, B, D) out blocks."""
    weights = (3 * D * D + D * D + 2 * D * F) * weight_bytes
    cache = 2 * B * T * D * cache_bytes
    planes = (3 if kv_int8 else 1) * B * T * H * 4
    live_f32 = 3 * B * T * D * 4
    outs = 2 * S * B * D * (2 if kv_int8 else cache_bytes)
    scratch = 6 * S * B * D
    return (2 * (weights + cache + planes + outs) + live_f32 + scratch
            < limit)


def _gpt_blocked_kernel(x_ref, bias_ref, bcur_ref, ln1w, ln1b, wqkv, sqkv,
                        bqkv, wproj, sproj, bproj, ln2w, ln2b, wfc, sfc, bfc,
                        wfc2, sfc2, bfc2, ck_ref, sk_ref, cv_ref, sv_ref,
                        y_ref, nk_ref, nv_ref, h_scr, q_scr, k_scr, v_scr,
                        m_scr, den_scr, acc_scr, *, B, H, D, hd, L, TB, eps,
                        act, scale, pre_ln, kv_int8, sk_t_minor, bias_ht):
    """LONG-CONTEXT single-token decode: the whole stack as ONE program with
    a (L, TB) grid — each layer's KV cache streams through VMEM in TB
    key-blocks with online-softmax partials (flash-decode / split-K style),
    so contexts that can't fit a whole (B, T, D) layer block in VMEM
    (4k-32k serving) no longer bail to the ~125-fusion XLA per-layer path
    (models/gpt.py fits_vmem fallback). Weight blocks are indexed by l only,
    so the pallas pipeline fetches them once per layer; the per-block state
    (running max / denominator / unnormalized accumulator) lives in VMEM
    scratch; the block epilogue (current-column merge, normalize, proj,
    MLP, residual) runs on the last key-block. Numerics: fp32 partials, the
    same head-collapse matmuls as _gpt_decode_kernel — but online rescaling
    reorders the summations, so parity with the single-block kernel/XLA is
    float-tolerance, not bit-level (tests/test_fused_decode.py).

    Capability bound this extends: the reference materializes a full
    (n_ctx, n_ctx) tril buffer and O(s^2) scores (modeling_gpt.py:56)."""
    l, tb = pl.program_id(0), pl.program_id(1)
    cdt = x_ref.dtype
    nk_dt = x_ref.dtype if kv_int8 else nk_ref.dtype
    TK = ck_ref.shape[2]

    hm = (jax.lax.broadcasted_iota(jnp.int32, (D, H), 0) // hd
          == jax.lax.broadcasted_iota(jnp.int32, (D, H), 1)
          ).astype(jnp.float32)
    hmT = (jax.lax.broadcasted_iota(jnp.int32, (H, D), 0)
           == jax.lax.broadcasted_iota(jnp.int32, (H, D), 1) // hd
           ).astype(jnp.float32)
    if kv_int8:
        lane_head = jax.lax.broadcasted_iota(jnp.int32, (1, D), 1) // hd
        iota_h = jax.lax.broadcasted_iota(jnp.int32, (1, H), 1)

        def quantize_rows(x):
            ax = jnp.abs(x)
            sc_h = jnp.zeros((B, H), jnp.float32)
            for h in range(H):
                sel = (lane_head == h).astype(jnp.float32)
                amax = jnp.max(ax * sel + (sel - 1.0) * 1e30,
                               axis=1, keepdims=True)
                sc_h = sc_h + (amax / 127.0) * (iota_h == h).astype(
                    jnp.float32)
            sc_h = jnp.maximum(sc_h, 1e-8)
            sc_lanes = jnp.dot(sc_h, hmT,
                               preferred_element_type=jnp.float32)
            q = jnp.clip(jnp.round(x / sc_lanes), -127, 127)
            return q, sc_h

    def project(x, w, s_cols, b):
        o = jnp.dot(x, w[0].astype(cdt),
                    preferred_element_type=jnp.float32).astype(cdt)
        return o * s_cols[0, 0].astype(cdt) + b[0, 0].astype(cdt)

    @pl.when((l == 0) & (tb == 0))
    def _init_h():
        h_scr[:] = x_ref[:]

    # block prologue (first key-block of each layer): qkv for the current
    # token, persist q/k/v in scratch, reset the online-softmax state
    @pl.when(tb == 0)
    def _prologue():
        x = h_scr[:]
        if pre_ln:
            x = _ln(x, ln1w, ln1b, eps, cdt)
        qkv = jnp.dot(x, wqkv[0].astype(cdt),
                      preferred_element_type=jnp.float32).astype(cdt)
        qkv = qkv * sqkv[0, 0].astype(cdt) + bqkv[0, 0].astype(cdt)
        k_t = qkv[:, D:2 * D].astype(nk_dt)
        v_t = qkv[:, 2 * D:].astype(nk_dt)
        nk_ref[0] = k_t
        nv_ref[0] = v_t
        q_scr[:] = qkv[:, :D].astype(jnp.float32)
        k_scr[:] = k_t.astype(jnp.float32)
        v_scr[:] = v_t.astype(jnp.float32)
        m_scr[:] = jnp.full((B, H), -1e30, jnp.float32)
        den_scr[:] = jnp.zeros((B, H), jnp.float32)
        acc_scr[:] = jnp.zeros((B, D), jnp.float32)

    # online-softmax partial over this key-block — FLASH ORIENTATION
    # (round-5 reprofile): per batch row, scores are (H, TK) with keys on
    # the 128-wide lanes. The old (B, TK, H) head-collapse form put H=12 on
    # lanes (9% utilization on every softmax op) and forced the bias and
    # int8-scale planes into H-minor layouts whose (8, 128)-tiled HBM
    # images were ~10x padding — streaming them cost as much bandwidth as
    # the cache payload (ops/gqa_decode.py has the same diagnosis for GQA).
    # The per-row partial state transposes back into the (B, H) / (B, D)
    # scratch the epilogue has always used, via exact identity NT dots
    # (one 1.0*x product per element).
    nt = (((1,), (1,)), ((), ()))                  # contract both minors
    eye_h = (jax.lax.broadcasted_iota(jnp.int32, (H, H), 0)
             == jax.lax.broadcasted_iota(jnp.int32, (H, H), 1)
             ).astype(jnp.float32)
    one = jnp.ones((1, 1), jnp.float32)
    qf = q_scr[:]
    kc = ck_ref[0].astype(cdt)                                # (B, TK, D)
    vc = cv_ref[0].astype(cdt)
    for b in range(B):
        qt_b = (qf[b:b + 1] * hmT).astype(cdt)     # (H, D) block-diagonal
        s_b = jax.lax.dot_general(qt_b, kc[b], nt,
                                  preferred_element_type=jnp.float32)
        if kv_int8:
            if sk_t_minor:                         # "sT": (H, TK) native
                s_b = s_b * sk_ref[0, b]
            else:                                  # "s": (TK, H) -> (H, TK)
                s_b = s_b * jax.lax.dot_general(
                    eye_h, sk_ref[0, b], nt,
                    preferred_element_type=jnp.float32)
        if bias_ht:
            bias_b = bias_ref[b]                   # (Hb, TK), Hb in {1, H}
        else:                                      # (TK, H) -> (H, TK)
            bias_b = jax.lax.dot_general(eye_h, bias_ref[b], nt,
                                         preferred_element_type=jnp.float32)
        s_b = s_b * scale + bias_b                 # (H, TK)
        m_old = jax.lax.dot_general(eye_h, m_scr[b:b + 1], nt,
                                    preferred_element_type=jnp.float32)
        m_new = jnp.maximum(m_old, jnp.max(s_b, axis=1, keepdims=True))
        r = jnp.exp(m_old - m_new)                 # (H, 1)
        p = jnp.exp(s_b - m_new)                   # (H, TK) fp32
        den_old = jax.lax.dot_general(eye_h, den_scr[b:b + 1], nt,
                                      preferred_element_type=jnp.float32)
        den_new = den_old * r + jnp.sum(p, axis=1, keepdims=True)
        if kv_int8:
            if sk_t_minor:
                p = p * sv_ref[0, b]
            else:
                p = p * jax.lax.dot_general(
                    eye_h, sv_ref[0, b], nt,
                    preferred_element_type=jnp.float32)
        av = jnp.dot(p.astype(cdt), vc[b],
                     preferred_element_type=jnp.float32)      # (H, D)
        # diagonal extract (row h's own hd lanes) + per-lane rescale keep
        # the accumulator in the epilogue's (B, D) lanes-packed form
        r_row = jax.lax.dot_general(one, r, nt,
                                    preferred_element_type=jnp.float32)
        r_lanes = jnp.dot(r_row, hmT, preferred_element_type=jnp.float32)
        acc_scr[b:b + 1] = (acc_scr[b:b + 1] * r_lanes
                            + jnp.sum(av * hmT, axis=0, keepdims=True))
        m_scr[b:b + 1] = jax.lax.dot_general(
            one, m_new, nt, preferred_element_type=jnp.float32)
        den_scr[b:b + 1] = jax.lax.dot_general(
            one, den_new, nt, preferred_element_type=jnp.float32)

    # block epilogue (last key-block): merge the current token's column,
    # normalize, proj + MLP + residual, advance the residual stream
    @pl.when(tb == TB - 1)
    def _epilogue():
        kf_t, vf_t = k_scr[:], v_scr[:]
        if kv_int8:
            kq, sck_h = quantize_rows(kf_t)
            vq, scv_h = quantize_rows(vf_t)
        else:
            kq, vq = kf_t, vf_t
        s_cur = jnp.dot(kq * qf, hm,
                        preferred_element_type=jnp.float32)  # (B, H)
        if kv_int8:
            s_cur = s_cur * sck_h
        s_cur = s_cur * scale + bcur_ref[:].astype(jnp.float32)
        m_fin = jnp.maximum(m_scr[:], s_cur)
        r2 = jnp.exp(m_scr[:] - m_fin)
        pc = jnp.exp(s_cur - m_fin)                          # (B, H)
        den = den_scr[:] * r2 + pc
        r2_lanes = jnp.dot(r2, hmT, preferred_element_type=jnp.float32)
        if kv_int8:
            pcn = (pc / den) * scv_h
        else:
            pcn = pc / den
        den_lanes = jnp.dot(den, hmT, preferred_element_type=jnp.float32)
        out = (acc_scr[:] * r2_lanes) / den_lanes
        out = out + jnp.dot(pcn, hmT,
                            preferred_element_type=jnp.float32) * vq
        o = project(out.astype(cdt), wproj, sproj, bproj)
        if pre_ln:
            h = h_scr[:] + o
            u = project(_ln(h, ln2w, ln2b, eps, cdt), wfc, sfc, bfc)
            h = h + project(act(u).astype(cdt), wfc2, sfc2, bfc2)
        else:
            h = _ln(h_scr[:] + o, ln1w, ln1b, eps, cdt)
            u = project(h, wfc, sfc, bfc)
            h = _ln(h + project(act(u).astype(cdt), wfc2, sfc2, bfc2),
                    ln2w, ln2b, eps, cdt)
        h_scr[:] = h
        y_ref[:] = h


def blocked_key_block(T, target=512):
    """Largest 8-ALIGNED key-block size <= target that divides T (T is
    8-aligned, so TK=8 always qualifies); the (L, T // TK) grid streams
    the cache through VMEM."""
    n = T // 8
    TB = -(-T // target)
    while n % TB:
        TB += 1
    return T // TB


@functools.partial(jax.jit, static_argnames=("n_head", "eps", "act", "scale",
                                              "pre_ln", "key_block",
                                              "bias_t_minor", "interpret"))
def fused_decode_blocked(stack, h0, bias, bias_cur, cache_k, cache_v, *,
                         n_head, eps, act, scale, pre_ln, key_block=512,
                         bias_t_minor=False, interpret=False):
    """Long-context single-token decode step (see _gpt_blocked_kernel).

    Same operand contract as fused_decode_step's legacy mode ((B, H)
    current-column bias), but the cache streams in ``key_block``-row blocks,
    so any context length that fits HBM works. The key bias is either the
    legacy strict-causal (B, T, H) plane, or — with ``bias_t_minor=True``,
    requires T % 128 == 0 — a T-MINOR (B, Hb, T) plane with Hb in {1, H}
    (Hb=1 broadcasts over heads in-kernel): T-minor planes tile densely in
    HBM where the H-minor layout paid ~10x lane padding per streamed block.
    An int8 cache dict may carry "s" (L,B,T,H) or T-minor "sT" (L,B,H,T)
    scale planes (same tradeoff; "sT" requires T % 128 == 0). Returns
    (y (B, D), new_k, new_v (L, B, D) rows) for fused_cache_append."""
    kv_int8 = isinstance(cache_k, dict)
    sk_t_minor = kv_int8 and "sT" in cache_k
    if kv_int8:
        skey = "sT" if sk_t_minor else "s"
        cache_k, sk = cache_k["q"], cache_k[skey]
        cache_v, sv = cache_v["q"], cache_v[skey]
    L, B, T, D = cache_k.shape
    H = n_head
    hd = D // H
    if bias_t_minor or sk_t_minor:
        # lane-streamed key axes (bias rows / sT scale planes) need
        # 128-aligned blocks; init_kv_cache rounds long capacities to
        # 256/512 tiles so one always exists
        if T % 128:
            raise ValueError(
                f"T-minor blocked operands require T % 128 == 0, got {T}")
        TK = max(min(key_block - key_block % 128, T), 128)
        while T % TK:
            TK -= 128
    else:
        TK = blocked_key_block(T, key_block)
    TB = T // TK
    if not kv_int8:
        sk = sv = jnp.ones((L, 1, 1, H), jnp.float32)

    def vec(p):
        return p.reshape(L, 1, p.shape[-1])

    def wpair(w):
        if isinstance(w, dict):
            return w["q"], vec(w["s"])
        return w, jnp.ones((L, 1, w.shape[-1]), h0.dtype)

    wqkv, sqkv = wpair(stack["wqkv"])
    wproj, sproj = wpair(stack["wproj"])
    wfc, sfc = wpair(stack["wfc"])
    wfc2, sfc2 = wpair(stack["wfc2"])
    F = wfc.shape[-1]

    operands = (
        h0, bias, bias_cur,
        vec(stack["ln1w"]), vec(stack["ln1b"]),
        wqkv, sqkv, vec(stack["bqkv"]),
        wproj, sproj, vec(stack["bproj"]),
        vec(stack["ln2w"]), vec(stack["ln2b"]),
        wfc, sfc, vec(stack["bfc"]),
        wfc2, sfc2, vec(stack["bfc2"]),
        cache_k, sk, cache_v, sv,
    )

    def fixed(shape):
        return pl.BlockSpec(shape, lambda l, tb: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    def per_layer(shape):  # weights: block index changes only with l
        return pl.BlockSpec((1,) + shape,
                            lambda l, tb: (l,) + (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    def per_kblock(shape):  # cache/bias planes: stream key blocks
        return pl.BlockSpec((1, shape[0], TK, shape[1]),
                            lambda l, tb: (l, 0, tb, 0),
                            memory_space=pltpu.VMEM)

    def bias_kblock():
        if bias_t_minor:  # (B, Hb, T): keys on lanes, dense HBM tiles
            Hb = bias.shape[1]
            return pl.BlockSpec((B, Hb, TK), lambda l, tb: (0, 0, tb),
                                memory_space=pltpu.VMEM)
        return pl.BlockSpec((B, TK, H), lambda l, tb: (0, tb, 0),
                            memory_space=pltpu.VMEM)

    if kv_int8 and sk_t_minor:  # "sT" (L, B, H, T): keys on lanes
        sk_spec = pl.BlockSpec((1, B, H, TK), lambda l, tb: (l, 0, 0, tb),
                               memory_space=pltpu.VMEM)
    elif kv_int8:
        sk_spec = per_kblock((B, H))
    else:
        sk_spec = per_layer((1, 1, H))
    in_specs = [
        fixed((B, D)), bias_kblock(), fixed((B, H)),
        per_layer((1, D)), per_layer((1, D)),
        per_layer((D, 3 * D)), per_layer((1, 3 * D)), per_layer((1, 3 * D)),
        per_layer((D, D)), per_layer((1, D)), per_layer((1, D)),
        per_layer((1, D)), per_layer((1, D)),
        per_layer((D, F)), per_layer((1, F)), per_layer((1, F)),
        per_layer((F, D)), per_layer((1, D)), per_layer((1, D)),
        per_kblock((B, D)), sk_spec, per_kblock((B, D)), sk_spec,
    ]
    new_kv_dtype = h0.dtype if kv_int8 else cache_k.dtype
    out_specs = [fixed((B, D)),
                 pl.BlockSpec((1, B, D), lambda l, tb: (l, 0, 0),
                              memory_space=pltpu.VMEM),
                 pl.BlockSpec((1, B, D), lambda l, tb: (l, 0, 0),
                              memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((B, D), h0.dtype),
                 jax.ShapeDtypeStruct((L, B, D), new_kv_dtype),
                 jax.ShapeDtypeStruct((L, B, D), new_kv_dtype)]

    kernel = functools.partial(
        _gpt_blocked_kernel, B=B, H=H, D=D, hd=hd, L=L, TB=TB,
        eps=eps, act=ACT2FN[act], scale=scale, pre_ln=pre_ln,
        kv_int8=kv_int8, sk_t_minor=sk_t_minor, bias_ht=bias_t_minor)

    y, k_out, v_out = pl.pallas_call(
        kernel,
        grid=(L, TB),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((B, D), h0.dtype),     # h
                        pltpu.VMEM((B, D), jnp.float32),  # q
                        pltpu.VMEM((B, D), jnp.float32),  # k_t
                        pltpu.VMEM((B, D), jnp.float32),  # v_t
                        pltpu.VMEM((B, H), jnp.float32),  # m
                        pltpu.VMEM((B, H), jnp.float32),  # den
                        pltpu.VMEM((B, D), jnp.float32)], # acc
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(*operands)
    return y, k_out, v_out


def _gpt_blocked_window_kernel(x_ref, bias_ref, bcur_ref, ln1w, ln1b, wqkv,
                               sqkv, bqkv, wproj, sproj, bproj, ln2w, ln2b,
                               wfc, sfc, bfc, wfc2, sfc2, bfc2, ck_ref,
                               sk_ref, cv_ref, sv_ref, y_ref, nk_ref, nv_ref,
                               h_scr, q_scr, kw_scr, vw_scr, skw_scr,
                               svw_scr, m_scr, den_scr, acc_scr, ao_scr, *,
                               S, B, H, D, hd, L, TB, eps, act, scale,
                               pre_ln, kv_int8, sk_t_minor, bias_ht):
    """LONG-CONTEXT S-token decode window: _gpt_blocked_kernel's key-block
    online-softmax streaming married to _gpt_window_kernel's multi-query
    window — grid (L, TB), per-QUERY running (max, denominator, accumulator)
    state in VMEM scratch, weights fetched once per layer. This is the
    speculative-verify / serving-chunk shape at contexts too long for the
    whole-block window kernel (window_fits_vmem fails past ~2-4k keys), so
    speculation and continuous batching no longer bail to the ~125-fusion
    XLA per-layer path exactly where a verify round is most expensive.

    FLASH ORIENTATION (round-5 reprofile): the first version looped the S
    queries over the streamed block with (TK, H)-shaped scores — H=12 on
    the 128-wide lanes (9% utilization) and S x 2 narrow head-collapse
    matmuls per block made a ctx4k verify round cost ~9.7 plain blocked
    steps (compute-bound; the S==1 kernel is stream-bound at the same
    shapes). Here all S queries batch into ONE NT contraction per batch
    row: q_tilde rows (s, h) hold q[s, head h] in head h's lanes, scores
    (S*H, TK) = q_tilde_b @ K_block_b^T keep keys on lanes, softmax
    reduces over lanes, AV is a full-width (S*H, TK) @ (TK, D) NN dot, and
    the epilogue merges the whole in-window causal triangle as ONE
    (S*H, S) NT dot per row (+ per-(query, column) scale/ALiBi planes via
    NT dots against the constant (S*H, H) head one-hot).

    Window columns do NOT get inserted into the streamed blocks (that would
    re-run S selects over every block): the caller's bias strictly masks
    every column >= the row's cache_len, and the block epilogue merges the
    window's own k/v (computed in the tb==0 prologue, persisted in scratch,
    quantized first for an int8 cache) behind the static causal triangle.
    Ragged per-row offsets therefore never enter the kernel: they live
    entirely in the caller's bias plane (stream) and bcur rows (window
    ALiBi/padding). Numerics: fp32 partials; online rescaling reorders
    summations, so parity with the XLA path is float-tolerance, not
    bit-level (same contract as _gpt_blocked_kernel;
    tests/test_fused_decode.py).

    Capability bound this extends: the reference replays the whole prompt
    through dense O(s^2) attention for every generated token
    (generation_util.py:57-119, modeling_gpt.py:56)."""
    l, tb = pl.program_id(0), pl.program_id(1)
    cdt = x_ref.dtype
    nk_dt = x_ref.dtype if kv_int8 else nk_ref.dtype
    TK = ck_ref.shape[2]
    SH = S * H
    nt = (((1,), (1,)), ((), ()))                  # contract both minors

    hm2 = (jax.lax.broadcasted_iota(jnp.int32, (H, D), 0)
           == jax.lax.broadcasted_iota(jnp.int32, (H, D), 1) // hd
           ).astype(jnp.float32)                   # row h <- head h's lanes
    qh = (jax.lax.broadcasted_iota(jnp.int32, (SH, H), 0) % H
          == jax.lax.broadcasted_iota(jnp.int32, (SH, H), 1)
          ).astype(jnp.float32)                    # row (s,h) -> one-hot h
    # static in-window causal triangle: query row (s, h) sees column j <= s
    tri = ((jax.lax.broadcasted_iota(jnp.int32, (SH, S), 1)
            <= jax.lax.broadcasted_iota(jnp.int32, (SH, S), 0) // H
            ).astype(jnp.float32) - 1.0) * 1e30
    if kv_int8:
        lane_head = jax.lax.broadcasted_iota(jnp.int32, (1, D), 1) // hd
        iota_h = jax.lax.broadcasted_iota(jnp.int32, (1, H), 1)

        def quantize_rows(x):
            ax = jnp.abs(x)
            sc_h = jnp.zeros((B, H), jnp.float32)
            for h in range(H):
                sel = (lane_head == h).astype(jnp.float32)
                amax = jnp.max(ax * sel + (sel - 1.0) * 1e30,
                               axis=1, keepdims=True)
                sc_h = sc_h + (amax / 127.0) * (iota_h == h).astype(
                    jnp.float32)
            sc_h = jnp.maximum(sc_h, 1e-8)
            sc_lanes = jax.lax.dot_general(
                sc_h, hm2, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            q = jnp.clip(jnp.round(x / sc_lanes), -127, 127)
            return q, sc_h

    def project(x, w, s_cols, b):
        o = jnp.dot(x, w[0].astype(cdt),
                    preferred_element_type=jnp.float32).astype(cdt)
        return o * s_cols[0, 0].astype(cdt) + b[0, 0].astype(cdt)

    @pl.when((l == 0) & (tb == 0))
    def _init_h():
        h_scr[:] = x_ref[:]

    # block prologue (first key-block of each layer): the whole window's
    # qkv; persist the lane-expanded queries and the (quantized) window k/v
    # in scratch, emit the new cache rows, reset the online-softmax state
    @pl.when(tb == 0)
    def _prologue():
        for s in range(S):
            x = h_scr[s]
            if pre_ln:
                x = _ln(x, ln1w, ln1b, eps, cdt)
            qkv = jnp.dot(x, wqkv[0].astype(cdt),
                          preferred_element_type=jnp.float32).astype(cdt)
            qkv = qkv * sqkv[0, 0].astype(cdt) + bqkv[0, 0].astype(cdt)
            k_t = qkv[:, D:2 * D].astype(nk_dt)
            v_t = qkv[:, 2 * D:].astype(nk_dt)
            nk_ref[0, s] = k_t
            nv_ref[0, s] = v_t
            # q rows lane-expanded to the (H, D) block-diagonal. Scratch is
            # written/read ONLY through static LEADING indices (ref[s] /
            # ref[s, b]): a ref[:, s] middle-dim index lowers to a gather,
            # which hardware Mosaic rejects inside pl.when branches. The
            # newaxis must NOT share an indexing expression with a partial
            # slice — value[:, None, :D] emits a GATHER; slice first, then
            # insert the axis (the S==1 kernel's proven qf[:, None, :]).
            q_t = qkv[:, :D].astype(jnp.float32)
            q_scr[s] = q_t[:, None, :] * hm2[None]  # (B, H, D)
            if kv_int8:
                kq_s, ksc_s = quantize_rows(k_t.astype(jnp.float32))
                vq_s, vsc_s = quantize_rows(v_t.astype(jnp.float32))
                kw_scr[s] = kq_s
                vw_scr[s] = vq_s
                skw_scr[s] = ksc_s
                svw_scr[s] = vsc_s
            else:
                kw_scr[s] = k_t.astype(jnp.float32)
                vw_scr[s] = v_t.astype(jnp.float32)
        m_scr[:] = jnp.full((B, SH, 1), -1e30, jnp.float32)
        den_scr[:] = jnp.zeros((B, SH, 1), jnp.float32)
        acc_scr[:] = jnp.zeros(acc_scr.shape, jnp.float32)

    # online-softmax partial over this key-block: per batch row, ALL S*H
    # query rows share one NT score dot against the streamed block
    kc = ck_ref[0].astype(cdt)                     # (B, TK, D)
    vc = cv_ref[0].astype(cdt)
    eye_h = (jax.lax.broadcasted_iota(jnp.int32, (H, H), 0)
             == jax.lax.broadcasted_iota(jnp.int32, (H, H), 1)
             ).astype(jnp.float32)
    for b in range(B):
        qe = jnp.concatenate([q_scr[s, b] for s in range(S)],
                             axis=0).astype(cdt)   # (S*H, D)
        sc = jax.lax.dot_general(qe, kc[b], nt,
                                 preferred_element_type=jnp.float32)
        if kv_int8:                                # (SH, TK) scale plane
            if sk_t_minor:                         # "sT": (H, TK) native
                sc = sc * jax.lax.dot_general(
                    qh, sk_ref[0, b], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            else:                                  # "s": (TK, H) via NT
                sc = sc * jax.lax.dot_general(
                    qh, sk_ref[0, b], nt,
                    preferred_element_type=jnp.float32)
        if bias_ht:
            # T-minor (B, Hb, TK) block: dense HBM tiles (the legacy
            # (B, TK, H) stream paid ~10x lane padding per block)
            bias_b = bias_ref[b]                   # (Hb, TK), Hb in {1, H}
            if bias_b.shape[0] == 1:
                bias_b = jnp.broadcast_to(bias_b, (SH, TK))
            else:
                bias_b = jnp.broadcast_to(bias_b[None],
                                          (S, H, TK)).reshape(SH, TK)
        else:
            # legacy (B, TK, H) block streams keys on SUBLANES; the
            # identity NT dot is the legal MXU transpose and is EXACT
            # (one 1.0*x product per element)
            bias_b = jax.lax.dot_general(eye_h, bias_ref[b], nt,
                                         preferred_element_type=jnp.float32)
            bias_b = jnp.broadcast_to(bias_b[None],
                                      (S, H, TK)).reshape(SH, TK)
        sc = sc * scale + bias_b
        m_old = m_scr[b]                           # (SH, 1)
        m_new = jnp.maximum(m_old, jnp.max(sc, axis=1, keepdims=True))
        r = jnp.exp(m_old - m_new)
        p = jnp.exp(sc - m_new)                    # (SH, TK) fp32
        den_scr[b] = den_scr[b] * r + jnp.sum(p, axis=1, keepdims=True)
        if kv_int8:
            if sk_t_minor:
                p = p * jax.lax.dot_general(
                    qh, sv_ref[0, b], (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            else:
                p = p * jax.lax.dot_general(
                    qh, sv_ref[0, b], nt,
                    preferred_element_type=jnp.float32)
        av = jnp.dot(p.astype(cdt), vc[b],
                     preferred_element_type=jnp.float32)
        m_scr[b] = m_new
        acc_scr[b] = acc_scr[b] * r + av           # (SH, D)

    # block epilogue (last key-block): merge every query's in-window
    # columns as ONE (SH, S) NT dot behind the static causal triangle,
    # normalize, head-collapse, then proj + MLP + residual per token
    @pl.when(tb == TB - 1)
    def _epilogue():
        for b in range(B):
            qe = jnp.concatenate([q_scr[s, b] for s in range(S)],
                                 axis=0).astype(cdt)       # (S*H, D)
            # all reads below keep 2-D shapes via static (lead, lead-slice)
            # indexing — 1-D ref reads and middle-dim gathers are
            # Mosaic-hostile
            kw_b = jnp.concatenate([kw_scr[j, b:b + 1] for j in range(S)],
                                   axis=0).astype(cdt)     # (S, D)
            vw_b = jnp.concatenate([vw_scr[j, b:b + 1] for j in range(S)],
                                   axis=0)
            s_w = jax.lax.dot_general(qe, kw_b, nt,
                                      preferred_element_type=jnp.float32)
            if kv_int8:
                skw_b = jnp.concatenate(
                    [skw_scr[j, b:b + 1] for j in range(S)], axis=0)
                svw_b = jnp.concatenate(
                    [svw_scr[j, b:b + 1] for j in range(S)], axis=0)
                s_w = s_w * jax.lax.dot_general(
                    qh, skw_b, nt, preferred_element_type=jnp.float32)
            bc_b = jnp.concatenate([bcur_ref[j, b:b + 1] for j in range(S)],
                                   axis=0)                 # (S, H)
            s_w = s_w * scale + jax.lax.dot_general(
                qh, bc_b, nt, preferred_element_type=jnp.float32) + tri
            m_old = m_scr[b]
            m_f = jnp.maximum(m_old, jnp.max(s_w, axis=1, keepdims=True))
            r1 = jnp.exp(m_old - m_f)
            p_w = jnp.exp(s_w - m_f)               # (SH, S); masked -> 0
            den_f = den_scr[b] * r1 + jnp.sum(p_w, axis=1, keepdims=True)
            if kv_int8:
                p_w = p_w * jax.lax.dot_general(
                    qh, svw_b, nt, preferred_element_type=jnp.float32)
            acc_f = acc_scr[b] * r1 + jnp.dot(
                p_w.astype(cdt), vw_b.astype(cdt),
                preferred_element_type=jnp.float32)
            nrm = (acc_f / den_f).reshape(S, H, D)  # leading-dim split
            ao_scr[b] = jnp.sum(nrm * hm2[None], axis=1)  # head-collapse
        for s in range(S):
            out = jnp.concatenate([ao_scr[b, s:s + 1] for b in range(B)],
                                  axis=0)          # (B, D)
            o = project(out.astype(cdt), wproj, sproj, bproj)
            if pre_ln:  # gpt2/gpt3 residual order (modeling_gpt.py:147-152)
                h = h_scr[s] + o
                u = project(_ln(h, ln2w, ln2b, eps, cdt), wfc, sfc, bfc)
                h = h + project(act(u).astype(cdt), wfc2, sfc2, bfc2)
            else:       # gpt post-LN (modeling_gpt.py:141-146)
                h = _ln(h_scr[s] + o, ln1w, ln1b, eps, cdt)
                u = project(h, wfc, sfc, bfc)
                h = _ln(h + project(act(u).astype(cdt), wfc2, sfc2, bfc2),
                        ln2w, ln2b, eps, cdt)
            h_scr[s] = h
            y_ref[s] = h


def blocked_window_key_block(S, B, T, D, F, H, weight_bytes=2, cache_bytes=2,
                             kv_int8=False, target=512,
                             limit=100 * 1024 * 1024):
    """Largest streaming key-block for the blocked WINDOW kernel whose
    double-buffered working set fits VMEM (large B shrinks TK; the
    flash-oriented window scratch grows with S*H: the lane-expanded queries
    and the per-(query, head)-row accumulator are both (B, S*H, D) fp32)."""
    weights = 2 * (3 * D * D + D * D + 2 * D * F) * weight_bytes
    scratch = (S * B * D * 2                       # residual (cdt)
               + 2 * S * B * H * D * 4             # q expanded + acc
               + 2 * S * B * D * 4 + S * B * D * 4  # window k/v + attn out
               + 2 * S * B * H * 4 + 2 * S * B * H * 4)  # scales + m/den
    while target > 8:
        TK = blocked_key_block(T, target)
        blocks = 2 * (2 * B * TK * D * cache_bytes
                      + (3 if kv_int8 else 1) * B * TK * H * 4)
        # live per-row temporaries: scores/probs (S*H, TK) fp32 x ~3
        live = 3 * S * H * TK * 4 + B * TK * D * 2
        if weights + scratch + blocks + live < limit:
            return TK
        target //= 2
    return blocked_key_block(T, 8)


@functools.partial(jax.jit, static_argnames=("n_head", "eps", "act", "scale",
                                              "pre_ln", "key_block",
                                              "bias_t_minor", "interpret"))
def fused_decode_blocked_window(stack, hw, bias, bias_cur, cache_k, cache_v,
                                *, n_head, eps, act, scale, pre_ln,
                                key_block=512, bias_t_minor=False,
                                interpret=False):
    """Long-context S-token decode window (see _gpt_blocked_window_kernel).

    hw: (S, B, D) embedded window tokens (compute dtype).
    bias: fp32 additive KEY bias over the streamed cache that STRICTLY
      masks every column >= the row's cache_len (committed keys only — the
      window's own buffer region is stale) plus padding/ALiBi. Legacy
      layout (B, T, H) (keys on sublanes, transposed per block with an
      exact identity NT dot) or — with ``bias_t_minor=True``, requires
      T % 128 == 0 — T-MINOR (B, Hb, T) with Hb in {1, H}, whose HBM tiles
      are dense where the H-minor plane paid ~10x lane padding.
    bias_cur: (S, B, H) fp32 bias rows for the window's own columns
      (zeros for GPT; the ALiBi ramp at cache_len + s for Bloom).
    An int8 cache dict may carry "s" (L,B,T,H) or T-minor "sT" (L,B,H,T)
    scale planes.

    Returns (y (S, B, D), new_k, new_v (L, S, B, D) compute-dtype rows) for
    fused_cache_append — identical contract to fused_decode_window."""
    kv_int8 = isinstance(cache_k, dict)
    sk_t_minor = kv_int8 and "sT" in cache_k
    if kv_int8:
        skey = "sT" if sk_t_minor else "s"
        cache_k, sk = cache_k["q"], cache_k[skey]
        cache_v, sv = cache_v["q"], cache_v[skey]
    L, B, T, D = cache_k.shape
    S = hw.shape[0]
    H = n_head
    hd = D // H
    if not kv_int8:
        sk = sv = jnp.ones((L, 1, 1, H), jnp.float32)

    def vec(p):
        return p.reshape(L, 1, p.shape[-1])

    def wpair(w):
        if isinstance(w, dict):
            return w["q"], vec(w["s"])
        return w, jnp.ones((L, 1, w.shape[-1]), hw.dtype)

    wqkv, sqkv = wpair(stack["wqkv"])
    wproj, sproj = wpair(stack["wproj"])
    wfc, sfc = wpair(stack["wfc"])
    wfc2, sfc2 = wpair(stack["wfc2"])
    F = wfc.shape[-1]
    TK = blocked_window_key_block(
        S, B, T, D, F, H, weight_bytes=wqkv.dtype.itemsize,
        cache_bytes=cache_k.dtype.itemsize, kv_int8=kv_int8,
        target=key_block)
    if bias_t_minor or sk_t_minor:
        # lane-streamed key axes need 128-aligned blocks; round the
        # VMEM-fit block DOWN to a 128-multiple divisor (smaller always
        # still fits)
        if T % 128:
            raise ValueError(
                f"T-minor blocked operands require T % 128 == 0, got {T}")
        t = max(TK - TK % 128, 128)
        while T % t:
            t -= 128
        TK = t
    TB = T // TK

    operands = (
        hw, bias, bias_cur,
        vec(stack["ln1w"]), vec(stack["ln1b"]),
        wqkv, sqkv, vec(stack["bqkv"]),
        wproj, sproj, vec(stack["bproj"]),
        vec(stack["ln2w"]), vec(stack["ln2b"]),
        wfc, sfc, vec(stack["bfc"]),
        wfc2, sfc2, vec(stack["bfc2"]),
        cache_k, sk, cache_v, sv,
    )

    def fixed(shape):
        return pl.BlockSpec(shape, lambda l, tb: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    def per_layer(shape):
        return pl.BlockSpec((1,) + shape,
                            lambda l, tb: (l,) + (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    def per_kblock(shape):
        return pl.BlockSpec((1, shape[0], TK, shape[1]),
                            lambda l, tb: (l, 0, tb, 0),
                            memory_space=pltpu.VMEM)

    def bias_kblock():
        if bias_t_minor:
            Hb = bias.shape[1]
            return pl.BlockSpec((B, Hb, TK), lambda l, tb: (0, 0, tb),
                                memory_space=pltpu.VMEM)
        return pl.BlockSpec((B, TK, H), lambda l, tb: (0, tb, 0),
                            memory_space=pltpu.VMEM)

    if kv_int8 and sk_t_minor:
        sk_spec = pl.BlockSpec((1, B, H, TK), lambda l, tb: (l, 0, 0, tb),
                               memory_space=pltpu.VMEM)
    elif kv_int8:
        sk_spec = per_kblock((B, H))
    else:
        sk_spec = per_layer((1, 1, H))
    in_specs = [
        fixed((S, B, D)), bias_kblock(), fixed((S, B, H)),
        per_layer((1, D)), per_layer((1, D)),
        per_layer((D, 3 * D)), per_layer((1, 3 * D)), per_layer((1, 3 * D)),
        per_layer((D, D)), per_layer((1, D)), per_layer((1, D)),
        per_layer((1, D)), per_layer((1, D)),
        per_layer((D, F)), per_layer((1, F)), per_layer((1, F)),
        per_layer((F, D)), per_layer((1, D)), per_layer((1, D)),
        per_kblock((B, D)), sk_spec, per_kblock((B, D)), sk_spec,
    ]
    new_kv_dtype = hw.dtype if kv_int8 else cache_k.dtype
    out_specs = [fixed((S, B, D)),
                 pl.BlockSpec((1, S, B, D), lambda l, tb: (l, 0, 0, 0),
                              memory_space=pltpu.VMEM),
                 pl.BlockSpec((1, S, B, D), lambda l, tb: (l, 0, 0, 0),
                              memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((S, B, D), hw.dtype),
                 jax.ShapeDtypeStruct((L, S, B, D), new_kv_dtype),
                 jax.ShapeDtypeStruct((L, S, B, D), new_kv_dtype)]

    kernel = functools.partial(
        _gpt_blocked_window_kernel, S=S, B=B, H=H, D=D, hd=hd, L=L, TB=TB,
        eps=eps, act=ACT2FN[act], scale=scale, pre_ln=pre_ln,
        kv_int8=kv_int8, sk_t_minor=sk_t_minor, bias_ht=bias_t_minor)

    y, k_out, v_out = pl.pallas_call(
        kernel,
        grid=(L, TB),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((S, B, D), hw.dtype),       # h
                        pltpu.VMEM((S, B, H, D), jnp.float32),  # q expanded
                        pltpu.VMEM((S, B, D), jnp.float32),     # window k
                        pltpu.VMEM((S, B, D), jnp.float32),     # window v
                        pltpu.VMEM((S, B, H), jnp.float32),     # window k sc
                        pltpu.VMEM((S, B, H), jnp.float32),     # window v sc
                        pltpu.VMEM((B, S * H, 1), jnp.float32),  # m
                        pltpu.VMEM((B, S * H, 1), jnp.float32),  # den
                        pltpu.VMEM((B, S * H, D), jnp.float32),  # acc
                        pltpu.VMEM((B, S, D), jnp.float32)],    # attn out
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )(*operands)
    return y, k_out, v_out


def table_bytes(t):
    """HBM footprint of an (optionally int8-quantized) embedding table."""
    if isinstance(t, dict):
        return int(t["q"].size)
    return int(t.size) * t.dtype.itemsize


def _gpt_stack(blocks):
    attn_p, mlp_p = blocks["attn"], blocks["mlp"]
    return {
        "ln1w": blocks["ln_1"]["w"], "ln1b": blocks["ln_1"]["b"],
        "wqkv": attn_p["c_attn"]["w"], "bqkv": attn_p["c_attn"]["b"],
        "wproj": attn_p["c_proj"]["w"], "bproj": attn_p["c_proj"]["b"],
        "ln2w": blocks["ln_2"]["w"], "ln2b": blocks["ln_2"]["b"],
        "wfc": mlp_p["c_fc"]["w"], "bfc": mlp_p["c_fc"]["b"],
        "wfc2": mlp_p["c_proj"]["w"], "bfc2": mlp_p["c_proj"]["b"],
    }


def gpt_fused_decode(blocks, h0, bias, bias_cur, cache_k, cache_v, *,
                     config, version, cache_len=None, park_bytes=0,
                     interpret=False):
    """GPT adapter over fused_decode_step: init_gpt_params' block tree is
    already contiguous-q|k|v, so this is pure renaming."""
    hd = h0.shape[-1] // config.n_head
    return fused_decode_step(
        _gpt_stack(blocks), h0, bias, bias_cur, cache_k, cache_v,
        n_head=config.n_head, eps=config.layer_norm_epsilon,
        act=config.afn, scale=1.0 / math.sqrt(hd),
        pre_ln=(version != "gpt"), cache_len=cache_len,
        park_bytes=park_bytes, interpret=interpret)


def gpt_fused_blocked(blocks, h0, bias, bias_cur, cache_k, cache_v, *,
                      config, version, key_block=512, bias_t_minor=False,
                      interpret=False):
    """GPT adapter over fused_decode_blocked (long-context twin of
    gpt_fused_decode)."""
    hd = h0.shape[-1] // config.n_head
    return fused_decode_blocked(
        _gpt_stack(blocks), h0, bias, bias_cur, cache_k, cache_v,
        n_head=config.n_head, eps=config.layer_norm_epsilon,
        act=config.afn, scale=1.0 / math.sqrt(hd),
        pre_ln=(version != "gpt"), key_block=key_block,
        bias_t_minor=bias_t_minor, interpret=interpret)


def gpt_fused_window(blocks, hw, bias, cache_len, cache_k, cache_v, *,
                     config, version, park_bytes=0, interpret=False):
    """GPT adapter over fused_decode_window (multi-token window twin of
    gpt_fused_decode)."""
    hd = hw.shape[-1] // config.n_head
    return fused_decode_window(
        _gpt_stack(blocks), hw, bias, cache_len, cache_k, cache_v,
        n_head=config.n_head, eps=config.layer_norm_epsilon,
        act=config.afn, scale=1.0 / math.sqrt(hd),
        pre_ln=(version != "gpt"), park_bytes=park_bytes,
        interpret=interpret)


def gpt_fused_blocked_window(blocks, hw, bias, bias_cur, cache_k, cache_v,
                             *, config, version, key_block=512,
                             interpret=False):
    """GPT adapter over fused_decode_blocked_window (long-context twin of
    gpt_fused_window)."""
    hd = hw.shape[-1] // config.n_head
    return fused_decode_blocked_window(
        _gpt_stack(blocks), hw, bias, bias_cur, cache_k, cache_v,
        n_head=config.n_head, eps=config.layer_norm_epsilon,
        act=config.afn, scale=1.0 / math.sqrt(hd),
        pre_ln=(version != "gpt"), key_block=key_block,
        interpret=interpret)
