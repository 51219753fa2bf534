"""Sparse mixture-of-experts MLP (Mixtral-style) with expert parallelism.

Extension beyond the reference (which has no MoE models): the behavioral
spec is HF ``modeling_mixtral.py`` — a linear router, softmax in fp32,
top-k expert choice with the chosen weights renormalized to sum 1, SwiGLU
experts — asserted against the executed HF implementation in
tests/test_moe.py.

Two TPU-first compute paths, both jittable and exact when no token drops:

 - ``moe_mlp_dense``: every expert processes every token; the top-k routing
   enters as a (T, E) combine-weight matrix (zeros off the top-k). Exact
   Mixtral semantics with no gather/scatter — the overcompute factor is
   E/k, which is fine for parity tests, small expert counts, and decode
   (where the matmuls are bandwidth-bound anyway). With the expert dim
   sharded over an ``expert`` mesh axis each device runs only its local
   E/ep experts and the combine einsum psums partial outputs over ICI.

 - ``moe_mlp_capacity``: GShard/Switch-style dispatch — each expert gets a
   fixed-capacity (E, C, D) token buffer built by a one-hot dispatch einsum,
   runs its SwiGLU once, and a combine einsum scatters outputs back weighted
   by the routing probabilities. Compute scales with k/E of the dense path;
   tokens beyond an expert's capacity are DROPPED (their combine weight is
   zero — the standard capacity-factor trade). Priority is slot-major then
   token order, the GShard convention. With capacity >= the realized maximum
   expert load the result equals ``moe_mlp_dense`` bit-for-near (fp
   reassociation only) — asserted in tests.

 - ``moe_mlp_ragged``: sorted grouped-matmul dispatch — token replicas are
   argsorted by expert id and the three SwiGLU projections run as ONE
   ``lax.ragged_dot`` each over the contiguous per-expert groups (the MXU
   sees one big (T*k, D) x per-group (D, I) matmul; XLA lowers the ragged
   grouping natively on TPU). Exact: no capacity, no drops, compute k/E of
   dense like the capacity path but with no one-hot dispatch/combine einsums
   (those cost O(T*E*C) memory traffic) and no dropped-token deviation.
   This is the preferred single-device / data-parallel training path.

 - ``moe_mlp_ragged_ep``: the ragged path on an ``expert``-sharded mesh as
   an explicit shard_map (ragged group offsets are global, which defeats
   the all-to-all GSPMD would otherwise derive): each (data, expert) shard
   routes/sorts its local tokens identically, dynamic-slices the sorted
   replica rows belonging to ITS experts, runs the three ragged dots over
   those local groups only, scatters results back into the global sorted
   order, and a psum over 'expert' (+ 'model' for the row-parallel down
   projection) completes the combine. Exact like plain ragged (no drops),
   FLOPs per device ~ T*k/ep — vs T*E/ep for dense-dispatch EP.

Expert parallelism = sharding annotations (the same stance as DP/TP/ZeRO in
parallel/sharding.py): expert-stacked weights (E, D, I) and the (E, C, D)
buffers carry an ``expert`` axis spec; GSPMD derives the all-to-all /
reduce out of the dispatch/combine einsums.
"""

import jax
import jax.numpy as jnp

from cleantransformer_tpu.parallel.sharding import shard_hint


def router_topk(x, gate_w, num_experts_per_tok):
    """x: (T, D) -> (router_logits (T,E), full softmax probs fp32 (T,E),
    top-k weights renormalized (T,k) fp32, top-k indices (T,k) int32).

    Matches HF Mixtral: logits in compute dtype, softmax in fp32, chosen
    weights divided by their sum."""
    logits = jnp.matmul(x, gate_w.astype(x.dtype))            # (T, E)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    top_w, top_i = jax.lax.top_k(probs, num_experts_per_tok)  # (T, k)
    top_w = top_w / jnp.sum(top_w, axis=-1, keepdims=True)
    return logits, probs, top_w, top_i.astype(jnp.int32)


def _wpair(w):
    """Expert-stacked weight operand: int8 {"q": (E, D, I), "s": (E, I)}
    (ops/quant.py per-(expert, out-column) quantization) or a raw array.
    Returns (int-or-float weight, scales-or-None)."""
    if isinstance(w, dict):
        return w["q"], w["s"]
    return w, None


def _expert_ffn(experts, x_e, act):
    """Batched SwiGLU over the expert axis. x_e: (E, *, D) -> (E, *, D).
    int8 expert weights dequantize INSIDE the einsum (the convert rides the
    dot operand, so HBM streams int8 bytes); scales apply per (expert,
    out-column) before the activation."""
    wg, sg = _wpair(experts["gate_proj"]["w"])  # (E, D, I)
    wu, su = _wpair(experts["up_proj"]["w"])
    wd, sd = _wpair(experts["down_proj"]["w"])  # (E, I, D)

    def proj(x, w, s, eq):
        y = jnp.einsum(eq, x, w.astype(x.dtype))
        if s is not None:
            y = y * jnp.expand_dims(s, 1).astype(y.dtype)
        return y

    hidden = act(proj(x_e, wg, sg, "e...d,edi->e...i"))
    hidden = hidden * proj(x_e, wu, su, "e...d,edi->e...i")
    hidden = shard_hint(hidden, ("expert", None, "model"))
    return proj(hidden, wd, sd, "e...i,eid->e...d")


def moe_mlp_dense(moe_params, h, num_experts_per_tok, act):
    """Dense-dispatch MoE: (B, S, D) -> ((B, S, D), (probs, top_i)).

    Every expert computes every token; the (T, E) combine matrix (top-k
    routing weights, zero elsewhere) selects and mixes. Overcompute E/k."""
    B, S, D = h.shape
    T = B * S
    x = h.reshape(T, D)
    E = moe_params["gate"]["w"].shape[-1]
    _, probs, top_w, top_i = router_topk(x, moe_params["gate"]["w"],
                                         num_experts_per_tok)
    comb = jnp.zeros((T, E), jnp.float32)
    comb = comb.at[jnp.arange(T)[:, None], top_i].set(top_w)   # (T, E)

    x_e = jnp.broadcast_to(x[None], (E, T, D))
    x_e = shard_hint(x_e, ("expert", None, None))
    out_e = _expert_ffn(moe_params["experts"], x_e, act)       # (E, T, D)
    out = jnp.einsum("etd,te->td", out_e, comb.astype(h.dtype))
    return out.reshape(B, S, D), (probs, top_i)


def moe_mlp_capacity(moe_params, h, num_experts_per_tok, act,
                     capacity_factor=1.25, capacity=None):
    """Capacity-dispatch MoE (GShard): (B, S, D) -> ((B, S, D), stats).

    ``capacity`` (per expert) defaults to ceil(k*T/E * capacity_factor),
    rounded up to a multiple of 8 for TPU-friendly (8, 128) tiling. Tokens
    past an expert's capacity are dropped (zero contribution) — pass
    ``capacity >= k*T`` worst case (or just T) for guaranteed-no-drop."""
    B, S, D = h.shape
    T = B * S
    k = num_experts_per_tok
    x = h.reshape(T, D)
    E = moe_params["gate"]["w"].shape[-1]
    if capacity is None:
        capacity = int((k * T + E - 1) // E * capacity_factor)
        capacity = max(8, -(-capacity // 8) * 8)
    C = min(capacity, T)

    _, probs, top_w, top_i = router_topk(x, moe_params["gate"]["w"], k)

    # slot-major positions: slot j's tokens queue behind slots < j (GShard)
    disp = jnp.zeros((T, E, C), jnp.float32)   # one-hot dispatch
    weight = jnp.zeros((T, E, C), jnp.float32)  # combine weights
    counts = jnp.zeros((E,), jnp.int32)
    for j in range(k):
        oh = jax.nn.one_hot(top_i[:, j], E, dtype=jnp.int32)   # (T, E)
        pos = jnp.cumsum(oh, axis=0) - oh + counts[None]        # (T, E)
        pos_j = jnp.sum(pos * oh, axis=-1)                      # (T,)
        keep = pos_j < C
        slot_oh = (jax.nn.one_hot(pos_j, C, dtype=jnp.float32)
                   * keep[:, None].astype(jnp.float32))         # (T, C)
        d_j = oh.astype(jnp.float32)[:, :, None] * slot_oh[:, None, :]
        disp = disp + d_j
        weight = weight + d_j * top_w[:, j][:, None, None]
        counts = counts + jnp.sum(oh, axis=0)

    x_e = jnp.einsum("tec,td->ecd", disp.astype(h.dtype), x)    # (E, C, D)
    x_e = shard_hint(x_e, ("expert", None, None))
    out_e = _expert_ffn(moe_params["experts"], x_e, act)        # (E, C, D)
    out = jnp.einsum("tec,ecd->td", weight.astype(h.dtype), out_e)
    return out.reshape(B, S, D), (probs, top_i)


def moe_mlp_ragged(moe_params, h, num_experts_per_tok, act):
    """Grouped-matmul MoE via ``lax.ragged_dot``: (B,S,D) -> ((B,S,D), stats).

    Token replicas sorted by expert id; each projection is a single ragged
    dot over contiguous per-expert row groups. Same semantics as
    ``moe_mlp_dense`` (exact top-k routing, no drops) at k/E of its FLOPs."""
    B, S, D = h.shape
    T = B * S
    k = num_experts_per_tok
    x = h.reshape(T, D)
    E = moe_params["gate"]["w"].shape[-1]
    _, probs, top_w, top_i = router_topk(x, moe_params["gate"]["w"], k)

    flat_e = top_i.reshape(-1)                       # (T*k,) expert per replica
    order = jnp.argsort(flat_e)                      # stable: ties in token order
    tok = order // k                                 # source token per sorted row
    group_sizes = jnp.bincount(flat_e, length=E).astype(jnp.int32)

    xs = jnp.take(x, tok, axis=0)                    # (T*k, D) gathered rows
    experts = moe_params["experts"]
    wg, sg = _wpair(experts["gate_proj"]["w"])       # (E, D, I)
    wu, su = _wpair(experts["up_proj"]["w"])
    wd, sd = _wpair(experts["down_proj"]["w"])       # (E, I, D)
    e_sorted = jnp.take(flat_e, order)               # expert id per sorted row

    def rdot(x_rows, w, s):
        # int8 expert weights: the convert rides the grouped dot; each
        # output row scales by ITS expert's per-column scales (a (T*k, I)
        # gather — k*T rows, cheap next to the weight stream)
        y = jax.lax.ragged_dot(x_rows, w.astype(x_rows.dtype), group_sizes)
        if s is not None:
            y = y * jnp.take(s, e_sorted, axis=0).astype(y.dtype)
        return y

    hidden = act(rdot(xs, wg, sg)) * rdot(xs, wu, su)  # (T*k, I)
    ys = rdot(hidden, wd, sd)                          # (T*k, D)

    w_sorted = jnp.take(top_w.reshape(-1), order)    # fp32 routing weights
    # combine in fp32 (k small): scatter-add replicas back to their token
    out = jnp.zeros((T, D), jnp.float32).at[tok].add(
        ys.astype(jnp.float32) * w_sorted[:, None])
    return out.astype(h.dtype).reshape(B, S, D), (probs, top_i)


def moe_mlp_ragged_ep(moe_params, h, num_experts_per_tok, act, mesh):
    """Expert-parallel grouped-matmul MoE: ``moe_mlp_ragged`` inside a
    shard_map over the mesh (VERDICT r2 item 6). Semantics identical to
    the single-device ragged path (exact top-k, no capacity drops); each
    expert shard computes only its local expert groups, so per-device FLOPs
    are ~k/E of dense-dispatch EP.

    Requirements: 'expert' in mesh axes with E % ep == 0; h sharded (or
    shardable) over 'data' on the batch dim; expert weights sharded
    (E, D, I) -> ('expert', None, 'model'-optional) per
    parallel/sharding.llama_param_specs."""
    from jax.sharding import PartitionSpec as P
    from cleantransformer_tpu.parallel.mesh import compat_shard_map

    experts = moe_params["experts"]
    if any(isinstance(experts[k]["w"], dict)
           for k in ("gate_proj", "up_proj", "down_proj")):
        # int8 expert weights don't ride the shard_map specs (one
        # PartitionSpec per array leaf); EP inference is a multi-host
        # serving niche, so dequantize here rather than fork the specs —
        # the single-device ragged/dense/capacity paths stream int8
        from cleantransformer_tpu.ops.quant import dequantize_weight
        moe_params = dict(moe_params)
        moe_params["experts"] = {
            k: {"w": (dequantize_weight(v["w"], h.dtype)
                      if isinstance(v["w"], dict) else v["w"])}
            for k, v in experts.items()}

    B, S, D = h.shape
    k = num_experts_per_tok
    E = moe_params["gate"]["w"].shape[-1]
    ep = mesh.shape.get("expert", 1)
    has_tp = mesh.shape.get("model", 1) > 1
    has_dp = mesh.shape.get("data", 1) > 1
    assert E % ep == 0, (E, ep)
    El = E // ep
    psum_axes = ("expert",) + (("model",) if has_tp else ())

    def local_fn(h_l, gate_w, wg, wu, wd):
        Bl = h_l.shape[0]
        T = Bl * S
        x = h_l.reshape(T, D)
        # router + sort run replicated across the expert axis (cheap, and
        # every shard needs the same global group offsets)
        _, probs, top_w, top_i = router_topk(x, gate_w, k)
        flat_e = top_i.reshape(-1)                   # (T*k,)
        order = jnp.argsort(flat_e)
        tok = order // k
        group_sizes = jnp.bincount(flat_e, length=E).astype(jnp.int32)
        xs = jnp.take(x, tok, axis=0)                # (T*k, D) sorted rows

        # this shard's slice of the sorted rows: experts [d*El, (d+1)*El)
        d_idx = jax.lax.axis_index("expert")
        starts = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                                  jnp.cumsum(group_sizes)[:-1]])
        off = jax.lax.dynamic_slice(starts, (d_idx * El,), (1,))[0]
        gs_loc = jax.lax.dynamic_slice(group_sizes, (d_idx * El,), (El,))
        # pad so a static (T*k)-row slice at any offset is in bounds
        xs_pad = jnp.pad(xs, ((0, T * k), (0, 0)))
        xs_loc = jax.lax.dynamic_slice(xs_pad, (off, 0), (T * k, D))

        hidden = act(jax.lax.ragged_dot(xs_loc, wg.astype(xs_loc.dtype),
                                        gs_loc)) \
            * jax.lax.ragged_dot(xs_loc, wu.astype(xs_loc.dtype), gs_loc)
        ys_loc = jax.lax.ragged_dot(hidden, wd.astype(xs_loc.dtype), gs_loc)
        # rows past this shard's group total are other shards' work: zero
        # them before the scatter + psum combine
        n_loc = jnp.sum(gs_loc)
        rows = jnp.arange(T * k, dtype=jnp.int32)
        ys_loc = jnp.where((rows < n_loc)[:, None], ys_loc, 0)
        buf = jnp.zeros((2 * T * k, D), ys_loc.dtype)
        buf = jax.lax.dynamic_update_slice(buf, ys_loc, (off, 0))
        ys_global = jax.lax.psum(buf[: T * k], psum_axes)

        w_sorted = jnp.take(top_w.reshape(-1), order)
        out = jnp.zeros((T, D), jnp.float32).at[tok].add(
            ys_global.astype(jnp.float32) * w_sorted[:, None])
        return (out.astype(h_l.dtype).reshape(Bl, S, D),
                probs.reshape(Bl, S, E), top_i.reshape(Bl, S, k))

    dspec = P("data") if has_dp else P(None)
    h_spec = P(*dspec, None, None)
    w_in = P("expert", None, "model") if has_tp else P("expert", None, None)
    w_down = P("expert", "model", None) if has_tp else P("expert", None, None)
    fn = compat_shard_map(
        local_fn, mesh,
        in_specs=(h_spec, P(None, None), w_in, w_in, w_down),
        out_specs=(h_spec, P(*dspec, None, None), P(*dspec, None, None)))
    out, probs, top_i = fn(h, moe_params["gate"]["w"],
                           moe_params["experts"]["gate_proj"]["w"],
                           moe_params["experts"]["up_proj"]["w"],
                           moe_params["experts"]["down_proj"]["w"])
    T = B * S
    return out, (probs.reshape(T, E), top_i.reshape(T, k))


def load_balancing_aux(probs, top_i, num_experts, num_experts_per_tok,
                       mask=None):
    """Per-layer pieces of HF's ``load_balancing_loss_func``: returns token
    SUMS ``(t_sum (k, E), p_sum (E,), count ())`` so the caller
    (models/llama.py) can accumulate across layers and normalize once —
    exactly matching HF's concatenate-layers-then-mean formulation,
    including its padding handling: ``mask`` (T,) excludes attention_mask==0
    tokens from both the routed-fraction and the mean router probability."""
    expert_mask = jax.nn.one_hot(top_i, num_experts, dtype=jnp.float32)
    if mask is not None:
        m = mask.astype(jnp.float32)
        t_sum = jnp.einsum("t,tke->ke", m, expert_mask)
        p_sum = jnp.einsum("t,te->e", m, probs)
        count = jnp.sum(m)
    else:
        t_sum = jnp.sum(expert_mask, axis=0)               # (k, E)
        p_sum = jnp.sum(probs, axis=0)                     # (E,)
        count = jnp.asarray(probs.shape[0], jnp.float32)
    return t_sum, p_sum, count
