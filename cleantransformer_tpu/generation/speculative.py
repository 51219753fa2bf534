"""Speculative decoding (TPU-native extension beyond the reference).

A small draft model proposes ``draft_len`` tokens autoregressively; the
target model scores all of them in ONE multi-token cached forward (prefill-
shaped work, which TPUs run near peak, instead of ``draft_len`` bandwidth-
bound single-token steps); the longest prefix on which the target's greedy
choices agree with the draft is committed, plus the target's own next token.
Greedy speculative decoding is EXACT: the committed stream is bit-identical
to the target model's plain greedy decode (asserted in tests/test_speculative.py).

TPU-first mechanics:
 - the whole search is one jitted program (lax.while_loop over speculation
   rounds) with fixed shapes: a fixed ``draft_len`` per round, token buffers
   padded with a draft_len margin, and the attention frontier expressed as
   an iota-vs-scalar mask;
 - rejected candidates need no cache rollback: keys written past the commit
   point stay masked out (the frontier mask) and are overwritten in place by
   later rounds' writes at the same offsets;
 - the draft model re-syncs on tokens it did not itself commit (the target's
   corrections) via an idempotent fixed-width catch-up window — the window's
   last position doubles as the first draft proposal, so catch-up is free.

Greedy speculative decoding is EXACT (bit-identical tokens) at ANY batch
size (per-row acceptance counts / cache offsets / end detection). Sampling
mode (``do_sample=True``): the batch-1 draft-model loop uses the standard
rejection-sampling scheme (Leviathan et al.) — the draft SAMPLES its
proposals from its own processed distribution q, the target accepts
proposal c_i with probability min(1, p_i(c_i) / q_i(c_i)), and the first
rejection is replaced by a draw from the residual norm(max(p_i - q_i, 0));
full acceptance earns a bonus draw from p_{K+1}. The BATCHED loops (model
draft and prompt-lookup) keep deterministic proposals (draft argmax /
ngram match), which makes q a point mass — the same scheme reduces to
accept c_i w.p. p_i(c_i) with the residual = p_i excluding c_i
(_verify_commit, shared with the serving engine). Either way the committed
stream is distributed EXACTLY as the target's own (temperature/top-k/top-p
processed) sampler — verified statistically in tests/test_speculative.py
and tests/test_serving.py.

Cache layout: speculation uses the model's OWN cache factory, so a
``config.fused_decode`` model runs its verify (S = K+1) and catch-up
windows through the whole-stack window kernel
(ops/fused_decode._gpt_window_kernel) — the round cost drops from ~2 plain
decode steps (the per-layer XLA chain) to ~1 fused step. The greedy
bit-exactness guarantee then holds at float-rounding tolerance rather than
bit-level: the window kernel's per-query reductions and XLA's batched
gemms differ by ~1 ulp (fp32), exactly like the committed bf16
cross-kernel drift (CLAUDE.md) — immaterial for trained/decisive logits,
and the plain dense-layout configuration remains strictly bit-exact.
"""

import functools

import numpy as np

import jax
import jax.numpy as jnp

from cleantransformer_tpu.generation.logits_process import build_wrapper_chain


def _normalize_end_ids(end_ids):
    if isinstance(end_ids, int):
        end_ids = [end_ids]
    return tuple(end_ids) if end_ids else ()


def _process_scores(scores, temp_v, top_k_v, top_p_v):
    """Row-wise temperature/top-k/top-p filtering of (N, V) scores.

    Reproduces the generate() wrapper chain semantics row-wise
    (reference logits_processor.py: temperature floor 1e-2 L35-41; top-k
    keep >= kth-largest L44-56; top-p ascending-cumsum mask L59-79).
    Returns filtered log-scores (softmax of them = the sampling
    distribution)."""
    N, V = scores.shape
    t = jnp.maximum(temp_v, 1e-2)[:, None]
    s = scores / t
    # top-k (0 = off): mask scores strictly below the kth largest
    k = jnp.where(top_k_v > 0, jnp.minimum(top_k_v, V), V).astype(jnp.int32)
    sorted_desc = jnp.sort(s, axis=-1)[:, ::-1]
    kth = jnp.take_along_axis(sorted_desc, (k - 1)[:, None], axis=-1)
    s = jnp.where(s < kth, -jnp.inf, s)
    # top-p (>= 1.0 = off): ascending sort, drop the low-probability tail
    # whose cumulative mass is <= 1 - p (always keeps the top token)
    order = jnp.argsort(s, axis=-1)
    asc = jnp.take_along_axis(s, order, axis=-1)
    cum = jnp.cumsum(jax.nn.softmax(asc, axis=-1), axis=-1)
    remove_sorted = cum <= (1.0 - top_p_v[:, None])
    remove = jnp.zeros_like(remove_sorted).at[
        jnp.arange(N)[:, None], order].set(remove_sorted)
    return jnp.where(remove, -jnp.inf, s)


def _verify_commit(logits, proposed, do_sample_v, temp_v, top_k_v, top_p_v,
                   rng, sampling):
    """Per-row batched speculative accept/commit for deterministic
    (point-mass) proposals — the b1 draft-model rejection sampling (module
    docstring) specialized to q_t = 1 at the proposed token; shared by the
    batched prompt-lookup loop and the serving engine's lookup chunks:

    greedy rows accept while the argmax matches; the correction is the
    argmax at the first mismatch (bit-exact vs plain greedy decode).
    Sampling rows accept proposal c_t with probability p_t(c_t) — p is the
    PROCESSED per-row target distribution (temperature/top-k/top-p,
    _process_scores); the first rejection draws from the residual
    norm(max(p_a - q_a, 0)), which for a point-mass q is p_a with c_a
    masked out and renormalized (categorical over the filtered scores with
    c_a at -inf); full acceptance draws the bonus token from p_K. Every
    committed token is distributed EXACTLY as the plain sampling path
    conditioned on the committed prefix (standard speculative-sampling
    identity; test_serving.py verifies the marginal empirically).

    logits (B, W, V) with W = K + 1; proposed (B, K). Returns (a, corr):
    per-row accepted proposal counts and the correction/bonus token."""
    B, W, V = logits.shape
    K = W - 1
    lg = logits.astype(jnp.float32)
    g = jnp.argmax(lg, axis=-1).astype(jnp.int32)                  # (B, W)
    match = g[:, :K] == proposed
    if sampling:
        def rep(v):  # (B,) row params -> (B*W,) flattened positions
            return jnp.repeat(v, W)
        s = _process_scores(lg.reshape(B * W, V), rep(temp_v),
                            rep(top_k_v), rep(top_p_v)).reshape(B, W, V)
        p = jax.nn.softmax(s, axis=-1)
        r_accept, r_corr = jax.random.split(rng)
        u = jax.random.uniform(r_accept, (B, K))
        p_prop = jnp.take_along_axis(
            p[:, :K], proposed[..., None], axis=-1)[..., 0]        # (B, K)
        match = jnp.where(do_sample_v.astype(bool)[:, None],
                          u < p_prop, match)
    a = jnp.sum(jnp.cumprod(match.astype(jnp.int32), axis=1), axis=1)
    corr_greedy = jnp.take_along_axis(g, a[:, None], axis=1)[:, 0]
    if not sampling:
        return a, corr_greedy
    s_a = jnp.take_along_axis(s, a[:, None, None], axis=1)[:, 0]   # (B, V)
    c_a = jnp.take_along_axis(
        jnp.pad(proposed, ((0, 0), (0, 1)), constant_values=-1),
        a[:, None], axis=1)[:, 0]                                  # (B,)
    vcol = jnp.arange(V, dtype=jnp.int32)[None]
    s_a = jnp.where(((a < K)[:, None]) & (vcol == c_a[:, None]),
                    -jnp.inf, s_a)
    corr_sampled = jax.random.categorical(r_corr, s_a,
                                          axis=-1).astype(jnp.int32)
    corr = jnp.where(do_sample_v.astype(bool), corr_sampled, corr_greedy)
    return a, corr


def _batched_prefill(forward, params, config, init_cache, input_ids, T,
                     end_ids, rng=None, sample_params=None):
    """Shared batched-loop prologue: zero token buffer holding the prompt,
    ONE prefill forward committing the model's first token, per-row cache
    offsets (the serving-style (B,) cache "length" — the while_loop carry
    must keep one dtype/shape across rounds), initial per-row done flags.
    ``sample_params`` (temp_v, top_k_v, top_p_v per-row vectors) + ``rng``
    switch the first token from argmax to a categorical draw over the
    processed distribution (the same sampler the plain generate path
    applies). Returns (tokens, n0, cache, done0, col, mask0, pos0)."""
    B, S0 = input_ids.shape
    col = jnp.arange(T, dtype=jnp.int32)[None]                   # (1, T)
    tokens = jnp.zeros((B, T), jnp.int32)
    tokens = jax.lax.dynamic_update_slice(tokens, input_ids.astype(jnp.int32),
                                          (0, 0))
    cache = init_cache(config, B, T)
    pos0 = jnp.broadcast_to(jnp.arange(S0, dtype=jnp.int32)[None], (B, S0))
    mask0 = (col < S0).astype(jnp.int32) * jnp.ones((B, 1), jnp.int32)
    (logits, _), cache = forward(params, config, input_ids, mask0, pos0,
                                 None, cache, last_only=True)
    if sample_params is not None:
        temp_v, top_k_v, top_p_v = sample_params
        s = _process_scores(logits[:, -1].astype(jnp.float32), temp_v,
                            top_k_v, top_p_v)
        first = jax.random.categorical(rng, s, axis=-1).astype(jnp.int32)
    else:
        first = jnp.argmax(logits[:, -1].astype(jnp.float32), axis=-1).astype(
            jnp.int32)                                           # (B,)
    tokens = tokens.at[:, S0].set(first)
    n0 = jnp.full((B,), S0 + 1, jnp.int32)
    cache = {**cache, "length": jnp.full((B,), S0, jnp.int32)}
    done0 = jnp.zeros((B,), bool)
    for e in end_ids:
        done0 = done0 | (first == e)
    return tokens, n0, cache, done0, col, mask0, pos0


def _verify_commit_round(t_forward, t_params, t_config, tokens, n, t_cache,
                         done, col, K, end_ids, total_len, rng=None,
                         sample_params=None):
    """Shared batched verify/commit: score the K proposals sitting at
    tokens[b, n_b:n_b+K] with ONE (K+1)-token target forward at per-row
    cache offsets, commit the accepted prefix plus the correction/bonus
    token, scan the committed span for end ids, and freeze rows that were
    already done at round entry (they commit 0 and only overwrite junk past
    their frozen frontier). Greedy (default): accept while the argmax
    matches, correction = argmax at the first mismatch. ``sample_params``
    (temp_v, top_k_v, top_p_v per-row vectors) + ``rng``: point-mass
    rejection sampling (_verify_commit) — exact in distribution per
    committed token. Returns (tokens, n, t_cache, done)."""
    B = tokens.shape[0]
    W = K + 1
    bidx = jnp.arange(B)
    was_done = done  # rows finished in earlier rounds commit nothing
    vin_idx = (n - 1)[:, None] + jnp.arange(W, dtype=jnp.int32)[None]
    v_in = jnp.take_along_axis(tokens, vin_idx, axis=1)          # (B, W)
    t_cache = {**t_cache, "length": n - 1}
    (t_logits, _), t_cache = t_forward(
        t_params, t_config, v_in,
        (col < (n + K)[:, None]).astype(jnp.int32), vin_idx, None, t_cache)
    cand_idx = n[:, None] + jnp.arange(K, dtype=jnp.int32)[None]
    cand = jnp.take_along_axis(tokens, cand_idx, axis=1)         # (B, K)
    if sample_params is not None:
        temp_v, top_k_v, top_p_v = sample_params
        a, corr = _verify_commit(t_logits, cand, jnp.ones((B,), jnp.int32),
                                 temp_v, top_k_v, top_p_v, rng,
                                 sampling=True)
    else:
        a, corr = _verify_commit(t_logits, cand, jnp.zeros((B,), jnp.int32),
                                 None, None, None, None, sampling=False)
    tokens = tokens.at[bidx, n + a].set(corr)
    n_committed = a + 1

    # end-id scan over the committed tokens (reference stops right after
    # appending an end token, generation_util.py:89-94)
    if end_ids:
        jj = jnp.arange(W, dtype=jnp.int32)[None]
        committed = jnp.take_along_axis(tokens, n[:, None] + jj, axis=1)
        is_end = jnp.zeros((B, W), bool)
        for e in end_ids:
            is_end = is_end | (committed == e)
        is_end = is_end & (jj < n_committed[:, None])
        any_end = jnp.any(is_end, axis=1)
        first_e = jnp.argmax(is_end, axis=1)
        n_committed = jnp.where(any_end, first_e + 1, n_committed)
        done = done | any_end

    n = n + jnp.where(was_done, 0, n_committed)
    done = done | (n >= total_len)
    return tokens, n, t_cache, done


def _finish_batched(tokens, n, rounds, S0, pad_id, return_stats):
    """Host epilogue shared by the batched speculation paths: fetch tokens /
    frontiers / round count in ONE device_get, trim to the longest row, pad
    each row's tail past its frontier, reshape to the generate() (B, 1, L)
    contract, and optionally report per-round commit stats."""
    tokens_np, n, rounds = jax.device_get((tokens, n, rounds))
    rounds = int(rounds)
    n = np.asarray(n)
    B = tokens_np.shape[0]
    L = int(n.max())
    out = tokens_np[:, :L].copy()
    out[np.arange(L)[None] >= n[:, None]] = pad_id  # per-row tail padding
    out = out.reshape(B, 1, L)
    if return_stats:
        gen = float(np.maximum(n - S0 - 1, 0).sum())
        return out, {"rounds": rounds,
                     "tokens_per_round": gen / max(rounds * B, 1)}
    return out


@functools.partial(jax.jit, static_argnames=(
    "t_forward", "d_forward", "t_config", "d_config", "t_init_cache",
    "d_init_cache", "K", "end_ids", "total_len", "do_sample", "temperature",
    "top_k", "top_p"))
def _speculative_loop(t_params, d_params, t_config, d_config, t_forward,
                      d_forward, t_init_cache, d_init_cache, input_ids, rng,
                      K, end_ids, total_len, do_sample=False, temperature=1.0,
                      top_k=0, top_p=1.0):
    """ONE device program: token buffer + cache creation, target+draft
    prefill, then the draft/verify round while_loop (eager prefill would
    dispatch two full forwards op-by-op through a remote tunnel — the same
    pathology the generate() and serving engines avoid; eager buffer/cache
    allocation costs ~6 launch dispatches per call, see engine.py
    _generate_fused). Returns (tokens, n_final, rounds)."""
    S0 = input_ids.shape[1]
    T = total_len + K + 1  # margin: a round may overshoot before clamping
    tokens = jnp.zeros((1, T), jnp.int32)
    tokens = jax.lax.dynamic_update_slice(tokens, input_ids.astype(jnp.int32),
                                          (0, 0))
    t_cache = t_init_cache(t_config, 1, T)
    d_cache = d_init_cache(d_config, 1, T)
    col = jnp.arange(T, dtype=jnp.int32)[None]  # (1, T)
    wrapper = build_wrapper_chain(do_sample, temperature, top_k, top_p)

    def frontier_mask(upto):
        return (col < upto).astype(jnp.int32)

    def probs_of(logits_row):
        """Processed target/draft distribution of one (V,) logits row."""
        return jax.nn.softmax(wrapper(logits_row.astype(jnp.float32)[None])[0])

    # target prefill: commit the prompt and the target's first token
    pos0 = jnp.arange(S0, dtype=jnp.int32)[None]
    mask0 = frontier_mask(S0)
    (logits, _), t_cache = t_forward(t_params, t_config, input_ids, mask0,
                                     pos0, None, t_cache, last_only=True)
    if do_sample:
        rng, sub = jax.random.split(rng)
        first = jax.random.categorical(
            sub, wrapper(logits[0, -1:].astype(jnp.float32))[0]).astype(jnp.int32)
    else:
        first = jnp.argmax(logits[0, -1].astype(jnp.float32)).astype(jnp.int32)
    tokens = jax.lax.dynamic_update_slice(tokens, first[None, None], (0, S0))
    n0 = jnp.asarray(S0 + 1, jnp.int32)

    # draft prefill: warm the draft cache on the prompt (logits unused; the
    # catch-up window only spans the last K+1 tokens, so earlier prompt keys
    # must already be in the draft cache)
    _, d_cache = d_forward(d_params, d_config, input_ids, mask0, pos0, None,
                           d_cache, last_only=True)

    done0 = jnp.zeros((), bool)
    for e in end_ids:
        done0 = done0 | (first == e)

    V = logits.shape[-1]

    def cond(state):
        n, done = state[1], state[4]
        return jnp.logical_and(n < total_len, jnp.logical_not(done))

    def body(state):
        tokens, n, t_cache, d_cache, done, rounds, rng = state
        W = K + 1

        def pick(lg_row, key):
            """Draft/target token choice + the processed dist it came from."""
            p = probs_of(lg_row)
            if do_sample:
                tok = jax.random.categorical(key, jnp.log(p + 1e-30))
            else:
                tok = jnp.argmax(lg_row.astype(jnp.float32))
            return tok.astype(jnp.int32), p

        # --- draft catch-up + first proposal: feed the last W committed
        # tokens (window ends at position n-1); idempotent re-writes for keys
        # the draft cache already holds, fills the ones it missed (the
        # target's corrections from previous rounds)
        start = jnp.maximum(n - W, 0)
        window = jax.lax.dynamic_slice(tokens, (0, start), (1, W))
        pos_w = (start + jnp.arange(W, dtype=jnp.int32))[None]
        d_cache = {**d_cache, "length": start}
        (d_logits, _), d_cache = d_forward(
            d_params, d_config, window, frontier_mask(n), pos_w, None, d_cache)
        rng, sub = jax.random.split(rng)
        c, q0 = pick(d_logits[0, n - 1 - start], sub)
        tokens = jax.lax.dynamic_update_slice(tokens, c[None, None], (0, n))
        # per-proposal draft distributions, consumed by rejection sampling
        q_probs = jnp.zeros((K, V), jnp.float32).at[0].set(q0)

        # --- remaining K-1 proposals, single-token draft steps
        def draft_step(i, carry):
            tokens, d_cache, q_probs, rng = carry
            off = n + i - 1  # position of the candidate drafted last round
            tok = jax.lax.dynamic_slice(tokens, (0, off), (1, 1))
            d_cache = {**d_cache, "length": off}
            (lg, _), d_cache = d_forward(
                d_params, d_config, tok, frontier_mask(off + 1),
                jnp.full((1, 1), off, jnp.int32), None, d_cache)
            rng, sub = jax.random.split(rng)
            nxt, qi = pick(lg[0, -1], sub)
            q_probs = jax.lax.dynamic_update_slice(q_probs, qi[None], (i, 0))
            tokens = jax.lax.dynamic_update_slice(
                tokens, nxt[None, None], (0, off + 1))
            return tokens, d_cache, q_probs, rng

        tokens, d_cache, q_probs, rng = jax.lax.fori_loop(
            1, K, draft_step, (tokens, d_cache, q_probs, rng))

        # --- target verifies all K candidates in one (K+1)-token forward:
        # input [t_{n-1}, c_1..c_K] at offsets n-1..n+K-1 yields target
        # distributions p_0..p_K where p_i conditions on ...c_i
        v_in = jax.lax.dynamic_slice(tokens, (0, n - 1), (1, W))
        pos_v = (n - 1 + jnp.arange(W, dtype=jnp.int32))[None]
        t_cache = {**t_cache, "length": n - 1}
        (t_logits, _), t_cache = t_forward(
            t_params, t_config, v_in, frontier_mask(n + K), pos_v, None,
            t_cache)
        cand = jax.lax.dynamic_slice(tokens, (0, n), (1, K))[0]  # c_1..c_K

        if do_sample:
            # rejection sampling: accept c_i w.p. min(1, p_i(c_i)/q_i(c_i))
            p_probs = jax.nn.softmax(
                wrapper(t_logits[0].astype(jnp.float32)), axis=-1)  # (K+1, V)
            p_c = jnp.take_along_axis(p_probs[:K], cand[:, None], 1)[:, 0]
            q_c = jnp.take_along_axis(q_probs, cand[:, None], 1)[:, 0]
            rng, sub = jax.random.split(rng)
            u = jax.random.uniform(sub, (K,))
            accept = u < jnp.minimum(1.0, p_c / jnp.maximum(q_c, 1e-30))
            a = jnp.sum(jnp.cumprod(accept.astype(jnp.int32)))
            # rejected at a (< K): draw from the residual norm((p_a - q_a)+);
            # full acceptance (a == K): bonus draw from p_K
            q_at_a = jnp.where(a < K, 1.0, 0.0) * q_probs[jnp.minimum(a, K - 1)]
            resid = jnp.maximum(p_probs[a] - q_at_a, 0.0)
            resid = resid / jnp.maximum(jnp.sum(resid), 1e-30)
            rng, sub = jax.random.split(rng)
            fix = jax.random.categorical(
                sub, jnp.log(resid + 1e-30)).astype(jnp.int32)
            tokens = jax.lax.dynamic_update_slice(tokens, fix[None, None],
                                                  (0, n + a))
        else:
            g = jnp.argmax(t_logits[0].astype(jnp.float32), axis=-1).astype(
                jnp.int32)  # (K+1,)
            match = (g[:K] == cand)
            a = jnp.sum(jnp.cumprod(match.astype(jnp.int32)))  # accepted prefix
            # commit the target's own next token after the accepted prefix
            # (correction on mismatch, bonus token on full acceptance)
            tokens = jax.lax.dynamic_update_slice(tokens, g[a][None, None],
                                                  (0, n + a))
        n_committed = a + 1

        # end-id scan over the committed tokens (reference stops right after
        # appending an end token, generation_util.py:89-94)
        if end_ids:
            j = jnp.arange(W, dtype=jnp.int32)
            committed = jax.lax.dynamic_slice(tokens, (0, n), (1, W))[0]
            is_end = jnp.zeros((W,), bool)
            for e in end_ids:
                is_end = is_end | (committed == e)
            is_end = is_end & (j < n_committed)
            any_end = jnp.any(is_end)
            first = jnp.argmax(is_end)  # first True (0 if none, guarded)
            n_committed = jnp.where(any_end, first + 1, n_committed)
            done = done | any_end

        n = n + n_committed
        done = done | (n >= total_len)
        return tokens, n, t_cache, d_cache, done, rounds + 1, rng

    state = (tokens, n0, t_cache, d_cache, done0, jnp.zeros((), jnp.int32),
             rng)
    tokens, n, _, _, _, rounds, _ = jax.lax.while_loop(cond, body, state)
    return tokens, jnp.minimum(n, total_len), rounds


@functools.partial(jax.jit, static_argnames=(
    "t_forward", "d_forward", "t_config", "d_config", "t_init_cache",
    "d_init_cache", "K", "end_ids", "total_len", "do_sample", "temperature",
    "top_k", "top_p"))
def _speculative_loop_batched(t_params, d_params, t_config, d_config,
                              t_forward, d_forward, t_init_cache,
                              d_init_cache, input_ids, K, end_ids, total_len,
                              rng=None, do_sample=False, temperature=1.0,
                              top_k=10, top_p=0.8):
    """Batched draft-model speculation: the batch-1 round structure
    (draft catch-up window -> K proposals -> one (K+1)-token target verify)
    with every per-round quantity vectorized per row — committed length
    ``n`` (B,), per-row KV-cache offsets (the serving-style (B,) cache
    "length" the forwards already accept), per-row accepted-prefix length,
    per-row end detection. Rows that finish freeze (commit 0) while the
    rest keep speculating, writing only into junk buffer space past their
    frontier. Greedy (default) is bit-exact per row for any proposal
    source. ``do_sample=True`` (static): the draft still proposes its
    greedy argmax — a DETERMINISTIC proposal, so the point-mass rejection
    sampler (_verify_commit) applies and every committed token is exact in
    distribution vs the target's plain sampler (a q-distribution accept
    like the b1 loop's would only raise ACCEPTANCE, never change the
    committed distribution). Returns (tokens (B, T), n_final (B,),
    rounds)."""
    B, S0 = input_ids.shape
    T = total_len + K + 1
    W = K + 1
    bidx = jnp.arange(B)
    if do_sample:
        rng = jnp.asarray(rng, jnp.uint32)
        rng, sub = jax.random.split(rng)
        sp = (jnp.full((B,), temperature, jnp.float32),
              jnp.full((B,), int(top_k or 0), jnp.int32),
              jnp.full((B,), float(top_p if top_p is not None else 1.0),
                       jnp.float32))
    else:
        sub, sp = None, None
    rng0 = rng if do_sample else jnp.zeros((2,), jnp.uint32)
    # target prefill commits the prompt + the target's first token
    tokens, n0, t_cache, done0, col, mask0, pos0 = _batched_prefill(
        t_forward, t_params, t_config, t_init_cache, input_ids, T, end_ids,
        rng=sub, sample_params=sp)
    # draft prefill warms the draft cache on the prompt
    d_cache = d_init_cache(d_config, B, T)
    _, d_cache = d_forward(d_params, d_config, input_ids, mask0, pos0, None,
                           d_cache, last_only=True)
    d_cache = {**d_cache, "length": jnp.full((B,), S0, jnp.int32)}

    def cond(state):
        n, done = state[1], state[4]
        return jnp.any(jnp.logical_not(done) & (n < total_len))

    def body(state):
        tokens, n, t_cache, d_cache, done, rounds, rng = state

        # --- draft catch-up + first proposal: per-row window of the last W
        # committed tokens (idempotent re-writes for keys the draft cache
        # already holds; fills the target's corrections it missed)
        start = jnp.maximum(n - W, 0)                            # (B,)
        win_idx = start[:, None] + jnp.arange(W, dtype=jnp.int32)[None]
        window = jnp.take_along_axis(tokens, win_idx, axis=1)    # (B, W)
        d_cache = {**d_cache, "length": start}
        (d_logits, _), d_cache = d_forward(
            d_params, d_config, window,
            (col < n[:, None]).astype(jnp.int32), win_idx, None, d_cache)
        sel = (n - 1 - start)[:, None, None]                     # (B,1,1)
        lg = jnp.take_along_axis(d_logits, sel, axis=1)[:, 0]    # (B, V)
        c = jnp.argmax(lg.astype(jnp.float32), axis=-1).astype(jnp.int32)
        tokens = tokens.at[bidx, n].set(c)

        # --- remaining K-1 proposals, per-row single-token draft steps
        def draft_step(i, carry):
            tokens, d_cache = carry
            off = n + i - 1                                      # (B,)
            tok = jnp.take_along_axis(tokens, off[:, None], axis=1)
            d_cache = {**d_cache, "length": off}
            (lg, _), d_cache = d_forward(
                d_params, d_config, tok,
                (col < (off + 1)[:, None]).astype(jnp.int32),
                off[:, None], None, d_cache)
            nxt = jnp.argmax(lg[:, -1].astype(jnp.float32), axis=-1).astype(
                jnp.int32)
            tokens = tokens.at[bidx, off + 1].set(nxt)
            return tokens, d_cache

        tokens, d_cache = jax.lax.fori_loop(1, K, draft_step,
                                            (tokens, d_cache))

        # --- target verifies all K per row in one (K+1)-token forward
        if do_sample:
            rng, sub = jax.random.split(rng)
        else:
            sub = None
        tokens, n, t_cache, done = _verify_commit_round(
            t_forward, t_params, t_config, tokens, n, t_cache, done, col,
            K, end_ids, total_len, rng=sub, sample_params=sp)
        return tokens, n, t_cache, d_cache, done, rounds + 1, rng

    state = (tokens, n0, t_cache, d_cache, done0, jnp.zeros((), jnp.int32),
             rng0)
    tokens, n, _, _, _, rounds, _ = jax.lax.while_loop(cond, body, state)
    return tokens, jnp.minimum(n, total_len), rounds


@functools.partial(jax.jit, static_argnames=(
    "t_forward", "t_config", "t_init_cache", "K", "ngram", "end_ids",
    "total_len", "do_sample", "temperature", "top_k", "top_p"))
def _prompt_lookup_loop(t_params, t_config, t_forward, t_init_cache,
                        input_ids, K, ngram, end_ids, total_len,
                        rng=None, do_sample=False, temperature=1.0,
                        top_k=10, top_p=0.8):
    """Draft-FREE speculation (prompt-lookup / n-gram decoding): each round
    proposes the K tokens that followed the most recent earlier occurrence
    of the last ``ngram`` committed tokens, then verifies all K with one
    multi-token target forward — the draft model is replaced by a
    vectorized window match over the committed buffer. Greedy bit-exactness
    holds for ANY proposal source, so this accelerates repetitive
    continuations (code, extraction, chat echoes) with zero extra HBM for
    draft weights.

    FULLY BATCHED: every per-round quantity is a per-row vector — committed
    length ``n`` (B,), per-row cache offsets (the serving-style (B,) cache
    "length"), per-row n-gram match/acceptance, per-row end/done. Rows that
    finish early keep re-verifying junk past their frozen frontier (their
    commits are masked to 0), the standard padded-batch trade. Returns
    (tokens (B, T), n_final (B,), rounds).

    ``do_sample=True`` (static) commits SAMPLED streams: the prefill's
    first token draws from the processed distribution and each round's
    accept/commit runs point-mass rejection sampling (_verify_commit) with
    the uniform temperature/top-k/top-p — every committed token exact in
    distribution vs the plain sampler. Greedy proposals still come from
    the committed stream's own n-gram matches (proposal quality only
    affects speed, never the distribution)."""
    B, S0 = input_ids.shape
    T = total_len + K + 1
    bidx = jnp.arange(B)
    if do_sample:
        rng = jnp.asarray(rng, jnp.uint32)
        rng, sub = jax.random.split(rng)
        sp = (jnp.full((B,), temperature, jnp.float32),
              jnp.full((B,), int(top_k or 0), jnp.int32),
              jnp.full((B,), float(top_p if top_p is not None else 1.0),
                       jnp.float32))
    else:
        sub, sp = None, None
    tokens, n0, t_cache, done0, col, _, _ = _batched_prefill(
        t_forward, t_params, t_config, t_init_cache, input_ids, T, end_ids,
        rng=sub, sample_params=sp)
    rng0 = rng if do_sample else jnp.zeros((2,), jnp.uint32)

    def cond(state):
        n, done = state[1], state[3]
        return jnp.any(jnp.logical_not(done) & (n < total_len))

    def body(state):
        tokens, n, t_cache, done, rounds, rng = state

        # --- propose per row: last j with tokens[b, j:j+ngram] ==
        # tokens[b, n_b-ngram:n_b]; candidates tokens[b, j+ngram:j+ngram+K]
        pat_idx = (n - ngram)[:, None] + jnp.arange(ngram,
                                                    dtype=jnp.int32)[None]
        pattern = jnp.take_along_axis(tokens, pat_idx, axis=1)   # (B, ngram)
        match = (col + ngram) < n[:, None]                       # (B, T)
        for g in range(ngram):
            shifted = jnp.roll(tokens, -g, axis=1)
            match = match & (shifted == pattern[:, g:g + 1])
        # prefer the last match whose K-token continuation is fully
        # committed (proposals past the frontier are stale buffer junk that
        # caps acceptance); fall back to the very last match, then to
        # repeating the final token
        full = match & ((col + ngram + K) <= n[:, None])

        def last_true(m):
            return (T - 1) - jnp.argmax(m[:, ::-1], axis=1)

        any_match = jnp.any(match, axis=1)
        idx = jnp.where(jnp.any(full, axis=1), last_true(full),
                        jnp.where(any_match, last_true(match), 0))
        src = jnp.where(any_match, idx + ngram, jnp.maximum(n - 1, 0))
        cand_idx = src[:, None] + jnp.arange(K, dtype=jnp.int32)[None]
        cand = jnp.take_along_axis(tokens, cand_idx, axis=1)     # (B, K)
        wr_idx = n[:, None] + jnp.arange(K, dtype=jnp.int32)[None]
        # scatter the proposals at [n_b, n_b+K) — done rows overwrite junk
        # past their frozen frontier, never committed text
        tokens = tokens.at[bidx[:, None], wr_idx].set(cand)

        # --- verify all K per row in one forward (per-row cache offsets)
        if do_sample:
            rng, sub = jax.random.split(rng)
        else:
            sub = None
        tokens, n, t_cache, done = _verify_commit_round(
            t_forward, t_params, t_config, tokens, n, t_cache, done, col,
            K, end_ids, total_len, rng=sub, sample_params=sp)
        return tokens, n, t_cache, done, rounds + 1, rng

    state = (tokens, n0, t_cache, done0, jnp.zeros((), jnp.int32), rng0)
    tokens, n, _, _, rounds, _ = jax.lax.while_loop(cond, body, state)
    return tokens, jnp.minimum(n, total_len), rounds


def prompt_lookup_generate(model, input_ids, attention_mask=None,
                           generation_configs=None, draft_len=8, ngram=2,
                           return_stats=False, rng=None):
    """Draft-free speculative decoding (prompt-lookup). Greedy (default) is
    bit-exact vs ``model.generate(do_sample=False, beam_size=1)`` per row;
    ``do_sample=True`` commits streams distributed exactly as the plain
    temperature/top-k/top-p sampler (point-mass rejection sampling — the
    deterministic proposals only affect speed, never the distribution).
    Shines when the continuation repeats earlier context (extraction, code,
    chat-with-quoting); on non-repetitive text it degrades gracefully to
    ~one committed token per verify forward.

    BATCHED: any batch size, with per-row n-gram matching / acceptance /
    end detection and per-row cache offsets; rows finishing early freeze
    while the rest keep speculating. Prompts must be unpadded (equal
    length), like the draft-model path. Returns (B, 1, L) with rows past
    their end token padded by ``pad_id``."""
    cfg = generation_configs or {}
    if getattr(model.config, "swa_ring_cache", False):
        raise ValueError("speculative decoding does not support "
                         "swa_ring_cache models (verify windows assume "
                         "cache slot == absolute position)")
    assert cfg.get("beam_size", 1) == 1, "prompt-lookup is beam-free"
    assert not cfg.get("no_repeat_ngram_size", 0), \
        "ngram processors are unsupported in speculative decoding"
    max_gen_len = cfg.get("max_gen_len", 100)
    pad_id = cfg.get("pad_id", 0) or 0
    end_ids = _normalize_end_ids(cfg.get("end_ids", None))
    do_sample = bool(cfg.get("do_sample", False))
    if do_sample and rng is None:
        # raw legacy uint32 key, host-built (no eager device op)
        rng = np.asarray([0, np.random.randint(0, 2 ** 31 - 1)], np.uint32)

    # host-side conversion: an eager jnp.asarray is a device_put (+ the mask
    # check a blocking sum) per call — measurable on remote tunnels
    input_ids = np.asarray(input_ids, np.int32)
    if attention_mask is not None:
        assert (np.asarray(attention_mask) != 0).all(), \
            "padded prompts are unsupported in speculative decoding"
    B, S0 = input_ids.shape
    assert S0 >= int(ngram), "prompt shorter than the lookup ngram"
    total_len = S0 + max_gen_len + 2

    from cleantransformer_tpu.generation.engine import (inference_params,
                                                        cache_factory)
    tokens, n, rounds = _prompt_lookup_loop(
        inference_params(model), model.config, model.forward_fn(),
        cache_factory(model), np.asarray(input_ids, np.int32),
        K=int(draft_len), ngram=int(ngram), end_ids=end_ids,
        total_len=total_len, rng=rng, do_sample=do_sample,
        temperature=float(cfg.get("temperature", 1.0)),
        top_k=cfg.get("top_k", 10), top_p=cfg.get("top_p", 0.8))
    return _finish_batched(tokens, n, rounds, S0, pad_id, return_stats)


def speculative_generate(model, draft_model, input_ids, attention_mask=None,
                         generation_configs=None, draft_len=4,
                         return_stats=False, rng=None):
    """Generation accelerated by a draft model; returns tokens of shape
    (1, 1, n). Greedy (default) is bit-exact vs ``model.generate`` with
    ``do_sample=False, beam_size=1``; ``do_sample=True`` commits a stream
    distributed exactly as the target's temperature/top-k/top-p sampler
    (rejection sampling — see the module docstring).

    ``generation_configs`` honors max_gen_len / end_ids / pad_id /
    do_sample / temperature / top_k / top_p (beam_size must be 1, no ngram
    ban)."""
    cfg = generation_configs or {}
    if getattr(model.config, "swa_ring_cache", False):
        raise ValueError("speculative decoding does not support "
                         "swa_ring_cache models (verify windows assume "
                         "cache slot == absolute position)")
    assert cfg.get("beam_size", 1) == 1, "speculative decoding is beam-free"
    assert not cfg.get("no_repeat_ngram_size", 0), \
        "ngram processors are unsupported in speculative decoding"
    do_sample = bool(cfg.get("do_sample", False))
    temperature = float(cfg.get("temperature", 1.0))
    top_k = cfg.get("top_k", 10)
    top_p = cfg.get("top_p", 0.8)
    # flash attention is fine here: the kernel's causal iota takes the dynamic
    # cache offset, so the verify/catch-up windows at nonzero offsets are exact
    max_gen_len = cfg.get("max_gen_len", 100)
    end_ids = _normalize_end_ids(cfg.get("end_ids", None))

    input_ids = np.asarray(input_ids, np.int32)
    if attention_mask is not None:
        assert (np.asarray(attention_mask) != 0).all(), \
            "padded prompts are unsupported in speculative decoding"
    B, S0 = input_ids.shape
    K = int(draft_len)
    assert K >= 1
    total_len = S0 + max_gen_len + 2  # reference loop emits max_gen_len + 2

    from cleantransformer_tpu.generation.engine import (cache_factory,
                                                        inference_params)
    t_params = inference_params(model)
    d_params = inference_params(draft_model)
    t_forward = model.forward_fn()
    d_forward = draft_model.forward_fn()

    if rng is None:
        # raw legacy uint32 key, host-built (no eager device op)
        rng = np.asarray([0, np.random.randint(0, 2 ** 31 - 1)], np.uint32)

    if B > 1:  # batched rounds with per-row acceptance/offsets; sampling
        # rows commit via point-mass rejection (_verify_commit)
        tokens, n, rounds = _speculative_loop_batched(
            t_params, d_params, model.config, draft_model.config, t_forward,
            d_forward, cache_factory(model),
            cache_factory(draft_model),
            np.asarray(input_ids, np.int32), K=K, end_ids=end_ids,
            total_len=total_len, rng=rng, do_sample=do_sample,
            temperature=temperature, top_k=top_k, top_p=top_p)
        return _finish_batched(tokens, n, rounds, S0,
                               cfg.get("pad_id", 0) or 0, return_stats)

    tokens, n, rounds = _speculative_loop(
        t_params, d_params, model.config, draft_model.config, t_forward,
        d_forward, cache_factory(model),
        cache_factory(draft_model),
        np.asarray(input_ids, np.int32), rng,
        K=K, end_ids=end_ids, total_len=total_len, do_sample=do_sample,
        temperature=temperature, top_k=top_k, top_p=top_p)
    tokens_np, n, rounds = jax.device_get((tokens, n, rounds))
    n, rounds = int(n), int(rounds)
    out = tokens_np[:, :n].reshape(1, 1, n)
    if return_stats:
        gen = max(n - S0 - 1, 0)  # tokens committed by speculation rounds
        return out, {"rounds": rounds,
                     "tokens_per_round": gen / max(rounds, 1)}
    return out
