"""Fully-jitted beam search: ONE compiled program (prefill + lax.while_loop),
no host synchronization per token.

Semantics replicate the reference's _beam_search exactly
(generation_util.py:207-290), with its dynamic Python bookkeeping
(_update_beam_infos, L121-178) recast as a fixed-size tensor state machine:

 - candidate pool   -> pool_scores (bsz, beam) with +1e9 empties + pool_count
   (the reference stores finished candidates' ids too, but never returns
   them — only their scores drive termination, so only scores are kept)
 - worst_score      -> running min over the pool (identical to the
   append/evict/second-smallest dance at L148-154, see _pool_insert)
 - per-candidate sequential selection with the valid>=beam early break
   (L139-163) -> an unrolled loop over the 2*beam candidates with masks
 - beam reorder + KV gather (L247-272) -> jnp.take along the batch axis
 - early-stop / best-possible-score termination (L167-176)

Early exit: the reference's loop only ends on step > max_len, padding done
batches forever and re-gathering them onto beam 0 every iteration. The fused
loop exits as soon as every batch is done, then applies the one
"normalize onto beam 0" gather those skipped iterations would have performed
(the token buffer is pad-initialized, so the skipped pad appends are already
in place). Output is bit-identical either way.

Sampling uses the Gumbel top-k trick for without-replacement multinomial
(generation_util.py:195).
"""

import functools

import jax
import jax.numpy as jnp

from cleantransformer_tpu.generation.logits_process import (
    no_repeat_ngram, build_wrapper_chain,
)
from cleantransformer_tpu.generation import engine as _engine


def _top_k_small(scores, k):
    """Exact top-k for small k: k iterated argmax+mask passes — k linear
    reductions over the (bsz, beam*V) score matrix instead of lax.top_k's
    sort network over ~150k lanes (the dominant beam-step cost on this
    toolchain: greedy's fused argmax reduction costs ~55 us where beam's
    top_k-of-2*beam measured ~2 ms). Bit-identical to lax.top_k: values
    descend, ties break to the lowest index in both (argmax returns the
    first maximum)."""
    bsz = scores.shape[0]
    rows = jnp.arange(bsz)
    vals, idxs = [], []
    s = scores
    for _ in range(k):
        i = jnp.argmax(s, axis=-1)
        vals.append(s[rows, i])
        idxs.append(i.astype(jnp.int32))
        s = s.at[rows, i].set(-jnp.inf)
    return jnp.stack(vals, axis=1), jnp.stack(idxs, axis=1)


def _pool_insert(pool, pool_count, worst, s, do_pool, beam):
    """Insert score ``s`` for rows where ``do_pool``; evict the smallest when
    full (reference L146-154). pool empties are +1e9."""
    bsz = pool.shape[0]
    b_idx = jnp.arange(bsz)
    has_space = pool_count < beam
    min_slot = jnp.argmin(pool, axis=1)
    min_val = jnp.min(pool, axis=1)
    slot = jnp.where(has_space, jnp.minimum(pool_count, beam - 1), min_slot)
    write = do_pool & (has_space | (s > min_val))
    new_vals = jnp.where(write, s, pool[b_idx, slot])
    pool = pool.at[b_idx, slot].set(new_vals)
    pool_count = pool_count + (do_pool & has_space).astype(pool_count.dtype)
    worst = jnp.where(do_pool, jnp.min(pool, axis=1), worst)
    return pool, pool_count, worst


def _select_candidates(token_indices, next_tokens, picked, is_done, pool,
                       pool_count, worst, cur_len, beam, end_ids, pad_id,
                       length_penalty=1.0):
    """Vectorized _update_beam_infos (generation_util.py:121-178)."""
    bsz, n_cand = next_tokens.shape
    vc = jnp.zeros((bsz,), jnp.int32)
    new_idx = jnp.zeros((bsz, beam), jnp.int32)
    new_tok = jnp.zeros((bsz, beam), jnp.int32)
    new_prob = jnp.zeros((bsz, beam), jnp.float32)

    is_end = jnp.zeros((bsz, n_cand), bool)
    if end_ids:
        for e in end_ids:
            is_end = is_end | (next_tokens == e)

    beam_range = jnp.arange(beam)
    # NB: only the FIRST beam candidates are examined — the reference's
    # selection loop is `for beam_i in range(beam)` (generation_util.py:140);
    # an end-token among them leaves trailing beam slots at token/index/prob 0.
    for ci in range(beam):
        stopped = vc >= beam
        active = (~is_done) & (~stopped)
        cand_end = is_end[:, ci]
        # pool path: end-candidates (L141-154)
        do_pool = active & cand_end
        s = picked[:, ci] / (cur_len.astype(jnp.float32) ** length_penalty)
        pool, pool_count, worst = _pool_insert(pool, pool_count, worst, s,
                                               do_pool, beam)
        # beam-fill path (L156-160)
        do_fill = active & (~cand_end)
        onehot = (beam_range[None, :] == vc[:, None]) & do_fill[:, None]
        new_idx = jnp.where(onehot, token_indices[:, ci][:, None], new_idx)
        new_tok = jnp.where(onehot, next_tokens[:, ci][:, None], new_tok)
        new_prob = jnp.where(onehot, picked[:, ci][:, None], new_prob)
        vc = vc + do_fill.astype(jnp.int32)

    # done rows emit pad on every beam (L135-137)
    new_tok = jnp.where(is_done[:, None], pad_id, new_tok)
    return new_idx, new_tok, new_prob, pool, pool_count, worst


@functools.partial(jax.jit, static_argnames=(
    "forward", "config", "beam_size", "ngram_size", "do_sample", "temperature",
    "top_k", "top_p", "end_ids", "pad_id", "early_stop", "total_len", "s0"))
def beam_search_fused(params, config, forward, input_ids, position_ids,
                      segment_ids, tokens_buf, mask_buf, cache, aux, rng,
                      beam_size, ngram_size, do_sample, temperature, top_k,
                      top_p, end_ids, pad_id, early_stop, total_len, s0,
                      length_penalty=1.0):
    """input_ids etc. already beam-expanded to B = bsz*beam rows."""
    B = tokens_buf.shape[0]
    bsz = B // beam_size
    wrapper = build_wrapper_chain(do_sample, temperature, top_k, top_p)

    probs = jnp.zeros((bsz, beam_size), jnp.float32).at[:, 1:].set(-1e9)
    pool = jnp.full((bsz, beam_size), 1e9, jnp.float32)
    pool_count = jnp.zeros((bsz,), jnp.int32)
    worst = jnp.full((bsz,), 1e9, jnp.float32)
    is_done = jnp.zeros((bsz,), bool)

    def process(scores_logits, state):
        (tokens_buf, mask_buf, cache, aux, probs, pool, pool_count, worst,
         is_done, rng, cur_len) = state
        V = scores_logits.shape[-1]
        if ngram_size and ngram_size > 1:
            scores_logits = no_repeat_ngram(tokens_buf, cur_len, scores_logits,
                                            ngram_size)
        scores_log = jax.nn.log_softmax(scores_logits, axis=-1)
        probs_col = probs.reshape(-1, 1)
        if do_sample:
            scores = scores_log + probs_col * temperature
        else:
            scores = scores_log + probs_col
        scores = scores.reshape(bsz, beam_size * V)
        rng, sub = jax.random.split(rng)
        if do_sample:
            scores = wrapper(scores)
            gumbel = jax.random.gumbel(sub, scores.shape)
            _, cand = _top_k_small(scores + gumbel, 2 * beam_size)
            picked = jnp.take_along_axis(scores, cand, axis=-1)
            order = jnp.argsort(-picked, axis=1)
            picked = jnp.take_along_axis(picked, order, axis=1)
            cand = jnp.take_along_axis(cand, order, axis=1)
        else:
            picked, cand = _top_k_small(scores, 2 * beam_size)
        token_indices = (cand // V).astype(jnp.int32)
        next_tokens = (cand % V).astype(jnp.int32)

        new_idx, new_tok, new_prob, pool, pool_count, worst = _select_candidates(
            token_indices, next_tokens, picked, is_done, pool, pool_count,
            worst, cur_len, beam_size, end_ids, pad_id, length_penalty)

        # termination (L167-176)
        full = pool_count >= beam_size
        if early_stop:
            is_done = is_done | full
        else:
            next_high = jnp.max(picked, axis=1) / (
                (cur_len.astype(jnp.float32) + 1) ** length_penalty)
            is_done = is_done | (full & (worst > next_high))

        # reorder + append (L247-272)
        flat_idx = (new_idx + jnp.arange(bsz)[:, None] * beam_size).reshape(-1)
        tokens_buf = jnp.take(tokens_buf, flat_idx, axis=0)
        mask_buf = jnp.take(mask_buf, flat_idx, axis=0)
        cache = jax.tree_util.tree_map(
            lambda x: jnp.take(x, flat_idx, axis=1) if x.ndim >= 2 else x, cache)
        aux = jax.tree_util.tree_map(
            lambda x: jnp.take(x, flat_idx, axis=0) if x.ndim == 2 else x, aux)
        aux = _engine._aux_extend(aux, cur_len, B, beam_mode=True)
        extend = mask_buf[jnp.arange(B), jnp.maximum(cur_len - 1, 0)]
        tokens_buf = jax.lax.dynamic_update_slice(
            tokens_buf, new_tok.reshape(-1, 1), (0, cur_len))
        mask_buf = jax.lax.dynamic_update_slice(
            mask_buf, extend[:, None], (0, cur_len))
        return (tokens_buf, mask_buf, cache, aux, new_prob, pool, pool_count,
                worst, is_done, rng, cur_len + 1)

    # prefill (first iteration of the reference loop, L227-232)
    (logits, _), cache = forward(params, config, input_ids, mask_buf,
                                 position_ids, segment_ids, cache,
                                 last_only=True)
    state = (tokens_buf, mask_buf, cache, aux, probs, pool, pool_count, worst,
             is_done, rng, jnp.asarray(s0, jnp.int32))
    state = process(logits[:, -1, :].astype(jnp.float32), state)

    def cond(state):
        cur_len = state[-1]
        is_done = state[8]
        # reference END check: step = cur_len - 1 > s0 + max_gen_len
        return jnp.logical_and(cur_len < total_len, ~jnp.all(is_done))

    def body(state):
        (tokens_buf, mask_buf, cache, aux, probs, pool, pool_count, worst,
         is_done, rng, cur_len) = state
        last_tok = jax.lax.dynamic_slice(tokens_buf, (0, cur_len - 1), (B, 1))
        pos, seg = _engine._aux_slice(aux, cur_len, B)
        (logits, _), cache = forward(params, config, last_tok, mask_buf,
                                     pos, seg, cache)
        state = (tokens_buf, mask_buf, cache, aux, probs, pool, pool_count,
                 worst, is_done, rng, cur_len)
        return process(logits[:, -1, :].astype(jnp.float32), state)

    state = jax.lax.while_loop(cond, body, state)
    (tokens_buf, mask_buf, cache, aux, probs, pool, pool_count, worst, is_done,
     rng, cur_len) = state

    # early-exit normalization: iterations the reference would still have run
    # re-gather done batches onto beam 0 (see module docstring)
    would_continue = cur_len < total_len
    beam0 = tokens_buf.reshape(bsz, beam_size, -1)[:, :1]
    normalized = jnp.broadcast_to(beam0, (bsz, beam_size, tokens_buf.shape[-1]))
    norm_mask = (would_continue & is_done)[:, None, None]
    out = jnp.where(norm_mask, normalized,
                    tokens_buf.reshape(bsz, beam_size, -1))
    return out
