"""Continuous-batching serving engine (TPU-native extension, beyond the
reference's capability set — the reference serves one batch per generate()
call, examples/bloom_interactive.py).

Design: a fixed pool of B decode slots over ONE fixed-shape KV cache
(L, B, H, T, hd). Requests are admitted into free slots by per-request
jitted prefill programs (prompt lengths padded to a small set of static
buckets); prompts longer than the largest bucket are prefilled in
bucket-sized CHUNKS at nonzero cache offsets (the flash/dense causal iota
takes the dynamic offset, so chunked prefill is exact). All active slots
then advance together through a jitted multi-token decode chunk with
PER-ROW cache offsets (ragged batching — each slot is at its own position).
Finished slots are freed and refilled without ever stopping the others, so
decode throughput stays at full batch utilization under a stream of
variable-length requests.

Sampling parameters (do_sample / temperature / top_k / top_p) are
PER-REQUEST: they live in per-slot device arrays and the chunked decode
applies them row-wise (dynamic — no recompile per distinct temperature).
Greedy-only workloads keep the pure-argmax decode program; the first
sampling request switches the engine to the row-wise sampling variant
(one extra compile, then cached).

Speculative serving (``speculative="lookup"``): decode chunks run
prompt-lookup speculation ROUNDS instead of single-token steps — each round
proposes ``draft_len`` tokens per slot from its own committed stream and
verifies them in ONE ragged (K+1)-token forward (the whole-stack window
kernel for ``config.fused_decode`` models), committing 1..K+1 tokens per
slot per round. Greedy rows are bit-exact vs the plain path; sampling rows
run per-row point-mass rejection sampling (every committed token
distributed exactly as plain sampling). The adaptive
dispatch depth scales by a host-side tokens-per-round EMA so a depth-N
dispatch doesn't enqueue ~K+1x more rounds than the work needs.

Prefix caching (``register_prefix``): the KV of a shared prompt prefix
(system prompt, few-shot preamble) is computed once and pinned device-side;
admission seeds matching requests' slots from the store in one
dynamic_update_slice program and chunk-prefills only the suffix at
``cache_off = matched_len``. Bit-exact by causality (prefix k/v never
depend on later tokens; the chunked prefill path is offset-exact), matched
automatically at submit() by longest common prefix.

Everything device-side is fixed-shape and compiles once per prefill bucket
(x greedy/sampling) plus once per decode variant. The host syncs once per
chunk (a single device_get of one packed int32 results array), never per
token — and PIPELINED: step() dispatches decode chunk N+1 before fetching
chunk N's results, so the device computes while the host round-trips
(results lag dispatch by one chunk; the tail dispatches one no-op chunk).
Admission is FIFO.
"""

import functools
from collections import deque

import numpy as np

import jax
import jax.numpy as jnp

from cleantransformer_tpu.generation.speculative import (_process_scores,
                                                         _verify_commit)

DEFAULT_BUCKETS = (16, 32, 64, 128, 256)


def _choose_rowwise(scores, do_sample_v, temp_v, top_k_v, top_p_v, rng):
    """Per-row token choice with dynamic sampling params (see
    _process_scores), per-row do_sample selecting sampled vs argmax."""
    greedy = jnp.argmax(scores, axis=-1).astype(jnp.int32)
    s = _process_scores(scores, temp_v, top_k_v, top_p_v)
    sampled = jax.random.categorical(rng, s, axis=-1).astype(jnp.int32)
    return jnp.where(do_sample_v.astype(bool), sampled, greedy)


def _choose(state, rows_scores, row_ids, sampling):
    """Pick tokens for the given rows. ``sampling`` is the static engine
    variant flag: False = pure argmax (no wasted sort/softmax work),
    True = row-wise dynamic sampling params from the slot state."""
    if not sampling:
        return state, jnp.argmax(rows_scores, axis=-1).astype(jnp.int32)
    rng, sub = jax.random.split(state["rng"])
    state = dict(state)
    state["rng"] = rng
    tok = _choose_rowwise(rows_scores,
                          state["do_sample"][row_ids],
                          state["temperature"][row_ids],
                          state["top_k"][row_ids],
                          state["top_p"][row_ids], sub)
    return state, tok


def _cache_dims(buf):
    """(L, B, H, T, hd) of a cache buffer — dense array or int8 {"q","s"}.
    A fused (L, B, T, D) buffer (models/*.py fused_decode layout, float or
    int8 {"q","s"}) reports H=1, hd=D."""
    shape = (buf["q"] if isinstance(buf, dict) else buf).shape
    if len(shape) == 4:
        L, B, T, D = shape
        return L, B, 1, T, D
    return shape


def _is_fused(buf):
    return (buf["q"] if isinstance(buf, dict) else buf).ndim == 4


def _slot_slice(buf, slot, window):
    """One slot's cache slice over the first ``window`` key positions
    (int8- and fused-layout aware)."""
    L, _, H, _, hd = _cache_dims(buf)
    if isinstance(buf, dict):
        if _is_fused(buf):  # {"q": (L,B,T,D), "s": (L,B,T,Hh)}
            Hs = buf["s"].shape[-1]
            return {"q": jax.lax.dynamic_slice(buf["q"], (0, slot, 0, 0),
                                               (L, 1, window, hd)),
                    "s": jax.lax.dynamic_slice(buf["s"], (0, slot, 0, 0),
                                               (L, 1, window, Hs))}
        return {"q": jax.lax.dynamic_slice(buf["q"], (0, slot, 0, 0, 0),
                                           (L, 1, H, window, hd)),
                "s": jax.lax.dynamic_slice(buf["s"], (0, slot, 0, 0),
                                           (L, 1, H, window))}
    if buf.ndim == 4:  # fused (L, B, T, D)
        return jax.lax.dynamic_slice(buf, (0, slot, 0, 0),
                                     (L, 1, window, hd))
    return jax.lax.dynamic_slice(buf, (0, slot, 0, 0, 0),
                                 (L, 1, H, window, hd))


def _slot_update(buf, new, slot):
    """Write a slot slice back into the full cache (int8/fused aware)."""
    if isinstance(buf, dict):
        if _is_fused(buf):
            return {"q": jax.lax.dynamic_update_slice(
                        buf["q"], new["q"], (0, slot, 0, 0)),
                    "s": jax.lax.dynamic_update_slice(
                        buf["s"], new["s"].astype(buf["s"].dtype),
                        (0, slot, 0, 0))}
        return {"q": jax.lax.dynamic_update_slice(
                    buf["q"], new["q"], (0, slot, 0, 0, 0)),
                "s": jax.lax.dynamic_update_slice(
                    buf["s"], new["s"].astype(buf["s"].dtype),
                    (0, slot, 0, 0))}
    if buf.ndim == 4:
        return jax.lax.dynamic_update_slice(buf, new.astype(buf.dtype),
                                            (0, slot, 0, 0))
    return jax.lax.dynamic_update_slice(buf, new.astype(buf.dtype),
                                        (0, slot, 0, 0, 0))


@functools.partial(jax.jit, static_argnames=(
    "forward", "config", "bucket", "window", "final", "sampling", "end_ids",
    "needs_positions"), donate_argnames=("state",))
def _prefill_chunk(params, config, forward, state, ids_bucket, chunk_len,
                   cache_off, prompt_total, max_total, slot, do_sample,
                   temperature, top_k, top_p, bucket, window, final, sampling,
                   end_ids, needs_positions):
    """Prefill ONE chunk of one request's prompt into ``slot`` at cache
    offset ``cache_off`` — ONE device program per chunk (host-side eager ops
    are prohibitively slow through a remote-compile tunnel).

    ids_bucket: (1, bucket) chunk padded on the right; only the first
    ``chunk_len`` positions are real. ``window`` (static, host-known:
    covers cache_off + bucket) bounds the cache slice the chunk attends, so
    short prompts never pay attention over the full max_len buffer.
    ``final=True`` additionally samples the first generated token and
    activates the slot (fused into the same program)."""
    L, B, H, _, hd = _cache_dims(state["cache_k"])
    # token/mask buffers are (B, max_len); the fused cache may be padded to
    # the 8-sublane tile (Tp >= max_len) — width math must use the buffers
    T = state["tokens"].shape[1]

    # the slot's cache slice carries the previous chunks' keys
    ck = _slot_slice(state["cache_k"], slot, window)
    cv = _slot_slice(state["cache_v"], slot, window)
    cache = {"k": ck, "v": cv, "length": cache_off}
    # attendable keys: everything before this chunk's valid frontier
    mask1 = (jnp.arange(window, dtype=jnp.int32)
             < cache_off + chunk_len)[None].astype(jnp.int32)
    pos = (cache_off + jnp.arange(bucket, dtype=jnp.int32))[None] \
        if needs_positions else None
    (logits, _), cache = forward(params, config, ids_bucket, mask1, pos,
                                 None, cache, last_only=not final)

    state = dict(state)
    state["cache_k"] = _slot_update(state["cache_k"], cache["k"], slot)
    state["cache_v"] = _slot_update(state["cache_v"], cache["v"], slot)
    # record the chunk's tokens at [cache_off, cache_off + chunk_len)
    row_tok = state["tokens"][slot]
    chunk_write = jax.lax.dynamic_update_slice(
        jnp.zeros((T,), jnp.int32), ids_bucket[0], (cache_off,))
    col = jnp.arange(T, dtype=jnp.int32)
    in_chunk = (col >= cache_off) & (col < cache_off + chunk_len)
    state["tokens"] = state["tokens"].at[slot].set(
        jnp.where(in_chunk, chunk_write, row_tok))
    if not final:
        return state

    # final chunk: activate the slot and fuse the first generated token
    state["mask"] = state["mask"].at[slot].set(
        (col < prompt_total).astype(jnp.int32))
    state["lengths"] = state["lengths"].at[slot].set(prompt_total)
    state["prompt_len"] = state["prompt_len"].at[slot].set(prompt_total)
    state["limit"] = state["limit"].at[slot].set(max_total)
    state["active"] = state["active"].at[slot].set(1)
    state["do_sample"] = state["do_sample"].at[slot].set(do_sample)
    state["temperature"] = state["temperature"].at[slot].set(temperature)
    state["top_k"] = state["top_k"].at[slot].set(top_k)
    state["top_p"] = state["top_p"].at[slot].set(top_p)

    first_scores = logits[0, chunk_len - 1, :].astype(jnp.float32)[None]
    state, tok = _choose(state, first_scores, jnp.asarray(slot)[None],
                         sampling)
    keep = jnp.zeros((B,), jnp.int32).at[slot].set(1)
    toks = jnp.zeros((B,), jnp.int32).at[slot].set(tok[0])
    return _append_token(state, toks, keep, end_ids)


def _merge_window(buf, new, valid, window):
    """Merge a (L, B, H, window, hd) freshly-prefilled window into the full
    cache buffer, row-masked by ``valid`` (int8-cache aware): rows that were
    not admitted this wave keep their live contents untouched."""
    if isinstance(buf, dict):
        if _is_fused(buf):  # window axis is 2 for both q and s planes
            m = valid[None, :, None, None].astype(bool)
            old_q = jax.lax.slice_in_dim(buf["q"], 0, window, axis=2)
            old_s = jax.lax.slice_in_dim(buf["s"], 0, window, axis=2)
            return {
                "q": jax.lax.dynamic_update_slice(
                    buf["q"], jnp.where(m, new["q"], old_q), (0, 0, 0, 0)),
                "s": jax.lax.dynamic_update_slice(
                    buf["s"], jnp.where(m, new["s"].astype(buf["s"].dtype),
                                        old_s), (0, 0, 0, 0)),
            }
        mq = valid[None, :, None, None, None].astype(bool)
        ms = valid[None, :, None, None].astype(bool)
        old_q = jax.lax.slice_in_dim(buf["q"], 0, window, axis=3)
        old_s = jax.lax.slice_in_dim(buf["s"], 0, window, axis=3)
        return {
            "q": jax.lax.dynamic_update_slice(
                buf["q"], jnp.where(mq, new["q"], old_q), (0, 0, 0, 0, 0)),
            "s": jax.lax.dynamic_update_slice(
                buf["s"], jnp.where(ms, new["s"].astype(buf["s"].dtype),
                                    old_s), (0, 0, 0, 0)),
        }
    if buf.ndim == 4:  # fused (L, B, T, D): window axis is 2
        m = valid[None, :, None, None].astype(bool)
        old = jax.lax.slice_in_dim(buf, 0, window, axis=2)
        return jax.lax.dynamic_update_slice(
            buf, jnp.where(m, new.astype(buf.dtype), old), (0, 0, 0, 0))
    m = valid[None, :, None, None, None].astype(bool)
    old = jax.lax.slice_in_dim(buf, 0, window, axis=3)
    return jax.lax.dynamic_update_slice(
        buf, jnp.where(m, new.astype(buf.dtype), old), (0, 0, 0, 0, 0))


@functools.partial(jax.jit, static_argnames=(
    "forward", "config", "bucket", "sampling", "end_ids",
    "needs_positions"), donate_argnames=("state",))
def _prefill_batch(params, config, forward, state, ids, chunk_len,
                   prompt_total, max_total, valid, do_sample, temperature,
                   top_k, top_p, bucket, sampling, end_ids, needs_positions):
    """Admit SEVERAL single-chunk requests in ONE device program.

    Per-request prefill dispatches dominated serving wall time on a remote
    tunnel (~2-3 ms host overhead each), so an admission wave of k requests
    fuses into one full-width program: row i of ``ids`` targets slot i
    positionally (no gather), rows with ``valid[i] == 0`` are padding and
    every write — cache window, tokens, masks, sampling params, first
    generated token — is masked, so slots mid-generation pass through
    untouched. Exactness: each row attends only its own first
    ``chunk_len[i]`` positions (per-row mask over a fresh zero cache
    window), so admitted rows match the one-request-at-a-time path
    bit-for-bit. Prompts longer than the largest bucket still take the
    chunked `_prefill_chunk` path."""
    L, B, H, _, hd = _cache_dims(state["cache_k"])
    # (B, max_len) buffer width, NOT the tile-padded fused cache capacity
    T = state["tokens"].shape[1]
    window = bucket
    if isinstance(state["cache_k"], dict):
        if _is_fused(state["cache_k"]):  # fused-int8 {"q","s"} planes
            Hs = state["cache_k"]["s"].shape[-1]

            def fresh():
                return {"q": jnp.zeros((L, B, window, hd), jnp.int8),
                        "s": jnp.zeros((L, B, window, Hs), jnp.float32)}
        else:
            def fresh():
                return {"q": jnp.zeros((L, B, H, window, hd), jnp.int8),
                        "s": jnp.zeros((L, B, H, window), jnp.float32)}
    elif state["cache_k"].ndim == 4:
        dt = state["cache_k"].dtype

        def fresh():
            return jnp.zeros((L, B, window, hd), dt)  # fused (L, B, T, D)
    else:
        dt = state["cache_k"].dtype

        def fresh():
            return jnp.zeros((L, B, H, window, hd), dt)
    cache = {"k": fresh(), "v": fresh(), "length": jnp.zeros((), jnp.int32)}

    col_w = jnp.arange(window, dtype=jnp.int32)
    mask = (col_w[None] < chunk_len[:, None]).astype(jnp.int32)  # (B, window)
    pos = jnp.broadcast_to(jnp.arange(bucket, dtype=jnp.int32)[None],
                           (B, bucket)) if needs_positions else None
    (logits, _), cache = forward(params, config, ids, mask, pos, None, cache,
                                 last_only=False)

    state = dict(state)
    state["cache_k"] = _merge_window(state["cache_k"], cache["k"], valid,
                                     window)
    state["cache_v"] = _merge_window(state["cache_v"], cache["v"], valid,
                                     window)

    vb = valid.astype(bool)
    col = jnp.arange(T, dtype=jnp.int32)
    ids_t = jnp.pad(ids, ((0, 0), (0, T - bucket)))
    in_chunk = vb[:, None] & (col[None] < chunk_len[:, None])
    state["tokens"] = jnp.where(in_chunk, ids_t, state["tokens"])
    state["mask"] = jnp.where(
        vb[:, None], (col[None] < prompt_total[:, None]).astype(jnp.int32),
        state["mask"])
    state["lengths"] = jnp.where(vb, prompt_total, state["lengths"])
    state["prompt_len"] = jnp.where(vb, prompt_total, state["prompt_len"])
    state["limit"] = jnp.where(vb, max_total, state["limit"])
    state["active"] = jnp.where(vb, 1, state["active"])
    state["do_sample"] = jnp.where(vb, do_sample, state["do_sample"])
    state["temperature"] = jnp.where(vb, temperature, state["temperature"])
    state["top_k"] = jnp.where(vb, top_k, state["top_k"])
    state["top_p"] = jnp.where(vb, top_p, state["top_p"])

    last = jnp.maximum(chunk_len - 1, 0)
    first_scores = jnp.take_along_axis(
        logits, last[:, None, None], axis=1)[:, 0, :].astype(jnp.float32)
    state, toks = _choose(state, first_scores, jnp.arange(B), sampling)
    return _append_token(state, toks, valid.astype(jnp.int32), end_ids)


def _append_token(state, slot_tokens, keep, end_ids):
    """Write chosen tokens at each row's current length (only where keep),
    extend masks, update lengths/active."""
    B = state["tokens"].shape[0]
    rows = jnp.arange(B)
    pos = jnp.minimum(state["lengths"], state["tokens"].shape[1] - 1)
    old = state["tokens"][rows, pos]
    state["tokens"] = state["tokens"].at[rows, pos].set(
        jnp.where(keep, slot_tokens, old))
    old_m = state["mask"][rows, pos]
    state["mask"] = state["mask"].at[rows, pos].set(
        jnp.where(keep, 1, old_m))
    new_len = jnp.where(keep, state["lengths"] + 1, state["lengths"])

    ended = jnp.zeros((B,), bool)
    if end_ids:
        for e in end_ids:
            ended = ended | (slot_tokens == e)
    done = (ended & (keep == 1)) | (new_len >= state["limit"])
    state["lengths"] = new_len
    state["active"] = jnp.where(done, 0, state["active"])
    return state


@functools.partial(jax.jit, static_argnames=(
    "forward", "config", "n_steps", "sampling", "end_ids",
    "needs_positions"), donate_argnames=("state",))
def _decode_chunk(params, config, forward, state, n_steps, sampling,
                  end_ids, needs_positions):
    """Advance every active slot by up to n_steps tokens (ragged offsets).

    Returns ``(state, results)`` where results is ONE packed int32 array
    ``concat(lengths, prompt_len, active, tokens.ravel())`` — a fresh buffer
    (a concatenation can never alias the donated state entries), so the host
    may dispatch the NEXT chunk immediately and fetch these results while
    the device computes it (ServingEngine.step pipelining)."""
    B = state["tokens"].shape[0]
    rows = jnp.arange(B)

    def body(_, state):
        keep = (state["active"] == 1) & (state["lengths"] < state["limit"])
        offs = jnp.maximum(state["lengths"] - 1, 0)
        last_tok = state["tokens"][rows, offs][:, None]
        cache = {"k": state["cache_k"], "v": state["cache_v"],
                 "length": offs}
        pos = offs[:, None] if needs_positions else None
        (logits, _), cache = forward(params, config, last_tok, state["mask"],
                                     pos, None, cache, last_only=True)
        state = dict(state)
        state["cache_k"], state["cache_v"] = cache["k"], cache["v"]
        state, tok = _choose(state, logits[:, -1, :].astype(jnp.float32),
                             rows, sampling)
        return _append_token(state, tok, keep.astype(jnp.int32), end_ids)

    state = jax.lax.fori_loop(0, n_steps, body, state)
    results = jnp.concatenate([
        state["lengths"], state["prompt_len"], state["active"],
        state["tokens"].reshape(-1)])
    return state, results


@functools.partial(jax.jit, static_argnames=(
    "forward", "config", "n_rounds", "K", "ngram", "end_ids",
    "needs_positions", "sampling"), donate_argnames=("state",))
def _decode_chunk_lookup(params, config, forward, state, n_rounds, K, ngram,
                         end_ids, needs_positions, sampling):
    """Advance every active slot by ``n_rounds`` prompt-lookup speculation
    rounds (1 to K+1 tokens each, per row) instead of ``n_rounds`` plain
    single-token steps.

    Each round is the batched greedy lookup round from
    generation/speculative.py composed with the serving slot state: per-row
    proposals come from the slot's OWN committed stream (the most recent
    earlier occurrence of its last ``ngram`` tokens), all K proposals verify
    in ONE (K+1)-token forward at per-row RAGGED cache offsets — which a
    ``config.fused_decode`` model runs through the whole-stack window kernel
    (ops/fused_decode._gpt_window_kernel) — and each row commits its matched
    prefix plus the target's own next token, clamped at its request limit.
    Greedy rows' committed streams are bit-exact vs the plain serving
    decode per row; with ``sampling`` the per-row accept/commit runs
    point-mass rejection sampling (_verify_commit) — each committed token
    distributed exactly as the plain sampling path, per-row
    temperature/top-k/top-p honored.

    Rows that are inactive or at their limit freeze: their verify writes are
    idempotent (position n-1 rewrites the last committed token's k/v) or
    land in junk buffer space past their frozen frontier, and their commits
    are masked to 0 — the engine's token/mask/cache buffers carry a K+1
    margin past max_len so even a frontier at max_len stays in-bounds.
    Returns the same ``(state, results)`` packed contract as _decode_chunk."""
    B, T = state["tokens"].shape
    rows = jnp.arange(B)
    col = jnp.arange(T, dtype=jnp.int32)[None]                   # (1, T)
    W = K + 1

    def body(_, state):
        tokens, n = state["tokens"], state["lengths"]
        keep = (state["active"] == 1) & (n < state["limit"])     # (B,) bool

        # --- propose per row: last j with tokens[b, j:j+ngram] ==
        # tokens[b, n_b-ngram:n_b]; candidates tokens[b, j+ngram:j+ngram+K]
        # (generation/speculative.py _prompt_lookup_loop, per-slot streams)
        pat_idx = (jnp.maximum(n - ngram, 0)[:, None]
                   + jnp.arange(ngram, dtype=jnp.int32)[None])
        pattern = jnp.take_along_axis(tokens, pat_idx, axis=1)   # (B, ngram)
        match = (col + ngram) < n[:, None]                       # (B, T)
        for g in range(ngram):
            shifted = jnp.roll(tokens, -g, axis=1)
            match = match & (shifted == pattern[:, g:g + 1])
        # prefer the last match whose K-token continuation is fully
        # committed; fall back to the very last match, then to repeating
        # the final token (greedy exactness holds for ANY proposal source)
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
        # scatter proposals at [n_b, n_b + K) — frozen rows overwrite junk
        # past their frontier, never committed text (margin keeps it
        # in-bounds)
        tokens = tokens.at[rows[:, None], wr_idx].set(cand)

        # --- verify all K per row in ONE (K+1)-token forward at per-row
        # cache offsets n-1 (the window kernel / ragged multi-token paths);
        # clamp at 0 for never-admitted slots (n == 0), like _decode_chunk
        base = jnp.maximum(n - 1, 0)
        vin_idx = base[:, None] + jnp.arange(W, dtype=jnp.int32)[None]
        v_in = jnp.take_along_axis(tokens, vin_idx, axis=1)      # (B, W)
        cache = {"k": state["cache_k"], "v": state["cache_v"],
                 "length": base}
        pos = vin_idx if needs_positions else None
        (logits, _), cache = forward(
            params, config, v_in,
            (col < (n + K)[:, None]).astype(jnp.int32), pos, None, cache)
        state = dict(state)
        state["cache_k"], state["cache_v"] = cache["k"], cache["v"]

        if sampling:
            rng, sub = jax.random.split(state["rng"])
            state["rng"] = rng
        else:
            sub = None
        a, corr = _verify_commit(
            logits, jnp.take_along_axis(tokens, wr_idx, axis=1),
            state["do_sample"], state["temperature"], state["top_k"],
            state["top_p"], sub, sampling)
        tokens = tokens.at[rows, n + a].set(corr)
        n_committed = a + 1

        # end-id scan over the committed span (stop AT the end token, like
        # _append_token); an end past the limit clamp never commits
        room = state["limit"] - n                                # (B,)
        ended = jnp.zeros((B,), bool)
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
            ended = any_end & ((first_e + 1) <= room)

        n_committed = jnp.where(keep, jnp.minimum(n_committed, room), 0)
        new_n = n + n_committed
        state["tokens"] = tokens
        state["lengths"] = new_n
        done = keep & (ended | (new_n >= state["limit"]))
        state["active"] = jnp.where(done, 0, state["active"])
        return state

    state = jax.lax.fori_loop(0, n_rounds, body, state)
    # restore the mask == (col < lengths) invariant ONCE per chunk, not per
    # round: nothing inside the loop reads it (the verify forward builds its
    # own (col < n + K) window mask). _decode_chunk — the only decode-time
    # mask reader — runs between lookup chunks only in auto-fallback waves,
    # which see the restored invariant. Unconditional is exact: admitted
    # rows already satisfy the invariant and virgin rows have lengths == 0
    # == all-zero mask.
    state["mask"] = (col < state["lengths"][:, None]).astype(jnp.int32)
    results = jnp.concatenate([
        state["lengths"], state["prompt_len"], state["active"],
        state["tokens"].reshape(-1)])
    return state, results


def _window_for(off, bucket, cap):
    """Static cache-window width for a prefill chunk at host-known offset
    ``off``: the smallest ``bucket`` multiple covering the chunk's frontier
    ``off + bucket``, capped at the buffer width ``cap`` (keeps compile
    variants bounded per (bucket, window) pair). When the bucket-multiple
    grid can't reach the frontier under the cap, fall back to 8-row
    granularity — the window must always satisfy ``off + bucket <= window``
    (<= cap) because the model's chunk write is a CLAMPING
    dynamic_update_slice (see _admit_chunked's shift-back guard)."""
    window = min(cap, -((off + bucket) // -bucket) * bucket)
    if window < off + bucket:
        window = min(cap, -((off + bucket) // -8) * 8)
    return window


def _batch_window(buf, window):
    """Live cache slice over ALL rows' first ``window`` key positions
    (int8- and fused-layout aware)."""
    if isinstance(buf, dict):
        ax = 2 if _is_fused(buf) else 3
        return {"q": jax.lax.slice_in_dim(buf["q"], 0, window, axis=ax),
                "s": jax.lax.slice_in_dim(buf["s"], 0, window, axis=ax)}
    ax = 2 if buf.ndim == 4 else 3
    return jax.lax.slice_in_dim(buf, 0, window, axis=ax)


def _seed_prefix(win, p, valid, window):
    """Overwrite ``valid`` rows of a live (L, B, ..., window, ...) cache
    window with a (L, 1, ..., Wp, ...) prefix store (broadcast over rows;
    padded or sliced to the window width — padding rows sit past every
    valid row's attention frontier until the suffix overwrites them)."""
    def one(w, pp, ax):
        Wp = pp.shape[ax]
        if Wp < window:
            pad = [(0, 0)] * pp.ndim
            pad[ax] = (0, window - Wp)
            pp = jnp.pad(pp, pad)
        elif Wp > window:
            pp = jax.lax.slice_in_dim(pp, 0, window, axis=ax)
        pp = jnp.broadcast_to(pp.astype(w.dtype), w.shape)
        shape = [1] * w.ndim
        shape[1] = -1
        return jnp.where(valid.reshape(shape).astype(bool), pp, w)
    if isinstance(win, dict):
        ax = 2 if _is_fused(win) else 3
        return {"q": one(win["q"], p["q"], ax),
                "s": one(win["s"], p["s"], ax)}
    ax = 2 if win.ndim == 4 else 3
    return one(win, p, ax)


@functools.partial(jax.jit, static_argnames=(
    "forward", "config", "bucket", "window", "sampling", "end_ids",
    "needs_positions"), donate_argnames=("state",))
def _prefill_batch_prefixed(params, config, forward, state, pk, pv, ptok,
                            ids, chunk_len, cache_off, prompt_total,
                            max_total, valid, do_sample, temperature, top_k,
                            top_p, bucket, window, sampling, end_ids,
                            needs_positions):
    """Admit SEVERAL requests sharing ONE registered prefix in ONE device
    program (`register_prefix` + same matched length): valid rows' cache
    windows are seeded from the precomputed prefix store (a broadcast — no
    forward over the prefix), every suffix prefills at the uniform
    ``cache_off = matched_len``, and the first generated token fuses in.
    The per-request `_load_prefix` + `_prefill_chunk` path gives identical
    results; this fuses the common serving pattern (every request opens
    with the same system prompt) into one dispatch like `_prefill_batch`
    does for fresh short prompts. Rows with ``valid[i] == 0`` pass through
    untouched."""
    B = state["tokens"].shape[0]
    T = state["tokens"].shape[1]
    ck = _seed_prefix(_batch_window(state["cache_k"], window), pk, valid,
                      window)
    cv = _seed_prefix(_batch_window(state["cache_v"], window), pv, valid,
                      window)
    cache = {"k": ck, "v": cv, "length": cache_off}
    col_w = jnp.arange(window, dtype=jnp.int32)
    mask = (col_w[None] < cache_off + chunk_len[:, None]).astype(jnp.int32)
    pos = jnp.broadcast_to(
        (cache_off + jnp.arange(bucket, dtype=jnp.int32))[None],
        (B, bucket)) if needs_positions else None
    (logits, _), cache = forward(params, config, ids, mask, pos, None, cache,
                                 last_only=False)

    state = dict(state)
    state["cache_k"] = _merge_window(state["cache_k"], cache["k"], valid,
                                     window)
    state["cache_v"] = _merge_window(state["cache_v"], cache["v"], valid,
                                     window)

    vb = valid.astype(bool)
    col = jnp.arange(T, dtype=jnp.int32)
    # token rows: prefix tokens on [0, cache_off), suffix on
    # [cache_off, cache_off + chunk_len)
    ptok_t = jnp.pad(ptok, ((0, 0), (0, T - ptok.shape[1]))) \
        if ptok.shape[1] < T else ptok[:, :T]
    ids_t = jax.lax.dynamic_update_slice(
        jnp.zeros((B, T), jnp.int32), ids, (0, cache_off))
    new_tok = jnp.where(col[None] < cache_off,
                        jnp.broadcast_to(ptok_t, (B, T)), ids_t)
    in_row = vb[:, None] & (col[None] < prompt_total[:, None])
    state["tokens"] = jnp.where(in_row, new_tok, state["tokens"])
    state["mask"] = jnp.where(
        vb[:, None], (col[None] < prompt_total[:, None]).astype(jnp.int32),
        state["mask"])
    state["lengths"] = jnp.where(vb, prompt_total, state["lengths"])
    state["prompt_len"] = jnp.where(vb, prompt_total, state["prompt_len"])
    state["limit"] = jnp.where(vb, max_total, state["limit"])
    state["active"] = jnp.where(vb, 1, state["active"])
    state["do_sample"] = jnp.where(vb, do_sample, state["do_sample"])
    state["temperature"] = jnp.where(vb, temperature, state["temperature"])
    state["top_k"] = jnp.where(vb, top_k, state["top_k"])
    state["top_p"] = jnp.where(vb, top_p, state["top_p"])

    last = jnp.maximum(chunk_len - 1, 0)
    first_scores = jnp.take_along_axis(
        logits, last[:, None, None], axis=1)[:, 0, :].astype(jnp.float32)
    state, toks = _choose(state, first_scores, jnp.arange(B), sampling)
    return _append_token(state, toks, valid.astype(jnp.int32), end_ids)


@functools.partial(jax.jit, donate_argnames=("state",))
def _load_prefix(state, pk, pv, ptok, slot):
    """Seed ``slot`` with a registered prefix's precomputed KV + tokens
    (ServingEngine.register_prefix): one dynamic_update_slice per buffer at
    offset 0 — no forward pass. The suffix chunks then prefill at
    ``cache_off = matched_len`` (the chunked path is offset-exact), and any
    stale prefix rows past the matched length are never attended (every
    mask clamps at the row's frontier) and are overwritten as the suffix /
    generation frontier advances."""
    state = dict(state)
    state["cache_k"] = _slot_update(state["cache_k"], pk, slot)
    state["cache_v"] = _slot_update(state["cache_v"], pv, slot)
    state["tokens"] = jax.lax.dynamic_update_slice(
        state["tokens"], ptok, (slot, 0))
    return state


class Request:
    __slots__ = ("rid", "prompt", "max_new_tokens", "do_sample",
                 "temperature", "top_k", "top_p")

    def __init__(self, rid, prompt, max_new_tokens, do_sample=False,
                 temperature=1.0, top_k=0, top_p=1.0):
        self.rid = rid
        self.prompt = prompt
        self.max_new_tokens = max_new_tokens
        self.do_sample = do_sample
        self.temperature = temperature
        self.top_k = top_k
        self.top_p = top_p


class ServingEngine:
    """Slot-based continuous batching on one model.

    >>> eng = ServingEngine(model, max_slots=4, max_len=256)
    >>> rid = eng.submit([1, 2, 3], max_new_tokens=32)
    >>> for rid, tokens in eng.run():  # drains queue + slots
    ...     ...
    """

    def __init__(self, model, max_slots=8, max_len=512,
                 prefill_buckets=DEFAULT_BUCKETS, chunk_size=8,
                 do_sample=False, temperature=1.0, top_k=10, top_p=0.8,
                 end_ids=None, rng=None, mesh=None, pipeline="overlap",
                 max_dispatch_depth=1, speculative=None, draft_len=8,
                 lookup_ngram=2, lookup_round_cost=1.5,
                 lookup_reprobe_every=8):
        # speculative="lookup": every decode chunk runs ``chunk_size``
        # prompt-lookup speculation ROUNDS instead of single-token steps —
        # each round proposes draft_len tokens per slot from its own
        # committed stream and verifies them in ONE (K+1)-token ragged
        # forward (the fused window kernel for config.fused_decode models).
        # Greedy rows stay bit-exact vs plain serving; sampling rows run
        # per-row point-mass rejection sampling (_verify_commit) — every
        # committed token distributed exactly as the plain sampling path.
        if speculative not in (None, "lookup"):
            raise ValueError(f"speculative={speculative!r} (None | 'lookup')")
        if getattr(model.config, "swa_ring_cache", False):
            # the engine's chunked re-prefill and ragged verify windows
            # assume cache slot == absolute position; a sliding-window ring
            # cache (models/llama.py) breaks that invariant
            raise ValueError("ServingEngine does not support "
                             "config.swa_ring_cache models")
        self.speculative = speculative
        self.draft_len = int(draft_len)
        self.lookup_ngram = int(lookup_ngram)
        # AUTO-FALLBACK (lookup mode): a verify round costs
        # ``lookup_round_cost`` plain decode steps on this toolchain
        # (measured 1.32-1.77, BENCH_DETAILS lookup_machinery lines), so on
        # non-repetitive traffic committing ~1 token/round a lookup engine
        # would run that factor SLOWER than plain. When the tokens-per-round
        # EMA drops below the round cost, dispatch waves revert to PLAIN
        # decode chunks; every ``lookup_reprobe_every`` fallback waves one
        # lookup wave re-probes the workload (its harvest refreshes the EMA,
        # so a workload that turns repetitive again is re-detected at
        # bounded cost: ~1/reprobe_every of the fallback waves).
        self.lookup_round_cost = float(lookup_round_cost)
        self.lookup_reprobe_every = max(1, int(lookup_reprobe_every))
        self._since_probe = 0
        # mesh: serve a tensor-parallel-sharded model — pass params already
        # sharded (parallel.shard_params) and the mesh; the engine traces its
        # programs under it so the in-model shard_hints partition attention
        # heads / MLP columns over the 'model' axis (GSPMD inserts the ICI
        # collectives)
        self.mesh = mesh
        # pipeline schedule: "overlap" dispatches chunk N+1 BEFORE fetching
        # chunk N's results — right when host<->device transfers run
        # concurrently with compute (normal hosts). "serial" fetches first —
        # right on links that serialize transfers behind enqueued programs
        # (e.g. a remote TPU tunnel), where overlap would queue every fetch
        # behind one extra chunk.
        if pipeline not in ("overlap", "serial"):
            raise ValueError(f"pipeline={pipeline!r} (overlap | serial)")
        self.pipeline = pipeline
        # max_dispatch_depth > 1: each tick enqueues UP TO that many decode
        # chunks back-to-back and fetches results ONCE — the host round-trip
        # amortizes over depth*chunk_size tokens instead of chunk_size. Depth
        # adapts per tick to the estimated minimum tokens remaining across
        # occupied slots (host-tracked, refreshed exactly at every harvest),
        # so a tick never knowingly overshoots the earliest finisher by more
        # than one chunk. Rows that stop early (end token) ride the
        # remaining steps as masked no-ops — pure device time, no
        # correctness impact; streamers fire once per tick, not per chunk.
        self.max_dispatch_depth = max(1, int(max_dispatch_depth))
        self.model = model
        self.config = model.config
        self.forward = model.forward_fn()
        self.max_slots = max_slots
        self.max_len = max_len
        # buckets larger than max_len could never fit a request's cache
        # (prompt + >=1 generated token must fit max_len)
        self.prefill_buckets = tuple(
            b for b in sorted(prefill_buckets) if b < max_len)
        if not self.prefill_buckets:
            self.prefill_buckets = (max(8, max_len // 2),)
        self.chunk_size = chunk_size
        # engine-level DEFAULT sampling config; each request may override
        self.do_sample = do_sample
        self.temperature = float(temperature)
        self.top_k = top_k
        self.top_p = top_p
        if isinstance(end_ids, int):
            end_ids = [end_ids]
        self.end_ids = tuple(end_ids) if end_ids else ()
        # static decode variant: flips (one recompile) on the first sampling
        # request and stays on — greedy-only workloads never pay the
        # sort/softmax sampling machinery
        self._sampling_on = bool(do_sample)

        # bf16/int8 inference cast, shared with generate() (engine.py)
        from cleantransformer_tpu.generation.engine import inference_params
        cdtype = getattr(self.config, "compute_dtype", jnp.float32)
        self.params = inference_params(model)

        cfg = self.config
        L = getattr(cfg, "n_layer", getattr(cfg, "num_hidden_layers", None))
        H = getattr(cfg, "n_head", getattr(cfg, "num_attention_heads", None))
        D = getattr(cfg, "n_embd", getattr(cfg, "hidden_size", None))
        hd = getattr(cfg, "head_dim", D // H)
        # GQA (llama-family): the cache holds num_key_value_heads heads
        H = getattr(cfg, "num_key_value_heads", H)
        # int8 configs stream bf16 activations — keep the cache bf16 too
        cache_dtype = jnp.bfloat16 if (
            getattr(self.config, "quantize_int8", False)
            and cdtype == jnp.float32) else cdtype
        # lookup rounds scatter up to draft_len proposals past a row's
        # frontier (and one correction at n + a <= n + K) before the limit
        # clamp masks them — a K+1 margin keeps every write in-bounds even
        # for a frontier already at max_len
        self.buf_len = max_len + (self.draft_len + 1 if speculative else 0)
        B, T = max_slots, self.buf_len
        if (getattr(self.config, "kv_cache_int8", False)
                and getattr(self.config, "fused_decode", False)):
            # fused-int8: int8 rows + per-(key, head) scale planes, decode
            # through the whole-stack kernel with in-kernel dequant
            def _cache_buf(B, T):
                Tp = -(-T // 8) * 8
                return {"q": jnp.zeros((L, B, Tp, H * hd), jnp.int8),
                        "s": jnp.zeros((L, B, Tp, H), jnp.float32)}
        elif getattr(self.config, "kv_cache_int8", False):
            def _cache_buf(B, T):
                return {"q": jnp.zeros((L, B, H, T, hd), jnp.int8),
                        "s": jnp.zeros((L, B, H, T), jnp.float32)}
        elif getattr(self.config, "fused_decode", False):
            # fused (L, B, T, D) layout: decode steps take the whole-stack
            # Pallas kernel with ragged per-row offsets (ops/fused_decode.py;
            # falls back to the XLA path past its VMEM budget at large T)
            def _cache_buf(B, T):
                Tp = -(-T // 8) * 8
                return jnp.zeros((L, B, Tp, H * hd), cache_dtype)
        elif getattr(self.config, "decode_head_major", False):
            # llama-family head-major (L, B, T, Hkv*hd): decode steps write
            # one contiguous-lane row per (layer, slot) and attend straight
            # on the slab (models/llama.py _gqa_attend_headmajor, ragged
            # per-row offsets); unrounded T keeps mask widths aligned
            def _cache_buf(B, T):
                return jnp.zeros((L, B, T, H * hd), cache_dtype)
        else:
            def _cache_buf(B, T):
                return jnp.zeros((L, B, H, T, hd), cache_dtype)
        self._cache_buf = _cache_buf
        self.state = {
            "tokens": jnp.zeros((B, T), jnp.int32),
            "mask": jnp.zeros((B, T), jnp.int32),
            "lengths": jnp.zeros((B,), jnp.int32),
            "prompt_len": jnp.zeros((B,), jnp.int32),
            "limit": jnp.zeros((B,), jnp.int32),
            "active": jnp.zeros((B,), jnp.int32),
            # per-request sampling params (set at admission)
            "do_sample": jnp.zeros((B,), jnp.int32),
            "temperature": jnp.ones((B,), jnp.float32),
            "top_k": jnp.zeros((B,), jnp.int32),
            "top_p": jnp.ones((B,), jnp.float32),
            "cache_k": _cache_buf(B, T),
            "cache_v": _cache_buf(B, T),
            "rng": rng if rng is not None else jax.random.PRNGKey(0),
        }
        # GPT (learned positions) and llama-family (RoPE) consume positions;
        # Bloom (ALiBi) ignores them
        self.needs_positions = (hasattr(cfg, "n_positions")
                                or hasattr(cfg, "rope_theta"))

        self.queue = deque()
        self.slot_rid = [None] * max_slots  # rid occupying each slot
        self._next_rid = 0
        self.finished = {}  # rid -> np token array
        self.streamers = {}  # rid -> callable(np generated-so-far)
        self.steps = 0
        self.fetches = 0  # blocking result round-trips (RTT accounting)
        # decode-chunk pipelining (step()): the packed results of the chunk
        # in flight, the running chunk counter, and per-slot "first chunk
        # that covers this request" admission stamps
        self._pending = None        # (chunk_no, device results) or None
        self._chunk_no = 0
        self._slot_chunk = [0] * max_slots
        # host-side per-slot length/limit estimates for adaptive depth
        # (est_len advances chunk_size per dispatched chunk, clamped at the
        # limit; harvest overwrites with exact device lengths)
        self._est_len = np.zeros(max_slots, np.int64)
        self._est_limit = np.zeros(max_slots, np.int64)
        # lookup mode: host-side tokens-per-round estimate (EMA over exact
        # per-slot length deltas between harvests). With the plain path's
        # 1-token-per-step arithmetic a depth-8 dispatch would enqueue ~K+1x
        # more verify rounds than the work needs — every one a full-width
        # window program ground through frozen rows. Plain mode stays at
        # exactly 1.0 (unchanged behavior); lookup mode starts at the
        # midpoint (K+1)/2 so the FIRST wave (before any harvest corrects
        # the EMA) neither enqueues ~K+1x the needed rounds nor collapses
        # to one-chunk ticks.
        self._tpr = (1.0 if not speculative
                     else max(1.0, (self.draft_len + 1) / 2))
        # the (K+1)/2 prior is a GUESS; the first harvested sample is a
        # measurement over >= chunk_size rounds x active slots, so it
        # REPLACES the prior outright (EMA blending kept a dead workload
        # above lookup_round_cost for ~3 harvests — most of a short
        # generation ran at lookup prices before fallback engaged)
        self._tpr_seeded = False
        self._last_exact = np.zeros(max_slots, np.int64)
        self._last_exact_chunk = np.zeros(max_slots, np.int64)
        # cumulative LOOKUP rounds / PLAIN steps dispatched (fallback mode
        # mixes both): the tpr sample for a harvest span is
        # (dn - d_plain_steps) / d_lookup_rounds — an active row commits
        # exactly 1 token per plain step, so the plain contribution
        # subtracts out exactly. _counts_at snapshots the counters per
        # dispatched chunk (pruned at harvest; pipelining lags one wave).
        self._lrounds = 0
        self._psteps = 0
        self._counts_at = {}
        self._last_lr = np.zeros(max_slots, np.int64)
        self._last_ps = np.zeros(max_slots, np.int64)
        # prefix cache (register_prefix): handle -> precomputed device KV +
        # token row for a shared prompt prefix; _prefix_of maps queued rids
        # to their matched (handle, matched_len)
        self._prefixes = {}
        self._prefix_of = {}
        self._next_prefix = 0
        self.prefill_calls = 0  # prefill programs dispatched (observability)

    # ------------------------------------------------------------------ API

    def register_prefix(self, prefix_ids):
        """Precompute and pin the KV of a shared prompt PREFIX (a system
        prompt, few-shot preamble, …) so every future request that starts
        with it skips that part of its prefill: admission seeds the slot
        with the stored KV in one dynamic_update_slice program
        (`_load_prefix`) and chunk-prefills only the suffix at
        ``cache_off = matched_len``. Bit-exact by causality: a prefix
        position's k/v never depends on later tokens, and the chunked
        prefill path is already offset-exact. Matching is automatic at
        submit() — the longest common prefix against any registered prefix
        (partial matches reuse the first ``matched_len`` rows, equally
        exact). Returns an opaque handle (also accepted by submit's
        ``use_prefix=False`` opt-out).

        TPU-native analogue of vLLM-style prefix caching; the reference
        recomputes every prompt from scratch
        (generation/generation_util.py:57-76)."""
        prefix_ids = list(map(int, prefix_ids))
        if not prefix_ids:
            raise ValueError("empty prefix")
        if len(prefix_ids) >= self.max_len:
            raise ValueError(f"prefix ({len(prefix_ids)}) must leave room "
                             f"under max_len ({self.max_len})")
        import contextlib
        from cleantransformer_tpu.parallel.mesh import use_mesh
        ctx = use_mesh(self.mesh) if self.mesh is not None \
            else contextlib.nullcontext()
        bmax = self.prefill_buckets[-1]
        W = min(-(-len(prefix_ids) // bmax) * bmax, self.buf_len)
        mini = {"tokens": jnp.zeros((1, W), jnp.int32),
                "cache_k": self._cache_buf(1, W),
                "cache_v": self._cache_buf(1, W)}
        total, off = len(prefix_ids), 0
        with ctx:
            return self._register_prefix_chunks(mini, prefix_ids, off, total,
                                                bmax, W)

    def _register_prefix_chunks(self, mini, prefix_ids, off, total, bmax, W):
        while off < total:
            chunk = prefix_ids[off: off + bmax]
            bucket = self._bucket_for(len(chunk))
            chunk = chunk[:bucket]
            if off + bucket > W:  # keep the bucket's pad rows in-buffer
                off = W - bucket  # overlap recompute is exact (see
                chunk = prefix_ids[off: off + bucket]  # _admit_chunked)
            window = _window_for(off, bucket, W)
            ids = np.zeros((1, bucket), np.int32)
            ids[0, : len(chunk)] = chunk
            mini = _prefill_chunk(
                self.params, self.config, self.forward, mini, ids,
                np.int32(len(chunk)), np.int32(off), np.int32(0),
                np.int32(0), np.int32(0), np.int32(0), np.float32(1.0),
                np.int32(0), np.float32(1.0), bucket=bucket, window=window,
                final=False, sampling=False, end_ids=(),
                needs_positions=self.needs_positions)
            self.prefill_calls += 1
            off += len(chunk)
        handle = self._next_prefix
        self._next_prefix += 1
        self._prefixes[handle] = {"ids": prefix_ids, "k": mini["cache_k"],
                                  "v": mini["cache_v"],
                                  "tokens": mini["tokens"]}
        return handle

    def unregister_prefix(self, handle):
        """Drop a registered prefix (frees its device KV store). Queued
        requests that had matched it lose the match and admit with a full
        from-scratch prefill — output is identical either way (prefix reuse
        is exact), they just stop skipping the prefix's prefill work."""
        if handle not in self._prefixes:
            raise KeyError(f"unknown prefix handle {handle!r} "
                           "(never registered, or already unregistered)")
        for rid, (h, _) in list(self._prefix_of.items()):
            if h == handle:
                del self._prefix_of[rid]
        del self._prefixes[handle]

    def submit(self, prompt_ids, max_new_tokens=64, streamer=None,
               do_sample=None, temperature=None, top_k=None, top_p=None,
               use_prefix=True):
        """Queue a request. Long prompts are fine: anything up to
        ``max_len - max_new_tokens`` is prefilled in bucket-sized chunks.

        ``do_sample``/``temperature``/``top_k``/``top_p``: per-request
        sampling overrides (None = the engine default).
        ``streamer``: optional callable invoked after every decode chunk with
        the tokens generated so far for this request (numpy 1-D, prompt
        excluded) — the serving analogue of the reference's per-generate
        streamer callbacks (bloom_interactive.py).
        ``use_prefix``: match this prompt against registered prefixes
        (register_prefix) and skip the matched span's prefill; False opts
        out (output is identical either way — prefix reuse is exact)."""
        prompt_ids = list(map(int, prompt_ids))
        if not prompt_ids:
            raise ValueError("empty prompt")
        if len(prompt_ids) + max_new_tokens > self.max_len:
            raise ValueError(
                f"prompt ({len(prompt_ids)}) + max_new_tokens "
                f"({max_new_tokens}) exceeds max_len ({self.max_len})")
        rid = self._next_rid
        self._next_rid += 1
        if use_prefix and self._prefixes:
            # longest common prefix against any registered prefix; capped at
            # len(prompt)-1 so the final chunk always has >= 1 token (the
            # first generated token's logits come from its forward). Only
            # worth a dedicated admission when it skips at least the
            # smallest bucket of prefill.
            best = None
            for h, p in self._prefixes.items():
                cap = min(len(p["ids"]), len(prompt_ids) - 1)
                ul = 0
                while ul < cap and prompt_ids[ul] == p["ids"][ul]:
                    ul += 1
                if ul >= self.prefill_buckets[0] and (
                        best is None or ul > best[1]):
                    best = (h, ul)
            if best is not None:
                self._prefix_of[rid] = best
        if streamer is not None:
            self.streamers[rid] = streamer
        req = Request(
            rid, prompt_ids, max_new_tokens,
            do_sample=self.do_sample if do_sample is None else do_sample,
            temperature=self.temperature if temperature is None else temperature,
            top_k=self.top_k if top_k is None else top_k,
            top_p=self.top_p if top_p is None else top_p)
        if req.do_sample:
            self._sampling_on = True
        self.queue.append(req)
        return rid

    def _bucket_for(self, n):
        for b in self.prefill_buckets:
            if n <= b:
                return b
        return self.prefill_buckets[-1]

    def _admit(self, free_slots):
        """Prefill queued requests into free slots. Requests whose prompt
        fits the largest bucket are admitted as ONE fused full-width device
        program per wave (`_prefill_batch` — per-request dispatches cost
        ~2-3 ms host overhead each on a remote tunnel, which dominated
        serving wall time); longer prompts take the per-request chunked
        path (one jit call per bucket-sized chunk at rising cache offsets;
        the causal iota is offset-aware so this is exact)."""
        wave = []  # (req, slot) single-chunk admissions, fused below
        pwaves = {}  # (handle, matched) -> [(req, slot)] shared-prefix waves
        while self.queue and free_slots:
            req = self.queue.popleft()
            slot = free_slots.pop()
            pref = self._prefix_of.pop(req.rid, None)
            if pref is not None:
                h, ul = pref
                bucket = self._bucket_for(len(req.prompt) - ul)
                if (len(req.prompt) - ul <= self.prefill_buckets[-1]
                        and ul + bucket <= self.buf_len):
                    # suffix fits one bucket in-buffer: batched prefix wave
                    pwaves.setdefault((h, ul), []).append((req, slot))
                else:
                    self._admit_prefixed(req, slot, h, ul)
                continue
            if len(req.prompt) <= self.prefill_buckets[-1]:
                wave.append((req, slot))
                continue
            self._admit_chunked(req, slot)
        if wave:
            self._admit_wave(wave)
        for (h, ul), group in pwaves.items():
            self._admit_wave_prefixed(group, h, ul)

    def _admit_prefixed(self, req, slot, handle, matched):
        """Per-request admission with a registered prefix (long suffix /
        odd matched length): seed the slot's cache/tokens from the prefix
        store (one KV-copy program, no forward), then chunk-prefill only
        ``prompt[matched:]`` at rising cache offsets."""
        p = self._prefixes[handle]
        self.state = _load_prefix(self.state, p["k"], p["v"], p["tokens"],
                                  np.int32(slot))
        self.prefill_calls += 1
        self._admit_chunked(req, slot, start=matched)

    def _admit_wave_prefixed(self, wave, handle, matched):
        """One `_prefill_batch_prefixed` program admitting every (req, slot)
        pair sharing ``handle``'s prefix at the same matched length — the
        common serving pattern (every request opens with the same system
        prompt) admits in ONE dispatch: prefix KV broadcast-seeded into the
        valid rows, all suffixes prefilled at the uniform cache offset,
        first tokens fused."""
        p = self._prefixes[handle]
        bucket = max(self._bucket_for(len(r.prompt) - matched)
                     for r, _ in wave)
        window = _window_for(matched, bucket, self.buf_len)
        marshalled = self._marshal_wave(wave, bucket, matched=matched)
        self.state = _prefill_batch_prefixed(
            self.params, self.config, self.forward, self.state,
            p["k"], p["v"], p["tokens"], marshalled[0], marshalled[1],
            np.int32(matched), *marshalled[2:],
            bucket=bucket, window=window, sampling=self._sampling_on,
            end_ids=self.end_ids, needs_positions=self.needs_positions)
        self.prefill_calls += 1
        self._stamp_admitted(wave)

    def _marshal_wave(self, wave, bucket, matched=0):
        """Pack an admission wave's per-request parameters into full-width
        (max_slots,) arrays for the fused prefill programs — row ``slot``
        carries request ``req``, rows not in the wave stay padding
        (valid == 0). ``matched`` > 0 marshals only the un-matched prompt
        SUFFIX into ids/chunk_len (shared-prefix admission); totals always
        count the whole prompt. Single definition so plain and prefixed
        waves can never desynchronize sampling-parameter normalization."""
        B = self.max_slots
        ids = np.zeros((B, bucket), np.int32)
        chunk_len = np.zeros((B,), np.int32)
        prompt_total = np.zeros((B,), np.int32)
        max_total = np.zeros((B,), np.int32)
        valid = np.zeros((B,), np.int32)
        do_sample = np.zeros((B,), np.int32)
        temperature = np.ones((B,), np.float32)
        top_k = np.zeros((B,), np.int32)
        top_p = np.ones((B,), np.float32)
        for req, slot in wave:
            suf = req.prompt[matched:]
            ids[slot, : len(suf)] = suf
            chunk_len[slot] = len(suf)
            prompt_total[slot] = len(req.prompt)
            max_total[slot] = len(req.prompt) + req.max_new_tokens
            valid[slot] = 1
            do_sample[slot] = int(bool(req.do_sample))
            temperature[slot] = req.temperature
            top_k[slot] = req.top_k or 0
            top_p[slot] = req.top_p if req.top_p is not None else 1.0
        return (ids, chunk_len, prompt_total, max_total, valid, do_sample,
                temperature, top_k, top_p)

    def _stamp_admitted(self, wave):
        """Host-side bookkeeping for a just-admitted wave: slot ownership,
        first covering decode chunk, and the adaptive-depth length
        estimates."""
        for req, slot in wave:
            self.slot_rid[slot] = req.rid
            self._slot_chunk[slot] = self._chunk_no + 1
            self._est_len[slot] = len(req.prompt) + 1
            self._est_limit[slot] = len(req.prompt) + req.max_new_tokens
            self._last_exact[slot] = self._est_len[slot]
            self._last_exact_chunk[slot] = self._chunk_no
            self._last_lr[slot] = self._lrounds
            self._last_ps[slot] = self._psteps

    def _admit_wave(self, wave):
        """One `_prefill_batch` program admitting every (req, slot) pair."""
        bucket = max(self._bucket_for(len(r.prompt)) for r, _ in wave)
        (ids, chunk_len, prompt_total, max_total, valid, do_sample,
         temperature, top_k, top_p) = self._marshal_wave(wave, bucket)
        self.state = _prefill_batch(
            self.params, self.config, self.forward, self.state, ids,
            chunk_len, prompt_total, max_total, valid, do_sample,
            temperature, top_k, top_p, bucket=bucket,
            sampling=self._sampling_on, end_ids=self.end_ids,
            needs_positions=self.needs_positions)
        self.prefill_calls += 1
        self._stamp_admitted(wave)

    def _admit_chunked(self, req, slot, start=0):
        prompt = req.prompt
        total = len(prompt)
        off = start
        while off < total:
            chunk = prompt[off: off + self.prefill_buckets[-1]]
            bucket = self._bucket_for(len(chunk))
            chunk = chunk[:bucket]
            if off + bucket > self.buf_len:
                # the model's chunk write is a clamping dynamic_update_slice
                # — the bucket's junk pad rows must stay inside the buffer.
                # Shift the chunk start back; overlapped rows recompute
                # IDENTICAL k/v and token values (causal, offset-exact), so
                # this is exact. Overshoot implies total - off < bucket
                # (total <= max_len <= buf_len), so this is the final chunk
                # and the shifted chunk still reaches ``total``.
                off = self.buf_len - bucket
                chunk = prompt[off: off + bucket]
            window = _window_for(off, bucket, self.buf_len)
            final = off + len(chunk) >= total
            ids = np.zeros((1, bucket), np.int32)
            ids[0, : len(chunk)] = chunk
            # np scalars, NOT eager jnp.asarray: each eager device_put
            # through the remote tunnel costs ~5-9 ms (measured), so nine
            # of them per admission dominated serving wall time; jit
            # converts np operands during dispatch for ~2 ms total
            self.state = _prefill_chunk(
                self.params, self.config, self.forward, self.state,
                ids, np.int32(len(chunk)),
                np.int32(off),
                np.int32(total),
                np.int32(total + req.max_new_tokens),
                np.int32(slot),
                np.int32(bool(req.do_sample)),
                np.float32(req.temperature),
                np.int32(req.top_k or 0),
                np.float32(req.top_p if req.top_p is not None else 1.0),
                bucket=bucket, window=window, final=final,
                sampling=self._sampling_on, end_ids=self.end_ids,
                needs_positions=self.needs_positions)
            self.prefill_calls += 1
            off += len(chunk)
        self.slot_rid[slot] = req.rid
        # first decode chunk covering this slot is the NEXT one dispatched
        self._slot_chunk[slot] = self._chunk_no + 1
        self._est_len[slot] = total + 1  # prompt + fused first token
        self._est_limit[slot] = total + req.max_new_tokens
        self._last_exact[slot] = self._est_len[slot]
        self._last_exact_chunk[slot] = self._chunk_no
        self._last_lr[slot] = self._lrounds
        self._last_ps[slot] = self._psteps

    def _harvest(self, pending):
        """Fetch and apply a decode chunk's packed results (one device_get —
        on a pipelined tick the NEXT chunk is already running on the device
        while this transfer happens). Slots admitted after that chunk was
        dispatched are skipped — their rows in the stale snapshot predate
        their prompts. Returns list of (rid, np tokens) finished."""
        if pending is None:
            return []
        chunk_no, results = pending
        self.fetches += 1  # each is one blocking host round-trip
        res = np.asarray(jax.device_get(results))
        B = self.max_slots
        lengths, prompt_len, active = res[:B], res[B:2 * B], res[2 * B:3 * B]
        tokens = res[3 * B:].reshape(B, self.buf_len)
        out = []
        tpr_samples = []
        for slot, rid in enumerate(self.slot_rid):
            if rid is None or self._slot_chunk[slot] > chunk_no:
                # admitted after that chunk was dispatched — the snapshot
                # predates this request's prompt
                continue
            self._est_len[slot] = int(lengths[slot])  # exact refresh
            if self.speculative:
                # tokens-per-round sample over the harvested span; only
                # rows still active sampled (a row frozen mid-span would
                # bias the rate low — conservative is fine, but noisy).
                # Fallback waves mix PLAIN chunks into the span: an active
                # row commits exactly 1 token per plain step, so the plain
                # contribution subtracts out and the sample measures only
                # the lookup rounds.
                lr_now, ps_now = self._counts_at.get(
                    chunk_no, (self._lrounds, self._psteps))
                dlr = lr_now - int(self._last_lr[slot])
                dn = (int(lengths[slot]) - int(self._last_exact[slot])
                      - (ps_now - int(self._last_ps[slot])))
                if dlr > 0 and dn > 0 and active[slot] == 1:
                    tpr_samples.append(dn / dlr)
                self._last_exact[slot] = int(lengths[slot])
                self._last_exact_chunk[slot] = chunk_no
                self._last_lr[slot] = lr_now
                self._last_ps[slot] = ps_now
            if rid in self.streamers:
                self.streamers[rid](
                    tokens[slot, prompt_len[slot]:lengths[slot]].copy())
            if active[slot] == 0:
                out.append((rid, tokens[slot, :lengths[slot]].copy()))
                self.finished[rid] = out[-1][1]
                self.slot_rid[slot] = None
                self.streamers.pop(rid, None)
        if tpr_samples:
            # ONE EMA step per harvest on the batch-mean rate: folding each
            # slot's sample separately at weight 0.5 would down-weight slot
            # i's contribution by 0.5^(slots after i) — the estimate would
            # track only the last-iterated slots under heterogeneous
            # acceptance and mis-size the adaptive dispatch depth. The
            # FIRST sample replaces the (K+1)/2 prior outright (it is a
            # measurement; blending kept dead workloads above the fallback
            # threshold for ~3 harvests).
            batch_rate = max(1.0, sum(tpr_samples) / len(tpr_samples))
            self._tpr = (batch_rate if not self._tpr_seeded
                         else 0.5 * self._tpr + 0.5 * batch_rate)
            self._tpr_seeded = True
        if self.speculative:
            self._counts_at = {c: v for c, v in self._counts_at.items()
                               if c > chunk_no}
        return out

    def step(self):
        """One engine tick, PIPELINED: dispatch the next decode chunk FIRST
        (enqueue only), then fetch the previous chunk's results while the
        device computes, then admit queued requests into freed slots (their
        prefills enqueue behind the running chunk and they join the chunk
        after next). The device never idles waiting on the host's result
        fetch; results (finished requests, streamer callbacks) lag dispatch
        by exactly one chunk. Returns list of (rid, np tokens) finished."""
        import contextlib
        from cleantransformer_tpu.parallel.mesh import use_mesh
        ctx = use_mesh(self.mesh) if self.mesh is not None \
            else contextlib.nullcontext()
        with ctx:
            if self.pipeline == "serial":
                # no transfer/compute concurrency on this link: admit,
                # dispatch, fetch the SAME chunk (zero result lag)
                self._admit_free()
                out = []
                pending = self._dispatch()
                if pending is not None:
                    out = self._harvest(pending)
                return out

            prev, self._pending = self._pending, None
            if prev is None:
                # cold tick (startup or fully drained): admit before the
                # dispatch so the first chunk has work
                self._admit_free()
            self._pending = self._dispatch()
            # blocking fetch of the PREVIOUS chunk — overlaps the chunk
            # dispatched above
            out = self._harvest(prev)
            self._admit_free()
        return out

    def _admit_free(self):
        free = [i for i in range(self.max_slots) if self.slot_rid[i] is None]
        if free and self.queue:
            self._admit(free)

    def _depth(self, rate=None):
        """Adaptive dispatch depth: enough chunks to (by host estimate)
        finish the earliest-finishing occupied slot, so one result fetch
        covers its whole remaining generation; capped at
        max_dispatch_depth. ``rate`` = expected tokens per chunk unit
        (1.0 for plain steps, the tpr EMA for lookup rounds)."""
        if self.max_dispatch_depth <= 1:
            return 1
        occ = [s for s, r in enumerate(self.slot_rid) if r is not None]
        if not occ:
            return 1
        rem = min(int(self._est_limit[s] - self._est_len[s]) for s in occ)
        # lookup mode: rem TOKENS take ~rem/_tpr verify ROUNDS
        rounds = -(-max(rem, 1) // max(rate if rate is not None
                                       else self._tpr, 1.0))
        return int(np.clip(-(-rounds // self.chunk_size),
                           1, self.max_dispatch_depth))

    def _dispatch(self):
        """Enqueue ``_depth()`` decode chunks back-to-back for the occupied
        slots; returns the (chunk_no, packed results) handle of the LAST
        chunk (one fetch covers all of them), or None with nothing to run."""
        if not any(r is not None for r in self.slot_rid):
            return None
        results = None
        # auto-fallback (lookup mode): when the tokens-per-round EMA says a
        # verify round no longer pays for its lookup_round_cost plain steps,
        # this WAVE runs plain decode chunks instead; every
        # lookup_reprobe_every fallback waves a depth-1 lookup wave
        # re-probes (its harvest refreshes the EMA)
        lookup_wave = self.speculative == "lookup"
        probing = False
        if lookup_wave and self._tpr < self.lookup_round_cost:
            probing = self._since_probe >= self.lookup_reprobe_every
            lookup_wave = probing
        if self.speculative == "lookup":
            self._since_probe = 0 if lookup_wave else self._since_probe + 1
        rate = self._tpr if lookup_wave else 1.0
        # until the first harvested rate sample, lookup waves dispatch ONE
        # chunk: the prior-guess depth enqueued ~3 waves' worth of rounds
        # before the first measurement could trigger the fallback
        depth = (1 if probing or (lookup_wave and not self._tpr_seeded)
                 else self._depth(rate))
        for _ in range(depth):
            if lookup_wave:
                # chunk_size speculation ROUNDS: 1..draft_len+1 tokens each
                # per row (the host-side est_len advance below uses the EMA
                # tokens-per-round estimate; each harvest refreshes it to
                # the exact device value, bounding any drift to one
                # dispatch window)
                self.state, results = _decode_chunk_lookup(
                    self.params, self.config, self.forward, self.state,
                    n_rounds=self.chunk_size, K=self.draft_len,
                    ngram=self.lookup_ngram, end_ids=self.end_ids,
                    needs_positions=self.needs_positions,
                    sampling=self._sampling_on)
            else:
                self.state, results = _decode_chunk(
                    self.params, self.config, self.forward, self.state,
                    n_steps=self.chunk_size, sampling=self._sampling_on,
                    end_ids=self.end_ids, needs_positions=self.needs_positions)
            self.steps += self.chunk_size
            self._chunk_no += 1
            if lookup_wave:
                self._lrounds += self.chunk_size
            else:
                self._psteps += self.chunk_size
            if self.speculative:
                self._counts_at[self._chunk_no] = (self._lrounds,
                                                   self._psteps)
            adv = int(round(self.chunk_size * rate))
            for s, r in enumerate(self.slot_rid):
                if r is not None:
                    self._est_len[s] = min(self._est_len[s] + adv,
                                           self._est_limit[s])
        return (self._chunk_no, results)

    def run(self):
        """Generator: drive step() until queue, slots, and pending drain."""
        while (self.queue or self._pending is not None
               or any(r is not None for r in self.slot_rid)):
            yield from self.step()

    def warmup(self, prompt_len=8):
        """Compile every device program serving traffic can dispatch,
        BEFORE traffic arrives: the bucketed prefill, the configured decode
        chunk, and — on a speculative engine with auto-fallback enabled —
        the PLAIN decode chunk a fallback wave reverts to. Without the last
        one, the first dead-workload fallback pays a full XLA compile in
        the middle of live traffic (measured 7.6 s wall for ~0.2 s of
        device work on the tunneled chip, BENCH_DETAILS adversarial line).
        Runs tiny throwaway requests; the speculation EMA, wave counters,
        and fetch count are restored so the engine starts traffic clean."""
        snap = (self._tpr, self._tpr_seeded, self._lrounds, self._psteps,
                self._since_probe, self._chunk_no)

        def _mini():
            rs = np.random.RandomState(0)
            vocab = getattr(self.config, "vocab_size", 2)
            self.submit(rs.randint(1, max(vocab - 1, 2),
                                   (prompt_len,)).tolist(),
                        max_new_tokens=min(2 * self.chunk_size,
                                           self.max_len - prompt_len))
            for _ in self.run():
                pass

        _mini()
        if self.speculative == "lookup" and self.lookup_round_cost > 0:
            sp, self.speculative = self.speculative, None
            try:
                _mini()                      # the fallback PLAIN chunk
            finally:
                self.speculative = sp
        (self._tpr, self._tpr_seeded, self._lrounds, self._psteps,
         self._since_probe, self._chunk_no) = snap
        self._counts_at = {}
        self.fetches = 0
        self.steps = 0

    def utilization(self):
        return sum(r is not None for r in self.slot_rid) / self.max_slots
