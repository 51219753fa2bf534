"""Logits processors / wrappers as pure jittable functions.

Functional redesign of the reference's processor objects
(CleanTransformer/generation/logits_processor.py). Every function takes and
returns fixed-shape arrays so the whole chain lives inside the jitted decode
loop — including no-repeat-ngram, which the reference implements with
per-row Python dicts (logits_processor.py:18-30) and is here a vectorized
sliding-window match + scatter.
"""

import jax
import jax.numpy as jnp

NEG_INF = -jnp.inf


def temperature_wrap(scores, temperature):
    """scores / max(temperature, 1e-2)  (logits_processor.py:35-41)."""
    return scores / max(float(temperature), 1e-2)


def top_k_wrap(scores, top_k, min_tokens_to_keep=1):
    """Keep the top-k scores, fill the rest with -inf (logits_processor.py:44-56)."""
    k = int(max(top_k, min_tokens_to_keep, 1))
    k = min(k, scores.shape[-1])
    kth = jax.lax.top_k(scores, k)[0][..., -1:]
    return jnp.where(scores < kth, NEG_INF, scores)


def top_p_wrap(scores, top_p, min_tokens_to_keep=1):
    """Nucleus filtering with the reference's ascending-sort convention
    (logits_processor.py:59-79): sort ascending, drop tokens whose cumulative
    probability is <= 1-p, always keep the top ``min_tokens_to_keep``."""
    top_p = max(min(float(top_p), 1.0), 0.0)
    min_keep = max(1, int(min_tokens_to_keep))
    sorted_scores = jnp.sort(scores, axis=-1)  # ascending
    order = jnp.argsort(scores, axis=-1)
    cum = jnp.cumsum(jax.nn.softmax(sorted_scores, axis=-1), axis=-1)
    remove_sorted = cum <= (1.0 - top_p)
    keep_tail = jnp.arange(scores.shape[-1]) >= scores.shape[-1] - min_keep
    remove_sorted = jnp.where(keep_tail, False, remove_sorted)
    # scatter back to original token positions: remove[b, order[b, j]] = remove_sorted[b, j]
    b_idx = jnp.arange(scores.shape[0])[:, None]
    remove = jnp.zeros(scores.shape, dtype=bool).at[b_idx, order].set(remove_sorted)
    return jnp.where(remove, NEG_INF, scores)


def no_repeat_ngram(tokens_buf, cur_len, scores, ngram_size):
    """Ban tokens that would repeat an n-gram already present in the sequence
    (reference semantics, logits_processor.py:11-32, incl. counting pad
    tokens as ordinary tokens).

    tokens_buf: (B, T) fixed-size buffer; positions >= cur_len are ignored.
    scores: (B, V). Bans token x iff the (n-1)-token suffix
    tokens[cur_len-n+1:cur_len] appeared at some window j with following
    token x, for windows fully inside [0, cur_len).
    """
    n = int(ngram_size)
    B, T = tokens_buf.shape
    if n < 2 or T < n:
        return scores
    # prefix: the last n-1 tokens of each row (ends at cur_len); clamped at 0
    # (when cur_len < n every window is invalid below, so prefix is unused)
    start = jnp.maximum(jnp.asarray(cur_len) - (n - 1), 0).astype(jnp.int32)
    idx = jnp.broadcast_to(jnp.arange(n - 1)[None, :], (B, n - 1)) + start.reshape(-1, 1)
    prefix = jnp.take_along_axis(tokens_buf, idx, axis=1)  # (B, n-1)

    # windows j in [0, T-n]: tokens_buf[:, j:j+n-1] vs prefix; banned token is
    # tokens_buf[:, j+n-1]; window valid iff j+n-1 <= cur_len-1
    num_win = T - n + 1
    win_idx = jnp.arange(num_win)[:, None] + jnp.arange(n - 1)[None, :]  # (num_win, n-1)
    windows = tokens_buf[:, win_idx]  # (B, num_win, n-1)
    match = jnp.all(windows == prefix[:, None, :], axis=-1)  # (B, num_win)
    valid = (jnp.arange(num_win)[None, :] + n - 1) <= (cur_len - 1)
    match = match & valid
    banned_tokens = tokens_buf[:, n - 1: n - 1 + num_win]  # (B, num_win)
    # scatter-max the ban mask into vocab space
    V = scores.shape[-1]
    b_idx = jnp.broadcast_to(jnp.arange(B)[:, None], banned_tokens.shape)
    ban = jnp.zeros((B, V), dtype=bool).at[b_idx, banned_tokens].max(match)
    return jnp.where(ban, NEG_INF, scores)


def build_wrapper_chain(do_sample, temperature, top_k, top_p):
    """Compose the sampling wrapper chain with the reference's gating
    (generation_util.py:38-45): temperature only if != 1.0, top_k if > 0,
    top_p if < 1.0 — all only when sampling."""
    fns = []
    if do_sample and temperature != 1.0:
        fns.append(lambda s: temperature_wrap(s, temperature))
    if do_sample and top_k > 0:
        fns.append(lambda s: top_k_wrap(s, top_k, min_tokens_to_keep=1))
    if do_sample and top_p < 1.0:
        fns.append(lambda s: top_p_wrap(s, top_p, min_tokens_to_keep=1))

    def chain(scores):
        for f in fns:
            scores = f(scores)
        return scores

    return chain
