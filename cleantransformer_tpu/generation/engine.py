"""The generation engine.

Behavioral spec: the reference's GenerationMixin
(CleanTransformer/generation/generation_util.py) — same ``generation_configs``
keys (beam_size, max_gen_len, end_ids, pad_id, no_repeat_ngram_size,
do_sample, temperature, top_k, top_p, early_stop; generation_util.py:20-29),
same finished-sequence pad masking (L89-94), same mask/position extension
rules (L97-101), same beam bookkeeping (L121-205).

TPU-first redesign:
 - Greedy/sampling decode is ONE jitted function: fixed-shape token/mask
   buffers of size prompt_len + max_gen_len + 2, a fixed-shape KV-cache
   written with dynamic_update_slice, and a ``lax.while_loop`` with early
   exit when every sequence is finished — replacing the reference's Python
   loop with concat-grown tensors (generation_util.py:57-119).
 - With streamers attached, the same jitted single-step function is driven
   from a host loop so the callback sees every token (reference streamer
   protocol, L104-112).
 - Beam search keeps the reference's per-batch candidate-pool semantics
   exactly (dynamic bookkeeping on host, L121-178) while the model step and
   the KV-cache beam reorder (a gather along the batch axis, replacing
   index_select L265-272) stay jitted.

Model protocol (duck-typed; see models/gpt.py, models/bloom.py):
  model.params, model.config
  model.forward_fn() -> fn(params, config, input_ids, attention_mask,
                           position_ids, segment_ids, cache)
                        -> ((logits, hidden), new_cache)
  model.init_cache(batch_size, max_len) -> cache pytree
"""

import functools
from types import MethodType

import numpy as np

import jax
import jax.numpy as jnp

from cleantransformer_tpu.generation.logits_process import (
    no_repeat_ngram, build_wrapper_chain,
)


def inference_params(model):
    """Inference-precision cast: when the model's compute policy is bf16,
    cast the fp32 master params once — decode is HBM-bandwidth-bound, and
    bf16 weights halve the bytes every step must stream. With
    ``quantize_int8`` the projections become int8 {"q","s"} pytrees
    (ops/quant.py). Cached per params identity so repeated generate() calls
    (chat REPL, serving) don't re-materialize the cast copy every turn."""
    params = model.params
    cdtype = getattr(model.config, "compute_dtype", jnp.float32)
    quantize = getattr(model.config, "quantize_int8", False)
    prep = getattr(
        __import__(type(model).__module__, fromlist=["_"]),
        "prepare_decode_params", None)
    if not quantize and cdtype == jnp.float32 and prep is None:
        return params
    cached = getattr(model, "_cast_param_cache", None)
    if cached is not None and cached[0] is model.params:
        return cached[1]
    if quantize:
        from cleantransformer_tpu.ops.quant import quantize_params_for_inference
        params = quantize_params_for_inference(
            params, compute_dtype=cdtype if cdtype != jnp.float32
            else jnp.bfloat16)
    elif cdtype != jnp.float32:
        params = jax.tree_util.tree_map(
            lambda x: x.astype(cdtype)
            if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating) else x,
            params)
    if prep is not None:
        # model-module hook (e.g. Bloom's one-time head-interleaved ->
        # contiguous qkv permutation for the fused decode kernel)
        params = prep(params, model.config)
    model._cast_param_cache = (model.params, params)
    return params


def cache_factory(model, dense=False):
    """The model's module-level cache factory fn(config, B, T) — preferred
    over the bound ``model.init_cache`` wherever the factory becomes a
    static jit argument (static args are held strongly; a bound method
    would pin the whole model, params included, in the jit cache).

    ``dense=True`` requests the plain (L, B, H, T, hd) layout even when the
    config opts into a specialized decode layout (``fused_decode``):
    consumers that reorder the cache along the batch axis (beam) or write
    ragged per-row windows (batched speculative verify) need it."""
    if dense:
        f = getattr(type(model), "cache_factory_dense", None)
        if f is not None:
            return f
    f = getattr(type(model), "cache_factory", None)
    if f is not None:
        return f
    # duck-typed fallback: wrap the bound method (pins the model — fine for
    # short-lived/experimental model classes). Memoized on the instance so
    # repeated generate() calls hit the same jit cache entry.
    cached = getattr(model, "_cache_factory_wrapper", None)
    if cached is not None:
        return cached
    bound = model.init_cache
    model._cache_factory_wrapper = lambda config, B, T: bound(B, T)
    return model._cache_factory_wrapper


def bind_generation(model):
    """Attach .generate() to a model instance (the reference gets it by
    inheriting GenerationMixin; here it is bound explicitly)."""
    model.generate = MethodType(generate, model)
    return model


def generate(model, input_ids, attention_mask=None, position_ids=None,
             segment_ids=None, generation_configs={}, steamers=None, rng=None,
             draft_model=None, draft_len=4):
    """Mirror of GenerationMixin.generate (generation_util.py:19-55).

    Returns tokens of shape (bsz, beam_size, total_len) like the reference.

    ``draft_model``: accelerate batch-1 decoding with speculative decoding
    (generation/speculative.py) — the draft proposes ``draft_len`` tokens per
    target verification. Greedy output is bit-identical to the plain path;
    sampling output is distributed exactly as the plain sampler (rejection
    sampling). Defaults (incl. do_sample=True) are resolved HERE so adding
    a draft model never silently changes the decoding mode. The string
    ``"ngram"`` selects DRAFT-FREE prompt-lookup speculation — proposals
    come from n-gram matches in the committed context instead of a second
    model; greedy and sampling (point-mass rejection) both supported, any
    batch size."""
    if draft_model is not None:
        from cleantransformer_tpu.generation.speculative import (
            prompt_lookup_generate, speculative_generate)
        # resolve the do_sample default (True, reference parity) up front so
        # dispatching never silently changes the decoding mode
        cfg_resolved = {**generation_configs,
                        "do_sample": generation_configs.get("do_sample", True)}
        if isinstance(draft_model, str):
            if draft_model != "ngram":
                raise ValueError(f"unknown draft mode {draft_model!r} "
                                 "(model instance or 'ngram')")
            return prompt_lookup_generate(model, input_ids, attention_mask,
                                          cfg_resolved, draft_len=draft_len,
                                          rng=rng)
        return speculative_generate(model, draft_model, input_ids,
                                    attention_mask, cfg_resolved,
                                    draft_len=draft_len, rng=rng)
    cfg = generation_configs
    beam_size = cfg.get("beam_size", 1)
    max_gen_len = cfg.get("max_gen_len", 100)
    end_ids = cfg.get("end_ids", None)
    pad_id = cfg.get("pad_id", 0)
    no_repeat_ngram_size = cfg.get("no_repeat_ngram_size", 0)
    do_sample = cfg.get("do_sample", True)
    temperature = cfg.get("temperature", 1.0)
    top_k = cfg.get("top_k", 10)
    top_p = cfg.get("top_p", 0.8)
    early_stop = cfg.get("early_stop", True)

    if isinstance(end_ids, int):
        end_ids = [end_ids]
    end_ids = tuple(end_ids) if end_ids is not None else None

    # keep prompt arrays host-side (numpy): the fused program takes them as
    # arguments, so the transfer happens inside its single launch instead of
    # as separate eager dispatches (each one is launch overhead on a
    # remotely-tunnelled TPU)
    input_ids = np.asarray(input_ids)
    if attention_mask is None:
        attention_mask = np.ones_like(input_ids)
    attention_mask = np.asarray(attention_mask)

    if rng is None:
        # raw legacy uint32 key, built host-side — jax.random accepts it
        # directly; PRNGKey() would dispatch a device op per generate() call
        rng = np.asarray([0, np.random.randint(0, 2 ** 31 - 1)], np.uint32)

    # models with learned position embeddings can't decode past n_positions:
    # under jit the gather would silently clamp to the last position where
    # the torch reference raises an index error — fail loudly instead
    n_positions = getattr(model.config, "n_positions", None)
    if n_positions is not None:
        total_len = input_ids.shape[1] + max_gen_len + 2
        if total_len > n_positions:
            raise ValueError(
                f"prompt ({input_ids.shape[1]}) + max_gen_len ({max_gen_len})"
                f" + 2 = {total_len} exceeds the model's n_positions "
                f"({n_positions})")

    params = inference_params(model)

    common = dict(
        max_gen_len=max_gen_len, end_ids=end_ids, pad_id=pad_id,
        no_repeat_ngram_size=no_repeat_ngram_size, do_sample=do_sample,
        temperature=temperature, top_k=top_k, top_p=top_p,
    )
    if beam_size == 1:
        return _greedy_search(model, params, input_ids, attention_mask,
                              position_ids, segment_ids, rng=rng,
                              steamers=steamers, **common)
    return _beam_search(model, params, input_ids, attention_mask, position_ids,
                        segment_ids, rng=rng, steamers=steamers,
                        beam_size=beam_size, early_stop=early_stop, **common)


# ---------------------------------------------------------------------------
# shared jitted pieces
# ---------------------------------------------------------------------------

def _make_buffers(input_ids, attention_mask, total_len, pad_id):
    """Fixed-size token/mask buffers. The mask extension value for generated
    positions is the prompt mask's last column (generation_util.py:101)."""
    B, S0 = input_ids.shape
    tokens_buf = jnp.full((B, total_len), pad_id, dtype=jnp.int32)
    tokens_buf = jax.lax.dynamic_update_slice(tokens_buf, input_ids.astype(jnp.int32), (0, 0))
    mask_buf = jnp.zeros((B, total_len), dtype=jnp.int32)
    mask_buf = jax.lax.dynamic_update_slice(mask_buf, attention_mask.astype(jnp.int32), (0, 0))
    extend_val = attention_mask[:, -1].astype(jnp.int32)
    return tokens_buf, mask_buf, extend_val


def _make_aux_buffers(position_ids, segment_ids, B, total_len, beam_mode=False):
    """Optional user position/segment buffers threaded through decode.
    Extension rules per the reference: greedy appends row-max+1 positions
    (generation_util.py:98) and repeats the last segment id (L99); beam
    appends last-value+1 (L255) — ``beam_mode`` picks the position rule.
    Entries are None when the user did not supply them."""
    aux = {"pos": None, "pos_max": None, "seg": None}
    if position_ids is not None:
        p = jnp.asarray(position_ids).astype(jnp.int32)
        buf = jnp.zeros((B, total_len), jnp.int32)
        aux["pos"] = jax.lax.dynamic_update_slice(buf, p, (0, 0))
        aux["pos_max"] = jnp.max(p, axis=-1)  # unused in beam_mode
    if segment_ids is not None:
        s = jnp.asarray(segment_ids).astype(jnp.int32)
        buf = jnp.zeros((B, total_len), jnp.int32)
        aux["seg"] = jax.lax.dynamic_update_slice(buf, s, (0, 0))
    return aux


def _aux_slice(aux, cur_len, B):
    """Current-step (B,1) position/segment inputs (or None)."""
    pos = seg = None
    if aux["pos"] is not None:
        pos = jax.lax.dynamic_slice(aux["pos"], (0, cur_len - 1), (B, 1))
    if aux["seg"] is not None:
        seg = jax.lax.dynamic_slice(aux["seg"], (0, cur_len - 1), (B, 1))
    return pos, seg


def _aux_extend(aux, cur_len, B, beam_mode=False):
    """Append the next position/segment values at ``cur_len``."""
    if aux["pos"] is not None:
        if beam_mode:
            last = aux["pos"][jnp.arange(B), cur_len - 1]
            new = last + 1
        else:
            new = aux["pos_max"] + 1
            aux = {**aux, "pos_max": new}
        aux = {**aux, "pos": jax.lax.dynamic_update_slice(
            aux["pos"], new[:, None], (0, cur_len))}
    if aux["seg"] is not None:
        last = aux["seg"][jnp.arange(B), cur_len - 1]
        aux = {**aux, "seg": jax.lax.dynamic_update_slice(
            aux["seg"], last[:, None], (0, cur_len))}
    return aux


def _select_token(scores, do_sample, rng):
    if do_sample:
        return jax.random.categorical(rng, scores, axis=-1).astype(jnp.int32)
    return jnp.argmax(scores, axis=-1).astype(jnp.int32)


def _finish_update(step_output, unfinished, end_ids, pad_id):
    """Pad finished rows and update the unfinished flags
    (generation_util.py:89-94). With no end ids every row stays unfinished
    forever, so the masking is the identity — skip the kernels."""
    if end_ids is None:
        return step_output, unfinished
    step_output = step_output * unfinished + pad_id * (1 - unfinished)
    not_end = jnp.ones_like(unfinished)
    for e in end_ids:
        not_end = not_end * (step_output != e).astype(unfinished.dtype)
    unfinished = unfinished * not_end
    return step_output, unfinished


@functools.partial(jax.jit, static_argnames=(
    "forward", "config", "ngram_size", "do_sample", "temperature", "top_k",
    "top_p", "end_ids", "pad_id"))
def _prefill_step(params, config, forward, tokens_buf, mask_buf, cache,
                  input_ids, position_ids, segment_ids, aux, unfinished, rng,
                  ngram_size, do_sample, temperature, top_k, top_p,
                  end_ids, pad_id, cur_len):
    """Run the prompt through the model and choose the first generated token."""
    (logits, _), cache = forward(params, config, input_ids, mask_buf,
                                 position_ids, segment_ids, cache,
                                 last_only=True)
    scores = logits[:, -1, :].astype(jnp.float32)
    return _postprocess_and_append(
        forward, config, params, scores, tokens_buf, mask_buf, cache, aux,
        unfinished, rng, ngram_size, do_sample, temperature, top_k, top_p,
        end_ids, pad_id, cur_len)


def _postprocess_and_append(forward, config, params, scores, tokens_buf,
                            mask_buf, cache, aux, unfinished, rng, ngram_size,
                            do_sample, temperature, top_k, top_p, end_ids,
                            pad_id, cur_len):
    if ngram_size and ngram_size > 1:
        scores = no_repeat_ngram(tokens_buf, cur_len, scores, ngram_size)
    wrapper = build_wrapper_chain(do_sample, temperature, top_k, top_p)
    scores = wrapper(scores)
    if do_sample:
        rng, sub = jax.random.split(rng)
    else:
        sub = rng  # greedy never consumes randomness; skip the split kernel
    step_output = _select_token(scores, do_sample, sub)
    step_output, unfinished = _finish_update(step_output, unfinished, end_ids, pad_id)
    B = tokens_buf.shape[0]
    tokens_buf = jax.lax.dynamic_update_slice(
        tokens_buf, step_output[:, None], (0, cur_len))
    # the mask extension value is the prompt mask's last column, constant for
    # the whole decode (generation_util.py:101) — precomputed, not re-gathered
    ext = aux.get("ext")
    if ext is None:
        ext = mask_buf[jnp.arange(B), jnp.maximum(cur_len - 1, 0)]
    mask_buf = jax.lax.dynamic_update_slice(
        mask_buf, ext[:, None], (0, cur_len))
    aux = _aux_extend(aux, cur_len, B)
    return tokens_buf, mask_buf, cache, aux, unfinished, rng, cur_len + 1


def _decode_one(forward, config, params, tokens_buf, mask_buf, cache, aux,
                unfinished, rng, cur_len, ngram_size, do_sample, temperature,
                top_k, top_p, end_ids, pad_id):
    """One decode iteration: forward the last written token, pick the next."""
    B = tokens_buf.shape[0]
    last_tok = jax.lax.dynamic_slice(tokens_buf, (0, cur_len - 1), (B, 1))
    pos, seg = _aux_slice(aux, cur_len, B)
    (logits, _), cache = forward(params, config, last_tok, mask_buf,
                                 pos, seg, cache)
    scores = logits[:, -1, :].astype(jnp.float32)
    return _postprocess_and_append(
        forward, config, params, scores, tokens_buf, mask_buf, cache, aux,
        unfinished, rng, ngram_size, do_sample, temperature, top_k, top_p,
        end_ids, pad_id, cur_len)


@functools.partial(jax.jit, static_argnames=(
    "forward", "config", "init_cache", "ngram_size", "do_sample",
    "temperature", "top_k", "top_p", "end_ids", "pad_id", "total_len"))
def _generate_fused(params, config, forward, init_cache, input_ids,
                    attention_mask, position_ids, segment_ids, rng,
                    ngram_size, do_sample, temperature, top_k,
                    top_p, end_ids, pad_id, total_len):
    """Prefill + full decode loop as ONE device program.

    On a remotely-tunnelled TPU every executable launch that the host
    synchronizes on costs a network round trip; splitting prefill and the
    decode loop into two jits plus two host fetches added ~3 RTTs per
    generate() call. Fusing them (and fetching the (tokens, length) tuple
    with a single jax.device_get) leaves exactly one round trip.

    The token/mask buffers and the zero KV cache are created INSIDE the
    program (``init_cache`` is the model class's MODULE-LEVEL cache factory,
    called as init_cache(config, B, T)): eagerly allocating them on the host
    dispatched ~8 extra device ops per generate() call — pure per-call
    launch overhead on the tunnel — and kept a dead zero-cache buffer alive
    in HBM between calls. The factory must not be a bound method: static
    jit args are held strongly, so a bound init_cache would pin the model
    (and its params) in HBM for the life of the jit cache."""
    B, S0 = input_ids.shape
    cache = init_cache(config, B, total_len)
    tokens_buf, mask_buf, extend_val = _make_buffers(
        input_ids, attention_mask, total_len, pad_id)
    aux = _make_aux_buffers(position_ids, segment_ids, B, total_len)
    aux["ext"] = extend_val
    unfinished = jnp.ones((B,), dtype=jnp.int32)
    cur_len = jnp.asarray(S0, jnp.int32)
    (logits, _), cache = forward(params, config, input_ids, mask_buf,
                                 position_ids, segment_ids, cache,
                                 last_only=True)
    scores = logits[:, -1, :].astype(jnp.float32)
    state = _postprocess_and_append(
        forward, config, params, scores, tokens_buf, mask_buf, cache, aux,
        unfinished, rng, ngram_size, do_sample, temperature, top_k, top_p,
        end_ids, pad_id, cur_len)

    def body(state):
        tokens_buf, mask_buf, cache, aux, unfinished, rng, cur_len = state
        return _decode_one(forward, config, params, tokens_buf, mask_buf,
                           cache, aux, unfinished, rng, cur_len, ngram_size,
                           do_sample, temperature, top_k, top_p, end_ids,
                           pad_id)

    if end_ids is None:
        # no early exit possible (unfinished is invariantly all-ones) and the
        # prompt length is static, so the trip count is static: a fori_loop
        # with unrolling drops the while-cond evaluation from every token
        trip = total_len - (input_ids.shape[1] + 1)
        state = jax.lax.fori_loop(0, trip, lambda i, s: body(s), state,
                                  unroll=min(4, max(trip, 1)))
        return state[0], state[-1]

    def cond(state):
        cur_len, unfinished = state[-1], state[-3]
        return jnp.logical_and(cur_len < total_len, jnp.max(unfinished) > 0)

    state = jax.lax.while_loop(cond, body, state)
    return state[0], state[-1]


_decode_step_jit = None


def _get_decode_step():
    global _decode_step_jit
    if _decode_step_jit is None:
        _decode_step_jit = jax.jit(
            _decode_one,
            static_argnames=("forward", "config", "ngram_size", "do_sample",
                             "temperature", "top_k", "top_p", "end_ids", "pad_id"))
    return _decode_step_jit


# ---------------------------------------------------------------------------
# greedy / sampling search
# ---------------------------------------------------------------------------

def _greedy_search(model, params, input_ids, attention_mask, position_ids,
                   segment_ids, rng, steamers, max_gen_len, end_ids, pad_id,
                   no_repeat_ngram_size, do_sample, temperature, top_k, top_p):
    B, S0 = input_ids.shape
    # The reference's loop emits up to max_gen_len + 2 tokens before its
    # step > max_len check trips (generation_util.py:114-117).
    total_len = S0 + max_gen_len + 2
    forward = model.forward_fn()

    kw = dict(ngram_size=no_repeat_ngram_size, do_sample=do_sample,
              temperature=temperature, top_k=top_k, top_p=top_p,
              end_ids=end_ids, pad_id=pad_id)
    if steamers is None:
        tokens_buf, cur_len = _generate_fused(
            params, model.config, forward, cache_factory(model), input_ids,
            attention_mask, position_ids, segment_ids, rng,
            total_len=total_len, **kw)
        tokens_np, n = jax.device_get((tokens_buf, cur_len))
        n = int(n)
        return tokens_np[:, :n].reshape(B, 1, n)

    cache = model.init_cache(B, total_len)
    tokens_buf, mask_buf, extend_val = _make_buffers(input_ids, attention_mask,
                                                     total_len, pad_id)
    aux = _make_aux_buffers(position_ids, segment_ids, B, total_len)
    aux["ext"] = extend_val
    unfinished = jnp.ones((B,), dtype=jnp.int32)

    tokens_buf, mask_buf, cache, aux, unfinished, rng, cur_len = _prefill_step(
        params, model.config, forward, tokens_buf, mask_buf, cache,
        input_ids, position_ids, segment_ids, aux, unfinished, rng,
        cur_len=jnp.asarray(S0, jnp.int32), **kw)

    # streaming path: jitted single step driven from host so callbacks fire
    steamers = steamers if isinstance(steamers, list) else [steamers]
    step_fn = _get_decode_step()
    state = (tokens_buf, mask_buf, cache, aux, unfinished, rng, cur_len)
    while True:
        tokens_buf, mask_buf, cache, aux, unfinished, rng, cur_len = state
        n = int(cur_len)
        finish = False
        for steamer in steamers:
            if callable(steamer):
                finish = steamer(np.asarray(tokens_buf[:, :n]).reshape(B, 1, n)) or finish
        if finish or int(jnp.max(unfinished)) == 0 or n >= total_len:
            return np.asarray(tokens_buf[:, :n]).reshape(B, 1, n)
        state = step_fn(forward, model.config, params, tokens_buf,
                        mask_buf, cache, aux, unfinished, rng, cur_len, **kw)


# ---------------------------------------------------------------------------
# beam search
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("forward", "config"))
def _beam_forward_last(params, config, forward, tokens_buf, mask_buf, cache,
                       aux, cur_len):
    B = tokens_buf.shape[0]
    last_tok = jax.lax.dynamic_slice(tokens_buf, (0, cur_len - 1), (B, 1))
    pos, seg = _aux_slice(aux, cur_len, B)
    (logits, _), cache = forward(params, config, last_tok, mask_buf, pos, seg, cache)
    return logits[:, -1, :].astype(jnp.float32), cache


@functools.partial(jax.jit, static_argnames=("forward", "config"))
def _beam_prefill(params, config, forward, input_ids, mask_buf, position_ids,
                  segment_ids, cache):
    (logits, _), cache = forward(params, config, input_ids, mask_buf,
                                 position_ids, segment_ids, cache,
                                 last_only=True)
    return logits[:, -1, :].astype(jnp.float32), cache


@jax.jit
def _cache_reorder(cache, flat_indices):
    """Beam reorder: gather the cache along the batch axis (replacing the
    reference's per-layer index_select, generation_util.py:265-272)."""
    return jax.tree_util.tree_map(
        lambda x: jnp.take(x, flat_indices, axis=1) if x.ndim >= 2 else x, cache)


def _beam_topk(scores_log, probs, bsz, beam_size, do_sample, temperature,
               wrapper, tokens_np, rng):
    """2*beam candidate selection (generation_util.py:180-205)."""
    vocab = scores_log.shape[-1]
    probs_col = probs.reshape(-1, 1)
    if do_sample:
        scores = scores_log + probs_col * temperature
    else:
        scores = scores_log + probs_col
    scores = scores.reshape(bsz, -1)
    if do_sample:
        scores = wrapper(scores)
        rng, sub = jax.random.split(rng)
        # sampling WITHOUT replacement (torch.multinomial semantics,
        # generation_util.py:195) via the Gumbel top-k trick
        gumbel = jax.random.gumbel(sub, scores.shape)
        _, next_tokens = jax.lax.top_k(scores + gumbel, 2 * beam_size)
        picked = jnp.take_along_axis(scores, next_tokens, axis=-1)
        order = jnp.argsort(-picked, axis=1)
        picked = jnp.take_along_axis(picked, order, axis=1)
        next_tokens = jnp.take_along_axis(next_tokens, order, axis=1)
    else:
        picked, next_tokens = jax.lax.top_k(scores, 2 * beam_size)
    token_indices = next_tokens // vocab
    next_tokens = next_tokens % vocab
    return np.asarray(token_indices), np.asarray(next_tokens), np.asarray(picked), rng


def _beam_search(model, params, input_ids, attention_mask, position_ids,
                 segment_ids, rng, steamers, beam_size, early_stop, max_gen_len,
                 end_ids, pad_id, no_repeat_ngram_size, do_sample, temperature,
                 top_k, top_p, length_penalty=1.0):
    """Reference-semantics beam search (generation_util.py:207-290): the
    candidate pool / worst-score / early-stop bookkeeping runs on host; the
    model step, logits math and cache reorder are jitted."""
    bsz, S0 = input_ids.shape
    total_len = S0 + max_gen_len + 2
    forward = model.forward_fn()
    end_set = set(end_ids) if end_ids is not None else set()

    # expand to beams (generation_util.py:214-217)
    input_ids = jnp.repeat(input_ids, beam_size, axis=0)
    attention_mask = jnp.repeat(attention_mask, beam_size, axis=0)
    if position_ids is not None:
        position_ids = jnp.repeat(jnp.asarray(position_ids), beam_size, axis=0)
    if segment_ids is not None:
        segment_ids = jnp.repeat(jnp.asarray(segment_ids), beam_size, axis=0)
    B = bsz * beam_size

    # beam reorders the cache along the batch axis every step (jnp.take
    # axis=1) — batch is axis 1 in EVERY cache layout (dense (L,B,H,T,hd),
    # fused (L,B,T,D), llama head-major, and their int8 dict leaves), so
    # beam rides the model's own fast decode layout: per-step decode goes
    # through the whole-stack fused kernel on fused_decode configs
    # (reference KV reorder: generation_util.py:265-272)
    cache = cache_factory(model)(model.config, B, total_len)
    tokens_buf, mask_buf, _ = _make_buffers(input_ids, attention_mask, total_len, pad_id)
    aux = _make_aux_buffers(position_ids, segment_ids, B, total_len, beam_mode=True)

    if steamers is None:
        # fast path: the whole beam search is ONE compiled program
        from cleantransformer_tpu.generation.beam_fused import beam_search_fused
        out = beam_search_fused(
            params, model.config, forward, input_ids, position_ids,
            segment_ids, tokens_buf, mask_buf, cache, aux, rng,
            beam_size=beam_size, ngram_size=no_repeat_ngram_size,
            do_sample=do_sample, temperature=float(temperature),
            top_k=top_k, top_p=top_p, end_ids=end_ids, pad_id=pad_id,
            early_stop=early_stop, total_len=total_len, s0=S0)
        return np.asarray(out)

    # sentence scores; beams>0 start at -1e9 (generation_util.py:220-221)
    probs = np.zeros((bsz, beam_size), dtype=np.float32)
    probs[:, 1:] = -1e9

    infos = [{"is_done": False, "worst_score": 1e9, "candi_generation": []}
             for _ in range(bsz)]
    wrapper = build_wrapper_chain(do_sample, temperature, top_k, top_p)
    steamers = steamers if (steamers is None or isinstance(steamers, list)) else [steamers]

    cur_len = S0
    first = True
    while True:
        if first:
            scores_logits, cache = _beam_prefill(
                params, model.config, forward, input_ids, mask_buf,
                position_ids, segment_ids, cache)
            first = False
        else:
            scores_logits, cache = _beam_forward_last(
                params, model.config, forward, tokens_buf, mask_buf,
                cache, aux, jnp.asarray(cur_len, jnp.int32))

        if no_repeat_ngram_size and no_repeat_ngram_size > 1:
            scores_logits = no_repeat_ngram(
                tokens_buf, jnp.asarray(cur_len, jnp.int32), scores_logits,
                no_repeat_ngram_size)

        scores_log = jax.nn.log_softmax(scores_logits, axis=-1)
        token_indices, next_tokens, picked, rng = _beam_topk(
            scores_log, jnp.asarray(probs), bsz, beam_size, do_sample,
            temperature, wrapper, None, rng)

        tokens_np = np.asarray(tokens_buf[:, :cur_len])
        infos, new_indices, new_tokens, new_probs = _update_beam_infos(
            beam_size, infos, tokens_np, token_indices, next_tokens, picked,
            end_set, pad_id, length_penalty, early_stop)
        probs = new_probs

        # reorder beams + append token (generation_util.py:247-263)
        flat_idx = (new_indices + np.arange(bsz)[:, None] * beam_size).reshape(-1)
        flat_idx_j = jnp.asarray(flat_idx)
        tokens_buf = jnp.take(tokens_buf, flat_idx_j, axis=0)
        mask_buf = jnp.take(mask_buf, flat_idx_j, axis=0)
        extend_val = mask_buf[jnp.arange(B), cur_len - 1]
        tokens_buf = tokens_buf.at[:, cur_len].set(jnp.asarray(new_tokens.reshape(-1)))
        mask_buf = mask_buf.at[:, cur_len].set(extend_val)
        aux = jax.tree_util.tree_map(
            lambda x: jnp.take(x, flat_idx_j, axis=0) if x.ndim == 2 else x, aux)
        aux = _aux_extend(aux, jnp.asarray(cur_len, jnp.int32), B, beam_mode=True)
        cache = _cache_reorder(cache, flat_idx_j)
        cur_len += 1

        if steamers is not None:
            finish = False
            for steamer in steamers:
                if callable(steamer):
                    finish = steamer(np.asarray(tokens_buf[:, :cur_len])
                                     .reshape(bsz, beam_size, -1)) or finish
            if finish:
                break

        # END check (generation_util.py:286-288): step > max_len
        if (cur_len - 1) > (S0 + max_gen_len):
            break

    return np.asarray(tokens_buf[:, :cur_len]).reshape(bsz, beam_size, -1)


def _update_beam_infos(beam, infos, tokens_np, token_indices, next_tokens,
                       picked, end_set, pad_id, length_penalty, early_stop):
    """Candidate-pool bookkeeping, semantics per generation_util.py:121-178."""
    bsz = next_tokens.shape[0]
    new_indices = np.zeros((bsz, beam), dtype=np.int64)
    new_tokens = np.zeros((bsz, beam), dtype=np.int64)
    new_probs = np.zeros((bsz, beam), dtype=np.float32)
    cur_len = tokens_np.shape[-1]

    for bi in range(bsz):
        pool = infos[bi]["candi_generation"]
        if infos[bi]["is_done"]:
            new_tokens[bi, :] = pad_id
            continue
        valid = 0
        # NB: the reference examines only the FIRST beam candidates of the
        # 2*beam selected (generation_util.py:140 `for beam_i in range(beam)`),
        # so an end-token among them leaves trailing beam slots at token 0 /
        # index 0 / prob 0. Reproduced exactly.
        for ci in range(beam):
            tok = int(next_tokens[bi, ci])
            if tok in end_set:
                choice = beam * bi + int(token_indices[bi, ci])
                score = float(picked[bi, ci]) / (cur_len ** length_penalty)
                pool.append({"ids": tokens_np[choice], "score": score})
                if len(pool) > beam:
                    ranked = sorted((c["score"], idx) for idx, c in enumerate(pool))
                    del pool[ranked[0][1]]
                    infos[bi]["worst_score"] = ranked[1][0]
                else:
                    infos[bi]["worst_score"] = min(score, infos[bi]["worst_score"])
            else:
                new_indices[bi, valid] = token_indices[bi, ci]
                new_tokens[bi, valid] = tok
                new_probs[bi, valid] = picked[bi, ci]
                valid += 1
            if valid >= beam:
                break
        infos[bi]["candi_generation"] = pool
        if len(pool) >= beam:
            if early_stop:
                infos[bi]["is_done"] = True
                continue
            next_highest = float(picked[bi].max()) / ((cur_len + 1) ** length_penalty)
            if infos[bi]["worst_score"] > next_highest:
                infos[bi]["is_done"] = True
    return infos, new_indices, new_tokens, new_probs
