"""Continuous-batching serving engine (TPU-native extension, beyond the
reference's capability set — the reference serves one batch per generate()
call, examples/bloom_interactive.py).

Design: a fixed pool of B decode slots over ONE fixed-shape KV cache
(L, B, H, T, hd). Requests are admitted into free slots by a per-request
jitted prefill (prompt lengths padded to a small set of static buckets);
all active slots then advance together through a jitted multi-token decode
chunk with PER-ROW cache offsets (ragged batching — each slot is at its own
position). Finished slots are freed and refilled without ever stopping the
others, so decode throughput stays at full batch utilization under a stream
of variable-length requests.

Everything device-side is fixed-shape and compiles once per prefill bucket
plus once for the decode chunk. The host syncs once per chunk (a single
device_get of the small token/length/active buffers), never per token.

Greedy and temperature/top-k/top-p sampling are supported engine-wide;
per-request ``max_new_tokens`` and shared ``end_ids`` terminate slots
device-side.
"""

import functools
from collections import deque

import numpy as np

import jax
import jax.numpy as jnp

from cleantransformer_tpu.generation.logits_process import build_wrapper_chain

DEFAULT_BUCKETS = (16, 32, 64, 128, 256)


@functools.partial(jax.jit, static_argnames=(
    "forward", "config", "bucket", "do_sample", "temperature", "top_k",
    "top_p", "end_ids"), donate_argnames=("state",))
def _prefill_slot(params, config, forward, state, ids_bucket, prompt_len,
                  max_total, slot, bucket, do_sample, temperature, top_k,
                  top_p, end_ids):
    """Run one request's prompt through the model into ``slot`` and append
    its first generated token — ONE device program per admission (host-side
    eager ops are prohibitively slow through a remote-compile tunnel).

    ids_bucket: (1, bucket) prompt padded on the right; positions >=
    prompt_len are masked out of attention (their cache entries hold garbage
    that the mask excludes, and generation overwrites them in order).
    """
    L = state["cache_k"].shape[0]
    H = state["cache_k"].shape[2]
    hd = state["cache_k"].shape[4]
    mask1 = (jnp.arange(bucket, dtype=jnp.int32) < prompt_len)[None].astype(jnp.int32)
    small_cache = {
        "k": jnp.zeros((L, 1, H, bucket, hd), state["cache_k"].dtype),
        "v": jnp.zeros((L, 1, H, bucket, hd), state["cache_k"].dtype),
        "length": jnp.zeros((), jnp.int32),
    }
    (logits, _), small_cache = forward(params, config, ids_bucket, mask1,
                                       None, None, small_cache)
    first_scores = logits[0, prompt_len - 1, :].astype(jnp.float32)

    # scatter the prompt prefix into the slot
    state = dict(state)
    state["cache_k"] = jax.lax.dynamic_update_slice(
        state["cache_k"], small_cache["k"].astype(state["cache_k"].dtype),
        (0, slot, 0, 0, 0))
    state["cache_v"] = jax.lax.dynamic_update_slice(
        state["cache_v"], small_cache["v"].astype(state["cache_v"].dtype),
        (0, slot, 0, 0, 0))
    T = state["tokens"].shape[1]
    row_tok = jnp.zeros((T,), jnp.int32)
    row_tok = jax.lax.dynamic_update_slice(row_tok, ids_bucket[0], (0,))
    row_mask = (jnp.arange(T, dtype=jnp.int32) < prompt_len).astype(jnp.int32)
    state["tokens"] = state["tokens"].at[slot].set(row_tok)
    state["mask"] = state["mask"].at[slot].set(row_mask)
    state["lengths"] = state["lengths"].at[slot].set(prompt_len)
    state["prompt_len"] = state["prompt_len"].at[slot].set(prompt_len)
    state["limit"] = state["limit"].at[slot].set(max_total)
    state["active"] = state["active"].at[slot].set(1)

    # first generated token, fused into the same program
    if do_sample:
        rng, sub = jax.random.split(state["rng"])
        state["rng"] = rng
    else:
        sub = state["rng"]  # greedy ignores it; skip the split kernel
    tok = _choose(first_scores[None], do_sample, temperature, top_k, top_p,
                  sub)[0]
    B = state["tokens"].shape[0]
    keep = jnp.zeros((B,), jnp.int32).at[slot].set(1)
    toks = jnp.zeros((B,), jnp.int32).at[slot].set(tok)
    return _append_token(state, toks, keep, end_ids)


def _choose(scores, do_sample, temperature, top_k, top_p, rng):
    wrapper = build_wrapper_chain(do_sample, temperature, top_k, top_p)
    scores = wrapper(scores)
    if do_sample:
        return jax.random.categorical(rng, scores, axis=-1).astype(jnp.int32)
    return jnp.argmax(scores, axis=-1).astype(jnp.int32)


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
    "forward", "config", "n_steps", "do_sample", "temperature", "top_k",
    "top_p", "end_ids", "needs_positions"), donate_argnames=("state",))
def _decode_chunk(params, config, forward, state, n_steps, do_sample,
                  temperature, top_k, top_p, end_ids, needs_positions):
    """Advance every active slot by up to n_steps tokens (ragged offsets)."""
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
        if do_sample:
            rng, sub = jax.random.split(state["rng"])
            state["rng"] = rng
        else:
            sub = state["rng"]  # greedy ignores it; skip the split kernel
        tok = _choose(logits[:, -1, :].astype(jnp.float32), do_sample,
                      temperature, top_k, top_p, sub)
        return _append_token(state, tok, keep.astype(jnp.int32), end_ids)

    return jax.lax.fori_loop(0, n_steps, body, state)


class Request:
    __slots__ = ("rid", "prompt", "max_new_tokens")

    def __init__(self, rid, prompt, max_new_tokens):
        self.rid = rid
        self.prompt = prompt
        self.max_new_tokens = max_new_tokens


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
                 end_ids=None, rng=None, mesh=None):
        # mesh: serve a tensor-parallel-sharded model — pass params already
        # sharded (parallel.shard_params) and the mesh; the engine traces its
        # programs under it so the in-model shard_hints partition attention
        # heads / MLP columns over the 'model' axis (GSPMD inserts the ICI
        # collectives)
        self.mesh = mesh
        self.model = model
        self.config = model.config
        self.forward = model.forward_fn()
        self.max_slots = max_slots
        self.max_len = max_len
        self.prefill_buckets = tuple(sorted(prefill_buckets))
        self.chunk_size = chunk_size
        self.do_sample = do_sample
        self.temperature = float(temperature)
        self.top_k = top_k
        self.top_p = top_p
        if isinstance(end_ids, int):
            end_ids = [end_ids]
        self.end_ids = tuple(end_ids) if end_ids else ()

        # bf16/int8 inference cast, shared with generate() (engine.py)
        from cleantransformer_tpu.generation.engine import inference_params
        cdtype = getattr(self.config, "compute_dtype", jnp.float32)
        self.params = inference_params(model)

        cfg = self.config
        L = getattr(cfg, "n_layer", getattr(cfg, "num_hidden_layers", None))
        H = getattr(cfg, "n_head", getattr(cfg, "num_attention_heads", None))
        D = getattr(cfg, "n_embd", getattr(cfg, "hidden_size", None))
        hd = D // H
        # int8 configs stream bf16 activations — keep the cache bf16 too
        cache_dtype = jnp.bfloat16 if (
            getattr(self.config, "quantize_int8", False)
            and cdtype == jnp.float32) else cdtype
        B, T = max_slots, max_len
        self.state = {
            "tokens": jnp.zeros((B, T), jnp.int32),
            "mask": jnp.zeros((B, T), jnp.int32),
            "lengths": jnp.zeros((B,), jnp.int32),
            "prompt_len": jnp.zeros((B,), jnp.int32),
            "limit": jnp.zeros((B,), jnp.int32),
            "active": jnp.zeros((B,), jnp.int32),
            "cache_k": jnp.zeros((L, B, H, T, hd), cache_dtype),
            "cache_v": jnp.zeros((L, B, H, T, hd), cache_dtype),
            "rng": rng if rng is not None else jax.random.PRNGKey(0),
        }
        # GPT consumes positions; Bloom (ALiBi) ignores them
        self.needs_positions = hasattr(cfg, "n_positions")

        self.queue = deque()
        self.slot_rid = [None] * max_slots  # rid occupying each slot
        self._next_rid = 0
        self.finished = {}  # rid -> np token array
        self.streamers = {}  # rid -> callable(np generated-so-far)
        self.steps = 0

    # ------------------------------------------------------------------ API

    def submit(self, prompt_ids, max_new_tokens=64, streamer=None):
        """Queue a request. ``streamer``: optional callable invoked after
        every decode chunk with the tokens generated so far for this request
        (numpy 1-D, prompt excluded) — the serving analogue of the
        reference's per-generate streamer callbacks (bloom_interactive.py)."""
        prompt_ids = list(map(int, prompt_ids))
        if not prompt_ids:
            raise ValueError("empty prompt")
        if len(prompt_ids) > self.prefill_buckets[-1]:
            raise ValueError(
                f"prompt length {len(prompt_ids)} exceeds the largest prefill "
                f"bucket {self.prefill_buckets[-1]}")
        if len(prompt_ids) + max_new_tokens > self.max_len:
            raise ValueError("prompt + max_new_tokens exceeds max_len")
        rid = self._next_rid
        self._next_rid += 1
        if streamer is not None:
            self.streamers[rid] = streamer
        self.queue.append(Request(rid, prompt_ids, max_new_tokens))
        return rid

    def _bucket_for(self, n):
        for b in self.prefill_buckets:
            if n <= b:
                return b
        raise ValueError(n)

    def _admit(self, free_slots):
        """Prefill queued requests into free slots (one jit call each)."""
        while self.queue and free_slots:
            req = self.queue.popleft()
            slot = free_slots.pop()
            p = len(req.prompt)
            bucket = self._bucket_for(p)
            ids = np.zeros((1, bucket), np.int32)
            ids[0, :p] = req.prompt
            self.state = _prefill_slot(
                self.params, self.config, self.forward, self.state,
                jnp.asarray(ids), jnp.asarray(p, jnp.int32),
                jnp.asarray(p + req.max_new_tokens, jnp.int32),
                jnp.asarray(slot, jnp.int32), bucket=bucket,
                do_sample=self.do_sample, temperature=self.temperature,
                top_k=self.top_k, top_p=self.top_p, end_ids=self.end_ids)
            self.slot_rid[slot] = req.rid

    def step(self):
        """Admit what fits, run one decode chunk, harvest finished slots.
        Returns list of (rid, np tokens) finished this step."""
        import contextlib
        from cleantransformer_tpu.parallel.mesh import use_mesh
        ctx = use_mesh(self.mesh) if self.mesh is not None \
            else contextlib.nullcontext()
        with ctx:
            free = [i for i in range(self.max_slots) if self.slot_rid[i] is None]
            if free:
                self._admit(free)
            if any(r is not None for r in self.slot_rid):
                self.state = _decode_chunk(
                    self.params, self.config, self.forward, self.state,
                    n_steps=self.chunk_size, do_sample=self.do_sample,
                    temperature=self.temperature, top_k=self.top_k,
                    top_p=self.top_p, end_ids=self.end_ids,
                    needs_positions=self.needs_positions)
                self.steps += self.chunk_size
        # ONE host sync per chunk
        tokens, lengths, prompt_len, active = jax.device_get(
            (self.state["tokens"], self.state["lengths"],
             self.state["prompt_len"], self.state["active"]))
        out = []
        for slot, rid in enumerate(self.slot_rid):
            if rid is None:
                continue
            if rid in self.streamers:
                self.streamers[rid](
                    tokens[slot, prompt_len[slot]:lengths[slot]].copy())
            if active[slot] == 0:
                out.append((rid, tokens[slot, :lengths[slot]].copy()))
                self.finished[rid] = out[-1][1]
                self.slot_rid[slot] = None
                self.streamers.pop(rid, None)
        return out

    def run(self):
        """Generator: drive step() until queue and slots drain."""
        while self.queue or any(r is not None for r in self.slot_rid):
            yield from self.step()

    def utilization(self):
        return sum(r is not None for r in self.slot_rid) / self.max_slots
