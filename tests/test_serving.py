"""Continuous-batching serving engine: parity vs generate() and slot reuse.

The serving engine is a TPU-native extension beyond the reference (which
serves one batch per generate() call); correctness bar: every request's
greedy output must equal the standalone generate() greedy output for the
same prompt.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cleantransformer_tpu.config import BloomConfig, GPTConfig
from cleantransformer_tpu.models.bloom import BloomForCausalLM
from cleantransformer_tpu.models.gpt import GPTLMHeadModel
from cleantransformer_tpu.serving import ServingEngine

GPT_SHAPE = dict(vocab_size=97, n_embd=64, n_positions=128, n_layer=2,
                 n_head=4, n_ctx=128, embd_pdrop=0.0, attn_pdrop=0.0,
                 resid_pdrop=0.0)
BLOOM_SHAPE = dict(vocab_size=101, hidden_size=64, n_layer=2,
                   num_attention_heads=4)


pytestmark = pytest.mark.slow  # full tier; fast tier: -m 'not slow'

@pytest.fixture(scope="module")
def gpt():
    return GPTLMHeadModel(GPTConfig(**GPT_SHAPE), version="gpt2",
                          rng=jax.random.PRNGKey(11))


@pytest.fixture(scope="module")
def bloom():
    return BloomForCausalLM(BloomConfig(**BLOOM_SHAPE),
                            rng=jax.random.PRNGKey(12))


def ref_greedy(model, prompt, n_new, end_ids=None):
    """Standalone generate() greedy output truncated to prompt + n_new."""
    ids = jnp.asarray(np.asarray(prompt, np.int32)[None])
    out = model.generate(ids, generation_configs={
        "beam_size": 1, "max_gen_len": n_new, "do_sample": False,
        "end_ids": list(end_ids) if end_ids else None, "pad_id": 0})
    out = np.asarray(out)[0, 0]
    return out[: len(prompt) + n_new]


def _prompts(vocab, seed=0):
    rs = np.random.RandomState(seed)
    return [rs.randint(1, vocab, (n,)).tolist() for n in (3, 7, 12, 5, 9, 14)]


@pytest.mark.parametrize("model_fix", ["gpt", "bloom"])
def test_greedy_parity_vs_generate(model_fix, request):
    model = request.getfixturevalue(model_fix)
    vocab = model.config.vocab_size
    eng = ServingEngine(model, max_slots=2, max_len=64,
                        prefill_buckets=(16,), chunk_size=4)
    prompts = _prompts(vocab)
    n_new = 10
    rids = {eng.submit(p, max_new_tokens=n_new): p for p in prompts}
    results = dict(eng.run())
    assert set(results) == set(rids)
    for rid, prompt in rids.items():
        got = results[rid]
        want = ref_greedy(model, prompt, n_new)
        np.testing.assert_array_equal(got, want,
                                      err_msg=f"prompt={prompt}")


def test_end_ids_terminate_early(gpt):
    vocab = gpt.config.vocab_size
    prompts = _prompts(vocab, seed=3)[:3]
    # pick the end id as the first generated token of one prompt so at least
    # one request stops immediately
    probe = ref_greedy(gpt, prompts[0], 1)
    end_id = int(probe[len(prompts[0])])
    eng = ServingEngine(gpt, max_slots=2, max_len=64, prefill_buckets=(16,),
                        chunk_size=4, end_ids=[end_id])
    rids = {eng.submit(p, max_new_tokens=12): p for p in prompts}
    results = dict(eng.run())
    for rid, prompt in rids.items():
        got = results[rid]
        want = ref_greedy(gpt, prompt, 12, end_ids=[end_id])
        # generate() pads beyond the end token; serving stops at it
        stop = len(prompt)
        while stop < len(want) and (stop == len(prompt)
                                    or want[stop - 1] != end_id):
            stop += 1
        np.testing.assert_array_equal(got, want[: len(got)])
        if end_id in got[len(prompt):]:
            assert got[-1] == end_id  # stopped AT the end token

    # at least one of the requests must have early-stopped
    assert any(len(results[r]) < len(p) + 12 for r, p in rids.items())


def test_more_requests_than_slots_reuses_slots(bloom):
    vocab = bloom.config.vocab_size
    eng = ServingEngine(bloom, max_slots=2, max_len=48,
                        prefill_buckets=(16,), chunk_size=3)
    prompts = _prompts(vocab, seed=7)
    rids = {eng.submit(p, max_new_tokens=6): p for p in prompts}
    seen = []
    for rid, toks in eng.run():
        seen.append(rid)
        want = ref_greedy(bloom, rids[rid], 6)
        np.testing.assert_array_equal(toks, want)
    assert sorted(seen) == sorted(rids)
    # all slots free at the end
    assert eng.utilization() == 0.0


def test_sampling_smoke(gpt):
    eng = ServingEngine(gpt, max_slots=2, max_len=48, prefill_buckets=(16,),
                        chunk_size=4, do_sample=True, temperature=0.9,
                        top_k=5, rng=jax.random.PRNGKey(5))
    rid = eng.submit([1, 2, 3], max_new_tokens=8)
    results = dict(eng.run())
    assert len(results[rid]) == 3 + 8
    assert (np.asarray(results[rid]) < gpt.config.vocab_size).all()


def test_validation_errors(gpt):
    eng = ServingEngine(gpt, max_slots=1, max_len=32, prefill_buckets=(8,))
    with pytest.raises(ValueError):
        eng.submit([])
    with pytest.raises(ValueError):
        eng.submit([1, 2], max_new_tokens=64)  # exceeds max_len
    # buckets that can't fit inside max_len are dropped at construction
    eng2 = ServingEngine(gpt, max_slots=1, max_len=32,
                         prefill_buckets=(8, 64, 128))
    assert eng2.prefill_buckets == (8,)


def test_chunked_prefill_long_prompt_parity(gpt):
    """Prompts LONGER than the largest prefill bucket are admitted via
    bucket-sized chunks at rising cache offsets and still match generate()
    exactly (round-2 VERDICT item 9)."""
    vocab = gpt.config.vocab_size
    rs = np.random.RandomState(21)
    prompts = [rs.randint(1, vocab, (n,)).tolist() for n in (23, 37, 16, 5)]
    eng = ServingEngine(gpt, max_slots=2, max_len=64,
                        prefill_buckets=(8, 16), chunk_size=4)
    rids = {eng.submit(p, max_new_tokens=8): p for p in prompts}
    results = dict(eng.run())
    for rid, prompt in rids.items():
        want = ref_greedy(gpt, prompt, 8)
        np.testing.assert_array_equal(results[rid], want,
                                      err_msg=f"len={len(prompt)}")


def test_chunked_prefill_long_prompt_parity_bloom_flash(bloom):
    """Same with Bloom + flash attention on (offset-aware causal iota)."""
    from cleantransformer_tpu.config import BloomConfig
    cfg = BloomConfig(**BLOOM_SHAPE, use_flash_attention=True)
    model = BloomForCausalLM(cfg, params=bloom.params)
    vocab = cfg.vocab_size
    rs = np.random.RandomState(22)
    prompt = rs.randint(1, vocab, (29,)).tolist()
    eng = ServingEngine(model, max_slots=2, max_len=64,
                        prefill_buckets=(16,), chunk_size=4)
    rid = eng.submit(prompt, max_new_tokens=6)
    results = dict(eng.run())
    want = ref_greedy(bloom, prompt, 6)
    np.testing.assert_array_equal(results[rid], want)


def test_per_request_sampling_mixed_batch(gpt):
    """Greedy and sampling requests share the decode batch: sampling params
    are per-request (round-2 VERDICT item 9); greedy rows stay bit-exact vs
    generate() even while sampling rows are active."""
    vocab = gpt.config.vocab_size
    rs = np.random.RandomState(31)
    greedy_prompt = rs.randint(1, vocab, (6,)).tolist()
    sample_prompt = rs.randint(1, vocab, (5,)).tolist()
    eng = ServingEngine(gpt, max_slots=2, max_len=48, prefill_buckets=(16,),
                        chunk_size=4, rng=jax.random.PRNGKey(9))
    rid_g = eng.submit(greedy_prompt, max_new_tokens=10)  # engine default greedy
    rid_s = eng.submit(sample_prompt, max_new_tokens=10, do_sample=True,
                       temperature=0.7, top_k=8, top_p=0.9)
    results = dict(eng.run())
    want = ref_greedy(gpt, greedy_prompt, 10)
    np.testing.assert_array_equal(results[rid_g], want)
    out_s = results[rid_s]
    assert len(out_s) == 5 + 10
    assert (np.asarray(out_s) < vocab).all()
    # request-level overrides recorded
    assert eng._sampling_on


def test_tensor_parallel_serving_matches_unsharded(bloom):
    """Serve a TP-sharded model: same greedy outputs as the unsharded
    engine (GSPMD partitions heads/MLP over the 'model' mesh axis)."""
    from cleantransformer_tpu.parallel import (make_mesh, use_mesh,
                                               shard_params)
    vocab = bloom.config.vocab_size
    prompts = _prompts(vocab, seed=13)[:4]

    base = ServingEngine(bloom, max_slots=2, max_len=48,
                         prefill_buckets=(16,), chunk_size=4)
    rids_b = {base.submit(p, max_new_tokens=6): tuple(p) for p in prompts}
    want = {rids_b[rid]: toks for rid, toks in base.run()}

    mesh = make_mesh(data=2, model=4)
    with use_mesh(mesh):
        sharded = type(bloom)(bloom.config,
                              params=shard_params(bloom.params, mesh, "bloom"))
        eng = ServingEngine(sharded, max_slots=2, max_len=48,
                            prefill_buckets=(16,), chunk_size=4, mesh=mesh)
        rids = {eng.submit(p, max_new_tokens=6): tuple(p) for p in prompts}
        got = {rids[rid]: toks for rid, toks in eng.run()}
    assert set(got) == set(want)
    for key in want:
        np.testing.assert_array_equal(got[key], want[key])


def test_per_request_streamer(gpt):
    """Streamer callbacks fire once per chunk with the tokens generated so
    far (prompt excluded), and the final callback sees the full output."""
    seen = []
    eng = ServingEngine(gpt, max_slots=2, max_len=48, prefill_buckets=(16,),
                        chunk_size=3)
    prompt = [4, 8, 15]
    rid = eng.submit(prompt, max_new_tokens=7,
                     streamer=lambda toks: seen.append(toks.copy()))
    results = dict(eng.run())
    assert len(seen) >= 2  # 7 tokens / chunk 3 -> at least 3 chunks
    # monotone prefix growth
    for a, b in zip(seen, seen[1:]):
        assert len(b) >= len(a)
        np.testing.assert_array_equal(b[: len(a)], a)
    np.testing.assert_array_equal(seen[-1], results[rid][len(prompt):])
    assert rid not in eng.streamers  # cleaned up


def test_late_submission_while_chunks_in_flight(gpt):
    """Pipelined step(): a request submitted BETWEEN steps (while a decode
    chunk's results are still pending) must never be judged by the stale
    snapshot — it decodes exactly like a standalone generate()."""
    vocab = gpt.config.vocab_size
    eng = ServingEngine(gpt, max_slots=2, max_len=64, prefill_buckets=(16,),
                        chunk_size=4)
    p0 = _prompts(vocab, seed=11)[0]
    r0 = eng.submit(p0, max_new_tokens=12)
    done = {}
    done.update(eng.step())   # dispatches chunk 1, nothing harvested yet
    assert done == {}
    # late arrival: chunk 1's results handle is pending right now
    p1 = _prompts(vocab, seed=12)[1]
    r1 = eng.submit(p1, max_new_tokens=12)
    for _ in range(40):
        done.update(eng.step())
        if r0 in done and r1 in done:
            break
    assert set(done) == {r0, r1}
    np.testing.assert_array_equal(done[r0], ref_greedy(gpt, p0, 12))
    np.testing.assert_array_equal(done[r1], ref_greedy(gpt, p1, 12))


def test_dispatch_depth_matches_depth1(gpt):
    """max_dispatch_depth > 1 (several chunks enqueued per result fetch)
    must produce identical per-request outputs to depth 1, including with
    end-token early stops and slot reuse."""
    vocab = gpt.config.vocab_size
    prompts = _prompts(vocab, seed=31)
    probe = ref_greedy(gpt, prompts[0], 2)
    end_id = int(probe[len(prompts[0]) + 1])
    results = {}
    for depth, mode in ((1, "serial"), (4, "serial"), (4, "overlap")):
        eng = ServingEngine(gpt, max_slots=2, max_len=64,
                            prefill_buckets=(16,), chunk_size=4,
                            pipeline=mode, max_dispatch_depth=depth,
                            end_ids=[end_id])
        rids = {eng.submit(p, max_new_tokens=12): tuple(p) for p in prompts}
        results[(depth, mode)] = {rids[r]: tuple(t) for r, t in eng.run()}
    assert results[(1, "serial")] == results[(4, "serial")]
    assert results[(1, "serial")] == results[(4, "overlap")]
    assert len(results[(1, "serial")]) == len(prompts)


def test_admission_wave_is_one_program(gpt, monkeypatch):
    """Single-chunk admissions fuse into ONE `_prefill_batch` dispatch per
    wave (per-request dispatch overhead dominated serving wall time on
    remote tunnels); long prompts still take the chunked per-request path.
    Outputs stay bit-exact vs generate()."""
    import cleantransformer_tpu.serving.engine as eng_mod
    vocab = gpt.config.vocab_size
    calls = {"batch": 0, "chunk": 0}
    real_batch, real_chunk = eng_mod._prefill_batch, eng_mod._prefill_chunk

    def count_batch(*a, **k):
        calls["batch"] += 1
        return real_batch(*a, **k)

    def count_chunk(*a, **k):
        calls["chunk"] += 1
        return real_chunk(*a, **k)

    monkeypatch.setattr(eng_mod, "_prefill_batch", count_batch)
    monkeypatch.setattr(eng_mod, "_prefill_chunk", count_chunk)
    eng = ServingEngine(gpt, max_slots=4, max_len=64, prefill_buckets=(16,),
                        chunk_size=4)
    prompts = _prompts(vocab, seed=41)[:4]  # all fit the 16 bucket
    rids = {eng.submit(p, max_new_tokens=8): p for p in prompts}
    eng.step()  # one tick admits the whole wave
    assert calls == {"batch": 1, "chunk": 0}
    results = dict(eng.run())
    for rid, prompt in rids.items():
        np.testing.assert_array_equal(results[rid],
                                      ref_greedy(gpt, prompt, 8))
    # a long prompt (over the largest bucket) takes the chunked path
    long_prompt = np.random.RandomState(42).randint(
        1, vocab, (37,)).tolist()
    rid = eng.submit(long_prompt, max_new_tokens=6)
    results = dict(eng.run())
    assert calls["chunk"] == 3  # ceil(37/16) chunks
    np.testing.assert_array_equal(results[rid],
                                  ref_greedy(gpt, long_prompt, 6))


def test_pipeline_serial_matches_overlap(gpt):
    """Both pipeline schedules produce identical per-request outputs."""
    vocab = gpt.config.vocab_size
    prompts = _prompts(vocab, seed=21)
    results = {}
    for mode in ("overlap", "serial"):
        eng = ServingEngine(gpt, max_slots=2, max_len=64,
                            prefill_buckets=(16,), chunk_size=4,
                            pipeline=mode)
        rids = {eng.submit(p, max_new_tokens=8): tuple(p) for p in prompts}
        results[mode] = {rids[r]: tuple(t) for r, t in eng.run()}
    assert results["overlap"] == results["serial"]
    with pytest.raises(ValueError, match="pipeline"):
        ServingEngine(gpt, max_slots=2, max_len=64, pipeline="bogus")


@pytest.mark.parametrize("model_fix", ["gpt", "bloom"])
def test_fused_decode_serving_parity(model_fix, request):
    # config.fused_decode switches the serving cache to the (L, B, T, D)
    # layout and decode steps to the whole-stack Pallas kernel with RAGGED
    # per-row offsets (models/*.py fused intercepts) — every request must
    # still match the standalone fused generate() greedy output.
    base = request.getfixturevalue(model_fix)
    if model_fix == "gpt":
        model = GPTLMHeadModel(GPTConfig(**GPT_SHAPE, fused_decode=True),
                               version="gpt2", params=base.params)
    else:
        model = BloomForCausalLM(
            BloomConfig(**BLOOM_SHAPE, fused_decode=True), params=base.params)
    vocab = model.config.vocab_size
    eng = ServingEngine(model, max_slots=2, max_len=64,
                        prefill_buckets=(16,), chunk_size=4)
    prompts = _prompts(vocab)
    n_new = 10
    rids = {eng.submit(p, max_new_tokens=n_new): p for p in prompts}
    results = dict(eng.run())
    assert set(results) == set(rids)
    for rid, prompt in rids.items():
        np.testing.assert_array_equal(
            results[rid], ref_greedy(model, prompt, n_new),
            err_msg=f"prompt={prompt}")


def test_fused_serving_unaligned_max_len(gpt):
    # the fused cache is tile-padded to Tp = ceil8(max_len); token/mask
    # buffers stay (B, max_len). A non-multiple-of-8 max_len must not break
    # the admission programs (regression: _prefill_batch/_prefill_chunk took
    # the padded width from the cache and crashed broadcasting vs tokens).
    model = GPTLMHeadModel(GPTConfig(**GPT_SHAPE, fused_decode=True),
                           version="gpt2", params=gpt.params)
    eng = ServingEngine(model, max_slots=2, max_len=100,
                        prefill_buckets=(16,), chunk_size=4)
    assert eng.state["cache_k"].shape[2] == 104  # padded capacity
    assert eng.state["tokens"].shape[1] == 100
    prompts = _prompts(model.config.vocab_size)[:3] + [
        list(range(1, 20))]  # > bucket: chunked _prefill_chunk path
    n_new = 8
    rids = {eng.submit(p, max_new_tokens=n_new): p for p in prompts}
    results = dict(eng.run())
    for rid, prompt in rids.items():
        np.testing.assert_array_equal(
            results[rid], ref_greedy(model, prompt, n_new),
            err_msg=f"prompt={prompt}")


# ---------------------------------------------------------------------------
# prompt-lookup speculative serving (speculative="lookup")
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("variant", ["dense", "fused", "fused_int8"])
def test_lookup_speculative_serving_parity(gpt, variant):
    """speculative='lookup': decode chunks run propose/verify/commit ROUNDS
    (serving/engine._decode_chunk_lookup) instead of single-token steps —
    per-slot ngram proposals, ONE ragged (K+1)-token verify forward per
    round (the fused window kernel for fused_decode configs), per-row
    acceptance + limit clamping. Every request's greedy output must equal
    the standalone generate() stream, including slot reuse."""
    if variant == "dense":
        model = gpt
    else:
        model = GPTLMHeadModel(
            GPTConfig(**GPT_SHAPE, fused_decode=True,
                      kv_cache_int8=(variant == "fused_int8")),
            version="gpt2", params=gpt.params)
    vocab = model.config.vocab_size
    eng = ServingEngine(model, max_slots=2, max_len=64,
                        prefill_buckets=(16,), chunk_size=2,
                        speculative="lookup", draft_len=4)
    assert eng.buf_len == 64 + 5  # K+1 scatter margin past max_len
    prompts = _prompts(vocab, seed=51)
    n_new = 12
    rids = {eng.submit(p, max_new_tokens=n_new): p for p in prompts}
    results = dict(eng.run())
    assert set(results) == set(rids)
    for rid, prompt in rids.items():
        np.testing.assert_array_equal(
            results[rid], ref_greedy(model, prompt, n_new),
            err_msg=f"variant={variant} prompt={prompt}")
    assert eng.utilization() == 0.0


def test_lookup_speculative_serving_bloom_end_ids(bloom):
    """Bloom (ALiBi, no positions) lookup serving with end tokens: rows stop
    AT the end token exactly like the plain serving path."""
    vocab = bloom.config.vocab_size
    prompts = _prompts(vocab, seed=3)[:3]
    probe = ref_greedy(bloom, prompts[0], 1)
    end_id = int(probe[len(prompts[0])])
    eng = ServingEngine(bloom, max_slots=2, max_len=64, prefill_buckets=(16,),
                        chunk_size=2, end_ids=[end_id],
                        speculative="lookup", draft_len=4)
    rids = {eng.submit(p, max_new_tokens=12): p for p in prompts}
    results = dict(eng.run())
    for rid, prompt in rids.items():
        got = results[rid]
        want = ref_greedy(bloom, prompt, 12, end_ids=[end_id])
        np.testing.assert_array_equal(got, want[: len(got)])
        if end_id in got[len(prompt):]:
            assert got[-1] == end_id  # stopped AT the end token
    assert any(len(results[r]) < len(p) + 12 for r, p in rids.items())


def test_lookup_speculative_serving_accepts(gpt):
    """On a cycling continuation the lookup engine must commit MORE tokens
    than it spends verify rounds (the feature's whole point): find a prompt
    whose greedy stream repeats, then assert the round count stays well
    under the generated-token count."""
    vocab = gpt.config.vocab_size
    rs = np.random.RandomState(0)
    chosen = None
    for _ in range(20):
        prompt = rs.randint(1, vocab, (4,)).tolist()
        out = ref_greedy(gpt, prompt, 40)
        gen = out[len(prompt):]
        pairs = set(zip(gen[:-1], gen[1:]))
        if len(pairs) < len(gen) - 4:  # enough repeated bigrams
            chosen = prompt
            break
    assert chosen is not None, "no cycling prompt found (model too varied)"
    eng = ServingEngine(gpt, max_slots=1, max_len=64, prefill_buckets=(16,),
                        chunk_size=1, pipeline="serial",
                        speculative="lookup", draft_len=8)
    rid = eng.submit(chosen, max_new_tokens=40)
    results = dict(eng.run())
    np.testing.assert_array_equal(results[rid], ref_greedy(gpt, chosen, 40))
    # eng.steps counts dispatched ROUNDS in lookup mode; plain decode would
    # need 40 — acceptance must beat that with clear margin
    assert eng.steps < 30, eng.steps


def test_lookup_speculative_depth_matches_depth1(gpt):
    """max_dispatch_depth > 1 in lookup mode: the tokens-per-round EMA
    scales the adaptive depth (a 1-token-per-step estimate would enqueue
    ~K+1x the needed verify rounds) — outputs must stay identical to
    depth 1, across slot reuse and end-token early stops."""
    vocab = gpt.config.vocab_size
    prompts = _prompts(vocab, seed=31)
    probe = ref_greedy(gpt, prompts[0], 2)
    end_id = int(probe[len(prompts[0]) + 1])
    results = {}
    for depth in (1, 4):
        eng = ServingEngine(gpt, max_slots=2, max_len=64,
                            prefill_buckets=(16,), chunk_size=2,
                            pipeline="serial", max_dispatch_depth=depth,
                            end_ids=[end_id], speculative="lookup",
                            draft_len=4)
        rids = {eng.submit(p, max_new_tokens=12): tuple(p) for p in prompts}
        results[depth] = {rids[r]: tuple(t) for r, t in eng.run()}
    assert results[1] == results[4]
    assert len(results[1]) == len(prompts)


def test_lookup_speculative_rejects_unknown_mode(gpt):
    with pytest.raises(ValueError, match="speculative"):
        ServingEngine(gpt, max_slots=1, max_len=32, speculative="bogus")


def test_lookup_sampling_topk1_equals_greedy(gpt):
    """Sampling speculative serving, greedy limit: top_k=1 collapses the
    processed distribution to a point mass, so the rejection-sampling path
    (accept w.p. p(c), residual draw on reject) must reproduce the greedy
    stream exactly — covering the sampling program variant end to end,
    mixed with a plain-greedy row in the same engine."""
    vocab = gpt.config.vocab_size
    prompts = _prompts(vocab, seed=77)[:4]
    eng = ServingEngine(gpt, max_slots=2, max_len=64, prefill_buckets=(16,),
                        chunk_size=2, speculative="lookup", draft_len=4)
    rids = {}
    for i, p in enumerate(prompts):
        # alternate: even rows sample with top_k=1 (== greedy), odd rows
        # plain greedy — both through the sampling program variant
        rids[eng.submit(p, max_new_tokens=10, do_sample=(i % 2 == 0),
                        top_k=1, temperature=0.7)] = p
    results = dict(eng.run())
    for rid, prompt in rids.items():
        np.testing.assert_array_equal(
            results[rid], ref_greedy(gpt, prompt, 10),
            err_msg=f"prompt={prompt}")


def test_lookup_auto_fallback_parity_and_reprobe(gpt):
    """AUTO-FALLBACK: when the tokens-per-round EMA drops below
    lookup_round_cost (a verify round's measured price in plain decode
    steps), dispatch waves revert to PLAIN decode chunks, with one depth-1
    lookup wave every lookup_reprobe_every fallback waves re-probing the
    workload. Forced here with an impossibly high round cost so the FIRST
    post-EMA wave falls back regardless of traffic: outputs must stay
    bit-identical to generate() (plain chunks run on the lookup engine's
    wider buffers/state), plain chunks must actually run, and re-probe
    lookup waves must keep firing."""
    vocab = gpt.config.vocab_size
    prompts = _prompts(vocab, seed=77)
    eng = ServingEngine(gpt, max_slots=2, max_len=64, prefill_buckets=(16,),
                        chunk_size=2, speculative="lookup", draft_len=4,
                        lookup_round_cost=1e9, lookup_reprobe_every=2)
    rids = {eng.submit(p, max_new_tokens=12): p for p in prompts}
    results = dict(eng.run())
    assert set(results) == set(rids)
    for rid, prompt in rids.items():
        np.testing.assert_array_equal(
            results[rid], ref_greedy(gpt, prompt, 12),
            err_msg=f"prompt={prompt}")
    assert eng._psteps > 0, "fallback never engaged"
    assert eng._lrounds > 0, "re-probe lookup waves never fired"
    assert eng.utilization() == 0.0


def test_lookup_auto_fallback_zero_cost_stays_lookup(gpt):
    """lookup_round_cost=0 disables fallback (the EMA can never go below
    it): every dispatched chunk must be a lookup round and the stream must
    match generate() — pins the pure-lookup path through the new wave
    bookkeeping (_lrounds/_psteps/_counts_at)."""
    vocab = gpt.config.vocab_size
    prompts = _prompts(vocab, seed=51)[:3]
    eng = ServingEngine(gpt, max_slots=2, max_len=64, prefill_buckets=(16,),
                        chunk_size=2, speculative="lookup", draft_len=4,
                        lookup_round_cost=0.0)
    rids = {eng.submit(p, max_new_tokens=12): p for p in prompts}
    results = dict(eng.run())
    for rid, prompt in rids.items():
        np.testing.assert_array_equal(
            results[rid], ref_greedy(gpt, prompt, 12),
            err_msg=f"prompt={prompt}")
    assert eng._psteps == 0
    assert eng._lrounds == eng.steps


def test_lookup_auto_fallback_sampling_topk1(gpt):
    """Fallback waves under SAMPLING: plain chunks use the per-row
    categorical sampler, lookup waves the rejection sampler — at top_k=1
    both collapse to greedy, so a forced-fallback engine mixing the two
    must still reproduce the greedy stream exactly."""
    vocab = gpt.config.vocab_size
    prompts = _prompts(vocab, seed=77)[:4]
    eng = ServingEngine(gpt, max_slots=2, max_len=64, prefill_buckets=(16,),
                        chunk_size=2, speculative="lookup", draft_len=4,
                        lookup_round_cost=1e9, lookup_reprobe_every=2)
    rids = {eng.submit(p, max_new_tokens=10, do_sample=(i % 2 == 0),
                       top_k=1, temperature=0.7): p
            for i, p in enumerate(prompts)}
    results = dict(eng.run())
    for rid, prompt in rids.items():
        np.testing.assert_array_equal(
            results[rid], ref_greedy(gpt, prompt, 10),
            err_msg=f"prompt={prompt}")
    assert eng._psteps > 0


def test_verify_commit_distribution():
    """_verify_commit marginal exactness: over many iid rows with identical
    logits and (deliberately imperfect) point-mass proposals, the FIRST
    committed token (proposal if accepted, else the residual draw) must be
    distributed as the processed target distribution p_0 — the
    speculative-sampling identity the serving commit relies on."""
    from cleantransformer_tpu.serving.engine import (_process_scores,
                                                     _verify_commit)
    B, K, V = 4096, 3, 7
    rs = np.random.RandomState(3)
    logits_row = rs.randn(K + 1, V).astype(np.float32) * 1.5
    logits = jnp.asarray(np.broadcast_to(logits_row, (B, K + 1, V)).copy())
    proposed = jnp.asarray(
        np.broadcast_to(rs.randint(0, V, (K,)), (B, K)).copy())
    temp = jnp.full((B,), 0.9, jnp.float32)
    top_k = jnp.zeros((B,), jnp.int32)
    top_p = jnp.full((B,), 0.95, jnp.float32)
    a, corr = jax.jit(_verify_commit, static_argnames=("sampling",))(
        logits, proposed, jnp.ones((B,), jnp.int32), temp, top_k, top_p,
        jax.random.PRNGKey(5), sampling=True)
    a, corr = np.asarray(a), np.asarray(corr)
    first = np.where(a >= 1, int(proposed[0, 0]), corr)
    counts = np.bincount(first, minlength=V) / B
    p0 = np.asarray(jax.nn.softmax(_process_scores(
        jnp.asarray(logits_row[:1]), temp[:1], top_k[:1], top_p[:1])))[0]
    tv = 0.5 * np.abs(counts - p0).sum()
    assert tv < 0.03, (tv, counts, p0)
    # greedy rows through the same call: bit-exact argmax commits
    a_g, corr_g = jax.jit(_verify_commit, static_argnames=("sampling",))(
        logits, proposed, jnp.zeros((B,), jnp.int32), temp, top_k, top_p,
        jax.random.PRNGKey(5), sampling=True)
    g = np.argmax(logits_row, axis=-1)
    match = np.cumprod(g[:K] == np.asarray(proposed[0]))
    a_want = int(match.sum())
    assert np.all(np.asarray(a_g) == a_want)
    assert np.all(np.asarray(corr_g) == g[a_want])


# ---------------------------------------------------------------------------
# prefix caching (register_prefix)
# ---------------------------------------------------------------------------

def _prefix_workload(vocab, seed=5, plen=40):
    """A registered prefix longer than the bucket (chunked registration),
    full-prefix prompts, a partial-prefix prompt (diverges past the first
    bucket), and a non-matching prompt."""
    rs = np.random.RandomState(seed)
    prefix = rs.randint(1, vocab, (plen,)).tolist()
    prompts = [prefix + rs.randint(1, vocab, (n,)).tolist()
               for n in (3, 9, 21)]
    d = plen - plen // 4  # divergence point, past the 16-token bucket
    div = (prefix[d] % (vocab - 2)) + 1  # != prefix[d], stays in vocab
    prompts.append(prefix[:d] + [div] + rs.randint(1, vocab, (3,)).tolist())
    prompts.append(rs.randint(1, vocab, (12,)).tolist())
    return prefix, prompts


@pytest.mark.parametrize("variant", ["dense", "fused", "fused_int8"])
def test_prefix_cache_parity(gpt, variant):
    """register_prefix: admission seeds the slot from the precomputed KV
    store (one dynamic_update_slice program, no forward) and chunk-prefills
    only the suffix at cache_off=matched_len. Greedy outputs must equal the
    standalone generate() stream for full matches, a PARTIAL prefix match
    (longest-common-prefix reuse), and non-matching prompts — and the
    prefixed engine must dispatch fewer prefill programs than a no-prefix
    engine on the identical workload."""
    if variant == "dense":
        model = gpt
    else:
        model = GPTLMHeadModel(
            GPTConfig(**GPT_SHAPE, fused_decode=True,
                      kv_cache_int8=(variant == "fused_int8")),
            version="gpt2", params=gpt.params)
    vocab = model.config.vocab_size
    prefix, prompts = _prefix_workload(vocab)
    n_new = 8
    counts = {}
    for use in (False, True):
        eng = ServingEngine(model, max_slots=2, max_len=96,
                            prefill_buckets=(16,), chunk_size=2)
        if use:
            eng.register_prefix(prefix)
        pc0 = eng.prefill_calls  # registration's own programs excluded
        rids = {eng.submit(p, max_new_tokens=n_new, use_prefix=use): p
                for p in prompts}
        results = dict(eng.run())
        counts[use] = eng.prefill_calls - pc0
        assert set(results) == set(rids)
        for rid, prompt in rids.items():
            np.testing.assert_array_equal(
                results[rid], ref_greedy(model, prompt, n_new),
                err_msg=f"variant={variant} use_prefix={use} "
                        f"prompt_len={len(prompt)}")
    assert counts[True] < counts[False], counts


def test_prefix_cache_bloom_and_lookup_compose(bloom):
    """Prefix caching on Bloom (ALiBi, no positions) COMPOSED with lookup
    speculative serving: prefix-seeded slots feed the verify rounds' ngram
    proposals from the same committed token rows."""
    vocab = bloom.config.vocab_size
    prefix, prompts = _prefix_workload(vocab, seed=9, plen=24)
    eng = ServingEngine(bloom, max_slots=2, max_len=96, prefill_buckets=(16,),
                        chunk_size=2, speculative="lookup", draft_len=4)
    eng.register_prefix(prefix)
    rids = {eng.submit(p, max_new_tokens=8): p for p in prompts}
    results = dict(eng.run())
    for rid, prompt in rids.items():
        np.testing.assert_array_equal(
            results[rid], ref_greedy(bloom, prompt, 8),
            err_msg=f"prompt_len={len(prompt)}")


def test_prefix_wave_single_dispatch(gpt):
    """Requests sharing one prefix with bucket-sized suffixes admit as ONE
    _prefill_batch_prefixed program per wave (the broadcast-seeded batched
    path), not per-request load+chunk pairs."""
    vocab = gpt.config.vocab_size
    rs = np.random.RandomState(13)
    prefix = rs.randint(1, vocab, (40,)).tolist()
    prompts = [prefix + rs.randint(1, vocab, (5,)).tolist() for _ in range(4)]
    eng = ServingEngine(gpt, max_slots=4, max_len=96, prefill_buckets=(16,),
                        chunk_size=4)
    eng.register_prefix(prefix)
    pc0 = eng.prefill_calls
    rids = {eng.submit(p, max_new_tokens=6): p for p in prompts}
    results = dict(eng.run())
    assert eng.prefill_calls - pc0 == 1  # one admission wave, one program
    for rid, prompt in rids.items():
        np.testing.assert_array_equal(results[rid],
                                      ref_greedy(gpt, prompt, 6))


def test_chunked_admission_near_capacity_unaligned(gpt):
    """Chunked prefill whose final bucket would overrun an unaligned
    buffer: the model's chunk write is a clamping dynamic_update_slice, so
    the engine shifts the final chunk back (overlap recompute is exact).
    Before the guard, max_len=60 with a 55-token prompt wrote the last
    16-token bucket at offset 48 into a 60-wide buffer — the clamp shifted
    it to 44, corrupting rows 44..48."""
    vocab = gpt.config.vocab_size
    rs = np.random.RandomState(21)
    prompt = rs.randint(1, vocab, (55,)).tolist()
    eng = ServingEngine(gpt, max_slots=1, max_len=60, prefill_buckets=(16,),
                        chunk_size=2)
    rid = eng.submit(prompt, max_new_tokens=4)
    results = dict(eng.run())
    np.testing.assert_array_equal(results[rid], ref_greedy(gpt, prompt, 4))


def test_prefix_cache_validation(gpt):
    eng = ServingEngine(gpt, max_slots=1, max_len=32, prefill_buckets=(8,))
    with pytest.raises(ValueError, match="empty"):
        eng.register_prefix([])
    with pytest.raises(ValueError, match="max_len"):
        eng.register_prefix(list(range(1, 33)))


def test_prefix_cache_unregister(gpt):
    """Unregistered prefixes free their store; queued matches are dropped
    and those requests full-prefill normally with identical output."""
    vocab = gpt.config.vocab_size
    rs = np.random.RandomState(41)
    prefix = rs.randint(1, vocab, (20,)).tolist()
    prompt = prefix + rs.randint(1, vocab, (4,)).tolist()
    eng = ServingEngine(gpt, max_slots=1, max_len=64, prefill_buckets=(16,),
                        chunk_size=2)
    h = eng.register_prefix(prefix)
    rid = eng.submit(prompt, max_new_tokens=6)  # matched while registered
    eng.unregister_prefix(h)                    # dropped before admission
    assert not eng._prefixes and not eng._prefix_of
    with pytest.raises(KeyError, match="prefix handle"):
        eng.unregister_prefix(h)  # double-unregister: clear error, no trace
    results = dict(eng.run())
    np.testing.assert_array_equal(results[rid], ref_greedy(gpt, prompt, 6))


def test_window_for_covers_frontier():
    """Every (off, bucket, cap) with off + bucket <= cap must yield a window
    with off + bucket <= window <= cap — the model's chunk write is a
    clamping dynamic_update_slice, so an under-sized window would shift the
    write backward over committed rows."""
    from cleantransformer_tpu.serving.engine import _window_for
    for cap in (24, 64, 120, 1024):
        for bucket in (8, 16, 64):
            for off in range(0, cap - bucket + 1, 4):
                w = _window_for(off, bucket, cap)
                assert off + bucket <= w <= cap, (off, bucket, cap, w)


def test_fused_int8_kv_serving_parity(gpt):
    # fused_decode + kv_cache_int8: serving decodes through the kernel's
    # in-kernel dequant path ({"q","s"} planes, ragged offsets) and must
    # match the standalone fused-int8 generate() stream.
    model = GPTLMHeadModel(
        GPTConfig(**GPT_SHAPE, fused_decode=True, kv_cache_int8=True),
        version="gpt2", params=gpt.params)
    eng = ServingEngine(model, max_slots=2, max_len=64,
                        prefill_buckets=(16,), chunk_size=4)
    prompts = _prompts(model.config.vocab_size)
    n_new = 10
    rids = {eng.submit(p, max_new_tokens=n_new): p for p in prompts}
    results = dict(eng.run())
    for rid, prompt in rids.items():
        np.testing.assert_array_equal(
            results[rid], ref_greedy(model, prompt, n_new),
            err_msg=f"prompt={prompt}")


def test_warmup_compiles_clean_and_serves_identically(gpt):
    """warmup() must leave the engine in a virgin-traffic state (EMA, wave
    counters, fetch/step counts restored) while having exercised the
    prefill, the configured chunk, AND — on a fallback-enabled speculative
    engine — the plain chunk a fallback wave dispatches. Outputs after
    warmup must be bit-identical to an un-warmed engine's (and to
    generate()); the fallback engine must still engage plain waves."""
    vocab = gpt.config.vocab_size
    prompts = _prompts(vocab, seed=31)

    def build():
        return ServingEngine(gpt, max_slots=2, max_len=64,
                             prefill_buckets=(16,), chunk_size=2,
                             speculative="lookup", draft_len=4,
                             lookup_round_cost=1e9, lookup_reprobe_every=2)

    warm = build()
    warm.warmup()
    assert warm._psteps == 0 and warm._lrounds == 0 and warm.steps == 0
    assert warm.fetches == 0 and warm._counts_at == {}
    assert warm._tpr == build()._tpr    # EMA restored to the virgin prior
    assert warm._tpr_seeded is False    # first REAL sample still replaces
    assert warm.speculative == "lookup"

    rids = {warm.submit(p, max_new_tokens=12): p for p in prompts}
    results = dict(warm.run())
    for rid, prompt in rids.items():
        np.testing.assert_array_equal(
            results[rid], ref_greedy(gpt, prompt, 12),
            err_msg=f"prompt={prompt}")
    assert warm._psteps > 0, "fallback never engaged after warmup"

    # plain engine warmup: same restore contract
    plain = ServingEngine(gpt, max_slots=2, max_len=64,
                          prefill_buckets=(16,), chunk_size=4)
    plain.warmup()
    assert plain.steps == 0 and plain.fetches == 0
    rids = {plain.submit(p, max_new_tokens=8): p for p in prompts[:3]}
    results = dict(plain.run())
    for rid, prompt in rids.items():
        np.testing.assert_array_equal(results[rid],
                                      ref_greedy(gpt, prompt, 8))
