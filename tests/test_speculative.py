"""Speculative decoding: bit-exact equality with the target's plain greedy
decode, for arbitrary (even adversarially bad) draft models."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cleantransformer_tpu.config import BloomConfig, GPTConfig
from cleantransformer_tpu.models.bloom import BloomForCausalLM
from cleantransformer_tpu.models.gpt import GPTLMHeadModel
from cleantransformer_tpu.generation.speculative import speculative_generate

GPT_T = dict(vocab_size=211, n_embd=64, n_positions=256, n_layer=3, n_head=4,
             n_ctx=256, embd_pdrop=0.0, attn_pdrop=0.0, resid_pdrop=0.0)
GPT_D = dict(GPT_T, n_layer=1)


pytestmark = pytest.mark.slow  # full tier; fast tier: -m 'not slow'

@pytest.fixture(scope="module")
def gpt_pair():
    target = GPTLMHeadModel(GPTConfig(**GPT_T), version="gpt2",
                            rng=jax.random.PRNGKey(21))
    draft = GPTLMHeadModel(GPTConfig(**GPT_D), version="gpt2",
                           rng=jax.random.PRNGKey(22))
    return target, draft


def plain_greedy(model, prompt, max_gen_len, end_ids=None):
    out = model.generate(jnp.asarray(np.asarray(prompt, np.int32)[None]),
                         generation_configs={
                             "beam_size": 1, "max_gen_len": max_gen_len,
                             "do_sample": False, "pad_id": 0,
                             "end_ids": list(end_ids) if end_ids else None})
    return np.asarray(out)[0, 0]


@pytest.mark.parametrize("K", [1, 3, 5])
def test_gpt_bit_exact_vs_greedy(gpt_pair, K):
    target, draft = gpt_pair
    rs = np.random.RandomState(K)
    for plen in (1, 4, 9):
        prompt = rs.randint(1, 211, (plen,)).tolist()
        want = plain_greedy(target, prompt, 16)
        got = speculative_generate(
            target, draft, np.asarray(prompt, np.int32)[None],
            generation_configs={"max_gen_len": 16}, draft_len=K)[0, 0]
        np.testing.assert_array_equal(got, want, err_msg=f"K={K} plen={plen}")


def test_self_draft_full_acceptance(gpt_pair):
    """Draft == target: every proposal accepted, output still exact."""
    target, _ = gpt_pair
    prompt = [5, 17, 42]
    want = plain_greedy(target, prompt, 12)
    got = speculative_generate(
        target, target, np.asarray(prompt, np.int32)[None],
        generation_configs={"max_gen_len": 12}, draft_len=4)[0, 0]
    np.testing.assert_array_equal(got, want)


def test_end_ids_stop(gpt_pair):
    target, draft = gpt_pair
    prompt = [3, 7, 11, 2]
    probe = plain_greedy(target, prompt, 12)
    end_id = int(probe[len(prompt) + 2])  # force a mid-stream stop
    want = plain_greedy(target, prompt, 12, end_ids=[end_id])
    got = speculative_generate(
        target, draft, np.asarray(prompt, np.int32)[None],
        generation_configs={"max_gen_len": 12, "end_ids": [end_id]},
        draft_len=3)[0, 0]
    # the reference keeps padding rows after the end token in batch mode; at
    # batch 1 it stops right after appending it — compare up to that point
    np.testing.assert_array_equal(got, want[: len(got)])
    assert end_id in got[len(prompt):]
    assert got[-1] == end_id


def test_bloom_bit_exact(gpt_pair):
    target = BloomForCausalLM(
        BloomConfig(vocab_size=131, hidden_size=64, n_layer=3,
                    num_attention_heads=4), rng=jax.random.PRNGKey(31))
    draft = BloomForCausalLM(
        BloomConfig(vocab_size=131, hidden_size=32, n_layer=1,
                    num_attention_heads=4), rng=jax.random.PRNGKey(32))
    rs = np.random.RandomState(0)
    prompt = rs.randint(1, 131, (6,)).tolist()
    want = plain_greedy(target, prompt, 14)
    got = speculative_generate(
        target, draft, np.asarray(prompt, np.int32)[None],
        generation_configs={"max_gen_len": 14}, draft_len=4)[0, 0]
    np.testing.assert_array_equal(got, want)


def test_flash_attention_bit_exact(gpt_pair):
    """use_flash_attention on target+draft: the kernel's q_offset causal iota
    makes the verify/catch-up windows at nonzero cache offsets exact, so the
    committed stream stays bit-identical to plain greedy (VERDICT r1 item 5)."""
    target = GPTLMHeadModel(GPTConfig(**GPT_T, use_flash_attention=True),
                            version="gpt2", rng=jax.random.PRNGKey(21))
    draft = GPTLMHeadModel(GPTConfig(**GPT_D, use_flash_attention=True),
                           version="gpt2", rng=jax.random.PRNGKey(22))
    # plain greedy from the *same weights without flash* is the oracle
    want_model, _ = gpt_pair
    prompt = [9, 30, 77, 5]
    want = plain_greedy(want_model, prompt, 14)
    got = speculative_generate(
        target, draft, np.asarray(prompt, np.int32)[None],
        generation_configs={"max_gen_len": 14}, draft_len=4)[0, 0]
    np.testing.assert_array_equal(got, want)


def test_rejects_unsupported_configs(gpt_pair):
    target, draft = gpt_pair
    ids = np.asarray([[1, 2, 3]], np.int32)
    with pytest.raises(AssertionError):
        speculative_generate(target, draft, ids,
                             generation_configs={"beam_size": 2})
    with pytest.raises(AssertionError):
        speculative_generate(target, draft, ids,
                             generation_configs={"no_repeat_ngram_size": 3})


def test_sampling_selfdraft_runs_and_commits(gpt_pair):
    """Rejection sampling with draft == target: p == q, so every proposal is
    accepted (acceptance probability exactly 1) and each round commits
    K + 1 tokens."""
    target, _ = gpt_pair
    prompt = [5, 17, 42]
    max_gen_len = 38
    out, stats = speculative_generate(
        target, target, np.asarray(prompt, np.int32)[None],
        generation_configs={"max_gen_len": max_gen_len, "do_sample": True,
                            "temperature": 1.0, "top_k": 0, "top_p": 1.0},
        draft_len=4, return_stats=True, rng=jax.random.PRNGKey(7))
    assert out.shape[-1] >= len(prompt) + max_gen_len
    # full acceptance commits K+1 = 5 per round; the final round is clipped
    # by total_len, so the exact ceiling is gen/ceil(gen/5) = 40/8 = 5
    assert stats["tokens_per_round"] > 4.5


def test_sampling_matches_target_distribution(gpt_pair):
    """The first sampled token's empirical distribution matches the plain
    target sampler's processed distribution (rejection sampling is
    distributionally exact)."""
    import jax.numpy as jnp
    target, draft = gpt_pair
    prompt = np.asarray([[3, 11, 29]], np.int32)

    # target's processed next-token distribution (temperature 1, no filters)
    from cleantransformer_tpu.models.gpt import gpt_lm_forward
    from cleantransformer_tpu.generation.engine import inference_params
    (logits, _), _ = gpt_lm_forward(inference_params(target), target.config,
                                    jnp.asarray(prompt),
                                    jnp.ones_like(jnp.asarray(prompt)),
                                    version="gpt2", last_only=True)
    p = np.asarray(jax.nn.softmax(logits[0, -1].astype(jnp.float32)))

    N = 600
    firsts = np.zeros(N, np.int64)
    for i in range(N):
        out = speculative_generate(
            target, draft, prompt,
            generation_configs={"max_gen_len": 1, "do_sample": True,
                                "temperature": 1.0, "top_k": 0, "top_p": 1.0},
            draft_len=2, rng=jax.random.PRNGKey(i))
        firsts[i] = out[0, 0, prompt.shape[1]]
    emp = np.bincount(firsts, minlength=p.shape[0]) / N
    tv = 0.5 * np.abs(emp - p).sum()
    # TV distance of a 600-sample empirical distribution over ~200 tokens;
    # sampling noise alone contributes ~sqrt(V/(2*pi*N)) ~ 0.19 here, a
    # WRONG distribution (e.g. the draft's, 1 layer vs 3) lands far higher
    assert tv < 0.35, tv


def test_sampling_greedy_limit(gpt_pair):
    """temperature -> 0 sampling equals greedy speculative decoding.

    temperature_wrap clamps at 0.01 (reference parity), so positions whose
    top-2 logit gap is below ~0.01 remain genuine coin flips even at
    temperature 1e-7. This prompt's trajectory has robust gaps (verified
    across seeds 0-2) AND rejection rounds (tokens_per_round < K+1), so it
    exercises the accept/reject/correction path, not just full acceptance."""
    target, draft = gpt_pair
    prompt = np.asarray([[196, 104, 10, 22, 37]], np.int32)
    want = speculative_generate(target, draft, prompt,
                                generation_configs={"max_gen_len": 12},
                                draft_len=3)[0, 0]
    got, stats = speculative_generate(
        target, draft, prompt,
        generation_configs={"max_gen_len": 12, "do_sample": True,
                            "temperature": 1e-7, "top_k": 0, "top_p": 1.0},
        draft_len=3, rng=jax.random.PRNGKey(0), return_stats=True)
    np.testing.assert_array_equal(got[0, 0], want)
    assert stats["tokens_per_round"] < 3.9  # rejections actually occurred


def test_generate_draft_model_dispatch(gpt_pair):
    """model.generate(draft_model=...) routes to speculative decoding."""
    target, draft = gpt_pair
    ids = np.asarray([[4, 9, 2, 7]], np.int32)
    want = np.asarray(target.generate(jnp.asarray(ids), generation_configs={
        "beam_size": 1, "max_gen_len": 10, "do_sample": False, "pad_id": 0}))
    got = np.asarray(target.generate(jnp.asarray(ids),
                                     generation_configs={"max_gen_len": 10,
                                                         "do_sample": False},
                                     draft_model=draft, draft_len=3))
    np.testing.assert_array_equal(got[0, 0], want[0, 0])


def test_generate_draft_model_default_is_sampling(gpt_pair):
    """generate() defaults to do_sample=True (reference parity); adding
    draft_model must NOT silently flip to greedy — the dispatch resolves the
    default before handing off, so different rngs give different streams."""
    target, draft = gpt_pair
    ids = np.asarray([[4, 9, 2, 7]], np.int32)
    outs = [np.asarray(target.generate(
        jnp.asarray(ids), generation_configs={"max_gen_len": 20},
        draft_model=draft, draft_len=3, rng=jax.random.PRNGKey(s)))[0, 0]
        for s in (0, 1, 2)]
    assert any(not np.array_equal(outs[0][:24], o[:24]) for o in outs[1:])


# ---------------------------------------------------------------------------
# prompt-lookup (draft-free ngram) speculation
# ---------------------------------------------------------------------------

from cleantransformer_tpu.generation.speculative import prompt_lookup_generate


@pytest.mark.parametrize("K", [2, 4, 8])
def test_prompt_lookup_bit_exact_vs_greedy(gpt_pair, K):
    """Greedy exactness holds for ANY proposal source — incl. ngram lookup
    on arbitrary prompts where acceptance is ~0."""
    target, _ = gpt_pair
    rs = np.random.RandomState(K)
    for plen in (2, 5, 12):
        prompt = rs.randint(1, 211, (plen,)).tolist()
        want = plain_greedy(target, prompt, 16)
        got = prompt_lookup_generate(
            target, np.asarray(prompt, np.int32)[None],
            generation_configs={"max_gen_len": 16, "do_sample": False},
            draft_len=K)[0, 0]
        np.testing.assert_array_equal(got, want, err_msg=f"K={K} plen={plen}")


def test_prompt_lookup_accepts_on_repetitive_continuation(gpt_pair):
    """When plain greedy falls into a repetition cycle (typical for these
    random-weight models), ngram lookup must commit >1 token per round —
    the feature's whole point. We FIND such a prompt by probing greedy
    outputs, then assert acceptance and exactness."""
    target, _ = gpt_pair
    rs = np.random.RandomState(0)
    chosen = None
    for _ in range(20):
        prompt = rs.randint(1, 211, (4,)).tolist()
        out = plain_greedy(target, prompt, 40)
        gen = out[len(prompt):]
        # repetition: some token appears following the same predecessor twice
        pairs = set(zip(gen[:-1], gen[1:]))
        if len(pairs) < len(gen) - 4:  # enough repeated bigrams
            chosen = prompt
            break
    assert chosen is not None, "no cycling prompt found (model too varied)"
    want = plain_greedy(target, chosen, 40)
    got, stats = prompt_lookup_generate(
        target, np.asarray(chosen, np.int32)[None],
        generation_configs={"max_gen_len": 40, "do_sample": False},
        draft_len=8, return_stats=True)
    np.testing.assert_array_equal(got[0, 0], want)
    assert stats["tokens_per_round"] > 1.5, stats


def test_prompt_lookup_end_ids(gpt_pair):
    target, _ = gpt_pair
    prompt = [7, 3, 7, 3]
    ref = plain_greedy(target, prompt, 20)
    end = int(ref[len(prompt) + 3])  # some token greedy emits
    want = plain_greedy(target, prompt, 20, end_ids=[end])
    got = prompt_lookup_generate(
        target, np.asarray(prompt, np.int32)[None],
        generation_configs={"max_gen_len": 20, "do_sample": False,
                            "end_ids": end}, draft_len=4)[0, 0]
    stop = len(prompt)
    while stop < len(want) and want[stop - 1] != end:
        stop += 1
    np.testing.assert_array_equal(got[: stop + 1], want[: stop + 1])
    assert end in got


def test_prompt_lookup_batched_bit_exact(gpt_pair):
    """b8 prompt-lookup: every row of one batched call == that row's
    standalone plain greedy decode (per-row matching / acceptance / cache
    offsets; VERDICT r2 item 9)."""
    target, _ = gpt_pair
    rs = np.random.RandomState(33)
    prompts = rs.randint(1, 211, (8, 6)).astype(np.int32)
    got = prompt_lookup_generate(
        target, prompts,
        generation_configs={"max_gen_len": 16, "do_sample": False},
        draft_len=4)
    assert got.shape[0] == 8 and got.shape[1] == 1
    for b in range(8):
        want = plain_greedy(target, prompts[b].tolist(), 16)
        np.testing.assert_array_equal(got[b, 0, :len(want)], want,
                                      err_msg=f"row {b}")


def test_prompt_lookup_batched_end_ids_ragged_rows(gpt_pair):
    """Batched rows stopping at different lengths: early-finishing rows
    freeze (pad_id tail) while others keep speculating; each row's committed
    prefix equals its standalone greedy-with-end_ids decode."""
    target, _ = gpt_pair
    rs = np.random.RandomState(34)
    prompts = rs.randint(1, 211, (4, 5)).astype(np.int32)
    # pick an end token some row actually emits so rows finish raggedly
    ref0 = plain_greedy(target, prompts[0].tolist(), 24)
    end = int(ref0[len(prompts[0]) + 2])
    got = prompt_lookup_generate(
        target, prompts,
        generation_configs={"max_gen_len": 24, "do_sample": False,
                            "end_ids": end, "pad_id": 0},
        draft_len=4)
    lens = set()
    for b in range(4):
        want = plain_greedy(target, prompts[b].tolist(), 24, end_ids=[end])
        stop = len(prompts[b])
        while stop < len(want) and want[stop - 1] != end:
            stop += 1
        np.testing.assert_array_equal(got[b, 0, : stop + 1],
                                      want[: stop + 1], err_msg=f"row {b}")
        lens.add(stop)
        # frozen tail is pad, not stale junk (search past the prompt — the
        # end token may legitimately occur inside it)
        row = got[b, 0]
        gen = row[len(prompts[b]):].tolist()
        if end in gen:
            e = len(prompts[b]) + gen.index(end)
            assert (row[e + 1:] == 0).all() or e + 1 == len(row)
    assert len(lens) > 1, "rows should finish at different lengths"


def test_generate_ngram_dispatch(gpt_pair):
    """generate(draft_model='ngram') routes to prompt-lookup; unset
    do_sample resolves to the reference default (True) and runs the
    point-mass rejection-sampling path — with top_k=1 that path must
    reproduce the greedy stream exactly (the processed distribution is a
    point mass, so acceptance/residual draws are deterministic)."""
    target, _ = gpt_pair
    ids = np.asarray([[4, 9, 2, 7]], np.int32)
    want = plain_greedy(target, [4, 9, 2, 7], 12)
    got = np.asarray(target.generate(
        jnp.asarray(ids), generation_configs={"max_gen_len": 12,
                                              "do_sample": False},
        draft_model="ngram", draft_len=4))
    np.testing.assert_array_equal(got[0, 0], want)
    got = np.asarray(target.generate(
        jnp.asarray(ids), generation_configs={"max_gen_len": 12, "top_k": 1},
        draft_model="ngram", draft_len=4))  # do_sample resolves to True
    np.testing.assert_array_equal(got[0, 0], want)
    with pytest.raises(ValueError, match="unknown draft mode"):
        target.generate(jnp.asarray(ids),
                        generation_configs={"max_gen_len": 12,
                                            "do_sample": False},
                        draft_model="lookahead")


def test_prompt_lookup_sampling_topk1_equals_greedy_batched(gpt_pair):
    """Batched sampling prompt-lookup at the greedy limit (top_k=1): every
    row's stream equals its plain greedy stream, including ragged per-row
    end behavior through the rejection-sampling program."""
    target, _ = gpt_pair
    rs = np.random.RandomState(6)
    prompts = rs.randint(1, 211, (3, 6)).astype(np.int32)
    got = prompt_lookup_generate(
        target, prompts,
        generation_configs={"max_gen_len": 14, "do_sample": True,
                            "top_k": 1, "temperature": 0.7},
        draft_len=4, rng=np.asarray([0, 42], np.uint32))
    for b in range(3):
        want = plain_greedy(target, prompts[b].tolist(), 14)
        np.testing.assert_array_equal(got[b, 0, : len(want)], want,
                                      err_msg=f"row {b}")


def test_prompt_lookup_sampling_first_token_distribution(gpt_pair):
    """Sampling prompt-lookup marginal exactness end-to-end: over many iid
    rows with the same prompt, the first generated token's empirical
    distribution matches the analytically processed target distribution
    (temperature/top-k/top-p softmax of the model's own logits)."""
    from cleantransformer_tpu.generation.engine import (cache_factory,
                                                        inference_params)
    from cleantransformer_tpu.generation.speculative import _process_scores
    target, _ = gpt_pair
    prompt = [4, 9, 2, 7]
    B = 2048
    out = prompt_lookup_generate(
        target, np.tile(np.asarray(prompt, np.int32), (B, 1)),
        generation_configs={"max_gen_len": 1, "do_sample": True,
                            "temperature": 0.9, "top_k": 10, "top_p": 0.9},
        draft_len=4, rng=np.asarray([0, 7], np.uint32))
    first = np.asarray(out)[:, 0, len(prompt)]
    # analytic target: the model's own last-position logits, processed
    fwd = target.forward_fn()
    ids = np.asarray(prompt, np.int32)[None]
    cache = cache_factory(target)(target.config, 1, len(prompt) + 4)
    col = np.arange(len(prompt) + 4, dtype=np.int32)[None]
    (logits, _), _ = fwd(inference_params(target), target.config, ids,
                         (col < len(prompt)).astype(np.int32),
                         np.arange(len(prompt), dtype=np.int32)[None], None,
                         cache, last_only=True)
    s = _process_scores(jnp.asarray(logits)[:, -1].astype(jnp.float32),
                        jnp.full((1,), 0.9), jnp.full((1,), 10, jnp.int32),
                        jnp.full((1,), 0.9))
    p = np.asarray(jax.nn.softmax(s, axis=-1))[0]
    counts = np.bincount(first, minlength=p.shape[0]) / B
    tv = 0.5 * np.abs(counts - p).sum()
    assert tv < 0.06, tv


def test_model_draft_batched_bit_exact(gpt_pair):
    """b8 draft-model speculation (greedy): every row of one batched call ==
    that row's standalone plain greedy decode — per-row acceptance counts,
    per-row KV offsets, rows freezing independently."""
    target, draft = gpt_pair
    rs = np.random.RandomState(44)
    prompts = rs.randint(1, 211, (8, 6)).astype(np.int32)
    got, stats = speculative_generate(
        target, draft, prompts,
        generation_configs={"max_gen_len": 16, "do_sample": False},
        draft_len=4, return_stats=True)
    assert got.shape[0] == 8 and got.shape[1] == 1
    assert stats["rounds"] >= 1
    for b in range(8):
        want = plain_greedy(target, prompts[b].tolist(), 16)
        np.testing.assert_array_equal(got[b, 0, :len(want)], want,
                                      err_msg=f"row {b}")


def test_model_draft_batched_self_draft_and_end_ids(gpt_pair):
    """Batched self-draft (full acceptance) with ragged per-row end stops:
    each row's committed prefix equals its standalone greedy-with-end_ids
    decode and frozen tails are pad."""
    target, _ = gpt_pair
    rs = np.random.RandomState(45)
    prompts = rs.randint(1, 211, (4, 5)).astype(np.int32)
    ref0 = plain_greedy(target, prompts[0].tolist(), 24)
    end = int(ref0[len(prompts[0]) + 2])
    got = speculative_generate(
        target, target, prompts,
        generation_configs={"max_gen_len": 24, "do_sample": False,
                            "end_ids": end, "pad_id": 0},
        draft_len=4)
    lens = set()
    for b in range(4):
        want = plain_greedy(target, prompts[b].tolist(), 24, end_ids=[end])
        stop = len(prompts[b])
        while stop < len(want) and want[stop - 1] != end:
            stop += 1
        m = min(stop + 1, len(want))  # end as final token: nothing after it
        np.testing.assert_array_equal(got[b, 0, :m], want[:m],
                                      err_msg=f"row {b}")
        lens.add(stop)
        tail = np.asarray(got[b, 0, stop + 1:])
        if end in want[len(prompts[b]):stop]:
            assert (tail == 0).all(), f"row {b} tail not padded"
    assert len(lens) > 1, "rows should finish at different lengths"


def test_model_draft_batched_sampling_topk1_equals_greedy(gpt_pair):
    """Batched draft-model SAMPLING (formerly greedy-only): the draft's
    argmax proposals are deterministic, so the point-mass rejection sampler
    commits exact-in-distribution streams — at top_k=1 that collapses to
    the greedy stream per row, end to end."""
    target, draft = gpt_pair
    rs = np.random.RandomState(14)
    prompts = rs.randint(1, 211, (2, 5)).astype(np.int32)
    got = speculative_generate(
        target, draft, prompts,
        generation_configs={"max_gen_len": 10, "do_sample": True,
                            "top_k": 1, "temperature": 0.8},
        draft_len=3, rng=np.asarray([0, 9], np.uint32))
    for b in range(2):
        want = plain_greedy(target, prompts[b].tolist(), 10)
        np.testing.assert_array_equal(got[b, 0, : len(want)], want,
                                      err_msg=f"row {b}")


# ---------------------------------------------------------------------------
# llama family: GQA + RoPE + head-major cache through the verify window
# ---------------------------------------------------------------------------
# The llama decode path is weight-streaming-bound, so a (K+1)-token verify
# costs ~1 plain step — speculation's best regime. The verify forward
# exercises the head-major cache's multi-token branch (per-row ragged
# offsets, models/llama.py `defer` gating) that plain decode never hits.

from cleantransformer_tpu.config import LlamaConfig
from cleantransformer_tpu.models.llama import LlamaForCausalLM

LLAMA_T = dict(vocab_size=199, hidden_size=64, intermediate_size=160,
               num_hidden_layers=3, num_attention_heads=4,
               num_key_value_heads=2, max_position_embeddings=256)


@pytest.fixture(scope="module", params=[False, True],
                ids=["dense", "head_major"])
def llama_target(request):
    cfg = LlamaConfig(**LLAMA_T, decode_head_major=request.param)
    return LlamaForCausalLM(cfg, rng=jax.random.PRNGKey(31))


@pytest.mark.parametrize("K", [3, 5])
def test_llama_prompt_lookup_bit_exact(llama_target, K):
    rs = np.random.RandomState(K)
    for plen in (2, 7):
        prompt = rs.randint(1, 199, (plen,)).tolist()
        want = plain_greedy(llama_target, prompt, 16)
        got = prompt_lookup_generate(
            llama_target, np.asarray(prompt, np.int32)[None],
            generation_configs={"max_gen_len": 16, "do_sample": False},
            draft_len=K)[0, 0]
        np.testing.assert_array_equal(got, want, err_msg=f"K={K} plen={plen}")


def test_llama_prompt_lookup_batched_bit_exact(llama_target):
    rs = np.random.RandomState(36)
    prompts = rs.randint(1, 199, (4, 6)).astype(np.int32)
    got = prompt_lookup_generate(
        llama_target, prompts,
        generation_configs={"max_gen_len": 16, "do_sample": False},
        draft_len=4)
    for b in range(4):
        want = plain_greedy(llama_target, prompts[b].tolist(), 16)
        np.testing.assert_array_equal(got[b, 0, :len(want)], want,
                                      err_msg=f"row {b}")


def test_llama_model_draft_bit_exact(llama_target):
    draft = LlamaForCausalLM(LlamaConfig(**{**LLAMA_T,
                                            "num_hidden_layers": 1}),
                             rng=jax.random.PRNGKey(32))
    rs = np.random.RandomState(37)
    prompt = rs.randint(1, 199, (5,)).tolist()
    want = plain_greedy(llama_target, prompt, 16)
    got = speculative_generate(
        llama_target, draft, np.asarray(prompt, np.int32)[None],
        generation_configs={"max_gen_len": 16}, draft_len=4)[0, 0]
    np.testing.assert_array_equal(got, want)
