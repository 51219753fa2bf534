"""Extended benchmark suite (run manually; bench.py stays the driver's
one-line headline). Measures on the current accelerator:

 - GPT-2 124M greedy decode tokens/sec/chip (batch sweep)
 - Bloom-560m-class greedy decode tokens/sec/chip
 - Bloom SFT train-step time + tokens/sec + MFU (bf16, flash attention)
 - GPT-2 prefill throughput (tokens/sec)

Writes BENCH_DETAILS.md and prints one json line per metric.
"""

import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from cleantransformer_tpu.config import BloomConfig, GPTConfig
from cleantransformer_tpu.models.bloom import BloomForCausalLM, bloom_lm_forward
from cleantransformer_tpu.models.gpt import GPTLMHeadModel, gpt_lm_forward
from cleantransformer_tpu.optim import adamw_decoupled
from cleantransformer_tpu.utils.profiling import (
    count_params, transformer_flops, device_peak_flops)

RESULTS = []

_RTT = None


def host_rtt():
    """Measured host<->device round-trip latency. On the remotely-tunnelled
    TPU a synchronizing fetch costs ~25 ms of pure network time that must be
    subtracted from per-call timings. NOTE: jax.block_until_ready does NOT
    actually synchronize on this platform (it returns once the work is
    enqueued) — every timing below forces a real sync by fetching a value."""
    global _RTT
    if _RTT is None:
        f = jax.jit(lambda x: x + 1.0)
        x = jnp.zeros(())
        np.asarray(f(x))
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(f(x))
            ts.append(time.perf_counter() - t0)
        _RTT = min(ts)
    return _RTT


def record(name, value, unit, extra=None):
    row = {"metric": name, "value": round(value, 2), "unit": unit}
    if extra:
        row.update(extra)
    RESULTS.append(row)
    print(json.dumps(row), flush=True)


def bench_decode(model, name, batch, prompt, gen, vocab, two_point=False):
    """``two_point``: ALSO time a short-gen run and report the decode-only
    per-step slope ((t_long - t_short) / (gen_long - gen_short)) — at long
    prompts the prefill amortized over ``gen`` steps otherwise dominates
    per_step_ms (the ctx4k lines)."""
    rs = np.random.RandomState(0)
    ids = rs.randint(0, vocab, (batch, prompt)).astype(np.int32)
    mask = np.ones((batch, prompt), np.int32)

    def timed(g):
        cfg = {"beam_size": 1, "max_gen_len": g, "do_sample": False,
               "end_ids": None, "pad_id": 0, "no_repeat_ngram_size": 0}
        out = model.generate(ids, mask, generation_configs=cfg)
        n_new = out.shape[-1] - prompt
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            model.generate(ids, mask, generation_configs=cfg)
            times.append(time.perf_counter() - t0)
        # one device program + one fetch: subtract the network RTT so
        # per_step_ms reflects device time (bench.py keeps raw end-to-end)
        return n_new, max(min(times) - host_rtt(), 1e-9)

    n_new, dt = timed(gen)
    extra = {"batch": batch, "per_step_ms": round(1e3 * dt / n_new, 3)}
    if two_point:
        n_short, dt_short = timed(8)
        extra["decode_only_step_ms"] = round(
            1e3 * (dt - dt_short) / max(n_new - n_short, 1), 3)
    record(name, batch * n_new / dt, "tokens/s", extra)


def bench_beam(model, name, vocab, beam=3, batch=2, prompt=16, gen=64):
    """Fully-jitted beam search wall throughput (the reference's showcase
    generation mode — inference_gpt2.py runs beam_size=3; greedy+ngram here
    for reproducibility). With a fused_decode config the per-step decode
    rides the whole-stack kernel: beam reorder is a batch-axis gather on
    the (L, B, T, D) layout."""
    rs = np.random.RandomState(0)
    ids = rs.randint(1, vocab, (batch, prompt)).astype(np.int32)
    gcfg = {"beam_size": beam, "max_gen_len": gen, "do_sample": False,
            "pad_id": 0, "end_ids": None, "no_repeat_ngram_size": 2}
    out = model.generate(ids, generation_configs=gcfg)
    n_new = out.shape[-1] - prompt
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        model.generate(ids, generation_configs=gcfg)
        times.append(time.perf_counter() - t0)
    dt = max(min(times) - host_rtt(), 1e-9)
    record(name, batch * n_new / dt, f"tokens/s (batch={batch}, beam={beam})",
           {"ms_per_step": round(dt / n_new * 1e3, 3)})


def bench_prefill(model, cfg, batch=8, seq=512):
    rs = np.random.RandomState(0)
    ids = jnp.asarray(rs.randint(0, cfg.vocab_size, (batch, seq)), jnp.int32)
    mask = jnp.ones((batch, seq), jnp.int32)
    params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, model.params)

    # the single prefill is only a few ms — run N dependent prefills inside
    # one program so the tunnel RTT amortizes instead of dominating the error
    N = 16

    @jax.jit
    def fwd_n(p, ids, mask):
        def body(i, carry):
            ids = (ids0 + carry.astype(jnp.int32)) % cfg.vocab_size
            (logits, _), _ = gpt_lm_forward(p, cfg, ids, mask,
                                            version="gpt2", last_only=True)
            return jnp.max(logits[:, -1, :1]).astype(jnp.float32)
        ids0 = ids
        return jax.lax.fori_loop(0, N, body, jnp.zeros((), jnp.float32))

    np.asarray(fwd_n(params, ids, mask))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(fwd_n(params, ids, mask))
        times.append(time.perf_counter() - t0)
    dt = max((min(times) - host_rtt()) / N, 1e-9)
    record("gpt2_124M_prefill_tokens_per_sec", batch * seq / dt, "tokens/s",
           {"seq": seq, "batch": batch})


def bench_sft_step(use_flash, remat=True):
    # bloom-560m-class: 24 layers, hidden 1024, 16 heads; vocab cut to fit HBM
    if use_flash and remat is True:
        # pin the flash out/lse residuals AND save matmul outputs: measured
        # fastest in the round-4 remat sweep (attn 255.0 / dots_attn 250.3 /
        # dots 272.1 ms incl RTT; custom-vjp LN and fused_ce bought nothing
        # — the step is roofline-decomposed into matmuls+recompute ~127 ms,
        # attention kernels ~53 ms, CE ~27 ms, optimizer ~14 ms)
        remat = "dots_attn"
    cfg = BloomConfig(vocab_size=50432, hidden_size=1024, n_layer=24,
                      num_attention_heads=16, compute_dtype="bfloat16",
                      use_flash_attention=use_flash)
    model = BloomForCausalLM(cfg, rng=jax.random.PRNGKey(0))
    model._tie_weight()
    n_params = count_params(model.params)
    init_fn, update_fn = adamw_decoupled(lr=1e-5)
    opt_state = init_fn(model.params)
    B, S = 8, 1024
    rs = np.random.RandomState(0)
    batch = {"input_ids": jnp.asarray(rs.randint(0, 50432, (B, S)), jnp.int32),
             "attention_mask": jnp.ones((B, S), jnp.int32)}
    batch["labels"] = batch["input_ids"]

    def loss_fn(params, b):
        (loss, _, _), _ = bloom_lm_forward(params, cfg, b["input_ids"],
                                           b["attention_mask"],
                                           labels=b["labels"], remat=remat)
        return loss

    # donate: without input/output aliasing every step pays full param +
    # opt-state copies (~13 ms at 560M fp32)
    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, b):
        loss, grads = jax.value_and_grad(loss_fn)(params, b)
        params, opt_state = update_fn(grads, opt_state, params)
        return params, opt_state, loss

    params = model.params
    params, opt_state, loss = step(params, opt_state, batch)
    float(loss)  # sync fetch — block_until_ready doesn't sync here
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        params, opt_state, loss = step(params, opt_state, batch)
        float(loss)
        times.append(time.perf_counter() - t0)
    dt = max(min(times) - host_rtt(), 1e-9)
    flops = transformer_flops(n_params, S, 1024, 24) * B * S
    suffix = ("_flash" if use_flash else "") + \
        ("_dots" if remat == "dots" else "")
    record(f"bloom560m_sft_step_time{suffix}",
           dt * 1e3, "ms (batch=8, seq=1024, bf16)",
           {"tokens_per_sec": round(B * S / dt, 1),
            "mfu": round(flops / dt / device_peak_flops(), 3),
            "params_millions": round(n_params / 1e6, 1)})


def bench_llama_sft(use_flash=True):
    """Llama-class SFT (360M: hidden 1280, hd 128, SwiGLU). hd=128 runs the
    flash kernels at full lane utilization (Bloom's hd=64 caps them at
    ~20-25 TF/s), so this measures the architecture-unconstrained MFU."""
    from cleantransformer_tpu.config import LlamaConfig
    from cleantransformer_tpu.models.llama import (
        LlamaForCausalLM, llama_lm_forward)
    cfg = LlamaConfig(vocab_size=32000, hidden_size=1280,
                      intermediate_size=3456, num_hidden_layers=16,
                      num_attention_heads=10, num_key_value_heads=10,
                      max_position_embeddings=2048,
                      compute_dtype="bfloat16",
                      use_flash_attention=use_flash)
    model = LlamaForCausalLM(cfg, rng=jax.random.PRNGKey(0))
    model._tie_weight()
    n_params = count_params(model.params)
    init_fn, update_fn = adamw_decoupled(lr=1e-5)
    opt_state = init_fn(model.params)
    B, S = 8, 1024
    rs = np.random.RandomState(0)
    batch = {"input_ids": jnp.asarray(rs.randint(0, 32000, (B, S)), jnp.int32),
             "attention_mask": jnp.ones((B, S), jnp.int32)}
    batch["labels"] = batch["input_ids"]
    # dots_attn: fastest in the round-4 remat sweep (see bench_sft_step)
    remat = "dots_attn" if use_flash else True

    def loss_fn(params, b):
        (loss, _, _), _ = llama_lm_forward(params, cfg, b["input_ids"],
                                           b["attention_mask"],
                                           labels=b["labels"], remat=remat)
        return loss

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, b):
        loss, grads = jax.value_and_grad(loss_fn)(params, b)
        params, opt_state = update_fn(grads, opt_state, params)
        return params, opt_state, loss

    params = model.params
    params, opt_state, loss = step(params, opt_state, batch)
    float(loss)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        params, opt_state, loss = step(params, opt_state, batch)
        float(loss)
        times.append(time.perf_counter() - t0)
    dt = max(min(times) - host_rtt(), 1e-9)
    flops = transformer_flops(n_params, S, 1280, 16) * B * S
    record("llama360m_sft_step_time" + ("_flash" if use_flash else ""),
           dt * 1e3, "ms (batch=8, seq=1024, bf16)",
           {"tokens_per_sec": round(B * S / dt, 1),
            "mfu": round(flops / dt / device_peak_flops(), 3),
            "params_millions": round(n_params / 1e6, 1)})


def _llama_sft_time(cfg, B, S, accum=1, remat="dots_attn",
                    moment_dtype=None):
    """One llama-family AdamW train-step timing (donated params+opt, remat,
    fused program). accum > 1 scans ``accum`` microbatches of B rows inside
    the jitted step (fp32 grad accumulation, mean-reduced). Returns
    (seconds, n_params). ``moment_dtype=jnp.float32`` with a bf16
    param_dtype config is the big-model-on-one-chip recipe (optim.py)."""
    from cleantransformer_tpu.models.llama import (LlamaForCausalLM,
                                                   llama_lm_forward)
    model = LlamaForCausalLM(cfg, rng=jax.random.PRNGKey(0))
    model._tie_weight()
    n_params = count_params(model.params)
    init_fn, update_fn = adamw_decoupled(lr=1e-5, moment_dtype=moment_dtype)
    opt_state = init_fn(model.params)
    rs = np.random.RandomState(0)
    shape = (accum, B, S) if accum > 1 else (B, S)
    ids = jnp.asarray(rs.randint(0, cfg.vocab_size, shape), jnp.int32)

    def loss_fn(params, ids_):
        (loss, _, _), _ = llama_lm_forward(params, cfg, ids_,
                                           jnp.ones_like(ids_), labels=ids_,
                                           remat=remat)
        return loss

    if accum == 1:
        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def step(params, opt_state, ids_):
            loss, grads = jax.value_and_grad(loss_fn)(params, ids_)
            params, opt_state = update_fn(grads, opt_state, params)
            return params, opt_state, loss
    else:
        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def step(params, opt_state, ids_):
            def micro(acc, mb):
                loss, grads = jax.value_and_grad(loss_fn)(params, mb)
                return jax.tree_util.tree_map(jnp.add, acc, grads), loss
            zero = jax.tree_util.tree_map(
                lambda x: jnp.zeros_like(x)
                if jnp.issubdtype(x.dtype, jnp.floating) else None, params)
            grads, losses = jax.lax.scan(micro, zero, ids_)
            grads = jax.tree_util.tree_map(lambda g: g / accum, grads)
            params, opt_state = update_fn(grads, opt_state, params)
            return params, opt_state, losses.mean()

    params = model.params
    params, opt_state, loss = step(params, opt_state, ids)
    float(loss)  # sync fetch — block_until_ready doesn't sync on axon
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        params, opt_state, loss = step(params, opt_state, ids)
        float(loss)
        times.append(time.perf_counter() - t0)
    return max(min(times) - host_rtt(), 1e-9), n_params


def bench_training_scale():
    """Training beyond the b8/s1024 comfort zone (VERDICT r4 #5): a seq-2048
    line (flash + remat regime where attention FLOPs quadruple per row), a
    grad-accum line (4 x b2 microbatches scanned inside one jitted step —
    same tokens as the b8 baseline, so overhead = accumulation cost), and a
    1.1B-class (tinyllama-shape) step at the edge of the 16 GB chip
    (fp32 master params + AdamW m/v = 13.2 GB; fused_ce never materializes
    the (B, S, V) logits)."""
    from cleantransformer_tpu.config import LlamaConfig
    import gc
    l360 = dict(vocab_size=32000, hidden_size=1280, intermediate_size=3456,
                num_hidden_layers=16, num_attention_heads=10,
                num_key_value_heads=10, max_position_embeddings=4096,
                compute_dtype="bfloat16", use_flash_attention=True)

    dt, n = _llama_sft_time(LlamaConfig(**l360), B=4, S=2048)
    flops = transformer_flops(n, 2048, 1280, 16) * 4 * 2048
    record("llama360m_sft_step_time_s2048", dt * 1e3,
           "ms (batch=4, seq=2048, bf16, flash+dots_attn remat)",
           {"tokens_per_sec": round(4 * 2048 / dt, 1),
            "mfu": round(flops / dt / device_peak_flops(), 3),
            "params_millions": round(n / 1e6, 1)})
    gc.collect()

    dt, n = _llama_sft_time(LlamaConfig(**l360), B=2, S=1024, accum=4)
    flops = transformer_flops(n, 1024, 1280, 16) * 8 * 1024
    record("llama360m_sft_step_time_accum4x2", dt * 1e3,
           "ms (4 accum microbatches x batch=2, seq=1024, bf16)",
           {"tokens_per_sec": round(8 * 1024 / dt, 1),
            "mfu": round(flops / dt / device_peak_flops(), 3),
            "params_millions": round(n / 1e6, 1)})
    gc.collect()

    # 1.1B on ONE 16 GB chip: fp32-master AdamW alone is 13.2 GB and the
    # per-step whole-model fp32->bf16 cast adds 2.2 GB of convert buffers —
    # the b4 fp32-master attempt OOM'd at compile (20.9 > 15.75 GB). The
    # single-chip recipe is bf16 params + fp32 moments (optim.py
    # moment_dtype): 6 bytes/param of state, no cast copies.
    t11 = dict(vocab_size=32000, hidden_size=2048, intermediate_size=5632,
               num_hidden_layers=22, num_attention_heads=32,
               num_key_value_heads=4, max_position_embeddings=2048,
               compute_dtype="bfloat16", param_dtype="bfloat16",
               use_flash_attention=True, fused_ce=True)
    dt, n = _llama_sft_time(LlamaConfig(**t11), B=4, S=1024, remat="attn",
                            moment_dtype=jnp.float32)
    flops = transformer_flops(n, 1024, 2048, 22) * 4 * 1024
    record("tinyllama1.1B_sft_step_time", dt * 1e3,
           "ms (batch=4, seq=1024, bf16 params + fp32 moments, flash+attn "
           "remat, fused_ce)",
           {"tokens_per_sec": round(4 * 1024 / dt, 1),
            "mfu": round(flops / dt / device_peak_flops(), 3),
            "params_millions": round(n / 1e6, 1)})
    gc.collect()


def _sim_lookup_tokens_per_round(stream, S0, K, ngram=2):
    """Host-side simulation of _prompt_lookup_loop's matcher on a greedy
    stream (greedy is deterministic, so the simulated acceptance is EXACT
    for committed-prefix matches; non-full fallback proposals read buffer
    junk in the real loop and are scored 0 here). Used to SELECT probe
    prompts whose continuations the lookup mechanism actually accelerates —
    raw repetition counts pick cycles longer than K that cap acceptance."""
    t = list(map(int, stream))
    total = len(t)
    n = S0 + 1
    rounds = 0
    while n < total and rounds < 4 * total:
        pat = tuple(t[n - ngram:n])
        a = 0
        for j in range(n - ngram - 1, -1, -1):  # last full match wins
            if tuple(t[j:j + ngram]) == pat and j + ngram + K <= n:
                cand = t[j + ngram:j + ngram + K]
                while (a < K and n + a < total and cand[a] == t[n + a]):
                    a += 1
                break
        n += a + 1
        rounds += 1
    return (n - S0 - 1) / max(rounds, 1)


def _sharpen(model, scale=16.0):
    """A copy of the model with logits scaled up so greedy argmax is
    DECISIVE (as in trained models). A random-init model's near-flat logits
    make argmax flip on bf16 summation-order differences between the plain
    (S==1) and verify (S==K+1) compiled programs, so speculation acceptance
    depends on XLA compile luck: identical bench code measured 8.6 vs 4.16
    tokens/round across recompiles. Sharp logits pin the greedy stream and
    make the acceptance (and hence the bench) reproducible."""
    p = dict(model.params)
    if "tokens_embed" in p:          # GPT family (tied head)
        p["tokens_embed"] = p["tokens_embed"] * scale
    elif "lm_head" in p:             # llama family, untied
        p["lm_head"] = p["lm_head"] * scale
    else:                            # llama tied / bloom
        k = "embed_tokens" if "embed_tokens" in p else "word_embeddings"
        p[k] = p[k] * scale
    kw = {"params": p}
    if hasattr(model, "version"):
        kw["version"] = model.version
    return type(model)(model.config, **kw)


def bench_prompt_lookup(model, name, vocab, gen=128, K=4):
    """Draft-free (ngram) speculation vs plain greedy, batch 1, measured on
    a REPETITIVE continuation (probed: the random prompt whose greedy
    stream the lookup matcher accelerates most, scored by exact host-side
    acceptance simulation) — the regime prompt-lookup targets; real models
    hit it on extraction/code/quoting workloads. A verify round costs ~2
    plain decode steps on this toolchain, so speedup ~ tokens_per_round/2."""
    from cleantransformer_tpu.generation.speculative import (
        prompt_lookup_generate)
    model = _sharpen(model)
    rs = np.random.RandomState(0)
    plain_cfg = {"beam_size": 1, "max_gen_len": gen, "do_sample": False,
                 "pad_id": 0, "end_ids": None, "no_repeat_ngram_size": 0}
    ids, best_rep = None, -1.0
    for _ in range(12):
        probe = rs.randint(1, vocab, (1, 16)).astype(np.int32)
        out = np.asarray(model.generate(probe,
                                        generation_configs=plain_cfg))[0, 0]
        rep = _sim_lookup_tokens_per_round(out, 16, K)
        if rep > best_rep:
            ids, best_rep = probe, rep
    out = model.generate(ids, generation_configs=plain_cfg)
    n_new = out.shape[-1] - 16
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        model.generate(ids, generation_configs=plain_cfg)
        times.append(time.perf_counter() - t0)
    base = n_new / max(min(times) - host_rtt(), 1e-9)

    cfg = {"max_gen_len": gen, "do_sample": False}
    out, stats = prompt_lookup_generate(model, ids, generation_configs=cfg,
                                        draft_len=K, return_stats=True)
    n_new = out.shape[-1] - 16
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        prompt_lookup_generate(model, ids, generation_configs=cfg,
                               draft_len=K)
        times.append(time.perf_counter() - t0)
    spec = n_new / max(min(times) - host_rtt(), 1e-9)
    record(name, spec, "tokens/s (batch=1)",
           {"plain_b1_tokens_per_sec": round(base, 1), "draft_len": K,
            "tokens_per_round": round(stats["tokens_per_round"], 2),
            "speedup": round(spec / base, 2)})


def bench_packed_sft():
    """Sequence packing on belle-like data (llama-360M-class, flash): real
    supervised tokens/sec, pad-to-max vs packed rows (segmented flash
    kernel). Short examples make pad-to-max burn most FLOPs on pads —
    packing recovers them."""
    from cleantransformer_tpu.config import LlamaConfig
    from cleantransformer_tpu.models.llama import (
        LlamaForCausalLM, llama_lm_forward)
    cfg = LlamaConfig(vocab_size=32000, hidden_size=1280,
                      intermediate_size=3456, num_hidden_layers=16,
                      num_attention_heads=10, num_key_value_heads=10,
                      max_position_embeddings=2048,
                      compute_dtype="bfloat16", use_flash_attention=True)
    model = LlamaForCausalLM(cfg, rng=jax.random.PRNGKey(0))
    model._tie_weight()
    init_fn, update_fn = adamw_decoupled(lr=1e-5)
    B, S = 8, 1024
    rs = np.random.RandomState(0)
    # belle-ish length distribution (median ~110 tokens)
    lens = np.clip(rs.lognormal(4.7, 0.6, 400).astype(int), 16, S)
    seqs = [rs.randint(1, 32000, (n,)).astype(np.int32) for n in lens]

    def step_time(batch):
        def loss_fn(params, b):
            (loss, _, _), _ = llama_lm_forward(
                params, cfg, b["input_ids"], b["attention_mask"],
                segment_ids=b.get("segment_ids"), labels=b["labels"],
                remat="attn")
            return loss

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def step(params, opt_state, b):
            loss, grads = jax.value_and_grad(loss_fn)(params, b)
            params, opt_state = update_fn(grads, opt_state, params)
            return params, opt_state, loss

        params = jax.tree_util.tree_map(jnp.copy, model.params)
        opt_state = init_fn(params)
        params, opt_state, loss = step(params, opt_state, batch)
        float(loss)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            params, opt_state, loss = step(params, opt_state, batch)
            float(loss)
            times.append(time.perf_counter() - t0)
        del params, opt_state
        import gc
        gc.collect()
        return max(min(times) - host_rtt(), 1e-9)

    # pad-to-max: B examples per step
    ids = np.zeros((B, S), np.int32)
    mask = np.zeros((B, S), np.int32)
    for i, s in enumerate(seqs[:B]):
        ids[i, : len(s)] = s
        mask[i, : len(s)] = 1
    labels = np.where(mask == 1, ids, -100)
    padded = {"input_ids": jnp.asarray(ids),
              "attention_mask": jnp.asarray(mask),
              "labels": jnp.asarray(labels)}
    t_pad = step_time(padded)
    real_pad = int(mask.sum())

    # packed: fill B rows back-to-back with whole examples
    ids = np.zeros((B, S), np.int32)
    mask = np.zeros((B, S), np.int32)
    seg = np.zeros((B, S), np.int32)
    labels = np.full((B, S), -100, np.int32)
    it = iter(seqs)
    for r in range(B):
        off, sid = 0, 1
        for s in it:
            if off + len(s) > S:
                break
            ids[r, off: off + len(s)] = s
            mask[r, off: off + len(s)] = 1
            seg[r, off: off + len(s)] = sid
            labels[r, off + 1: off + len(s)] = s[1:]
            off += len(s)
            sid += 1
    packed = {"input_ids": jnp.asarray(ids),
              "attention_mask": jnp.asarray(mask),
              "segment_ids": jnp.asarray(seg),
              "labels": jnp.asarray(labels)}
    t_pack = step_time(packed)
    real_pack = int(mask.sum())

    record("llama360m_sft_packed_real_tokens_per_sec", real_pack / t_pack,
           "supervised tokens/s (batch=8 rows x seq=1024, packed, "
           "segmented flash)",
           {"fill": round(real_pack / (B * S), 3),
            "step_ms": round(t_pack * 1e3, 1),
            "padded_real_tokens_per_sec": round(real_pad / t_pad, 1),
            "padded_fill": round(real_pad / (B * S), 3),
            "padded_step_ms": round(t_pad * 1e3, 1),
            "speedup": round((real_pack / t_pack) / (real_pad / t_pad), 2)})


def bench_packed_sft_bloom():
    """Packed SFT on the reference's own family (bloom-560m-class):
    per-segment ALiBi restart + segmented head-major (B,S,D) flash kernel —
    packed rows now stay on the no-transpose path (round 3: segment refs in
    flash_attention_bsd), so packing no longer pays the hd=64 relayout
    tax vs unpacked."""
    cfg = BloomConfig(vocab_size=50432, hidden_size=1024, n_layer=24,
                      num_attention_heads=16, compute_dtype="bfloat16",
                      use_flash_attention=True)
    model = BloomForCausalLM(cfg, rng=jax.random.PRNGKey(0))
    model._tie_weight()
    init_fn, update_fn = adamw_decoupled(lr=1e-5)
    B, S = 8, 1024
    rs = np.random.RandomState(0)
    lens = np.clip(rs.lognormal(4.7, 0.6, 400).astype(int), 16, S)
    seqs = [rs.randint(1, 50432, (n,)).astype(np.int32) for n in lens]

    def step_time(batch):
        def loss_fn(params, b):
            (loss, _, _), _ = bloom_lm_forward(
                params, cfg, b["input_ids"], b["attention_mask"],
                segment_ids=b.get("segment_ids"), labels=b["labels"],
                remat="attn")
            return loss

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def step(params, opt_state, b):
            loss, grads = jax.value_and_grad(loss_fn)(params, b)
            params, opt_state = update_fn(grads, opt_state, params)
            return params, opt_state, loss

        params = jax.tree_util.tree_map(jnp.copy, model.params)
        opt_state = init_fn(params)
        params, opt_state, loss = step(params, opt_state, batch)
        float(loss)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            params, opt_state, loss = step(params, opt_state, batch)
            float(loss)
            times.append(time.perf_counter() - t0)
        del params, opt_state
        import gc
        gc.collect()
        return max(min(times) - host_rtt(), 1e-9)

    ids = np.zeros((B, S), np.int32)
    mask = np.zeros((B, S), np.int32)
    for i, s in enumerate(seqs[:B]):
        ids[i, : len(s)] = s
        mask[i, : len(s)] = 1
    padded = {"input_ids": jnp.asarray(ids),
              "attention_mask": jnp.asarray(mask),
              "labels": jnp.asarray(np.where(mask == 1, ids, -100))}
    t_pad = step_time(padded)
    real_pad = int(mask.sum())

    ids = np.zeros((B, S), np.int32)
    mask = np.zeros((B, S), np.int32)
    seg = np.zeros((B, S), np.int32)
    labels = np.full((B, S), -100, np.int32)
    it = iter(seqs)
    for r in range(B):
        off, sid = 0, 1
        for s in it:
            if off + len(s) > S:
                break
            ids[r, off: off + len(s)] = s
            mask[r, off: off + len(s)] = 1
            seg[r, off: off + len(s)] = sid
            labels[r, off + 1: off + len(s)] = s[1:]
            off += len(s)
            sid += 1
    packed = {"input_ids": jnp.asarray(ids),
              "attention_mask": jnp.asarray(mask),
              "segment_ids": jnp.asarray(seg),
              "labels": jnp.asarray(labels)}
    t_pack = step_time(packed)
    real_pack = int(mask.sum())
    record("bloom560m_sft_packed_real_tokens_per_sec", real_pack / t_pack,
           "supervised tokens/s (batch=8 rows x seq=1024, packed, "
           "segmented 4D flash)",
           {"fill": round(real_pack / (B * S), 3),
            "step_ms": round(t_pack * 1e3, 1),
            "padded_real_tokens_per_sec": round(real_pad / t_pad, 1),
            "padded_step_ms": round(t_pad * 1e3, 1),
            "speedup": round((real_pack / t_pack) / (real_pad / t_pad), 2)})


def bench_moe_sft(moe_impl):
    """Mixtral-class sparse-MoE SFT step (8 experts, top-2): dense dispatch
    (every expert computes every token, E/k = 4x overcompute) vs the
    grouped-matmul ragged_dot path (exact top-k compute). Same semantics,
    same loss — the delta is pure dispatch efficiency."""
    from cleantransformer_tpu.config import LlamaConfig
    from cleantransformer_tpu.models.llama import (
        LlamaForCausalLM, llama_lm_forward)
    cfg = LlamaConfig(vocab_size=32000, hidden_size=768,
                      intermediate_size=1536, num_hidden_layers=8,
                      num_attention_heads=12, num_key_value_heads=12,
                      max_position_embeddings=2048,
                      num_local_experts=8, num_experts_per_tok=2,
                      moe_impl=moe_impl, compute_dtype="bfloat16",
                      use_flash_attention=True)
    model = LlamaForCausalLM(cfg, rng=jax.random.PRNGKey(0))
    model._tie_weight()
    n_params = count_params(model.params)
    init_fn, update_fn = adamw_decoupled(lr=1e-5)
    opt_state = init_fn(model.params)
    B, S = 8, 1024
    rs = np.random.RandomState(0)
    batch = {"input_ids": jnp.asarray(rs.randint(0, 32000, (B, S)), jnp.int32),
             "attention_mask": jnp.ones((B, S), jnp.int32)}
    batch["labels"] = batch["input_ids"]

    def loss_fn(params, b):
        (loss, _, _), _ = llama_lm_forward(params, cfg, b["input_ids"],
                                           b["attention_mask"],
                                           labels=b["labels"], remat="attn")
        return loss

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, b):
        loss, grads = jax.value_and_grad(loss_fn)(params, b)
        params, opt_state = update_fn(grads, opt_state, params)
        return params, opt_state, loss

    params = model.params
    params, opt_state, loss = step(params, opt_state, batch)
    float(loss)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        params, opt_state, loss = step(params, opt_state, batch)
        float(loss)
        times.append(time.perf_counter() - t0)
    dt = max(min(times) - host_rtt(), 1e-9)
    record(f"mixtral_class_moe_sft_step_{moe_impl}", dt * 1e3,
           "ms (batch=8, seq=1024, bf16, 8 experts top-2)",
           {"tokens_per_sec": round(B * S / dt, 1),
            "params_millions": round(n_params / 1e6, 1)})
    del params, opt_state, model
    import gc
    gc.collect()


def bench_serving(model, name, vocab, n_requests=24, max_slots=8,
                  max_len=256, n_new=64, depth=8, chunk_size=16):
    """Continuous-batching throughput under a stream of variable-length
    prompts (the serving engine keeps all slots busy; generate() would run
    one batch at a time). ``depth`` = max_dispatch_depth: the engine
    enqueues up to that many decode chunks per result fetch, sized
    adaptively to the earliest finisher, so the tunnel RTT amortizes over a
    whole request's generation instead of every 16 tokens (round-2's
    fixed-chunk engine was RTT-bound at 2.5k tok/s). Reports a wall-clock
    breakdown: blocking fetches x measured RTT vs everything else
    (device compute + enqueue overhead)."""
    from cleantransformer_tpu.serving import ServingEngine
    rs = np.random.RandomState(0)
    prompts = [rs.randint(1, vocab, (int(n),)).tolist()
               for n in rs.randint(8, 64, n_requests)]
    # this tunnel serializes host<->device transfers behind enqueued
    # programs, so the serial schedule beats overlap here (see
    # serving/engine.py pipeline param; real hosts want the default)
    eng = ServingEngine(model, max_slots=max_slots, max_len=max_len,
                        prefill_buckets=(64,), chunk_size=chunk_size,
                        pipeline="serial", max_dispatch_depth=depth)
    # warmup: compile the prefill + decode-chunk programs before timing
    eng.submit(prompts[0], max_new_tokens=4)
    list(eng.run())
    eng.fetches = 0
    plen = {eng.submit(p, max_new_tokens=n_new): len(p) for p in prompts}
    t0 = time.perf_counter()
    done = list(eng.run())
    dt = time.perf_counter() - t0
    gen_tokens = sum(len(t) - plen[rid] for rid, t in done)
    rtt_s = eng.fetches * host_rtt()
    record(name, gen_tokens / dt, "generated tokens/s",
           {"requests": n_requests, "slots": max_slots,
            "chunk": chunk_size, "depth": depth, "wall_s": round(dt, 2),
            "fetches": eng.fetches, "rtt_s": round(rtt_s, 3),
            "device_and_enqueue_s": round(dt - rtt_s, 3)})


def bench_serving_prefix(model, name, vocab, n_requests=24, max_slots=24,
                         max_len=512, prefix_len=448, tail_len=16, n_new=32,
                         depth=8):
    """Prefix caching (ServingEngine.register_prefix): every request opens
    with the same long system prompt; the prefixed engine computes its KV
    ONCE and admits each wave by broadcast-seeding slot cache windows +
    prefilling only the 16-token tails in one program
    (_prefill_batch_prefixed) — vs the plain engine chunk-prefilling all
    ``prefix_len + tail_len`` tokens per request. Registration happens once
    before timing (amortized across the engine's lifetime); both engines
    run the identical workload and their outputs are identical (prefix
    reuse is bit-exact by causality)."""
    from cleantransformer_tpu.serving import ServingEngine
    rs = np.random.RandomState(0)
    prefix = rs.randint(1, vocab, (prefix_len,)).tolist()
    prompts = [prefix + rs.randint(1, vocab, (tail_len,)).tolist()
               for _ in range(n_requests)]

    def run_engine(use_prefix):
        eng = ServingEngine(model, max_slots=max_slots, max_len=max_len,
                            prefill_buckets=(64, 256), chunk_size=16,
                            pipeline="serial", max_dispatch_depth=depth)
        if use_prefix:
            eng.register_prefix(prefix)
        eng.submit(prompts[0], max_new_tokens=4, use_prefix=use_prefix)
        list(eng.run())  # compile warmup
        eng.fetches = 0
        plen = {eng.submit(p, max_new_tokens=n_new, use_prefix=use_prefix):
                len(p) for p in prompts}
        t0 = time.perf_counter()
        done = list(eng.run())
        dt = time.perf_counter() - t0
        gen = sum(len(t) - plen[rid] for rid, t in done)
        return gen / dt, dt, eng

    base_tps, base_dt, _ = run_engine(False)
    tps, dt, eng = run_engine(True)
    record(name, tps, "generated tokens/s",
           {"requests": n_requests, "slots": max_slots,
            "prefix_len": prefix_len, "tail_len": tail_len, "n_new": n_new,
            "wall_s": round(dt, 2), "fetches": eng.fetches,
            "prefill_calls": eng.prefill_calls,
            "plain_engine_tokens_per_sec": round(base_tps, 1),
            "plain_wall_s": round(base_dt, 2),
            "speedup": round(tps / base_tps, 2)})


def bench_serving_lookup(model, name, vocab, n_requests=24, max_slots=24,
                         max_len=256, n_new=64, depth=8, K=8):
    """Prompt-lookup speculation INSIDE continuous batching
    (ServingEngine(speculative='lookup')): each decode chunk runs verify
    ROUNDS — per-slot ngram proposals checked by ONE ragged (K+1)-token
    window-kernel forward — so the serving schedule (admission waves,
    adaptive depth, single harvest fetch) composes with the ~tokens_per_round
    speculation win. Workload = the regime lookup exists for: repetitive
    continuations, probed on the logit-sharpened model exactly like
    bench_prompt_lookup_batched. The plain engine runs the IDENTICAL
    workload for the speedup denominator."""
    from cleantransformer_tpu.serving import ServingEngine
    model = _sharpen(model)
    rs = np.random.RandomState(0)
    plain_cfg = {"beam_size": 1, "max_gen_len": n_new, "do_sample": False,
                 "pad_id": 0, "end_ids": None, "no_repeat_ngram_size": 0}
    scored = []
    for _ in range(48 // 8):
        probe = rs.randint(1, vocab, (8, 16)).astype(np.int32)
        out = np.asarray(model.generate(probe, generation_configs=plain_cfg))
        for r in range(8):
            rep = _sim_lookup_tokens_per_round(out[r, 0], 16, K)
            scored.append((rep, probe[r]))
    scored.sort(key=lambda x: -x[0])
    prompts = [p.tolist() for _, p in scored[:n_requests]]

    def run_engine(spec):
        # plain chunks are 64 single-token steps; lookup chunks are 8 verify
        # rounds (~K+1 tokens each at this workload's acceptance) — similar
        # tokens per dispatch either way
        eng = ServingEngine(model, max_slots=max_slots, max_len=max_len,
                            prefill_buckets=(64,),
                            chunk_size=(8 if spec else 64),
                            pipeline="serial", max_dispatch_depth=depth,
                            speculative=("lookup" if spec else None),
                            draft_len=K)
        eng.submit(prompts[0], max_new_tokens=4)   # compile warmup
        list(eng.run())
        eng.fetches = 0
        plen = {eng.submit(p, max_new_tokens=n_new): len(p) for p in prompts}
        t0 = time.perf_counter()
        done = list(eng.run())
        dt = time.perf_counter() - t0
        gen_tokens = sum(len(t) - plen[rid] for rid, t in done)
        return gen_tokens / dt, dt, eng

    base_tps, _, _ = run_engine(False)
    tps, dt, eng = run_engine(True)
    rtt_s = eng.fetches * host_rtt()
    record(name, tps, "generated tokens/s",
           {"requests": n_requests, "slots": max_slots, "draft_len": K,
            "rounds": eng.steps, "wall_s": round(dt, 2),
            "fetches": eng.fetches, "rtt_s": round(rtt_s, 3),
            "plain_engine_tokens_per_sec": round(base_tps, 1),
            "speedup": round(tps / base_tps, 2)})


def bench_serving_lookup_machinery(model, name, vocab, n_requests=24,
                                   max_slots=24, max_len=256, n_new=64,
                                   depth=8, K=8):
    """Serving-speculation machinery endpoint for families with no synthetic
    acceptance workload (llama — see bench_lookup_machinery): FULL
    acceptance forced bit-exactly by zeroing the lm_head (all logits exactly
    0.0 in every compiled program, argmax deterministically token 0; the
    matmuls still run, so device cost is unchanged), measured through the
    continuous-batching engine in lookup mode vs the plain engine on the
    identical workload. A trained model's real serving speedup ~ its
    tokens_per_round / this round cost."""
    from cleantransformer_tpu.serving import ServingEngine
    p = dict(model.params)
    zk = "lm_head" if "lm_head" in p else (
        "tokens_embed" if "tokens_embed" in p else "embed_tokens")
    p[zk] = jnp.zeros_like(p[zk])
    kw = {"params": p}
    if hasattr(model, "version"):
        kw["version"] = model.version
    zmodel = type(model)(model.config, **kw)
    rs = np.random.RandomState(0)
    prompts = [rs.randint(1, vocab, (int(n),)).tolist()
               for n in rs.randint(8, 64, n_requests)]

    def run_engine(spec):
        eng = ServingEngine(zmodel, max_slots=max_slots, max_len=max_len,
                            prefill_buckets=(64,),
                            chunk_size=(8 if spec else 64),
                            pipeline="serial", max_dispatch_depth=depth,
                            speculative=("lookup" if spec else None),
                            draft_len=K)
        eng.submit(prompts[0], max_new_tokens=4)   # compile warmup
        list(eng.run())
        eng.fetches = 0
        plen = {eng.submit(p_, max_new_tokens=n_new): len(p_)
                for p_ in prompts}
        t0 = time.perf_counter()
        done = list(eng.run())
        dt = time.perf_counter() - t0
        gen_tokens = sum(len(t) - plen[rid] for rid, t in done)
        return gen_tokens / dt, dt, eng

    base_tps, _, _ = run_engine(False)
    tps, dt, eng = run_engine(True)
    record(name, tps, "generated tokens/s (FORCED full acceptance)",
           {"requests": n_requests, "slots": max_slots, "draft_len": K,
            "rounds": eng.steps, "wall_s": round(dt, 2),
            "fetches": eng.fetches,
            "plain_engine_tokens_per_sec": round(base_tps, 1),
            "speedup_at_full_acceptance": round(tps / base_tps, 2)})


def bench_serving_lookup_adversarial(model, name, vocab, n_requests=24,
                                     max_slots=24, max_len=256, n_new=64,
                                     depth=8, K=8):
    """AUTO-FALLBACK under adversarial traffic (VERDICT r4 #4 'done'
    criterion): random-init llama greedy streams have ZERO n-gram
    repetition, so prompt-lookup commits ~1 token/round while a verify
    round costs 1.32-1.77 plain steps — a lookup engine WITHOUT fallback
    runs that factor slower than plain. With auto-fallback (default
    lookup_round_cost) the tokens-per-round EMA detects the dead workload
    after the first harvests and decode waves revert to plain chunks
    (re-probing every lookup_reprobe_every waves), recovering >=0.95x the
    plain engine. Three engines, identical workload: plain / lookup with
    fallback DISABLED (lookup_round_cost=0) / lookup with fallback."""
    from cleantransformer_tpu.serving import ServingEngine
    rs = np.random.RandomState(0)
    prompts = [rs.randint(1, vocab, (int(n),)).tolist()
               for n in rs.randint(8, 64, n_requests)]

    def run_engine(spec, round_cost=None):
        kw = {}
        if round_cost is not None:
            kw["lookup_round_cost"] = round_cost
        eng = ServingEngine(model, max_slots=max_slots, max_len=max_len,
                            prefill_buckets=(64,),
                            chunk_size=(8 if spec else 64),
                            pipeline="serial", max_dispatch_depth=depth,
                            speculative=("lookup" if spec else None),
                            draft_len=K, **kw)
        # engine-level warmup: compiles the prefill, the configured chunk
        # AND (fallback engines) the plain chunk a fallback wave dispatches
        # — without it the fallback engine paid that compile mid-traffic
        # (7.6 s wall for ~0.2 s of device work)
        eng.warmup()
        plen = {eng.submit(p_, max_new_tokens=n_new): len(p_)
                for p_ in prompts}
        t0 = time.perf_counter()
        done = list(eng.run())
        dt = time.perf_counter() - t0
        gen_tokens = sum(len(t) - plen[rid] for rid, t in done)
        return gen_tokens / dt, dt, eng

    plain_tps, _, _ = run_engine(False)
    naive_tps, _, _ = run_engine(True, round_cost=0.0)   # fallback disabled
    tps, dt, eng = run_engine(True)                      # fallback on
    record(name, tps, "generated tokens/s (adversarial, fallback on)",
           {"requests": n_requests, "slots": max_slots, "draft_len": K,
            "wall_s": round(dt, 2), "fetches": eng.fetches,
            "plain_engine_tokens_per_sec": round(plain_tps, 1),
            "lookup_no_fallback_tokens_per_sec": round(naive_tps, 1),
            "vs_plain": round(tps / plain_tps, 2),
            "no_fallback_vs_plain": round(naive_tps / plain_tps, 2),
            "plain_steps": int(eng._psteps),
            "lookup_rounds": int(eng._lrounds)})


def bench_adversarial_serving():
    """Zero-arg wrapper for the selective runner: the tinyllama-1.1B int8
    adversarial auto-fallback line (same model config as main())."""
    from cleantransformer_tpu.config import LlamaConfig
    from cleantransformer_tpu.models.llama import LlamaForCausalLM
    cfg = LlamaConfig(vocab_size=32000, hidden_size=2048,
                      intermediate_size=5632, num_hidden_layers=22,
                      num_attention_heads=32, num_key_value_heads=4,
                      max_position_embeddings=2048,
                      compute_dtype="bfloat16", decode_unroll=22,
                      decode_head_major=True, quantize_int8=True)
    m = LlamaForCausalLM(cfg, rng=jax.random.PRNGKey(0))
    bench_serving_lookup_adversarial(
        m, "tinyllama_1.1B_serving_lookup_adversarial_int8", 32000)
    del m
    import gc
    gc.collect()


def bench_beam_gpt2():
    """Zero-arg wrapper for the selective runner: re-measure the beam-3
    lines (plain XLA + fused layouts) after the round-5 iterated-argmax
    top-k (lax.top_k over (bsz, beam*V) was a ~150k-lane sort network;
    2*beam argmax+mask passes are linear reductions, bit-identical
    including tie order). The greedy b8 fused line re-runs alongside so
    the VERDICT r4 #7 target (beam3 <= 2x greedy per-ROW step cost) is
    checkable from one batch."""
    cfg = GPTConfig(vocab_size=50257, n_embd=768, n_positions=1024,
                    n_layer=12, n_head=12, n_ctx=1024,
                    compute_dtype="bfloat16", decode_unroll=12)
    model = GPTLMHeadModel(cfg, version="gpt2", rng=jax.random.PRNGKey(0))
    bench_beam(model, "gpt2_124M_beam3", 50257)
    fmodel = GPTLMHeadModel(
        GPTConfig(vocab_size=50257, n_embd=768, n_positions=1024, n_layer=12,
                  n_head=12, n_ctx=1024, compute_dtype="bfloat16",
                  fused_decode=True),
        version="gpt2", params=model.params)
    bench_beam(fmodel, "gpt2_124M_beam3_fused", 50257)
    bench_decode(fmodel, "gpt2_124M_decode_b8_fused", 8, 32, 128, 50257)
    del model, fmodel
    import gc
    gc.collect()


def bench_prompt_lookup_batched(model, name, vocab, B=8, gen=128, K=8):
    """b8 prompt-lookup vs plain b8 greedy on a repetitive continuation
    (per-row matching/acceptance — VERDICT r2 item 9). The workload is the
    regime prompt-lookup exists for: every row's greedy continuation cycles
    (probed from 48 random prompts in B-sized waves, scored by exact
    host-side acceptance simulation of the lookup matcher — raw repetition
    counts pick cycles longer than K that cap acceptance). K=8 spans the
    typical cycle, so full rounds commit up to K+1 tokens per row."""
    from cleantransformer_tpu.generation.speculative import (
        prompt_lookup_generate)
    model = _sharpen(model)
    rs = np.random.RandomState(0)
    plain_cfg = {"beam_size": 1, "max_gen_len": gen, "do_sample": False,
                 "pad_id": 0, "end_ids": None, "no_repeat_ngram_size": 0}
    # probe in B-sized waves (reuses the baseline's compiled program)
    scored = []
    for _ in range(48 // B):
        probe = rs.randint(1, vocab, (B, 16)).astype(np.int32)
        out = np.asarray(model.generate(probe, generation_configs=plain_cfg))
        for r in range(B):
            rep = _sim_lookup_tokens_per_round(out[r, 0], 16, K)
            scored.append((rep, probe[r]))
    scored.sort(key=lambda x: -x[0])
    ids = np.stack([p for _, p in scored[:B]], axis=0)  # (B, 16)

    out = model.generate(ids, generation_configs=plain_cfg)
    n_new = (out.shape[-1] - 16) * B
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        model.generate(ids, generation_configs=plain_cfg)
        times.append(time.perf_counter() - t0)
    base = n_new / max(min(times) - host_rtt(), 1e-9)

    cfg = {"max_gen_len": gen, "do_sample": False}
    out, stats = prompt_lookup_generate(model, ids, generation_configs=cfg,
                                        draft_len=K, return_stats=True)
    n_new = (out.shape[-1] - 16) * B
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        prompt_lookup_generate(model, ids, generation_configs=cfg,
                               draft_len=K)
        times.append(time.perf_counter() - t0)
    spec = n_new / max(min(times) - host_rtt(), 1e-9)
    record(name, spec, f"tokens/s (batch={B})",
           {"plain_tokens_per_sec": round(base, 1), "draft_len": K,
            "tokens_per_round_per_row": round(stats["tokens_per_round"], 2),
            "speedup": round(spec / base, 2)})


def bench_lookup_machinery(model, name, vocab, B=1, gen=128, K=8):
    """Speculation MACHINERY cost for families where no synthetic acceptance
    workload exists. ``_sharpen``'s tied-embedding trick does not transfer to
    llama: with untied lm_head and RoPE (no additive positional embedding to
    drown out), scaling any single weight multiplies the top-1/top-2 gap AND
    the bf16 program-to-program drift equally, and a random-init llama's
    greedy stream has ZERO n-gram repetition (measured: best of 12 probes
    sim 1.0 tokens/round) — prompt-lookup has nothing to accelerate there.

    Instead this measures the two workload-independent endpoints with real
    device cost:
    - plain b decode tokens/s (the model as given);
    - the lookup loop at FULL acceptance, forced bit-exactly by zeroing the
      lm_head: every logit row is exactly 0.0 in every compiled program
      (the matmuls still run — device cost is weight-value-independent), so
      argmax is deterministically token 0 in plain and verify programs alike
      and every round commits K+1 tokens.
    Derived: round cost in plain-step units (verify-round wall / plain-step
    wall — acceptance-independent, all shapes fixed) and the breakeven
    tokens/round. A trained model's real speedup ~ tokens_per_round /
    round_cost_plain_steps."""
    from cleantransformer_tpu.generation.speculative import (
        prompt_lookup_generate)
    rs = np.random.RandomState(0)
    ids = rs.randint(1, vocab, (B, 16)).astype(np.int32)
    plain_cfg = {"beam_size": 1, "max_gen_len": gen, "do_sample": False,
                 "pad_id": 0, "end_ids": None, "no_repeat_ngram_size": 0}
    out = model.generate(ids, generation_configs=plain_cfg)
    n_new = (out.shape[-1] - 16) * B
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        model.generate(ids, generation_configs=plain_cfg)
        times.append(time.perf_counter() - t0)
    plain_wall = min(times) - host_rtt()
    base = n_new / max(plain_wall, 1e-9)

    p = dict(model.params)
    zk = "lm_head" if "lm_head" in p else (
        "tokens_embed" if "tokens_embed" in p else "embed_tokens")
    p[zk] = jnp.zeros_like(p[zk])
    kw = {"params": p}
    if hasattr(model, "version"):
        kw["version"] = model.version
    zmodel = type(model)(model.config, **kw)

    cfg = {"max_gen_len": gen, "do_sample": False}
    out, stats = prompt_lookup_generate(zmodel, ids, generation_configs=cfg,
                                        draft_len=K, return_stats=True)
    n_new = (out.shape[-1] - 16) * B
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        prompt_lookup_generate(zmodel, ids, generation_configs=cfg,
                               draft_len=K)
        times.append(time.perf_counter() - t0)
    wall = min(times) - host_rtt()
    spec = n_new / max(wall, 1e-9)
    rounds = max(stats["rounds"], 1)
    round_cost_steps = (wall / rounds) / max(plain_wall / (gen - 1), 1e-9)
    record(name, spec, f"tokens/s (batch={B}, FORCED full acceptance)",
           {"plain_tokens_per_sec": round(base, 1), "draft_len": K,
            "tokens_per_round_per_row": round(stats["tokens_per_round"], 2),
            "speedup_at_full_acceptance": round(spec / base, 2),
            "round_cost_plain_steps": round(round_cost_steps, 2),
            "breakeven_tokens_per_round": round(round_cost_steps, 2)})


def bench_swa_long_context():
    """Mistral-class sliding-window attention at seq 4096: the windowed
    flash kernel (static window on the causal iota, key-block loop skips
    out-of-window blocks) vs the dense additive-mask path (O(S^2) mask
    materialization). fwd+bwd loss step, batch 2."""
    from cleantransformer_tpu.config import LlamaConfig
    from cleantransformer_tpu.models.llama import (
        LlamaForCausalLM, llama_lm_forward)
    B, S, W = 2, 4096, 1024
    base = dict(vocab_size=32000, hidden_size=1024, intermediate_size=2816,
                num_hidden_layers=8, num_attention_heads=8,
                num_key_value_heads=8, max_position_embeddings=S,
                sliding_window=W, compute_dtype="bfloat16")
    model = LlamaForCausalLM(LlamaConfig(**base, use_flash_attention=True),
                             rng=jax.random.PRNGKey(0))
    model._tie_weight()
    rs = np.random.RandomState(0)
    batch = {"input_ids": jnp.asarray(rs.randint(0, 32000, (B, S)), jnp.int32),
             "attention_mask": jnp.ones((B, S), jnp.int32)}
    batch["labels"] = batch["input_ids"]

    def timed(cfg):
        def loss_fn(params, b):
            (loss, _, _), _ = llama_lm_forward(
                params, cfg, b["input_ids"], b["attention_mask"],
                labels=b["labels"],
                remat="attn" if cfg.use_flash_attention else True)
            return loss

        grad = jax.jit(jax.value_and_grad(loss_fn))
        loss, _ = grad(model.params, batch)
        float(loss)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            loss, g = grad(model.params, batch)
            float(loss)
            times.append(time.perf_counter() - t0)
        del g
        return max(min(times) - host_rtt(), 1e-9)

    t_flash = timed(LlamaConfig(**base, use_flash_attention=True))
    t_dense = timed(LlamaConfig(**base, use_flash_attention=False))
    record("mistral_swa_4k_fwd_bwd_step_flash", t_flash * 1e3,
           f"ms (batch={B}, seq={S}, window={W}, bf16, fwd+bwd)",
           {"dense_ms": round(t_dense * 1e3, 1),
            "speedup_vs_dense": round(t_dense / t_flash, 2)})
    import gc
    gc.collect()


def bench_llama_longcontext():
    """tinyllama-1.1B-class LONG-CONTEXT decode (VERDICT r4 #1/#6): the
    bf16 head-major slab (XLA attention, measured at the HBM roofline) vs
    the int8 head-major slab streamed by the blocked GQA pallas kernel
    (ops/gqa_decode.py — int8 cache bytes read exactly once, dequant on the
    VMEM side; XLA int8 attention loses the saving to materialized convert
    buffers). Weights int8 in both so the cache stream is the variable.
    decode_only_step_ms (two-point slope) is the honest long-context
    number; per_step_ms folds prefill amortization over gen=64."""
    from cleantransformer_tpu.config import LlamaConfig
    from cleantransformer_tpu.models.llama import LlamaForCausalLM
    base = dict(vocab_size=32000, hidden_size=2048, intermediate_size=5632,
                num_hidden_layers=22, num_attention_heads=32,
                num_key_value_heads=4, max_position_embeddings=8192,
                compute_dtype="bfloat16", decode_unroll=22,
                decode_head_major=True, use_flash_attention=True,
                quantize_int8=True)
    m = LlamaForCausalLM(LlamaConfig(**base), rng=jax.random.PRNGKey(0))
    bench_decode(m, "tinyllama_ctx4k_b8_int8w_headmajor", 8, 4096, 64,
                 32000, two_point=True)
    bench_decode(m, "tinyllama_ctx8k_b8_int8w_headmajor", 8, 8000, 64,
                 32000, two_point=True)
    q = LlamaForCausalLM(LlamaConfig(**{**base, "kv_cache_int8": True}),
                         params=m.params)
    del m
    import gc
    gc.collect()
    bench_decode(q, "tinyllama_ctx4k_b8_int8w_int8kv_blocked", 8, 4096, 64,
                 32000, two_point=True)
    bench_decode(q, "tinyllama_ctx8k_b8_int8w_int8kv_blocked", 8, 8000, 64,
                 32000, two_point=True)
    del q
    gc.collect()


def bench_mistral_swa_ring_decode():
    """Mistral-class sliding-window DECODE (VERDICT r4 #1b): 8k prompt,
    window 4096. The ring cache (config.swa_ring_cache) keeps only ~window
    rows (write at pos % rows), so cache memory AND the per-step cache
    stream are window-bounded; the full-buffer path allocates/streams every
    position and only masks out-of-window keys. int8 weights, bf16
    head-major cache in both (ring doesn't compose with int8 KV)."""
    from cleantransformer_tpu.config import LlamaConfig
    from cleantransformer_tpu.models.llama import LlamaForCausalLM
    base = dict(vocab_size=32000, hidden_size=2048, intermediate_size=5632,
                num_hidden_layers=22, num_attention_heads=32,
                num_key_value_heads=4, max_position_embeddings=16384,
                sliding_window=4096, compute_dtype="bfloat16",
                decode_unroll=22, decode_head_major=True,
                use_flash_attention=True, quantize_int8=True)
    full = LlamaForCausalLM(LlamaConfig(**base), rng=jax.random.PRNGKey(0))
    bench_decode(full, "mistral_swa_ctx8k_b8_int8w_fullbuffer", 8, 8192, 64,
                 32000, two_point=True)
    ring = LlamaForCausalLM(LlamaConfig(**base, swa_ring_cache=True),
                            params=full.params)
    del full
    import gc
    gc.collect()
    bench_decode(ring, "mistral_swa_ctx8k_b8_int8w_ring", 8, 8192, 64,
                 32000, two_point=True)
    del ring
    gc.collect()


def bench_longctx_speculation():
    """Speculation x long context (VERDICT r4 #2 'done'): gpt2-class
    fused-int8 at ctx4k b8 — cache blocks exceed VMEM, so every plain step
    rides the blocked S==1 kernel and every lookup verify window the NEW
    blocked window kernel (round 5) instead of the ~125-fusion XLA path
    that made long-context verify rounds cost ~2 plain steps. Workload:
    8 repetitive seeds greedy-extended on-device to ~4k tokens (sharpened
    logits keep the cycles going), so prompt-lookup accepts at the long
    offset. Reports whole-call tokens/s AND the decode-only slope ratio
    (prefill is identical on both sides)."""
    from cleantransformer_tpu.generation.speculative import (
        prompt_lookup_generate)
    B, K, CTX = 8, 8, 4064
    cfg = GPTConfig(vocab_size=50257, n_embd=768, n_positions=4352,
                    n_layer=12, n_head=12, n_ctx=4352,
                    compute_dtype="bfloat16", decode_unroll=12,
                    fused_decode=True, quantize_int8=True)
    model = _sharpen(GPTLMHeadModel(cfg, version="gpt2",
                                    rng=jax.random.PRNGKey(0)))
    rs = np.random.RandomState(0)
    probe_cfg = {"beam_size": 1, "max_gen_len": 128, "do_sample": False,
                 "pad_id": 0, "end_ids": None, "no_repeat_ngram_size": 0}
    scored = []
    for _ in range(4):
        probe = rs.randint(1, 50257, (B, 16)).astype(np.int32)
        out = np.asarray(model.generate(probe, generation_configs=probe_cfg))
        for r in range(B):
            scored.append((_sim_lookup_tokens_per_round(out[r, 0], 16, K),
                           probe[r]))
    scored.sort(key=lambda x: -x[0])
    seeds = np.stack([p for _, p in scored[:B]], axis=0)
    long_out = np.asarray(model.generate(
        seeds, generation_configs={**probe_cfg, "max_gen_len": CTX - 16}))
    ids = long_out[:, 0, :CTX].astype(np.int32)      # (B, ~4k) cycling rows

    def plain(g):
        gcfg = {**probe_cfg, "max_gen_len": g}
        out = model.generate(ids, generation_configs=gcfg)
        n_new = out.shape[-1] - CTX
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            model.generate(ids, generation_configs=gcfg)
            times.append(time.perf_counter() - t0)
        return n_new, max(min(times) - host_rtt(), 1e-9)

    def spec(g):
        gcfg = {"max_gen_len": g, "do_sample": False}
        out, stats = prompt_lookup_generate(model, ids,
                                            generation_configs=gcfg,
                                            draft_len=K, return_stats=True)
        n_new = out.shape[-1] - CTX
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            prompt_lookup_generate(model, ids, generation_configs=gcfg,
                                   draft_len=K)
            times.append(time.perf_counter() - t0)
        return n_new, max(min(times) - host_rtt(), 1e-9), stats

    n64, tp64 = plain(64)
    n8, tp8 = plain(8)
    s64, ts64, stats = spec(64)
    s8, ts8, _ = spec(8)
    plain_slope = (tp64 - tp8) / max(n64 - n8, 1)
    spec_slope = (ts64 - ts8) / max(s64 - s8, 1)
    record("gpt2_ctx4k_b8_int8_prompt_lookup", B * s64 / ts64,
           "tokens/s (batch=8, ~4k ctx, blocked window verify)",
           {"plain_tokens_per_sec": round(B * n64 / tp64, 1),
            "draft_len": K,
            "tokens_per_round_per_row": round(stats["tokens_per_round"], 2),
            "speedup": round((B * s64 / ts64) / (B * n64 / tp64), 2),
            "decode_only_speedup": round(plain_slope / spec_slope, 2)})
    del model
    import gc
    gc.collect()


def bench_longctx_serving_lookup():
    """Serving speculation x long context (VERDICT r4 #2 'done'): lookup
    decode chunks at ~4k-token contexts ride the blocked window kernel
    inside continuous batching; plain engine on the identical workload for
    the denominator. Same extended-cycling-prompt workload as
    bench_longctx_speculation."""
    from cleantransformer_tpu.serving import ServingEngine
    B, K, CTX = 8, 8, 4000
    cfg = GPTConfig(vocab_size=50257, n_embd=768, n_positions=4352,
                    n_layer=12, n_head=12, n_ctx=4352,
                    compute_dtype="bfloat16", decode_unroll=12,
                    fused_decode=True, quantize_int8=True)
    model = _sharpen(GPTLMHeadModel(cfg, version="gpt2",
                                    rng=jax.random.PRNGKey(0)))
    rs = np.random.RandomState(0)
    probe_cfg = {"beam_size": 1, "max_gen_len": 128, "do_sample": False,
                 "pad_id": 0, "end_ids": None, "no_repeat_ngram_size": 0}
    scored = []
    for _ in range(4):
        probe = rs.randint(1, 50257, (B, 16)).astype(np.int32)
        out = np.asarray(model.generate(probe, generation_configs=probe_cfg))
        for r in range(B):
            scored.append((_sim_lookup_tokens_per_round(out[r, 0], 16, K),
                           probe[r]))
    scored.sort(key=lambda x: -x[0])
    seeds = np.stack([p for _, p in scored[:B]], axis=0)
    long_out = np.asarray(model.generate(
        seeds, generation_configs={**probe_cfg, "max_gen_len": CTX - 16}))
    prompts = [long_out[r, 0, :CTX].astype(np.int32).tolist()
               for r in range(B)]
    n_new = 64

    def run_engine(sp):
        eng = ServingEngine(model, max_slots=8, max_len=CTX + n_new,
                            prefill_buckets=(512,),
                            chunk_size=(8 if sp else 64),
                            pipeline="serial", max_dispatch_depth=8,
                            speculative=("lookup" if sp else None),
                            draft_len=K)
        # warm with a FULL-length prompt: _prefill_chunk's attention window
        # is static (host-known), so a ~4k prompt through 512-token buckets
        # is EIGHT distinct programs — a short warmup left them all to
        # compile inside the timed region (~40 s of the measured wall)
        eng.submit(prompts[0], max_new_tokens=4)
        list(eng.run())    # compile warmup (prefill + chunk programs)
        eng.fetches = 0
        eng.steps = 0
        plen = {eng.submit(p, max_new_tokens=n_new): len(p)
                for p in prompts}
        t0 = time.perf_counter()
        done = list(eng.run())
        dt = time.perf_counter() - t0
        gen = sum(len(t) - plen[rid] for rid, t in done)
        return gen / dt, dt, eng

    base_tps, _, _ = run_engine(False)
    tps, dt, eng = run_engine(True)
    record("gpt2_ctx4k_serving_lookup_tokens_per_sec", tps,
           "generated tokens/s (8 slots, ~4k ctx, blocked window chunks)",
           {"plain_engine_tokens_per_sec": round(base_tps, 1),
            "draft_len": K, "rounds": eng.steps, "wall_s": round(dt, 2),
            "speedup": round(tps / base_tps, 2)})
    del model
    import gc
    gc.collect()


def bench_gpt_int8kv_crossover():
    """VERDICT r4 #6: STATE the int8-KV long-context crossover. At ctx8k the
    int8 cache wins the decode-only slope (blocked kernel streams half the
    bytes) but pays prefill-side slab quantization + the flash path's
    transient dequant, so short generations lose end-to-end. Two-point
    timings (gen 8 vs 192) of both variants solve the generation length
    where total time crosses: int8 KV wins past it."""
    import gc
    lc = dict(vocab_size=50257, n_embd=768, n_positions=8192, n_layer=12,
              n_head=12, n_ctx=8192, compute_dtype="bfloat16",
              use_flash_attention=True, decode_unroll=12, fused_decode=True)
    rs = np.random.RandomState(0)
    ids = rs.randint(0, 50257, (8, 8000)).astype(np.int32)
    mask = np.ones((8, 8000), np.int32)

    def two_point(model):
        def timed(g):
            cfg = {"beam_size": 1, "max_gen_len": g, "do_sample": False,
                   "end_ids": None, "pad_id": 0, "no_repeat_ngram_size": 0}
            out = model.generate(ids, mask, generation_configs=cfg)
            n_new = out.shape[-1] - 8000
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                model.generate(ids, mask, generation_configs=cfg)
                times.append(time.perf_counter() - t0)
            return n_new, max(min(times) - host_rtt(), 1e-9)
        n_long, t_long = timed(192)
        n_short, t_short = timed(8)
        slope = (t_long - t_short) / max(n_long - n_short, 1)
        prefill = t_short - n_short * slope
        return prefill, slope, n_long, t_long

    m_bf = GPTLMHeadModel(GPTConfig(**lc), version="gpt2",
                          rng=jax.random.PRNGKey(0))
    p_bf, s_bf, n_bf, t_bf = two_point(m_bf)
    m_q = GPTLMHeadModel(GPTConfig(**lc, kv_cache_int8=True),
                         version="gpt2", params=m_bf.params)
    del m_bf
    gc.collect()
    p_q, s_q, n_q, t_q = two_point(m_q)
    cross = ((p_q - p_bf) / (s_bf - s_q)) if s_bf > s_q else float("inf")
    record("gpt2_ctx8k_int8kv_crossover_gen", round(cross, 1),
           "generated tokens (int8 KV beats bf16 end-to-end past this)",
           {"bf16_prefill_s": round(p_bf, 4),
            "bf16_decode_step_ms": round(s_bf * 1e3, 3),
            "int8kv_prefill_s": round(p_q, 4),
            "int8kv_decode_step_ms": round(s_q * 1e3, 3),
            "gen192_int8kv_tokens_per_sec": round(8 * n_q / t_q, 1),
            "gen192_bf16_tokens_per_sec": round(8 * n_bf / t_bf, 1)})
    del m_q
    gc.collect()


def bench_moe_decode():
    """Mixtral-class MoE DECODE + serving (VERDICT r4 #3): ragged vs dense
    dispatch at S==1 (with B*k replicas spread over E experts nearly every
    expert is hit, so both stream all expert bytes — the question is
    whether ragged's sort/gather overhead beats dense's E/k overcompute at
    8-32 tokens), and int8 expert weights (ops/quant.py quantizes the
    (L, E, D, I) stacks; the dequant rides the dispatch dots, so decode
    streams half the expert bytes). ~880M expert params: decode is
    weight-streaming-bound exactly like the dense tinyllama bench."""
    from cleantransformer_tpu.config import MixtralConfig
    from cleantransformer_tpu.models.llama import LlamaForCausalLM
    from cleantransformer_tpu.serving import ServingEngine
    import gc
    base = dict(vocab_size=32000, hidden_size=1024, intermediate_size=3584,
                num_hidden_layers=8, num_attention_heads=16,
                num_key_value_heads=4, max_position_embeddings=2048,
                num_local_experts=8, num_experts_per_tok=2,
                compute_dtype="bfloat16", decode_unroll=8,
                decode_head_major=True)
    m = LlamaForCausalLM(MixtralConfig(**base, moe_impl="dense"),
                         rng=jax.random.PRNGKey(0))
    bench_decode(m, "mixtral8x_decode_b8_bf16_dense", 8, 32, 128, 32000)
    r = LlamaForCausalLM(MixtralConfig(**base, moe_impl="ragged"),
                         params=m.params)
    del m
    gc.collect()
    bench_decode(r, "mixtral8x_decode_b8_bf16_ragged", 8, 32, 128, 32000)
    qd = LlamaForCausalLM(
        MixtralConfig(**base, moe_impl="dense", quantize_int8=True),
        params=r.params)
    bench_decode(qd, "mixtral8x_decode_b8_int8_dense", 8, 32, 128, 32000)
    qr = LlamaForCausalLM(
        MixtralConfig(**base, moe_impl="ragged", quantize_int8=True),
        params=r.params)
    del r
    gc.collect()
    bench_decode(qr, "mixtral8x_decode_b8_int8_ragged", 8, 32, 128, 32000)
    bench_decode(qr, "mixtral8x_decode_b32_int8_ragged", 32, 32, 128, 32000)
    del qr
    gc.collect()
    # production-serving datapoint on the DECODE-winning dispatch: at S==1
    # every expert is hit anyway (B*k replicas over E), so both impls
    # stream all expert bytes and dense's one batched einsum beats ragged's
    # sort + per-group grouped dots (measured 1.15 vs 2.96 ms b8 int8) —
    # dense is the decode/serving recipe, ragged the training one
    bench_serving(qd, "mixtral8x_serving_tokens_per_sec_int8_dense", 32000,
                  max_slots=24, chunk_size=64)
    del qd
    gc.collect()


def bench_speculative(model, draft, name, vocab, gen=128, K=4):
    """Batch-1 latency with speculative decoding vs plain greedy. With an
    untrained draft the acceptance rate has no meaning; the self-draft
    (draft=target) run bounds the machinery: it shows the max tokens/s the
    round structure can deliver at acceptance=1."""
    from cleantransformer_tpu.generation.speculative import speculative_generate
    # sharpen BOTH models (see _sharpen): with near-flat random-init logits
    # the acceptance depends on cross-program argmax luck and the bench is
    # compile-flaky; sharp logits pin the greedy stream (self-draft then
    # really measures the acceptance-1 round machinery)
    sharp = _sharpen(model)
    draft = sharp if draft is model else _sharpen(draft)
    model = sharp
    rs = np.random.RandomState(0)
    ids = rs.randint(1, vocab, (1, 16)).astype(np.int32)
    gcfg = {"max_gen_len": gen, "do_sample": False}

    out = model.generate(ids, generation_configs={
        "beam_size": 1, "max_gen_len": gen, "do_sample": False, "pad_id": 0,
        "end_ids": None, "no_repeat_ngram_size": 0})
    n_new = out.shape[-1] - 16
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        model.generate(ids, generation_configs={
            "beam_size": 1, "max_gen_len": gen, "do_sample": False,
            "pad_id": 0, "end_ids": None, "no_repeat_ngram_size": 0})
        times.append(time.perf_counter() - t0)
    base = n_new / max(min(times) - host_rtt(), 1e-9)

    out, stats = speculative_generate(model, draft, ids,
                                      generation_configs=gcfg, draft_len=K,
                                      return_stats=True)
    n_new = out.shape[-1] - 16
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        speculative_generate(model, draft, ids, generation_configs=gcfg,
                             draft_len=K)
        times.append(time.perf_counter() - t0)
    spec = n_new / max(min(times) - host_rtt(), 1e-9)
    record(name, spec, "tokens/s (batch=1)",
           {"plain_b1_tokens_per_sec": round(base, 1), "draft_len": K,
            "tokens_per_round": round(stats["tokens_per_round"], 2),
            "speedup": round(spec / base, 2)})


def main():
    # GPT-2 decode, batch sweep
    cfg = GPTConfig(vocab_size=50257, n_embd=768, n_positions=1024, n_layer=12,
                    n_head=12, n_ctx=1024, compute_dtype="bfloat16", decode_unroll=12)
    model = GPTLMHeadModel(cfg, version="gpt2", rng=jax.random.PRNGKey(0))
    for batch in (8, 32):
        bench_decode(model, f"gpt2_124M_decode_b{batch}", batch, 32, 128, 50257)
    bench_prefill(model, cfg)

    # whole-stack fused decode kernel (ops/fused_decode.py): one Pallas
    # program per token instead of ~125 XLA fusions per step
    fmodel = GPTLMHeadModel(
        GPTConfig(vocab_size=50257, n_embd=768, n_positions=1024, n_layer=12,
                  n_head=12, n_ctx=1024, compute_dtype="bfloat16",
                  fused_decode=True),
        version="gpt2", params=model.params)
    # batch 1 = interactive latency: the kernel's blocks collapse to
    # sublane 1 but it still beats the XLA per-layer path (which pays the
    # same ~125-fusion launch overhead for 1/8th the work)
    for batch in (1, 8, 32):
        bench_decode(fmodel, f"gpt2_124M_decode_b{batch}_fused", batch, 32,
                     128, 50257)
    # beam-3 (the reference's showcase mode): reorder is a batch-axis
    # gather on every layout, so beam rides the fused kernel too
    bench_beam(model, "gpt2_124M_beam3", 50257)
    bench_beam(fmodel, "gpt2_124M_beam3_fused", 50257)
    del fmodel

    # int8 weight-only quantized decode
    qcfg = GPTConfig(vocab_size=50257, n_embd=768, n_positions=1024, n_layer=12,
                     n_head=12, n_ctx=1024, compute_dtype="bfloat16",
                     decode_unroll=12, quantize_int8=True)
    qmodel = GPTLMHeadModel(qcfg, version="gpt2", rng=jax.random.PRNGKey(0))
    bench_decode(qmodel, "gpt2_124M_decode_b8_int8", 8, 32, 128, 50257)
    # b1 int8 XLA baseline so the b1 int8-fused line separates quantization
    # gain from fusion gain (ADVICE r3)
    bench_decode(qmodel, "gpt2_124M_decode_b1_int8", 1, 32, 128, 50257)
    del qmodel

    # int8 weights IN the fused kernel (per-column scales dequantize on the
    # dot operand — half the HBM stream at no extra kernel count)
    qfmodel = GPTLMHeadModel(
        GPTConfig(vocab_size=50257, n_embd=768, n_positions=1024, n_layer=12,
                  n_head=12, n_ctx=1024, compute_dtype="bfloat16",
                  fused_decode=True, quantize_int8=True),
        version="gpt2", params=model.params)
    for batch in (1, 8, 32):
        bench_decode(qfmodel, f"gpt2_124M_decode_b{batch}_int8_fused", batch,
                     32, 128, 50257)
    del qfmodel

    # LONG-CONTEXT decode (ctx 4k): the blocked kernel streams each layer's
    # cache through VMEM in key blocks (online-softmax partials) instead of
    # bailing to the XLA per-layer path; int8 KV halves the dominant cache
    # stream — the regime where it finally wins (VERDICT r3 weak #7)
    lc = dict(vocab_size=50257, n_embd=768, n_positions=8192, n_layer=12,
              n_head=12, n_ctx=8192, compute_dtype="bfloat16",
              use_flash_attention=True)
    lc0 = GPTLMHeadModel(GPTConfig(**lc, decode_unroll=12), version="gpt2",
                         rng=jax.random.PRNGKey(0))
    bench_decode(lc0, "gpt2_124M_decode_b8_ctx4k", 8, 4096, 64, 50257,
                 two_point=True)
    lc1 = GPTLMHeadModel(GPTConfig(**lc, fused_decode=True), version="gpt2",
                         params=lc0.params)
    bench_decode(lc1, "gpt2_124M_decode_b8_ctx4k_fused_blocked", 8, 4096,
                 64, 50257, two_point=True)
    # ctx 8k: the cache stream dominates everything else, so int8 KV's
    # halved stream wins END-TO-END here (at 4k it only wins decode-only)
    bench_decode(lc1, "gpt2_124M_decode_b8_ctx8k_fused_blocked", 8, 8000,
                 64, 50257, two_point=True)
    del lc1
    lc2 = GPTLMHeadModel(GPTConfig(**lc, fused_decode=True,
                                   kv_cache_int8=True),
                         version="gpt2", params=lc0.params)
    bench_decode(lc2, "gpt2_124M_decode_b8_ctx4k_fused_blocked_int8kv", 8,
                 4096, 64, 50257, two_point=True)
    bench_decode(lc2, "gpt2_124M_decode_b8_ctx8k_fused_blocked_int8kv", 8,
                 8000, 64, 50257, two_point=True)
    del lc0, lc2

    # Bloom-560m-class decode
    bcfg = BloomConfig(vocab_size=50432, hidden_size=1024, n_layer=24,
                       num_attention_heads=16, compute_dtype="bfloat16",
                       decode_unroll=24)
    bmodel = BloomForCausalLM(bcfg, rng=jax.random.PRNGKey(0))
    bmodel._tie_weight()
    bench_decode(bmodel, "bloom560m_decode_b8", 8, 32, 128, 50432)
    fbmodel = BloomForCausalLM(
        BloomConfig(vocab_size=50432, hidden_size=1024, n_layer=24,
                    num_attention_heads=16, compute_dtype="bfloat16",
                    fused_decode=True),
        params=bmodel.params)
    bench_decode(fbmodel, "bloom560m_decode_b8_fused", 8, 32, 128, 50432)
    # batch 1 (the bloom_interactive REPL shape): the XLA per-layer path's
    # ~176-fusion launch overhead dwarfs one row's compute (3.2 ms/step) —
    # the fused kernel is 2.7x faster bf16, 4.8x int8
    bench_decode(fbmodel, "bloom560m_decode_b1_fused", 1, 32, 128, 50432)
    bench_decode(fbmodel, "bloom560m_decode_b32_fused", 32, 32, 128, 50432)
    del fbmodel
    qfbmodel = BloomForCausalLM(
        BloomConfig(vocab_size=50432, hidden_size=1024, n_layer=24,
                    num_attention_heads=16, compute_dtype="bfloat16",
                    fused_decode=True, quantize_int8=True),
        params=bmodel.params)
    bench_decode(qfbmodel, "bloom560m_decode_b8_int8_fused", 8, 32, 128,
                 50432)
    bench_decode(qfbmodel, "bloom560m_decode_b1_int8_fused", 1, 32, 128,
                 50432)
    bench_decode(qfbmodel, "bloom560m_decode_b32_int8_fused", 32, 32, 128,
                 50432)
    del qfbmodel

    # Llama-family decode (TinyLlama-1.1B-class: GQA 32q/4kv heads, SwiGLU,
    # RoPE) — the GQA cache is 8x smaller than a full-head cache
    from cleantransformer_tpu.config import LlamaConfig
    from cleantransformer_tpu.models.llama import LlamaForCausalLM
    lcfg = LlamaConfig(vocab_size=32000, hidden_size=2048,
                       intermediate_size=5632, num_hidden_layers=22,
                       num_attention_heads=32, num_key_value_heads=4,
                       max_position_embeddings=2048,
                       compute_dtype="bfloat16", decode_unroll=22,
                       decode_head_major=True)
    lmodel = LlamaForCausalLM(lcfg, rng=jax.random.PRNGKey(0))
    bench_decode(lmodel, "tinyllama_1.1B_decode_b8", 8, 32, 128, 32000)

    # int8 weight-only decode IN THE MEMORY-BOUND REGIME (VERDICT r2 item
    # 8): tinyllama-1.1B b8 streams 2.2 GB bf16 weights/step at ~91% HBM bw
    # — halving the stream should approach ~1.8x
    del lmodel
    import gc as _gc
    _gc.collect()
    qlcfg = LlamaConfig(**{**dict(vocab_size=32000, hidden_size=2048,
                                  intermediate_size=5632,
                                  num_hidden_layers=22,
                                  num_attention_heads=32,
                                  num_key_value_heads=4,
                                  max_position_embeddings=2048,
                                  compute_dtype="bfloat16",
                                  decode_unroll=22,
                                  decode_head_major=True),
                          "quantize_int8": True})
    qlmodel = LlamaForCausalLM(qlcfg, rng=jax.random.PRNGKey(0))
    for b in (8, 32):
        bench_decode(qlmodel, f"tinyllama_1.1B_decode_b{b}_int8", b, 32, 128,
                     32000)
    # production-serving datapoint: continuous batching on the 1.1B int8
    # model through the head-major ragged cache path, provisioned slots
    bench_serving(qlmodel, "tinyllama_1.1B_serving_tokens_per_sec_int8",
                  32000, max_slots=24, chunk_size=64)
    # speculation on the WEIGHT-STREAMING-BOUND family: a (K+1)-token verify
    # streams the same 1.1 GB of int8 weights as ONE plain step, so
    # prompt-lookup's upside approaches tokens_per_round x plain (vs the
    # ~1.34-plain-step verify on fused GPT-2). No synthetic acceptance
    # workload exists for random-init llama (see bench_lookup_machinery) —
    # measure the machinery endpoints instead.
    bench_lookup_machinery(qlmodel, "tinyllama_1.1B_lookup_machinery_b1_int8",
                           32000, B=1, K=8)
    bench_lookup_machinery(qlmodel, "tinyllama_1.1B_lookup_machinery_b8_int8",
                           32000, B=8, K=8)
    # round 4: the machinery endpoint measured through the SERVING engine —
    # a 24-slot lookup verify round streams the same 1.1 GB of int8 weights
    # as one plain b24 step, so serving speculation upside on the 1.1B
    # family approaches tokens_per_round x (forced-acceptance ceiling here)
    bench_serving_lookup_machinery(
        qlmodel, "tinyllama_1.1B_serving_lookup_machinery_int8", 32000)
    # round 5: auto-fallback — random-init llama traffic has zero n-gram
    # repetition, the worst case for lookup; the EMA must detect it and
    # revert waves to plain chunks (>=0.95x plain vs ~1/1.3-1.8x without)
    bench_serving_lookup_adversarial(
        qlmodel, "tinyllama_1.1B_serving_lookup_adversarial_int8", 32000)
    del qlmodel
    _gc.collect()

    bench_serving(model, "gpt2_124M_serving_tokens_per_sec", 50257)
    # provisioned for the workload: 16 slots halve the wave count at
    # sub-linear per-step cost (b16 step ~1.3x a b8 step)
    bench_serving(model, "gpt2_124M_serving_tokens_per_sec_slots16", 50257,
                  max_slots=16)
    # fused decode kernel with ragged per-row offsets + in-kernel int8
    # dequant: serving device time halves; wall becomes RTT-bound
    fsmodel = GPTLMHeadModel(
        GPTConfig(vocab_size=50257, n_embd=768, n_positions=1024, n_layer=12,
                  n_head=12, n_ctx=1024, compute_dtype="bfloat16",
                  fused_decode=True, quantize_int8=True),
        version="gpt2", params=model.params)
    bench_serving(fsmodel, "gpt2_124M_serving_tokens_per_sec_fused_int8",
                  50257)
    # provisioned for the offered load: one slot per request = ONE admission
    # wave + one depth-8 decode dispatch + one harvest fetch; bigger chunks
    # cut host bookkeeping between enqueues
    bench_serving(fsmodel, "gpt2_124M_serving_tokens_per_sec_fused_int8_s24",
                  50257, max_slots=24, chunk_size=64)
    # round 4: speculation INSIDE the serving engine — lookup verify rounds
    # through the window kernel at full slot occupancy, on the repetitive
    # workload the feature targets (plain engine on the same workload is
    # the denominator)
    bench_serving_lookup(fsmodel,
                         "gpt2_124M_serving_lookup_fused_int8_s24", 50257)
    # round 4: prefix caching — 24 requests sharing a 448-token system
    # prompt, prefilled once and broadcast-seeded at admission vs
    # re-prefilled per request
    bench_serving_prefix(fsmodel,
                         "gpt2_124M_serving_prefix_fused_int8_s24", 50257)
    del fsmodel

    # speculative decoding: self-draft = acceptance-1 upper bound on the
    # round machinery; an untrained 2-layer draft (acceptance ~0) measures
    # the round-cost floor (a real trained draft lands between them)
    bench_speculative(model, model, "gpt2_124M_speculative_selfdraft_b1",
                      50257)
    dcfg = GPTConfig(vocab_size=50257, n_embd=768, n_positions=1024,
                     n_layer=2, n_head=12, n_ctx=1024,
                     compute_dtype="bfloat16")
    draft2 = GPTLMHeadModel(dcfg, version="gpt2", rng=jax.random.PRNGKey(1))
    bench_speculative(model, draft2, "gpt2_124M_speculative_2Ldraft_b1",
                      50257)
    bench_prompt_lookup(model, "gpt2_124M_prompt_lookup_b1", 50257)
    bench_prompt_lookup_batched(model, "gpt2_124M_prompt_lookup_b8", 50257)

    # round 4: speculation THROUGH the whole-stack window kernel
    # (ops/fused_decode._gpt_window_kernel): plain steps, draft catch-up,
    # and the (K+1)-token verify are ALL one-program paths now — the verify
    # round no longer costs ~2 plain steps of XLA fusion overhead
    sfmodel = GPTLMHeadModel(
        GPTConfig(vocab_size=50257, n_embd=768, n_positions=1024, n_layer=12,
                  n_head=12, n_ctx=1024, compute_dtype="bfloat16",
                  fused_decode=True),
        version="gpt2", params=model.params)
    bench_speculative(sfmodel, sfmodel,
                      "gpt2_124M_speculative_selfdraft_b1_fused", 50257)
    draft2f = GPTLMHeadModel(
        GPTConfig(vocab_size=50257, n_embd=768, n_positions=1024, n_layer=2,
                  n_head=12, n_ctx=1024, compute_dtype="bfloat16",
                  fused_decode=True),
        version="gpt2", params=draft2.params)
    bench_speculative(sfmodel, draft2f,
                      "gpt2_124M_speculative_2Ldraft_b1_fused", 50257)
    bench_prompt_lookup(sfmodel, "gpt2_124M_prompt_lookup_b1_fused", 50257,
                        K=8)
    bench_prompt_lookup_batched(sfmodel, "gpt2_124M_prompt_lookup_b8_fused",
                                50257)
    del sfmodel, draft2f
    # int8 weights compose with the window kernel (the convert rides the
    # dot operand in both the S==1 and window programs)
    qsf = GPTLMHeadModel(
        GPTConfig(vocab_size=50257, n_embd=768, n_positions=1024, n_layer=12,
                  n_head=12, n_ctx=1024, compute_dtype="bfloat16",
                  fused_decode=True, quantize_int8=True),
        version="gpt2", params=model.params)
    bench_speculative(qsf, qsf,
                      "gpt2_124M_speculative_selfdraft_b1_int8_fused", 50257)
    bench_prompt_lookup(qsf, "gpt2_124M_prompt_lookup_b1_int8_fused", 50257,
                        K=8)
    del qsf

    # free the inference models (params + cast caches) before the training
    # benches — the 560M SFT step needs most of the chip's HBM
    import gc
    del model, bmodel, draft2  # qmodel/lmodel freed right after their benches
    gc.collect()

    bench_llama_longcontext()
    bench_mistral_swa_ring_decode()
    bench_moe_decode()
    bench_longctx_speculation()
    bench_longctx_serving_lookup()
    bench_gpt_int8kv_crossover()

    bench_sft_step(use_flash=True)
    bench_sft_step(use_flash=False)
    bench_llama_sft(use_flash=True)
    bench_packed_sft()
    bench_packed_sft_bloom()
    bench_swa_long_context()
    bench_moe_sft("ragged")
    bench_moe_sft("dense")

    with open("/root/repo/BENCH_DETAILS.md", "w") as f:
        f.write("# Extended benchmarks (single chip)\n\n")
        f.write(f"device: {jax.devices()[0].device_kind} "
                "(measured ground truth: ~194 bf16 TFLOP/s, ~704 GiB/s HBM; "
                f"host tunnel RTT ~{host_rtt() * 1e3:.0f} ms is subtracted "
                "from per-call timings)\n\n")
        f.write(
            "fused decode (round 3, ops/fused_decode.py): config."
            "fused_decode runs the WHOLE stack as ONE Pallas program per "
            "generated token — per-layer weights + (L,B,T,D) head-major "
            "cache blocks pipeline HBM->VMEM while the (B,D) residual "
            "lives in VMEM scratch, attention batches all rows through "
            "leading-dim-merged head-collapse matmuls, and the current "
            "token's k/v (+ int8 scales) write IN-KERNEL into 8-row "
            "windows of the aliased cache buffers (scalar-prefetch index "
            "map) — no caller-side dynamic_update_slice. Replaces the "
            "~125-fusion XLA step (GPT-2 b8 0.63->0.39 ms; int8 weights "
            "dequantize IN-KERNEL: 0.19 ms). The kernel's VMEM claim is "
            "adaptive (vmem_claim): when the blocks AND the lm_head table "
            "fit together it claims only what it needs so XLA keeps the "
            "table parked across steps (~55 us lm_head+argmax vs ~122 us "
            "HBM re-read; a flat 110 MB claim evicted it). Ragged per-row "
            "offsets serve continuous batching via the legacy "
            "return-the-rows contract. int8 KV composes but measured as a "
            "LOSS below ~1k keys (keep kv_cache_int8 for memory, not "
            "speed at short contexts; at ctx4k the BLOCKED kernel makes it "
            "win - see the ctx4k lines). Round 4: beam search AND "
            "speculative ride the fused layout now; multi-token decode "
            "WINDOWS (verify S=K+1, catch-up, short chunks) run one "
            "whole-stack window program (_gpt_window_kernel: window k/v "
            "insert into the cache block in VMEM, per-query causal "
            "clamps); LONG CONTEXTS stream each layer's cache in "
            "~512-row key blocks with online-softmax partials "
            "(_gpt_blocked_kernel, grid (L, key-blocks)) instead of "
            "bailing to the XLA per-layer path - ctx4k b8 decode-only "
            "5.94 ms XLA -> 2.43 blocked bf16 -> 1.77 blocked int8-KV "
            "(the regime int8 KV finally wins; at ctx8k the int8-KV "
            "margin grows, 4.49 -> 3.78 — per_step_ms differences there "
            "are prefill amortization, the int8 prefill pays the 8k-slab "
            "cache quantization).\n\n"
            "llama head-major decode (round 3, config.decode_head_major): "
            "the llama family keeps the XLA decode path (GQA+RoPE in a "
            "Pallas whole-stack kernel isn't worth it at 91% HBM bw) but "
            "swaps the KV cache to (L, B, T, Hkv*hd): the per-(layer, "
            "head) cache writes of the 5D layout cost ~0.2 us per "
            "scattered half-lane tile-run (1.2 ms = 35% of a tinyllama "
            "int8 b32 step, profiled); head-major rows write ONE "
            "contiguous-lane run per (layer, batch), all layers batched "
            "into two post-scan dynamic-update-slices, and S==1 attention "
            "runs directly on the slab via a block-diagonal query "
            "expansion (two batched MXU matmuls, zero relayout copies — "
            "models/llama.py _gqa_attend_headmajor). tinyllama int8 b32 "
            "3.20->2.32 ms/step (+38%), int8 b8 1.95->1.65 (+18%), bf16 "
            "b8 3.39->3.24. Exact token equality vs the 5D path asserted "
            "in tests/test_head_major.py.\n\n")
        f.write(
            "decode roofline (re-profiled after the round-3 fused kernel): "
            "a b8 bf16 GPT-2 step is now THREE device ops — the fused "
            "kernel at 279 us (~82% of its ~230 us weight+cache HBM "
            "stream), the VMEM-parked lm_head+argmax fusion at 58 us, and "
            "~16 us of residual fusions; the caller-side KV "
            "dynamic-update-slices are gone (in-kernel aliased writes). "
            "b32 int8: kernel 262 us (weight stream ~118 us + cache "
            "~25 us + batched-row attention VPU), lm_head 57 us. "
            "Buffers/cache/rng are all built inside the one fused program "
            "(eager per-call dispatches were pure tunnel launch "
            "overhead).\n\n"
            "tinyllama 1.1B decode b8 streams 2.2 GB of bf16 weights/step "
            "at ~91% of the measured HBM bandwidth - large-model decode "
            "sits on the memory roofline.\n\n"
            "training roofline (round-4 re-profile, remat='dots_attn' is now "
            "the recipe - fastest of attn/dots_attn/dots = 255.0/250.3/"
            "272.1 ms incl RTT): the 227 ms device step decomposes into "
            "matmuls+remat-recompute ~127 ms (the 'bitcast_dynamic-"
            "update-slice' fusions ARE the dW matmuls at ~88% MXU), "
            "attention kernels ~53 ms (hd=64 caps them at ~20-25 TF/s - "
            "architecture-bound), CE ~27 ms (FLOP-bound vocab matmuls at "
            "peak; fused_ce measured ~even), optimizer ~14 ms at HBM "
            "roofline, plus a ~19 ms {1,2,0}-relayout add feeding the dW "
            "contractions (a custom-vjp LayerNorm bwd measured ZERO "
            "change - it is not LN-bound). The llama-class run (hd=128, "
            "SwiGLU) runs the flash kernels at full lane utilization - "
            "the bloom MFU is architecture-bound, not framework-bound. "
            "offload_optimizer='cpu' measured 282 ms -> 95 s/step on "
            "this TUNNELED chip (2.2 GB fp32 params round-trip a "
            "~50 MB/s link each step) - the recipe targets co-located "
            "hosts with PCIe.\n\n"
            "moe sft = same training recipe on a Mixtral-class sparse-MoE "
            "(8 experts, top-2): moe_impl='ragged' sorts token replicas "
            "by expert and runs each SwiGLU projection as ONE "
            "lax.ragged_dot grouped matmul (exact top-k compute); "
            "'dense' runs every expert on every token (E/k = 4x "
            "overcompute) - the parity/EP baseline.\n\n")
        f.write("serving = 24 mixed-length requests (prompts 8-64, 64 new "
                "tokens each)\nthrough 8 continuous-batching slots, "
                "compile-warm, PIPELINED host/device\noverlap (chunk N+1 "
                "dispatches before chunk N's results are fetched). On THIS\n"
                "tunnel the result fetch serializes behind enqueued "
                "compute, so pipelining\nshows no wall-clock gain here; it "
                "targets hosts with concurrent transfer.\n\n")
        f.write("speculative = greedy, batch 1, draft_len 4, bit-exact vs "
                "plain greedy.\nselfdraft (draft == target) bounds "
                "round-machinery overhead at full acceptance;\n2Ldraft "
                "(untrained 2-layer draft, ~0 acceptance) measures the "
                "round-cost floor —\na TRAINED draft accepting ~4 "
                "tokens/round projects to ~4x its tokens/s. (No\ntrained "
                "draft checkpoint is downloadable in this zero-egress "
                "environment; for\nGPT-2-small the 50k-vocab lm_head "
                "dominates the draft cost, so speculation\npays off more "
                "for larger targets.) The prompt-lookup workloads run on "
                "a\nlogit-SHARPENED copy of the random-init model "
                "(tokens_embed x16, _sharpen):\nnear-flat logits flip "
                "greedy argmax on bf16 summation-order differences\n"
                "between the plain (S==1) and verify (S==K+1) compiled "
                "programs, making\nacceptance compile-dependent (8.6 vs "
                "4.16 tok/round for identical code);\ndecisive argmax — "
                "what a trained model has — makes acceptance "
                "reproducible.\nALL speculative benches sharpen both "
                "models now (round 4). The *_fused lines\nroute plain "
                "steps, draft catch-up AND the (K+1)-token verify through "
                "the\nwhole-stack kernels: a verify round costs ~1.34 "
                "plain steps (was ~2), so\nprompt-lookup b1 goes 2.68x "
                "-> 3.46x. SELF-draft stays <1.0 STRUCTURALLY: a\nround "
                "is K+2 full-cost programs for at most K+1 tokens — "
                "speedup needs cheap\nproposals (lookup) or a small "
                "draft.\n\n")
        f.write("lookup_machinery (llama family) = the sharpening trick "
                "does NOT transfer to\nllama: with an untied lm_head and "
                "RoPE (no additive positional embedding to\ndrown out), "
                "scaling any one weight scales the top-1/top-2 gap and "
                "the bf16\nprogram-to-program drift equally, and a "
                "random-init llama's greedy stream has\nZERO n-gram "
                "repetition (best of 12 probes: 1.0 tokens/round) — "
                "there is no\nsynthetic acceptance workload. These lines "
                "instead measure the two\nworkload-independent endpoints: "
                "plain decode, and the lookup loop at FULL\nacceptance "
                "forced bit-exactly by zeroing lm_head (all logits are "
                "exactly 0.0 in\nevery compiled program, argmax is "
                "deterministically token 0, the matmuls still\nrun so "
                "device cost is unchanged). round_cost_plain_steps is "
                "acceptance-\nindependent (fixed shapes): a trained "
                "model's real speedup ~ its\ntokens_per_round / "
                "round_cost_plain_steps. The 1.1B verify round costs "
                "only\n~1.2 plain steps — weight streaming dominates, so "
                "an S=9 window is nearly free\nand speculation upside on "
                "the big-model family approaches tokens_per_round x.\n\n")
        f.write("```\n")
        for r in RESULTS:
            f.write(json.dumps(r) + "\n")
        f.write("```\n")


if __name__ == "__main__":
    if len(sys.argv) > 1:
        # selective run: `python bench_suite.py bench_llama_longcontext ...`
        # runs only the named zero-arg bench functions and APPENDS their
        # json lines to BENCH_DETAILS.md (the full run rewrites the file)
        for fn_name in sys.argv[1:]:
            done = len(RESULTS)
            try:
                globals()[fn_name]()
            except Exception as e:   # keep the batch alive; flush what ran
                import traceback
                traceback.print_exc()
                print(f"BENCH FAIL {fn_name}: {e!r}", file=sys.stderr)
            if len(RESULTS) > done:
                with open("/root/repo/BENCH_DETAILS.md", "a") as f:
                    f.write("\n```\n")
                    for r in RESULTS[done:]:
                        f.write(json.dumps(r) + "\n")
                    f.write("```\n")
    else:
        main()
