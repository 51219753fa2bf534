"""Ad-hoc device profiles for the round-5 perf items (run on the real chip,
one at a time — the axon tunnel is single-client):

    python scripts/profile_decode.py beam        # VERDICT r4 #7
    python scripts/profile_decode.py llama_sft   # VERDICT r4 #5

``beam`` traces a beam-3 fused GPT-2 generate (the reference's showcase
config, examples/inference_gpt2.py:63-86) and prints per-STEP device-op
costs next to the greedy b8 equivalent — the decomposition that says where
the ~6x per-row gap lives (suspects: full-vocab log-softmax + 2*beam
lax.top_k, and the per-step (L, B*beam, T, D) cache-reorder gather).

``llama_sft`` traces one llama-360m fused train step (b8 s1024,
flash + dots_attn remat) and prints the op table that pins the residual
~70 ms the analytic roofline (BENCH_DETAILS "training roofline") does not
explain.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from cleantransformer_tpu.utils.profiling import trace, summarize_trace


def profile_beam():
    from cleantransformer_tpu.config import GPTConfig
    from cleantransformer_tpu.models.gpt import GPTLMHeadModel
    cfg = GPTConfig(vocab_size=50257, n_embd=768, n_positions=1024,
                    n_layer=12, n_head=12, n_ctx=1024,
                    compute_dtype="bfloat16", decode_unroll=12,
                    fused_decode=True)
    model = GPTLMHeadModel(cfg, version="gpt2", rng=jax.random.PRNGKey(0))
    rs = np.random.RandomState(0)
    ids = rs.randint(1, 50257, (2, 16)).astype(np.int32)
    gen = 64
    gcfg = {"beam_size": 3, "max_gen_len": gen, "do_sample": False,
            "pad_id": 0, "end_ids": None, "no_repeat_ngram_size": 2}
    model.generate(ids, generation_configs=gcfg)  # compile
    with trace("/tmp/jax-trace-beam") as d:
        np.asarray(model.generate(ids, generation_configs=gcfg))
    rows = summarize_trace(d, top=30, per=gen)
    print(json.dumps({"profile": "beam3_fused_per_step_us", "ops": rows},
                     indent=1))


def profile_llama_sft():
    import functools
    from cleantransformer_tpu.config import LlamaConfig
    from cleantransformer_tpu.models.llama import (LlamaForCausalLM,
                                                   llama_lm_forward)
    from cleantransformer_tpu.optim import adamw_decoupled
    cfg = LlamaConfig(vocab_size=32000, hidden_size=1280,
                      intermediate_size=3456, num_hidden_layers=16,
                      num_attention_heads=10, num_key_value_heads=10,
                      max_position_embeddings=2048,
                      compute_dtype="bfloat16", use_flash_attention=True)
    model = LlamaForCausalLM(cfg, rng=jax.random.PRNGKey(0))
    model._tie_weight()
    init_fn, update_fn = adamw_decoupled(lr=1e-5)
    opt_state = init_fn(model.params)
    B, S = 8, 1024
    rs = np.random.RandomState(0)
    ids = jnp.asarray(rs.randint(0, 32000, (B, S)), jnp.int32)

    def loss_fn(params, ids_):
        (loss, _, _), _ = llama_lm_forward(params, cfg, ids_,
                                           jnp.ones_like(ids_), labels=ids_,
                                           remat="dots_attn")
        return loss

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, ids_):
        loss, grads = jax.value_and_grad(loss_fn)(params, ids_)
        params, opt_state = update_fn(grads, opt_state, params)
        return params, opt_state, loss

    params = model.params
    params, opt_state, loss = step(params, opt_state, ids)
    float(loss)
    with trace("/tmp/jax-trace-llama-sft") as d:
        params, opt_state, loss = step(params, opt_state, ids)
        float(loss)
    rows = summarize_trace(d, top=30, per=1)
    print(json.dumps({"profile": "llama360m_sft_step_us", "ops": rows},
                     indent=1))


def profile_gqa_blocked(ctx=8000):
    """Round-5 diagnosis: the blocked int8-KV GQA kernel measured SLOWER
    than the bf16 XLA head-major path at ctx4k/ctx8k (BENCH_DETAILS
    tinyllama_ctx* lines) despite streaming half the cache bytes. Trace one
    decode-only window of both variants and print per-step op tables —
    bytes_accessed on the pallas call vs the int8 slab size says whether
    the DMA pads the (TK, Hkv=4) scale blocks; per-op durations say whether
    the 22 per-layer kernel launches + XLA epilogue fusions eat the
    saving."""
    from cleantransformer_tpu.config import LlamaConfig
    from cleantransformer_tpu.models.llama import LlamaForCausalLM
    import gc
    base = dict(vocab_size=32000, hidden_size=2048, intermediate_size=5632,
                num_hidden_layers=22, num_attention_heads=32,
                num_key_value_heads=4, max_position_embeddings=8192,
                compute_dtype="bfloat16", decode_unroll=22,
                decode_head_major=True, use_flash_attention=True,
                quantize_int8=True)
    rs = np.random.RandomState(0)
    ids = rs.randint(0, 32000, (8, ctx)).astype(np.int32)
    mask = np.ones((8, ctx), np.int32)
    gen = 8   # the bench's short-gen point — its programs are cache-warm
    gcfg = {"beam_size": 1, "max_gen_len": gen, "do_sample": False,
            "end_ids": None, "pad_id": 0, "no_repeat_ngram_size": 0}
    for tag, kw in (("bf16kv_xla", {}),
                    ("int8kv_blocked", {"kv_cache_int8": True})):
        m = LlamaForCausalLM(LlamaConfig(**{**base, **kw}),
                             rng=jax.random.PRNGKey(0))
        np.asarray(m.generate(ids, mask, generation_configs=gcfg))  # warm
        with trace(f"/tmp/jax-trace-gqa-{tag}") as d:
            np.asarray(m.generate(ids, mask, generation_configs=gcfg))
        rows = summarize_trace(d, top=25, per=gen)
        print(json.dumps({"profile": f"tinyllama_ctx{ctx}_{tag}_per_step_us",
                          "ops": rows}, indent=1))
        del m
        gc.collect()


if __name__ == "__main__":
    {"beam": profile_beam, "llama_sft": profile_llama_sft,
     "gqa_blocked": profile_gqa_blocked}[sys.argv[1]]()
