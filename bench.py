"""Headline benchmark: GPT-2 (124M) greedy decode throughput, tokens/sec/chip.

Runs our jitted lax.while_loop decode (fixed-shape KV cache, bf16 compute) on
the available accelerator, and — for vs_baseline — times the PyTorch
reference implementation's decode loop (examples/inference_gpt2.py path:
GenerationMixin._greedy_search with concat-grow KV cache) on the same host
(torch is CPU-only in this image; the reference publishes no numbers of its
own — BASELINE.md).

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import numpy as np

BATCH = 8
PROMPT_LEN = 32
GEN_LEN = 128
GPT2_SMALL = dict(vocab_size=50257, n_embd=768, n_positions=1024, n_layer=12,
                  n_head=12, n_ctx=1024)


def bench_ours():
    sys.path.insert(0, "/root/repo")
    import jax
    # persistent compilation cache: axon remote-compiles are slow (~minutes
    # for the decode loop); warm runs load from disk in seconds
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from cleantransformer_tpu.config import GPTConfig
    from cleantransformer_tpu.models.gpt import GPTLMHeadModel

    # fused_decode: the whole-stack Pallas decode kernel (ops/fused_decode.py)
    # — one program per token instead of ~125 XLA fusions, 0.63 -> 0.48
    # ms/step at b8 (BENCH_DETAILS.md)
    cfg = GPTConfig(**GPT2_SMALL, compute_dtype="bfloat16", decode_unroll=12,
                    fused_decode=True)
    model = GPTLMHeadModel(cfg, version="gpt2", rng=jax.random.PRNGKey(0))
    rs = np.random.RandomState(0)
    ids = rs.randint(0, cfg.vocab_size, (BATCH, PROMPT_LEN)).astype(np.int32)
    mask = np.ones((BATCH, PROMPT_LEN), np.int32)
    gen = {"beam_size": 1, "max_gen_len": GEN_LEN, "do_sample": False,
           "end_ids": None, "pad_id": 0, "no_repeat_ngram_size": 0}

    out = model.generate(ids, mask, generation_configs=gen)  # compile+run
    n_new = out.shape[-1] - PROMPT_LEN
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = model.generate(ids, mask, generation_configs=gen)
        times.append(time.perf_counter() - t0)
    dt = min(times)
    return BATCH * n_new / dt


def bench_reference():
    sys.path.insert(0, "/root/reference")
    import torch
    from CleanTransformer.models.modeling_gpt import GPTLMHeadModel as RefGPT, GPTConfig as RefCfg

    torch.manual_seed(0)
    cfg = RefCfg(**GPT2_SMALL, embd_pdrop=0.0, attn_pdrop=0.0, resid_pdrop=0.0)
    model = RefGPT(cfg, version="gpt2")
    model.eval()
    rs = np.random.RandomState(0)
    ids = torch.tensor(rs.randint(0, cfg.vocab_size, (BATCH, PROMPT_LEN)))
    mask = torch.ones(BATCH, PROMPT_LEN, dtype=torch.long)
    ref_gen_len = 16  # short run, per-token cost is flat with KV cache
    gen = {"beam_size": 1, "max_gen_len": ref_gen_len, "do_sample": False,
           "end_ids": None, "pad_id": 0, "no_repeat_ngram_size": 0}
    with torch.no_grad():
        model.generate(ids, attention_mask=mask,
                       generation_configs={**gen, "max_gen_len": 2})  # warmup
        t0 = time.perf_counter()
        out = model.generate(ids, attention_mask=mask, generation_configs=gen)
        dt = time.perf_counter() - t0
    n_new = out.shape[-1] - PROMPT_LEN
    return BATCH * n_new / dt


def main():
    ours = bench_ours()
    try:
        ref = bench_reference()
    except Exception:
        ref = None
    result = {
        "metric": "gpt2_124M_greedy_decode_tokens_per_sec_per_chip",
        "value": round(ours, 1),
        "unit": "tokens/s (batch=8, prompt=32, gen=128, bf16)",
        "vs_baseline": round(ours / ref, 2) if ref else None,
    }
    # Ceiling note (stderr; stdout stays one JSON line): on this tunneled
    # host, wall = device decode (~47 ms for gen=128) + ONE ~26 ms host RTT,
    # so even zero device time caps this metric at ~1.5x its current value.
    # Device-side wins past that show up in BENCH_DETAILS.md (fused/int8/
    # serving/speculative lines), not here.
    print("note: e2e metric is tunnel-RTT-bound (wall = device + ~26 ms RTT); "
          "see BENCH_DETAILS.md for device-side paths", file=sys.stderr)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
