"""Continuous-batching serving demo (extension beyond the reference, which
serves one batch per generate() call — see bloom_interactive.py for its
interactive REPL).

Feeds a stream of variable-length prompts through the slot-pool serving
engine; requests are admitted as slots free up, so the batch stays full.

  python examples/serve_gpt2.py --model_dir checkpoints/gpt2 --requests 16
  python examples/serve_gpt2.py --demo
  # prompt-lookup speculation inside the engine (verify rounds instead of
  # single-token steps; greedy bit-exact, sampling exact in distribution)
  python examples/serve_gpt2.py --demo --speculative lookup
  # shared system prompt computed once (prefix caching)
  python examples/serve_gpt2.py --demo --prefix_len 64
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_dir", type=str, default=None)
    parser.add_argument("--demo", action="store_true",
                        help="random small weights, no checkpoint needed")
    parser.add_argument("--requests", type=int, default=16)
    parser.add_argument("--slots", type=int, default=4)
    parser.add_argument("--max_new_tokens", type=int, default=32)
    parser.add_argument("--do_sample", action="store_true")
    parser.add_argument("--bf16", action="store_true")
    parser.add_argument("--speculative", type=str, default=None,
                        choices=["lookup"],
                        help="decode chunks run prompt-lookup speculation "
                             "rounds (propose from each slot's committed "
                             "stream, verify K+1 tokens in one forward)")
    parser.add_argument("--prefix_len", type=int, default=0,
                        help="share a system prompt of this many tokens "
                             "across all requests and register it once "
                             "(prefix caching — admission seeds the KV "
                             "from the store and prefills only the tail)")
    args = parser.parse_args()

    import jax
    from cleantransformer_tpu.config import GPTConfig
    from cleantransformer_tpu.models.gpt import GPTLMHeadModel
    from cleantransformer_tpu.serving import ServingEngine

    if args.demo or not args.model_dir:
        config = GPTConfig(vocab_size=5000, n_embd=128, n_positions=512,
                           n_layer=4, n_head=4, n_ctx=512,
                           compute_dtype="bfloat16" if args.bf16 else "float32")
        model = GPTLMHeadModel(config, version="gpt2",
                               rng=jax.random.PRNGKey(0))
        tokenizer = None
    else:
        from cleantransformer_tpu.config import GPTConfig
        from examples.inference_gpt2 import load_model  # noqa
        config = GPTConfig.from_json(
            os.path.join(args.model_dir, "config.json"),
            compute_dtype="bfloat16" if args.bf16 else "float32")
        model = load_model(config, args.model_dir)
        tokenizer = None  # plug an HF tokenizer here if available

    eng = ServingEngine(model, max_slots=args.slots, max_len=256,
                        prefill_buckets=(16, 32, 64), chunk_size=8,
                        do_sample=args.do_sample,
                        speculative=args.speculative)

    rs = np.random.RandomState(0)
    prefix = rs.randint(1, config.vocab_size,
                        (args.prefix_len,)).tolist() if args.prefix_len else []
    if prefix:
        eng.register_prefix(prefix)
    prompts = [prefix + rs.randint(1, config.vocab_size, (int(n),)).tolist()
               for n in rs.randint(4, 48, args.requests)]
    rids = {eng.submit(p, max_new_tokens=args.max_new_tokens): i
            for i, p in enumerate(prompts)}

    t0 = time.perf_counter()
    n_done, gen_tokens = 0, 0
    for rid, tokens in eng.run():
        i = rids[rid]
        gen = len(tokens) - len(prompts[i])
        gen_tokens += gen
        n_done += 1
        print(f"request {i:3d}: prompt {len(prompts[i]):3d} tokens "
              f"-> +{gen} generated   (slots busy: {eng.utilization():.0%})")
    dt = time.perf_counter() - t0
    print(f"\n{n_done} requests, {gen_tokens} generated tokens in {dt:.2f}s "
          f"({gen_tokens / dt:.0f} tok/s incl. compile)")


if __name__ == "__main__":
    main()
