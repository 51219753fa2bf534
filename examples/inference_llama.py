"""Llama-family inference example (extension — the reference stops at Bloom;
same CLI shape as examples/inference_bloom.py so switching users feel at home).

  python examples/inference_llama.py --model_dir checkpoints/llama-2-7b-hf
  python examples/inference_llama.py --demo
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def load_config(config_fn, **overrides):
    # model_type dispatch: llama / mistral / mixtral / qwen2 checkpoints all
    # load here (qwen2 needs its bias/window field handling)
    from cleantransformer_tpu.config import auto_config
    return auto_config(config_fn, **overrides)


def load_model(config, model_dir):
    from cleantransformer_tpu.models.llama import LlamaForCausalLM
    from cleantransformer_tpu.utils.hf_loader import (
        load_checkpoint_dir, llama_params_from_state_dict)
    sd = load_checkpoint_dir(model_dir)
    params = llama_params_from_state_dict(sd, config)
    return LlamaForCausalLM(config, params=params)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_dir", type=str, default=None)
    parser.add_argument("--demo", action="store_true")
    parser.add_argument("--int8", action="store_true",
                        help="int8 weight-only quantized decode "
                             "(quantize_int8; halves the weight stream)")
    parser.add_argument("--int8_kv", action="store_true",
                        help="int8 KV cache (kv_cache_int8; halves cache "
                             "memory — wins speed past ~4k-key contexts "
                             "via the blocked GQA kernel)")
    parser.add_argument("--ring", action="store_true",
                        help="sliding-window RING cache (swa_ring_cache; "
                             "Mistral-style checkpoints: cache memory and "
                             "per-step stream bounded by the window)")
    parser.add_argument("--moe_impl", type=str, default=None,
                        choices=["dense", "capacity", "ragged"],
                        help="MoE dispatch for Mixtral checkpoints. For "
                             "DECODE/serving pick 'dense': at S==1 every "
                             "expert is hit so both impls stream all expert "
                             "bytes, and dense's one batched einsum beats "
                             "ragged's sort + grouped dots (measured 1.15 "
                             "vs 2.96 ms b8 int8, BENCH_DETAILS). 'ragged' "
                             "(lax.ragged_dot grouped matmuls) wins "
                             "TRAINING, where the E/k overcompute of dense "
                             "is real FLOPs (128 vs 161 ms).")
    args, _ = parser.parse_known_args()

    import jax
    from cleantransformer_tpu.config import LlamaConfig

    overrides = {"compute_dtype": "bfloat16", "decode_head_major": True,
                 "use_flash_attention": True}
    if args.int8:
        overrides["quantize_int8"] = True
    if args.int8_kv:
        overrides["kv_cache_int8"] = True
    if args.ring:
        overrides["swa_ring_cache"] = True
    if args.moe_impl:
        overrides["moe_impl"] = args.moe_impl

    texts = ["when we talk about something for the first time,",
             "New York City plans to"]

    if args.demo or not args.model_dir:
        config = LlamaConfig(vocab_size=4096, hidden_size=256,
                             intermediate_size=688, num_hidden_layers=4,
                             num_attention_heads=8, num_key_value_heads=4,
                             **{k: v for k, v in overrides.items()
                                if k != "swa_ring_cache"})
        from cleantransformer_tpu.models.llama import LlamaForCausalLM
        model = LlamaForCausalLM(config, rng=jax.random.PRNGKey(0))
        tokenizer = None
        rs = np.random.RandomState(0)
        input_ids = rs.randint(0, config.vocab_size, (2, 8)).astype(np.int32)
        attention_mask = np.ones_like(input_ids)
        eos, pad = 2, 0
    else:
        config = load_config(os.path.join(args.model_dir, "config.json"),
                             **overrides)
        model = load_model(config, args.model_dir)
        try:
            from transformers import AutoTokenizer
            tokenizer = AutoTokenizer.from_pretrained(args.model_dir,
                                                      padding_side="left")
        except Exception:
            # weights-only dir (e.g. ft_llama.py --demo output carries no
            # tokenizer files): still runnable on raw ids
            tokenizer = None
        if tokenizer is not None:
            if tokenizer.pad_token_id is None:
                tokenizer.pad_token = tokenizer.eos_token
            enc = tokenizer(texts, return_tensors="np", padding=True)
            input_ids = enc["input_ids"].astype(np.int32)
            attention_mask = enc["attention_mask"].astype(np.int32)
            eos, pad = tokenizer.eos_token_id, tokenizer.pad_token_id
        else:
            rs = np.random.RandomState(0)
            input_ids = rs.randint(
                0, config.vocab_size, (2, 8)).astype(np.int32)
            attention_mask = np.ones_like(input_ids)
            eos, pad = config.eos_token_id, 0

    generation_configs = {
        "beam_size": 1, "max_gen_len": 100, "end_ids": eos, "pad_id": pad,
        "early_stop": True, "do_sample": True,
        "temperature": 0.8, "top_k": 10, "top_p": 0.8,
    }
    out = model.generate(input_ids, attention_mask,
                         generation_configs=generation_configs)
    print(np.asarray(out).tolist() if tokenizer is None else "")
    if tokenizer is not None:
        for beams in np.asarray(out):
            for i, seq in enumerate(beams):
                print("beam:", i, tokenizer.decode(seq.tolist(),
                                                   skip_special_tokens=True))


if __name__ == "__main__":
    main()
