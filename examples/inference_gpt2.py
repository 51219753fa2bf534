"""GPT-2 inference example (reference: examples/inference_gpt2.py).

Loads an HF gpt2 checkpoint directory (config.json + model.safetensors or
pytorch_model.bin) and runs batched beam-search sampling generation with
ngram/top-k/top-p, or --demo mode with random weights (no checkpoint needed).

  python examples/inference_gpt2.py --model_dir checkpoints/gpt2
  python examples/inference_gpt2.py --demo
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def load_model(config, model_dir):
    from cleantransformer_tpu.models.gpt import GPTLMHeadModel
    from cleantransformer_tpu.utils.hf_loader import (
        load_checkpoint_dir, gpt_params_from_state_dict)
    sd = load_checkpoint_dir(model_dir)
    params = gpt_params_from_state_dict(sd, config)
    return GPTLMHeadModel(config, version="gpt2", params=params)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_dir", type=str, default=None)
    parser.add_argument("--demo", action="store_true",
                        help="random small weights, no checkpoint needed")
    args, _ = parser.parse_known_args()

    import jax
    from cleantransformer_tpu.config import GPTConfig

    texts = ["Hello, I'm a language model,", "The weather is fine today,"]

    if args.demo or not args.model_dir:
        config = GPTConfig(vocab_size=50257, n_embd=256, n_positions=512,
                           n_layer=4, n_head=8, n_ctx=512)
        from cleantransformer_tpu.models.gpt import GPTLMHeadModel
        model = GPTLMHeadModel(config, version="gpt2", rng=jax.random.PRNGKey(0))
        tokenizer = None
    else:
        config = GPTConfig.from_json(os.path.join(args.model_dir, "config.json"))
        model = load_model(config, args.model_dir)
        from transformers import GPT2Tokenizer
        tokenizer = GPT2Tokenizer.from_pretrained(args.model_dir, padding_side="left")
        tokenizer.pad_token_id = 0

    if tokenizer is not None:
        enc = tokenizer(texts, return_tensors="np", padding=True)
        input_ids = enc["input_ids"].astype(np.int32)
        attention_mask = enc["attention_mask"].astype(np.int32)
        end_ids = tokenizer.convert_tokens_to_ids("<|endoftext|>")
    else:
        rs = np.random.RandomState(0)
        input_ids = rs.randint(0, config.vocab_size, (2, 8)).astype(np.int32)
        attention_mask = np.ones_like(input_ids)
        end_ids = None

    generation_configs = {
        "beam_size": 3, "max_gen_len": 100, "end_ids": end_ids, "pad_id": 0,
        "no_repeat_ngram_size": 2, "do_sample": True, "temperature": 0.8,
        "top_k": 10, "top_p": 0.8,
    }
    out = model.generate(input_ids, attention_mask,
                         generation_configs=generation_configs)
    print(np.asarray(out).tolist() if tokenizer is None else "")
    if tokenizer is not None:
        for i, beams in enumerate(np.asarray(out)):
            print("batch index:", i)
            for j, seq in enumerate(beams):
                print("beam:", j, tokenizer.decode(seq.tolist(),
                                                   skip_special_tokens=True))


if __name__ == "__main__":
    main()
