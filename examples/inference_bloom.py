"""Bloom inference example (reference: examples/inference_bloom.py).

  python examples/inference_bloom.py --model_dir checkpoints/bloom-560m
  python examples/inference_bloom.py --demo
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def load_config(config_fn, **overrides):
    from cleantransformer_tpu.config import load_bloom_config
    return load_bloom_config(config_fn, **overrides)


def load_model(config, model_dir):
    from cleantransformer_tpu.models.bloom import BloomForCausalLM
    from cleantransformer_tpu.utils.hf_loader import (
        load_checkpoint_dir, bloom_params_from_state_dict)
    sd = load_checkpoint_dir(model_dir)
    params = bloom_params_from_state_dict(sd, config)
    return BloomForCausalLM(config, params=params)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_dir", type=str, default=None)
    parser.add_argument("--demo", action="store_true")
    args, _ = parser.parse_known_args()

    import jax
    from cleantransformer_tpu.config import BloomConfig

    texts = ["when we talk about something for the first time,",
             "New York City plans to"]

    if args.demo or not args.model_dir:
        config = BloomConfig(vocab_size=4096, hidden_size=256, n_layer=4,
                             num_attention_heads=8)
        from cleantransformer_tpu.models.bloom import BloomForCausalLM
        model = BloomForCausalLM(config, rng=jax.random.PRNGKey(0))
        model._tie_weight()
        tokenizer = None
        rs = np.random.RandomState(0)
        input_ids = rs.randint(0, config.vocab_size, (2, 8)).astype(np.int32)
        attention_mask = np.ones_like(input_ids)
        eos, pad = 2, 3
    else:
        config = load_config(os.path.join(args.model_dir, "config.json"))
        model = load_model(config, args.model_dir)
        try:
            from transformers import BloomTokenizerFast
            tokenizer = BloomTokenizerFast.from_pretrained(args.model_dir,
                                                           padding_side="left")
        except Exception:
            # weights-only dir (e.g. ft_bloom.py --demo output carries no
            # tokenizer files): still runnable on raw ids
            tokenizer = None
        if tokenizer is not None:
            enc = tokenizer(texts, return_tensors="np", padding=True)
            input_ids = enc["input_ids"].astype(np.int32)
            attention_mask = enc["attention_mask"].astype(np.int32)
            eos, pad = tokenizer.eos_token_id, tokenizer.pad_token_id
        else:
            rs = np.random.RandomState(0)
            input_ids = rs.randint(
                0, config.vocab_size, (2, 8)).astype(np.int32)
            attention_mask = np.ones_like(input_ids)
            eos, pad = config.eos_token_id, 3

    generation_configs = {
        "beam_size": 1, "max_gen_len": 100, "end_ids": eos, "pad_id": pad,
        "early_stop": True, "no_repeat_ngram_size": 2, "do_sample": True,
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
