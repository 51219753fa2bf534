"""Interactive multi-turn chat REPL with streaming output
(reference: examples/bloom_interactive.py).

  python examples/bloom_interactive.py --model_dir checkpoints/bloom-396m-zh
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def generate(prompt, model, tokenizer, stops=("\nHuman:", "\nHuman：")):
    from cleantransformer_tpu.generation import ConsoleStreamer
    generation_configs = {
        "beam_size": 1, "max_gen_len": 500, "end_ids": tokenizer.eos_token_id,
        "pad_id": tokenizer.pad_token_id, "early_stop": True,
        "no_repeat_ngram_size": 2, "do_sample": True, "temperature": 0.8,
        "top_k": 10, "top_p": 0.8,
    }
    enc = tokenizer(prompt, return_tensors="np", padding=False,
                    max_length=1024, truncation=True)
    streamer = ConsoleStreamer(tokenizer, len(prompt), stops=list(stops))
    model.generate(enc["input_ids"].astype(np.int32),
                   enc["attention_mask"].astype(np.int32),
                   generation_configs=generation_configs, steamers=streamer)
    return streamer.final_generation


def build_prompt(query, history):
    prompt = ""
    for ctx in history:
        prompt += "{}: {}\n\n".format(ctx["role"], ctx["value"])
    prompt += "Human: {}\n\nAssistant: ".format(query)
    return prompt


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_dir", required=True, type=str)
    parser.add_argument("--tokenizer_dir", default=None, type=str)
    args, _ = parser.parse_known_args()

    from examples.inference_bloom import load_config, load_model
    from transformers import BloomTokenizerFast

    config = load_config(os.path.join(args.model_dir, "config.json"))
    tokenizer = BloomTokenizerFast.from_pretrained(
        args.tokenizer_dir or args.model_dir, padding_side="left")
    model = load_model(config, args.model_dir)

    query, history = "", []
    while True:
        query = input("\nUser: ").strip()
        if query.lower() == "q":
            sys.stdout.write("exit\n")
            break
        if query.lower() == "new":
            sys.stdout.write("create new session...\n")
            history = []
            continue
        prompt = build_prompt(query, history)
        sys.stdout.write("Assistant: ")
        generation = generate(prompt, model, tokenizer).strip()
        if generation.startswith("Assistant:"):
            generation = generation[10:].strip()
        history.append({"role": "Human", "value": query})
        history.append({"role": "Assistant", "value": generation})
        sys.stdout.write("\n")


if __name__ == "__main__":
    main()
