"""Llama-family SFT on Belle-format data (extension — mirrors ft_bloom.py so
switching users keep the same CLI; works for Llama/Mistral/TinyLlama-style
HF checkpoint directories, and for Mixtral-style MoE configs).

  python examples/ft_llama.py --model_dir checkpoints/tinyllama-1.1b \
      --data_fn datasets/belle/train.jsonl --bf16 --flash
  python examples/ft_llama.py --demo            # tiny random model
  python examples/ft_llama.py --demo --lora_rank 8
"""

import argparse
import json
import os
import sys
import tempfile
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def init_args():
    parser = argparse.ArgumentParser(description="Args")
    parser.add_argument("--model_dir", default=None, type=str)
    parser.add_argument("--data_fn", default=None, type=str)
    parser.add_argument("--save_dir", default="checkpoints/llama-sft", type=str)
    parser.add_argument("--batch_size", default=8, type=int)
    parser.add_argument("--accum", default=1, type=int)
    parser.add_argument("--lr", default=1e-5, type=float)
    parser.add_argument("--epochs", default=3, type=int)
    parser.add_argument("--max_len", default=1024, type=int)
    parser.add_argument("--dp", default=1, type=int)
    parser.add_argument("--tp", default=1, type=int)
    parser.add_argument("--bf16", action="store_true")
    parser.add_argument("--flash", action="store_true")
    parser.add_argument("--packed", action="store_true",
                        help="sequence packing: fill rows with whole "
                             "examples (block-diagonal attention; no pad "
                             "FLOPs) — trainer/data.packed_collate")
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--demo", action="store_true")
    parser.add_argument("--lora_rank", default=0, type=int)
    parser.add_argument("--lora_alpha", default=16, type=int)
    args, _ = parser.parse_known_args()
    return args


def main():
    args = init_args()
    import jax
    from cleantransformer_tpu.config import LlamaConfig
    from cleantransformer_tpu.models.llama import LlamaForCausalLM
    from cleantransformer_tpu.trainer import (
        Trainer, TrainingArguments, BelleDataset, belle_collate)
    from cleantransformer_tpu.trainer.data import packed_collate

    overrides = {}
    if args.bf16:
        overrides["compute_dtype"] = "bfloat16"
    if args.flash:
        overrides["use_flash_attention"] = True

    if args.demo or not args.model_dir:
        tmp = tempfile.mkdtemp()
        data_fn = os.path.join(tmp, "demo.jsonl")
        with open(data_fn, "w") as f:
            for i in range(64):
                f.write(json.dumps({"instruction": f"count to {i}",
                                    "output": " ".join(map(str, range(i % 8)))}) + "\n")
        from cleantransformer_tpu.tokenizers import BPETokenizer
        tokenizer = BPETokenizer(vocab_size=200)
        tokenizer.fit(["human assistant count to 0123456789 " * 2])
        config = LlamaConfig(vocab_size=len(tokenizer.vocab), hidden_size=64,
                             intermediate_size=112, num_hidden_layers=2,
                             num_attention_heads=4, num_key_value_heads=2,
                             **overrides)
        model = LlamaForCausalLM(config, rng=jax.random.PRNGKey(0))
        args.max_len, args.batch_size, args.epochs = 32, 8, 2
        eos = ""
    else:
        from cleantransformer_tpu.config import auto_config
        config = auto_config(
            os.path.join(args.model_dir, "config.json"), **overrides)
        from cleantransformer_tpu.utils.hf_loader import (
            load_checkpoint_dir, llama_params_from_state_dict)
        params = llama_params_from_state_dict(
            load_checkpoint_dir(args.model_dir), config)
        model = LlamaForCausalLM(config, params=params)
        from transformers import AutoTokenizer
        tokenizer = AutoTokenizer.from_pretrained(args.model_dir,
                                                  padding_side="right")
        if tokenizer.pad_token_id is None:
            tokenizer.pad_token = tokenizer.eos_token
        data_fn = args.data_fn
        eos = tokenizer.eos_token

    if args.lora_rank > 0:
        from cleantransformer_tpu.lora import LoraModel
        model = LoraModel(model, rank=args.lora_rank, alpha=args.lora_alpha,
                          rng=jax.random.PRNGKey(1))

    dataset = BelleDataset(data_fn)
    # the Trainer's loader batches per_device_batch x dp examples per step,
    # and the collator sees them all at once — rows must scale with dp
    dp = args.dp if args.dp >= 1 else max(
        1, jax.device_count() // max(args.tp, 1))
    examples_per_step = args.batch_size
    if args.packed:
        # packing pays off only when each step carries ~num_rows * max_len /
        # avg_len examples (batch == rows would reproduce pad-to-max):
        # estimate the average tokenized length on a sample, leave a 25%
        # headroom, and drop (with warning) on rare overflow batches
        probe = [dataset[i]["prompt"] + eos
                 for i in range(0, len(dataset), max(1, len(dataset) // 64))]
        if hasattr(tokenizer, "encode"):
            avg = sum(min(len(tokenizer.encode(t)), args.max_len)
                      for t in probe) / len(probe)
        else:
            avg = sum(min(len(tokenizer(t)["input_ids"]), args.max_len)
                      for t in probe) / len(probe)
        examples_per_step = max(args.batch_size, int(
            args.batch_size * args.max_len / (avg * 1.25)))
        print(f"packing: ~{avg:.0f} tokens/example -> {examples_per_step} "
              f"examples per step into {args.batch_size} rows")

    train_args = TrainingArguments(
        output_dir=args.save_dir, num_train_epochs=args.epochs,
        per_device_train_batch_size=examples_per_step,
        gradient_accumulation_steps=args.accum, learning_rate=args.lr,
        logging_steps=10, save_steps=1000, mesh_data=args.dp,
        mesh_model=args.tp, max_seq_length=args.max_len)
    trainer = Trainer(
        model=model, args=train_args, train_dataset=dataset,
        data_collator=(partial(packed_collate, tokenizer=tokenizer,
                               max_length=args.max_len, eos_token=eos,
                               num_rows=args.batch_size * dp,
                               on_overflow="drop")
                       if args.packed else
                       partial(belle_collate, tokenizer=tokenizer,
                               max_length=args.max_len, pad_to_max=True,
                               eos_token=eos)))
    trainer.train(resume_from_checkpoint=True if args.resume else None)
    if args.lora_rank > 0:
        os.makedirs(args.save_dir, exist_ok=True)
        model.save_adapter(os.path.join(args.save_dir, "adapter.safetensors"))
        print("done; adapter saved to", args.save_dir)
    else:
        # HF layout so the inference_* examples (and transformers)
        # load the result directly — the reference's interop contract
        trainer.save_model(args.save_dir, hf_format=True)
        print("done; saved to", args.save_dir)


if __name__ == "__main__":
    main()
