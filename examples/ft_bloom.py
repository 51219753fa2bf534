"""Bloom SFT on the Belle dataset (reference: examples/ft_bloom.py), using the
Trainer. Single chip by default; pass --dp N / --tp N for mesh parallelism
(the torchrun/DDP/DeepSpeed replacement — see examples/ft_bloom_dp.py and
scripts/).

  python examples/ft_bloom.py --model_dir checkpoints/bloom-396m-zh \
      --data_fn datasets/belle/train.jsonl
  python examples/ft_bloom.py --demo       # tiny random model + synthetic data
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
    parser.add_argument("--save_dir", default="checkpoints/bloom-sft", type=str)
    parser.add_argument("--batch_size", default=32, type=int)
    parser.add_argument("--accum", default=1, type=int)
    parser.add_argument("--lr", default=1e-5, type=float)
    parser.add_argument("--epochs", default=10, type=int)
    parser.add_argument("--max_len", default=1024, type=int)
    parser.add_argument("--dp", default=1, type=int, help="data-parallel size (0=all devices)")
    parser.add_argument("--tp", default=1, type=int, help="tensor-parallel size")
    parser.add_argument("--zero_stage", default=-1, type=int,
                        help="ZeRO stage on the dp axis: 0 off, 1 Adam-state "
                             "sharding, 3 FSDP-style param sharding "
                             "(-1 = default, stage 1 when dp > 1)")
    parser.add_argument("--report_to", default="none", type=str,
                        help="logging integration: none | jsonl | "
                             "tensorboard | all (events under "
                             "<save_dir>/runs)")
    parser.add_argument("--bf16", action="store_true")
    parser.add_argument("--flash", action="store_true")
    parser.add_argument("--packed", action="store_true",
                        help="sequence packing (trainer/data.packed_collate):"
                             " whole examples fill rows, block-diagonal"
                             " attention + per-segment ALiBi restart")
    parser.add_argument("--resume", action="store_true")
    parser.add_argument("--demo", action="store_true")
    parser.add_argument("--lora_rank", default=0, type=int,
                        help="LoRA rank (0 = full fine-tune); trains only "
                             "low-rank adapters on the QKV projections and "
                             "saves <save_dir>/adapter.safetensors")
    parser.add_argument("--lora_alpha", default=16, type=int)
    parser.add_argument("--check_determinism", action="store_true",
                        help="run the first-batch loss twice and assert "
                             "bitwise equality (the DDP grad-fingerprint "
                             "check, ft_bloom_DDP.py:145-150, as an assert)")
    args, _ = parser.parse_known_args()
    return args


def main():
    args = init_args()
    import jax
    from cleantransformer_tpu.config import load_bloom_config, BloomConfig
    from cleantransformer_tpu.models.bloom import BloomForCausalLM
    from cleantransformer_tpu.parallel.mesh import initialize_distributed
    from cleantransformer_tpu.trainer import (
        Trainer, TrainingArguments, BelleDataset, belle_collate)

    # multi-host bring-up (no-op without the coordinator env vars; see
    # scripts/ft_bloom_multihost.sh): must run before any other jax call
    if initialize_distributed():
        print(f"jax.distributed: process {jax.process_index()}"
              f"/{jax.process_count()}, {jax.local_device_count()} local "
              f"of {jax.device_count()} devices")

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
        config = BloomConfig(vocab_size=len(tokenizer.vocab), hidden_size=64,
                             n_layer=2, num_attention_heads=4, **overrides)
        model = BloomForCausalLM(config, rng=jax.random.PRNGKey(0))
        model._tie_weight()
        args.max_len, args.batch_size, args.epochs = 32, 8, 2
        eos = ""
    else:
        config = load_bloom_config(os.path.join(args.model_dir, "config.json"),
                                   **overrides)
        from cleantransformer_tpu.utils.hf_loader import (
            load_checkpoint_dir, bloom_params_from_state_dict)
        params = bloom_params_from_state_dict(load_checkpoint_dir(args.model_dir),
                                              config)
        model = BloomForCausalLM(config, params=params)
        from transformers import BloomTokenizerFast
        tokenizer = BloomTokenizerFast.from_pretrained(args.model_dir,
                                                       padding_side="right")
        data_fn = args.data_fn
        eos = tokenizer.eos_token

    if args.lora_rank > 0:
        from cleantransformer_tpu.lora import LoraModel
        model = LoraModel(model, rank=args.lora_rank, alpha=args.lora_alpha,
                          rng=jax.random.PRNGKey(1))

    dataset = BelleDataset(data_fn)
    dp = args.dp if args.dp >= 1 else max(
        1, jax.device_count() // max(args.tp, 1))
    examples_per_step = args.batch_size
    if args.packed:
        # see examples/ft_llama.py: rows must carry ~num_rows * max_len /
        # avg_len examples for packing to pay off; estimate from a sample
        from cleantransformer_tpu.trainer.data import packed_collate
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
        collator = partial(packed_collate, tokenizer=tokenizer,
                           max_length=args.max_len, eos_token=eos,
                           num_rows=args.batch_size * dp, on_overflow="drop")
    else:
        collator = partial(belle_collate, tokenizer=tokenizer,
                           max_length=args.max_len, pad_to_max=True,
                           eos_token=eos)

    train_args = TrainingArguments(
        output_dir=args.save_dir, num_train_epochs=args.epochs,
        per_device_train_batch_size=examples_per_step,
        gradient_accumulation_steps=args.accum, learning_rate=args.lr,
        logging_steps=10, save_steps=1000, mesh_data=args.dp, mesh_model=args.tp,
        zero_stage=args.zero_stage, report_to=args.report_to,
        max_seq_length=args.max_len)
    trainer = Trainer(
        model=model, args=train_args, train_dataset=dataset,
        data_collator=collator)

    if args.check_determinism:
        loader = trainer.get_train_dataloader()
        batch = trainer._device_batch(next(iter(loader)))
        loss_jit = jax.jit(trainer.loss_fn)
        rng = jax.random.PRNGKey(0)
        l1 = float(loss_jit(model.params, batch, rng))
        l2 = float(loss_jit(model.params, batch, rng))
        assert l1 == l2, f"nondeterministic first-batch loss: {l1} != {l2}"
        print(f"determinism check OK: loss {l1} reproduced bitwise")

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
