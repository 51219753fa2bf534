#!/bin/bash
# dp x tp mesh SFT: ZeRO-1-style sharded optimizer states + Megatron-style
# tensor parallelism come from pjit sharding rules, not a runtime engine
# (reference: scripts/ft_bloom_deepspeed.sh + ds_config_example.json — the
# bf16 / AdamW lr 3e-5 / warmup 500 hyperparameters carried over).
python examples/ft_bloom.py \
    --model_dir checkpoints/bloom-396m-zh \
    --data_fn datasets/belle/train_3.5M_CN_processed.jsonl \
    --save_dir checkpoints/bloom-396m-zh-SFT-belle3.5M \
    --batch_size 8 --dp 0 --tp 2 --lr 3e-5 --bf16 --flash
