#!/bin/bash
# Single-chip Bloom SFT (reference: scripts/ft_bloom_onegpu.sh)
python examples/ft_bloom.py \
    --model_dir checkpoints/bloom-396m-zh \
    --data_fn datasets/belle/train_3.5M_CN_processed.jsonl \
    --save_dir checkpoints/bloom-396m-zh-SFT-belle3.5M \
    --batch_size 16 --bf16 --flash
