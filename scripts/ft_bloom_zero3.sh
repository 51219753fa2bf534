#!/bin/bash
# ZeRO-3/FSDP-style SFT: parameters AND Adam state sharded over the data
# axis — each chip stores ~1/dp of the model; XLA/GSPMD derives the
# all-gather-on-use + reduce-scatter(grads) schedule from the sharding
# annotations (replaces the reference's deepspeed.zero.Init() path,
# examples/ft_bloom_deepspeed.py:51-53 + scripts/ds_config_example.json
# stage-3 config — same bf16 / AdamW lr 3e-5 hyperparameters).
python examples/ft_bloom.py \
    --model_dir checkpoints/bloom-396m-zh \
    --data_fn datasets/belle/train_3.5M_CN_processed.jsonl \
    --save_dir checkpoints/bloom-396m-zh-SFT-belle3.5M \
    --batch_size 8 --dp 0 --zero_stage 3 --lr 3e-5 --bf16 --flash
