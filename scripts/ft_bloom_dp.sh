#!/bin/bash
# Data-parallel SFT over all chips of the slice
# (reference: scripts/ft_bloom_DDP.sh — torchrun --nproc_per_node 4).
# No process-per-device launcher: ONE process drives the whole slice; the
# mesh 'data' axis replaces DDP ranks and XLA ICI collectives replace NCCL.
# Multi-host slices: run this per host with JAX_COORDINATOR_ADDRESS set
# (jax.distributed.initialize picks it up).
python examples/ft_bloom.py \
    --model_dir checkpoints/bloom-396m-zh \
    --data_fn datasets/belle/train_3.5M_CN_processed.jsonl \
    --save_dir checkpoints/bloom-396m-zh-SFT-belle3.5M \
    --batch_size 8 --dp 0 --bf16 --flash
