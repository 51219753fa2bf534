#!/bin/bash
# Multi-host SFT bring-up (the jax analogue of the reference's torchrun +
# dist.init_process_group("nccl") launch, scripts/ft_bloom_DDP.sh +
# examples/ft_bloom_DDP.py:183).
#
# Run this SAME script once per host. JAX's distributed runtime is
# initialized from the standard coordinator env vars (read by
# parallel/mesh.initialize_distributed, which examples/ft_bloom.py calls
# before building the mesh); on TPU pods the vars are usually injected by
# the pod runtime and nothing below is needed.
#
#   JAX_COORDINATOR_ADDRESS  host0 address, e.g. 10.0.0.1:1234
#   JAX_NUM_PROCESSES        number of host processes
#   JAX_PROCESS_ID           this host's rank (0..N-1)
#
# Data: the Trainer shards every epoch disjointly across processes
# (DataLoader shard_index=jax.process_index(), num_shards=process_count —
# the DistributedSampler analogue) and each host collates
# global_batch/process_count examples; trainer._device_batch assembles the
# logically-global batch via jax.make_array_from_process_local_data.
#
# Example for 2 hosts (run with JAX_PROCESS_ID=0 and 1 respectively):
#   JAX_COORDINATOR_ADDRESS=10.0.0.1:1234 JAX_NUM_PROCESSES=2 \
#   JAX_PROCESS_ID=$RANK bash scripts/ft_bloom_multihost.sh
python examples/ft_bloom.py \
    --model_dir checkpoints/bloom-396m-zh \
    --data_fn datasets/belle/train_3.5M_CN_processed.jsonl \
    --save_dir checkpoints/bloom-396m-zh-SFT-belle3.5M \
    --batch_size 8 --dp 0 --zero_stage 1 --lr 3e-5 --bf16 --flash
