"""Data-parallel Bloom SFT (reference: examples/ft_bloom_DDP.py).

The torchrun + NCCL + DDP + GradScaler stack collapses to: one process, a
jax.sharding.Mesh over all chips, batches sharded on the 'data' axis, grads
synced by XLA collectives over ICI, and bf16 compute in place of AMP (no loss
scaling on TPU). The reference's per-rank grad-fingerprint check
(ft_bloom_DDP.py:145-150) becomes --check_determinism: run the first step
twice and assert identical loss.

  python examples/ft_bloom_dp.py --demo            # dp = all devices
  python examples/ft_bloom_dp.py --demo --tp 2     # dp x tp mesh
Multi-host: run the same script per host under jax.distributed (see scripts/).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import argparse
    parser = argparse.ArgumentParser()
    parser.add_argument("--check_determinism", action="store_true")
    parser.add_argument("--tp", default=1, type=int)
    args, _ = parser.parse_known_args()

    # delegate to ft_bloom with dp=0 (all devices on the data axis);
    # --check_determinism is handled there (first-batch loss bitwise assert)
    sys.argv += ["--dp", "0", "--tp", str(args.tp), "--bf16"]
    from examples import ft_bloom
    ft_bloom.main()


if __name__ == "__main__":
    main()
