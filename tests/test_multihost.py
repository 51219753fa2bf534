"""Real 2-process jax.distributed bring-up (localhost CPU, gloo).

The executable counterpart of the reference's torchrun launch + cross-rank
grad-fingerprint check (scripts/ft_bloom_DDP.sh, ft_bloom_DDP.py:145-150,183):
two OS processes form one 8-device global mesh and run Trainer steps with
disjoint per-host data; the launcher asserts identical per-step losses.
"""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_two_process_trainer_smoke():
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "multihost_smoke.py")],
        capture_output=True, text=True, timeout=600,
        env={k: v for k, v in os.environ.items()},
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert "multihost smoke OK" in out.stdout
