"""Tracing / profiling / FLOs accounting.

The reference has no profiler (SURVEY §5); its closest artifacts are the
trainer's floating_point_ops accounting (trainer/trainer.py:1260-1276) and
DeepSpeed's wall_clock_breakdown flag. TPU-native equivalents:

 - ``trace(logdir)``: context manager around jax.profiler for on-device
   traces viewable in TensorBoard/XProf.
 - ``summarize_trace(logdir)``: parse the captured Chrome trace directly
   (no TensorBoard needed) into per-op-type device-time totals — the tool
   every round-2 kernel win was found with.
 - ``StepTimer``: host-side step timing with device sync, tokens/sec and
   MFU estimation.
 - ``transformer_flops``: analytic FLOs per token (the 6*N + attention rule).
"""

import collections
import contextlib
import glob
import gzip
import json
import re
import time

import jax

# peak bf16 matmul throughput per chip, FLOP/s (for MFU estimates)
PEAK_FLOPS = {
    "tpu v4": 275e12,
    "tpu v5 lite": 197e12,   # v5e
    "tpu v5": 459e12,        # v5p
    "cpu": 1e11,
}


def device_peak_flops():
    kind = jax.devices()[0].device_kind.lower()
    for k, v in PEAK_FLOPS.items():
        if kind.startswith(k):
            return v
    return PEAK_FLOPS["cpu"]


@contextlib.contextmanager
def trace(logdir="/tmp/jax-trace"):
    """Capture an XProf/TensorBoard trace of everything inside the block."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def summarize_trace(logdir, top=25, per=1):
    """Aggregate device-op time from the newest ``*.trace.json.gz`` under
    ``logdir`` (written by ``trace``/jax.profiler).

    Returns a list of {"op", "total_us", "count"} sorted by time, op names
    collapsed by trailing instance numbers (``fusion.123`` -> ``fusion``).
    ``per`` divides the totals (e.g. the number of steps captured) so the
    rows read as per-step costs. For instance-level detail (HLO long_name
    with shapes/layouts, bytes_accessed) grep the trace json for the
    returned op names.
    """
    files = sorted(glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True))
    if not files:
        raise FileNotFoundError(f"no trace under {logdir}")
    with gzip.open(files[-1], "rt") as fh:
        data = json.load(fh)
    events = data.get("traceEvents", [])
    pids = {e["pid"]: e["args"].get("name", "")
            for e in events
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    dev = {p for p, n in pids.items() if "TPU" in n}
    tot, cnt = collections.Counter(), collections.Counter()
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in dev:
            base = re.sub(r"[.\d]+$", "", e["name"])
            tot[base] += e.get("dur", 0)
            cnt[base] += 1
    return [{"op": name, "total_us": round(us / per, 2),
             "count": round(cnt[name] / per, 2)}
            for name, us in tot.most_common(top)]


def transformer_flops(num_params, seq_len, hidden, n_layer, fwd_only=False):
    """FLOs per token: 2*N matmul fwd (+4*N bwd) + attention 2*2*L*s*d
    (the PaLM appendix rule; matches the reference trainer's 6*N heuristic
    for training, trainer.py:1260-1276)."""
    mm = 2 * num_params * (1 if fwd_only else 3)
    attn = (2 if fwd_only else 6) * 2 * n_layer * seq_len * hidden
    return mm + attn


def count_params(params):
    return sum(x.size for x in jax.tree_util.tree_leaves(params))


class StepTimer:
    """Wall-clock + throughput accounting around jitted steps."""

    def __init__(self, tokens_per_step=0, flops_per_step=0):
        self.tokens_per_step = tokens_per_step
        self.flops_per_step = flops_per_step
        self.times = []
        self._t0 = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *a):
        self.times.append(time.perf_counter() - self._t0)
        return False

    def block_on(self, x):
        jax.block_until_ready(x)
        return x

    @property
    def mean_s(self):
        return sum(self.times) / max(1, len(self.times))

    def summary(self):
        dt = min(self.times) if self.times else float("nan")
        out = {"step_time_s": round(dt, 5), "steps": len(self.times)}
        if self.tokens_per_step:
            out["tokens_per_sec"] = round(self.tokens_per_step / dt, 1)
        if self.flops_per_step:
            out["mfu"] = round(self.flops_per_step / dt / device_peak_flops(), 4)
        return out
