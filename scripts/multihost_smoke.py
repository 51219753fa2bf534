"""Two-process jax.distributed smoke test on localhost CPU.

Proves the multi-host bring-up path end to end — the runnable counterpart of
the reference's ``torchrun --nproc_per_node`` launch (scripts/ft_bloom_DDP.sh:1-11
+ NCCL init ft_bloom_DDP.py:183): two OS processes, each with 4 virtual CPU
devices, form one 8-device global mesh via ``jax.distributed.initialize``
(gloo collectives), and run real Trainer steps where

  - each process's DataLoader loads a DISJOINT half of the epoch
    (``shard_index=process_index``, the DistributedSampler analogue),
  - per-host batches are assembled into logically-global arrays with
    ``jax.make_array_from_process_local_data``,
  - gradient sync happens through GSPMD collectives over the 'data' axis,
  - checkpoints are written by PROCESS 0 ONLY behind a completion barrier
    (reference rank guard ft_bloom_DDP.py:155-156 + mkdir/barrier
    ft_bloom_deepspeed.py:221-223) — and a SECOND trainer then resumes from
    that checkpoint on both processes and must reproduce the first run's
    remaining-step losses exactly (multi-host save -> resume round trip).

Launcher mode (no args) spawns both workers, then asserts they report
IDENTICAL per-step losses — the executable version of the reference's
cross-rank grad-fingerprint check (ft_bloom_DDP.py:145-150) — and identical
post-resume losses.

Usage:  python scripts/multihost_smoke.py            # launcher
        python scripts/multihost_smoke.py --process_id N --port P  # worker
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
NUM_PROCESSES = 2
LOCAL_DEVICES = 4
STEPS = 3


def worker(process_id, port):
    import jax
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=NUM_PROCESSES, process_id=process_id,
        local_device_ids=list(range(LOCAL_DEVICES)))
    assert jax.process_count() == NUM_PROCESSES
    assert len(jax.devices()) == NUM_PROCESSES * LOCAL_DEVICES
    assert len(jax.local_devices()) == LOCAL_DEVICES

    import numpy as np
    from functools import partial
    from cleantransformer_tpu.config import BloomConfig
    from cleantransformer_tpu.models.bloom import BloomForCausalLM
    from cleantransformer_tpu.tokenizers import BPETokenizer
    from cleantransformer_tpu.trainer import (
        Trainer, TrainingArguments, BelleDataset, belle_collate)

    data_file = os.path.join("/tmp", f"mh_smoke_{port}.jsonl")
    if process_id == 0:
        with open(data_file, "w") as f:
            for i in range(32):
                f.write(json.dumps({"instruction": f"add {i} and {i + 1}",
                                    "output": str(2 * i + 1)}) + "\n")
    # all processes need the file; tiny rendezvous via the coordinator barrier
    from jax.experimental import multihost_utils
    multihost_utils.sync_global_devices("data_file_written")

    tok = BPETokenizer(vocab_size=120)
    tok.fit([json.loads(l)["instruction"] + " human assistant 0123456789"
             for l in open(data_file)])

    cfg = BloomConfig(vocab_size=len(tok.vocab), hidden_size=32, n_layer=1,
                      num_attention_heads=4)
    out_dir = os.path.join("/tmp", f"mh_smoke_ckpt_{port}")
    if process_id == 0:
        import shutil
        shutil.rmtree(out_dir, ignore_errors=True)
    multihost_utils.sync_global_devices("ckpt_dir_cleared")
    # mesh_data=0 = all 8 GLOBAL devices on the 'data' axis; save at step 2
    # (process-0-only write + barrier inside Trainer._save_checkpoint)
    args = TrainingArguments(output_dir=out_dir,
                             per_device_train_batch_size=1,
                             num_train_epochs=1, max_steps=STEPS,
                             learning_rate=1e-3, logging_steps=1,
                             save_steps=2, eval_steps=STEPS, seed=7,
                             mesh_data=0)
    losses, evals = [], []

    class Capture:  # stash per-step losses for the launcher to compare
        def __init__(self, sink, esink):
            self._sink, self._esink = sink, esink
        def on_log(self, trainer, logs):
            if logs and "loss" in logs:
                self._sink.append(logs["loss"])
        def on_evaluate(self, trainer, metrics):
            self._esink.append(round(float(metrics["eval_loss"]), 6))
        def __getattr__(self, name):
            if name.startswith("on_"):
                return lambda *a, **kw: None
            raise AttributeError(name)

    def collate():
        return partial(belle_collate, tokenizer=tok, max_length=16,
                       pad_to_max=True, eos_token="")

    trainer = Trainer(
        model=BloomForCausalLM(cfg, rng=jax.random.PRNGKey(0)), args=args,
        train_dataset=BelleDataset(data_file),
        eval_dataset=BelleDataset(data_file),
        data_collator=collate(), callbacks=[Capture(losses, evals)])
    dl = trainer.get_train_dataloader()
    assert (dl.shard_index, dl.num_shards) == (process_id, NUM_PROCESSES), (
        dl.shard_index, dl.num_shards)
    # eval is sharded per process too (disjoint wraparound-padded shards)
    el = trainer._eval_loader(trainer.eval_dataset)
    assert (el.shard_index, el.num_shards) == (process_id, NUM_PROCESSES)
    trainer.train()
    assert len(evals) == 1, evals  # distributed eval ran at step 3
    # the step-2 checkpoint is visible to EVERY process after the barrier
    ckpt = os.path.join(out_dir, "checkpoint-2")
    assert os.path.isdir(ckpt), f"missing {ckpt} on process {process_id}"

    # save -> resume round trip: a FRESH trainer resumes from checkpoint-2
    # on both processes (rng + optimizer state + sampler replay restored)
    # and must reproduce the first run's step-3 loss exactly
    resumed, revals = [], []
    trainer2 = Trainer(
        model=BloomForCausalLM(cfg, rng=jax.random.PRNGKey(99)), args=args,
        train_dataset=BelleDataset(data_file),
        eval_dataset=BelleDataset(data_file),
        data_collator=collate(), callbacks=[Capture(resumed, revals)])
    trainer2.train(resume_from_checkpoint=True)
    assert len(resumed) == 1, resumed
    assert abs(resumed[0] - losses[-1]) < 1e-6, (
        f"resume loss {resumed[0]} != original step-3 loss {losses[-1]}")
    assert revals == evals, (
        f"post-resume eval {revals} != original eval {evals}")
    print("MH_LOSSES " + json.dumps(
        [float(f"{l:.6f}") for l in losses + resumed + evals]), flush=True)
    multihost_utils.sync_global_devices("done")


def launcher():
    import socket
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()

    env = {k: v for k, v in os.environ.items()
           if k not in ("PALLAS_AXON_REMOTE_COMPILE", "PALLAS_AXON_POOL_IPS")}
    env.update(JAX_PLATFORMS="cpu",
               XLA_FLAGS=f"--xla_force_host_platform_device_count={LOCAL_DEVICES}",
               PYTHONPATH=REPO)
    procs = [subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--process_id", str(i),
         "--port", str(port)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in range(NUM_PROCESSES)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        if p.returncode != 0:
            sys.stdout.write(f"--- worker {i} output ---\n{out}\n")
            raise SystemExit(f"worker {i} exited {p.returncode}")
    losses = []
    for out in outs:
        line = [l for l in out.splitlines() if l.startswith("MH_LOSSES ")]
        assert line, f"no MH_LOSSES line in worker output:\n{out}"
        losses.append(json.loads(line[0].split(" ", 1)[1]))
    assert losses[0] == losses[1], (
        f"cross-process loss mismatch: {losses[0]} vs {losses[1]}")
    # STEPS train losses + 1 post-resume loss + 1 distributed eval loss
    assert len(losses[0]) == STEPS + 2
    print(f"multihost smoke OK: {NUM_PROCESSES} processes x {LOCAL_DEVICES} "
          f"devices, {STEPS} steps + save/resume + sharded eval, identical "
          f"losses {losses[0]}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--process_id", type=int, default=None)
    ap.add_argument("--port", type=int, default=None)
    a = ap.parse_args()
    if a.process_id is None:
        launcher()
    else:
        worker(a.process_id, a.port)
