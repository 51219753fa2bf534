"""Logging integrations: the self-contained TensorBoard event writer must
produce files standard TensorBoard actually reads (oracle: tensorboard's own
EventFileLoader), report_to wires the callbacks, and MFU lands in train logs
(reference trainer.py:238-248, 1287-1298)."""

import glob
import json
from functools import partial

import numpy as np
import pytest

import jax

from cleantransformer_tpu.trainer.integrations import (
    TFEventWriter, crc32c, resolve_report_to)


def test_crc32c_known_vectors():
    # RFC 3720 / kernel test vectors for CRC32C (Castagnoli)
    assert crc32c(b"") == 0x00000000
    assert crc32c(b"a") == 0xC1D04330
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(bytes(32)) == 0x8A9136AA


def _scalar_of(v):
    """Extract the scalar from a Summary.Value; TB's compat loader migrates
    simple_value into a rank-0 float tensor."""
    which = v.WhichOneof("value")
    return v.simple_value if which == "simple_value" else v.tensor.float_val[0]


def test_event_file_read_by_tensorboard(tmp_path):
    w = TFEventWriter(str(tmp_path))
    w.add_scalar("train/loss", 2.5, step=1, wall_time=100.0)
    w.add_scalars([("train/loss", 1.25), ("train/mfu", 0.5)], step=2,
                  wall_time=200.0)
    w.close()

    from tensorboard.backend.event_processing.event_file_loader import (
        EventFileLoader)
    files = glob.glob(str(tmp_path / "events.out.tfevents.*"))
    assert len(files) == 1
    events = list(EventFileLoader(files[0]).Load())
    assert events[0].file_version == "brain.Event:2"
    scalars = {}
    for e in events[1:]:
        for v in e.summary.value:
            scalars[(e.step, v.tag)] = (_scalar_of(v), e.wall_time)
    assert scalars[(1, "train/loss")] == (2.5, 100.0)
    assert scalars[(2, "train/loss")] == (1.25, 200.0)
    assert scalars[(2, "train/mfu")] == (0.5, 200.0)


def test_resolve_report_to():
    assert resolve_report_to("none", ".") == []
    cbs = resolve_report_to("all", ".")
    names = {type(c).__name__ for c in cbs}
    # 'all' = the offline trackers; wandb is explicit opt-in
    assert names == {"JsonlLoggerCallback", "TensorBoardCallback"}
    assert {type(c).__name__ for c in resolve_report_to("wandb", ".")} == \
        {"WandbCallback"}
    with pytest.raises(ValueError, match="unknown report_to"):
        resolve_report_to("mlflow", ".")


def _tiny_trainer(tmp_path, report_to):
    from cleantransformer_tpu.trainer import (
        Trainer, TrainingArguments, BelleDataset, belle_collate)
    from cleantransformer_tpu.tokenizers import BPETokenizer
    from cleantransformer_tpu.config import BloomConfig
    from cleantransformer_tpu.models.bloom import BloomForCausalLM

    data_fn = str(tmp_path / "d.jsonl")
    with open(data_fn, "w") as f:
        for i in range(16):
            f.write(json.dumps({"instruction": f"q {i}",
                                "output": str(i)}) + "\n")
    tok = BPETokenizer(vocab_size=100)
    tok.fit(["human assistant q 0123456789"])
    cfg = BloomConfig(vocab_size=len(tok.vocab), hidden_size=32, n_layer=1,
                      num_attention_heads=4)
    model = BloomForCausalLM(cfg, rng=jax.random.PRNGKey(0))
    model._tie_weight()
    args = TrainingArguments(output_dir=str(tmp_path / "out"),
                             num_train_epochs=1,
                             per_device_train_batch_size=4,
                             logging_steps=2, save_steps=0,
                             report_to=report_to)
    return Trainer(model=model, args=args, train_dataset=BelleDataset(data_fn),
                   data_collator=partial(belle_collate, tokenizer=tok,
                                         max_length=16, pad_to_max=True,
                                         eos_token=""))


def test_trainer_report_to_all_writes_artifacts(tmp_path):
    tr = _tiny_trainer(tmp_path, report_to="all")
    state = tr.train()

    # MFU is a first-class train-log field
    train_logs = [l for l in state["log_history"] if "loss" in l]
    assert train_logs and all("mfu" in l for l in train_logs)
    assert all(0 <= l["mfu"] <= 1.5 for l in train_logs)

    # jsonl artifact mirrors log_history
    jl = str(tmp_path / "out" / "trainer_log.jsonl")
    lines = [json.loads(l) for l in open(jl)]
    assert len([l for l in lines if "loss" in l]) == len(train_logs)
    assert lines[0]["loss"] == train_logs[0]["loss"]

    # tensorboard events parse and carry the loss curve
    from tensorboard.backend.event_processing.event_file_loader import (
        EventFileLoader)
    files = glob.glob(str(tmp_path / "out" / "runs" / "events.out.tfevents.*"))
    assert len(files) == 1
    tags = {}
    for e in EventFileLoader(files[0]).Load():
        for v in e.summary.value:
            tags.setdefault(v.tag, []).append((e.step, _scalar_of(v)))
    assert "train/loss" in tags and "train/mfu" in tags
    want = [(l["step"], l["loss"]) for l in train_logs]
    got = [(s, round(x, 4)) for s, x in tags["train/loss"]]
    assert [s for s, _ in got] == [s for s, _ in want]
    np.testing.assert_allclose([x for _, x in got], [x for _, x in want],
                               rtol=1e-5)


def test_wandb_callback_slot(monkeypatch):
    """report_to='wandb' (reference trainer.py:238-248 integration slot):
    resolves to a WandbCallback, lazily imports wandb at run start (clear
    ImportError offline), and drives init/log/finish when wandb exists —
    verified against an injected fake module."""
    import sys
    import types
    import pytest
    from cleantransformer_tpu.trainer.integrations import (WandbCallback,
                                                           resolve_report_to)
    cbs = resolve_report_to("wandb")
    assert len(cbs) == 1 and isinstance(cbs[0], WandbCallback)

    calls = {"init": [], "log": [], "finish": 0}

    class FakeRun:
        def log(self, scalars, step=None):
            calls["log"].append((dict(scalars), step))
        def finish(self):
            calls["finish"] += 1

    fake = types.ModuleType("wandb")
    fake.init = lambda **kw: (calls["init"].append(kw), FakeRun())[1]
    monkeypatch.setitem(sys.modules, "wandb", fake)

    class Args:
        output_dir = None
    class Cfg:
        def to_dict(self):
            return {"hidden_size": 8}
    class Model:
        config = Cfg()
    class T:
        args = Args()
        model = Model()
        state = {"global_step": 3}

    cb = cbs[0]
    cb.on_train_begin(T())
    cb.on_log(T(), {"loss": 1.5, "step": 3, "msg": "x"})
    cb.on_train_end(T())
    assert calls["init"] and calls["init"][0]["project"]
    assert calls["log"] == [({"loss": 1.5}, 3)]
    assert calls["finish"] == 1

    # offline (no wandb module): Trainer construction works, run start raises
    monkeypatch.delitem(sys.modules, "wandb", raising=False)
    import builtins
    real_import = builtins.__import__
    def no_wandb(name, *a, **kw):
        if name == "wandb":
            raise ImportError("No module named 'wandb'")
        return real_import(name, *a, **kw)
    monkeypatch.setattr(builtins, "__import__", no_wandb)
    cb2 = WandbCallback()
    with pytest.raises(ImportError, match="wandb"):
        cb2.on_train_begin(T())
