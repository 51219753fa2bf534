"""Logging integrations — the reference Trainer's ``report_to`` surface
(reference trainer/trainer.py:238-248 wires TensorBoard/wandb callbacks).

Two first-class writers, zero import weight in the train loop:

 - ``JsonlLoggerCallback``: one JSON object per log event, appended to
   ``<output_dir>/trainer_log.jsonl`` — the grep-able artifact.
 - ``TensorBoardCallback``: REAL TensorBoard event files, written by a
   self-contained encoder (``TFEventWriter``) — TFRecord framing with
   masked CRC32C + hand-encoded Event/Summary protos, the same stance as
   utils/checkpoint.py's self-contained safetensors codec. Readable by
   standard TensorBoard (asserted in tests via tensorboard's own
   EventFileLoader); no tensorflow import at runtime.
"""

import json
import os
import socket
import struct
import time


# ---------------------------------------------------------------------------
# CRC32C (Castagnoli, reflected 0x82F63B78) + TFRecord masking
# ---------------------------------------------------------------------------

def _crc32c_table():
    poly = 0x82F63B78
    table = []
    for i in range(256):
        crc = i
        for _ in range(8):
            crc = (crc >> 1) ^ (poly if crc & 1 else 0)
        table.append(crc)
    return table


_TABLE = _crc32c_table()


def crc32c(data):
    crc = 0xFFFFFFFF
    for b in data:
        crc = (crc >> 8) ^ _TABLE[(crc ^ b) & 0xFF]
    return crc ^ 0xFFFFFFFF


def _masked_crc(data):
    crc = crc32c(data)
    return ((crc >> 15) | (crc << 17)) + 0xA282EAD8 & 0xFFFFFFFF


# ---------------------------------------------------------------------------
# minimal proto encoding (Event / Summary / Summary.Value)
# ---------------------------------------------------------------------------

def _varint(n):
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        out.append(b | (0x80 if n else 0))
        if not n:
            return bytes(out)


def _field(num, wire, payload):
    return _varint((num << 3) | wire) + payload


def _scalar_value(tag, value):
    # Summary.Value: 1 tag (string), 2 simple_value (float)
    tag_b = tag.encode()
    v = _field(1, 2, _varint(len(tag_b)) + tag_b)
    v += _field(2, 5, struct.pack("<f", float(value)))
    return v


def _event(wall_time, step=None, file_version=None, scalars=None):
    # Event: 1 wall_time (double), 2 step (int64), 3 file_version (string),
    # 5 summary (Summary); Summary: repeated 1 value (Summary.Value)
    e = _field(1, 1, struct.pack("<d", wall_time))
    if step is not None:
        e += _field(2, 0, _varint(int(step)))
    if file_version is not None:
        fv = file_version.encode()
        e += _field(3, 2, _varint(len(fv)) + fv)
    if scalars:
        summary = b"".join(
            _field(1, 2, _varint(len(v)) + v)
            for v in (_scalar_value(t, x) for t, x in scalars))
        e += _field(5, 2, _varint(len(summary)) + summary)
    return e


class TFEventWriter:
    """Append-only TensorBoard event file (TFRecord of Event protos)."""

    _seq = 0  # uniquifies files created within the same second/process

    def __init__(self, logdir):
        os.makedirs(logdir, exist_ok=True)
        TFEventWriter._seq += 1
        fn = (f"events.out.tfevents.{int(time.time())}."
              f"{socket.gethostname()}.{os.getpid()}.{TFEventWriter._seq}")
        self.path = os.path.join(logdir, fn)
        self._f = open(self.path, "ab")
        self._record(_event(time.time(), file_version="brain.Event:2"))

    def _record(self, data):
        header = struct.pack("<Q", len(data))
        self._f.write(header + struct.pack("<I", _masked_crc(header))
                      + data + struct.pack("<I", _masked_crc(data)))
        self._f.flush()

    def add_scalars(self, scalars, step, wall_time=None):
        """scalars: iterable of (tag, value); one Event per call."""
        self._record(_event(wall_time if wall_time is not None
                            else time.time(), step=step,
                            scalars=list(scalars)))

    def add_scalar(self, tag, value, step, wall_time=None):
        self.add_scalars([(tag, value)], step, wall_time)

    def close(self):
        if self._f is not None:
            self._f.close()
            self._f = None


# ---------------------------------------------------------------------------
# Trainer callbacks
# ---------------------------------------------------------------------------

from cleantransformer_tpu.trainer.trainer import TrainerCallback  # noqa: E402


class JsonlLoggerCallback(TrainerCallback):
    """Every log/eval event appended as one JSON line."""

    def __init__(self, path=None):
        self.path = path
        self._f = None

    def _file(self, trainer):
        if self._f is None:
            path = self.path or os.path.join(
                trainer.args.output_dir or ".", "trainer_log.jsonl")
            os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
            self._f = open(path, "a")
            self.path = path
        return self._f

    def on_log(self, trainer, logs):
        f = self._file(trainer)
        f.write(json.dumps({"time": time.time(), **logs}) + "\n")
        f.flush()

    def on_train_end(self, trainer):
        if self._f is not None:
            self._f.close()
            self._f = None


class TensorBoardCallback(TrainerCallback):
    """Scalar train/eval metrics as TensorBoard events under
    ``<output_dir>/runs`` (or an explicit ``log_dir``)."""

    def __init__(self, log_dir=None):
        self.log_dir = log_dir
        self.writer = None

    def _w(self, trainer):
        if self.writer is None:
            logdir = self.log_dir or os.path.join(
                trainer.args.output_dir or ".", "runs")
            self.writer = TFEventWriter(logdir)
        return self.writer

    def on_log(self, trainer, logs):
        step = logs.get("step", trainer.state["global_step"])
        prefix = "eval/" if any(k.startswith("eval_") for k in logs) \
            else "train/"
        scalars = [(prefix + k.replace("eval_", ""), v)
                   for k, v in logs.items()
                   if isinstance(v, (int, float)) and k != "step"]
        if scalars:
            self._w(trainer).add_scalars(scalars, step)

    def on_train_end(self, trainer):
        if self.writer is not None:
            self.writer.close()
            self.writer = None


class WandbCallback(TrainerCallback):
    """Weights & Biases tracker slot (the reference wires it through HF's
    report_to integrations, trainer.py:238-248). The ``wandb`` package is
    imported lazily at first use: constructing the Trainer works offline,
    and a clear ImportError fires only when a run would actually start.
    Only process 0 reports on multi-host runs (the reference's rank-0
    logging convention)."""

    def __init__(self, project=None, run_name=None, config=None):
        self.project = project
        self.run_name = run_name
        self.config = config
        self._run = None
        self._disabled = False

    def _wandb(self):
        try:
            import wandb
        except ImportError as e:
            raise ImportError(
                "report_to='wandb' needs the wandb package (pip install "
                "wandb); offline alternatives: report_to='jsonl' or "
                "'tensorboard'") from e
        return wandb

    def _ensure_run(self, trainer):
        import jax
        if jax.process_index() != 0:
            self._disabled = True
            return None
        if self._run is None:
            cfg = self.config
            if cfg is None and hasattr(trainer.model.config, "to_dict"):
                cfg = {**trainer.model.config.to_dict(),
                       **{k: v for k, v in vars(trainer.args).items()
                          if isinstance(v, (int, float, str, bool))}}
            self._run = self._wandb().init(
                project=self.project or "cleantransformer-tpu",
                name=self.run_name, config=cfg)
        return self._run

    def on_train_begin(self, trainer):
        self._ensure_run(trainer)

    def on_log(self, trainer, logs):
        if self._disabled:
            return
        run = self._ensure_run(trainer)
        if run is None:
            return
        step = logs.get("step", trainer.state["global_step"])
        scalars = {k: v for k, v in logs.items()
                   if isinstance(v, (int, float)) and k != "step"}
        if scalars:
            run.log(scalars, step=step)

    def on_train_end(self, trainer):
        if self._run is not None:
            self._run.finish()
            self._run = None


def resolve_report_to(report_to, output_dir=None):
    """TrainingArguments.report_to -> callback instances (reference
    trainer.py:238-248). Accepts a string or list of {'none', 'jsonl',
    'tensorboard', 'wandb', 'all'}; ``output_dir`` (when given) anchors the
    log paths, else each callback falls back to ``trainer.args.output_dir``.
    'all' expands to the offline trackers only (wandb needs explicit
    opt-in, matching HF's removal of implicit report_to='all')."""
    if report_to in (None, "none", [], ()):
        return []
    names = [report_to] if isinstance(report_to, str) else list(report_to)
    if "all" in names:
        names = ["jsonl", "tensorboard"]
    out = []
    for n in names:
        if n == "jsonl":
            out.append(JsonlLoggerCallback(
                os.path.join(output_dir, "trainer_log.jsonl")
                if output_dir else None))
        elif n == "tensorboard":
            out.append(TensorBoardCallback(
                os.path.join(output_dir, "runs") if output_dir else None))
        elif n == "wandb":
            out.append(WandbCallback())
        elif n != "none":
            raise ValueError(f"unknown report_to target {n!r} "
                             "(none | jsonl | tensorboard | wandb | all)")
    return out
