"""Data pipeline: datasets, collation, host-side loading.

``BelleDataset`` reproduces the reference's SFT prompt format
(examples/ft_bloom.py:23-55): '\\n\\nHuman: {instruction}\\n\\nAssistant: {output}'
with labels = input_ids (pads included, as the reference's collate does).

``DataLoader`` is the host-side loader: deterministic seeded shuffling,
drop-last static batch shapes (jit-friendly), per-host sharding
(``shard_index``/``num_shards`` — the TPU replacement for DistributedSampler,
ft_bloom_DDP.py:68-76), and optional length-grouped batching (the reference
trainer's LengthGroupedSampler, trainer/trainer.py:942-966).
"""

import json

import numpy as np


class BelleDataset:
    def __init__(self, path):
        self.data = [json.loads(l) for l in open(path, "r") if l.strip()]

    def __getitem__(self, item):
        one = self.data[item]
        instruction = one["instruction"]
        output = one.get("output", "")
        if not instruction.startswith("\n\nHuman: "):
            instruction = f"\n\nHuman: {instruction}"
        if not instruction.endswith("\n\nAssistant: "):
            instruction = f"{instruction}\n\nAssistant: "
        return {"prompt": f"{instruction}{output}"}

    def __len__(self):
        return len(self.data)


def belle_collate(batch, tokenizer, max_length, pad_to_max=False,
                  eos_token=None, pad_token_id=None):
    """Tokenize + pad a batch of {'prompt'} samples; labels = input_ids
    (reference collate, ft_bloom.py:41-55). Works with HF fast tokenizers
    (duck-typed: __call__ with padding/truncation) or our BPETokenizer."""
    eos = eos_token if eos_token is not None else getattr(tokenizer, "eos_token", "")
    texts = [s["prompt"] + (eos or "") for s in batch]
    if hasattr(tokenizer, "encode_batch"):  # our tokenizers
        enc = tokenizer.encode_batch(texts, max_length=max_length,
                                     pad_to_max=pad_to_max)
        ids, mask = enc["input_ids"], enc["attention_mask"]
    else:  # HF tokenizer
        enc = tokenizer(texts, truncation=True, padding="max_length" if pad_to_max else True,
                        max_length=max_length, return_tensors="np")
        ids = enc["input_ids"].astype(np.int32)
        mask = enc["attention_mask"].astype(np.int32)
    return {"input_ids": ids, "attention_mask": mask,
            "labels": ids.copy(), "prompts": texts}


class DataLoader:
    """Host-side batch iterator with static shapes.

    - ``shuffle``: deterministic from ``seed`` + epoch (set_epoch mirrors
      DistributedSampler.set_epoch, ft_bloom_DDP.py:114-115).
    - ``shard_index``/``num_shards``: each host sees a disjoint 1/num_shards
      slice per epoch (per-host data sharding over the 'data' mesh axis).
    - ``drop_last`` defaults True so every batch has identical shape (one jit
      compilation).
    - ``group_by_length``: sort a window of batches by sample length to cut
      padding waste (LengthGroupedSampler analogue).
    """

    def __init__(self, dataset, batch_size, collate_fn, shuffle=True, seed=0,
                 drop_last=True, shard_index=0, num_shards=1,
                 group_by_length=False, length_fn=None, prefetch=2,
                 pad_shards=False):
        self.dataset = dataset
        self.batch_size = batch_size
        self.collate_fn = collate_fn
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.shard_index = shard_index
        self.num_shards = num_shards
        self.group_by_length = group_by_length
        self.length_fn = length_fn or (lambda s: len(s.get("prompt", "")))
        self.prefetch = prefetch
        self.pad_shards = pad_shards
        self.epoch = 0

    def set_epoch(self, epoch):
        self.epoch = epoch

    def _indices(self):
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self.epoch)
            rng.shuffle(idx)
        if self.group_by_length:
            window = self.batch_size * 64
            lengths = np.array([self.length_fn(self.dataset[int(i)]) for i in idx])
            out = []
            for s in range(0, n, window):
                chunk = idx[s:s + window]
                out.append(chunk[np.argsort(lengths[s:s + window], kind="stable")])
            idx = np.concatenate(out)
        if self.pad_shards and self.num_shards > 1:
            # equalize shards AND fill every batch by wraparound repetition
            # (torch DistributedSampler semantics): a multi-host EVAL loop
            # is a global computation per batch — unequal per-process batch
            # counts would deadlock the collectives, and partial last
            # batches couldn't be assembled into a 'data'-sharded global
            # array (the pad_across_processes analogue, reference
            # trainer.py:674-692)
            per = self.num_shards * self.batch_size
            idx = np.resize(idx, -(-n // per) * per)
        # per-host shard: contiguous strided split (each host distinct data)
        idx = idx[self.shard_index::self.num_shards]
        return idx

    def __len__(self):
        n = len(self._indices())
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self):
        return self.iter_skip(0)

    def iter_skip(self, skip_batches):
        """Iterate from batch ``skip_batches`` of this epoch's order without
        collating the skipped ones (resume-from-checkpoint fast path —
        skip_first_batches analogue, reference trainer.py:450-451).

        With ``prefetch > 0`` the tokenize+collate work runs in a background
        thread ``prefetch`` batches ahead, overlapping host-side input
        preparation with the device step (the TPU analogue of torch
        DataLoader workers — on TPU one producer thread suffices because the
        collate output is plain numpy and the step consumes it directly)."""
        idx = self._indices()
        end = len(idx) - (len(idx) % self.batch_size) if self.drop_last else len(idx)
        starts = range(skip_batches * self.batch_size, end, self.batch_size)

        def produce(s):
            batch = [self.dataset[int(i)] for i in idx[s:s + self.batch_size]]
            return self.collate_fn(batch)

        if not self.prefetch:
            for s in starts:
                yield produce(s)
            return

        import queue
        import threading
        q = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()
        _END = object()

        def put(item):
            # bounded puts re-check `stop` so an abandoned iterator (early
            # break / exception in the training loop) releases the worker
            # instead of leaking it blocked on a full queue
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def worker():
            try:
                for s in starts:
                    if stop.is_set() or not put(produce(s)):
                        return
                put(_END)
            except BaseException as e:  # surface collate errors to the consumer
                put(e)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is _END:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()


def packed_collate(batch, tokenizer, max_length, eos_token=None,
                   num_rows=None, on_overflow="error"):
    """Sequence-PACKING collate for SFT: tokenize each sample and greedily
    fill (B', max_length) rows with whole examples back-to-back — no
    padding waste (belle-style data averages ~100 tokens vs max_length
    1024, so plain pad-to-max trains on ~90% pad FLOPs). Emits

      input_ids    (B', L)
      attention_mask (B', L) 1 where any example occupies the slot
      segment_ids  (B', L)   1-based example index per row, 0 = pad
      labels       (B', L)   input_ids with -100 at pads AND at each
                             segment's first token (shift-CE must never
                             predict across an example boundary)

    Model side: segment_ids makes attention block-diagonal-causal and
    restarts RoPE positions per example (models/llama.py). Examples longer
    than max_length are truncated.

    ``num_rows``: fixed output row count (pad with empty rows) so every
    step keeps ONE jit shape — greedy packing otherwise emits a varying
    number of rows and each new count would recompile the train step.
    NOTE: packing only pays off when the example batch holds MORE examples
    than rows (~ num_rows * max_length / avg_example_len of them) — with
    batch == num_rows every example gets its own row and the step is
    identical to pad-to-max.

    ``on_overflow`` when a batch needs more than num_rows rows: "error"
    (default — shrink the batch or raise num_rows) or "drop" (drop the
    overflowing tail examples with a warning; acceptable for shuffled SFT
    epochs where a rare unlucky batch costs a few examples)."""
    eos = eos_token if eos_token is not None else getattr(tokenizer,
                                                          "eos_token", "")
    texts = [s["prompt"] + (eos or "") for s in batch]
    if hasattr(tokenizer, "encode"):
        seqs = [tokenizer.encode(t)[:max_length] for t in texts]
    else:  # HF tokenizer
        seqs = [tokenizer(t, truncation=True,
                          max_length=max_length)["input_ids"]
                for t in texts]

    rows, cur = [], []
    for s in seqs:
        if not len(s):
            continue  # empty tokenization: nothing to supervise, no slot
        if cur and sum(len(x) for x in cur) + len(s) > max_length:
            rows.append(cur)
            cur = []
        cur.append(list(map(int, s)))
    if cur:
        rows.append(cur)
    if num_rows is not None:
        if len(rows) > num_rows:
            if on_overflow == "drop":
                import warnings
                dropped = sum(len(r) for r in rows[num_rows:])
                warnings.warn(
                    f"packed_collate: dropped {dropped} example(s) past "
                    f"num_rows={num_rows} (raise num_rows or shrink the "
                    "batch to avoid)")
                rows = rows[:num_rows]
            else:
                raise ValueError(
                    f"packed batch needs {len(rows)} rows > num_rows="
                    f"{num_rows} (shrink the batch or raise num_rows)")
        rows.extend([] for _ in range(num_rows - len(rows)))

    Bp = len(rows)
    ids = np.zeros((Bp, max_length), np.int32)
    mask = np.zeros((Bp, max_length), np.int32)
    seg = np.zeros((Bp, max_length), np.int32)
    labels = np.full((Bp, max_length), -100, np.int32)
    for r, row in enumerate(rows):
        off = 0
        for si, s in enumerate(row, start=1):
            n = len(s)
            ids[r, off: off + n] = s
            mask[r, off: off + n] = 1
            seg[r, off: off + n] = si
            labels[r, off: off + n] = s
            labels[r, off] = -100  # no cross-boundary prediction target
            off += n
    return {"input_ids": ids, "attention_mask": mask, "segment_ids": seg,
            "labels": labels}
