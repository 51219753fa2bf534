"""Trainer stack: data pipeline, schedules, checkpointing, training loop."""

import json
import os
from functools import partial

import numpy as np
import pytest

import jax

from cleantransformer_tpu.config import BloomConfig
from cleantransformer_tpu.models.bloom import BloomForCausalLM
from cleantransformer_tpu.tokenizers import BPETokenizer
from cleantransformer_tpu.trainer import (
    Trainer, TrainingArguments, BelleDataset, DataLoader, belle_collate,
    get_scheduler,
)
from cleantransformer_tpu.utils import checkpoint as ckpt_io


pytestmark = pytest.mark.slow  # full tier; fast tier: -m 'not slow'

@pytest.fixture(scope="module")
def belle_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("data") / "train.jsonl"
    with open(p, "w") as f:
        for i in range(32):
            f.write(json.dumps({"instruction": f"add {i} and {i+1}",
                                "output": str(2 * i + 1)}) + "\n")
    return str(p)


@pytest.fixture(scope="module")
def tok(belle_file):
    t = BPETokenizer(vocab_size=120)
    t.fit([json.loads(l)["instruction"] + " human assistant 0123456789"
           for l in open(belle_file)])
    return t


class TestData:
    def test_belle_prompt_format(self, belle_file):
        ds = BelleDataset(belle_file)
        p = ds[0]["prompt"]
        assert p.startswith("\n\nHuman: ")
        assert "\n\nAssistant: " in p

    def test_collate_shapes_and_labels(self, belle_file, tok):
        ds = BelleDataset(belle_file)
        out = belle_collate([ds[0], ds[1]], tokenizer=tok, max_length=32,
                            pad_to_max=True, eos_token="")
        assert out["input_ids"].shape == (2, 32)
        assert (out["labels"] == out["input_ids"]).all()
        assert out["attention_mask"].sum() > 0

    def test_loader_shards_are_disjoint(self, belle_file, tok):
        ds = BelleDataset(belle_file)
        collate = lambda b: b
        seen = []
        for shard in range(4):
            dl = DataLoader(ds, 2, collate, shuffle=True, seed=3,
                            shard_index=shard, num_shards=4)
            seen.append({s["prompt"] for batch in dl for s in batch})
        for i in range(4):
            for j in range(i + 1, 4):
                assert not (seen[i] & seen[j])

    def test_trainer_wires_multihost_data_sharding(self, belle_file, tok,
                                                   monkeypatch):
        """get_train_dataloader must partition each epoch disjointly across
        jax processes (shard_index=process_index, num_shards=process_count)
        and split the global batch per host — on a real multi-host mesh the
        old default silently fed identical data to every host (VERDICT r2
        weak #9)."""
        from functools import partial
        from cleantransformer_tpu.trainer import Trainer, TrainingArguments
        from cleantransformer_tpu.config import BloomConfig
        from cleantransformer_tpu.models.bloom import BloomForCausalLM

        cfg = BloomConfig(vocab_size=len(tok.vocab), hidden_size=32,
                          n_layer=1, num_attention_heads=4)
        args = TrainingArguments(output_dir=None,
                                 per_device_train_batch_size=4,
                                 save_steps=0)
        collate = partial(belle_collate, tokenizer=tok, max_length=16,
                          pad_to_max=True, eos_token="")

        loaders = []
        for pid in (0, 1):
            monkeypatch.setattr(jax, "process_count", lambda: 2)
            monkeypatch.setattr(jax, "process_index", lambda pid=pid: pid)
            tr = Trainer(model=BloomForCausalLM(cfg, rng=jax.random.PRNGKey(0)),
                         args=args, train_dataset=BelleDataset(belle_file),
                         data_collator=collate)
            loaders.append(tr.get_train_dataloader())
        assert [(l.shard_index, l.num_shards) for l in loaders] == [(0, 2),
                                                                    (1, 2)]
        # per-host batch = global/2; epochs partition disjointly
        assert all(l.batch_size == 2 for l in loaders)
        seen = [{tuple(row) for b in l for row in b["input_ids"]}
                for l in loaders]
        assert seen[0] and seen[1] and not (seen[0] & seen[1])

        # global batch not divisible across hosts -> loud error
        monkeypatch.setattr(jax, "process_count", lambda: 3)
        tr = Trainer(model=BloomForCausalLM(cfg, rng=jax.random.PRNGKey(0)),
                     args=args, train_dataset=BelleDataset(belle_file),
                     data_collator=collate)
        with pytest.raises(ValueError, match="divide evenly"):
            tr.get_train_dataloader()

    def test_offload_optimizer_cpu_matches_default(self, belle_file, tok):
        """DeepSpeed-style CPU optimizer offload (master params + Adam state
        in host memory, accelerator runs fwd/bwd only): training must match
        the on-device path step for step."""
        from cleantransformer_tpu.trainer import Trainer, TrainingArguments
        from cleantransformer_tpu.config import BloomConfig
        from cleantransformer_tpu.models.bloom import BloomForCausalLM
        from functools import partial
        cfg = BloomConfig(vocab_size=len(tok.vocab), hidden_size=32,
                          n_layer=1, num_attention_heads=4)
        collate = partial(belle_collate, tokenizer=tok, max_length=16,
                          pad_to_max=True, eos_token="")
        histories = {}
        for mode in ("", "cpu"):
            model = BloomForCausalLM(cfg, rng=jax.random.PRNGKey(0))
            model._tie_weight()
            args = TrainingArguments(output_dir=None, num_train_epochs=1,
                                     per_device_train_batch_size=4,
                                     logging_steps=1, save_steps=0,
                                     offload_optimizer=mode)
            tr = Trainer(model=model, args=args,
                         train_dataset=BelleDataset(belle_file),
                         data_collator=collate, callbacks=[])
            state = tr.train()
            histories[mode] = [l["loss"] for l in state["log_history"]
                               if "loss" in l]
            if mode == "cpu":
                # master copies really live on the cpu platform
                leaf = jax.tree_util.tree_leaves(tr.model.params)[0]
                assert leaf.device.platform == "cpu"
        assert histories["cpu"] == histories[""]

    def test_loader_epoch_reshuffles(self, belle_file):
        ds = BelleDataset(belle_file)
        dl = DataLoader(ds, 4, lambda b: [s["prompt"] for s in b], seed=1)
        dl.set_epoch(0)
        e0 = [b for b in dl]
        dl.set_epoch(1)
        e1 = [b for b in dl]
        assert e0 != e1
        dl.set_epoch(0)
        assert [b for b in dl] == e0  # deterministic replay

    def test_group_by_length(self, belle_file):
        ds = BelleDataset(belle_file)
        dl = DataLoader(ds, 4, lambda b: [len(s["prompt"]) for s in b],
                        shuffle=False, group_by_length=True)
        batches = list(dl)
        spreads = [max(b) - min(b) for b in batches]
        assert np.mean(spreads) <= 4  # tightly grouped lengths


class TestSchedules:
    def test_linear(self):
        s = get_scheduler("linear", 1.0, num_warmup_steps=10, num_training_steps=110)
        assert s(0) < s(9) <= 1.0
        assert abs(s(10) - 1.0) < 0.01
        assert s(109) < 0.02

    def test_cosine(self):
        s = get_scheduler("cosine", 1.0, num_warmup_steps=0, num_training_steps=100)
        assert abs(s(0) - 1.0) < 0.02
        assert s(50) < s(10)
        assert s(99) < 0.01

    def test_constant_with_warmup(self):
        s = get_scheduler("constant_with_warmup", 2.0, num_warmup_steps=4)
        assert s(0) == 0.5
        assert s(100) == 2.0


class TestCheckpointIO:
    def test_pytree_roundtrip(self, tmp_path):
        import jax.numpy as jnp
        tree = {"a": {"b": np.arange(6, dtype=np.float32).reshape(2, 3)},
                "c": [np.ones(2, np.int32), np.zeros(3, np.float32)],
                "d": jnp.asarray(np.random.randn(4).astype(np.float32))}
        path = str(tmp_path / "t.safetensors")
        ckpt_io.save_pytree(path, tree)
        loaded = ckpt_io.load_pytree(path, tree)
        for a, b in zip(jax.tree_util.tree_leaves(tree),
                        jax.tree_util.tree_leaves(loaded)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_bf16_roundtrip(self, tmp_path):
        import jax.numpy as jnp
        x = jnp.asarray([1.5, -2.25, 3.0], dtype=jnp.bfloat16)
        path = str(tmp_path / "bf16.safetensors")
        ckpt_io.save_pytree(path, {"x": x})
        loaded = ckpt_io.load_pytree(path, {"x": x})
        np.testing.assert_array_equal(np.asarray(loaded["x"], dtype=np.float32),
                                      np.asarray(x, dtype=np.float32))

    def test_rotation_protects_best(self, tmp_path):
        out = str(tmp_path)
        for step in (10, 20, 30, 40):
            ckpt_io.save_checkpoint(out, step, {"w": np.ones(2)})
        best = os.path.join(out, "checkpoint-10")
        ckpt_io.rotate_checkpoints(out, save_total_limit=2, best_ckpt=best)
        left = sorted(os.listdir(out))
        assert "checkpoint-10" in left and len(left) == 2

    def test_get_last_checkpoint(self, tmp_path):
        out = str(tmp_path)
        assert ckpt_io.get_last_checkpoint(out) is None
        for step in (5, 50, 9):
            ckpt_io.save_checkpoint(out, step, {"w": np.ones(1)})
        assert ckpt_io.get_last_checkpoint(out).endswith("checkpoint-50")


class TestTrainLoop:
    def _setup(self, belle_file, tok, tmp_path, **arg_overrides):
        cfg = BloomConfig(vocab_size=len(tok.vocab), hidden_size=32, n_layer=2,
                          num_attention_heads=4)
        model = BloomForCausalLM(cfg, rng=jax.random.PRNGKey(0))
        model._tie_weight()
        args = TrainingArguments(
            output_dir=str(tmp_path / "out"), num_train_epochs=2,
            per_device_train_batch_size=4, learning_rate=1e-3,
            logging_steps=4, save_steps=8, save_total_limit=2,
            warmup_steps=2, **arg_overrides)
        ds = BelleDataset(belle_file)
        collate = partial(belle_collate, tokenizer=tok, max_length=32,
                          pad_to_max=True, eos_token="")
        return Trainer(model=model, args=args, train_dataset=ds,
                       eval_dataset=ds, data_collator=collate, callbacks=[])

    def test_loss_decreases_and_checkpoints(self, belle_file, tok, tmp_path):
        trainer = self._setup(belle_file, tok, tmp_path,
                              gradient_accumulation_steps=2)
        state = trainer.train()
        losses = [l["loss"] for l in state["log_history"] if "loss" in l]
        assert losses[-1] < losses[0]
        assert any("eval_loss" in l for l in state["log_history"])
        ckpts = sorted(os.listdir(trainer.args.output_dir))
        assert len(ckpts) == 2  # save_total_limit rotation


    def test_async_save_equivalent_and_resumable(self, belle_file, tok,
                                                 tmp_path):
        """async_save=True writes the same checkpoints as the sync path
        (training is deterministic; the writer runs in a background thread,
        joined by train()), rotation still applies, and resume works. No
        .partial dirs survive (atomic rename)."""
        sync = self._setup(belle_file, tok, tmp_path)
        sync.train()
        sync_dir = sync.args.output_dir

        adir = tmp_path / "async"
        a = self._setup(belle_file, tok, tmp_path)
        a.args.output_dir = str(adir / "out")
        a.args.async_save = True
        a.train()
        a_dir = a.args.output_dir

        s_ckpts = sorted(os.listdir(sync_dir))
        a_ckpts = sorted(os.listdir(a_dir))
        assert s_ckpts == a_ckpts and len(a_ckpts) == 2
        assert not any(n.endswith(".partial") for n in a_ckpts)
        import numpy as _np
        from cleantransformer_tpu.utils import checkpoint as ckpt_io
        last = ckpt_io.get_last_checkpoint(a_dir)
        p_sync = ckpt_io.load_pytree(
            os.path.join(sync_dir, os.path.basename(last),
                         "model.safetensors"), sync.model.params)
        p_async = ckpt_io.load_pytree(
            os.path.join(last, "model.safetensors"), a.model.params)
        fa = jax.tree_util.tree_leaves(p_sync)
        fb = jax.tree_util.tree_leaves(p_async)
        for x, y in zip(fa, fb):
            _np.testing.assert_array_equal(_np.asarray(x), _np.asarray(y))

        fresh = self._setup(belle_file, tok, tmp_path)
        fresh.args.output_dir = a_dir
        fresh.create_optimizer(16)
        step = fresh._load_from_checkpoint(True)
        assert step == a.state["global_step"]

    def test_resume_restores_state(self, belle_file, tok, tmp_path):
        trainer = self._setup(belle_file, tok, tmp_path)
        trainer.train()
        end_params = trainer.model.params

        fresh = self._setup(belle_file, tok, tmp_path)
        fresh.create_optimizer(16)
        step = fresh._load_from_checkpoint(True)
        assert step == trainer.state["global_step"]
        a = np.asarray(end_params["word_embeddings"])
        b = np.asarray(fresh.model.params["word_embeddings"])
        np.testing.assert_array_equal(a, b)
        assert fresh.opt_state.count == step or int(fresh.opt_state.count) > 0

    def test_resume_skips_consumed_batches(self, belle_file, tok, tmp_path):
        """Resuming from checkpoint-N must continue with epoch-0's batch N+1
        (skip_first_batches semantics), not restart at batch 0."""
        seen = []

        def spy_collate(batch):
            out = belle_collate(batch, tokenizer=tok, max_length=32,
                                pad_to_max=True, eos_token="")
            seen.append(tuple(out["prompts"]))
            return out

        trainer = self._setup(belle_file, tok, tmp_path)
        trainer.data_collator = spy_collate
        trainer.eval_dataset = None  # eval would also hit the spy collate
        trainer.args.num_train_epochs = 1
        trainer.args.save_steps = 4
        trainer.train()
        epoch0_batches = list(seen)
        assert len(epoch0_batches) == 8

        seen.clear()
        import os as _os
        ck4 = _os.path.join(str(tmp_path / "out"), "checkpoint-4")
        again = self._setup(belle_file, tok, tmp_path)
        again.data_collator = spy_collate
        again.eval_dataset = None
        again.args.num_train_epochs = 1
        again.create_optimizer(8)
        again.train(resume_from_checkpoint=ck4)
        # collation happens per yielded batch post-skip: first processed batch
        # must be epoch-0's batch index 4 (the 5th), not batch 0
        assert seen[0] == epoch0_batches[4]
        assert len(seen) == 4  # only the remaining tail was consumed

    def test_remat_trains(self, belle_file, tok, tmp_path):
        trainer = self._setup(belle_file, tok, tmp_path, remat=True)
        trainer.args.num_train_epochs = 1
        state = trainer.train()
        assert state["global_step"] > 0


def test_hf_export_roundtrip(tmp_path):
    """save_model(hf_format=True) must produce a checkpoint our HF loader
    (and transformers) can read back identically."""
    from cleantransformer_tpu.models.bloom import BloomForCausalLM
    from cleantransformer_tpu.utils.hf_loader import (
        load_state_dict, bloom_params_from_state_dict)

    cfg = BloomConfig(vocab_size=50, hidden_size=16, n_layer=2,
                      num_attention_heads=2)
    model = BloomForCausalLM(cfg, rng=jax.random.PRNGKey(0))
    trainer = Trainer(model=model, args=TrainingArguments(output_dir=str(tmp_path)),
                      callbacks=[])
    trainer.save_model(str(tmp_path), hf_format=True)
    sd = load_state_dict(str(tmp_path / "model.safetensors"))
    assert "h.0.self_attention.query_key_value.weight" in sd
    params2 = bloom_params_from_state_dict(sd, cfg)
    a = np.asarray(model.params["blocks"]["self_attention"]["query_key_value"]["w"])
    b = np.asarray(params2["blocks"]["self_attention"]["query_key_value"]["w"])
    np.testing.assert_allclose(a, b, rtol=1e-6)


class TestPrefetch:
    def test_prefetch_yields_same_batches_as_unprefetched(self, belle_file):
        ds = BelleDataset(belle_file)
        collate = lambda b: [s["prompt"] for s in b]
        plain = list(DataLoader(ds, 2, collate, seed=5, prefetch=0))
        pref = list(DataLoader(ds, 2, collate, seed=5, prefetch=2))
        assert plain == pref

    def test_abandoned_iterator_releases_worker(self, belle_file):
        """Breaking out of the loader mid-epoch (max_steps, exceptions) must
        unblock and retire the producer thread, not leak it."""
        import gc
        import threading
        import time as _time
        ds = BelleDataset(belle_file)
        dl = DataLoader(ds, 1, lambda b: b, seed=2, prefetch=1)
        before = threading.active_count()
        it = iter(dl)
        next(it)  # worker started and blocked on the size-1 queue
        del it  # abandon: GeneratorExit fires the finally -> stop event
        gc.collect()
        deadline = _time.time() + 5.0
        while threading.active_count() > before and _time.time() < deadline:
            _time.sleep(0.05)
        assert threading.active_count() <= before

    def test_collate_error_propagates(self, belle_file):
        ds = BelleDataset(belle_file)

        def bad_collate(b):
            raise RuntimeError("boom")

        dl = DataLoader(ds, 2, bad_collate, prefetch=2)
        with pytest.raises(RuntimeError, match="boom"):
            list(dl)


def test_hf_export_roundtrip_llama_qwen2_mixtral(tmp_path):
    """export_hf_llama covers the whole family: plain llama, Qwen2 (qkv
    biases), Mixtral (expert-stacked MoE). Executed HF transformers loads
    the exported file and produces identical logits."""
    import torch
    from cleantransformer_tpu.config import LlamaConfig, Qwen2Config
    from cleantransformer_tpu.models.llama import LlamaForCausalLM
    from cleantransformer_tpu.utils.hf_loader import load_state_dict

    base = dict(vocab_size=64, hidden_size=32, intermediate_size=48,
                num_hidden_layers=2, num_attention_heads=4,
                num_key_value_heads=2, max_position_embeddings=64,
                rope_theta=10000.0, rms_norm_eps=1e-6,
                tie_word_embeddings=False)
    cases = [
        ("llama", LlamaConfig(**base), "LlamaForCausalLM", "LlamaConfig"),
        ("qwen2", Qwen2Config(**base), "Qwen2ForCausalLM", "Qwen2Config"),
        ("mixtral", LlamaConfig(**base, num_local_experts=4,
                                num_experts_per_tok=2),
         "MixtralForCausalLM", "MixtralConfig"),
    ]
    ids = np.random.RandomState(0).randint(1, 64, (2, 7))
    for name, cfg, hf_cls, hf_cfg_cls in cases:
        model = LlamaForCausalLM(cfg, rng=jax.random.PRNGKey(3))
        out = tmp_path / name
        tr = Trainer(model=model,
                     args=TrainingArguments(output_dir=str(out)),
                     callbacks=[])
        tr.save_model(str(out), hf_format=True)
        sd = load_state_dict(str(out / "model.safetensors"))
        import transformers
        hf_cfg_kwargs = dict(base)
        if name == "mixtral":
            hf_cfg_kwargs.update(num_local_experts=4, num_experts_per_tok=2,
                                 sliding_window=None)
        hf = getattr(transformers, hf_cls)(
            getattr(transformers, hf_cfg_cls)(**hf_cfg_kwargs)).eval()
        missing, unexpected = hf.load_state_dict(
            {k: torch.tensor(np.asarray(v, np.float32)) for k, v in sd.items()},
            strict=False)
        assert not unexpected, (name, unexpected)
        assert all("rotary" in m or "inv_freq" in m for m in missing), \
            (name, missing)
        import jax.numpy as jnp
        with torch.no_grad():
            want = hf(torch.tensor(ids)).logits.numpy()
        (got, _), _ = model(jnp.asarray(ids))
        np.testing.assert_allclose(np.asarray(got), want, atol=3e-5,
                                   rtol=1e-4, err_msg=name)
