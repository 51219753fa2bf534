"""Trainer surface parity (round-2 VERDICT items): NEFTune per-position
noise, -100 label handling, predict()/prediction_step contract, signature-
column filtering, callback events + TrainerControl, best-checkpoint
protection off the save cadence."""

import json
import os
from functools import partial

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cleantransformer_tpu.config import BloomConfig
from cleantransformer_tpu.models.bloom import BloomForCausalLM
from cleantransformer_tpu.tokenizers import BPETokenizer
from cleantransformer_tpu.trainer import (
    Trainer, TrainingArguments, BelleDataset, DataLoader, belle_collate,
)
from cleantransformer_tpu.trainer.trainer import TrainerCallback


pytestmark = pytest.mark.slow  # full tier; fast tier: -m 'not slow'

@pytest.fixture(scope="module")
def belle_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("data") / "train.jsonl"
    with open(p, "w") as f:
        for i in range(16):
            f.write(json.dumps({"instruction": f"add {i} and {i+1}",
                                "output": str(2 * i + 1)}) + "\n")
    return str(p)


@pytest.fixture(scope="module")
def tok(belle_file):
    t = BPETokenizer(vocab_size=120)
    t.fit([json.loads(l)["instruction"] + " human assistant 0123456789"
           for l in open(belle_file)])
    return t


def _trainer(belle_file, tok, tmp_path, **arg_overrides):
    cfg = BloomConfig(vocab_size=len(tok.vocab), hidden_size=32, n_layer=2,
                      num_attention_heads=4)
    model = BloomForCausalLM(cfg, rng=jax.random.PRNGKey(0))
    model._tie_weight()
    defaults = dict(output_dir=str(tmp_path / "out"), num_train_epochs=1,
                    per_device_train_batch_size=4, learning_rate=1e-3,
                    logging_steps=2, save_steps=0)
    defaults.update(arg_overrides)
    args = TrainingArguments(**defaults)
    collate = partial(belle_collate, tokenizer=tok, max_length=32,
                      pad_to_max=True, eos_token="")
    return Trainer(model=model, args=args, train_dataset=BelleDataset(belle_file),
                   data_collator=collate, callbacks=[])


class TestNeftune:
    def _batch(self, trainer, repeat_token=True):
        V = trainer.model.config.vocab_size
        ids = np.full((1, 8), 7, np.int32) if repeat_token else \
            np.arange(1, 9, dtype=np.int32)[None] % V
        return {"input_ids": jnp.asarray(ids),
                "attention_mask": jnp.ones((1, 8), jnp.int32),
                "labels": jnp.asarray(ids)}

    def test_noise_is_per_position(self, belle_file, tok, tmp_path):
        """Reference hook (trainer.py:867-898 / HF neftune_post_forward_hook)
        noises the embedding OUTPUT: the same token at two positions must get
        different noise, so the loss differs from the table-noise variant and
        the per-position noise actually perturbs repeated tokens
        independently. Observable: two rngs give different losses on a batch
        of one repeated token (table-level noise of a single token would too)
        AND the noise-free eval variant is deterministic."""
        trainer = _trainer(belle_file, tok, tmp_path, neftune_noise_alpha=5.0)
        batch = self._batch(trainer)
        loss_fn = trainer.loss_fn
        l1 = float(loss_fn(trainer.model.params, batch, jax.random.PRNGKey(1)))
        l2 = float(loss_fn(trainer.model.params, batch, jax.random.PRNGKey(2)))
        assert l1 != l2  # noise active in training loss

        # direct check on the hook point: per-position noise means the two
        # identical tokens produce different hidden states at layer input
        from cleantransformer_tpu.models.bloom import bloom_forward
        cfg = trainer.model.config
        D = trainer.model.params["word_embeddings"].shape[-1]
        noise = jax.random.uniform(jax.random.PRNGKey(3), (1, 8, D),
                                   jnp.float32, -0.5, 0.5)
        h, _ = bloom_forward(trainer.model.params, cfg, batch["input_ids"],
                             batch["attention_mask"], embed_noise=noise)
        h = np.asarray(h)
        assert not np.allclose(h[0, 0], h[0, 1])  # same token, different noise

    def test_eval_loss_is_noise_free(self, belle_file, tok, tmp_path):
        trainer = _trainer(belle_file, tok, tmp_path, neftune_noise_alpha=5.0)
        batch = self._batch(trainer)
        eval_fn = trainer._default_loss_fn(train=False)
        e1 = float(eval_fn(trainer.model.params, batch, jax.random.PRNGKey(1)))
        e2 = float(eval_fn(trainer.model.params, batch, jax.random.PRNGKey(2)))
        assert e1 == e2


class TestIgnoreIndex:
    def test_minus_100_labels_are_excluded(self, belle_file, tok, tmp_path):
        """-100 labels (the torch CrossEntropyLoss ignore_index the reference
        inherits) are excluded from the mean, not gathered wrapped."""
        trainer = _trainer(belle_file, tok, tmp_path)
        V = trainer.model.config.vocab_size
        rs = np.random.RandomState(0)
        ids = rs.randint(1, V, (2, 10)).astype(np.int32)
        labels = ids.copy()
        labels[:, 6:] = -100  # mask the tail
        batch = {"input_ids": jnp.asarray(ids),
                 "attention_mask": jnp.ones_like(jnp.asarray(ids)),
                 "labels": jnp.asarray(labels)}
        loss_masked = float(trainer.loss_fn(trainer.model.params, batch,
                                            jax.random.PRNGKey(0)))
        # oracle: loss over only the first 6 positions (shifted: 5 targets)
        batch_head = {"input_ids": jnp.asarray(ids[:, :6]),
                      "attention_mask": jnp.ones((2, 6), jnp.int32),
                      "labels": jnp.asarray(ids[:, :6])}
        loss_head = float(trainer.loss_fn(trainer.model.params, batch_head,
                                          jax.random.PRNGKey(0)))
        assert np.isfinite(loss_masked)
        # same positions, same mean (forward sees the full sequence so logits
        # for the first 5 targets are identical — causal)
        np.testing.assert_allclose(loss_masked, loss_head, rtol=1e-5)


class TestPredict:
    def test_prediction_step_contract(self, belle_file, tok, tmp_path):
        trainer = _trainer(belle_file, tok, tmp_path)
        ds = BelleDataset(belle_file)
        loader = DataLoader(ds, 4, trainer.data_collator, shuffle=False,
                            drop_last=False)
        batch = next(iter(loader))
        db = trainer._device_batch(batch)
        loss, logits, labels = trainer.prediction_step(trainer.model.params, db)
        assert loss is not None and np.isfinite(float(loss))
        assert logits.shape[:2] == db["input_ids"].shape
        assert labels is not None

    def test_predict_returns_predictions_and_metrics(self, belle_file, tok,
                                                     tmp_path):
        calls = {}

        def compute_metrics(ep):
            calls["predictions"] = ep["predictions"]
            calls["label_ids"] = ep["label_ids"]
            return {"token_acc": float(
                (ep["predictions"][:, :-1].argmax(-1)
                 == ep["label_ids"][:, 1:]).mean())}

        trainer = _trainer(belle_file, tok, tmp_path)
        trainer.compute_metrics = compute_metrics
        out = trainer.predict(BelleDataset(belle_file))
        assert out["predictions"].shape[0] == 16
        assert out["label_ids"].shape[0] == 16
        assert "test_loss" in out["metrics"]
        assert "test_token_acc" in out["metrics"]
        assert calls["predictions"].shape[0] == 16


class TestSignatureColumns:
    def test_unknown_columns_are_dropped(self, belle_file, tok, tmp_path):
        trainer = _trainer(belle_file, tok, tmp_path)
        batch = {"input_ids": np.ones((2, 4), np.int32),
                 "attention_mask": np.ones((2, 4), np.int32),
                 "labels": np.ones((2, 4), np.int32),
                 "bogus_column": np.zeros((2, 4), np.float32)}
        db = trainer._device_batch(batch)
        assert "bogus_column" not in db
        assert set(db) == {"input_ids", "attention_mask", "labels"}

    def test_filtering_off_for_user_loss(self, belle_file, tok, tmp_path):
        trainer = _trainer(belle_file, tok, tmp_path)
        trainer._user_loss = True
        batch = {"input_ids": np.ones((2, 4), np.int32),
                 "extra": np.zeros((2,), np.float32)}
        db = trainer._device_batch(batch)
        assert "extra" in db

    def test_remove_unused_columns_false(self, belle_file, tok, tmp_path):
        trainer = _trainer(belle_file, tok, tmp_path,
                           remove_unused_columns=False)
        batch = {"input_ids": np.ones((2, 4), np.int32),
                 "extra": np.zeros((2,), np.float32)}
        assert "extra" in trainer._device_batch(batch)


class TestCallbacksAndControl:
    def test_event_sequence_and_early_stop(self, belle_file, tok, tmp_path):
        events = []

        class Spy(TrainerCallback):
            def on_init_end(self, trainer): events.append("init_end")
            def on_train_begin(self, trainer): events.append("train_begin")
            def on_epoch_begin(self, trainer, epoch): events.append("epoch_begin")
            def on_epoch_end(self, trainer, epoch): events.append("epoch_end")
            def on_step_begin(self, trainer): events.append("step_begin")
            def on_step_end(self, trainer):
                events.append("step_end")
                if trainer.state["global_step"] >= 2:
                    trainer.control.should_training_stop = True
            def on_train_end(self, trainer): events.append("train_end")

        trainer = _trainer(belle_file, tok, tmp_path, num_train_epochs=4)
        trainer.callbacks = [Spy()]
        # on_init_end fired at construction time — re-register by hand
        trainer.callbacks[0].on_init_end(trainer)
        trainer.train()
        assert trainer.state["global_step"] == 2  # control stopped training
        assert events[0] == "init_end"
        assert "train_begin" in events and "train_end" in events
        assert events.count("step_begin") == events.count("step_end") == 2
        assert "epoch_begin" in events and "epoch_end" in events
        # ordering: begin before end, pairwise
        assert events.index("step_begin") < events.index("step_end")

    def test_control_should_save(self, belle_file, tok, tmp_path):
        class SaveOnce(TrainerCallback):
            def on_step_begin(self, trainer):
                if trainer.state["global_step"] == 1:
                    trainer.control.should_save = True

        trainer = _trainer(belle_file, tok, tmp_path, save_steps=1000)
        trainer.callbacks = [SaveOnce()]
        trainer.train()
        ckpts = [d for d in os.listdir(trainer.args.output_dir)
                 if d.startswith("checkpoint-")]
        assert ckpts == ["checkpoint-2"]  # flag consumed after step 2's check


class TestBestCheckpointProtection:
    def test_best_off_save_cadence_is_saved_and_protected(self, belle_file,
                                                          tok, tmp_path):
        """A best metric at a non-save step writes its own checkpoint and
        rotation never deletes it (reference trainer.py:1325-1338,1465-1511)."""
        # eval every step; metric crafted so the BEST lands at step 1 (never a
        # save-cadence step: save_steps=4, 8 steps total with bsz 2)
        fake = iter([1.0, 5.0, 5.0, 5.0, 5.0, 5.0, 5.0, 5.0, 5.0, 5.0])

        trainer = _trainer(belle_file, tok, tmp_path,
                           per_device_train_batch_size=2,
                           save_steps=4, save_total_limit=1, eval_steps=1,
                           metric_for_best_model="eval_fake",
                           greater_is_better=False)
        trainer.eval_dataset = BelleDataset(belle_file)
        trainer.compute_metrics = lambda _: {"fake": next(fake)}
        trainer.train()
        out = trainer.args.output_dir
        ckpts = sorted(d for d in os.listdir(out)
                       if d.startswith("checkpoint-"))
        assert trainer.state["best_step"] == 1
        assert trainer.state["best_model_checkpoint"].endswith("checkpoint-1")
        # best survived rotation with save_total_limit=1
        assert "checkpoint-1" in ckpts
