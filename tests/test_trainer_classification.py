"""Trainer with a custom loss_fn/prediction_fn/compute_metrics — the BERT
classification fine-tuning path (reference trainer's compute_metrics +
prediction_step contract, trainer.py:697-787)."""

import numpy as np

import jax
import jax.numpy as jnp

from cleantransformer_tpu.config import BertConfig
from cleantransformer_tpu.models.bert import BertForSequenceClassification, bert_classify
from cleantransformer_tpu.ops.losses import cross_entropy_loss
from cleantransformer_tpu.trainer import Trainer, TrainingArguments, DataLoader


import pytest

pytestmark = pytest.mark.slow  # full tier; fast tier: -m 'not slow'

def test_bert_classification_finetune():
    cfg = BertConfig(vocab_size=64, hidden_size=32, num_hidden_layers=2,
                     num_attention_heads=4, intermediate_size=64, num_labels=2,
                     max_position_embeddings=16)
    model = BertForSequenceClassification(cfg, rng=jax.random.PRNGKey(0))
    model.config = cfg

    # synthetic separable task: label = (first token < 32)
    rs = np.random.RandomState(0)
    ids = rs.randint(0, 64, (64, 8)).astype(np.int32)
    labels = (ids[:, 0] < 32).astype(np.int32)

    class ArrayDataset:
        def __len__(self):
            return len(ids)

        def __getitem__(self, i):
            return {"input_ids": ids[i], "labels": labels[i]}

    def collate(batch):
        return {"input_ids": np.stack([b["input_ids"] for b in batch]),
                "attention_mask": np.ones((len(batch), 8), np.int32),
                "labels": np.stack([b["labels"] for b in batch])}

    def loss_fn(params, batch, rng):
        logits = bert_classify(params, cfg, batch["input_ids"],
                               batch["attention_mask"])
        return cross_entropy_loss(logits, batch["labels"])

    def prediction_fn(params, batch):
        return bert_classify(params, cfg, batch["input_ids"],
                             batch["attention_mask"])

    def compute_metrics(ep):
        acc = (ep["predictions"].argmax(-1) == ep["label_ids"]).mean()
        return {"eval_accuracy": float(acc)}

    args = TrainingArguments(output_dir="/tmp/bert_cls_test", num_train_epochs=6,
                             per_device_train_batch_size=16, learning_rate=5e-3,
                             logging_steps=0, save_steps=0,
                             metric_for_best_model="eval_accuracy",
                             greater_is_better=True)
    ds = ArrayDataset()
    trainer = Trainer(model=model, args=args, train_dataset=ds, eval_dataset=ds,
                      data_collator=collate, loss_fn=loss_fn,
                      prediction_fn=prediction_fn,
                      compute_metrics=compute_metrics, callbacks=[])
    trainer.train()
    metrics = trainer.evaluate()
    assert metrics["eval_accuracy"] > 0.9
    assert trainer.state["best_metric"] is not None
