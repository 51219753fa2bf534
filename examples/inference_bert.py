"""BERT sequence-classification inference (reference: examples/inference_bert.py).

  python examples/inference_bert.py --model_dir checkpoints/bert-base-go-emotion
  python examples/inference_bert.py --demo
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def load_model(config, model_dir):
    from cleantransformer_tpu.models.bert import BertForSequenceClassification
    from cleantransformer_tpu.utils.hf_loader import (
        load_checkpoint_dir, bert_params_from_state_dict)
    sd = load_checkpoint_dir(model_dir)
    params = bert_params_from_state_dict(sd, config)
    return BertForSequenceClassification(config, params=params)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_dir", type=str, default=None)
    parser.add_argument("--query", type=str, default="I like you. I love you")
    parser.add_argument("--demo", action="store_true")
    args, _ = parser.parse_known_args()

    import jax
    import jax.numpy as jnp
    from cleantransformer_tpu.config import BertConfig

    if args.demo or not args.model_dir:
        config = BertConfig(vocab_size=1000, hidden_size=64, num_hidden_layers=2,
                            num_attention_heads=4, intermediate_size=128,
                            num_labels=3)
        from cleantransformer_tpu.models.bert import BertForSequenceClassification
        model = BertForSequenceClassification(config, rng=jax.random.PRNGKey(0))
        classes = {"0": "neg", "1": "neutral", "2": "pos"}
        rs = np.random.RandomState(0)
        ids = rs.randint(0, 1000, (1, 12)).astype(np.int32)
        mask = np.ones_like(ids)
        seg = np.zeros_like(ids)
    else:
        d = json.load(open(os.path.join(args.model_dir, "config.json")))
        classes = d["id2label"]
        config = BertConfig(**d, num_labels=len(classes))
        model = load_model(config, args.model_dir)
        from cleantransformer_tpu.tokenizers import BertTokenizer
        tokenizer = BertTokenizer(
            vocab_file=os.path.join(args.model_dir, "vocab.txt"))
        enc = tokenizer.encode_plus(args.query, padding=False, truncation=False)
        ids = np.asarray([enc["input_ids"]], np.int32)
        mask = np.asarray([enc["attention_mask"]], np.int32)
        seg = np.asarray([enc["segment_ids"]], np.int32)

    logits = model(jnp.asarray(ids), jnp.asarray(mask), jnp.asarray(seg))
    probs = np.asarray(jax.nn.softmax(logits, axis=-1))[0]
    order = np.argsort(-probs)
    print("max_pred: {}, max_prob: {:.4f}".format(classes[str(order[0])],
                                                  probs[order[0]]))
    print("=" * 10, " details ", "=" * 10)
    for i in order:
        print(classes[str(i)], float(probs[i]))


if __name__ == "__main__":
    main()
