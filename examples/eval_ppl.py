"""Perplexity evaluation over a jsonl corpus (capability the reference
leaves implicit in its loss prints; here it is a first-class CLI).

  python examples/eval_ppl.py --model_dir checkpoints/bloom-560m \
      --data_fn datasets/belle/dev.jsonl --bf16
  python examples/eval_ppl.py --demo

Computes token-level negative log-likelihood with the models' shift-CE
labels path (-100 pads excluded) over fixed-shape batches, and reports
nll/token and ppl = exp(nll). Model family resolved from config.json's
model_type (config.auto_config).
"""

import argparse
import json
import math
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def load_family(model_dir, **overrides):
    """(config, model) from an HF checkpoint dir, any supported family."""
    from cleantransformer_tpu.config import auto_config
    from cleantransformer_tpu.utils.hf_loader import load_checkpoint_dir
    config = auto_config(os.path.join(model_dir, "config.json"), **overrides)
    sd = load_checkpoint_dir(model_dir)
    mt = getattr(config, "model_type", "llama")
    if mt == "bloom":
        from cleantransformer_tpu.models.bloom import BloomForCausalLM
        from cleantransformer_tpu.utils.hf_loader import (
            bloom_params_from_state_dict)
        return config, BloomForCausalLM(
            config, params=bloom_params_from_state_dict(sd, config))
    if mt == "gpt2":
        from cleantransformer_tpu.models.gpt import GPTLMHeadModel
        from cleantransformer_tpu.utils.hf_loader import (
            gpt_params_from_state_dict)
        return config, GPTLMHeadModel(
            config, version="gpt2",
            params=gpt_params_from_state_dict(sd, config))
    from cleantransformer_tpu.models.llama import LlamaForCausalLM
    from cleantransformer_tpu.utils.hf_loader import (
        llama_params_from_state_dict)
    return config, LlamaForCausalLM(
        config, params=llama_params_from_state_dict(sd, config))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_dir", default=None, type=str)
    parser.add_argument("--data_fn", default=None, type=str)
    parser.add_argument("--batch_size", default=8, type=int)
    parser.add_argument("--max_len", default=512, type=int)
    parser.add_argument("--bf16", action="store_true")
    parser.add_argument("--flash", action="store_true")
    parser.add_argument("--demo", action="store_true")
    args, _ = parser.parse_known_args()

    import jax
    import jax.numpy as jnp
    from cleantransformer_tpu.trainer.data import BelleDataset, belle_collate

    overrides = {}
    if args.bf16:
        overrides["compute_dtype"] = "bfloat16"
    if args.flash:
        overrides["use_flash_attention"] = True

    if args.demo or not args.model_dir:
        from cleantransformer_tpu.config import LlamaConfig
        from cleantransformer_tpu.models.llama import LlamaForCausalLM
        from cleantransformer_tpu.tokenizers import BPETokenizer
        tokenizer = BPETokenizer(vocab_size=200)
        tokenizer.fit(["the quick brown fox jumps over the lazy dog " * 4])
        config = LlamaConfig(vocab_size=len(tokenizer.vocab), hidden_size=64,
                             intermediate_size=112, num_hidden_layers=2,
                             num_attention_heads=4, num_key_value_heads=2,
                             **overrides)
        model = LlamaForCausalLM(config, rng=jax.random.PRNGKey(0))
        tmp = tempfile.mkdtemp()
        data_fn = os.path.join(tmp, "dev.jsonl")
        with open(data_fn, "w") as f:
            for i in range(24):
                f.write(json.dumps({"instruction": "the quick brown fox",
                                    "output": "jumps over the lazy dog"}) + "\n")
        args.max_len, args.batch_size = 32, 4
        eos = ""
    else:
        config, model = load_family(args.model_dir, **overrides)
        from transformers import AutoTokenizer
        tokenizer = AutoTokenizer.from_pretrained(args.model_dir)
        if tokenizer.pad_token_id is None:
            tokenizer.pad_token = tokenizer.eos_token
        data_fn = args.data_fn
        eos = tokenizer.eos_token

    fwd = model.forward_fn()

    import functools

    @functools.partial(jax.jit, static_argnames=())
    def batch_nll(params, ids, mask, labels):
        """Summed shift-CE nll + valid-target count for one batch."""
        (out), _ = fwd(params, model.config, ids, mask, None, None, None)
        logits = out[0].astype(jnp.float32)
        shift_logits = logits[:, :-1]
        shift_labels = labels[:, 1:]
        valid = shift_labels != -100
        safe = jnp.where(valid, shift_labels, 0)
        logp = jax.nn.log_softmax(shift_logits, axis=-1)
        nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
        return jnp.sum(nll * valid), jnp.sum(valid)

    ds = BelleDataset(data_fn)
    total_nll, total_tok = 0.0, 0
    B = args.batch_size
    # the final partial batch is evaluated too (one extra compile at its
    # smaller shape) — silently dropping the tail would bias the metric
    for i in range(0, len(ds), B):
        batch = belle_collate(
            [ds[j] for j in range(i, min(i + B, len(ds)))], tokenizer,
            max_length=args.max_len, pad_to_max=True, eos_token=eos)
        labels = np.where(batch["attention_mask"] == 1,
                          batch["input_ids"], -100)
        s, n = jax.device_get(batch_nll(
            model.params, jnp.asarray(batch["input_ids"]),
            jnp.asarray(batch["attention_mask"]), jnp.asarray(labels)))
        total_nll += float(s)
        total_tok += int(n)

    nll = total_nll / max(total_tok, 1)
    print(json.dumps({"tokens": total_tok, "nll_per_token": round(nll, 4),
                      "ppl": round(math.exp(min(nll, 50.0)), 3)}))


if __name__ == "__main__":
    main()
