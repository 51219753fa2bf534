"""Helpers that convert *reference* torch models' state dicts into the HF
checkpoint layouts our loaders consume — the inverse of the reference's
examples/inference_*.py remap tables. Used only by tests (the reference model
with seeded random weights is the parity oracle)."""

import numpy as np


def t2n(t):
    return t.detach().cpu().numpy()


def ref_gpt_to_hf(ref_model):
    """Reference GPTLMHeadModel state_dict -> HF gpt2 names
    (inverse of examples/inference_gpt2.py:16-36)."""
    sd = {k: t2n(v) for k, v in ref_model.state_dict().items()}
    out = {"wte.weight": sd["gpt.tokens_embed.weight"],
           "wpe.weight": sd["gpt.position_embed.weight"]}
    i = 0
    while f"gpt.blocks.{i}.attn.c_attn.weight" in sd:
        for t in ("weight", "bias"):
            out[f"h.{i}.attn.c_attn.{t}"] = sd[f"gpt.blocks.{i}.attn.c_attn.{t}"]
            out[f"h.{i}.attn.c_proj.{t}"] = sd[f"gpt.blocks.{i}.attn.c_proj.{t}"]
            out[f"h.{i}.ln_1.{t}"] = sd[f"gpt.blocks.{i}.norm1.{t}"]
            out[f"h.{i}.mlp.c_fc.{t}"] = sd[f"gpt.blocks.{i}.mlp.0.{t}"]
            out[f"h.{i}.mlp.c_proj.{t}"] = sd[f"gpt.blocks.{i}.mlp.2.{t}"]
            out[f"h.{i}.ln_2.{t}"] = sd[f"gpt.blocks.{i}.norm2.{t}"]
        i += 1
    if "gpt.ln_f.weight" in sd:
        out["ln_f.weight"] = sd["gpt.ln_f.weight"]
        out["ln_f.bias"] = sd["gpt.ln_f.bias"]
    else:  # version='gpt' has no ln_f; loader still wants the keys
        d = sd["gpt.tokens_embed.weight"].shape[1]
        out["ln_f.weight"] = np.ones((d,), np.float32)
        out["ln_f.bias"] = np.zeros((d,), np.float32)
    return out


def ref_bloom_to_hf(ref_model):
    """Reference BloomForCausalLM state_dict -> HF bloom names
    (inverse of examples/inference_bloom.py:17-36)."""
    sd = {k: t2n(v) for k, v in ref_model.state_dict().items()}
    out = {}
    for k, v in sd.items():
        if k == "lm_head.weight":
            out["lm_head.weight"] = v
        elif k.startswith("bloom.blocks."):
            rest = k[len("bloom.blocks."):]
            out[f"h.{rest}"] = v
        elif k.startswith("bloom."):
            out[k[len("bloom."):]] = v
    return out


def ref_bert_to_hf(ref_model):
    """Reference BertForSequenceClassification state_dict -> HF bert names
    (inverse of examples/inference_bert.py:16-40)."""
    sd = {k: t2n(v) for k, v in ref_model.state_dict().items()}
    out = {
        "bert.embeddings.word_embeddings.weight": sd["bert.word_embeddings.weight"],
        "bert.embeddings.position_embeddings.weight": sd["bert.position_embeddings.weight"],
        "bert.embeddings.token_type_embeddings.weight": sd["bert.segment_embeddings.weight"],
        "bert.embeddings.LayerNorm.weight": sd["bert.embedding_post.0.weight"],
        "bert.embeddings.LayerNorm.bias": sd["bert.embedding_post.0.bias"],
        "bert.pooler.dense.weight": sd["bert.pooler.0.weight"],
        "bert.pooler.dense.bias": sd["bert.pooler.0.bias"],
    }
    if "classifier.weight" in sd:
        out["classifier.weight"] = sd["classifier.weight"]
        out["classifier.bias"] = sd["classifier.bias"]
    i = 0
    while f"bert.blocks.{i}.attention.q_linear.weight" in sd:
        p = f"bert.encoder.layer.{i}."
        b = f"bert.blocks.{i}."
        for t in ("weight", "bias"):
            out[p + f"attention.self.query.{t}"] = sd[b + f"attention.q_linear.{t}"]
            out[p + f"attention.self.key.{t}"] = sd[b + f"attention.k_linear.{t}"]
            out[p + f"attention.self.value.{t}"] = sd[b + f"attention.v_linear.{t}"]
            out[p + f"attention.output.dense.{t}"] = sd[b + f"attention_post.0.{t}"]
            out[p + f"attention.output.LayerNorm.{t}"] = sd[b + f"norm1.{t}"]
            out[p + f"intermediate.dense.{t}"] = sd[b + f"ffw.0.{t}"]
            out[p + f"output.dense.{t}"] = sd[b + f"ffw.2.{t}"]
            out[p + f"output.LayerNorm.{t}"] = sd[b + f"norm2.{t}"]
        i += 1
    return out
