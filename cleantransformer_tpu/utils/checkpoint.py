"""Checkpointing: pytree save/load (self-contained safetensors), trainer
state, rng capture, rotation — the two tiers the reference has (SURVEY §5):
example tier (periodic full-weights save, ft_bloom.py:96-97) and trainer tier
(checkpoint-<step>/ dirs with weights + optimizer + rng + trainer_state.json,
best-model tracking, save_total_limit rotation, trainer/trainer.py:1303-1511).

The format is safetensors (the HF interchange format): our reader in
hf_loader.py parses the same files, and exported HF-layout checkpoints load
in transformers directly.
"""

import json
import os
import re
import shutil
import struct

import numpy as np

import jax

_DT2ST = {
    np.dtype(np.float64): "F64", np.dtype(np.float32): "F32",
    np.dtype(np.float16): "F16", np.dtype(np.int64): "I64",
    np.dtype(np.int32): "I32", np.dtype(np.int16): "I16",
    np.dtype(np.int8): "I8", np.dtype(np.uint8): "U8", np.dtype(np.bool_): "BOOL",
}


def save_safetensors(path, tensors, metadata=None):
    """Write a dict[str, array] as a safetensors file (bf16 supported)."""
    header = {}
    blobs = []
    offset = 0
    for name, arr in tensors.items():
        arr = np.asarray(arr)
        if str(arr.dtype) == "bfloat16":  # ml_dtypes bfloat16 from jax
            raw, st_dt = arr.view(np.uint16).tobytes(), "BF16"
        else:
            if arr.dtype not in _DT2ST:
                arr = arr.astype(np.float32)
            raw, st_dt = arr.tobytes(), _DT2ST[arr.dtype]
        header[name] = {"dtype": st_dt, "shape": list(arr.shape),
                        "data_offsets": [offset, offset + len(raw)]}
        blobs.append(raw)
        offset += len(raw)
    if metadata:
        header["__metadata__"] = {k: str(v) for k, v in metadata.items()}
    hdr = json.dumps(header).encode()
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(hdr)))
        f.write(hdr)
        for b in blobs:
            f.write(b)


def flatten_pytree(tree, prefix=""):
    """pytree -> {'a/b/0/c': array} with stable, invertible paths."""
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(flatten_pytree(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(flatten_pytree(v, f"{prefix}{i}/"))
    elif hasattr(tree, "_fields"):  # NamedTuple
        for k in tree._fields:
            out.update(flatten_pytree(getattr(tree, k), f"{prefix}{k}/"))
    else:
        out[prefix[:-1]] = tree
    return out


def unflatten_into(template, flat):
    """Rebuild arrays into the structure of ``template`` from flat paths."""
    def walk(node, prefix):
        if isinstance(node, dict):
            return {k: walk(v, f"{prefix}{k}/") for k, v in node.items()}
        if isinstance(node, (list, tuple)):
            vals = [walk(v, f"{prefix}{i}/") for i, v in enumerate(node)]
            return type(node)(vals) if not hasattr(node, "_fields") else type(node)(*vals)
        if hasattr(node, "_fields"):
            vals = {k: walk(getattr(node, k), f"{prefix}{k}/") for k in node._fields}
            return type(node)(**vals)
        return flat[prefix[:-1]]
    return walk(template, "")


def gather_pytree(tree):
    """Device->host fetch that is safe for multi-host / sharded arrays.

    Leaves whose shards all live on this process fetch directly
    (np.asarray); non-fully-addressable leaves — ZeRO-3 params or ZeRO-1
    optimizer moments laid out across a multi-host mesh — are all-gathered
    across processes first (the consolidation the reference delegates to
    FSDP FULL_STATE_DICT / DeepSpeed, trainer/trainer.py:1351-1381). The
    gather is a COLLECTIVE: every process must call this, even though only
    process 0 subsequently writes files."""
    def fetch(x):
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            from jax.experimental import multihost_utils
            return np.asarray(
                multihost_utils.process_allgather(x, tiled=True))
        return np.asarray(x)
    return jax.tree_util.tree_map(fetch, tree)


def reshard_like(loaded, template):
    """Place checkpoint-loaded host arrays back onto the template's MESH
    shardings (resume under ZeRO-3/TP/multi-host: each process puts only its
    addressable shards). Leaves whose template is not mesh-sharded stay host
    numpy — committing them to a single local device here would make the
    trainer's later shard_params() a cross-host device transfer (unsupported
    on CPU/gloo backends), whereas host arrays redistribute freely."""
    def place(x, t):
        if isinstance(t, jax.Array) and isinstance(
                t.sharding, jax.sharding.NamedSharding):
            return jax.device_put(x, t.sharding)
        return x
    return jax.tree_util.tree_map(place, loaded, template)


def save_pytree(path, tree, metadata=None):
    flat = {k: np.asarray(v) for k, v in flatten_pytree(tree).items()}
    save_safetensors(path, flat, metadata)


def load_pytree(path, template):
    from cleantransformer_tpu.utils.hf_loader import _load_safetensors
    flat = _load_safetensors(path)
    return unflatten_into(template, flat)


# ---------------------------------------------------------------------------
# trainer-tier checkpoint dirs
# ---------------------------------------------------------------------------

CKPT_PREFIX = "checkpoint-"


def save_checkpoint(out_dir, step, params, opt_state=None, trainer_state=None,
                    rng_state=None):
    """Write checkpoint-<step>/ with weights, optimizer state, trainer state,
    and host rng (mirroring trainer/trainer.py:1303-1463).

    ATOMIC: everything is written into checkpoint-<step>.partial and renamed
    at the end, so a crash mid-write can never leave a directory that
    ``get_last_checkpoint`` would resume from."""
    ckpt = os.path.join(out_dir, f"{CKPT_PREFIX}{step}")
    if os.path.isdir(ckpt):
        return ckpt
    tmp = ckpt + ".partial"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    save_pytree(os.path.join(tmp, "model.safetensors"), params)
    if opt_state is not None:
        save_pytree(os.path.join(tmp, "optimizer.safetensors"), opt_state)
    if trainer_state is not None:
        with open(os.path.join(tmp, "trainer_state.json"), "w") as f:
            json.dump(trainer_state, f, indent=2)
    if rng_state is not None:
        np.save(os.path.join(tmp, "rng_state.npy"),
                np.asarray(rng_state, dtype=np.uint32))
    os.rename(tmp, ckpt)
    return ckpt


def load_checkpoint(ckpt_dir, params_template, opt_template=None):
    params = load_pytree(os.path.join(ckpt_dir, "model.safetensors"), params_template)
    opt_state = None
    opt_path = os.path.join(ckpt_dir, "optimizer.safetensors")
    if opt_template is not None and os.path.exists(opt_path):
        opt_state = load_pytree(opt_path, opt_template)
    trainer_state = None
    ts_path = os.path.join(ckpt_dir, "trainer_state.json")
    if os.path.exists(ts_path):
        trainer_state = json.load(open(ts_path))
    rng_state = None
    rng_path = os.path.join(ckpt_dir, "rng_state.npy")
    if os.path.exists(rng_path):
        rng_state = np.load(rng_path)
    return params, opt_state, trainer_state, rng_state


def get_last_checkpoint(out_dir):
    """Auto-discover the newest checkpoint-<step>/ (trainer.py:351-354)."""
    if not os.path.isdir(out_dir):
        return None
    best = None
    for name in os.listdir(out_dir):
        m = re.fullmatch(rf"{CKPT_PREFIX}(\d+)", name)
        if m and (best is None or int(m.group(1)) > best[0]):
            best = (int(m.group(1)), os.path.join(out_dir, name))
    return best[1] if best else None


def rotate_checkpoints(out_dir, save_total_limit, best_ckpt=None):
    """Delete oldest checkpoints beyond the limit, never deleting the best
    (trainer.py:1465-1511)."""
    if not save_total_limit:
        return
    ckpts = []
    for name in os.listdir(out_dir):
        m = re.fullmatch(rf"{CKPT_PREFIX}(\d+)", name)
        if m:
            ckpts.append((int(m.group(1)), os.path.join(out_dir, name)))
    ckpts.sort()
    keep = {best_ckpt} if best_ckpt else set()
    removable = [p for _, p in ckpts if p not in keep]
    excess = len(ckpts) - save_total_limit
    for p in removable[:max(0, excess)]:
        shutil.rmtree(p, ignore_errors=True)


# ---------------------------------------------------------------------------
# HF-layout export (interop: transformers can load our checkpoints)
# ---------------------------------------------------------------------------

def export_hf_gpt2(path, params):
    """Our stacked GPT pytree -> HF gpt2-layout safetensors
    (inverse of hf_loader.gpt_params_from_state_dict)."""
    sd = {"wte.weight": params["tokens_embed"], "wpe.weight": params["position_embed"]}
    blocks = params["blocks"]
    L = np.asarray(blocks["ln_1"]["w"]).shape[0]
    for i in range(L):
        sd[f"h.{i}.ln_1.weight"] = blocks["ln_1"]["w"][i]
        sd[f"h.{i}.ln_1.bias"] = blocks["ln_1"]["b"][i]
        sd[f"h.{i}.attn.c_attn.weight"] = blocks["attn"]["c_attn"]["w"][i]
        sd[f"h.{i}.attn.c_attn.bias"] = blocks["attn"]["c_attn"]["b"][i]
        sd[f"h.{i}.attn.c_proj.weight"] = blocks["attn"]["c_proj"]["w"][i]
        sd[f"h.{i}.attn.c_proj.bias"] = blocks["attn"]["c_proj"]["b"][i]
        sd[f"h.{i}.ln_2.weight"] = blocks["ln_2"]["w"][i]
        sd[f"h.{i}.ln_2.bias"] = blocks["ln_2"]["b"][i]
        sd[f"h.{i}.mlp.c_fc.weight"] = blocks["mlp"]["c_fc"]["w"][i]
        sd[f"h.{i}.mlp.c_fc.bias"] = blocks["mlp"]["c_fc"]["b"][i]
        sd[f"h.{i}.mlp.c_proj.weight"] = blocks["mlp"]["c_proj"]["w"][i]
        sd[f"h.{i}.mlp.c_proj.bias"] = blocks["mlp"]["c_proj"]["b"][i]
    if "ln_f" in params:
        sd["ln_f.weight"] = params["ln_f"]["w"]
        sd["ln_f.bias"] = params["ln_f"]["b"]
    save_safetensors(path, {k: np.asarray(v) for k, v in sd.items()})


def export_hf_bloom(path, params):
    """Our Bloom pytree -> HF bloom-layout safetensors (Linear weights
    transposed back to (out, in))."""
    sd = {"word_embeddings.weight": params["word_embeddings"],
          "word_embeddings_layernorm.weight": params["word_embeddings_layernorm"]["w"],
          "word_embeddings_layernorm.bias": params["word_embeddings_layernorm"]["b"],
          "ln_f.weight": params["ln_f"]["w"], "ln_f.bias": params["ln_f"]["b"]}
    if "lm_head" in params:  # absent when weight-tied
        sd["lm_head.weight"] = params["lm_head"]
    blocks = params["blocks"]
    L = np.asarray(blocks["input_layernorm"]["w"]).shape[0]
    for i in range(L):
        sd[f"h.{i}.input_layernorm.weight"] = blocks["input_layernorm"]["w"][i]
        sd[f"h.{i}.input_layernorm.bias"] = blocks["input_layernorm"]["b"][i]
        sd[f"h.{i}.self_attention.query_key_value.weight"] = np.asarray(
            blocks["self_attention"]["query_key_value"]["w"][i]).T
        sd[f"h.{i}.self_attention.query_key_value.bias"] = blocks["self_attention"]["query_key_value"]["b"][i]
        sd[f"h.{i}.self_attention.dense.weight"] = np.asarray(
            blocks["self_attention"]["dense"]["w"][i]).T
        sd[f"h.{i}.self_attention.dense.bias"] = blocks["self_attention"]["dense"]["b"][i]
        sd[f"h.{i}.post_attention_layernorm.weight"] = blocks["post_attention_layernorm"]["w"][i]
        sd[f"h.{i}.post_attention_layernorm.bias"] = blocks["post_attention_layernorm"]["b"][i]
        sd[f"h.{i}.mlp.dense_h_to_4h.weight"] = np.asarray(
            blocks["mlp"]["dense_h_to_4h"]["w"][i]).T
        sd[f"h.{i}.mlp.dense_h_to_4h.bias"] = blocks["mlp"]["dense_h_to_4h"]["b"][i]
        sd[f"h.{i}.mlp.dense_4h_to_h.weight"] = np.asarray(
            blocks["mlp"]["dense_4h_to_h"]["w"][i]).T
        sd[f"h.{i}.mlp.dense_4h_to_h.bias"] = blocks["mlp"]["dense_4h_to_h"]["b"][i]
    save_safetensors(path, {k: np.asarray(v) for k, v in sd.items()})


def export_hf_llama(path, params):
    """Our stacked Llama-family pytree -> HF llama-layout safetensors
    (model.* prefixes, Linear weights transposed back to (out, in); Qwen2's
    qkv biases ride along, MoE experts back to block_sparse_moe.experts.N.w*
    — the inverse of hf_loader.llama_params_from_state_dict)."""
    sd = {"model.embed_tokens.weight": params["embed_tokens"],
          "model.norm.weight": params["norm"]["w"]}
    if "lm_head" in params:  # absent when weight-tied
        sd["lm_head.weight"] = params["lm_head"]
    blocks = params["blocks"]
    L = np.asarray(blocks["input_layernorm"]["w"]).shape[0]

    def put_lin(name, p, i):
        sd[name + ".weight"] = np.asarray(p["w"][i]).T
        if "b" in p:
            sd[name + ".bias"] = p["b"][i]

    for i in range(L):
        pre = f"model.layers.{i}."
        sd[pre + "input_layernorm.weight"] = blocks["input_layernorm"]["w"][i]
        sd[pre + "post_attention_layernorm.weight"] = \
            blocks["post_attention_layernorm"]["w"][i]
        for proj in ("q_proj", "k_proj", "v_proj", "o_proj"):
            put_lin(pre + "self_attn." + proj,
                    blocks["self_attn"][proj], i)
        if "mlp" in blocks:
            for proj in ("gate_proj", "up_proj", "down_proj"):
                put_lin(pre + "mlp." + proj, blocks["mlp"][proj], i)
        else:
            moe = blocks["block_sparse_moe"]
            sd[pre + "block_sparse_moe.gate.weight"] = \
                np.asarray(moe["gate"]["w"][i]).T
            E = np.asarray(moe["experts"]["gate_proj"]["w"]).shape[1]
            hf_names = {"gate_proj": "w1", "down_proj": "w2", "up_proj": "w3"}
            for ours, hf in hf_names.items():
                w = np.asarray(moe["experts"][ours]["w"][i])  # (E, in, out)
                for e in range(E):
                    sd[pre + f"block_sparse_moe.experts.{e}.{hf}.weight"] = \
                        w[e].T
    save_safetensors(path, {k: np.asarray(v) for k, v in sd.items()})
