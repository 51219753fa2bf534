"""HuggingFace checkpoint -> pytree parameter loading.

The reference loads HF checkpoints by remapping state-dict keys
(examples/inference_gpt2.py:16-36, inference_bert.py:16-40,
inference_bloom.py:17-36); those remap tables are the spec here, with two
TPU-driven changes:

 1. per-layer weights are *stacked* along a leading layer axis (the models
    scan over layers instead of unrolling);
 2. torch.nn.Linear weights ((out, in)) are transposed to the (in, out)
    right-multiply layout (HF GPT-2's Conv1D weights are already (in, out)
    and are NOT transposed — reference Conv1D, modeling_gpt.py:32-46).

Reading ``pytorch_model.bin`` uses torch (cpu) when available; ``.safetensors``
files are read with a self-contained parser (no torch needed).
"""

import json
import os
import struct

import numpy as np

_SAFETENSORS_DTYPES = {
    "F64": np.float64, "F32": np.float32, "F16": np.float16,
    "I64": np.int64, "I32": np.int32, "I16": np.int16, "I8": np.int8,
    "U8": np.uint8, "BOOL": np.bool_,
}


def _load_safetensors(path):
    """Minimal safetensors reader (header = u64 length + json; raw tensors)."""
    out = {}
    with open(path, "rb") as f:
        (hdr_len,) = struct.unpack("<Q", f.read(8))
        header = json.loads(f.read(hdr_len))
        base = f.tell()
        for name, meta in header.items():
            if name == "__metadata__":
                continue
            dt = meta["dtype"]
            begin, end = meta["data_offsets"]
            f.seek(base + begin)
            raw = f.read(end - begin)
            if dt == "BF16":
                u16 = np.frombuffer(raw, dtype=np.uint16)
                arr = (u16.astype(np.uint32) << 16).view(np.float32)
            else:
                arr = np.frombuffer(raw, dtype=_SAFETENSORS_DTYPES[dt])
            out[name] = arr.reshape(meta["shape"]).copy()
    return out


# torch storage-class name -> (numpy dtype to read raw bytes as, bf16 flag).
# bf16 has no numpy dtype: read uint16 and widen to f32 (<<16 into the
# mantissa-aligned position, same trick as the safetensors reader above).
_TORCH_STORAGE_DTYPES = {
    "DoubleStorage": (np.float64, False), "FloatStorage": (np.float32, False),
    "HalfStorage": (np.float16, False), "BFloat16Storage": (np.uint16, True),
    "LongStorage": (np.int64, False), "IntStorage": (np.int32, False),
    "ShortStorage": (np.int16, False), "CharStorage": (np.int8, False),
    "ByteStorage": (np.uint8, False), "BoolStorage": (np.bool_, False),
}


def _load_torch_bin(path):
    """Self-contained reader for torch's zipfile checkpoint format — no torch.

    A ``pytorch_model.bin`` saved by modern torch is a zip archive holding
    ``<name>/data.pkl`` (a pickle whose tensors are persistent-id stubs) plus
    one raw little-endian buffer per storage at ``<name>/data/<key>``. We run
    a restricted unpickler: persistent ids ``('storage', Type, key, loc, n)``
    resolve to lazily-read numpy buffers, and ``torch._utils._rebuild_tensor*``
    is replaced by an as_strided view + copy (torch strides are in elements,
    numpy's in bytes). Anything else rebuildable is rejected — this reads
    weights, it does not execute checkpoint code.
    """
    import pickle
    import zipfile

    zf = zipfile.ZipFile(path)
    names = zf.namelist()
    pkl = [n for n in names if n.endswith("/data.pkl")]
    if not pkl:
        raise ValueError(f"{path}: not a torch zipfile checkpoint")
    prefix = pkl[0][: -len("data.pkl")]

    def load_storage(storage_cls, key):
        np_dtype, is_bf16 = _TORCH_STORAGE_DTYPES[storage_cls]
        raw = zf.read(f"{prefix}data/{key}")
        arr = np.frombuffer(raw, dtype=np_dtype)
        if is_bf16:
            arr = (arr.astype(np.uint32) << 16).view(np.float32)
        return arr

    class _Stub:
        # placeholder for torch.FloatStorage etc. — carries only the name
        def __init__(self, name):
            self.name = name

    def rebuild_tensor(storage, storage_offset, size, stride, *unused):
        if not size:  # 0-dim tensor
            return storage[storage_offset:storage_offset + 1].copy().reshape(())
        item = storage.itemsize
        view = np.lib.stride_tricks.as_strided(
            storage[storage_offset:], shape=tuple(size),
            strides=tuple(s * item for s in stride))
        return view.copy()

    _ALLOWED = {
        ("collections", "OrderedDict"): dict,
        ("torch._utils", "_rebuild_tensor_v2"): rebuild_tensor,
        ("torch._utils", "_rebuild_tensor"): rebuild_tensor,
        ("torch.serialization", "_get_layout"): lambda name: None,
        ("torch", "Size"): tuple,
    }

    class _Unpickler(pickle.Unpickler):
        def find_class(self, module, name):
            if (module, name) in _ALLOWED:
                return _ALLOWED[(module, name)]
            if module == "torch" and name.endswith("Storage"):
                return _Stub(name)
            raise pickle.UnpicklingError(
                f"blocked unpickle of {module}.{name} in {path}")

        def persistent_load(self, pid):
            kind, storage_type, key = pid[0], pid[1], pid[2]
            if kind != "storage":
                raise pickle.UnpicklingError(f"unknown persistent id {pid!r}")
            name = storage_type.name if isinstance(storage_type, _Stub) \
                else storage_type.__name__
            return load_storage(name, key)

    with zf.open(pkl[0]) as f:
        sd = _Unpickler(f).load()
    if not isinstance(sd, dict):
        raise ValueError(f"{path}: checkpoint root is not a state dict")
    return {k: v.astype(np.float32) if v.dtype == np.float16 else v
            for k, v in sd.items() if isinstance(v, np.ndarray)}


def load_state_dict(path):
    """Load a checkpoint file (.safetensors or torch .bin/.pt) to numpy dict.

    torch zipfile checkpoints are read by the self-contained numpy reader
    (deployment stays torch-free); legacy (non-zip) torch saves fall back to
    torch when it is importable.
    """
    if path.endswith(".safetensors"):
        return _load_safetensors(path)
    import zipfile
    if zipfile.is_zipfile(path):
        return _load_torch_bin(path)
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    if not isinstance(sd, dict):
        sd = sd.state_dict()
    return {k: v.float().numpy() if v.dtype in (torch.bfloat16, torch.float16)
            else v.numpy() for k, v in sd.items()}


def load_checkpoint_dir(model_dir):
    """Find and load the model weights in an HF checkpoint directory."""
    for name in ("model.safetensors", "pytorch_model.bin", "pytorch_model.pt"):
        p = os.path.join(model_dir, name)
        if os.path.exists(p):
            return load_state_dict(p)
    raise FileNotFoundError(f"no checkpoint file found in {model_dir}")


def _np(x):
    return np.asarray(x, dtype=np.float32)


def _stack(sd, fmt, n_layer, transpose=False):
    arrs = [_np(sd[fmt.format(i=i)]) for i in range(n_layer)]
    if transpose:
        arrs = [a.T for a in arrs]
    return np.stack(arrs)


def gpt_params_from_state_dict(sd, config, dtype=np.float32):
    """HF gpt2 layout (wte/wpe/h.N.*, examples/inference_gpt2.py:16-36) ->
    stacked GPT pytree. Conv1D weights are already (in, out): no transpose."""
    if any(k.startswith("transformer.") for k in sd):
        sd = {k[len("transformer."):] if k.startswith("transformer.") else k: v
              for k, v in sd.items()}
    L = config.n_layer
    params = {
        "tokens_embed": _np(sd["wte.weight"]),
        "position_embed": _np(sd["wpe.weight"]),
        "blocks": {
            "ln_1": {"w": _stack(sd, "h.{i}.ln_1.weight", L),
                     "b": _stack(sd, "h.{i}.ln_1.bias", L)},
            "attn": {
                "c_attn": {"w": _stack(sd, "h.{i}.attn.c_attn.weight", L),
                           "b": _stack(sd, "h.{i}.attn.c_attn.bias", L)},
                "c_proj": {"w": _stack(sd, "h.{i}.attn.c_proj.weight", L),
                           "b": _stack(sd, "h.{i}.attn.c_proj.bias", L)},
            },
            "ln_2": {"w": _stack(sd, "h.{i}.ln_2.weight", L),
                     "b": _stack(sd, "h.{i}.ln_2.bias", L)},
            "mlp": {
                "c_fc": {"w": _stack(sd, "h.{i}.mlp.c_fc.weight", L),
                         "b": _stack(sd, "h.{i}.mlp.c_fc.bias", L)},
                "c_proj": {"w": _stack(sd, "h.{i}.mlp.c_proj.weight", L),
                           "b": _stack(sd, "h.{i}.mlp.c_proj.bias", L)},
            },
        },
        "ln_f": {"w": _np(sd["ln_f.weight"]), "b": _np(sd["ln_f.bias"])},
    }
    return _to_dtype(params, dtype)


def bloom_params_from_state_dict(sd, config, dtype=np.float32):
    """HF bloom layout with optional 'transformer.' prefix and tied-lm_head
    fallback (examples/inference_bloom.py:17-36). Linear weights transposed
    to (in, out)."""
    prefix = "transformer." if "transformer.word_embeddings.weight" in sd else ""
    if prefix:
        sd = {**{k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)},
              **{k: v for k, v in sd.items() if not k.startswith(prefix)}}
    L = config.n_layer
    params = {
        "word_embeddings": _np(sd["word_embeddings.weight"]),
        "word_embeddings_layernorm": {"w": _np(sd["word_embeddings_layernorm.weight"]),
                                      "b": _np(sd["word_embeddings_layernorm.bias"])},
        "blocks": {
            "input_layernorm": {"w": _stack(sd, "h.{i}.input_layernorm.weight", L),
                                "b": _stack(sd, "h.{i}.input_layernorm.bias", L)},
            "self_attention": {
                "query_key_value": {"w": _stack(sd, "h.{i}.self_attention.query_key_value.weight", L, transpose=True),
                                    "b": _stack(sd, "h.{i}.self_attention.query_key_value.bias", L)},
                "dense": {"w": _stack(sd, "h.{i}.self_attention.dense.weight", L, transpose=True),
                          "b": _stack(sd, "h.{i}.self_attention.dense.bias", L)},
            },
            "post_attention_layernorm": {"w": _stack(sd, "h.{i}.post_attention_layernorm.weight", L),
                                         "b": _stack(sd, "h.{i}.post_attention_layernorm.bias", L)},
            "mlp": {
                "dense_h_to_4h": {"w": _stack(sd, "h.{i}.mlp.dense_h_to_4h.weight", L, transpose=True),
                                  "b": _stack(sd, "h.{i}.mlp.dense_h_to_4h.bias", L)},
                "dense_4h_to_h": {"w": _stack(sd, "h.{i}.mlp.dense_4h_to_h.weight", L, transpose=True),
                                  "b": _stack(sd, "h.{i}.mlp.dense_4h_to_h.bias", L)},
            },
        },
        "ln_f": {"w": _np(sd["ln_f.weight"]), "b": _np(sd["ln_f.bias"])},
        "lm_head": _np(sd["lm_head.weight"]) if "lm_head.weight" in sd
                   else _np(sd["word_embeddings.weight"]),
    }
    return _to_dtype(params, dtype)


def llama_params_from_state_dict(sd, config, dtype=np.float32):
    """HF llama layout (model.embed_tokens / model.layers.N.* / model.norm /
    lm_head) -> stacked Llama pytree. torch Linear weights transposed to
    (in, out); tied-lm_head fallback mirrors the Bloom loader."""
    if any(k.startswith("model.") for k in sd):
        sd = {k[len("model."):] if k.startswith("model.") else k: v
              for k, v in sd.items()}
    L = config.n_layer
    l = "layers.{i}."

    def lin(name, bias_flag):
        # presence-driven: a checkpoint that carries biases (Qwen2 qkv)
        # loads them regardless of the config flag — silently dropping
        # weights that exist in the file would corrupt the model
        del bias_flag
        p = {"w": _stack(sd, l + name + ".weight", L, transpose=True)}
        if (l.format(i=0) + name + ".bias") in sd:
            p["b"] = _stack(sd, l + name + ".bias", L)
        return p

    ab, mb = config.attention_bias, config.mlp_bias
    E = getattr(config, "num_local_experts", 0)
    if E and E > 0:
        # Mixtral sparse-MoE layout: block_sparse_moe.gate + experts.M.w1/w2/w3
        # (w1=gate_proj, w3=up_proj, w2=down_proj); stacked (L, E, in, out)
        def experts(wname):
            return np.stack([
                np.stack([_np(sd[f"layers.{i}.block_sparse_moe.experts."
                              f"{e}.{wname}.weight"]).T for e in range(E)])
                for i in range(L)])
        mlp = {
            "gate": {"w": _stack(sd, l + "block_sparse_moe.gate.weight", L,
                                 transpose=True)},
            "experts": {
                "gate_proj": {"w": experts("w1")},
                "up_proj": {"w": experts("w3")},
                "down_proj": {"w": experts("w2")},
            },
        }
        mlp_key = "block_sparse_moe"
    else:
        mlp = {
            "gate_proj": lin("mlp.gate_proj", mb),
            "up_proj": lin("mlp.up_proj", mb),
            "down_proj": lin("mlp.down_proj", mb),
        }
        mlp_key = "mlp"
    params = {
        "embed_tokens": _np(sd["embed_tokens.weight"]),
        "blocks": {
            "input_layernorm": {"w": _stack(sd, l + "input_layernorm.weight", L)},
            "self_attn": {
                "q_proj": lin("self_attn.q_proj", ab),
                "k_proj": lin("self_attn.k_proj", ab),
                "v_proj": lin("self_attn.v_proj", ab),
                "o_proj": lin("self_attn.o_proj", ab),
            },
            "post_attention_layernorm": {
                "w": _stack(sd, l + "post_attention_layernorm.weight", L)},
            mlp_key: mlp,
        },
        "norm": {"w": _np(sd["norm.weight"])},
    }
    # tied configs keep ONE parameter (HF state dicts may still carry the
    # duplicate lm_head.weight view — dropping it preserves the tie)
    if "lm_head.weight" in sd and not config.tie_word_embeddings:
        params["lm_head"] = _np(sd["lm_head.weight"])
    return _to_dtype(params, dtype)


def bert_params_from_state_dict(sd, config, dtype=np.float32, with_classifier=True):
    """HF bert layout (bert.embeddings/encoder.layer.N, inference_bert.py:16-40).
    All torch Linear weights transposed to (in, out)."""
    L = config.num_hidden_layers
    e = "bert.embeddings."
    l = "bert.encoder.layer.{i}."
    params = {
        "word_embeddings": _np(sd[e + "word_embeddings.weight"]),
        "position_embeddings": _np(sd[e + "position_embeddings.weight"]),
        "segment_embeddings": _np(sd[e + "token_type_embeddings.weight"]),
        "embedding_ln": {"w": _np(sd[e + "LayerNorm.weight"]),
                         "b": _np(sd[e + "LayerNorm.bias"])},
        "blocks": {
            "attn": {
                "q": {"w": _stack(sd, l + "attention.self.query.weight", L, transpose=True),
                      "b": _stack(sd, l + "attention.self.query.bias", L)},
                "k": {"w": _stack(sd, l + "attention.self.key.weight", L, transpose=True),
                      "b": _stack(sd, l + "attention.self.key.bias", L)},
                "v": {"w": _stack(sd, l + "attention.self.value.weight", L, transpose=True),
                      "b": _stack(sd, l + "attention.self.value.bias", L)},
                "out": {"w": _stack(sd, l + "attention.output.dense.weight", L, transpose=True),
                        "b": _stack(sd, l + "attention.output.dense.bias", L)},
            },
            "norm1": {"w": _stack(sd, l + "attention.output.LayerNorm.weight", L),
                      "b": _stack(sd, l + "attention.output.LayerNorm.bias", L)},
            "ffw": {
                "fc": {"w": _stack(sd, l + "intermediate.dense.weight", L, transpose=True),
                       "b": _stack(sd, l + "intermediate.dense.bias", L)},
                "out": {"w": _stack(sd, l + "output.dense.weight", L, transpose=True),
                        "b": _stack(sd, l + "output.dense.bias", L)},
            },
            "norm2": {"w": _stack(sd, l + "output.LayerNorm.weight", L),
                      "b": _stack(sd, l + "output.LayerNorm.bias", L)},
        },
        "pooler": {"w": _np(sd["bert.pooler.dense.weight"]).T,
                   "b": _np(sd["bert.pooler.dense.bias"])},
    }
    if with_classifier and "classifier.weight" in sd:
        params["classifier"] = {"w": _np(sd["classifier.weight"]).T,
                                "b": _np(sd["classifier.bias"])}
    return _to_dtype(params, dtype)


def _to_dtype(tree, dtype):
    if dtype is None or dtype == np.float32:
        return tree
    import jax
    return jax.tree_util.tree_map(lambda x: x.astype(dtype), tree)
