"""Model configuration classes.

Mirrors the reference's per-model config surface (GPTConfig
reference: CleanTransformer/models/modeling_gpt.py:14-29, BertConfig
modeling_bert.py:17-47, BloomConfig modeling_bloom.py:17-54) including the
``**kwargs`` passthrough and Bloom's ``n_embed``/``hidden_size`` synonym
handling, so the same HuggingFace ``config.json`` files load unchanged.

TPU-specific additions (not in the reference): ``param_dtype`` /
``compute_dtype`` select the bf16 compute policy, and ``max_cache_len``
bounds the fixed-shape KV-cache used by the jitted decode loop.
"""

import json

import jax.numpy as jnp

_DTYPES = {
    "float32": jnp.float32,
    "bfloat16": jnp.bfloat16,
    "float16": jnp.float16,
}


def _resolve_dtype(d):
    if isinstance(d, str):
        return _DTYPES[d]
    return d


class BaseConfig:
    """Common plumbing: kwargs passthrough, json load, dtype policy."""

    def __init__(self, **kwargs):
        self.param_dtype = _resolve_dtype(kwargs.pop("param_dtype", jnp.float32))
        self.compute_dtype = _resolve_dtype(kwargs.pop("compute_dtype", jnp.float32))
        # fast path: Pallas blockwise attention for multi-token forwards
        # (training / prefill). Off by default = reference-parity dense path.
        self.use_flash_attention = kwargs.pop("use_flash_attention", False)
        # int8 weight-only quantized inference (ops/quant.py); generate()
        # quantizes the fp32 master params once per params identity
        self.quantize_int8 = kwargs.pop("quantize_int8", False)
        for k, v in kwargs.items():
            setattr(self, k, v)

    @classmethod
    def from_json(cls, config_fn, **overrides):
        d = json.load(open(config_fn, "r"))
        d.update(overrides)
        return cls(**d)

    def to_dict(self):
        # dtype fields serialize as their NAME ("float32"), which
        # _resolve_dtype accepts back — str(jnp.float32) would emit
        # "<class 'jax.numpy.float32'>" and break the round-trip
        return {k: (getattr(v, "__name__", str(v)) if k.endswith("dtype")
                    else v)
                for k, v in self.__dict__.items()}


class GPTConfig(BaseConfig):
    """GPT-1/2/3 config (reference: modeling_gpt.py:14-29)."""

    def __init__(self, vocab_size=100, n_embd=100, n_positions=100, n_layer=3, n_head=2,
                 n_ctx=2000, embd_pdrop=0.1, attn_pdrop=0.1, resid_pdrop=0.1,
                 layer_norm_epsilon=1e-5, afn="gelu_new", **kwargs):
        self.vocab_size = vocab_size
        self.n_embd = n_embd
        self.n_positions = n_positions
        self.n_layer = n_layer
        self.n_head = n_head
        self.n_ctx = n_ctx
        self.embd_pdrop, self.attn_pdrop, self.resid_pdrop = embd_pdrop, attn_pdrop, resid_pdrop
        self.layer_norm_epsilon = layer_norm_epsilon
        self.afn = afn
        kwargs.setdefault("model_type", "gpt2")  # HF family of this layout
        super().__init__(**kwargs)


class BertConfig(BaseConfig):
    """BERT config (reference: modeling_bert.py:17-47)."""

    def __init__(self, vocab_size=30522, hidden_size=768, num_hidden_layers=12,
                 num_attention_heads=12, intermediate_size=3072, hidden_act="gelu",
                 hidden_dropout_prob=0.1, attention_probs_dropout_prob=0.1,
                 max_position_embeddings=512, type_vocab_size=2, initializer_range=0.02,
                 layer_norm_eps=1e-12, pad_token_id=0, **kwargs):
        self.vocab_size = vocab_size
        self.hidden_size = hidden_size
        self.num_hidden_layers = num_hidden_layers
        self.num_attention_heads = num_attention_heads
        self.hidden_act = hidden_act
        self.intermediate_size = intermediate_size
        self.hidden_dropout_prob = hidden_dropout_prob
        self.attention_probs_dropout_prob = attention_probs_dropout_prob
        self.max_position_embeddings = max_position_embeddings
        self.type_vocab_size = type_vocab_size
        self.initializer_range = initializer_range
        self.layer_norm_eps = layer_norm_eps
        self.pad_token_id = pad_token_id
        kwargs.setdefault("model_type", "bert")
        super().__init__(**kwargs)


class BloomConfig(BaseConfig):
    """Bloom config with ``n_embed`` backward-compat (reference: modeling_bloom.py:17-54)."""

    def __init__(self, vocab_size=250880, hidden_size=64, n_layer=2, num_attention_heads=8,
                 layer_norm_epsilon=1e-5, initializer_range=0.02, use_cache=True,
                 bos_token_id=1, eos_token_id=2,
                 apply_residual_connection_post_layernorm=False,
                 hidden_dropout=0.0, attention_dropout=0.0,
                 pretraining_tp=1, slow_but_exact=False, **kwargs):
        self.vocab_size = vocab_size
        n_embed = kwargs.pop("n_embed", None)
        self.hidden_size = hidden_size if n_embed is None else n_embed
        self.n_layer = n_layer
        self.n_head = self.num_attention_heads = num_attention_heads
        self.layer_norm_epsilon = layer_norm_epsilon
        self.initializer_range = initializer_range
        self.use_cache = use_cache
        self.pretraining_tp = pretraining_tp
        self.apply_residual_connection_post_layernorm = apply_residual_connection_post_layernorm
        self.hidden_dropout = hidden_dropout
        self.attention_dropout = attention_dropout
        self.bos_token_id = bos_token_id
        self.eos_token_id = eos_token_id
        self.slow_but_exact = slow_but_exact
        self.num_hidden_layers = self.n_layer
        kwargs.setdefault("model_type", "bloom")
        super().__init__(**kwargs)


class LlamaConfig(BaseConfig):
    """Llama-family config (extension beyond the reference — the reference
    stops at Bloom, but a user switching frameworks expects the modern
    RoPE/RMSNorm/SwiGLU/GQA family). Field names match HF ``config.json``
    for llama/llama-2/llama-3/mistral-style checkpoints, so the same files
    load unchanged (the convention the reference sets for Bloom,
    examples/inference_bloom.py:50-63)."""

    def __init__(self, vocab_size=32000, hidden_size=4096,
                 intermediate_size=11008, num_hidden_layers=32,
                 num_attention_heads=32, num_key_value_heads=None,
                 hidden_act="silu", max_position_embeddings=2048,
                 initializer_range=0.02, rms_norm_eps=1e-6,
                 rope_theta=10000.0, attention_bias=False, mlp_bias=False,
                 tie_word_embeddings=False, bos_token_id=1, eos_token_id=2,
                 head_dim=None, num_local_experts=0, num_experts_per_tok=2,
                 router_aux_loss_coef=0.001, output_router_logits=False,
                 moe_capacity_factor=None, moe_impl=None, **kwargs):
        self.vocab_size = vocab_size
        self.hidden_size = hidden_size
        self.intermediate_size = intermediate_size
        self.n_layer = self.num_hidden_layers = num_hidden_layers
        self.n_head = self.num_attention_heads = num_attention_heads
        self.num_key_value_heads = (num_key_value_heads
                                    if num_key_value_heads is not None
                                    else num_attention_heads)
        assert num_attention_heads % self.num_key_value_heads == 0, \
            "num_attention_heads must be a multiple of num_key_value_heads"
        self.hidden_act = hidden_act
        self.max_position_embeddings = max_position_embeddings
        self.initializer_range = initializer_range
        self.rms_norm_eps = rms_norm_eps
        self.rope_theta = rope_theta
        self.attention_bias = attention_bias
        self.mlp_bias = mlp_bias
        self.tie_word_embeddings = tie_word_embeddings
        self.bos_token_id = bos_token_id
        self.eos_token_id = eos_token_id
        self.head_dim = (head_dim if head_dim is not None
                         else hidden_size // num_attention_heads)
        # sparse-MoE fields (HF Mixtral config.json names; 0 experts = dense
        # MLP). moe_impl picks the compute path (ops/moe.py): "dense"
        # (every expert runs every token — parity/EP baseline), "capacity"
        # (GShard fixed-capacity dispatch, uses moe_capacity_factor),
        # "ragged" (sorted grouped-matmul via lax.ragged_dot — the fast
        # exact single-device path). None = "capacity" if
        # moe_capacity_factor is set else "dense" (back-compat).
        self.num_local_experts = num_local_experts
        self.num_experts_per_tok = num_experts_per_tok
        self.router_aux_loss_coef = router_aux_loss_coef
        self.output_router_logits = output_router_logits
        self.moe_capacity_factor = moe_capacity_factor
        self.moe_impl = moe_impl
        # stamped so saved config.json files round-trip through auto_config
        kwargs.setdefault("model_type",
                          "mixtral" if num_local_experts else "llama")
        super().__init__(**kwargs)


# a Mixtral checkpoint's config.json is a LlamaConfig with num_local_experts
# > 0 (plus fields the kwargs passthrough keeps, e.g. sliding_window)
MixtralConfig = LlamaConfig


class Qwen2Config(LlamaConfig):
    """Qwen2/Qwen2.5 (HF ``model_type: qwen2``): llama architecture with
    biases on q/k/v but NOT o_proj, and a ``use_sliding_window`` gate —
    Qwen2 config.json files carry ``sliding_window`` even when the gate is
    off, so the raw field must not activate the Mistral window path."""

    def __init__(self, use_sliding_window=False, max_window_layers=0,
                 **kwargs):
        kwargs.setdefault("attention_bias", True)
        kwargs.setdefault("model_type", "qwen2")
        if not use_sliding_window:
            kwargs.pop("sliding_window", None)
        elif max_window_layers and max_window_layers > 0:
            raise ValueError(
                "per-layer sliding windows (use_sliding_window with "
                "max_window_layers > 0) are not supported — all-layer "
                "windows (max_window_layers=0) map onto the Mistral path")
        super().__init__(**kwargs)
        self.use_sliding_window = use_sliding_window
        self.max_window_layers = max_window_layers
        # HF Qwen2Attention: q/k/v Linear(bias=True), o_proj Linear(bias=False)
        self.attention_out_bias = False


def load_bloom_config(config_fn, **overrides):
    """Resolve the n_embed/hidden_size and n_head/num_attention_heads synonyms the
    same way the reference does (examples/inference_bloom.py:50-63)."""
    d = json.load(open(config_fn, "r"))
    for synonyms in (["n_embed", "hidden_size"], ["n_head", "num_attention_heads"]):
        source_k = next((k for k in synonyms if k in d), None)
        if source_k is not None:
            for k in synonyms:
                d[k] = d[source_k]
    d.update(overrides)
    return BloomConfig(**d)


def auto_config(config_fn, **overrides):
    """AutoConfig-style dispatch: read ``model_type`` from an HF config.json
    and build the matching config class (the transformers AutoConfig
    convention; unknown types are rejected loudly rather than guessed)."""
    mt = json.load(open(config_fn, "r")).get("model_type", None)
    dispatch = {
        "llama": LlamaConfig,
        "mistral": LlamaConfig,   # sliding_window passes through kwargs
        "mixtral": MixtralConfig,
        "qwen2": Qwen2Config,
        "gpt2": GPTConfig,
        "bert": BertConfig,
    }
    if mt == "bloom":
        return load_bloom_config(config_fn, **overrides)
    if mt in dispatch:
        return dispatch[mt].from_json(config_fn, **overrides)
    if mt is None:
        # config.json without a model_type (written before the classes
        # stamped one): disambiguate by the fields actually present —
        # guessing llama for a bloom save would crash deep in the loader
        d = json.load(open(config_fn, "r"))
        if "rope_theta" in d or "rms_norm_eps" in d:
            return LlamaConfig.from_json(config_fn, **overrides)
        if "n_embd" in d or "afn" in d or "n_positions" in d:
            return GPTConfig.from_json(config_fn, **overrides)
        if "type_vocab_size" in d:
            return BertConfig.from_json(config_fn, **overrides)
        if ("n_embed" in d or "pretraining_tp" in d
                or "apply_residual_connection_post_layernorm" in d):
            return load_bloom_config(config_fn, **overrides)
    raise ValueError(
        f"unknown model_type {mt!r} in {config_fn} "
        f"(supported: bloom, {', '.join(dispatch)})")
