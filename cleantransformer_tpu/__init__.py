"""cleantransformer_tpu — a TPU-native JAX framework with the capabilities of
firechecking/CleanTransformer.

Not a port: the reference's torch.nn.Module stack (see /root/reference) is
re-designed TPU-first — functional pytree parameters, jitted fixed-shape decode
loops, Pallas kernels for the hot ops, and jax.sharding meshes in place of
NCCL/DDP. Public API stays parallel to the reference so users can switch:

  - configs:    GPTConfig, BertConfig, BloomConfig, LlamaConfig (config.py)
  - ops:        layer_norm, rms_norm, attention, activations, losses (ops/)
  - models:     GPTModel/GPTLMHeadModel, BertModel/BertForSequenceClassification,
                BloomModel/BloomForCausalLM, LlamaForCausalLM (models/)
  - generation: generate() with the reference's generation_configs keys (generation/)
  - tokenizers: BPETokenizer, WordPieceTokenizer, BertTokenizer (tokenizers/)
  - optim:      sgd, adamw (reference semantics) + decoupled adamw (optim.py)
  - trainer:    Trainer, BelleDataset                       (trainer/)
  - parallel:   mesh / sharding-rule helpers (DP, TP, ZeRO-style) (parallel/)
"""

__version__ = "0.1.0"

from cleantransformer_tpu.config import (  # noqa: F401
    GPTConfig, BertConfig, BloomConfig, LlamaConfig, MixtralConfig,
    Qwen2Config, auto_config)
