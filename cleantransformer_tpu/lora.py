"""LoRA — low-rank adaptation for parameter-efficient SFT.

The reference delegates parameter-efficient fine-tuning to the ``peft``
library (imported by its trainer, CleanTransformer/trainer/trainer.py:24-127);
this is the first-class TPU-native equivalent, built on the same functional
stance as everything else: adapters are a plain pytree, merging is a
tree-map, and training them is the unmodified ``Trainer`` optimizing a
(small) params pytree.

Design:

 - ``init_lora_params(base, rng, rank, targets)`` builds ``{"lora_a": (L, in,
   r), "lora_b": (L, r, out)}`` pairs (names chosen so the Trainer's
   bias-exclusion decay rule, which matches leaves literally named "b",
   never skips weight decay on the B matrices) for every targeted stacked projection
   (B zero-initialized, so step 0 is exactly the base model — the standard
   LoRA init).
 - ``merge_lora(base, lora, scaling)`` returns base-shaped params with
   ``W + scaling * A @ B`` on targeted leaves (``scaling = alpha / rank``).
   Inside a jitted loss the merge is a batched einsum over the layer axis —
   XLA treats the merged weights as transients; gradients flow only into
   A/B, and the optimizer state covers only the adapter (the actual memory
   win of LoRA: Adam m/v shrink from 2x model size to 2x adapter size).
 - ``LoraModel`` wraps any of the LM model classes: ``.params`` IS the
   adapter tree, so the stock ``Trainer`` trains it unchanged and
   checkpoints store megabytes, not gigabytes. ``merge_and_unload()``
   returns the plain base-class model with merged weights for serving.

Default targets follow the HF peft convention (attention q/v projections);
pass ``targets=`` for more. Caveat: generate() on a live ``LoraModel``
re-merges per call — use ``merge_and_unload()`` for inference/serving.
"""

import numpy as np

import jax
import jax.numpy as jnp

DEFAULT_TARGETS = {
    "gpt": ("c_attn",),
    "bloom": ("query_key_value",),
    "llama": ("q_proj", "v_proj"),
}


def _walk_paths(tree, prefix=()):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _walk_paths(v, prefix + (k,))
    else:
        yield prefix, tree


def _targeted(path, leaf, targets):
    """A targeted leaf is a stacked (L, in, out) or flat (in, out) projection
    weight named 'w' under a component whose name matches a target."""
    return (path and path[-1] == "w" and leaf.ndim in (2, 3)
            and any(t in path for t in targets))


def init_lora_params(base_params, rng, rank, targets, dtype=jnp.float32):
    """Adapter pytree mirroring the targeted subtrees of ``base_params``.

    A ~ N(0, 1/rank) (kaiming-style), B = 0 — so A@B = 0 at init and the
    wrapped model starts bit-identical to the base."""
    lora = {}
    keys = jax.random.split(rng, 64)
    ki = [0]

    def next_key():
        k = keys[ki[0] % len(keys)]
        ki[0] += 1
        return k

    for path, leaf in _walk_paths(base_params):
        if not _targeted(path, leaf, targets):
            continue
        if leaf.ndim == 3:
            L, din, dout = leaf.shape
            a = jax.random.normal(next_key(), (L, din, rank)) / rank
            b = jnp.zeros((L, rank, dout))
        else:
            din, dout = leaf.shape
            a = jax.random.normal(next_key(), (din, rank)) / rank
            b = jnp.zeros((rank, dout))
        node = lora
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = {"lora_a": a.astype(dtype),
                          "lora_b": b.astype(dtype)}
    if not lora:
        raise ValueError(f"no parameters matched LoRA targets {targets}")
    return lora


def merge_lora(base_params, lora_params, scaling):
    """base-shaped pytree with ``W + scaling * A @ B`` on adapted leaves."""

    def walk(base, lora):
        if isinstance(base, dict):
            out = {}
            for k, v in base.items():
                sub = lora.get(k) if isinstance(lora, dict) else None
                if sub is not None and isinstance(sub, dict) \
                        and set(sub) == {"lora_a", "lora_b"} \
                        and not isinstance(sub["lora_a"], dict):
                    delta = jnp.einsum("...ir,...ro->...io", sub["lora_a"],
                                       sub["lora_b"]) * scaling
                    out[k] = v + delta.astype(v.dtype)
                else:
                    out[k] = walk(v, sub if sub is not None else {})
            return out
        return base

    return walk(base_params, lora_params)


def _model_type_of(model):
    name = type(model).__name__.lower()
    for t in ("bloom", "gpt", "llama"):
        if t in name:
            return t
    return None


class LoraModel:
    """Wrap an LM model for LoRA training: ``.params`` is the ADAPTER tree
    (what optimizers/checkpoints see); the frozen base stays inside."""

    def __init__(self, model, rank=8, alpha=16, targets=None, rng=None,
                 dtype=jnp.float32):
        self.base = model
        self.config = model.config
        self.rank = rank
        self.alpha = alpha
        self.scaling = alpha / rank
        mt = _model_type_of(model)
        if targets is None:
            if mt is None:
                raise ValueError("unknown model type — pass targets=")
            targets = DEFAULT_TARGETS[mt]
        self.targets = tuple(targets)
        self.params = init_lora_params(
            model.params, rng if rng is not None else jax.random.PRNGKey(0),
            rank, self.targets, dtype)

        base_params = model.params
        inner = model.forward_fn()
        scaling = self.scaling

        # explicit protocol signature (not *args): the Trainer filters
        # dataset columns against the forward's parameter names
        def fwd(params, config, input_ids, attention_mask=None,
                position_ids=None, segment_ids=None, cache=None, **kwargs):
            merged = merge_lora(base_params, params, scaling)
            return inner(merged, config, input_ids, attention_mask,
                         position_ids, segment_ids, cache, **kwargs)

        self._forward = fwd
        from cleantransformer_tpu.generation.engine import bind_generation
        bind_generation(self)

    def forward_fn(self):
        return self._forward

    def init_cache(self, batch_size, max_len, dtype=None):
        return self.base.init_cache(batch_size, max_len, dtype)

    def __call__(self, *args, **kwargs):
        merged = merge_lora(self.base.params, self.params, self.scaling)
        saved = self.base.params
        try:
            self.base.params = merged
            return self.base(*args, **kwargs)
        finally:
            self.base.params = saved

    def merge_and_unload(self):
        """Plain base-class model with the adapter folded into its weights
        (use this for inference/serving/export)."""
        merged = merge_lora(self.base.params, self.params, self.scaling)
        return type(self.base)(self.config, params=merged)

    # -- adapter I/O (self-contained safetensors, like utils/checkpoint) ----

    def save_adapter(self, path):
        from cleantransformer_tpu.utils.checkpoint import save_pytree
        save_pytree(path, self.params, metadata={
            "lora_rank": str(self.rank), "lora_alpha": str(self.alpha),
            "lora_targets": ",".join(self.targets)})

    def load_adapter(self, path):
        from cleantransformer_tpu.utils.checkpoint import load_pytree
        self.params = load_pytree(path, self.params)
        return self
