"""Sharding rules: the TPU-native replacement for DDP/ZeRO/Megatron-TP.

 - ``shard_hint``: in-model ``with_sharding_constraint`` that is a no-op
   outside a ``use_mesh`` context, so single-device code pays nothing.
 - ``param_specs``: PartitionSpec pytree for a model's parameters
   (Megatron-style TP: qkv/h->4h column-sharded, proj/4h->h row-sharded
   over the 'model' axis — realizing Bloom's ``pretraining_tp`` stub,
   reference modeling_bloom.py:32-33,258-265).
 - ``zero_specs``: ZeRO-1-style optimizer-state sharding — each Adam m/v
   leaf is additionally partitioned over the 'data' axis (largest divisible
   dim not already sharded by TP), so Adam state costs 1/dp the HBM per
   device instead of being replicated. This is the first-class equivalent of
   the capability the reference delegates to DeepSpeed ZeRO stage 1
   (scripts/ds_config_example.json:33-48, examples/ft_bloom_deepspeed.py:51-53):
   XLA/GSPMD derives the reduce-scatter(grads) -> sharded update ->
   all-gather(params) schedule from the annotations.
 - ``shard_params_zero``: ZeRO-3/FSDP-style PARAMETER sharding — the same
   largest-free-dim partition applied to the params themselves, so each
   device holds 1/dp of every weight (the reference reaches this via
   ``deepspeed.zero.Init()``, examples/ft_bloom_deepspeed.py:51-53). Under
   jit, GSPMD derives the all-gather-on-use in the forward/backward and the
   reduce-scatter of the gradients; the train step re-constrains the updated
   params (and Adam state) to the sharded layout so nothing stays gathered
   between steps.
"""

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from cleantransformer_tpu.parallel import mesh as _mesh_mod


def shard_hint(x, axes):
    """Constrain ``x`` to PartitionSpec(*axes) on the active mesh; no-op when
    no mesh is active. Axis names not present on the mesh are dropped."""
    mesh = _mesh_mod.active_mesh()
    if mesh is None:
        return x
    names = set(mesh.axis_names)
    cleaned = []
    for a in axes:
        if a is None:
            cleaned.append(None)
        elif isinstance(a, (tuple, list)):
            sub = tuple(n for n in a if n in names and mesh.shape[n] > 1)
            cleaned.append(sub if sub else None)
        else:
            cleaned.append(a if (a in names and mesh.shape[a] > 1) else None)
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, P(*cleaned)))


def replicate(tree, mesh):
    """Fully replicate a pytree across the mesh."""
    s = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)


def named_sharding(mesh, spec_tree):
    return jax.tree_util.tree_map(
        lambda spec: NamedSharding(mesh, spec),
        spec_tree, is_leaf=lambda x: isinstance(x, P))


def _map_with_path(params, rule):
    def walk(path, node):
        if isinstance(node, dict):
            return {k: walk(path + (k,), v) for k, v in node.items()}
        return rule(path, node)
    return walk((), params)


def gpt_param_specs(params):
    """Megatron-TP PartitionSpecs for the GPT param tree (leading layer axis
    on block params). Column-parallel: c_attn, mlp.c_fc. Row-parallel:
    attn.c_proj, mlp.c_proj. Embeddings/LN replicated."""

    def rule(path, leaf):
        if "blocks" in path:
            if "c_attn" in path or "c_fc" in path:
                return P(None, None, "model") if leaf.ndim == 3 else P(None, "model")
            if "c_proj" in path and leaf.ndim == 3:
                return P(None, "model", None)
            return P(*([None] * leaf.ndim))
        return P(*([None] * leaf.ndim))

    return _map_with_path(params, rule)


def bloom_param_specs(params):
    """Megatron-TP specs for the Bloom param tree: query_key_value and
    dense_h_to_4h column-parallel, dense / dense_4h_to_h row-parallel."""

    def rule(path, leaf):
        if "blocks" in path:
            if "query_key_value" in path or "dense_h_to_4h" in path:
                return P(None, None, "model") if leaf.ndim == 3 else P(None, "model")
            if ("dense_4h_to_h" in path or path[-2:] == ("dense", "w")) and leaf.ndim == 3:
                return P(None, "model", None)
            return P(*([None] * leaf.ndim))
        return P(*([None] * leaf.ndim))

    return _map_with_path(params, rule)


def llama_param_specs(params):
    """Megatron-TP specs for the Llama param tree: q/k/v and gate/up
    column-parallel, o_proj/down_proj row-parallel. GQA note: k/v have
    ``num_key_value_heads`` output heads — the model axis size must divide
    Hkv*hd (same constraint HF TP sharding imposes)."""

    def rule(path, leaf):
        if "blocks" in path:
            if "experts" in path:
                # MoE expert stacks (L, E, in, out): expert-parallel over the
                # 'expert' axis; within each expert, gate/up column-parallel
                # and down row-parallel over 'model' (composable EP x TP)
                if any(n in path for n in ("gate_proj", "up_proj")):
                    return P(None, "expert", None, "model")
                if "down_proj" in path:
                    return P(None, "expert", "model", None)
                return P(*([None] * leaf.ndim))
            if any(n in path for n in ("q_proj", "k_proj", "v_proj",
                                       "gate_proj", "up_proj")):
                return P(None, None, "model") if leaf.ndim == 3 else P(None, "model")
            if any(n in path for n in ("o_proj", "down_proj")) and leaf.ndim == 3:
                return P(None, "model", None)
            return P(*([None] * leaf.ndim))
        return P(*([None] * leaf.ndim))

    return _map_with_path(params, rule)


def data_specs(batch_like):
    """Shard the leading batch dim of every leaf over 'data'."""
    return jax.tree_util.tree_map(
        lambda x: P("data", *([None] * (x.ndim - 1))), batch_like)


def param_specs(params, model_type="gpt"):
    if model_type in ("gpt", "gpt2", "gpt3"):
        return gpt_param_specs(params)
    if model_type == "bloom":
        return bloom_param_specs(params)
    if model_type == "llama":
        return llama_param_specs(params)
    # default: fully replicated
    return jax.tree_util.tree_map(lambda x: P(*([None] * x.ndim)), params)


def clean_specs(mesh, spec_tree):
    """Drop axis names a mesh doesn't have (or has at size 1) from every
    PartitionSpec leaf — llama specs carry an 'expert' axis that only
    EP meshes define."""
    names = set(mesh.axis_names)

    def clean(spec):
        return P(*[a if (a in names and mesh.shape[a] > 1) else None
                   for a in spec])

    return jax.tree_util.tree_map(
        clean, spec_tree, is_leaf=lambda x: isinstance(x, P))


def shard_params(params, mesh, model_type="gpt"):
    specs = clean_specs(mesh, param_specs(params, model_type))
    shardings = named_sharding(mesh, specs)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)


def _zero_leaf_spec(spec, shape, dp, axis="data"):
    """Add ``axis`` to a leaf's PartitionSpec on the largest dim that is
    divisible by dp and not already sharded; unchanged if none qualifies."""
    if dp <= 1 or not shape:
        return spec
    parts = list(spec) + [None] * (len(shape) - len(spec))
    best, best_size = None, 0
    for i, n in enumerate(shape):
        if parts[i] is None and n % dp == 0 and n >= dp and n > best_size:
            best, best_size = i, n
    if best is None:
        return spec
    parts[best] = axis
    return P(*parts)


def zero_specs(params, mesh, model_type="gpt", axis="data"):
    """ZeRO-1 PartitionSpecs for optimizer-state pytrees shaped like
    ``params`` (Adam m/v): the TP param specs with ``axis`` added on the
    largest free divisible dim of every leaf."""
    dp = mesh.shape.get(axis, 1)
    base = clean_specs(mesh, param_specs(params, model_type))
    return jax.tree_util.tree_map(
        lambda leaf, spec: _zero_leaf_spec(spec, leaf.shape, dp, axis),
        params, base)


def shard_params_zero(params, mesh, model_type="gpt", axis="data"):
    """ZeRO-3/FSDP parameter sharding: place ``params`` with the TP specs
    PLUS ``axis`` on the largest free divisible dim of every leaf (the same
    partition rule as ``zero_specs``), so each device stores ~1/dp of the
    model. Returns (sharded_params, spec_tree); the spec tree is re-applied
    inside the train step (``constrain``) so the updated params leave the
    step sharded — XLA then schedules all-gather-on-use per layer in the
    forward/backward instead of keeping a gathered copy alive.

    Replaces the reference's ``deepspeed.zero.Init()`` + ZeRO stage-3 config
    (examples/ft_bloom_deepspeed.py:51-53, scripts/ds_config_example.json)."""
    specs = zero_specs(params, mesh, model_type, axis)
    shardings = named_sharding(mesh, specs)
    return jax.tree_util.tree_map(jax.device_put, params, shardings), specs


def shard_opt_state(opt_state, params, mesh, model_type="gpt", axis="data"):
    """Place an AdamState/SGDState-like pytree with ZeRO-1 shardings: every
    leaf shaped like a param leaf gets its zero spec; scalars replicate.
    Returns (sharded_state, spec_tree) — the spec tree is reused inside the
    train step as a with_sharding_constraint so XLA keeps the update sharded."""
    zspecs = zero_specs(params, mesh, model_type, axis)
    # Map by structure: state fields that mirror the param tree (mu/nu) reuse
    # the zero specs; anything else (step counters, flags) replicates.
    params_treedef = jax.tree_util.tree_structure(params)

    def spec_for_subtree(subtree):
        if jax.tree_util.tree_structure(subtree) == params_treedef:
            return zspecs
        return jax.tree_util.tree_map(lambda x: P(), subtree)

    spec_tree = type(opt_state)(*[spec_for_subtree(field)
                                  for field in opt_state]) \
        if hasattr(opt_state, "_fields") else jax.tree_util.tree_map(
            lambda x: P(), opt_state)
    shardings = named_sharding(mesh, spec_tree)
    sharded = jax.tree_util.tree_map(jax.device_put, opt_state, shardings)
    return sharded, spec_tree


def constrain(tree, mesh, spec_tree):
    """with_sharding_constraint over a pytree of PartitionSpecs (spec_tree
    mirrors ``tree``'s structure with PartitionSpec at each leaf position)."""
    return jax.tree_util.tree_map(
        lambda x, s: jax.lax.with_sharding_constraint(x, NamedSharding(mesh, s)),
        tree, spec_tree)
