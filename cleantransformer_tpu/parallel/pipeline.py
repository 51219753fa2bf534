"""Pipeline parallelism: a GPipe schedule as a differentiable shard_map.

The reference has NO pipeline parallelism (README plan unchecked,
SURVEY §2.3); this is a capability extension. Design:

 - mesh axis ``pipe`` of P stages; the stacked block parameters (L, ...)
   are sharded on the layer axis, so each device holds L/P contiguous
   layers — no parameter replication.
 - ONE shard_map program runs the classic GPipe schedule: M microbatches
   flow through P stages over M+P-1 ticks; each tick every stage runs its
   local layer scan on its current microbatch (bubble ticks compute masked
   garbage — standard SPMD), then activations hop to the next stage with a
   single ``lax.ppermute`` ring step over ICI.
 - stage 0 embeds; the last stage applies the final LayerNorm + lm_head +
   shift-CE loss; the summed loss is ``psum``-shared so the caller sees a
   replicated scalar.
 - the whole schedule is built from scan + ppermute, so ``jax.grad``
   differentiates straight through it (ppermute transposes to the reverse
   ring): backward is the mirrored GPipe schedule for free, and gradients
   come back sharded exactly like the parameters — optimizer states shard
   the same way (ZeRO-along-pipe).

The schedule is model-agnostic: a small per-family adapter (embed /
attention-context / block-scan / final-norm / tied-head-table — see
``_family_ops``) plugs Bloom, GPT (both LN orders) and the llama family
into the same GPipe program; ``pipeline_loss_fn(..., model_type=...)``
selects it, and ``bloom_pipeline_loss_fn`` remains the Bloom shorthand.
"""

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import numpy as np


def make_pipe_mesh(num_stages, devices=None):
    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= num_stages
    return Mesh(np.asarray(devices[:num_stages]), ("pipe",))


def pipeline_param_specs(params):
    """Blocks sharded on the leading layer axis over 'pipe'; rest replicated."""
    def walk(node, under_blocks=False):
        if isinstance(node, dict):
            return {k: walk(v, under_blocks or k == "blocks") for k, v in node.items()}
        if under_blocks:
            return P("pipe", *([None] * (node.ndim - 1)))
        return P(*([None] * node.ndim))
    return walk(params)


def shard_params_for_pipeline(params, mesh):
    specs = pipeline_param_specs(params)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs,
        is_leaf=lambda x: not isinstance(x, (dict,)))


def _family_ops(config, model_type, version="gpt2"):
    """Per-family adapter for the GPipe stage body: (embed, context,
    run_blocks, final, head_table, hidden_dim). ``context(mask_mb)`` builds
    the per-microbatch attention context once per tick; ``run_blocks``
    scans the family's block function over this stage's local layers."""
    if model_type == "bloom":
        from cleantransformer_tpu.models.bloom import (_bloom_block,
                                                       build_alibi_bias)
        from cleantransformer_tpu.ops.layers import layer_norm
        D = config.hidden_size

        def embed(params, ids_mb, mask_mb):
            emb = params["word_embeddings"][ids_mb].astype(
                config.compute_dtype)
            return layer_norm(emb, params["word_embeddings_layernorm"]["w"],
                              params["word_embeddings_layernorm"]["b"],
                              config.layer_norm_epsilon)

        def context(mask_mb):
            S = mask_mb.shape[1]
            alibi = build_alibi_bias(mask_mb, config.n_head)
            row = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
            col = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
            pad = (mask_mb == 0)[:, None, None, :]
            return alibi, pad | (col > row)[None, None], mask_mb != 0

        def run_blocks(blocks, x, ctx):
            alibi, bool_mask, pad_mask = ctx

            def body(carry, block_params):
                out, _ = _bloom_block(block_params, None, carry, config,
                                      alibi, bool_mask,
                                      jnp.zeros((), jnp.int32), pad_mask)
                return out, None
            return jax.lax.scan(body, x, blocks)[0]

        def final(params, h):
            return layer_norm(h, params["ln_f"]["w"], params["ln_f"]["b"],
                              config.layer_norm_epsilon)

        def head_table(params):
            return params.get("lm_head", params["word_embeddings"])

    elif model_type == "gpt":
        from cleantransformer_tpu.models.gpt import _gpt_block
        from cleantransformer_tpu.ops.layers import layer_norm
        D = config.n_embd
        cdt = config.compute_dtype
        neg = (jnp.finfo(cdt).min if jnp.issubdtype(cdt, jnp.floating)
               else jnp.finfo(jnp.float32).min)

        def embed(params, ids_mb, mask_mb):
            # position ids from the mask cumsum (modeling_gpt.py:171-174)
            am = mask_mb.astype(jnp.int32)
            pos = jnp.cumsum(am, axis=-1) - 1
            pos = jnp.where(am == 0, 1, pos)
            h = (params["tokens_embed"][ids_mb]
                 + params["position_embed"][pos])
            return h.astype(cdt)

        def context(mask_mb):
            return ((1.0 - mask_mb[:, None, None, :].astype(jnp.float32))
                    * neg,)

        def run_blocks(blocks, x, ctx):
            def body(carry, block_params):
                out, _ = _gpt_block(block_params, None, carry, config,
                                    version, ctx[0],
                                    jnp.zeros((), jnp.int32))
                return out, None
            return jax.lax.scan(body, x, blocks)[0]

        def final(params, h):
            if version == "gpt":  # post-LN GPT-1 has no ln_f
                return h
            return layer_norm(h, params["ln_f"]["w"], params["ln_f"]["b"],
                              config.layer_norm_epsilon)

        def head_table(params):
            return params.get("lm_head", params["tokens_embed"])

    elif model_type == "llama":
        from cleantransformer_tpu.models.llama import (_llama_block,
                                                       rope_cos_sin,
                                                       rms_norm, CAUSAL_NEG)
        from cleantransformer_tpu.ops.activations import ACT2FN
        D = config.hidden_size
        act = ACT2FN[config.hidden_act]

        def embed(params, ids_mb, mask_mb):
            return params["embed_tokens"][ids_mb].astype(config.compute_dtype)

        def context(mask_mb):
            S = mask_mb.shape[1]
            am = mask_mb.astype(jnp.int32)
            pos = jnp.cumsum(am, axis=-1) - 1
            pos = jnp.where(am == 0, 1, pos)
            cos, sin = rope_cos_sin(pos, config)
            additive = (1.0 - mask_mb[:, None, None, :].astype(jnp.float32)
                        ) * CAUSAL_NEG
            row = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
            col = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
            keep = col <= row
            window = getattr(config, "sliding_window", None)
            if window is not None:
                keep = keep & (row - col < window)
            additive = additive + jnp.where(keep, 0.0,
                                            CAUSAL_NEG)[None, None]
            return cos, sin, additive

        def run_blocks(blocks, x, ctx):
            cos, sin, additive = ctx

            def body(carry, block_params):
                out, _, _ = _llama_block(block_params, None, carry, cos, sin,
                                         additive, jnp.zeros((), jnp.int32),
                                         config, act)
                return out, None
            return jax.lax.scan(body, x, blocks)[0]

        def final(params, h):
            return rms_norm(h, params["norm"]["w"], config.rms_norm_eps)

        def head_table(params):
            return params.get("lm_head", params["embed_tokens"])
    else:
        raise ValueError(f"unknown pipeline model_type {model_type!r} "
                         "(bloom | gpt | llama)")
    return embed, context, run_blocks, final, head_table, D


def pipeline_loss_fn(config, mesh, num_microbatches, model_type="bloom",
                     version="gpt2"):
    """Returns loss_fn(params, batch) running the GPipe schedule on ``mesh``.

    batch: {'input_ids','attention_mask','labels'} with leading batch dim
    divisible by num_microbatches. params: the family's pytree with blocks
    sharded per pipeline_param_specs. ``model_type``: bloom | gpt | llama
    (_family_ops); ``version`` selects the GPT LN order.
    """
    embed, context, run_blocks, final, head_table, D = _family_ops(
        config, model_type, version)

    P_stages = mesh.shape["pipe"]
    M = num_microbatches

    def stage_body(params, ids, mask, labels):
        # local shapes: blocks (L/P, ...); ids/mask/labels (M, mb, S) replicated
        s = jax.lax.axis_index("pipe")
        mb, S = ids.shape[1], ids.shape[2]

        def tick(buf, t):
            mb_idx = jnp.clip(t - s, 0, M - 1)
            active = (t - s >= 0) & (t - s < M)
            ids_mb = jax.lax.dynamic_index_in_dim(ids, mb_idx, 0, False)
            mask_mb = jax.lax.dynamic_index_in_dim(mask, mb_idx, 0, False)

            # stage 0 sources from the embeddings; others from the ring buffer
            x_in = jnp.where(s == 0, embed(params, ids_mb, mask_mb), buf)

            y = run_blocks(params["blocks"], x_in, context(mask_mb))
            y = jnp.where(active, y, jnp.zeros_like(y))

            # stack last-stage outputs; the head runs ONCE after the scan so
            # the expensive (mb*S, D)@(D, V) matmul stays off every tick's
            # critical path
            y_out = jnp.where(active & (s == P_stages - 1), y,
                              jnp.zeros_like(y))

            # ring hop: stage i -> i+1 (the wraparound into stage 0 is unused)
            buf_next = jax.lax.ppermute(
                y, "pipe", [(i, (i + 1) % P_stages) for i in range(P_stages)])
            return buf_next, y_out

        buf0 = jnp.zeros((mb, S, D), config.compute_dtype)
        _, stacked = jax.lax.scan(tick, buf0, jnp.arange(M + P_stages - 1))
        # microbatch m completed on the last stage at tick P-1+m
        outs = jax.lax.dynamic_slice_in_dim(stacked, P_stages - 1, M, axis=0)
        h = outs.reshape(M * mb, S, D)
        h = final(params, h)
        lm = head_table(params)
        logits = jnp.matmul(h, lm.T.astype(h.dtype)).astype(jnp.float32)
        # token-weighted global loss (equal-weighting microbatch MEANS would
        # mis-weight when labels carry ignore_index): sum over all shifted
        # tokens / count of valid tokens, matching bloom_lm_forward's mean
        flat_labels = labels.reshape(M * mb, S)
        shift_logits = logits[:, :-1].reshape(-1, logits.shape[-1])
        shift_labels = flat_labels[:, 1:].reshape(-1)
        valid = shift_labels != -100
        tgt = jnp.where(valid, shift_labels, 0)
        logp = jax.nn.log_softmax(shift_logits, axis=-1)
        nll = -jnp.take_along_axis(logp, tgt[:, None], axis=-1)[:, 0]
        nll = jnp.where(valid, nll, 0.0)
        # only the last stage holds real outputs; zero elsewhere, psum shares
        total = jnp.where(s == P_stages - 1, jnp.sum(nll), 0.0)
        count = jnp.where(s == P_stages - 1,
                          jnp.sum(valid).astype(jnp.float32), 0.0)
        total = jax.lax.psum(total, "pipe")
        count = jax.lax.psum(count, "pipe")
        return total / jnp.maximum(count, 1.0)

    p_specs = None

    def loss_fn(params, batch):
        nonlocal p_specs
        if p_specs is None:
            p_specs = pipeline_param_specs(params)
        B, S = batch["input_ids"].shape
        assert B % M == 0, f"batch {B} not divisible by microbatches {M}"
        mb = B // M
        ids = batch["input_ids"].reshape(M, mb, S)
        mask = batch["attention_mask"].reshape(M, mb, S)
        labels = batch["labels"].reshape(M, mb, S)
        from cleantransformer_tpu.parallel.mesh import compat_shard_map
        fn = compat_shard_map(
            stage_body, mesh=mesh,
            in_specs=(p_specs, P(), P(), P()),
            out_specs=P())
        return fn(params, ids, mask, labels)

    return loss_fn


def bloom_pipeline_loss_fn(config, mesh, num_microbatches):
    """Bloom shorthand over pipeline_loss_fn (the original API)."""
    return pipeline_loss_fn(config, mesh, num_microbatches,
                            model_type="bloom")


def make_pipeline_train_step(config, mesh, num_microbatches, optimizer,
                             model_type="bloom", version="gpt2"):
    """Jitted GPipe train step: loss + grads (sharded like the params) +
    optimizer update."""
    loss_fn = pipeline_loss_fn(config, mesh, num_microbatches,
                               model_type=model_type, version=version)
    _, update_fn = optimizer

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        new_params, new_opt = update_fn(grads, opt_state, params)
        return new_params, new_opt, loss

    return train_step
