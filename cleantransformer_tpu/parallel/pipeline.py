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

Currently wired for Bloom (the SFT flagship); the stage body reuses
models/bloom.py's block function unchanged.
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


def bloom_pipeline_loss_fn(config, mesh, num_microbatches):
    """Returns loss_fn(params, batch) running the GPipe schedule on ``mesh``.

    batch: {'input_ids','attention_mask','labels'} with leading batch dim
    divisible by num_microbatches. params: Bloom pytree with blocks sharded
    per pipeline_param_specs.
    """
    from cleantransformer_tpu.models.bloom import (
        _bloom_block, build_alibi_bias)
    from cleantransformer_tpu.ops.layers import layer_norm

    P_stages = mesh.shape["pipe"]
    M = num_microbatches

    def stage_body(params, ids, mask, labels):
        # local shapes: blocks (L/P, ...); ids/mask/labels (M, mb, S) replicated
        s = jax.lax.axis_index("pipe")
        mb, S = ids.shape[1], ids.shape[2]
        D = config.hidden_size

        # per-microbatch attention context (cheap; recomputed per tick)
        def context(mask_mb):
            alibi = build_alibi_bias(mask_mb, config.n_head)
            row = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
            col = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
            not_causal = col > row
            pad = (mask_mb == 0)[:, None, None, :]
            return alibi, pad | not_causal[None, None]

        def local_layers(x, alibi, bool_mask, pad_mask):
            def body(carry, block_params):
                out, _ = _bloom_block(block_params, None, carry, config,
                                      alibi, bool_mask,
                                      jnp.zeros((), jnp.int32), pad_mask)
                return out, None
            x, _ = jax.lax.scan(body, x, params["blocks"])
            return x

        def tick(buf, t):
            mb_idx = jnp.clip(t - s, 0, M - 1)
            active = (t - s >= 0) & (t - s < M)
            ids_mb = jax.lax.dynamic_index_in_dim(ids, mb_idx, 0, False)
            mask_mb = jax.lax.dynamic_index_in_dim(mask, mb_idx, 0, False)

            # stage 0 sources from the embeddings; others from the ring buffer
            emb = params["word_embeddings"][ids_mb].astype(config.compute_dtype)
            emb = layer_norm(emb, params["word_embeddings_layernorm"]["w"],
                             params["word_embeddings_layernorm"]["b"],
                             config.layer_norm_epsilon)
            x_in = jnp.where(s == 0, emb, buf)

            alibi, bool_mask = context(mask_mb)
            y = local_layers(x_in, alibi, bool_mask, mask_mb != 0)
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
        h = layer_norm(h, params["ln_f"]["w"], params["ln_f"]["b"],
                       config.layer_norm_epsilon)
        lm = params.get("lm_head", params["word_embeddings"])
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


def make_pipeline_train_step(config, mesh, num_microbatches, optimizer):
    """Jitted GPipe train step: loss + grads (sharded like the params) +
    optimizer update."""
    loss_fn = bloom_pipeline_loss_fn(config, mesh, num_microbatches)
    _, update_fn = optimizer

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def train_step(params, opt_state, batch):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch)
        new_params, new_opt = update_fn(grads, opt_state, params)
        return new_params, new_opt, loss

    return train_step
