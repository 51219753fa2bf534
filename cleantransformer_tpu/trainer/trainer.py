"""The Trainer — HF-Trainer-style surface, TPU-native internals.

Behavioral spec: the reference's trainer/trainer.py (an HF-Trainer
reimplementation). The accelerate/DeepSpeed/FSDP plumbing it wires up
(trainer.py:1086-1218) has NO hand-written counterpart here: gradient sync,
ZeRO-style optimizer-state sharding, bucketing and comm/compute overlap all
come from jit + sharding annotations over a jax.sharding.Mesh (SURVEY §2.3).

What is preserved from the reference surface:
 - TrainingArguments fields (lr, epochs, batch sizes, warmup, clipping,
   logging/eval/save cadence, save_total_limit, label_smoothing, seed,
   gradient_accumulation_steps, NEFTune noise alpha)
 - Trainer(model, args, train_dataset, eval_dataset, data_collator,
   compute_metrics, callbacks) with train()/evaluate()/save_model()/
   log()/create_optimizer()
 - callback events (on_train_begin/on_epoch_begin/on_step_end/on_log/
   on_evaluate/on_save/on_train_end), log_history (trainer.py:1287-1298)
 - checkpoint-<step>/ save + rotation protecting the best model, resume
   with epoch/step skip and host-rng restore (trainer.py:1303-1670)
 - label smoothing (trainer.py:558-586), decay-param grouping excluding
   biases/LayerNorms (trainer.py:820-833), NEFTune (trainer.py:867-898)

TPU-native internals:
 - ONE jitted train_step: grad-accumulation lax.scan over micro-batches,
   global-norm clipping, optimizer update, all fused; donate_argnums so
   params/opt state update in place in HBM
 - bf16 compute policy via model config (replaces torch AMP / apex / DS fp16
   — no GradScaler: TPUs train in bf16 without loss scaling)
 - data parallelism: batches sharded over the mesh 'data' axis; tensor
   parallelism: params sharded per parallel/sharding.py specs; XLA inserts
   the psum/all-gathers over ICI
"""

import json
import math
import os
import time
from dataclasses import dataclass, field, asdict

import numpy as np

import jax
import jax.numpy as jnp

from cleantransformer_tpu.optim import adamw_decoupled
from cleantransformer_tpu.parallel.mesh import use_mesh
from cleantransformer_tpu.parallel.sharding import (
    named_sharding, param_specs, data_specs)
from cleantransformer_tpu.trainer.data import DataLoader
from cleantransformer_tpu.trainer.schedules import get_scheduler
from cleantransformer_tpu.utils import checkpoint as ckpt_io


# ---------------------------------------------------------------------------
# arguments
# ---------------------------------------------------------------------------

@dataclass
class TrainingArguments:
    output_dir: str = "./output"
    num_train_epochs: float = 3.0
    max_steps: int = -1
    per_device_train_batch_size: int = 8
    per_device_eval_batch_size: int = 8
    gradient_accumulation_steps: int = 1
    learning_rate: float = 5e-5
    weight_decay: float = 0.0
    adam_beta1: float = 0.9
    adam_beta2: float = 0.999
    adam_epsilon: float = 1e-8
    max_grad_norm: float = 1.0
    lr_scheduler_type: str = "linear"
    warmup_steps: int = 0
    logging_steps: int = 10
    eval_steps: int = 0          # 0 = eval at epoch end only
    save_steps: int = 500
    save_total_limit: int = 0    # 0 = unlimited
    label_smoothing_factor: float = 0.0
    neftune_noise_alpha: float = 0.0
    # drop dataset/collator columns the model forward can't accept
    # (reference signature-column filtering, trainer.py:968-1003)
    remove_unused_columns: bool = True
    seed: int = 42
    group_by_length: bool = False
    max_seq_length: int = 1024
    metric_for_best_model: str = ""
    greater_is_better: bool = False
    # parallelism (replaces torchrun/accelerate config):
    # mesh_data=1, mesh_model=1 => single device (no mesh);
    # mesh_data=0 => all remaining devices on the data axis
    mesh_data: int = 1
    mesh_model: int = 1
    # ZeRO-1: shard Adam m/v over the 'data' axis (1/dp the optimizer HBM
    # per device; XLA derives reduce-scatter/all-gather). No-op without a
    # data-parallel mesh. Replaces DeepSpeed ZeRO stage 1
    # (reference scripts/ds_config_example.json:33-48).
    zero_optimizer: bool = True
    # explicit ZeRO stage (overrides zero_optimizer when >= 0):
    #   0 = replicated params + replicated Adam state
    #   1 = Adam m/v sharded over 'data' (== zero_optimizer=True)
    #   3 = FSDP-style: params AND Adam state sharded over 'data' — each
    #       device stores ~1/dp of the model; GSPMD all-gathers weights on
    #       use and reduce-scatters grads (the reference's
    #       deepspeed.zero.Init() path, examples/ft_bloom_deepspeed.py:51-53).
    # -1 = derive from zero_optimizer. Stage 2 behaves as stage 1 (grads are
    # never persisted between steps here — the jit step consumes them
    # in-place, so there is no stage-2 gradient buffer to shard).
    zero_stage: int = -1
    # per-layer activation checkpointing: False | True (save only block
    # inputs) | "dots" (also save matmul outputs — cheaper recompute, a bit
    # more memory)
    remat: object = False
    # DeepSpeed-style CPU optimizer offload (reference
    # ds_config_example.json:33-48 offload_optimizer): "" = off, "cpu" =
    # master params + Adam state live in host memory, the accelerator runs
    # only fwd/bwd. Frees ~16 bytes/param of HBM at the cost of 2x
    # param-sized host<->device transfers per step. Single-device only
    # (meshes shard instead — use zero_stage); requires the 'cpu' jax
    # platform alongside the accelerator.
    offload_optimizer: str = ""
    # logging integrations (reference trainer.py:238-248 report_to):
    # "none" | "jsonl" (<output_dir>/trainer_log.jsonl) | "tensorboard"
    # (<output_dir>/runs event files, self-contained writer) | "all",
    # or a list of those
    report_to: object = "none"
    # async checkpointing: snapshot params/opt-state to host synchronously
    # (the train step donates their device buffers, so the fetch cannot be
    # deferred) but write the files from a background thread — training
    # resumes while the safetensors serialize. Writes are atomic
    # (checkpoint-<step>.partial -> rename), and train() joins the writer
    # before returning.
    async_save: bool = False


# ---------------------------------------------------------------------------
# callbacks (trainer.py:230-248 callback system)
# ---------------------------------------------------------------------------

@dataclass
class TrainerControl:
    """Loop control flags a callback may set (the reference's TrainerControl
    state-control contract): each ``should_*`` is honored at the next check
    point in the training loop, then reset."""
    should_training_stop: bool = False
    should_epoch_stop: bool = False
    should_log: bool = False
    should_evaluate: bool = False
    should_save: bool = False


class TrainerCallback:
    def on_init_end(self, trainer): ...
    def on_train_begin(self, trainer): ...
    def on_epoch_begin(self, trainer, epoch): ...
    def on_epoch_end(self, trainer, epoch): ...
    def on_step_begin(self, trainer): ...
    def on_step_end(self, trainer): ...
    def on_log(self, trainer, logs): ...
    def on_evaluate(self, trainer, metrics): ...
    def on_predict(self, trainer, metrics): ...
    def on_prediction_step(self, trainer): ...
    def on_save(self, trainer, ckpt_dir): ...
    def on_train_end(self, trainer): ...


class PrinterCallback(TrainerCallback):
    def on_log(self, trainer, logs):
        print(json.dumps(logs))


# ---------------------------------------------------------------------------
# trainer
# ---------------------------------------------------------------------------

class Trainer:
    def __init__(self, model=None, args=None, train_dataset=None, eval_dataset=None,
                 data_collator=None, compute_metrics=None, callbacks=None,
                 loss_fn=None, optimizer_factory=None, prediction_fn=None):
        self.model = model
        self.args = args or TrainingArguments()
        self.train_dataset = train_dataset
        self.eval_dataset = eval_dataset
        self.data_collator = data_collator
        self.compute_metrics = compute_metrics
        self.prediction_fn = prediction_fn  # (params, batch) -> predictions
        self.callbacks = callbacks if callbacks is not None else [PrinterCallback()]
        if getattr(args, "report_to", "none") not in (None, "none"):
            from cleantransformer_tpu.trainer.integrations import \
                resolve_report_to
            self.callbacks = list(self.callbacks) + resolve_report_to(
                args.report_to, args.output_dir)
        self._user_loss = loss_fn is not None
        self.loss_fn = loss_fn or self._default_loss_fn()
        self._eval_loss_fn = None
        self.optimizer_factory = optimizer_factory

        self.state = {"global_step": 0, "epoch": 0.0, "log_history": [],
                      "best_metric": None, "best_step": None,
                      "best_model_checkpoint": None,
                      "total_flos": 0.0, "tokens_seen": 0}
        np.random.seed(self.args.seed)
        self._rng = jax.random.PRNGKey(self.args.seed)

        self.mesh = None
        if self.args.mesh_data != 1 or self.args.mesh_model != 1:
            n = jax.device_count()
            if n > 1:
                from cleantransformer_tpu.parallel.mesh import make_mesh
                data = self.args.mesh_data or None
                self.mesh = make_mesh(data=data, model=self.args.mesh_model)

        self._train_step = None
        self.optimizer = None
        self.opt_state = None
        self.lr_schedule = None
        self._opt_spec_tree = None  # ZeRO-1/3 Adam-state specs, set once sharded
        self._param_spec_tree = None  # ZeRO-3 param specs, set once sharded
        self._eval_loss_jit = None  # compiled once, reused across evaluate()
        self._pred_step_jit = None
        self._sig_columns = None
        self._flops_tok_cache = {}
        self.control = TrainerControl()
        for cb in self.callbacks:
            cb.on_init_end(self)

    # -- loss ---------------------------------------------------------------

    def _default_loss_fn(self, train=True, with_logits=False):
        """Causal-LM loss with optional label smoothing (trainer.py:558-586)
        and NEFTune embedding noise (trainer.py:867-898).

        ``train=False`` builds the evaluation variant: NEFTune noise OFF (the
        reference hook is active only during training). NEFTune matches the
        reference hook exactly: per-position uniform noise on the embedding
        *output*, magnitude alpha/sqrt(S*D) — two identical tokens in a batch
        receive different noise.

        Labels equal to -100 are excluded (the torch CrossEntropyLoss
        ignore_index the reference's shift-CE inherits, modeling_bloom.py:228).

        ``with_logits=True`` returns (loss, logits) — the prediction_step
        variant."""
        model = self.model
        smoothing = self.args.label_smoothing_factor if self.args else 0.0
        neftune = (self.args.neftune_noise_alpha if (self.args and train) else 0.0)
        # sparse-MoE with router aux loss: the load-balancing term only
        # exists on the model's own labels path (models/llama.py), so the
        # default loss must delegate there or the config knob would be
        # silently ignored
        moe_aux = (getattr(model.config, "num_local_experts", 0) > 0
                   and getattr(model.config, "output_router_logits", False))
        if moe_aux and smoothing > 0.0:
            raise ValueError(
                "label_smoothing_factor is unsupported with "
                "output_router_logits (the router aux loss requires the "
                "model's own labels path) — disable one of them")

        def loss_fn(params, batch, rng):
            embed_noise = None
            if neftune > 0.0:
                B, S = batch["input_ids"].shape
                D = None
                for emb_key in ("word_embeddings", "tokens_embed",
                                "embed_tokens"):
                    if emb_key in params:
                        D = params[emb_key].shape[-1]
                        break
                if D is None:  # adapter-only trees (LoRA): fall back to config
                    D = getattr(model.config, "hidden_size",
                                getattr(model.config, "n_embd", None))
                mag = neftune / math.sqrt(S * D)
                embed_noise = jax.random.uniform(rng, (B, S, D), jnp.float32,
                                                 -mag, mag)
            seg = batch.get("segment_ids")  # packed rows (packed_collate)
            fwd_kw = {}
            if seg is not None and not (
                    hasattr(model.config, "rope_theta")       # llama family
                    or hasattr(model.config, "slow_but_exact")):  # bloom
                if self._model_type() == "gpt":
                    # GPT consumes segment_ids as token-TYPE embeddings
                    # (reference semantics) — packed rows ride the distinct
                    # packed_segments kwarg (block-diagonal attention +
                    # per-segment restart of the learned positions)
                    fwd_kw["packed_segments"] = seg
                    seg = None
                else:
                    # silently mis-training packed rows is worse than
                    # refusing
                    raise ValueError(
                        "packed batches (segment_ids) require a GPT, "
                        "llama-family or Bloom model (block-diagonal "
                        "attention)")
            if moe_aux:
                # model's labels path: shift-CE (same -100 exclusion as
                # below) + router_aux_loss_coef * load-balancing aux
                (loss, logits, _), _ = model.forward_fn()(
                    params, model.config, batch["input_ids"],
                    batch["attention_mask"], None, seg, None,
                    labels=batch["labels"], remat=self.args.remat,
                    embed_noise=embed_noise, **fwd_kw)
                if with_logits:
                    return loss, (logits.astype(jnp.float32)
                                  if logits is not None else None)
                return loss
            (out), _ = model.forward_fn()(params, model.config,
                                          batch["input_ids"],
                                          batch["attention_mask"], None, seg,
                                          None, remat=self.args.remat,
                                          embed_noise=embed_noise, **fwd_kw)
            logits = out[0].astype(jnp.float32)
            labels = batch["labels"]
            shift_logits = logits[:, :-1]
            shift_labels = labels[:, 1:]
            valid = shift_labels != -100
            safe_labels = jnp.where(valid, shift_labels, 0)
            logp = jax.nn.log_softmax(shift_logits, axis=-1)
            nll = -jnp.take_along_axis(logp, safe_labels[..., None], axis=-1)[..., 0]
            if smoothing > 0.0:
                smooth = -jnp.mean(logp, axis=-1)
                nll = (1 - smoothing) * nll + smoothing * smooth
            nll = jnp.where(valid, nll, 0.0)
            loss = jnp.sum(nll) / jnp.maximum(jnp.sum(valid), 1)
            if with_logits:
                return loss, logits
            return loss

        return loss_fn

    # -- optimizer / schedule (trainer.py:812-865) --------------------------

    def create_optimizer(self, num_training_steps):
        args = self.args
        if self.optimizer_factory is not None:
            self.optimizer = self.optimizer_factory()
        else:
            self.optimizer = adamw_decoupled(
                lr=args.learning_rate, betas=(args.adam_beta1, args.adam_beta2),
                eps=args.adam_epsilon, weight_decay=args.weight_decay,
                mask=self._decay_mask)
        init_fn, _ = self.optimizer
        self.opt_state = init_fn(self.model.params)
        self.lr_schedule = get_scheduler(
            args.lr_scheduler_type, args.learning_rate,
            num_warmup_steps=args.warmup_steps,
            num_training_steps=num_training_steps)

    @staticmethod
    def _decay_mask(params):
        """Exclude biases and norm weights from weight decay
        (trainer.py:820-833)."""
        def walk(path, node):
            if isinstance(node, dict):
                return {k: walk(path + (k,), v) for k, v in node.items()}
            leaf_name = path[-1] if path else ""
            is_norm = any(("layernorm" in p.lower() or p in ("ln_1", "ln_2", "ln_f",
                          "norm1", "norm2", "embedding_ln")) for p in path)
            return not (leaf_name == "b" or is_norm or node.ndim <= 1)
        return walk((), params)

    # -- the jitted train step ---------------------------------------------

    def _build_train_step(self):
        accum = self.args.gradient_accumulation_steps
        max_norm = self.args.max_grad_norm
        # note: args.remat applies PER-LAYER rematerialization inside the
        # model's layer scan (models/*.py run_block), which is what actually
        # bounds activation memory — not a whole-loss checkpoint
        loss_fn = self.loss_fn
        _, update_fn = self.optimizer

        def micro_grads(params, micro_batch, rng):
            return jax.value_and_grad(loss_fn)(params, micro_batch, rng)

        def compute_grads(params, batch, rng):
            if accum > 1:
                def body(carry, xs):
                    micro, i = xs
                    loss_sum, grads_sum = carry
                    loss, grads = micro_grads(params, micro,
                                              jax.random.fold_in(rng, i))
                    grads_sum = jax.tree_util.tree_map(jnp.add, grads_sum,
                                                       grads)
                    return (loss_sum + loss, grads_sum), None
                micro_batches = {
                    k: v.reshape(accum, v.shape[0] // accum, *v.shape[1:])
                    for k, v in batch.items()}
                zero = jax.tree_util.tree_map(jnp.zeros_like, params)
                (loss_sum, grads), _ = jax.lax.scan(
                    body, (0.0, zero),
                    (micro_batches, jnp.arange(accum, dtype=jnp.uint32)))
                loss = loss_sum / accum
                grads = jax.tree_util.tree_map(lambda g: g / accum, grads)
            else:
                loss, grads = micro_grads(params, batch, rng)
            gnorm = jnp.sqrt(sum(jnp.sum(g.astype(jnp.float32) ** 2)
                                 for g in jax.tree_util.tree_leaves(grads)))
            if max_norm and max_norm > 0:
                scale = jnp.minimum(1.0, max_norm / (gnorm + 1e-6))
                grads = jax.tree_util.tree_map(lambda g: g * scale, grads)
            return loss, gnorm, grads

        if getattr(self.args, "offload_optimizer", "") == "cpu":
            # DeepSpeed-style CPU optimizer offload (reference
            # scripts/ds_config_example.json offload_optimizer): master
            # params + Adam state live in HOST memory; the accelerator runs
            # only the fwd/bwd (grads stream device->host, the fresh bf16
            # working copy streams host->device next step). Trades step
            # latency (2x param-sized PCIe/tunnel transfers) for ~16 bytes
            # per param of freed HBM — the same trade DeepSpeed makes.
            if self.mesh is not None:
                raise ValueError("offload_optimizer='cpu' is a single-device "
                                 "HBM-relief mode; use zero_stage on meshes")
            acc_dev = jax.devices()[0]
            cpu_dev = jax.devices("cpu")[0]
            grad_step = jax.jit(compute_grads)

            def cpu_update(grads, opt_state, params, lr):
                return update_fn(grads, opt_state, params, lr_override=lr)
            cpu_update = jax.jit(cpu_update, donate_argnums=(1, 2))

            def offload_step(params, opt_state, batch, rng, lr):
                # params arrive committed to the CPU backend (train() moves
                # them there); push a working copy to the accelerator
                dev_params = jax.device_put(params, acc_dev)
                loss, gnorm, grads = grad_step(dev_params, batch, rng)
                grads = jax.device_put(grads, cpu_dev)
                new_params, new_opt = cpu_update(grads, opt_state, params,
                                                 jax.device_put(lr, cpu_dev))
                return new_params, new_opt, loss, gnorm

            return offload_step

        def train_step(params, opt_state, batch, rng, lr):
            # accumulation scan (distinct rng per micro-batch so NEFTune and
            # stochastic user losses don't repeat noise) + gnorm/clipping
            # live in compute_grads, shared with the CPU-offload path
            loss, gnorm, grads = compute_grads(params, batch, rng)
            new_params, new_opt_state = update_fn(grads, opt_state, params,
                                                  lr_override=lr)
            if self._opt_spec_tree is not None:
                # ZeRO-1: pin the updated Adam state to its data-sharded
                # layout so XLA keeps the whole m/v update partitioned
                # (reduce-scattered grads in, no all-gather of state)
                from cleantransformer_tpu.parallel.sharding import constrain
                new_opt_state = constrain(new_opt_state, self.mesh,
                                          self._opt_spec_tree)
            if self._param_spec_tree is not None:
                # ZeRO-3: the updated params leave the step data-sharded —
                # XLA all-gathers each weight at its use sites in the next
                # forward/backward instead of keeping a gathered copy
                from cleantransformer_tpu.parallel.sharding import constrain
                new_params = constrain(new_params, self.mesh,
                                       self._param_spec_tree)
            return new_params, new_opt_state, loss, gnorm

        # With a mesh, input shardings are carried by the operands themselves:
        # params via shard_params (TP specs), batches via _device_batch ('data'
        # axis), optimizer state inherits param shardings from init under jit.
        # XLA/GSPMD then places the psum/all-gather collectives over ICI.
        return jax.jit(train_step, donate_argnums=(0, 1))

    def _flops_per_token(self, seq_len):
        """Analytic training FLOs per token (6N + attention; reference
        floating_point_ops, trainer.py:1260-1276) for the MFU log field."""
        if self._flops_tok_cache.get(seq_len) is None:
            from cleantransformer_tpu.utils.profiling import (
                count_params, transformer_flops)
            cfg = self.model.config
            hidden = getattr(cfg, "hidden_size", getattr(cfg, "n_embd", 0))
            n_layer = getattr(cfg, "n_layer", 0)
            self._flops_tok_cache[seq_len] = transformer_flops(
                count_params(self.model.params), seq_len, hidden, n_layer)
        return self._flops_tok_cache[seq_len]

    def _model_type(self):
        name = type(self.model).__name__.lower()
        if "bloom" in name:
            return "bloom"
        if "gpt" in name:
            return "gpt"
        if "llama" in name or "qwen" in name or "mixtral" in name \
                or hasattr(self.model.config, "rope_theta"):
            return "llama"
        return "other"

    # -- data ---------------------------------------------------------------

    def get_train_dataloader(self):
        if isinstance(self.train_dataset, DataLoader):
            return self.train_dataset
        # multi-host: every process loads a DISJOINT 1/process_count slice of
        # each epoch and collates global_batch/process_count examples — the
        # DistributedSampler analogue (reference ft_bloom_DDP.py:68-76);
        # without this every host would feed identical data, silently.
        dp = self.mesh.shape.get("data", 1) if self.mesh is not None else 1
        global_batch = self.args.per_device_train_batch_size * dp
        n_proc, proc = jax.process_count(), jax.process_index()
        if global_batch % n_proc != 0:
            raise ValueError(
                f"global batch {global_batch} (per_device_train_batch_size "
                f"* data-parallel size) must divide evenly across "
                f"{n_proc} host processes")
        return DataLoader(self.train_dataset,
                          batch_size=global_batch // n_proc,
                          collate_fn=self.data_collator, shuffle=True,
                          seed=self.args.seed,
                          shard_index=proc, num_shards=n_proc,
                          group_by_length=self.args.group_by_length)

    def _signature_columns(self):
        """Batch keys the model/loss can accept (the reference's
        signature-column filtering, trainer.py:968-1003): the forward_fn
        signature plus the label columns. None = don't filter (user loss
        functions may consume arbitrary keys)."""
        if self._user_loss or not self.args.remove_unused_columns:
            return None
        if self._sig_columns is None:
            import inspect
            try:
                fwd = self.model.forward_fn()
                cols = set(inspect.signature(fwd).parameters)
            except (TypeError, ValueError, AttributeError):
                return None
            self._sig_columns = cols | {"labels", "label_ids", "loss_mask"}
        return self._sig_columns

    def _device_batch(self, batch):
        cols = self._signature_columns()
        arrays = {k: v for k, v in batch.items()
                  if isinstance(v, np.ndarray) and (cols is None or k in cols)}
        if self.mesh is not None:
            shardings = named_sharding(self.mesh, data_specs(arrays))
            if jax.process_count() > 1:
                # each host holds its loader's disjoint slice; assemble the
                # logically-global batch from the per-process locals
                return jax.tree_util.tree_map(
                    lambda x, s: jax.make_array_from_process_local_data(s, x),
                    arrays, shardings)
            return jax.tree_util.tree_map(
                lambda x, s: jax.device_put(jnp.asarray(x), s),
                arrays, shardings)
        return {k: jnp.asarray(v) for k, v in arrays.items()}

    # -- the training loop (trainer.py:253-541) ------------------------------

    def train(self, resume_from_checkpoint=None):
        args = self.args
        loader = self.get_train_dataloader()
        steps_per_epoch = max(1, len(loader))
        if args.max_steps > 0:
            max_steps = args.max_steps
            num_epochs = math.ceil(max_steps / steps_per_epoch)
        else:
            max_steps = int(steps_per_epoch * args.num_train_epochs)
            num_epochs = math.ceil(args.num_train_epochs)

        if self.optimizer is None:
            self.create_optimizer(max_steps)
        if self._train_step is None:
            self._train_step = self._build_train_step()

        # FLOs accounting (reference floating_point_ops/store_flos,
        # trainer.py:1260-1276): 6N per token
        from cleantransformer_tpu.utils.profiling import count_params
        n_params = count_params(self.model.params)

        start_step = 0
        if resume_from_checkpoint:
            start_step = self._load_from_checkpoint(resume_from_checkpoint)

        if getattr(args, "offload_optimizer", "") == "cpu":
            try:
                cpu_dev = jax.devices("cpu")[0]
            except RuntimeError as e:
                raise RuntimeError(
                    "offload_optimizer='cpu' needs the 'cpu' jax platform "
                    "alongside the accelerator (e.g. JAX_PLATFORMS="
                    "tpu,cpu)") from e
            # master copies live in host memory from here on
            self.model.params = jax.device_put(self.model.params, cpu_dev)
            self.opt_state = jax.device_put(self.opt_state, cpu_dev)

        if self.mesh is not None:
            from cleantransformer_tpu.parallel.sharding import (
                shard_params, shard_params_zero, shard_opt_state)
            stage = args.zero_stage if args.zero_stage >= 0 else \
                (1 if args.zero_optimizer else 0)
            dp = self.mesh.shape.get("data", 1)
            if stage >= 3 and dp > 1:
                self.model.params, self._param_spec_tree = shard_params_zero(
                    self.model.params, self.mesh, self._model_type())
            else:
                self.model.params = shard_params(self.model.params, self.mesh,
                                                 self._model_type())
            if stage >= 1 and dp > 1:
                self.opt_state, self._opt_spec_tree = shard_opt_state(
                    self.opt_state, self.model.params, self.mesh,
                    self._model_type())

        for cb in self.callbacks:
            cb.on_train_begin(self)

        params, opt_state = self.model.params, self.opt_state
        t_log = time.time()
        tokens_since_log = 0
        loss_window = []
        done = False

        # resume: fast-forward to the epoch containing start_step and skip
        # its already-consumed batches (skip_first_batches analogue,
        # trainer.py:365-398, 450-451); global_step was already restored
        start_epoch = start_step // steps_per_epoch
        skip_in_epoch = start_step % steps_per_epoch

        mesh_ctx = use_mesh(self.mesh) if self.mesh is not None else _null_ctx()
        with mesh_ctx:
            for epoch in range(start_epoch, num_epochs):
                loader.set_epoch(epoch)
                for cb in self.callbacks:
                    cb.on_epoch_begin(self, epoch)
                skip = skip_in_epoch if epoch == start_epoch else 0
                batch_iter = (loader.iter_skip(skip)
                              if hasattr(loader, "iter_skip") and skip
                              else iter(loader))
                for batch in batch_iter:
                    for cb in self.callbacks:
                        cb.on_step_begin(self)
                    db = self._device_batch(batch)
                    self._rng, step_rng = jax.random.split(self._rng)
                    lr = self.lr_schedule(self.state["global_step"])
                    params, opt_state, loss, gnorm = self._train_step(
                        params, opt_state, db, step_rng,
                        jnp.asarray(lr, jnp.float32))
                    # keep the public handles valid every step: the jit step
                    # donates the previous buffers, so stale references would
                    # raise 'Array has been deleted' in callbacks/user code
                    self.model.params, self.opt_state = params, opt_state
                    self.state["global_step"] += 1
                    self.state["epoch"] = self.state["global_step"] / steps_per_epoch
                    loss_window.append(loss)
                    batch_tokens = int(np.prod(batch["input_ids"].shape))
                    tokens_since_log += batch_tokens
                    self.state["total_flos"] += 6.0 * n_params * batch_tokens

                    ctl = self.control
                    if (args.logging_steps and self.state["global_step"]
                            % args.logging_steps == 0) or ctl.should_log:
                        ctl.should_log = False
                        dt = time.time() - t_log
                        tps = tokens_since_log / max(dt, 1e-9)
                        logs = {"loss": round(float(np.mean([float(l) for l in loss_window])), 4),
                                "grad_norm": round(float(gnorm), 4),
                                "learning_rate": lr,
                                "epoch": round(self.state["epoch"], 3),
                                "step": self.state["global_step"],
                                "tokens_per_sec": round(tps, 1),
                                "mfu": round(tps * self._flops_per_token(
                                    batch["input_ids"].shape[1])
                                    / _peak_flops_total(), 4)}
                        self.state["tokens_seen"] += tokens_since_log
                        loss_window, tokens_since_log, t_log = [], 0, time.time()
                        self.log(logs)

                    if self.eval_dataset is not None and (
                            (args.eval_steps and self.state["global_step"]
                             % args.eval_steps == 0) or ctl.should_evaluate):
                        ctl.should_evaluate = False
                        self.evaluate()

                    # save after eval so a best metric at this step can mark
                    # this very checkpoint (trainer.py:1325-1338)
                    if (args.save_steps and self.state["global_step"]
                            % args.save_steps == 0) or ctl.should_save:
                        ctl.should_save = False
                        self._save_checkpoint()

                    for cb in self.callbacks:
                        cb.on_step_end(self)
                    if self.state["global_step"] >= max_steps or \
                            ctl.should_training_stop:
                        done = True
                        break
                    if ctl.should_epoch_stop:
                        break
                if self.eval_dataset is not None and not args.eval_steps:
                    self.evaluate()
                for cb in self.callbacks:
                    cb.on_epoch_end(self, epoch)
                self.control.should_epoch_stop = False
                if done:
                    break

        self.model.params, self.opt_state = params, opt_state
        self._join_pending_save()
        for cb in self.callbacks:
            cb.on_train_end(self)
        return self.state

    # -- evaluation (trainer.py:591-787) -------------------------------------

    def _ensure_eval_fns(self):
        """Build the jitted eval/prediction callables ONCE and reuse them —
        re-jitting per evaluate() would repay a full (remote, on TPU)
        compile on every eval trigger."""
        if self._eval_loss_fn is None:
            # user-supplied loss is used as-is; the default gets its
            # eval variant (no NEFTune noise)
            self._eval_loss_fn = (self.loss_fn if self._user_loss
                                  else self._default_loss_fn(train=False))
        if self._eval_loss_jit is None:
            self._eval_loss_jit = jax.jit(self._eval_loss_fn)
        if self._pred_step_jit is None:
            if self.prediction_fn is not None:
                self._pred_step_jit = jax.jit(self.prediction_fn)
            elif not self._user_loss:
                # default prediction: (loss, logits) from the default loss
                self._pred_step_jit = jax.jit(
                    self._default_loss_fn(train=False, with_logits=True))

    def _eval_batches(self, loader):
        """Yield (device_batch, host_batch, n_valid). On a data-parallel mesh
        a batch whose row count does not divide the 'data' axis cannot be
        data-sharded — replicate it instead (the pad_across_processes/
        distributed_concat analogue, reference trainer.py:674-692; pjit
        outputs are already global, so no explicit gather is needed)."""
        dp = self.mesh.shape.get("data", 1) if self.mesh is not None else 1
        for batch in loader:
            arrays = {k: v for k, v in batch.items() if isinstance(v, np.ndarray)}
            n = next(iter(arrays.values())).shape[0] if arrays else 0
            if dp > 1 and n % dp != 0:
                db = {k: jnp.asarray(v) for k, v in arrays.items()}
                if self.mesh is not None:
                    from cleantransformer_tpu.parallel.sharding import replicate
                    db = replicate(db, self.mesh)
            else:
                db = self._device_batch(batch)
            yield db, batch, n

    def prediction_step(self, params, batch, prediction_loss_only=False):
        """One eval batch -> (loss, logits, labels) — the reference's
        prediction_step contract (trainer.py:741-787). ``logits`` is None
        when only a user loss (no prediction_fn) is available or
        ``prediction_loss_only``; ``labels`` is None when absent."""
        self._ensure_eval_fns()
        rng = jax.random.PRNGKey(0)
        labels = batch.get("labels")
        loss = None
        logits = None
        if self.prediction_fn is not None:
            loss = self._eval_loss_jit(params, batch, rng)
            if not prediction_loss_only:
                logits = self._pred_step_jit(params, batch)
        elif self._pred_step_jit is not None and not prediction_loss_only:
            loss, logits = self._pred_step_jit(params, batch, rng)
        else:
            loss = self._eval_loss_jit(params, batch, rng)
        for cb in self.callbacks:
            cb.on_prediction_step(self)
        return loss, logits, labels

    @staticmethod
    def _eval_host(x, n):
        """Eval output -> host numpy. A multi-host 'data'-sharded output is
        not fully addressable: all-gather it across processes first (the
        distributed_concat analogue, reference trainer.py:1211-1218) — every
        process then holds the full global rows, no [:n] trim."""
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            from jax.experimental import multihost_utils
            return np.asarray(multihost_utils.process_allgather(x, tiled=True))
        return np.asarray(x)[:n]

    def _evaluation_loop(self, loader, prediction_loss_only=False,
                         metric_key_prefix="eval"):
        """Shared core of evaluate()/predict() (reference evaluation_loop,
        trainer.py:621-739)."""
        losses, weights, preds, label_ids = [], [], [], []
        for db, batch, n in self._eval_batches(loader):
            loss, logits, labels = self.prediction_step(
                self.model.params, db, prediction_loss_only)
            if loss is not None:
                losses.append(float(loss))
                weights.append(n)
            if logits is not None:
                preds.append(self._eval_host(logits, n))
                if labels is not None:
                    label_ids.append(self._eval_host(labels, n))
        metrics = {}
        if losses:
            metrics[f"{metric_key_prefix}_loss"] = float(
                np.average(losses, weights=weights))
        predictions = np.concatenate(preds) if preds else None
        labels_all = np.concatenate(label_ids) if label_ids else None
        if self.compute_metrics is not None:
            if predictions is not None:
                ep = {"predictions": predictions, "label_ids": labels_all}
                extra = self.compute_metrics(ep)
            else:
                extra = self.compute_metrics(self)
            for k, v in extra.items():
                if not k.startswith(metric_key_prefix):
                    k = f"{metric_key_prefix}_{k}"
                metrics[k] = v
        return predictions, labels_all, metrics

    def _eval_loader(self, ds):
        """Eval DataLoader; under multi-host each process evaluates a
        DISJOINT shard, wraparound-padded so per-process batch counts are
        equal and every batch is full (DistributedSampler semantics — the
        reference pads + truncates via pad_across_processes/
        distributed_concat, trainer.py:674-692; wraparound duplicates a
        tail example per uneven shard instead)."""
        n_proc, proc = jax.process_count(), jax.process_index()
        return DataLoader(ds, batch_size=self.args.per_device_eval_batch_size,
                          collate_fn=self.data_collator, shuffle=False,
                          drop_last=False, shard_index=proc,
                          num_shards=n_proc, pad_shards=n_proc > 1)

    def evaluate(self, eval_dataset=None):
        """Eval loop (trainer.py:591-787): per-batch loss, optional
        prediction gathering + user compute_metrics over
        {'predictions', 'label_ids'} (the HF EvalPrediction contract)."""
        ds = eval_dataset or self.eval_dataset
        loader = ds if isinstance(ds, DataLoader) else self._eval_loader(ds)
        # logits are only materialized when compute_metrics needs them
        # (reference: prediction_loss_only = compute_metrics is None)
        _, _, metrics = self._evaluation_loop(
            loader, prediction_loss_only=self.compute_metrics is None,
            metric_key_prefix="eval")
        self.log({**metrics, "step": self.state["global_step"]})
        for cb in self.callbacks:
            cb.on_evaluate(self, metrics)
        self._track_best(metrics)
        return metrics

    def predict(self, test_dataset, metric_key_prefix="test"):
        """Run inference over ``test_dataset`` and return
        {'predictions', 'label_ids', 'metrics'} — the reference's
        predict()/PredictionOutput contract (trainer.py:741-787)."""
        loader = test_dataset if isinstance(test_dataset, DataLoader) else \
            self._eval_loader(test_dataset)
        predictions, label_ids, metrics = self._evaluation_loop(
            loader, metric_key_prefix=metric_key_prefix)
        for cb in self.callbacks:
            cb.on_predict(self, metrics)
        return {"predictions": predictions, "label_ids": label_ids,
                "metrics": metrics}

    def _track_best(self, metrics):
        key = self.args.metric_for_best_model
        if not key or key not in metrics:
            return
        val = metrics[key]
        best = self.state["best_metric"]
        better = (best is None or
                  (val > best if self.args.greater_is_better else val < best))
        if better:
            self.state["best_metric"] = val
            self.state["best_step"] = self.state["global_step"]
            # write a checkpoint NOW so the best model is always on disk and
            # protected from rotation, even when the best metric lands off
            # the save cadence (reference trainer.py:1325-1338, 1465-1511);
            # a scheduled save at this same step dedupes (idempotence guard)
            if self.args.save_steps:
                self._save_checkpoint()

    # -- logging (trainer.py:1287-1298) --------------------------------------

    def log(self, logs):
        self.state["log_history"].append(logs)
        for cb in self.callbacks:
            cb.on_log(self, logs)

    # -- checkpointing (trainer.py:1303-1670) --------------------------------

    def _join_pending_save(self):
        """Wait for an in-flight async checkpoint write (no-op otherwise).
        Re-raises the writer thread's exception — a failed save (disk full,
        permissions) must surface exactly like the sync path's would."""
        t = getattr(self, "_save_thread", None)
        if t is not None:
            t.join()
            self._save_thread = None
            err = getattr(self, "_save_error", None)
            if err is not None:
                self._save_error = None
                raise err

    def _save_checkpoint(self):
        os.makedirs(self.args.output_dir, exist_ok=True)
        step_dir = os.path.join(
            self.args.output_dir,
            f"{ckpt_io.CKPT_PREFIX}{self.state['global_step']}")
        if self.state.get("best_step") == self.state["global_step"]:
            self.state["best_model_checkpoint"] = step_dir
        self._join_pending_save()
        if os.path.isdir(step_dir):
            # already written this step (best-metric save followed by the
            # scheduled save) — don't rewrite
            return step_dir
        # copy list values (log_history) — the async writer serializes while
        # the training loop keeps appending to the live state
        trainer_state = {k: (list(v) if isinstance(v, list) else v)
                         for k, v in self.state.items()}
        # device->host fetch: a COLLECTIVE under multi-host sharding (ZeRO-3
        # params / ZeRO-1 moments all-gather across processes), so every
        # process runs it — only process 0 writes files below
        host_params = ckpt_io.gather_pytree(self.model.params)
        host_opt = ckpt_io.gather_pytree(self.opt_state)
        rng = np.asarray(self._rng)
        if jax.process_count() > 1:
            # rank-0-only writes (reference rank guard ft_bloom_DDP.py:155-156
            # + mkdir/barrier ft_bloom_deepspeed.py:221-223): concurrent
            # writers would race the atomic rename of the same step dir.
            # Synchronous here — the completion barrier must mean "resumable
            # from any process", which an async writer couldn't guarantee.
            from jax.experimental import multihost_utils
            if jax.process_index() == 0:
                ckpt = ckpt_io.save_checkpoint(
                    self.args.output_dir, self.state["global_step"],
                    host_params, host_opt, trainer_state, rng_state=rng)
                ckpt_io.rotate_checkpoints(
                    self.args.output_dir, self.args.save_total_limit,
                    self.state.get("best_model_checkpoint"))
                for cb in self.callbacks:
                    cb.on_save(self, ckpt)
            multihost_utils.sync_global_devices(
                f"ckpt-{self.state['global_step']}")
            return step_dir
        if not getattr(self.args, "async_save", False):
            ckpt = ckpt_io.save_checkpoint(
                self.args.output_dir, self.state["global_step"],
                host_params, host_opt, trainer_state, rng_state=rng)
            ckpt_io.rotate_checkpoints(self.args.output_dir,
                                       self.args.save_total_limit,
                                       self.state.get("best_model_checkpoint"))
            for cb in self.callbacks:
                cb.on_save(self, ckpt)
            return ckpt

        # async: the device->host fetch above is synchronous (the next train
        # step DONATES the param/opt buffers — deferring the read would race
        # the donation), the file writes are not
        import threading
        out_dir, step = self.args.output_dir, self.state["global_step"]
        limit = self.args.save_total_limit
        best = self.state.get("best_model_checkpoint")
        callbacks = list(self.callbacks)

        def job():
            try:
                ckpt = ckpt_io.save_checkpoint(out_dir, step, host_params,
                                               host_opt, trainer_state,
                                               rng_state=rng)
                ckpt_io.rotate_checkpoints(out_dir, limit, best)
                for cb in callbacks:
                    cb.on_save(self, ckpt)
            except BaseException as e:  # surfaced by _join_pending_save
                self._save_error = e

        self._save_error = None
        self._save_thread = threading.Thread(target=job, daemon=True)
        self._save_thread.start()
        return step_dir

    def save_model(self, output_dir=None, hf_format=False):
        """Write final weights (+config.json). ``hf_format=True`` exports the
        HF checkpoint layout (transformers-loadable) for GPT-2/Bloom models."""
        out = output_dir or self.args.output_dir
        os.makedirs(out, exist_ok=True)
        if hf_format:
            mt = self._model_type()
            if mt == "bloom":
                ckpt_io.export_hf_bloom(os.path.join(out, "model.safetensors"),
                                        self.model.params)
            elif mt == "gpt":
                ckpt_io.export_hf_gpt2(os.path.join(out, "model.safetensors"),
                                       self.model.params)
            elif mt == "llama":
                ckpt_io.export_hf_llama(
                    os.path.join(out, "model.safetensors"), self.model.params)
            else:
                raise ValueError(f"no HF export for model type {mt}")
        else:
            ckpt_io.save_pytree(os.path.join(out, "model.safetensors"),
                                self.model.params)
        if hasattr(self.model.config, "to_dict"):
            with open(os.path.join(out, "config.json"), "w") as f:
                json.dump(self.model.config.to_dict(), f, indent=2, default=str)

    def _load_from_checkpoint(self, resume):
        self._join_pending_save()
        if resume is True:
            resume = ckpt_io.get_last_checkpoint(self.args.output_dir)
            if resume is None:
                return 0
        params, opt_state, trainer_state, rng_state = ckpt_io.load_checkpoint(
            resume, self.model.params, self.opt_state)
        # re-place host arrays on the template shardings (ZeRO-3/TP/
        # multi-host resume: each process puts only its addressable shards)
        self.model.params = ckpt_io.reshard_like(params, self.model.params)
        if opt_state is not None:
            self.opt_state = ckpt_io.reshard_like(opt_state, self.opt_state)
        if trainer_state is not None:
            self.state.update(trainer_state)
        if rng_state is not None:
            self._rng = jnp.asarray(rng_state, dtype=jnp.uint32)
        return self.state["global_step"]


class _null_ctx:
    def __enter__(self):
        return None

    def __exit__(self, *a):
        return False


def _peak_flops_total():
    """Aggregate peak bf16 FLOP/s of the devices this process trains on."""
    from cleantransformer_tpu.utils.profiling import device_peak_flops
    return device_peak_flops() * jax.device_count()
