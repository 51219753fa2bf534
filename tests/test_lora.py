"""LoRA: zero-init identity, adapter-only gradients, Trainer integration,
merge_and_unload, save/load. (The reference delegates PEFT to the ``peft``
library — trainer.py:24-127; this is the first-class equivalent.)"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cleantransformer_tpu.config import GPTConfig, LlamaConfig
from cleantransformer_tpu.models.gpt import GPTLMHeadModel
from cleantransformer_tpu.models.llama import LlamaForCausalLM, llama_lm_forward
from cleantransformer_tpu.lora import LoraModel, init_lora_params, merge_lora

LCFG = dict(vocab_size=128, hidden_size=64, intermediate_size=112,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2)


@pytest.fixture(scope="module")
def llama():
    return LlamaForCausalLM(LlamaConfig(**LCFG), rng=jax.random.PRNGKey(0))


def test_zero_init_is_identity(llama):
    """B = 0 at init: the wrapped model equals the base bit-for-bit."""
    lm = LoraModel(llama, rank=4, alpha=8, rng=jax.random.PRNGKey(1))
    ids = np.random.RandomState(0).randint(1, 128, (2, 7))
    (want, _), _ = llama(jnp.asarray(ids))
    (got, _), _ = lm(jnp.asarray(ids))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_adapter_tree_targets_q_v_only(llama):
    lora = init_lora_params(llama.params, jax.random.PRNGKey(0), 4,
                            ("q_proj", "v_proj"))
    attn = lora["blocks"]["self_attn"]
    assert set(attn) == {"q_proj", "v_proj"}
    assert attn["q_proj"]["w"]["lora_a"].shape == (2, 64, 4)
    assert attn["q_proj"]["w"]["lora_b"].shape == (2, 4, 64)
    # B zero-init
    assert float(jnp.abs(attn["q_proj"]["w"]["lora_b"]).max()) == 0.0


def test_decay_mask_covers_lora_b(llama):
    """The adapter B matrices must NOT hit the Trainer's bias-exclusion
    decay rule (leaves literally named 'b') — hence the lora_b name."""
    from cleantransformer_tpu.trainer.trainer import Trainer
    lm = LoraModel(llama, rank=4, alpha=8, rng=jax.random.PRNGKey(1))
    mask = Trainer._decay_mask(lm.params)
    leaves = jax.tree_util.tree_leaves(mask)
    assert all(leaves), "every (L, in, r)/(L, r, out) adapter leaf is a weight"


def test_gradients_flow_only_into_adapter(llama):
    lm = LoraModel(llama, rank=4, alpha=8, rng=jax.random.PRNGKey(1))
    # at exact init dL/dA = 0 (it is left-multiplied by B = 0 — standard
    # LoRA); perturb B so every leaf carries signal
    lm.params = jax.tree_util.tree_map(
        lambda x: x + 0.01 * jnp.ones_like(x), lm.params)
    ids = jnp.asarray(np.random.RandomState(1).randint(1, 128, (2, 8)))
    fwd = lm.forward_fn()

    def loss_fn(adapter):
        (l, _, _), _ = fwd(adapter, lm.config, ids, jnp.ones_like(ids),
                           labels=ids)
        return l

    grads = jax.grad(loss_fn)(lm.params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert leaves and all(np.isfinite(np.asarray(g)).all() for g in leaves)
    nonzero = sum(float(jnp.abs(g).max()) > 0 for g in leaves)
    assert nonzero == len(leaves)


def test_training_moves_loss_base_frozen(llama):
    from cleantransformer_tpu.trainer.trainer import Trainer, TrainingArguments
    lm = LoraModel(llama, rank=4, alpha=8, rng=jax.random.PRNGKey(1))
    base_before = jax.tree_util.tree_map(np.asarray, llama.params)
    rs = np.random.RandomState(0)
    row = rs.randint(1, 128, (12,)).astype(np.int32)
    data = [{"input_ids": row, "attention_mask": np.ones(12, np.int32),
             "labels": row} for _ in range(8)]

    def collate(batch):
        return {k: np.stack([ex[k] for ex in batch]) for k in batch[0]}

    args = TrainingArguments(output_dir=None, num_train_epochs=4,
                             per_device_train_batch_size=8,
                             learning_rate=3e-2, logging_steps=1,
                             save_steps=0)
    tr = Trainer(model=lm, args=args, train_dataset=data,
                 data_collator=collate)
    state = tr.train()
    losses = [l["loss"] for l in state["log_history"] if "loss" in l]
    assert losses[-1] < losses[0] - 0.05, losses
    # base stayed frozen; the trained params ARE the adapter
    for a, b in zip(jax.tree_util.tree_leaves(base_before),
                    jax.tree_util.tree_leaves(llama.params)):
        np.testing.assert_array_equal(a, np.asarray(b))


def test_merge_and_unload_and_generate(llama):
    lm = LoraModel(llama, rank=4, alpha=8, rng=jax.random.PRNGKey(1))
    # make the adapter non-trivial
    lm.params = jax.tree_util.tree_map(
        lambda x: x + 0.01 * jnp.ones_like(x), lm.params)
    merged = lm.merge_and_unload()
    assert type(merged) is LlamaForCausalLM
    ids = np.random.RandomState(2).randint(1, 128, (1, 6))
    g = {"beam_size": 1, "do_sample": False, "max_gen_len": 8}
    want = lm.generate(jnp.asarray(ids), generation_configs=g)
    got = merged.generate(jnp.asarray(ids), generation_configs=g)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    # and the merged weights actually differ from the base
    assert float(jnp.abs(
        merged.params["blocks"]["self_attn"]["q_proj"]["w"]
        - llama.params["blocks"]["self_attn"]["q_proj"]["w"]).max()) > 0


def test_adapter_save_load_roundtrip(llama, tmp_path):
    lm = LoraModel(llama, rank=4, alpha=8, rng=jax.random.PRNGKey(1))
    lm.params = jax.tree_util.tree_map(
        lambda x: x + 0.5 * jnp.ones_like(x), lm.params)
    p = os.path.join(tmp_path, "adapter.safetensors")
    lm.save_adapter(p)
    assert os.path.getsize(p) < 500_000  # adapters are tiny
    lm2 = LoraModel(llama, rank=4, alpha=8, rng=jax.random.PRNGKey(9))
    lm2.load_adapter(p)
    for a, b in zip(jax.tree_util.tree_leaves(lm.params),
                    jax.tree_util.tree_leaves(lm2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_gpt_targets(llama):
    gpt = GPTLMHeadModel(GPTConfig(vocab_size=64, n_embd=32, n_positions=64,
                                   n_layer=2, n_head=2, embd_pdrop=0.0,
                                   attn_pdrop=0.0, resid_pdrop=0.0),
                         version="gpt2", rng=jax.random.PRNGKey(0))
    lm = LoraModel(gpt, rank=2, alpha=4)
    assert "c_attn" in lm.params["blocks"]["attn"]
    ids = np.random.RandomState(3).randint(1, 64, (1, 5))
    (want, _), _ = gpt(jnp.asarray(ids))
    (got, _), _ = lm(jnp.asarray(ids))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
