"""Sparse MoE (Mixtral-style) + expert parallelism.

Oracle: executed HF ``transformers.MixtralForCausalLM`` with shared weights
(the reference at /root/reference has no MoE — this is an extension; same
oracle strategy as test_llama.py). Covers the dense-dispatch and GShard
capacity-dispatch paths, the load-balancing aux loss, greedy decode through
the engine, expert-parallel (and EP x TP) mesh parity, and training.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cleantransformer_tpu.config import LlamaConfig
from cleantransformer_tpu.models.llama import LlamaForCausalLM, llama_lm_forward
from cleantransformer_tpu.utils.hf_loader import llama_params_from_state_dict

CFG = dict(vocab_size=128, hidden_size=64, intermediate_size=112,
           num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
           max_position_embeddings=256, rms_norm_eps=1e-6, rope_theta=10000.0,
           num_local_experts=4, num_experts_per_tok=2,
           router_aux_loss_coef=0.01, tie_word_embeddings=False)


pytestmark = pytest.mark.slow  # full tier; fast tier: -m 'not slow'

@pytest.fixture(scope="module")
def pair():
    import torch
    from transformers import MixtralConfig as HFCfg
    from transformers import MixtralForCausalLM as HFM
    torch.manual_seed(0)
    hf = HFM(HFCfg(**CFG, sliding_window=None)).eval()
    cfg = LlamaConfig(**CFG)
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    ours = LlamaForCausalLM(cfg, params=llama_params_from_state_dict(sd, cfg))
    return hf, ours


def test_logits_parity(pair):
    import torch
    hf, ours = pair
    ids = np.random.RandomState(0).randint(1, 128, (2, 9))
    with torch.no_grad():
        want = hf(torch.tensor(ids)).logits.numpy()
    (got, _), _ = ours(jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=1e-4)


def test_loss_parity_plain_and_aux(pair):
    """Shift-CE loss; with output_router_logits the load-balancing aux term
    (coef * E * sum(frac_routed * mean_prob), layer-averaged) matches HF's
    load_balancing_loss_func."""
    import torch
    hf, ours = pair
    ids = np.random.RandomState(1).randint(1, 128, (2, 10))
    t_ids = torch.tensor(ids)
    with torch.no_grad():
        plain = hf(t_ids, labels=t_ids).loss.item()
        with_aux = hf(t_ids, labels=t_ids, output_router_logits=True).loss.item()
    assert with_aux != pytest.approx(plain)  # the aux term is real
    j_ids = jnp.asarray(ids)
    (l_plain, _, _), _ = llama_lm_forward(
        ours.params, ours.config, j_ids, jnp.ones_like(j_ids), labels=j_ids)
    cfg_aux = LlamaConfig(**CFG, output_router_logits=True)
    (l_aux, _, _), _ = llama_lm_forward(
        ours.params, cfg_aux, j_ids, jnp.ones_like(j_ids), labels=j_ids)
    assert abs(float(l_plain) - plain) < 2e-5
    assert abs(float(l_aux) - with_aux) < 2e-5


def test_aux_loss_excludes_padding(pair):
    """HF's load_balancing_loss_func masks attention_mask==0 tokens out of
    the router statistics — ours must match on a padded batch."""
    import torch
    hf, ours = pair
    ids = np.random.RandomState(6).randint(3, 128, (2, 10))
    mask = np.ones_like(ids)
    mask[0, :4] = 0  # left padding
    labels = np.where(mask == 1, ids, -100)
    # exclude the boundary pair (pad-position logit -> first real label):
    # a fully-masked pad query row's output is implementation-defined
    # garbage in BOTH frameworks (HF's eager vs sdpa paths already disagree
    # there), so its shifted CE term is not a meaningful parity target
    labels[0, 4] = -100
    t_ids, t_mask = torch.tensor(ids), torch.tensor(mask)
    with torch.no_grad():
        want = hf(t_ids, attention_mask=t_mask,
                  labels=torch.tensor(labels),
                  output_router_logits=True).loss.item()
    cfg_aux = LlamaConfig(**CFG, output_router_logits=True)
    # HF's plain forward uses arange position_ids even under padding (the
    # mask-cumsum convention is generate()-only) — pass them explicitly so
    # the comparison isolates the masked router statistics
    pos = jnp.broadcast_to(jnp.arange(ids.shape[1])[None], ids.shape)
    (got, _, _), _ = llama_lm_forward(
        ours.params, cfg_aux, jnp.asarray(ids), jnp.asarray(mask),
        position_ids=pos, labels=jnp.asarray(labels))
    assert abs(float(got) - want) < 3e-5, (float(got), want)


def test_greedy_generate_bit_exact(pair):
    import torch
    hf, ours = pair
    ids = np.random.RandomState(2).randint(1, 128, (2, 6))
    mask = np.ones_like(ids)
    want = hf.generate(torch.tensor(ids), attention_mask=torch.tensor(mask),
                       max_new_tokens=10, do_sample=False).numpy()
    # HF stops rows at eos (2) and pads with pad_token_id (= eos here)
    got = ours.generate(jnp.asarray(ids), jnp.asarray(mask),
                        generation_configs={"beam_size": 1, "do_sample": False,
                                            "max_gen_len": 10,
                                            "end_ids": 2, "pad_id": 2})
    np.testing.assert_array_equal(np.asarray(got)[:, 0, :want.shape[1]], want)


def test_capacity_dispatch_matches_dense(pair):
    """GShard capacity path == dense path when no tokens drop."""
    _, ours = pair
    cfg_cap = LlamaConfig(**CFG, moe_capacity_factor=8.0)
    cap = LlamaForCausalLM(cfg_cap, params=ours.params)
    ids = np.random.RandomState(3).randint(1, 128, (2, 12))
    (want, _), _ = ours(jnp.asarray(ids))
    (got, _), _ = cap(jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)


def test_capacity_dispatch_drops_overflow():
    """With capacity far below the load, overflowing tokens contribute zero
    MLP output (they keep the residual): outputs differ from dense, finitely."""
    from cleantransformer_tpu.ops.moe import moe_mlp_dense, moe_mlp_capacity
    from cleantransformer_tpu.ops.activations import silu
    rng = jax.random.PRNGKey(0)
    E, D, I, T = 4, 16, 32, 64
    ks = jax.random.split(rng, 4)
    params = {"gate": {"w": jax.random.normal(ks[0], (D, E)) * 0.1},
              "experts": {
                  "gate_proj": {"w": jax.random.normal(ks[1], (E, D, I)) * 0.1},
                  "up_proj": {"w": jax.random.normal(ks[2], (E, D, I)) * 0.1},
                  "down_proj": {"w": jax.random.normal(ks[3], (E, I, D)) * 0.1}}}
    h = jax.random.normal(jax.random.PRNGKey(9), (1, T, D))
    dense, _ = moe_mlp_dense(params, h, 2, silu)
    tight, _ = moe_mlp_capacity(params, h, 2, silu, capacity=8)
    assert np.isfinite(np.asarray(tight)).all()
    assert np.abs(np.asarray(tight) - np.asarray(dense)).max() > 1e-4
    # and a no-drop capacity reproduces dense exactly (up to reassociation)
    loose, _ = moe_mlp_capacity(params, h, 2, silu, capacity=2 * T)
    np.testing.assert_allclose(np.asarray(loose), np.asarray(dense),
                               atol=1e-5, rtol=1e-5)


def test_ragged_dispatch_matches_dense(pair):
    """Grouped-matmul (lax.ragged_dot) path == dense path: same exact top-k
    routing, no drops — only fp reassociation differs. Model-level HF parity
    follows transitively from test_logits_parity."""
    _, ours = pair
    cfg_rag = LlamaConfig(**CFG, moe_impl="ragged")
    rag = LlamaForCausalLM(cfg_rag, params=ours.params)
    ids = np.random.RandomState(4).randint(1, 128, (2, 12))
    (want, _), _ = ours(jnp.asarray(ids))
    (got, _), _ = rag(jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)


def test_ragged_dispatch_grads_match_dense():
    """d(loss)/d(params) through the ragged path == the dense path (both are
    exact top-k routing; ragged_dot is differentiable)."""
    from cleantransformer_tpu.ops.moe import moe_mlp_dense, moe_mlp_ragged
    from cleantransformer_tpu.ops.activations import silu
    rng = jax.random.PRNGKey(1)
    E, D, I, T = 4, 16, 32, 48
    ks = jax.random.split(rng, 4)
    params = {"gate": {"w": jax.random.normal(ks[0], (D, E)) * 0.1},
              "experts": {
                  "gate_proj": {"w": jax.random.normal(ks[1], (E, D, I)) * 0.1},
                  "up_proj": {"w": jax.random.normal(ks[2], (E, D, I)) * 0.1},
                  "down_proj": {"w": jax.random.normal(ks[3], (E, I, D)) * 0.1}}}
    h = jax.random.normal(jax.random.PRNGKey(8), (1, T, D))

    def loss(fn, p):
        out, _ = fn(p, h, 2, silu)
        return jnp.sum(out ** 2)

    g_dense = jax.grad(lambda p: loss(moe_mlp_dense, p))(params)
    g_rag = jax.grad(lambda p: loss(moe_mlp_ragged, p))(params)
    flat_d, _ = jax.tree_util.tree_flatten(g_dense)
    flat_r, _ = jax.tree_util.tree_flatten(g_rag)
    for a, b in zip(flat_d, flat_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=1e-4)


def test_ragged_greedy_generate_matches_dense(pair):
    """Decode through the engine with moe_impl='ragged' == the dense path
    (and hence HF, via test_greedy_generate_bit_exact)."""
    _, ours = pair
    cfg_rag = LlamaConfig(**CFG, moe_impl="ragged")
    rag = LlamaForCausalLM(cfg_rag, params=ours.params)
    ids = np.random.RandomState(5).randint(1, 128, (2, 6))
    gc = {"beam_size": 1, "do_sample": False, "max_gen_len": 10}
    want = np.asarray(ours.generate(jnp.asarray(ids),
                                    generation_configs=gc))
    got = np.asarray(rag.generate(jnp.asarray(ids), generation_configs=gc))
    np.testing.assert_array_equal(got, want)


def test_expert_parallel_mesh_parity(pair):
    """Forward sharded over (data=2, expert=2, model=2) == single device —
    EP composed with TP, the full parallelism stack."""
    from cleantransformer_tpu.parallel.mesh import make_named_mesh, use_mesh
    from cleantransformer_tpu.parallel.sharding import shard_params
    _, ours = pair
    ids = np.random.RandomState(4).randint(1, 128, (2, 8))
    (want, _), _ = ours(jnp.asarray(ids))
    mesh = make_named_mesh(data=2, expert=2, model=2,
                           devices=jax.devices()[:8])
    with use_mesh(mesh):
        params = shard_params(ours.params, mesh, "llama")

        @jax.jit
        def fwd(p, i):
            (lg, _), _ = llama_lm_forward(p, ours.config, i, jnp.ones_like(i))
            return lg
        got = fwd(params, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)


def test_expert_parallel_grads_match(pair):
    """value_and_grad of the (labels + aux) loss on an expert=4 mesh matches
    single-device — EP is a training capability, not an inference demo."""
    from cleantransformer_tpu.parallel.mesh import make_named_mesh, use_mesh
    from cleantransformer_tpu.parallel.sharding import shard_params
    _, ours = pair
    cfg_aux = LlamaConfig(**CFG, output_router_logits=True)
    ids = jnp.asarray(np.random.RandomState(5).randint(1, 128, (2, 8)))

    def loss_fn(p):
        (l, _, _), _ = llama_lm_forward(p, cfg_aux, ids, jnp.ones_like(ids),
                                        labels=ids)
        return l

    want_l, want_g = jax.value_and_grad(loss_fn)(ours.params)
    mesh = make_named_mesh(data=2, expert=4, devices=jax.devices()[:8])
    with use_mesh(mesh):
        params = shard_params(ours.params, mesh, "llama")
        got_l, got_g = jax.jit(jax.value_and_grad(loss_fn))(params)
    assert abs(float(got_l) - float(want_l)) < 2e-5
    flat_w, _ = jax.tree_util.tree_flatten(want_g)
    flat_g, _ = jax.tree_util.tree_flatten(jax.device_get(got_g))
    for a, b in zip(flat_g, flat_w):
        np.testing.assert_allclose(a, np.asarray(b), atol=3e-5, rtol=2e-4)


def test_ragged_ep_mesh_matches_dense_single_device(pair):
    """moe_impl='ragged' on an expert-sharded mesh routes through the
    shard_map grouped-matmul path (moe_mlp_ragged_ep) and must match the
    single-device dense forward (VERDICT r2 item 6)."""
    from cleantransformer_tpu.parallel.mesh import make_named_mesh, use_mesh
    from cleantransformer_tpu.parallel.sharding import shard_params
    _, ours = pair
    cfg_rag = LlamaConfig(**CFG, moe_impl="ragged")
    ids = np.random.RandomState(7).randint(1, 128, (2, 8))
    (want, _), _ = ours(jnp.asarray(ids))
    mesh = make_named_mesh(data=2, expert=4, devices=jax.devices()[:8])
    with use_mesh(mesh):
        params = shard_params(ours.params, mesh, "llama")

        @jax.jit
        def fwd(p, i):
            (lg, _), _ = llama_lm_forward(p, cfg_rag, i, jnp.ones_like(i))
            return lg
        got = fwd(params, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)


def test_ragged_ep_tp_mesh_matches_dense_single_device(pair):
    """ragged EP composed with TP (expert=2, model=2): the row-parallel
    down projection's partial sums psum over 'model' inside the shard_map."""
    from cleantransformer_tpu.parallel.mesh import make_named_mesh, use_mesh
    from cleantransformer_tpu.parallel.sharding import shard_params
    _, ours = pair
    cfg_rag = LlamaConfig(**CFG, moe_impl="ragged")
    ids = np.random.RandomState(8).randint(1, 128, (2, 8))
    (want, _), _ = ours(jnp.asarray(ids))
    mesh = make_named_mesh(data=2, expert=2, model=2,
                           devices=jax.devices()[:8])
    with use_mesh(mesh):
        params = shard_params(ours.params, mesh, "llama")

        @jax.jit
        def fwd(p, i):
            (lg, _), _ = llama_lm_forward(p, cfg_rag, i, jnp.ones_like(i))
            return lg
        got = fwd(params, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)


def test_ragged_ep_grads_match_single_device(pair):
    """value_and_grad of the (labels + aux) loss with ragged EP dispatch on
    an expert=4 mesh == single-device dense — the fast MoE path is a
    training capability on EP meshes too."""
    from cleantransformer_tpu.parallel.mesh import make_named_mesh, use_mesh
    from cleantransformer_tpu.parallel.sharding import shard_params
    _, ours = pair
    cfg_dense = LlamaConfig(**CFG, output_router_logits=True)
    cfg_rag = LlamaConfig(**CFG, output_router_logits=True,
                          moe_impl="ragged")
    ids = jnp.asarray(np.random.RandomState(9).randint(1, 128, (2, 8)))

    def loss_fn(cfg):
        def f(p):
            (l, _, _), _ = llama_lm_forward(p, cfg, ids, jnp.ones_like(ids),
                                            labels=ids)
            return l
        return f

    want_l, want_g = jax.value_and_grad(loss_fn(cfg_dense))(ours.params)
    mesh = make_named_mesh(data=2, expert=4, devices=jax.devices()[:8])
    with use_mesh(mesh):
        params = shard_params(ours.params, mesh, "llama")
        got_l, got_g = jax.jit(jax.value_and_grad(loss_fn(cfg_rag)))(params)
    assert abs(float(got_l) - float(want_l)) < 2e-5
    flat_w, _ = jax.tree_util.tree_flatten(want_g)
    flat_g, _ = jax.tree_util.tree_flatten(jax.device_get(got_g))
    for a, b in zip(flat_g, flat_w):
        np.testing.assert_allclose(a, np.asarray(b), atol=3e-5, rtol=2e-4)


def test_trainer_moe_smoke():
    """The Trainer's DEFAULT loss must include the router aux term for MoE
    configs with output_router_logits (it delegates to the model's labels
    path — a silently-dropped aux loss means router collapse)."""
    from cleantransformer_tpu.trainer.trainer import Trainer, TrainingArguments
    cfg = LlamaConfig(**dict(CFG, num_hidden_layers=1),
                      output_router_logits=True)
    model = LlamaForCausalLM(cfg, rng=jax.random.PRNGKey(0))
    rs = np.random.RandomState(0)
    data = [{"input_ids": rs.randint(1, 128, (12,)).astype(np.int32),
             "attention_mask": np.ones(12, np.int32),
             "labels": rs.randint(1, 128, (12,)).astype(np.int32)}
            for _ in range(8)]

    def collate(batch):
        return {k: np.stack([ex[k] for ex in batch]) for k in batch[0]}

    args = TrainingArguments(output_dir=None, num_train_epochs=1,
                             per_device_train_batch_size=4, logging_steps=1,
                             save_steps=0)
    tr = Trainer(model=model, args=args, train_dataset=data,
                 data_collator=collate)
    # the default loss == the model's labels-path loss (incl. aux term)
    batch = collate(data[:4])
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    trainer_loss = float(tr.loss_fn(model.params, batch,
                                    jax.random.PRNGKey(0)))
    (want, _, _), _ = llama_lm_forward(model.params, cfg,
                                       batch["input_ids"],
                                       batch["attention_mask"],
                                       labels=batch["labels"])
    (no_aux, _, _), _ = llama_lm_forward(
        model.params, LlamaConfig(**dict(CFG, num_hidden_layers=1)),
        batch["input_ids"], batch["attention_mask"], labels=batch["labels"])
    assert abs(trainer_loss - float(want)) < 1e-6
    assert trainer_loss != pytest.approx(float(no_aux))  # aux really in
    state = tr.train()
    losses = [l["loss"] for l in state["log_history"] if "loss" in l]
    assert losses and np.isfinite(losses).all()


def test_decode_with_cache_matches_uncached(pair):
    """Cached stepwise decode == full uncached forward (MoE in the decode
    scan carry)."""
    _, ours = pair
    ids = np.random.RandomState(6).randint(1, 128, (1, 7))
    (full, _), _ = ours(jnp.asarray(ids))
    cache = ours.init_cache(1, 16)
    fwd = ours.forward_fn()
    logits_steps = []
    for t in range(ids.shape[1]):
        mask = jnp.asarray((np.arange(16) < t + 1)[None].astype(np.int32))
        (lg, _), cache = fwd(ours.params, ours.config, jnp.asarray(ids[:, t:t + 1]),
                             mask, None, None, cache)
        logits_steps.append(np.asarray(lg)[:, 0])
    got = np.stack(logits_steps, axis=1)
    np.testing.assert_allclose(got, np.asarray(full), atol=2e-5, rtol=1e-4)
