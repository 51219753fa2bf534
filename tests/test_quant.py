"""Int8 weight-only quantization: numerics and end-to-end decode."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cleantransformer_tpu.config import GPTConfig
from cleantransformer_tpu.models.gpt import GPTLMHeadModel, init_gpt_params
from cleantransformer_tpu.ops.quant import (
    quantize_weight, quantized_matmul, dequantize_weight,
    quantize_params_for_inference, embed_lookup, lm_head_matmul, is_quantized,
)


def test_quantize_dequantize_error_bound():
    rs = np.random.RandomState(0)
    w = jnp.asarray(rs.randn(64, 128).astype(np.float32))
    wq = quantize_weight(w, compute_dtype=jnp.float32)
    deq = dequantize_weight(wq)
    rel = np.abs(np.asarray(deq) - np.asarray(w)).max() / np.abs(np.asarray(w)).max()
    assert rel < 0.01  # 7-bit symmetric: < 1% of column max


def test_quantized_matmul_close_to_float():
    rs = np.random.RandomState(1)
    x = jnp.asarray(rs.randn(4, 64).astype(np.float32))
    w = jnp.asarray(rs.randn(64, 32).astype(np.float32))
    wq = quantize_weight(w, compute_dtype=jnp.float32)
    ref = x @ w
    got = quantized_matmul(x, wq)
    denom = np.abs(np.asarray(ref)).mean()
    assert np.abs(np.asarray(got) - np.asarray(ref)).mean() / denom < 0.01


def test_quantize_params_skips_norms_and_biases():
    cfg = GPTConfig(vocab_size=64, n_embd=32, n_positions=64, n_layer=2, n_head=4)
    params = init_gpt_params(cfg, jax.random.PRNGKey(0), "gpt2")
    qp = quantize_params_for_inference(params)
    assert is_quantized(qp["blocks"]["attn"]["c_attn"]["w"])
    assert is_quantized(qp["blocks"]["mlp"]["c_fc"]["w"])
    assert not is_quantized(qp["blocks"]["ln_1"]["w"])   # LayerNorm stays float
    assert qp["blocks"]["ln_1"]["w"].dtype == jnp.bfloat16
    assert is_quantized(qp["tokens_embed"])
    assert not is_quantized(qp["position_embed"])


def test_embed_and_lm_head_roundtrip():
    rs = np.random.RandomState(2)
    table = jnp.asarray(rs.randn(50, 16).astype(np.float32))
    qp = quantize_params_for_inference({"tokens_embed": table},
                                       compute_dtype=jnp.float32)
    ids = jnp.asarray([0, 3, 49])
    np.testing.assert_allclose(np.asarray(embed_lookup(qp["tokens_embed"], ids)),
                               np.asarray(table[ids]), rtol=0.02, atol=0.05)
    h = jnp.asarray(rs.randn(2, 16).astype(np.float32))
    ref = h @ table.T
    got = lm_head_matmul(h, qp["tokens_embed"])
    assert np.abs(np.asarray(got) - np.asarray(ref)).mean() \
        / np.abs(np.asarray(ref)).mean() < 0.02


def test_quantized_decode_end_to_end():
    """quantize_int8 generate() runs, tokens valid, and mostly agrees with
    the bf16 path (int8 noise may flip near-ties, so exactness isn't
    asserted)."""
    kw = dict(vocab_size=97, n_embd=64, n_positions=128, n_layer=2, n_head=4)
    params = init_gpt_params(GPTConfig(**kw), jax.random.PRNGKey(5), "gpt2")
    m_bf16 = GPTLMHeadModel(GPTConfig(**kw, compute_dtype="bfloat16"),
                            version="gpt2", params=params)
    m_q = GPTLMHeadModel(GPTConfig(**kw, compute_dtype="bfloat16",
                                   quantize_int8=True),
                         version="gpt2", params=params)
    rs = np.random.RandomState(0)
    ids = jnp.asarray(rs.randint(0, 97, (2, 6)), jnp.int32)
    gen = {"beam_size": 1, "max_gen_len": 16, "do_sample": False,
           "end_ids": None, "pad_id": 0, "no_repeat_ngram_size": 0}
    out_b = np.asarray(m_bf16.generate(ids, generation_configs=gen))
    out_q = np.asarray(m_q.generate(ids, generation_configs=gen))
    assert out_q.shape == out_b.shape
    assert (out_q >= 0).all() and (out_q < 97).all()
    agreement = (out_q == out_b).mean()
    assert agreement > 0.5, f"agreement only {agreement}"


def test_llama_family_projections_are_quantized():
    """quantize_int8 must actually quantize the llama-family projection
    weights (q/k/v/o/gate/up/down_proj) — round-3 fix: these names were
    missing from _LINEAR_PARENTS, so 'int8 tinyllama' silently ran bf16."""
    from cleantransformer_tpu.config import LlamaConfig
    from cleantransformer_tpu.models.llama import (LlamaForCausalLM,
                                                   init_llama_params)
    cfg = LlamaConfig(vocab_size=128, hidden_size=64, intermediate_size=128,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, max_position_embeddings=128)
    params = init_llama_params(cfg, jax.random.PRNGKey(0))
    qp = quantize_params_for_inference(params)
    blocks = qp["blocks"]
    for k in ("q_proj", "k_proj", "v_proj", "o_proj"):
        assert is_quantized(blocks["self_attn"][k]["w"]), k
    for k in ("gate_proj", "up_proj", "down_proj"):
        assert is_quantized(blocks["mlp"][k]["w"]), k
    assert is_quantized(qp["embed_tokens"])

    # end-to-end: int8 greedy decode matches the float model's on a short run
    model = LlamaForCausalLM(cfg, rng=jax.random.PRNGKey(3))
    qcfg = LlamaConfig(vocab_size=128, hidden_size=64, intermediate_size=128,
                       num_hidden_layers=2, num_attention_heads=4,
                       num_key_value_heads=2, max_position_embeddings=128,
                       quantize_int8=True)
    qmodel = LlamaForCausalLM(qcfg, params=model.params)
    rs = np.random.RandomState(5)
    ids = jnp.asarray(rs.randint(1, 128, (2, 6)).astype(np.int32))
    gen = {"beam_size": 1, "max_gen_len": 8, "do_sample": False,
           "pad_id": 0, "end_ids": None}
    a = np.asarray(model.generate(ids, generation_configs=gen))
    b = np.asarray(qmodel.generate(ids, generation_configs=gen))
    assert (a == b).mean() > 0.7  # int8 is approximate; most tokens agree


def _mixtral_quant_fixture():
    from cleantransformer_tpu.config import MixtralConfig
    from cleantransformer_tpu.models.llama import init_llama_params
    cfg = MixtralConfig(vocab_size=128, hidden_size=64, intermediate_size=128,
                        num_hidden_layers=2, num_attention_heads=4,
                        num_key_value_heads=2, max_position_embeddings=128,
                        num_local_experts=4, num_experts_per_tok=2)
    params = init_llama_params(cfg, jax.random.PRNGKey(0))
    qp = quantize_params_for_inference(params, compute_dtype=jnp.float32)
    return cfg, params, qp


def test_mixtral_expert_weights_quantized():
    """Expert-stacked (ndim-4) MoE weights quantize to int8 with
    per-(expert, out-column) scales (VERDICT r4 #3: MoE decode streams the
    expert bytes — int8 halves them exactly like dense-model decode)."""
    cfg, params, qp = _mixtral_quant_fixture()
    moe = qp["blocks"]["block_sparse_moe"]
    for k in ("gate_proj", "up_proj", "down_proj"):
        wq = moe["experts"][k]["w"]
        assert is_quantized(wq), k
        raw = params["blocks"]["block_sparse_moe"]["experts"][k]["w"]
        assert wq["q"].shape == raw.shape and wq["q"].dtype == jnp.int8
        assert wq["s"].shape == raw.shape[:2] + raw.shape[-1:]  # (L, E, out)
    assert is_quantized(qp["blocks"]["self_attn"]["q_proj"]["w"])


def test_moe_dispatch_paths_agree_on_int8_experts():
    """dense / capacity / ragged dispatch on the SAME int8 expert weights:
    all three dequantize inside their dots (einsum or ragged_dot + the
    per-row expert-scale gather) and must agree with each other and with
    dense dispatch on explicitly dequantized weights to rounding
    tolerance."""
    from cleantransformer_tpu.ops.moe import (moe_mlp_capacity,
                                              moe_mlp_dense, moe_mlp_ragged)
    cfg, params, qp = _mixtral_quant_fixture()
    layer0 = jax.tree_util.tree_map(lambda x: x[0],
                                    qp["blocks"]["block_sparse_moe"])
    rs = np.random.RandomState(3)
    h = jnp.asarray(rs.randn(2, 5, 64) * 0.3, jnp.float32)
    act = jax.nn.silu
    out_d, _ = moe_mlp_dense(layer0, h, 2, act)
    out_c, _ = moe_mlp_capacity(layer0, h, 2, act, capacity=10)  # no drops
    out_r, _ = moe_mlp_ragged(layer0, h, 2, act)
    np.testing.assert_allclose(np.asarray(out_d), np.asarray(out_c),
                               atol=2e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out_d), np.asarray(out_r),
                               atol=2e-5, rtol=1e-4)
    # vs dense weights dequantized OUTSIDE the dots: pure rounding error
    deq = dict(layer0, experts={
        k: {"w": dequantize_weight(v["w"], jnp.float32)}
        for k, v in layer0["experts"].items()})
    out_f, _ = moe_mlp_dense(deq, h, 2, act)
    np.testing.assert_allclose(np.asarray(out_d), np.asarray(out_f),
                               atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("impl", ["dense", "ragged"])
def test_mixtral_int8_decode_end_to_end(impl):
    """Quantized-expert Mixtral through the model: teacher-forced logits
    stay close to the bf16 model's (the int8 rounding rides on top of the
    bf16 compute policy both share), and greedy decode runs the cached
    path end to end on both dispatch impls."""
    from cleantransformer_tpu.config import MixtralConfig
    from cleantransformer_tpu.generation.engine import inference_params
    from cleantransformer_tpu.models.llama import LlamaForCausalLM
    cfg, params, _ = _mixtral_quant_fixture()
    base = {**cfg.to_dict(), "compute_dtype": "bfloat16", "moe_impl": impl}
    m = LlamaForCausalLM(MixtralConfig(**base), params=params)
    mq = LlamaForCausalLM(MixtralConfig(**{**base, "quantize_int8": True}),
                          params=params)
    rs = np.random.RandomState(0)
    ids = rs.randint(1, 128, (2, 7)).astype(np.int32)
    (lf, _), _ = m.forward_fn()(inference_params(m), m.config,
                                jnp.asarray(ids))
    (lq, _), _ = mq.forward_fn()(inference_params(mq), mq.config,
                                 jnp.asarray(ids))
    lf, lq = np.asarray(lf, np.float32), np.asarray(lq, np.float32)
    assert np.abs(lq - lf).max() < 0.15 * np.abs(lf).max()
    gcfg = {"beam_size": 1, "max_gen_len": 6, "do_sample": False,
            "end_ids": None, "pad_id": 0, "no_repeat_ngram_size": 0}
    out = np.asarray(mq.generate(jnp.asarray(ids), generation_configs=gcfg))
    assert out.shape[-1] >= 13  # prompt 7 + 6 new (buffer may round up)
    np.testing.assert_array_equal(out[:, 0, :7], ids)  # prompt preserved
