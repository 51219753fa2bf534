"""Llama family: parity vs the HuggingFace ``transformers`` implementation.

The torch reference at /root/reference stops at Bloom — the Llama family is
an extension (SURVEY.md §7 stage 8 spirit), so the oracle here is HF
``LlamaForCausalLM`` executed on CPU with shared weights: logits, greedy
decode with cache, left-padded batches, GQA, and the loss path must all
match. Engine integration (flash, int8 cache, TP mesh, serving, speculative,
Trainer) is covered against our own dense fp32 path.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cleantransformer_tpu.config import LlamaConfig
from cleantransformer_tpu.models.llama import (
    LlamaForCausalLM, init_llama_params, llama_lm_forward)
from cleantransformer_tpu.utils.hf_loader import llama_params_from_state_dict

CFG = dict(vocab_size=128, hidden_size=64, intermediate_size=112,
           num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
           max_position_embeddings=256, rms_norm_eps=1e-6, rope_theta=10000.0,
           tie_word_embeddings=False, attention_bias=False)


pytestmark = pytest.mark.slow  # full tier; fast tier: -m 'not slow'

def _hf_pair(seed=0, **overrides):
    """(hf_model, our_model) with identical weights."""
    import torch
    from transformers import LlamaConfig as HFLlamaConfig
    from transformers import LlamaForCausalLM as HFLlama
    d = dict(CFG, **overrides)
    hf_cfg = HFLlamaConfig(**d)
    torch.manual_seed(seed)
    hf = HFLlama(hf_cfg).eval()
    cfg = LlamaConfig(**d)
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    ours = LlamaForCausalLM(cfg, params=llama_params_from_state_dict(sd, cfg))
    return hf, ours


@pytest.fixture(scope="module")
def pair():
    return _hf_pair()


def test_logits_parity_gqa(pair):
    import torch
    hf, ours = pair
    ids = np.random.RandomState(0).randint(1, 128, (2, 9))
    mask = np.ones_like(ids)
    with torch.no_grad():
        want = hf(torch.tensor(ids), attention_mask=torch.tensor(mask)).logits.numpy()
    (got, _), _ = ours(jnp.asarray(ids), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=1e-4)


def test_logits_parity_mha_bias_tied():
    """Full-head attention + attention biases + tied embeddings."""
    import torch
    hf, ours = _hf_pair(seed=3, num_key_value_heads=4, attention_bias=True,
                        tie_word_embeddings=True)
    assert "lm_head" not in ours.params  # tied
    ids = np.random.RandomState(1).randint(1, 128, (1, 7))
    with torch.no_grad():
        want = hf(torch.tensor(ids)).logits.numpy()
    (got, _), _ = ours(jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=1e-4)


def test_greedy_generate_bit_exact(pair):
    import torch
    hf, ours = pair
    ids = np.random.RandomState(2).randint(1, 128, (2, 6))
    mask = np.ones_like(ids)
    want = hf.generate(torch.tensor(ids), attention_mask=torch.tensor(mask),
                       max_new_tokens=12, do_sample=False).numpy()
    got = ours.generate(jnp.asarray(ids), jnp.asarray(mask),
                        generation_configs={"beam_size": 1, "do_sample": False,
                                            "max_gen_len": 12})
    np.testing.assert_array_equal(np.asarray(got)[:, 0, :want.shape[1]], want)


def test_greedy_generate_left_padded(pair):
    import torch
    hf, ours = pair
    ids = np.asarray([[0, 0, 5, 17, 42], [9, 4, 100, 7, 33]], np.int64)
    mask = np.asarray([[0, 0, 1, 1, 1], [1, 1, 1, 1, 1]], np.int64)
    want = hf.generate(torch.tensor(ids), attention_mask=torch.tensor(mask),
                       max_new_tokens=8, do_sample=False).numpy()
    got = ours.generate(jnp.asarray(ids), jnp.asarray(mask),
                        generation_configs={"beam_size": 1, "do_sample": False,
                                            "max_gen_len": 8})
    np.testing.assert_array_equal(np.asarray(got)[:, 0, :want.shape[1]], want)


def test_loss_parity(pair):
    """Shift-CE labels path vs HF's (labels=input_ids) loss."""
    import torch
    hf, ours = pair
    ids = np.random.RandomState(4).randint(1, 128, (2, 10))
    with torch.no_grad():
        want = hf(torch.tensor(ids), labels=torch.tensor(ids)).loss.item()
    (loss, _, _), _ = llama_lm_forward(
        ours.params, ours.config, jnp.asarray(ids),
        jnp.ones_like(jnp.asarray(ids)), labels=jnp.asarray(ids))
    assert abs(float(loss) - want) < 2e-5


def test_flash_matches_dense(pair):
    _, ours = pair
    from cleantransformer_tpu.config import LlamaConfig
    cfg_flash = LlamaConfig(**CFG, use_flash_attention=True)
    flash = LlamaForCausalLM(cfg_flash, params=ours.params)
    ids = np.random.RandomState(5).randint(1, 128, (2, 16))
    mask = np.ones_like(ids)
    (want, _), _ = ours(jnp.asarray(ids), jnp.asarray(mask))
    (got, _), _ = flash(jnp.asarray(ids), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)


def test_flash_prefill_decode_matches_dense(pair):
    """generate() with flash prefill == dense generate (bit-exact greedy)."""
    _, ours = pair
    cfg_flash = LlamaConfig(**CFG, use_flash_attention=True)
    flash = LlamaForCausalLM(cfg_flash, params=ours.params)
    ids = np.random.RandomState(6).randint(1, 128, (2, 12))
    g = {"beam_size": 1, "do_sample": False, "max_gen_len": 10}
    want = ours.generate(jnp.asarray(ids), generation_configs=g)
    got = flash.generate(jnp.asarray(ids), generation_configs=g)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_int8_kv_cache_decode(pair):
    """int8 KV cache decodes without error and stays close to fp greedy."""
    _, ours = pair
    cfg_q = LlamaConfig(**CFG, kv_cache_int8=True)
    q = LlamaForCausalLM(cfg_q, params=ours.params)
    ids = np.random.RandomState(7).randint(1, 128, (1, 8))
    g = {"beam_size": 1, "do_sample": False, "max_gen_len": 8}
    want = np.asarray(ours.generate(jnp.asarray(ids), generation_configs=g))
    got = np.asarray(q.generate(jnp.asarray(ids), generation_configs=g))
    # int8 cache is lossy; on a tiny random model the argmax stream still
    # agrees for the first several steps
    assert (got[0, 0, :11] == want[0, 0, :11]).all()


def test_beam_matches_greedy_engine_integration(pair):
    """Beam search with beam_size=2 runs through the fused beam engine."""
    _, ours = pair
    ids = np.random.RandomState(8).randint(1, 128, (1, 5))
    out = ours.generate(jnp.asarray(ids),
                        generation_configs={"beam_size": 2, "do_sample": False,
                                            "max_gen_len": 6})
    assert np.asarray(out).shape[:2] == (1, 2)


def test_speculative_greedy_bit_exact(pair):
    """Llama target + smaller llama draft through speculative decoding."""
    from cleantransformer_tpu.generation.speculative import speculative_generate
    _, ours = pair
    draft_cfg = LlamaConfig(**dict(CFG, num_hidden_layers=1))
    draft = LlamaForCausalLM(draft_cfg, rng=jax.random.PRNGKey(11))
    ids = np.random.RandomState(9).randint(1, 128, (1, 6))
    g = {"beam_size": 1, "do_sample": False, "max_gen_len": 10}
    want = np.asarray(ours.generate(jnp.asarray(ids), generation_configs=g))
    got = speculative_generate(ours, draft, ids, generation_configs={
        "max_gen_len": 10}, draft_len=3)
    np.testing.assert_array_equal(got[0, 0], want[0, 0, :got.shape[-1]])


def test_tp_mesh_parity(pair):
    """Forward over a model=2 mesh (llama TP specs) == single-device."""
    from cleantransformer_tpu.parallel import make_mesh, use_mesh, shard_params
    _, ours = pair
    ids = np.random.RandomState(10).randint(1, 128, (2, 8))
    (want, _), _ = ours(jnp.asarray(ids))
    mesh = make_mesh(data=2, model=2, devices=jax.devices()[:4])
    with use_mesh(mesh):
        params = shard_params(ours.params, mesh, "llama")

        @jax.jit
        def fwd(p, i):
            (lg, _), _ = llama_lm_forward(p, ours.config, i, jnp.ones_like(i))
            return lg
        got = fwd(params, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=2e-5, rtol=1e-4)


def test_serving_engine_llama(pair):
    """Continuous-batching serving works for llama (RoPE positions, GQA
    cache shapes)."""
    from cleantransformer_tpu.serving.engine import ServingEngine
    _, ours = pair
    eng = ServingEngine(ours, max_slots=2, max_len=64,
                        prefill_buckets=(16, 32), chunk_size=4)
    g = {"beam_size": 1, "do_sample": False, "max_gen_len": 6}
    prompts = [[5, 17, 42, 9], [100, 7]]
    rids = [eng.submit(p, max_new_tokens=6) for p in prompts]
    done = dict(eng.run())
    for rid, p in zip(rids, prompts):
        want = np.asarray(ours.generate(
            jnp.asarray([p]), generation_configs=g))[0, 0, :len(p) + 6]
        np.testing.assert_array_equal(done[rid][:len(p) + 6], want)


def test_serving_llama_headmajor_prefix_and_lookup(pair):
    """Prefix caching + lookup speculation compose on the llama family's
    HEAD-MAJOR (L, B, T, Hkv*hd) cache layout: the prefix store, broadcast
    seed, batched prefixed admission, and (K+1)-token verify rounds all run
    on the 4D slab with RoPE positions and GQA, matching standalone greedy
    generate() exactly."""
    from cleantransformer_tpu.serving.engine import ServingEngine
    hf, _ = pair
    cfg = LlamaConfig(**CFG, decode_head_major=True)
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    ours = LlamaForCausalLM(cfg, params=llama_params_from_state_dict(sd, cfg))
    rs = np.random.RandomState(8)
    prefix = rs.randint(1, 128, (24,)).tolist()
    prompts = [prefix + rs.randint(1, 128, (n,)).tolist() for n in (3, 8)]
    prompts.append(rs.randint(1, 128, (5,)).tolist())  # no match
    eng = ServingEngine(ours, max_slots=2, max_len=96,
                        prefill_buckets=(16,), chunk_size=2,
                        speculative="lookup", draft_len=4)
    eng.register_prefix(prefix)
    g = {"beam_size": 1, "do_sample": False, "max_gen_len": 8}
    rids = {eng.submit(p, max_new_tokens=8): p for p in prompts}
    done = dict(eng.run())
    for rid, p in rids.items():
        want = np.asarray(ours.generate(
            jnp.asarray([p]), generation_configs=g))[0, 0, : len(p) + 8]
        np.testing.assert_array_equal(done[rid][: len(p) + 8], want,
                                      err_msg=f"prompt_len={len(p)}")


def test_trainer_smoke():
    """Trainer trains a tiny llama (default causal-LM loss path)."""
    from cleantransformer_tpu.trainer.trainer import Trainer, TrainingArguments
    cfg = LlamaConfig(**dict(CFG, num_hidden_layers=1))
    model = LlamaForCausalLM(cfg, rng=jax.random.PRNGKey(0))
    rs = np.random.RandomState(0)
    data = [{"input_ids": rs.randint(1, 128, (12,)).astype(np.int32),
             "attention_mask": np.ones(12, np.int32),
             "labels": rs.randint(1, 128, (12,)).astype(np.int32)}
            for _ in range(8)]
    args = TrainingArguments(output_dir=None, num_train_epochs=1,
                             per_device_train_batch_size=4,
                             logging_steps=1, save_steps=0)

    def collate(batch):
        return {k: np.stack([ex[k] for ex in batch]) for k in batch[0]}

    tr = Trainer(model=model, args=args, train_dataset=data,
                 data_collator=collate)
    state = tr.train()
    losses = [l["loss"] for l in state["log_history"] if "loss" in l]
    assert losses and np.isfinite(losses).all()


def test_generate_rejects_over_length():
    """Decode past max_position_embeddings-free: llama has no learned
    positions, so long generations are bounded only by the cache buffer —
    generate() must not raise the n_positions check."""
    cfg = LlamaConfig(**dict(CFG, num_hidden_layers=1))
    m = LlamaForCausalLM(cfg, rng=jax.random.PRNGKey(1))
    ids = np.asarray([[3, 5]], np.int32)
    out = m.generate(jnp.asarray(ids),
                     generation_configs={"beam_size": 1, "do_sample": False,
                                         "max_gen_len": 5})
    assert np.asarray(out).shape[-1] >= 7


def test_mistral_sliding_window_parity():
    """Sliding-window attention (Mistral): logits + greedy decode parity vs
    executed HF MistralForCausalLM with window << seq (prefill masks old
    keys; decode keeps masking them as the cache outgrows the window)."""
    import torch
    from transformers import MistralConfig as HFCfg
    from transformers import MistralForCausalLM as HFM
    d = dict(vocab_size=128, hidden_size=64, intermediate_size=112,
             num_hidden_layers=2, num_attention_heads=4,
             num_key_value_heads=2, max_position_embeddings=256,
             rms_norm_eps=1e-6, rope_theta=10000.0, sliding_window=4,
             tie_word_embeddings=False)
    torch.manual_seed(0)
    hf = HFM(HFCfg(**d)).eval()
    cfg = LlamaConfig(**d)
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    ours = LlamaForCausalLM(cfg, params=llama_params_from_state_dict(sd, cfg))

    ids = np.random.RandomState(0).randint(1, 128, (2, 12))  # seq >> window
    with torch.no_grad():
        want = hf(torch.tensor(ids)).logits.numpy()
    (got, _), _ = ours(jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=1e-4)

    # SWA through the flash kernel (static window on the causal iota) —
    # same executed-HF oracle, no dense fallback
    cfg_fl = LlamaConfig(**d, use_flash_attention=True)
    flash = LlamaForCausalLM(cfg_fl, params=ours.params)
    (got_fl, _), _ = flash(jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(got_fl), want, atol=3e-5, rtol=1e-4)

    gen_hf = hf.generate(torch.tensor(ids), max_new_tokens=10,
                         do_sample=False).numpy()
    gen = ours.generate(jnp.asarray(ids), generation_configs={
        "beam_size": 1, "do_sample": False, "max_gen_len": 10,
        "end_ids": 2, "pad_id": 2})
    np.testing.assert_array_equal(np.asarray(gen)[:, 0, :gen_hf.shape[1]],
                                  gen_hf)

    # the window actually bites: a no-window model diverges on this input
    cfg_nw = LlamaConfig(**{**d, "sliding_window": None})
    full = LlamaForCausalLM(cfg_nw, params=ours.params)
    (full_logits, _), _ = full(jnp.asarray(ids))
    assert np.abs(np.asarray(full_logits) - want).max() > 1e-3


def test_rope_scaling_llama3_and_linear_parity():
    """rope_scaling from config.json must be applied (Llama-3.1-style
    'llama3' smooth interpolation and 'linear'), matching executed HF;
    unknown types are rejected loudly rather than silently ignored."""
    import torch
    for scaling in (
        {"rope_type": "llama3", "factor": 8.0, "low_freq_factor": 1.0,
         "high_freq_factor": 4.0, "original_max_position_embeddings": 64},
        {"rope_type": "linear", "factor": 2.0},
    ):
        hf, ours = _hf_pair(seed=5, rope_scaling=scaling)
        ids = np.random.RandomState(11).randint(1, 128, (2, 40))
        with torch.no_grad():
            want = hf(torch.tensor(ids)).logits.numpy()
        (got, _), _ = ours(jnp.asarray(ids))
        np.testing.assert_allclose(np.asarray(got), want, atol=3e-5,
                                   rtol=1e-4, err_msg=str(scaling))
        gen_hf = hf.generate(torch.tensor(ids), max_new_tokens=8,
                             do_sample=False).numpy()
        gen = ours.generate(jnp.asarray(ids), generation_configs={
            "beam_size": 1, "do_sample": False, "max_gen_len": 8,
            "end_ids": 2, "pad_id": 2})
        np.testing.assert_array_equal(
            np.asarray(gen)[:, 0, :gen_hf.shape[1]], gen_hf,
            err_msg=str(scaling))

    cfg_bad = LlamaConfig(**CFG, rope_scaling={"rope_type": "yarn",
                                               "factor": 4.0})
    m = LlamaForCausalLM(cfg_bad, rng=jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="rope_scaling"):
        m(jnp.asarray(np.asarray([[1, 2, 3]], np.int32)))


def test_qwen2_parity():
    """Qwen2/Qwen2.5 (llama arch + qkv biases, no o_proj bias): logits and
    greedy decode parity vs executed HF ``Qwen2ForCausalLM``; the unused
    sliding_window field in Qwen2 config.json files (use_sliding_window
    False) must NOT activate the Mistral window path."""
    import torch
    from transformers import Qwen2Config as HFQwen2Config
    from transformers import Qwen2ForCausalLM as HFQwen2
    from cleantransformer_tpu.config import Qwen2Config
    from cleantransformer_tpu.models.llama import Qwen2ForCausalLM as Ours
    d = dict(vocab_size=128, hidden_size=64, intermediate_size=112,
             num_hidden_layers=2, num_attention_heads=4,
             num_key_value_heads=2, max_position_embeddings=256,
             rms_norm_eps=1e-6, rope_theta=10000.0,
             tie_word_embeddings=False)
    torch.manual_seed(7)
    hf = HFQwen2(HFQwen2Config(**d, sliding_window=4,
                               use_sliding_window=False)).eval()
    cfg = Qwen2Config(**d, sliding_window=4, use_sliding_window=False)
    assert getattr(cfg, "sliding_window", None) is None  # gate respected
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    ours = Ours(cfg, params=llama_params_from_state_dict(sd, cfg))
    # the loader must pick up qkv biases and skip the absent o_proj bias
    attn = ours.params["blocks"]["self_attn"]
    assert "b" in attn["q_proj"] and "b" not in attn["o_proj"]

    ids = np.random.RandomState(3).randint(1, 128, (2, 12))
    with torch.no_grad():
        want = hf(torch.tensor(ids)).logits.numpy()
    (got, _), _ = ours(jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(got), want, atol=3e-5, rtol=1e-4)

    gen_want = hf.generate(torch.tensor(ids), max_new_tokens=10,
                           do_sample=False).numpy()
    gen_got = ours.generate(jnp.asarray(ids),
                            generation_configs={"beam_size": 1,
                                                "do_sample": False,
                                                "max_gen_len": 10})
    np.testing.assert_array_equal(
        np.asarray(gen_got)[:, 0, :gen_want.shape[1]], gen_want)


def test_qwen2_init_respects_out_bias():
    """Scratch init: q/k/v carry biases, o_proj does not."""
    from cleantransformer_tpu.config import Qwen2Config
    cfg = Qwen2Config(vocab_size=64, hidden_size=32, intermediate_size=48,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2)
    p = init_llama_params(cfg, jax.random.PRNGKey(0))
    attn = p["blocks"]["self_attn"]
    assert "b" in attn["q_proj"] and "b" in attn["k_proj"] \
        and "b" in attn["v_proj"] and "b" not in attn["o_proj"]
    with pytest.raises(ValueError):
        Qwen2Config(vocab_size=64, hidden_size=32, intermediate_size=48,
                    num_hidden_layers=8, num_attention_heads=4,
                    num_key_value_heads=2, sliding_window=8,
                    use_sliding_window=True, max_window_layers=4)


def test_auto_config_dispatch(tmp_path):
    """auto_config reads model_type and builds the right class: qwen2 gets
    bias/window handling, mistral keeps sliding_window, unknown types raise."""
    import json
    from cleantransformer_tpu.config import (auto_config, LlamaConfig,
                                             Qwen2Config)
    base = dict(vocab_size=64, hidden_size=32, intermediate_size=48,
                num_hidden_layers=2, num_attention_heads=4,
                num_key_value_heads=2)
    q = dict(base, model_type="qwen2", sliding_window=4096,
             use_sliding_window=False)
    fn = tmp_path / "config.json"
    fn.write_text(json.dumps(q))
    cfg = auto_config(str(fn))
    assert isinstance(cfg, Qwen2Config)
    assert cfg.attention_bias and not cfg.attention_out_bias
    assert getattr(cfg, "sliding_window", None) is None

    m = dict(base, model_type="mistral", sliding_window=8)
    fn.write_text(json.dumps(m))
    cfg = auto_config(str(fn))
    assert isinstance(cfg, LlamaConfig) and cfg.sliding_window == 8

    fn.write_text(json.dumps(dict(base, model_type="falcon")))
    with pytest.raises(ValueError, match="unknown model_type"):
        auto_config(str(fn))


def test_loader_is_bias_presence_driven():
    """A checkpoint carrying projection biases loads them even if the config
    flag says no bias — silently dropping file weights corrupts the model."""
    import torch
    from transformers import Qwen2Config as HFQwen2Config
    from transformers import Qwen2ForCausalLM as HFQwen2
    torch.manual_seed(1)
    d = dict(vocab_size=64, hidden_size=32, intermediate_size=48,
             num_hidden_layers=2, num_attention_heads=4,
             num_key_value_heads=2, tie_word_embeddings=False)
    hf = HFQwen2(HFQwen2Config(**d)).eval()
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    cfg = LlamaConfig(**d, attention_bias=False)  # flag says no bias
    params = llama_params_from_state_dict(sd, cfg)
    assert "b" in params["blocks"]["self_attn"]["q_proj"]
