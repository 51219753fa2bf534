"""Bloom parity vs the PyTorch reference."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from cleantransformer_tpu.config import BloomConfig
from cleantransformer_tpu.models.bloom import BloomForCausalLM, build_alibi_bias
from cleantransformer_tpu.utils.hf_loader import bloom_params_from_state_dict
from ref_adapters import ref_bloom_to_hf

SHAPE = dict(vocab_size=101, hidden_size=32, n_layer=2, num_attention_heads=4)


pytestmark = pytest.mark.slow  # full tier; fast tier: -m 'not slow'

@pytest.fixture(scope="module")
def pair():
    from CleanTransformer.models.modeling_bloom import BloomForCausalLM as RefBloom, BloomConfig as RefCfg
    torch.manual_seed(123)
    ref = RefBloom(RefCfg(**SHAPE))
    ref.eval()
    cfg = BloomConfig(**SHAPE)
    params = bloom_params_from_state_dict(ref_bloom_to_hf(ref), cfg)
    return ref, BloomForCausalLM(cfg, params=params)


def _inputs(seed=0):
    g = torch.Generator().manual_seed(seed)
    ids = torch.randint(0, SHAPE["vocab_size"], (2, 6), generator=g)
    mask = torch.ones(2, 6, dtype=torch.long)
    mask[0, :2] = 0
    return ids, mask


def test_alibi_matches_reference():
    from CleanTransformer.models.modeling_bloom import build_alibi_tensor
    mask = torch.ones(2, 5, dtype=torch.long)
    mask[0, :2] = 0
    for heads in (4, 6, 8):  # 6 exercises the non-power-of-2 extra slopes
        expected = build_alibi_tensor(mask, heads, dtype=torch.float32)
        got = build_alibi_bias(jnp.asarray(mask.numpy()), heads)
        got_flat = np.asarray(got).reshape(2 * heads, 1, 5)
        np.testing.assert_allclose(got_flat, expected.numpy(), rtol=1e-6, atol=1e-7)


def test_forward_matches_reference(pair):
    ref, model = pair
    ids, mask = _inputs()
    with torch.no_grad():
        (ref_logits, _), _ = ref(ids, attention_mask=mask, head_mask=None)
    (logits, _), _ = model(jnp.asarray(ids.numpy()), jnp.asarray(mask.numpy()))
    np.testing.assert_allclose(np.asarray(logits), ref_logits.numpy(),
                               rtol=1e-3, atol=1e-4)


def test_shift_ce_loss_matches_reference(pair):
    ref, model = pair
    ids, mask = _inputs()
    labels = ids.clone()
    with torch.no_grad():
        (ref_loss, _, _), _ = ref(ids, attention_mask=mask, labels=labels)
    (loss, _, _), _ = model(jnp.asarray(ids.numpy()), jnp.asarray(mask.numpy()),
                            labels=jnp.asarray(labels.numpy()))
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)


def test_bit_exact_greedy_decode(pair):
    """BASELINE config 3: bit-identical greedy decode incl. ALiBi + ngram."""
    ref, model = pair
    ids, mask = _inputs()
    gen = {"beam_size": 1, "max_gen_len": 15, "end_ids": 2, "pad_id": 3,
           "no_repeat_ngram_size": 2, "do_sample": False}
    with torch.no_grad():
        expected = ref.generate(ids, attention_mask=mask, generation_configs=gen)
    got = model.generate(jnp.asarray(ids.numpy()), jnp.asarray(mask.numpy()),
                         generation_configs=gen)
    assert (expected.numpy() == np.asarray(got)).all()


def test_bit_exact_beam_search(pair):
    """Greedy beam search (do_sample=False) matches the reference exactly,
    incl. candidate-pool termination and cache reorder."""
    ref, model = pair
    ids, mask = _inputs()
    gen = {"beam_size": 3, "max_gen_len": 10, "end_ids": 2, "pad_id": 3,
           "do_sample": False, "early_stop": True, "no_repeat_ngram_size": 0}
    with torch.no_grad():
        expected = ref.generate(ids, attention_mask=mask, generation_configs=gen)
    got = model.generate(jnp.asarray(ids.numpy()), jnp.asarray(mask.numpy()),
                         generation_configs=gen)
    assert expected.shape == tuple(got.shape)
    assert (expected.numpy() == np.asarray(got)).all()


def test_config_synonyms():
    cfg = BloomConfig(n_embed=48, hidden_size=32, num_attention_heads=4, n_layer=1,
                      vocab_size=50)
    assert cfg.hidden_size == 48  # n_embed wins (modeling_bloom.py:38-39)


def test_slow_but_exact_mlp_matches_reference():
    """The Megatron-TP numerics-emulation branch (modeling_bloom.py:258-265)
    vs the reference BloomMLP module run directly."""
    import torch
    from CleanTransformer.models.modeling_bloom import BloomMLP, BloomConfig as RefCfg
    from cleantransformer_tpu.models.bloom import _bloom_mlp
    import jax.numpy as jnp

    torch.manual_seed(3)
    rc = RefCfg(vocab_size=10, hidden_size=32, n_layer=1, num_attention_heads=4,
                pretraining_tp=2, slow_but_exact=True)
    ref = BloomMLP(rc)
    ref.eval()
    h = torch.randn(2, 5, 32)
    res = torch.randn(2, 5, 32)
    with torch.no_grad():
        expected = ref(h, res).numpy()
    params = {
        "dense_h_to_4h": {"w": jnp.asarray(ref.dense_h_to_4h.weight.detach().numpy().T),
                          "b": jnp.asarray(ref.dense_h_to_4h.bias.detach().numpy())},
        "dense_4h_to_h": {"w": jnp.asarray(ref.dense_4h_to_h.weight.detach().numpy().T),
                          "b": jnp.asarray(ref.dense_4h_to_h.bias.detach().numpy())},
    }
    got = _bloom_mlp(params, jnp.asarray(h.numpy()), jnp.asarray(res.numpy()),
                     pretraining_tp=2, slow_but_exact=True)
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-4, atol=1e-5)
