"""GPT parity vs the PyTorch reference (seeded random weights as oracle)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from cleantransformer_tpu.config import GPTConfig
from cleantransformer_tpu.models.gpt import GPTLMHeadModel, gpt_lm_forward
from cleantransformer_tpu.utils.hf_loader import gpt_params_from_state_dict
from ref_adapters import ref_gpt_to_hf

SHAPE = dict(vocab_size=97, n_embd=32, n_positions=128, n_layer=2, n_head=4, n_ctx=128)


def make_pair(version="gpt2", seed=42):
    from CleanTransformer.models.modeling_gpt import GPTLMHeadModel as RefGPT, GPTConfig as RefCfg
    torch.manual_seed(seed)
    rc = RefCfg(**SHAPE, embd_pdrop=0.0, attn_pdrop=0.0, resid_pdrop=0.0)
    ref = RefGPT(rc, version=version)
    ref.eval()
    cfg = GPTConfig(**SHAPE)
    params = gpt_params_from_state_dict(ref_gpt_to_hf(ref), cfg)
    model = GPTLMHeadModel(cfg, version=version, params=params)
    return ref, model, cfg


@pytest.fixture(scope="module")
def gpt2_pair():
    return make_pair("gpt2")


def _inputs(bsz=2, seq=7, left_pad_row=1, pad_n=3, seed=0):
    g = torch.Generator().manual_seed(seed)
    ids = torch.randint(0, SHAPE["vocab_size"], (bsz, seq), generator=g)
    mask = torch.ones(bsz, seq, dtype=torch.long)
    if left_pad_row is not None:
        mask[left_pad_row, :pad_n] = 0
    return ids, mask


class TestForward:
    def test_gpt2_forward_matches_reference(self, gpt2_pair):
        ref, model, cfg = gpt2_pair
        ids, mask = _inputs()
        with torch.no_grad():
            (ref_logits, _), _ = ref(ids, attention_mask=mask)
        (logits, _), _ = model(jnp.asarray(ids.numpy()), jnp.asarray(mask.numpy()))
        np.testing.assert_allclose(np.asarray(logits), ref_logits.numpy(),
                                   rtol=1e-3, atol=1e-4)

    def test_gpt1_postln_forward_matches_reference(self):
        ref, model, cfg = make_pair("gpt")
        ids, mask = _inputs()
        with torch.no_grad():
            (ref_logits, _), _ = ref(ids, attention_mask=mask)
        (logits, _), _ = model(jnp.asarray(ids.numpy()), jnp.asarray(mask.numpy()))
        np.testing.assert_allclose(np.asarray(logits), ref_logits.numpy(),
                                   rtol=1e-3, atol=1e-4)

    def test_position_ids_and_segments(self, gpt2_pair):
        ref, model, cfg = gpt2_pair
        ids, mask = _inputs(left_pad_row=None)
        pos = torch.arange(7).repeat(2, 1)
        seg = torch.randint(0, SHAPE["vocab_size"], (2, 7))
        with torch.no_grad():
            (ref_logits, _), _ = ref(ids, attention_mask=mask, position_ids=pos,
                                     segment_ids=seg)
        (logits, _), _ = model(jnp.asarray(ids.numpy()), jnp.asarray(mask.numpy()),
                               segment_ids=jnp.asarray(seg.numpy()),
                               position_ids=jnp.asarray(pos.numpy()))
        np.testing.assert_allclose(np.asarray(logits), ref_logits.numpy(),
                                   rtol=1e-3, atol=1e-4)


class TestGreedyDecode:
    def test_bit_exact_greedy_with_cache_and_padding(self, gpt2_pair):
        """North-star gate: bit-identical greedy tokens vs the reference with
        KV-cache and a left-padded batch (BASELINE config 1)."""
        ref, model, cfg = gpt2_pair
        ids, mask = _inputs()
        gen = {"beam_size": 1, "max_gen_len": 20, "end_ids": None, "pad_id": 0,
               "no_repeat_ngram_size": 0, "do_sample": False}
        with torch.no_grad():
            expected = ref.generate(ids, attention_mask=mask, generation_configs=gen)
        got = model.generate(jnp.asarray(ids.numpy()), jnp.asarray(mask.numpy()),
                             generation_configs=gen)
        assert expected.shape == tuple(got.shape)
        assert (expected.numpy() == np.asarray(got)).all()

    def test_gpt1_postln_bit_exact_greedy(self):
        ref, model, cfg = make_pair("gpt")
        ids, mask = _inputs()
        gen = {"beam_size": 1, "max_gen_len": 12, "end_ids": None, "pad_id": 0,
               "no_repeat_ngram_size": 0, "do_sample": False}
        with torch.no_grad():
            expected = ref.generate(ids, attention_mask=mask, generation_configs=gen)
        got = model.generate(jnp.asarray(ids.numpy()), jnp.asarray(mask.numpy()),
                             generation_configs=gen)
        assert (expected.numpy() == np.asarray(got)).all()

    def test_bit_exact_with_ngram_and_end_ids(self, gpt2_pair):
        ref, model, cfg = gpt2_pair
        ids, mask = _inputs()
        gen = {"beam_size": 1, "max_gen_len": 25, "end_ids": [5], "pad_id": 0,
               "no_repeat_ngram_size": 2, "do_sample": False}
        with torch.no_grad():
            expected = ref.generate(ids, attention_mask=mask, generation_configs=gen)
        got = model.generate(jnp.asarray(ids.numpy()), jnp.asarray(mask.numpy()),
                             generation_configs=gen)
        assert (expected.numpy() == np.asarray(got)).all()


class TestExplicitPositionSegmentDecode:
    def test_greedy_with_user_position_and_segment_ids(self, gpt2_pair):
        """User-supplied position_ids/segment_ids must be extended every
        decode step (max+1 / repeat-last, generation_util.py:98-99)."""
        ref, model, cfg = gpt2_pair
        ids, mask = _inputs(left_pad_row=None)
        pos = torch.arange(2, 9).repeat(2, 1)  # offset positions
        seg = torch.full((2, 7), 3, dtype=torch.long)
        gen = {"beam_size": 1, "max_gen_len": 10, "end_ids": None, "pad_id": 0,
               "no_repeat_ngram_size": 0, "do_sample": False}
        with torch.no_grad():
            expected = ref.generate(ids, attention_mask=mask, position_ids=pos,
                                    segment_ids=seg, generation_configs=gen)
        got = model.generate(jnp.asarray(ids.numpy()), jnp.asarray(mask.numpy()),
                             position_ids=jnp.asarray(pos.numpy()),
                             segment_ids=jnp.asarray(seg.numpy()),
                             generation_configs=gen)
        assert (expected.numpy() == np.asarray(got)).all()

    def test_beam_with_user_position_ids(self, gpt2_pair):
        """Beam extends positions last+1 (generation_util.py:255)."""
        ref, model, cfg = gpt2_pair
        ids, mask = _inputs(left_pad_row=None)
        pos = torch.arange(1, 8).repeat(2, 1)
        gen = {"beam_size": 3, "max_gen_len": 8, "end_ids": 5, "pad_id": 0,
               "no_repeat_ngram_size": 0, "do_sample": False, "early_stop": True}
        with torch.no_grad():
            expected = ref.generate(ids, attention_mask=mask, position_ids=pos,
                                    generation_configs=gen)
        got = model.generate(jnp.asarray(ids.numpy()), jnp.asarray(mask.numpy()),
                             position_ids=jnp.asarray(pos.numpy()),
                             generation_configs=gen)
        assert (expected.numpy() == np.asarray(got)).all()


def test_cached_equals_uncached_forward(gpt2_pair):
    """Prefill+decode through the fixed-shape cache must equal one uncached
    forward over the same tokens."""
    ref, model, cfg = gpt2_pair
    ids, mask = _inputs(left_pad_row=None)
    ids_j, mask_j = jnp.asarray(ids.numpy()), jnp.asarray(mask.numpy())
    (full_logits, _), _ = model(ids_j, mask_j)

    T = 16
    cache = model.init_cache(2, T)
    mask_buf = jnp.zeros((2, T), jnp.int32).at[:, :7].set(mask_j.astype(jnp.int32))
    (pre_logits, _), cache = gpt_lm_forward(model.params, cfg, ids_j[:, :5],
                                            mask_buf, cache=cache, version="gpt2")
    np.testing.assert_allclose(np.asarray(pre_logits), np.asarray(full_logits[:, :5]),
                               rtol=1e-4, atol=1e-5)
    for t in range(5, 7):
        (step_logits, _), cache = gpt_lm_forward(model.params, cfg, ids_j[:, t:t + 1],
                                                 mask_buf, cache=cache, version="gpt2")
        np.testing.assert_allclose(np.asarray(step_logits[:, 0]),
                                   np.asarray(full_logits[:, t]),
                                   rtol=1e-4, atol=1e-5)
