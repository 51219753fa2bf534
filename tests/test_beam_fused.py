"""Fused (fully-jitted) beam search vs the reference and the host-loop path."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from cleantransformer_tpu.config import GPTConfig
from cleantransformer_tpu.models.gpt import GPTLMHeadModel
from cleantransformer_tpu.utils.hf_loader import gpt_params_from_state_dict
from ref_adapters import ref_gpt_to_hf

SHAPE = dict(vocab_size=97, n_embd=32, n_positions=128, n_layer=2, n_head=4, n_ctx=128)


pytestmark = pytest.mark.slow  # full tier; fast tier: -m 'not slow'

@pytest.fixture(scope="module")
def pair():
    from CleanTransformer.models.modeling_gpt import GPTLMHeadModel as RefGPT, GPTConfig as RefCfg
    torch.manual_seed(11)
    rc = RefCfg(**SHAPE, embd_pdrop=0.0, attn_pdrop=0.0, resid_pdrop=0.0)
    ref = RefGPT(rc, version="gpt2")
    ref.eval()
    cfg = GPTConfig(**SHAPE)
    model = GPTLMHeadModel(cfg, version="gpt2",
                           params=gpt_params_from_state_dict(ref_gpt_to_hf(ref), cfg))
    return ref, model


def _inputs(seed=0):
    g = torch.Generator().manual_seed(seed)
    ids = torch.randint(0, 97, (2, 6), generator=g)
    mask = torch.ones(2, 6, dtype=torch.long)
    mask[0, :2] = 0
    return ids, mask


# note: end_ids=None beam search crashes the reference itself
# (generation_util.py:141 iterates end_ids_tensor unconditionally), so only
# end-id configurations are parity-testable.
@pytest.mark.parametrize("early_stop,end_id,ngram", [
    (True, 7, 0),
    (False, 7, 0),
    (True, 7, 2),      # ngram ban active inside the beam loop
])
def test_fused_beam_bit_exact_vs_reference(pair, early_stop, end_id, ngram):
    ref, model = pair
    ids, mask = _inputs()
    gen = {"beam_size": 3, "max_gen_len": 12, "end_ids": end_id, "pad_id": 0,
           "do_sample": False, "early_stop": early_stop,
           "no_repeat_ngram_size": ngram}
    with torch.no_grad():
        expected = ref.generate(ids, attention_mask=mask, generation_configs=gen)
    got = model.generate(jnp.asarray(ids.numpy()), jnp.asarray(mask.numpy()),
                         generation_configs=gen)
    assert expected.shape == tuple(got.shape)
    assert (expected.numpy() == np.asarray(got)).all()


def test_end_token_in_top_beam_candidates(pair):
    """When an end token lands among the first `beam` candidates, the
    reference leaves trailing beam slots at token/index/prob 0
    (generation_util.py:140 scans only range(beam)); reproduce bit-exactly."""
    ref, model = pair
    ids, mask = _inputs(seed=9)
    # choose the model's own argmax continuation as the end id so it is
    # guaranteed to appear in the top candidates
    with torch.no_grad():
        (logits, _), _ = ref(ids, attention_mask=mask)
    end_id = int(logits[0, -1].argmax())
    gen = {"beam_size": 3, "max_gen_len": 10, "end_ids": end_id, "pad_id": 0,
           "do_sample": False, "early_stop": True, "no_repeat_ngram_size": 0}
    with torch.no_grad():
        expected = ref.generate(ids, attention_mask=mask, generation_configs=gen)
    got = model.generate(jnp.asarray(ids.numpy()), jnp.asarray(mask.numpy()),
                         generation_configs=gen)
    assert (expected.numpy() == np.asarray(got)).all()
    # host-loop path must agree too
    host = model.generate(jnp.asarray(ids.numpy()), jnp.asarray(mask.numpy()),
                          generation_configs=gen, steamers=lambda t: False)
    assert (expected.numpy() == np.asarray(host)).all()


def test_fused_matches_host_loop(pair):
    """The streamer path (host loop) and the fused path must agree."""
    _, model = pair
    ids, mask = _inputs(seed=3)
    gen = {"beam_size": 3, "max_gen_len": 10, "end_ids": 7, "pad_id": 0,
           "do_sample": False, "early_stop": True, "no_repeat_ngram_size": 0}
    fused = model.generate(jnp.asarray(ids.numpy()), jnp.asarray(mask.numpy()),
                           generation_configs=gen)
    calls = []
    host = model.generate(jnp.asarray(ids.numpy()), jnp.asarray(mask.numpy()),
                          generation_configs=gen,
                          steamers=lambda t: calls.append(1) and False)
    assert len(calls) > 0
    assert (np.asarray(fused) == np.asarray(host)).all()


def test_fused_beam_sampling_shape_and_validity(pair):
    _, model = pair
    ids, mask = _inputs(seed=4)
    gen = {"beam_size": 3, "max_gen_len": 8, "end_ids": 7, "pad_id": 0,
           "do_sample": True, "temperature": 0.8, "top_k": 20, "top_p": 0.9,
           "early_stop": True, "no_repeat_ngram_size": 2}
    out = np.asarray(model.generate(jnp.asarray(ids.numpy()),
                                    jnp.asarray(mask.numpy()),
                                    generation_configs=gen))
    assert out.shape[:2] == (2, 3)
    assert (out >= 0).all() and (out < 97).all()


def test_top_k_small_matches_lax_top_k():
    """_top_k_small (k iterated argmax+mask reductions — replaces
    lax.top_k's sort over beam*V lanes, the dominant beam-step cost) must
    be BIT-identical to lax.top_k, including tie order (both break ties to
    the lowest index)."""
    import jax
    from cleantransformer_tpu.generation.beam_fused import _top_k_small
    rs = np.random.RandomState(0)
    x = rs.randn(3, 1000).astype(np.float32)
    x[:, 100] = x[:, 50]   # exact ties across distant indices
    x[1, 200] = -np.inf    # and non-finite entries
    x = jnp.asarray(x)
    v0, i0 = jax.lax.top_k(x, 6)
    v1, i1 = _top_k_small(x, 6)
    np.testing.assert_array_equal(np.asarray(v0), np.asarray(v1))
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
