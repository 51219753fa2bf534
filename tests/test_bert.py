"""BERT parity vs the PyTorch reference."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from cleantransformer_tpu.config import BertConfig
from cleantransformer_tpu.models.bert import BertForSequenceClassification, BertModel
from cleantransformer_tpu.utils.hf_loader import bert_params_from_state_dict
from ref_adapters import ref_bert_to_hf

SHAPE = dict(vocab_size=99, hidden_size=32, num_hidden_layers=2,
             num_attention_heads=4, intermediate_size=64)


@pytest.fixture(scope="module")
def pair():
    from CleanTransformer.models.modeling_bert import BertForSequenceClassification as RefBert, BertConfig as RefCfg
    torch.manual_seed(7)
    rc = RefCfg(**SHAPE, hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
                num_labels=5)
    ref = RefBert(rc)
    ref.eval()
    cfg = BertConfig(**SHAPE, num_labels=5)
    params = bert_params_from_state_dict(ref_bert_to_hf(ref), cfg)
    return ref, BertForSequenceClassification(cfg, params=params), cfg


def _inputs(seed=0):
    g = torch.Generator().manual_seed(seed)
    ids = torch.randint(0, SHAPE["vocab_size"], (2, 9), generator=g)
    mask = torch.ones(2, 9, dtype=torch.float)
    mask[1, 7:] = 0
    seg = torch.zeros(2, 9, dtype=torch.long)
    seg[:, 5:] = 1
    return ids, mask, seg


def test_classification_matches_reference(pair):
    ref, model, _ = pair
    ids, mask, seg = _inputs()
    with torch.no_grad():
        expected = ref(input_ids=ids, attention_mask=mask, segment_ids=seg)
    got = model(jnp.asarray(ids.numpy()), jnp.asarray(mask.numpy()),
                jnp.asarray(seg.numpy()))
    np.testing.assert_allclose(np.asarray(got), expected.numpy(),
                               rtol=1e-3, atol=1e-4)
    assert (np.asarray(got).argmax(-1) == expected.numpy().argmax(-1)).all()


def test_hidden_and_pooled_match_reference(pair):
    ref, model, cfg = pair
    ids, mask, seg = _inputs(seed=1)
    with torch.no_grad():
        exp_hidden, exp_pooled = ref.bert(ids, mask, seg, None)
    bert = BertModel(cfg, params=model.params)
    hidden, pooled = bert(jnp.asarray(ids.numpy()), jnp.asarray(mask.numpy()),
                          jnp.asarray(seg.numpy()))
    np.testing.assert_allclose(np.asarray(hidden), exp_hidden.numpy(),
                               rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(np.asarray(pooled), exp_pooled.numpy(),
                               rtol=1e-3, atol=1e-4)
