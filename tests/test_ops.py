"""Parity tests for core numerics vs the PyTorch reference (executed as oracle)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from cleantransformer_tpu.ops import (
    layer_norm, gelu, gelu_new, bloom_gelu, relu,
    mse_loss, cross_entropy_loss, log_softmax, nll_loss,
    multi_head_attention, dense_attention,
)


def t2n(t):
    return t.detach().cpu().numpy()


class TestLayerNorm:
    def test_matches_reference_1d(self):
        from CleanTransformer.transformer import LayerNorm as RefLN
        torch.manual_seed(999)
        x = torch.rand((3, 4, 6))
        ref = RefLN(6)
        with torch.no_grad():
            expected = t2n(ref(x))
        got = layer_norm(jnp.asarray(t2n(x)), jnp.ones(6), jnp.zeros(6), eps=1e-5)
        np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-5, atol=1e-6)

    def test_matches_reference_2d_normalized_shape(self):
        from CleanTransformer.transformer import LayerNorm as RefLN
        torch.manual_seed(999)
        x = torch.rand((3, 4, 6))
        ref = RefLN([4, 6])
        with torch.no_grad():
            ref.weight.copy_(torch.rand(4, 6))
            ref.bias.copy_(torch.rand(4, 6))
            expected = t2n(ref(x))
        got = layer_norm(jnp.asarray(t2n(x)), jnp.asarray(t2n(ref.weight)),
                         jnp.asarray(t2n(ref.bias)), eps=1e-5)
        np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-4, atol=1e-5)

    def test_fast_path_close_to_exact(self):
        x = jnp.asarray(np.random.RandomState(0).randn(2, 5, 8).astype(np.float32))
        w, b = jnp.ones(8), jnp.zeros(8)
        exact = layer_norm(x, w, b, exact_reference=True)
        fast = layer_norm(x, w, b, exact_reference=False)
        np.testing.assert_allclose(np.asarray(exact), np.asarray(fast), rtol=1e-5, atol=1e-6)


class TestActivations:
    @pytest.mark.parametrize("name", ["gelu_new", "bloom_gelu", "gelu", "relu"])
    def test_matches_reference(self, name):
        torch.manual_seed(0)
        x = torch.randn(4, 7)
        if name == "gelu_new":
            from CleanTransformer.models.modeling_gpt import NewGELUActivation
            expected = t2n(NewGELUActivation()(x))
            got = gelu_new(jnp.asarray(t2n(x)))
        elif name == "bloom_gelu":
            from CleanTransformer.models.modeling_bloom import bloom_gelu_forward
            expected = t2n(bloom_gelu_forward(x))
            got = bloom_gelu(jnp.asarray(t2n(x)))
        elif name == "gelu":
            expected = t2n(torch.nn.GELU()(x))
            got = gelu(jnp.asarray(t2n(x)))
        else:
            expected = t2n(torch.nn.ReLU()(x))
            got = relu(jnp.asarray(t2n(x)))
        # XLA and torch use different fp32 tanh/erf polynomial approximations;
        # ~1e-5 absolute disagreement is intrinsic.
        np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-3, atol=1e-4)

    def test_bloom_gelu_gradient_matches_handwritten_backward(self):
        """JAX autodiff of bloom_gelu must equal the reference's hand-written
        backward (modeling_bloom.py:348-363)."""
        from CleanTransformer.models.modeling_bloom import bloom_gelu_back
        import jax
        x = torch.randn(5, 3, dtype=torch.float64)
        g = torch.randn(5, 3, dtype=torch.float64)
        expected = t2n(bloom_gelu_back(g, (x,)))
        _, vjp = jax.vjp(bloom_gelu, jnp.asarray(t2n(x)))
        got = vjp(jnp.asarray(t2n(g)))[0]
        # ours runs in fp32 (x64 disabled) vs the torch fp64 oracle
        np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-5, atol=1e-6)


class TestLosses:
    def setup_method(self, method):
        from CleanTransformer.loss import (MSELoss, CrossEntropyLoss, NLLLoss, LogSoftmax)
        self.ref = dict(mse=MSELoss, ce=CrossEntropyLoss, nll=NLLLoss, ls=LogSoftmax)

    @pytest.mark.parametrize("reduction", ["mean", "sum"])
    def test_mse(self, reduction):
        torch.manual_seed(999)
        pred, gt = torch.rand(3, 4), torch.rand(3, 4)
        expected = t2n(self.ref["mse"](reduction=reduction)(pred, gt))
        got = mse_loss(jnp.asarray(t2n(pred)), jnp.asarray(t2n(gt)), reduction=reduction)
        np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-6)

    @pytest.mark.parametrize("reduction", ["mean", "sum"])
    def test_cross_entropy_index_targets(self, reduction):
        torch.manual_seed(999)
        pred = torch.rand(3, 4)
        gt = torch.randint(0, 4, (3,))
        expected = t2n(self.ref["ce"](reduction=reduction)(pred, gt))
        got = cross_entropy_loss(jnp.asarray(t2n(pred)), jnp.asarray(t2n(gt)),
                                 reduction=reduction)
        np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-5)

    @pytest.mark.parametrize("reduction", ["mean", "sum"])
    def test_cross_entropy_soft_targets(self, reduction):
        torch.manual_seed(999)
        pred, gt = torch.rand(3, 4), torch.rand(3, 4)
        expected = t2n(self.ref["ce"](reduction=reduction)(pred, gt))
        got = cross_entropy_loss(jnp.asarray(t2n(pred)), jnp.asarray(t2n(gt)),
                                 reduction=reduction)
        np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-5)

    def test_cross_entropy_ignore_index(self):
        torch.manual_seed(0)
        pred = torch.randn(6, 5)
        gt = torch.tensor([0, 1, -100, 3, -100, 2])
        expected = t2n(torch.nn.CrossEntropyLoss(ignore_index=-100)(pred, gt))
        got = cross_entropy_loss(jnp.asarray(t2n(pred)), jnp.asarray(t2n(gt)),
                                 ignore_index=-100)
        np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-5)

    @pytest.mark.parametrize("reduction", ["mean", "sum"])
    def test_nll(self, reduction):
        torch.manual_seed(999)
        pred = torch.rand(3, 4)
        gt = torch.randint(0, 4, (3,))
        expected = t2n(self.ref["nll"](reduction=reduction)(pred, gt))
        got = nll_loss(jnp.asarray(t2n(pred)), jnp.asarray(t2n(gt)), reduction=reduction)
        np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-5)

    def test_log_softmax(self):
        torch.manual_seed(999)
        x = torch.rand(3, 4)
        expected = t2n(self.ref["ls"](dim=1)(x))
        got = log_softmax(jnp.asarray(t2n(x)), axis=1, reference_eps=True)
        np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-4, atol=1e-6)
        expected_official = t2n(torch.nn.LogSoftmax(dim=1)(x))
        got_official = log_softmax(jnp.asarray(t2n(x)), axis=1)
        np.testing.assert_allclose(np.asarray(got_official), expected_official, rtol=1e-6)


class TestAttention:
    def test_vanilla_attention_matches_reference(self):
        from CleanTransformer.transformer import AttentionLayer as RefAttn

        class Cfg:
            hidden_size = 12
            num_attention_heads = 3
            attention_probs_dropout_prob = 0.0

        torch.manual_seed(999)
        ref = RefAttn(Cfg())
        ref.eval()
        x = torch.rand(2, 5, 12)
        mask = torch.zeros(2, 1, 1, 5)
        mask[:, :, :, -1] = -10000.0
        with torch.no_grad():
            expected = t2n(ref(x, attention_mask=mask))

        params = {
            name: {"w": jnp.asarray(t2n(getattr(ref, f"{name}_linear").weight).T),
                   "b": jnp.asarray(t2n(getattr(ref, f"{name}_linear").bias))}
            for name in ("q", "k", "v")
        }
        got = multi_head_attention(params, jnp.asarray(t2n(x)), num_heads=3,
                                   attention_mask=jnp.asarray(t2n(mask)))
        np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-5, atol=1e-6)

    def test_dense_attention_bool_mask_and_bias(self):
        rs = np.random.RandomState(1)
        q = jnp.asarray(rs.randn(1, 2, 3, 4).astype(np.float32))
        k = jnp.asarray(rs.randn(1, 2, 3, 4).astype(np.float32))
        v = jnp.asarray(rs.randn(1, 2, 3, 4).astype(np.float32))
        causal = ~np.tril(np.ones((3, 3), dtype=bool))
        out = dense_attention(q, k, v, bool_mask=jnp.asarray(causal)[None, None],
                              scale=0.5)
        tq, tk, tv = (torch.tensor(np.asarray(a)) for a in (q, k, v))
        scores = (tq @ tk.transpose(-1, -2)) * 0.5
        scores = scores.masked_fill(torch.tensor(causal)[None, None], torch.finfo(torch.float32).min)
        expected = t2n(torch.softmax(scores, dim=-1) @ tv)
        np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5, atol=1e-6)
