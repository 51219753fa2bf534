"""Ring attention (sequence parallelism) vs dense attention."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cleantransformer_tpu.ops.pallas_kernels import _dense_reference
from cleantransformer_tpu.parallel.ring_attention import (
    ring_attention, make_seq_mesh)

pytestmark = pytest.mark.skipif(jax.device_count() < 4,
                                reason="needs 4 virtual devices")


def _qkv(B=2, H=2, S=64, hd=16, seed=0):
    rs = np.random.RandomState(seed)
    return (jnp.asarray(rs.randn(B, H, S, hd).astype(np.float32)),
            jnp.asarray(rs.randn(B, H, S, hd).astype(np.float32)),
            jnp.asarray(rs.randn(B, H, S, hd).astype(np.float32)))


@pytest.mark.parametrize("causal", [True, False])
def test_matches_dense(causal):
    q, k, v = _qkv()
    mesh = make_seq_mesh(4)
    out = ring_attention(q, k, v, mesh=mesh, causal=causal, scale=0.25)
    ref = _dense_reference(q, k, v, jnp.zeros((2, 2, 64)), 0.25, causal)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_with_bias_and_padding():
    q, k, v = _qkv(seed=1)
    bias = jnp.asarray(np.random.RandomState(2).randn(2, 2, 64).astype(np.float32))
    bias = bias.at[:, :, :5].set(-jnp.inf)  # padded keys
    mesh = make_seq_mesh(4)
    out = ring_attention(q, k, v, bias=bias, mesh=mesh, causal=True, scale=0.25)
    ref = np.asarray(_dense_reference(q, k, v, bias, 0.25, True))
    got = np.asarray(out)
    finite = np.isfinite(ref)
    assert np.isfinite(got).all()
    np.testing.assert_allclose(got[finite], ref[finite], rtol=1e-4, atol=1e-5)


def test_gradients_flow_through_ring():
    q, k, v = _qkv(S=32, seed=3)
    mesh = make_seq_mesh(4)

    def loss(q, k, v):
        return jnp.sum(ring_attention(q, k, v, mesh=mesh, causal=True,
                                      scale=0.25) ** 2)

    def ref_loss(q, k, v):
        return jnp.sum(_dense_reference(q, k, v, jnp.zeros((2, 2, 32)),
                                        0.25, True) ** 2)

    g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
    rg = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g, rg):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)
