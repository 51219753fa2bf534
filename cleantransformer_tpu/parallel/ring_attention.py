"""Ring attention: sequence/context parallelism over the ICI ring.

The reference has NO sequence parallelism — context is config-bounded and
attention materializes (s, s) everywhere (SURVEY §5 long-context). This
extension shards the SEQUENCE over a mesh axis: each device holds a
contiguous chunk of queries/keys/values; K/V chunks rotate around the ring
(one ``ppermute`` hop per step, P steps total) while each device folds the
visiting chunk into a running online-softmax accumulator. Peak memory per
device is O(S_local * S_local) scores and O(S/P) activations — context
length scales linearly with the ring size.

Built from scan + ppermute inside shard_map, so jax.grad differentiates
through it (the backward is the reverse ring). Exact softmax — same
numerics as dense attention up to accumulation order.
"""

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

import numpy as np


def make_seq_mesh(num_devices=None, devices=None):
    devices = devices if devices is not None else jax.devices()
    n = num_devices or len(devices)
    return Mesh(np.asarray(devices[:n]), ("seq",))


def _ring_attention_local(q, k, v, bias, axis_name, causal, scale):
    """Per-device body. q,k,v: (B, H, S_local, hd) local chunks;
    bias: (B, H, S_local) additive per-key bias chunk (rotates with k/v)."""
    P_ring = jax.lax.axis_size(axis_name)
    my = jax.lax.axis_index(axis_name)
    B, H, S, hd = q.shape

    q32 = q.astype(jnp.float32)
    row_local = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
    col_local = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)

    def step(carry, i):
        acc, m, l, k_cur, v_cur, b_cur = carry
        # the chunk visiting at step i originated on device (my - i) mod P
        src = (my - i) % P_ring
        s = jnp.einsum("bhqd,bhkd->bhqk", q32, k_cur.astype(jnp.float32))
        if scale != 1.0:
            s = s * scale
        s = s + b_cur.astype(jnp.float32)[:, :, None, :]
        if causal:
            q_pos = my * S + row_local
            k_pos = src * S + col_local
            s = jnp.where((k_pos <= q_pos)[None, None], s, -jnp.inf)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        safe_m = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
        p = jnp.where(jnp.isfinite(s), jnp.exp(s - safe_m), 0.0)
        corr = jnp.where(jnp.isfinite(m), jnp.exp(m - safe_m), 0.0)
        l_new = l * corr + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * corr + jnp.einsum(
            "bhqk,bhkd->bhqd", p, v_cur.astype(jnp.float32))
        # rotate K/V/bias one hop around the ring
        perm = [(d, (d + 1) % P_ring) for d in range(P_ring)]
        k_next = jax.lax.ppermute(k_cur, axis_name, perm)
        v_next = jax.lax.ppermute(v_cur, axis_name, perm)
        b_next = jax.lax.ppermute(b_cur, axis_name, perm)
        return (acc_new, m_new, l_new, k_next, v_next, b_next), None

    acc0 = jnp.zeros((B, H, S, hd), jnp.float32)
    m0 = jnp.full((B, H, S, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((B, H, S, 1), jnp.float32)
    (acc, m, l, _, _, _), _ = jax.lax.scan(
        step, (acc0, m0, l0, k, v, bias), jnp.arange(P_ring))
    return (acc / jnp.maximum(l, 1e-30)).astype(q.dtype)


def ring_attention(q, k, v, bias=None, mesh=None, causal=True, scale=1.0,
                   axis_name="seq"):
    """Sequence-parallel attention. q,k,v: (B, H, S, hd) global arrays with S
    divisible by the ring size; bias: (B, H, S) additive per-key (or None).
    Returns (B, H, S, hd)."""
    mesh = mesh or make_seq_mesh()
    if bias is None:
        bias = jnp.zeros((q.shape[0], q.shape[1], q.shape[2]), jnp.float32)
    from cleantransformer_tpu.parallel.mesh import compat_shard_map
    fn = compat_shard_map(
        functools.partial(_ring_attention_local, axis_name=axis_name,
                          causal=causal, scale=scale),
        mesh=mesh,
        in_specs=(P(None, None, axis_name, None), P(None, None, axis_name, None),
                  P(None, None, axis_name, None), P(None, None, axis_name)),
        out_specs=P(None, None, axis_name, None))
    return fn(q, k, v, bias)
