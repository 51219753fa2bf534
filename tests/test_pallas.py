"""Pallas kernels vs their dense formulations (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cleantransformer_tpu.ops.pallas_kernels import (
    flash_attention, flash_attention_bsd, fused_layer_norm, _dense_reference,
)
from cleantransformer_tpu.ops.layers import layer_norm


def _qkv(B=2, H=2, Sq=128, Sk=128, hd=32, seed=0):
    rs = np.random.RandomState(seed)
    q = jnp.asarray(rs.randn(B, H, Sq, hd).astype(np.float32))
    k = jnp.asarray(rs.randn(B, H, Sk, hd).astype(np.float32))
    v = jnp.asarray(rs.randn(B, H, Sk, hd).astype(np.float32))
    return q, k, v


class TestFlashAttention:
    @pytest.mark.parametrize("causal", [True, False])
    def test_matches_dense(self, causal):
        q, k, v = _qkv()
        bias = jnp.zeros((2, 2, 128))
        out = flash_attention(q, k, v, bias, scale=0.125, causal=causal,
                              block_q=64, block_k=64, interpret=True)
        ref = _dense_reference(q, k, v, bias, 0.125, causal)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)

    def test_with_alibi_and_padding_bias(self):
        from cleantransformer_tpu.models.bloom import build_alibi_bias
        q, k, v = _qkv(B=2, H=4, Sq=64, Sk=64, hd=16, seed=1)
        mask = np.ones((2, 64), np.int32)
        mask[0, :10] = 0  # left padding
        alibi = build_alibi_bias(jnp.asarray(mask), 4)[:, :, 0, :]  # (B,H,Sk)
        pad = jnp.where(jnp.asarray(mask) == 0, -jnp.inf, 0.0)[:, None, :]
        bias = alibi + pad
        out = flash_attention(q, k, v, bias, scale=0.25, causal=True,
                              block_q=32, block_k=32, interpret=True)
        ref = np.asarray(_dense_reference(q, k, v, bias, 0.25, True))
        # dense softmax NaNs on fully-masked rows (causal query inside the
        # left padding); flash guards them to 0 — compare finite rows only
        out = np.asarray(out)
        assert np.isfinite(out).all()
        finite = np.isfinite(ref)
        np.testing.assert_allclose(out[finite], ref[finite],
                                   rtol=1e-4, atol=1e-5)

    def test_fully_masked_rows_are_finite(self):
        """A row whose every key is masked must not produce NaNs."""
        q, k, v = _qkv(B=1, H=1, Sq=32, Sk=32, hd=16, seed=2)
        bias = jnp.full((1, 1, 32), -jnp.inf)
        out = flash_attention(q, k, v, bias, causal=False,
                              block_q=32, block_k=32, interpret=True)
        assert np.isfinite(np.asarray(out)).all()

    def test_gradient_flows(self):
        q, k, v = _qkv(B=1, H=2, Sq=32, Sk=32, hd=16, seed=3)
        bias = jnp.zeros((1, 2, 32))

        def loss(q, k, v):
            return jnp.sum(flash_attention(q, k, v, bias, scale=0.25,
                                           causal=True, block_q=32,
                                           block_k=32, interpret=True) ** 2)

        g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        ref_g = jax.grad(lambda q, k, v: jnp.sum(_dense_reference(
            q, k, v, bias, 0.25, True) ** 2), argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g, ref_g):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-5)

    def test_q_offset_scalar_matches_dense(self):
        """Nonzero cache offset (speculative verify / chunked prefill): a
        5-token query window against a 96-slot key buffer, offset 40."""
        q, k, v = _qkv(B=2, H=2, Sq=8, Sk=96, hd=32, seed=10)
        # keys past offset+Sq are "unwritten cache" — causal must exclude them
        bias = jnp.zeros((2, 2, 96))
        off = jnp.asarray(40, jnp.int32)
        out = flash_attention(q, k, v, bias, off, scale=0.25, causal=True,
                              block_q=8, block_k=32, interpret=True)
        ref = _dense_reference(q, k, v, bias, 0.25, True, q_offset=off)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)

    def test_q_offset_traced_under_jit(self):
        """q_offset as a traced scalar inside jit (one compile serves every
        offset — the speculative while_loop requirement)."""
        q, k, v = _qkv(B=1, H=2, Sq=8, Sk=64, hd=16, seed=11)
        bias = jnp.zeros((1, 2, 64))

        @jax.jit
        def run(off):
            return flash_attention(q, k, v, bias, off, scale=0.3, causal=True,
                                   block_q=8, block_k=32, interpret=True)

        for off in (0, 17, 56):
            ref = _dense_reference(q, k, v, bias, 0.3, True, q_offset=off)
            np.testing.assert_allclose(np.asarray(run(jnp.asarray(off))),
                                       np.asarray(ref), rtol=1e-4, atol=1e-5,
                                       err_msg=f"offset={off}")

    def test_q_offset_per_row_vector(self):
        """Per-batch-row offsets (ragged serving batches)."""
        q, k, v = _qkv(B=3, H=2, Sq=8, Sk=64, hd=16, seed=12)
        bias = jnp.zeros((3, 2, 64))
        off = jnp.asarray([0, 13, 50], jnp.int32)
        out = flash_attention(q, k, v, bias, off, causal=True,
                              block_q=8, block_k=32, interpret=True)
        ref = _dense_reference(q, k, v, bias, 1.0, True, q_offset=off)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)

    def test_q_offset_grads_match_dense(self):
        q, k, v = _qkv(B=1, H=2, Sq=16, Sk=64, hd=16, seed=13)
        bias = jnp.asarray(
            np.random.RandomState(14).randn(1, 1, 64).astype(np.float32))
        off = jnp.asarray(24, jnp.int32)

        def loss(q, k, v, bias):
            return jnp.sum(flash_attention(q, k, v, bias, off, scale=0.2,
                                           causal=True, block_q=16,
                                           block_k=32, interpret=True) ** 2)

        def ref_loss(q, k, v, bias):
            return jnp.sum(_dense_reference(
                q, k, v, jnp.broadcast_to(bias, (1, 2, 64)), 0.2, True,
                q_offset=off) ** 2)

        g = jax.grad(loss, argnums=(0, 1, 2, 3))(q, k, v, bias)
        rg = jax.grad(ref_loss, argnums=(0, 1, 2, 3))(q, k, v, bias)
        for a, b, name in zip(g, rg, "q k v bias".split()):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-4,
                                       err_msg=f"d{name}")

    def test_sliding_window_matches_dense(self):
        """Static window on the causal iota (Mistral SWA): outputs + the
        skipped-key-block loop bounds vs the dense windowed oracle."""
        q, k, v = _qkv(B=2, H=2, Sq=128, Sk=128, hd=32, seed=15)
        bias = jnp.zeros((2, 2, 128))
        for w in (7, 32, 100):
            out = flash_attention(q, k, v, bias, scale=0.2, causal=True,
                                  block_q=32, block_k=32, interpret=True,
                                  window=w)
            ref = _dense_reference(q, k, v, bias, 0.2, True, window=w)
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                       rtol=1e-4, atol=1e-5,
                                       err_msg=f"window={w}")

    def test_sliding_window_with_q_offset(self):
        """Window + nonzero cache offset (SWA chunked prefill / verify)."""
        q, k, v = _qkv(B=2, H=2, Sq=16, Sk=96, hd=32, seed=16)
        bias = jnp.zeros((2, 2, 96))
        off = jnp.asarray(40, jnp.int32)
        out = flash_attention(q, k, v, bias, off, scale=0.25, causal=True,
                              block_q=16, block_k=32, interpret=True,
                              window=10)
        ref = _dense_reference(q, k, v, bias, 0.25, True, q_offset=off,
                               window=10)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)

    def test_sliding_window_grads_match_dense(self):
        q, k, v = _qkv(B=1, H=2, Sq=96, Sk=96, hd=16, seed=17)
        bias = jnp.asarray(
            np.random.RandomState(18).randn(1, 1, 96).astype(np.float32))

        def loss(q, k, v, bias):
            return jnp.sum(flash_attention(q, k, v, bias, scale=0.2,
                                           causal=True, block_q=32,
                                           block_k=32, interpret=True,
                                           window=20) ** 2)

        def ref_loss(q, k, v, bias):
            return jnp.sum(_dense_reference(
                q, k, v, jnp.broadcast_to(bias, (1, 2, 96)), 0.2, True,
                window=20) ** 2)

        g = jax.grad(loss, argnums=(0, 1, 2, 3))(q, k, v, bias)
        rg = jax.grad(ref_loss, argnums=(0, 1, 2, 3))(q, k, v, bias)
        for a, b, name in zip(g, rg, "q k v bias".split()):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-4,
                                       err_msg=f"d{name}")

    def test_uneven_blocks(self):
        q, k, v = _qkv(B=1, H=1, Sq=96, Sk=96, hd=16, seed=4)
        bias = jnp.zeros((1, 1, 96))
        out = flash_attention(q, k, v, bias, causal=True, block_q=32,
                              block_k=32, interpret=True)
        ref = _dense_reference(q, k, v, bias, 1.0, True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-4, atol=1e-5)


class TestFlashBsdSegments:
    """Segment refs in the head-major (B,S,D) kernel: packed rows must stay
    on the no-transpose path (VERDICT r2 item 4). Oracle: the 4D kernel's
    segmented output (itself dense-verified in test_packing)."""

    def _packed(self, B=2, S=96, H=2, hd=64, seed=20):
        rs = np.random.RandomState(seed)
        D = H * hd
        q = jnp.asarray(rs.randn(B, S, D).astype(np.float32))
        k = jnp.asarray(rs.randn(B, S, D).astype(np.float32))
        v = jnp.asarray(rs.randn(B, S, D).astype(np.float32))
        # contiguous segments + trailing pads (0)
        seg = np.zeros((B, S), np.int32)
        seg[0, :40], seg[0, 40:70] = 1, 2
        seg[1, :55], seg[1, 55:90] = 1, 2
        seg = jnp.asarray(seg)
        bias = jnp.where(seg == 0, -jnp.inf, 0.0)[:, None, :]  # pad keys
        return q, k, v, bias, seg, H, hd

    def _to4d(self, x, H, hd):
        B, S, _ = x.shape
        return x.reshape(B, S, H, hd).transpose(0, 2, 1, 3)

    def test_segmented_matches_4d_kernel(self):
        q, k, v, bias, seg, H, hd = self._packed()
        out = flash_attention_bsd(q, k, v, bias, 0, q_segments=seg,
                                  k_segments=seg, n_head=H, scale=0.125,
                                  causal=True, block_q=32, block_k=32,
                                  interpret=True)
        ref4 = flash_attention(self._to4d(q, H, hd), self._to4d(k, H, hd),
                               self._to4d(v, H, hd), bias, 0,
                               q_segments=seg, k_segments=seg, scale=0.125,
                               causal=True, block_q=32, block_k=32,
                               interpret=True)
        B, S, D = q.shape
        ref = ref4.transpose(0, 2, 1, 3).reshape(B, S, D)
        assert np.isfinite(np.asarray(out)).all()
        real = (np.asarray(seg) != 0)[:, :, None]
        np.testing.assert_allclose(np.asarray(out) * real,
                                   np.asarray(ref) * real,
                                   rtol=1e-4, atol=1e-5)

    def test_segmented_grads_match_4d_kernel(self):
        q, k, v, bias, seg, H, hd = self._packed(seed=21)
        B, S, D = q.shape
        real = jnp.asarray((np.asarray(seg) != 0)[:, :, None])

        def loss_bsd(q, k, v):
            o = flash_attention_bsd(q, k, v, bias, 0, q_segments=seg,
                                    k_segments=seg, n_head=H, scale=0.125,
                                    causal=True, block_q=32, block_k=32,
                                    interpret=True)
            return jnp.sum((o * real) ** 2)

        def loss_4d(q, k, v):
            o = flash_attention(self._to4d(q, H, hd), self._to4d(k, H, hd),
                                self._to4d(v, H, hd), bias, 0,
                                q_segments=seg, k_segments=seg, scale=0.125,
                                causal=True, block_q=32, block_k=32,
                                interpret=True)
            o = o.transpose(0, 2, 1, 3).reshape(B, S, D)
            return jnp.sum((o * real) ** 2)

        g = jax.grad(loss_bsd, argnums=(0, 1, 2))(q, k, v)
        rg = jax.grad(loss_4d, argnums=(0, 1, 2))(q, k, v)
        for a, b, name in zip(g, rg, "q k v".split()):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-4, atol=2e-4,
                                       err_msg=f"d{name}")

    def test_unsegmented_path_unchanged(self):
        """No segments -> same result as before the refactor (vs dense)."""
        q, k, v, bias, seg, H, hd = self._packed(seed=22)
        out = flash_attention_bsd(q, k, v, bias, 0, n_head=H, scale=0.125,
                                  causal=True, block_q=32, block_k=32,
                                  interpret=True)
        ref = _dense_reference(self._to4d(q, H, hd), self._to4d(k, H, hd),
                               self._to4d(v, H, hd), bias, 0.125, True)
        B, S, D = q.shape
        ref = ref.transpose(0, 2, 1, 3).reshape(B, S, D)
        got, want = np.asarray(out), np.asarray(ref)
        finite = np.isfinite(want)
        np.testing.assert_allclose(got[finite], want[finite],
                                   rtol=1e-4, atol=1e-5)


class TestBsdGqa:
    """flash_attention_bsd_gqa (GQA-native kv blocks) vs the expansion path."""

    def _mk(self, seed=0, B=2, S=48, H=8, Hkv=2, hd=32):
        rs = np.random.RandomState(seed)
        q = jnp.asarray(rs.randn(B, S, H * hd).astype(np.float32))
        k = jnp.asarray(rs.randn(B, S, Hkv * hd).astype(np.float32))
        v = jnp.asarray(rs.randn(B, S, Hkv * hd).astype(np.float32))
        bias = jnp.asarray(rs.randn(B, 1, S).astype(np.float32)) * 0.1
        return q, k, v, bias, H, Hkv, hd

    def test_matches_expanded(self):
        from cleantransformer_tpu.ops.pallas_kernels import (
            bsd_gqa_supported, flash_attention_bsd_gqa)
        q, k, v, bias, H, Hkv, hd = self._mk()
        assert bsd_gqa_supported(H, Hkv, hd)
        B, S, _ = q.shape
        g = H // Hkv
        got = flash_attention_bsd_gqa(q, k, v, bias, 0, n_head=H,
                                      kv_heads=Hkv, scale=0.2, causal=True,
                                      block_q=16, block_k=16, interpret=True)
        k_e = jnp.repeat(k.reshape(B, S, Hkv, hd), g, axis=2).reshape(
            B, S, H * hd)
        v_e = jnp.repeat(v.reshape(B, S, Hkv, hd), g, axis=2).reshape(
            B, S, H * hd)
        want = flash_attention_bsd(q, k_e, v_e, bias, 0, n_head=H, scale=0.2,
                                   causal=True, block_q=16, block_k=16,
                                   interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

    def test_cache_offset(self):
        from cleantransformer_tpu.ops.pallas_kernels import (
            flash_attention_bsd_gqa)
        # queries at a nonzero cache offset over a longer key buffer
        q, k, v, bias, H, Hkv, hd = self._mk(seed=1)
        B, S, _ = q.shape
        g = H // Hkv
        q8 = q[:, :16]
        got = flash_attention_bsd_gqa(q8, k, v, bias, 13, n_head=H,
                                      kv_heads=Hkv, scale=0.2, causal=True,
                                      block_q=16, block_k=16, interpret=True)
        k_e = jnp.repeat(k.reshape(B, S, Hkv, hd), g, axis=2).reshape(
            B, S, H * hd)
        v_e = jnp.repeat(v.reshape(B, S, Hkv, hd), g, axis=2).reshape(
            B, S, H * hd)
        want = flash_attention_bsd(q8, k_e, v_e, bias, 13, n_head=H,
                                   scale=0.2, causal=True, block_q=16,
                                   block_k=16, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)

    def test_eligibility(self):
        from cleantransformer_tpu.ops.pallas_kernels import bsd_gqa_supported
        assert bsd_gqa_supported(32, 4, 64)      # tinyllama: r=8, ppg=2
        assert not bsd_gqa_supported(8, 8, 64) or (8 // 8) % 2 == 0
        assert not bsd_gqa_supported(6, 4, 64)   # H not a multiple of Hkv


class TestFusedLayerNorm:
    def test_matches_layer_norm(self):
        rs = np.random.RandomState(0)
        x = jnp.asarray(rs.randn(3, 17, 64).astype(np.float32))
        w = jnp.asarray(rs.randn(64).astype(np.float32))
        b = jnp.asarray(rs.randn(64).astype(np.float32))
        out = fused_layer_norm(x, w, b, eps=1e-5, block_rows=16, interpret=True)
        ref = layer_norm(x, w, b, eps=1e-5)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)


class TestFlashBackwardKernels:
    def test_grads_with_broadcast_bias_and_ragged_shapes(self):
        """Pallas dq/dk/dv/dbias kernels vs dense autodiff: ragged lengths
        (padding path), broadcast (B,1,Sk) bias, both causal settings."""
        for causal, (Sq, Sk) in [(True, (96, 96)), (False, (40, 72))]:
            q, k, v = _qkv(B=2, H=2, Sq=Sq, Sk=Sk, hd=32, seed=7)
            bias = jnp.asarray(
                np.random.RandomState(8).randn(2, 1, Sk).astype(np.float32))

            def loss(q, k, v, bias):
                return jnp.sum(flash_attention(q, k, v, bias, scale=0.2,
                                               causal=causal, block_q=32,
                                               block_k=32, interpret=True) ** 2)

            def ref_loss(q, k, v, bias):
                return jnp.sum(_dense_reference(q, k, v,
                                                jnp.broadcast_to(bias, (2, 2, Sk)),
                                                0.2, causal) ** 2)

            g = jax.grad(loss, argnums=(0, 1, 2, 3))(q, k, v, bias)
            rg = jax.grad(ref_loss, argnums=(0, 1, 2, 3))(q, k, v, bias)
            for a, b, name in zip(g, rg, "q k v bias".split()):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4,
                    err_msg=f"d{name} causal={causal} Sq={Sq}")

    def test_bwd_with_fully_masked_rows_is_finite(self):
        q, k, v = _qkv(B=1, H=1, Sq=32, Sk=32, hd=16, seed=9)
        bias = jnp.full((1, 1, 32), -jnp.inf)

        def loss(q, k, v):
            return jnp.sum(flash_attention(q, k, v, bias, causal=False,
                                           block_q=32, block_k=32,
                                           interpret=True) ** 2)

        g = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)
        for a in g:
            assert np.isfinite(np.asarray(a)).all()
