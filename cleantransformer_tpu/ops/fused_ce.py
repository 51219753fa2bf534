"""Fused (chunked) LM-head + cross-entropy.

The reference computes the causal-LM loss by materializing the full
(B, S, vocab) logits tensor and feeding it to CrossEntropyLoss
(modeling_bloom.py:223-231, trainer default). At B=8, S=1024, V=50k that is
a 1.6 GB fp32 intermediate written and re-read several times per step — on
TPU the loss becomes an HBM-bandwidth problem, and the buffer alone crowds
out rematerialization headroom.

``fused_shift_ce`` computes the identical shifted cross-entropy directly
from the final hidden states: the token rows are processed in chunks, each
chunk's logits live only long enough to be reduced to (lse, picked-logit)
pairs, and the backward recomputes the chunk logits to form
``softmax - onehot`` on the fly (a custom_vjp, so no full-logits residual is
ever saved). All heavy ops are (chunk, D) x (D, V) matmuls on the MXU.

Numerics: logits are produced by the same ``h @ wte^T`` contraction as
``gpt_lm_head``/Bloom's tied head, log-sum-exp is the max-subtracted stable
form in fp32 — agreement with the dense path is to fp32 rounding (tested),
not bit-exact, which is why the parity suites keep the dense loss and this
path is opt-in (``config.fused_ce`` / Trainer).
"""

import functools

import jax
import jax.numpy as jnp


def _chunk_logits(h_c, w):
    """(C, D) x (V, D)^T -> (C, V) in fp32 accumulation."""
    return jax.lax.dot_general(
        h_c, w, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _ce_per_token(h, w, labels, num_chunks):
    """Per-token negative log-likelihood, (N,) fp32.

    h: (N, D) hidden rows; w: (V, D) tied head table; labels: (N,) int32
    (already shifted/clamped valid ids — masking happens in the caller).
    """
    nll, _ = _ce_fwd_impl(h, w, labels, num_chunks)
    return nll


def _ce_fwd_impl(h, w, labels, num_chunks):
    N, D = h.shape
    C = N // num_chunks

    def body(_, idx):
        h_c = jax.lax.dynamic_slice(h, (idx * C, 0), (C, D))
        lab_c = jax.lax.dynamic_slice(labels, (idx * C,), (C,))
        logits = _chunk_logits(h_c, w)
        m = jnp.max(logits, axis=-1)
        lse = m + jnp.log(jnp.sum(jnp.exp(logits - m[:, None]), axis=-1))
        picked = jnp.take_along_axis(logits, lab_c[:, None], axis=-1)[:, 0]
        return None, (lse - picked, lse)

    _, (nll, lse) = jax.lax.scan(body, None, jnp.arange(num_chunks))
    return nll.reshape(N), lse.reshape(N)


def _ce_fwd(h, w, labels, num_chunks):
    nll, lse = _ce_fwd_impl(h, w, labels, num_chunks)
    return nll, (h, w, labels, lse)


def _ce_bwd(num_chunks, res, g):
    h, w, labels, lse = res
    N, D = h.shape
    V = w.shape[0]
    C = N // num_chunks

    def body(dw_acc, idx):
        h_c = jax.lax.dynamic_slice(h, (idx * C, 0), (C, D))
        lab_c = jax.lax.dynamic_slice(labels, (idx * C,), (C,))
        lse_c = jax.lax.dynamic_slice(lse, (idx * C,), (C,))
        g_c = jax.lax.dynamic_slice(g, (idx * C,), (C,))
        logits = _chunk_logits(h_c, w)
        p = jnp.exp(logits - lse_c[:, None])
        dlogits = p * g_c[:, None]
        # subtract the one-hot term as a C-element scatter (a materialized
        # (C, V) one_hot would be as big as the logits chunk itself)
        dlogits = dlogits.at[jnp.arange(C), lab_c].add(-g_c)
        dlogits = dlogits.astype(h.dtype)
        dh_c = jax.lax.dot_general(dlogits, w, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        dw_c = jax.lax.dot_general(dlogits, h_c, (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
        return dw_acc + dw_c, dh_c.astype(h.dtype)

    dw, dh = jax.lax.scan(body, jnp.zeros((V, D), jnp.float32),
                          jnp.arange(num_chunks))
    return dh.reshape(N, D), dw.astype(w.dtype), None


_ce_per_token.defvjp(_ce_fwd, _ce_bwd)


def fused_shift_ce(h, wte, labels, mask=None, ignore_index=-100,
                   chunk_tokens=2048):
    """Shifted causal-LM cross-entropy straight from hidden states.

    Semantics match ``losses.shift_cross_entropy_loss(lm_head(h), labels,
    mask)``: logits[..., :-1, :] vs labels[..., 1:], ``ignore_index`` rows
    excluded from the masked mean (reference modeling_bloom.py:223-231).

    h: (B, S, D) final hidden states (post ln_f); wte: (V, D) tied head.
    ``chunk_tokens`` bounds the live logits buffer (chunk x V fp32).
    """
    B, S, D = h.shape
    shift_h = h[:, :-1, :].reshape(B * (S - 1), D)
    shift_labels = labels[..., 1:].reshape(B * (S - 1))
    if mask is not None:
        shift_mask = mask[..., 1:].reshape(B * (S - 1))
        shift_labels = jnp.where(shift_mask > 0, shift_labels, ignore_index)
    valid = shift_labels != ignore_index
    safe_labels = jnp.where(valid, shift_labels, 0).astype(jnp.int32)

    N = shift_h.shape[0]
    C = min(chunk_tokens, N)
    pad = (-N) % C
    if pad:
        shift_h = jnp.pad(shift_h, ((0, pad), (0, 0)))
        safe_labels = jnp.pad(safe_labels, (0, pad))
        valid = jnp.pad(valid, (0, pad))
    num_chunks = shift_h.shape[0] // C

    # same table cast as the dense head (lm_head_matmul casts to h.dtype);
    # the cast's transpose routes dW back to the master dtype under AD
    nll = _ce_per_token(shift_h, wte.astype(shift_h.dtype), safe_labels,
                        num_chunks)
    nll = jnp.where(valid, nll, 0.0)
    n = jnp.maximum(jnp.sum(valid), 1)
    return jnp.sum(nll) / n
