"""Loss functions as pure jittable functions.

Reproduces the reference's from-scratch losses (CleanTransformer/loss.py):
 - mse_loss                       (loss.py:17-26)
 - cross_entropy_loss: supports class-index targets and soft-probability
   targets; 'mean' divides by the leading batch dim only (loss.py:29-49)
 - log_softmax: the reference adds 1e-9 to the denominator (loss.py:52-60)
 - nll_loss                       (loss.py:63-73)

The reference computes log-softmax naively as log(exp(x)/sum(exp(x)));
we use the max-subtracted stable form, which is mathematically identical
and matches torch to float rounding while never overflowing on TPU.
"""

import jax
import jax.numpy as jnp


def mse_loss(input, target, reduction="mean"):
    loss = (input - target) ** 2
    if reduction == "mean":
        return jnp.mean(loss)
    if reduction == "sum":
        return jnp.sum(loss)
    return loss


def log_softmax(input, axis=-1, reference_eps=False):
    """Stable log-softmax. ``reference_eps=True`` reproduces the reference
    LogSoftmax's +1e-9 denominator fudge (loss.py:59)."""
    if reference_eps:
        shifted = input - jax.lax.stop_gradient(jnp.max(input, axis=axis, keepdims=True))
        return shifted - jnp.log(jnp.sum(jnp.exp(shifted), axis=axis, keepdims=True)
                                 + 1e-9 * jnp.exp(-jnp.max(input, axis=axis, keepdims=True)))
    return jax.nn.log_softmax(input, axis=axis)


def cross_entropy_loss(input, target, reduction="mean", ignore_index=None):
    """Cross-entropy over the last dim of ``input``.

    - integer ``target`` of rank input.ndim-1: one-hot path (loss.py:41)
    - float ``target`` of the same rank as input: soft-probability path (loss.py:45-46)
    - ``ignore_index``: rows whose target equals it contribute 0 loss and are
      excluded from the 'mean' denominator (torch CrossEntropyLoss semantics;
      the reference inherits this from torch via its labels!=-100 usage).
    """
    logp = jax.nn.log_softmax(input, axis=-1)
    if target.ndim == input.ndim - 1:
        tgt = target
        valid = None
        if ignore_index is not None:
            valid = (target != ignore_index)
            tgt = jnp.where(valid, target, 0)
        picked = jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
        if valid is not None:
            picked = jnp.where(valid, picked, 0.0)
            n = jnp.maximum(jnp.sum(valid), 1)
        else:
            n = input.shape[0]
        loss = -jnp.sum(picked)
        if reduction == "mean":
            return loss / n
        return loss
    loss = -jnp.sum(target * logp)
    if reduction == "mean":
        return loss / input.shape[0]
    return loss


def nll_loss(input, target, reduction="mean"):
    picked = jnp.take_along_axis(input, target[..., None], axis=-1)[..., 0]
    loss = -jnp.sum(picked)
    if reduction == "mean":
        return loss / input.shape[0]
    return loss


def shift_cross_entropy_loss(lm_logits, labels, mask=None, ignore_index=-100):
    """Causal-LM loss: logits[..., :-1, :] vs labels[..., 1:] (the reference's
    BloomForCausalLM label path, modeling_bloom.py:223-231).

    ``mask``: optional (b, s) validity mask applied to the *label* positions
    (a TPU-friendly alternative to writing ignore_index into labels).
    """
    shift_logits = lm_logits[..., :-1, :]
    shift_labels = labels[..., 1:]
    b, s, v = shift_logits.shape
    flat_logits = shift_logits.reshape(b * s, v)
    flat_labels = shift_labels.reshape(b * s)
    if mask is not None:
        shift_mask = mask[..., 1:].reshape(b * s)
        flat_labels = jnp.where(shift_mask > 0, flat_labels, ignore_index)
    return cross_entropy_loss(flat_logits, flat_labels, reduction="mean",
                              ignore_index=ignore_index)
