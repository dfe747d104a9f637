"""Custom layers: deterministic layer normalization and masked softmax.

Parity targets: raynet/layers.py (LayerNormalization with std+eps
normalization — note: NOT sqrt(var+eps) — and CustomSoftmax over the first N
valid entries per row).
"""
import flax.linen as nn
import jax.numpy as jnp


class LayerNormalization(nn.Module):
    """Per-sample normalization over all non-batch axes.

    Matches the reference's semantics (raynet/layers.py:6-60): statistics are
    computed over every axis except the batch axis, the denominator is
    ``std + eps`` (not the usual ``sqrt(var + eps)``), gamma is a full-shape
    broadcast scalar by default and bias is per-channel.
    """

    epsilon: float = 1e-3

    @nn.compact
    def __call__(self, x):
        channels = x.shape[-1]
        gamma = self.param("gamma", nn.initializers.ones, (1,) * x.ndim)
        bias = self.param("bias", nn.initializers.zeros, (channels,))
        axes = tuple(range(1, x.ndim))
        mean = x.mean(axis=axes, keepdims=True)
        std = x.std(axis=axes, keepdims=True) + self.epsilon
        return gamma * (x - mean) / std + bias


def masked_softmax(x, valid_counts):
    """Softmax over the first ``valid_counts[i]`` entries of each row.

    Parity: raynet/layers.py:63-99 (CustomSoftmax). ``x``: (B, M);
    ``valid_counts``: (B,) int. Entries beyond the count get probability 0.
    """
    m = x.shape[-1]
    mask = jnp.arange(m)[None, :] < valid_counts[:, None]
    neg_inf = jnp.finfo(x.dtype).min
    masked = jnp.where(mask, x, neg_inf)
    mx = masked.max(axis=-1, keepdims=True)
    e = jnp.exp(x - mx) * mask
    return e / e.sum(axis=-1, keepdims=True)
