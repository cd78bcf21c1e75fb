"""Losses and metrics (reference ``experiments/src/utils.jl:71-101``).

Batch-major layout: predictions/labels are ``(B, C)``; time series are
``(B, T, F)`` (the reference is feature-major — reductions are transposed
accordingly and asserted equivalent in tests).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def logitcrossentropy(y_pred, y):
    """mean over batch of −Σ_c y·logsoftmax(ŷ)."""
    return jnp.mean(
        -jnp.sum(y * jax.nn.log_softmax(y_pred, axis=-1), axis=-1)
    )


def accuracy(y_pred, y, topk=(1,)):
    """Top-k accuracy in percent. ``y`` is one-hot (B, C)."""
    true_labels = jnp.argmax(y, axis=-1)
    maxk = max(topk)
    top_preds = jnp.argsort(-y_pred, axis=-1)[:, :maxk]
    out = []
    for k in topk:
        correct = (top_preds[:, :k] == true_labels[:, None]).any(axis=-1)
        out.append(100.0 * jnp.mean(correct.astype(jnp.float32)))
    return out[0] if len(topk) == 1 else tuple(out)


def mean_absolute_error(y_pred, y):
    return jnp.mean(jnp.abs(y_pred - y))


def mean_squared_error(y_pred, y):
    return jnp.mean(jnp.square(y_pred - y))


def log_likelihood_loss(dpred, mask, sigma: float = 0.01):
    """Masked Gaussian log-likelihood per sample (σ = 0.01,
    reference ``utils.jl:94-98``). ``dpred``/``mask``: (B, T, F)."""
    sample_ll = (
        -(dpred ** 2) / (2 * sigma ** 2)
        - jnp.log(sigma)
        - jnp.log(2 * jnp.pi) / 2
    )
    return jnp.sum(sample_ll, axis=(1, 2)) / jnp.sum(mask, axis=(1, 2))


def kl_divergence(mu, logvar):
    """KL(N(μ, σ²) ‖ N(0, 1)) per sample, mean over the latent dim
    (reference ``utils.jl:101``). ``mu``/``logvar``: (B, L)."""
    return jnp.mean(jnp.exp(logvar) + mu ** 2 - 1 - logvar, axis=-1) / 2
