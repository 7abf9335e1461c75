"""Observable lifts for Koopman system identification.

The Gaussian-RBF dictionary lift of the reference
(``Koopman/koopmanEDMDc.py:37-48, 221-236``):
``phi(x) = [x, exp(-gamma ||x - c_1||^2), ..., exp(-gamma ||x - c_k||^2)]``
computed as one GEMM over the batch via the Gram expansion
``||x||^2 + ||c||^2 - 2 x @ C^T`` — already the MXU-friendly form; kept
natively batched over arbitrary leading dimensions.
"""

from __future__ import annotations

import jax.numpy as jnp


def rbf_features(X, centers, gamma):
    """Gaussian RBF feature matrix ``exp(-gamma ||x - c||^2)``.

    ``X``: ``(..., n)``; ``centers``: ``(k, n)``; returns ``(..., k)``.
    """
    x2 = jnp.sum(X * X, axis=-1, keepdims=True)          # (..., 1)
    c2 = jnp.sum(centers * centers, axis=-1)             # (k,)
    cross = X @ centers.T                                # (..., k) — MXU
    return jnp.exp(-gamma * (x2 + c2 - 2.0 * cross))


def rbf_lift(X, centers, gamma):
    """Full lift ``phi(x) = [x, rbf(x)]`` of dimension ``d = n + k``."""
    return jnp.concatenate([X, rbf_features(X, centers, gamma)], axis=-1)
